"""Mapping DSL tests (FIXTURES.md §B6; ref src/etlp/utils/mapper.clj)."""

import pytest
from pyspark.sql import functions as F

from etlp_spark.mapping import (
    MappingRegistry,
    TemplateError,
    apply_interpreted,
    apply_template,
    compile_template,
)


@pytest.fixture()
def people(spark):
    return spark.createDataFrame(
        [
            (1, "ada", {"city": "london", "zip": "N1"}, ["x", "y"]),
            (2, "alan", {"city": "bletchley", "zip": None}, []),
        ],
        "id long, name string, addr struct<city:string,zip:string>, tags array<string>",
    )


def test_literals_refs_struct(spark, people):
    out = apply_template(
        people,
        {
            "pid": "$.id",
            "label": {"$concat": ["person-", "$.id"]},
            "city": "$.addr.city",
            "fixed": 42,
        },
    ).collect()
    rows = {r.pid: r for r in out}
    assert rows[1].label == "person-1" and rows[1].city == "london"
    assert rows[2].fixed == 42


def test_interpolation(spark, people):
    out = apply_template(people, {"s": "{{ $.name }}@{{ $.addr.city }}"}).collect()
    assert sorted(r.s for r in out) == ["ada@london", "alan@bletchley"]


def test_if_coalesce(spark, people):
    out = apply_template(
        people,
        {
            "zip_or_na": {"$coalesce": ["$.addr.zip", "NA"]},
            "has_tags": {"$if": "$.tags", "$then": "yes", "$else": "no"},
        },
    ).collect()
    by = {i: r for i, r in zip((1, 2), sorted(out, key=lambda r: r.zip_or_na != "N1"))}
    assert by[1].zip_or_na == "N1"
    assert by[2].zip_or_na == "NA"


def test_map_over_array(spark, people):
    out = apply_template(
        people,
        {"tagged": {"$map": "$.tags", "$as": "t", "$body": {"$concat": ["$t", "!"]}}},
    ).collect()
    assert sorted(map(tuple, (r.tagged for r in out))) == [(), ("x!", "y!")]


def test_nested_struct_output(spark, people):
    row = apply_template(
        people, {"doc": {"who": "$.name", "where": {"town": "$.addr.city"}}}
    ).orderBy(F.col("doc.who")).first()
    assert row.doc.who == "ada" and row.doc.where.town == "london"


def test_unknown_directive_raises():
    with pytest.raises(TemplateError, match="unknown directive"):
        compile_template({"$frobnicate": 1})


def test_registry_stores_errors_as_strings(tmp_path):
    """ref mapper.clj:44-47 — compile errors live in the registry."""
    (tmp_path / "good.yaml").write_text("out: '$.id'\n")
    (tmp_path / "bad.yaml").write_text("out:\n  $bogus: 1\n")
    reg = MappingRegistry(base_dir=str(tmp_path))
    entries = reg.fetch({"g": "good", "b": "bad", "missing": "nope"})
    assert callable(entries["g"])
    assert isinstance(entries["b"], str) and "unknown directive" in entries["b"]
    assert isinstance(entries["missing"], str) and "FileNotFoundError" in entries["missing"]


def test_registry_compiled_mapping_runs(spark, people, tmp_path):
    (tmp_path / "m.yaml").write_text("pid: '$.id'\ncity: '$.addr.city'\n")
    reg = MappingRegistry(base_dir=str(tmp_path))
    entries = reg.fetch({"m": "m"})
    out = entries["m"](people).collect()
    assert sorted((r.pid, r.city) for r in out) == [(1, "london"), (2, "bletchley")]


def test_interpreter_escape_hatch(spark, people):
    out = apply_interpreted(
        people.select("id", "name"),
        {"pid": "$.id", "shout": "$.name"},
        "pid long, shout string",
    ).collect()
    assert sorted((r.pid, r.shout) for r in out) == [(1, "ada"), (2, "alan")]


def test_compiled_vs_interpreted_parity(spark):
    """The escape-hatch interpreter must agree with the Catalyst
    compiler on the FULL directive surface — nested $map-in-$map,
    $if chain, interpolation, $concat, $coalesce (VERDICT r1 #6)."""
    df = spark.createDataFrame(
        [
            (1, "error", None, [{"items": [{"name": "u", "v": "8"}, {"name": "t", "v": "error"}]}]),
            (2, "click", "c", [{"items": [{"name": "k", "v": "89"}]}, {"items": []}]),
            (3, "view", None, []),
        ],
        "id long, typ string, maybe string, "
        "tag_sets array<struct<items:array<struct<name:string,v:string>>>>",
    )
    tmpl = {
        "eid": "$.id",
        "label": {
            "$if": "$.maybe",
            "$then": "GOT-{{ $.id }}",
            "$else": {"$concat": ["none-", "$.typ"]},
        },
        "tags": {
            "$map": "$.tag_sets",
            "$as": "ts",
            "$body": {"$map": "$ts.items", "$as": "it", "$body": "{{ $it.name }}:{{ $it.v }}"},
        },
        "fallback": {"$coalesce": ["$.maybe", "$.typ"]},
    }
    schema = "eid long, label string, tags array<array<string>>, fallback string"
    compiled = apply_template(df, tmpl).collect()
    interpreted = apply_interpreted(df, tmpl, schema).collect()

    def norm(rows):
        return sorted(
            (r.eid, r.label, tuple(tuple(x) for x in (r.tags or [])), r.fallback)
            for r in rows
        )

    assert norm(compiled) == norm(interpreted)


def test_filter_and_let_directives(spark, people):
    out = apply_template(
        people,
        {
            "kept": {"$filter": "$.tags", "$as": "t", "$cond": "$t"},
            "greet": {
                "$let": {"who": "$.name", "town": "$.addr.city"},
                "$body": "{{ $who }} of {{ $town }}",
            },
        },
    ).collect()
    rows = sorted(((tuple(r.kept), r.greet) for r in out))
    assert rows == [((), "alan of bletchley"), (("x", "y"), "ada of london")]


def test_filter_let_compiled_vs_interpreted(spark):
    df = spark.createDataFrame(
        [(1, ["a", "", "b"], "x"), (2, [], None)],
        "id long, tags array<string>, maybe string",
    )
    tmpl = {
        "eid": "$.id",
        "nonempty": {"$filter": "$.tags", "$as": "t", "$cond": "$t"},
        "msg": {
            "$let": {"m": {"$coalesce": ["$.maybe", "?"]}},
            "$body": "{{ $.id }}={{ $m }}",
        },
    }
    schema = "eid long, nonempty array<string>, msg string"
    compiled = apply_template(df, tmpl).collect()
    interpreted = apply_interpreted(df, tmpl, schema).collect()

    def norm(rows):
        return sorted((r.eid, tuple(r.nonempty or ()), r.msg) for r in rows)

    assert norm(compiled) == norm(interpreted)


def test_interpreter_rejects_bare_root_ref_like_compiler(spark):
    from etlp_spark.mapping import interp_template

    with pytest.raises(TemplateError, match="bare"):
        interp_template("$.", {"a": 1})
    with pytest.raises(TemplateError, match="bare"):
        compile_template("$.")


def test_switch_reduce_call_compiled_vs_interpreted(spark):
    """Round-3 directives: $switch / $reduce / $call keep the compiled
    and interpreted paths semantics-identical."""
    df = spark.createDataFrame(
        [
            (1, "click", ["a", "b", "c"], " Mixed Case "),
            (2, "purchase", [], None),
            (3, None, None, "x"),
        ],
        "id long, kind string, tags array<string>, raw string",
    )
    tmpl = {
        "eid": "$.id",
        "sev": {
            "$switch": "$.kind",
            "$cases": {"click": "low", "purchase": "high"},
            "$default": "unknown",
        },
        "joined": {
            "$reduce": "$.tags",
            "$as": ["acc", "t"],
            "$init": "",
            "$body": "{{ $acc }}{{ $t }}",
        },
        "clean": {"$call": "trim", "$args": [{"$call": "lower", "$args": ["$.raw"]}]},
    }
    schema = "eid long, sev string, joined string, clean string"
    compiled = apply_template(df, tmpl).collect()
    interpreted = apply_interpreted(df, tmpl, schema).collect()

    def norm(rows):
        return sorted((r.eid, r.sev, r.joined, r.clean) for r in rows)

    assert norm(compiled) == norm(interpreted)
    by_id = {r.eid: r for r in compiled}
    assert by_id[1].sev == "low" and by_id[1].joined == "abc"
    assert by_id[1].clean == "mixed case"
    assert by_id[2].sev == "high" and by_id[2].joined == ""
    assert by_id[3].sev == "unknown" and by_id[3].joined is None


def test_call_unknown_function_rejected(spark):
    from etlp_spark.mapping import interp_template

    with pytest.raises(TemplateError, match="unknown .call"):
        compile_template({"$call": "exec", "$args": []})
    with pytest.raises(TemplateError, match="unknown .call"):
        interp_template({"$call": "exec", "$args": []}, {})


# ---------------------------------------------------------------------
# Adversarial / malformed templates (round-4 advisor item): every
# failure mode must surface as a TemplateError (or be stored as an
# error string by the registry, ref mapper.clj:44-47) — never as
# silent nulls in the output.
# ---------------------------------------------------------------------

def test_cyclic_let_is_unbound_not_silent(spark):
    """$let binds sequentially (like Clojure let / JUTE): a forward or
    cyclic reference is an unbound variable at compile time, not a
    null at runtime."""
    from etlp_spark.mapping import interp_template

    cyclic = {"$let": {"a": "$b", "b": "$a"}, "$body": "$a"}
    with pytest.raises(TemplateError, match="unbound variable 'b'"):
        compile_template(cyclic)
    with pytest.raises(TemplateError, match="unbound variable 'b'"):
        interp_template(cyclic, {})
    selfref = {"$let": {"a": "$a.x"}, "$body": "$a"}
    with pytest.raises(TemplateError, match="unbound variable 'a'"):
        compile_template(selfref)
    with pytest.raises(TemplateError, match="unbound variable 'a'"):
        interp_template(selfref, {})


def test_let_sequential_binding_still_works(spark, people):
    """The legal direction — later bindings see earlier ones."""
    tmpl = {"v": {"$let": {"a": "$.id", "b": {"$concat": ["$a", "!"]}}, "$body": "$b"}}
    rows = apply_template(people, tmpl).collect()
    assert sorted(r.v for r in rows) == ["1!", "2!"]


def test_reduce_type_mismatch_fails_loud(spark, people):
    """$init fixes the accumulator type (Spark aggregate contract).
    A body whose type can't merge with it must raise at analysis —
    the engine never coerces to null."""
    from pyspark.errors import AnalysisException

    tmpl = {
        "bad": {
            "$reduce": "$.tags",           # array<string>
            "$as": ["acc", "t"],
            "$init": 0,                    # bigint accumulator...
            "$body": {"$concat": ["$acc", "$t"]},  # ...string body
        }
    }
    col = compile_template(tmpl["bad"])   # builds fine (lazy)
    with pytest.raises(AnalysisException):
        people.select(col.alias("bad")).collect()


def test_reduce_malformed_as_rejected():
    """$as must be a [acc, item] pair; a bare string can't destructure."""
    with pytest.raises((TemplateError, ValueError)):
        compile_template(
            {"$reduce": "$.tags", "$as": "acc", "$init": 0, "$body": "$acc"}
        )


def test_call_wrong_arity_fails_loud():
    with pytest.raises(TypeError):
        compile_template({"$call": "upper", "$args": ["$.a", "$.b"]})


def test_registry_isolates_broken_aliases(tmp_path, spark, people):
    """One broken alias must not poison the rest of the registry —
    good aliases stay callable, each broken one holds its own error
    string (ref mapper.clj:44-47 stores per-alias errors)."""
    (tmp_path / "good.yaml").write_text("pid: '$.id'\n")
    (tmp_path / "cyc.yaml").write_text(
        "v:\n  $let: {a: $b, b: $a}\n  $body: $a\n"
    )
    (tmp_path / "unk.yaml").write_text("v:\n  $explode: 1\n")
    reg = MappingRegistry(base_dir=str(tmp_path))
    entries = reg.fetch({"g": "good", "c": "cyc", "u": "unk"})
    assert callable(entries["g"])
    assert [r.pid for r in sorted(entries["g"](people).collect())] == [1, 2]
    assert isinstance(entries["c"], str) and "unbound variable" in entries["c"]
    assert isinstance(entries["u"], str) and "unknown directive" in entries["u"]
