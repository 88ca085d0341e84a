"""Pipeline / Engine / connector protocol tests (SURVEY.md §2.1
C1-C5, R1-R3, S3-S6, K1-K3, E1-E2, S2)."""

import json

import pytest
from pyspark.sql import functions as F

from etlp_spark import ops
from etlp_spark.connectors import (
    ConsoleSink,
    HttpPollingSource,
    JdbcSink,
    JsonLinesSource,
    ParquetSink,
    ParquetSource,
    TextFileSource,
)
from etlp_spark.connectors.jdbc import specs_to_column_types
from etlp_spark.pipeline import Engine, Pipeline


@pytest.fixture()
def jsonl_dir(tmp_path):
    p = tmp_path / "in"
    p.mkdir()
    (p / "a.jsonl").write_text(
        '{"id": 1, "name": "a", "tags": ["x","y"]}\n'
        '{"id": 2, "name": "b", "tags": []}\n'
        "{this is not json\n"
    )
    (p / "b.jsonl").write_text('{"id": 3, "name": "c", "tags": ["z"]}\n')
    return str(p)


def test_text_source_provenance(spark, tmp_path):
    f = tmp_path / "lines.txt"
    f.write_text("hello\n\nwörld\n")
    df = TextFileSource(str(f)).read(spark)
    rows = [r.value for r in df.collect()]
    assert sorted(rows) == ["", "hello", "wörld"]
    assert all(r.file.endswith("lines.txt") for r in df.collect())


def test_jsonl_source_error_routing(spark, jsonl_dir):
    """E1/E2: reference logs-and-continues on bad records
    (dag.clj:39-45); here good rows and errors are separate frames."""
    src = JsonLinesSource(jsonl_dir, schema="id long, name string, tags array<string>")
    good = src.read(spark)
    errs = src.errors_of(spark)
    assert sorted(r.id for r in good.collect()) == [1, 2, 3]
    bad = errs.collect()
    assert len(bad) == 1 and "{this is not json" in bad[0]._corrupt_record
    assert bad[0].file.endswith("a.jsonl")


def test_connector_spec_check_discover(spark, jsonl_dir):
    """C1/C2 protocol ops (connector/protocols.clj:4-13)."""
    src = JsonLinesSource(jsonl_dir, schema="id long, name string, tags array<string>")
    assert src.spec()["type"] == "file/jsonl"
    assert src.check(spark).ok
    catalog = src.discover(spark)
    props = catalog["streams"][0]["schema"]["properties"]
    assert props["id"] == {"type": "integer"}
    assert props["name"] == {"type": "string"}
    # failing check reports, never raises
    assert not TextFileSource("/nonexistent/nowhere").check(spark).ok


def test_pipeline_end_to_end(spark, jsonl_dir, tmp_path):
    """M1 slice: source → transforms → sink with observed count."""
    out = str(tmp_path / "out.parquet")
    pipe = Pipeline(
        source=JsonLinesSource(jsonl_dir, schema="id long, name string, tags array<string>"),
        transforms=[
            ops.where(F.col("id") > 1),
            ops.map_cols(n_tags=F.size("tags")),
        ],
        sink=ParquetSink(out),
    )
    result = pipe.run(spark)
    assert result.rows == 2
    back = ParquetSource(out).read(spark)
    assert sorted((r.id, r.n_tags) for r in back.collect()) == [(2, 0), (3, 1)]


def test_console_sink_counts(spark):
    sink = ConsoleSink(limit=2)
    result = Pipeline(source=lambda s: s.range(100), sink=sink).run(spark)
    assert result.rows == 100
    assert len(sink.collected) == 2


def test_engine_registry_dispatch(spark):
    """R1-R3: register/run/check; unknown name raises like the
    reference's IllegalArgumentException (core.clj:28-30)."""
    engine = Engine(spark, config={"limit": 5})
    engine.register(
        "numbers",
        lambda cfg: Pipeline(source=lambda s: s.range(cfg["limit"]), sink=ConsoleSink(limit=1)),
    )
    assert engine.processors() == ["numbers"]
    assert engine.run("numbers", "start").rows == 5
    assert engine.run("numbers", "check").ok
    with pytest.raises(ValueError, match="unknown processor"):
        engine.run("ghost")
    with pytest.raises(ValueError, match="unknown command"):
        engine.run("numbers", "explode")


def test_jdbc_specs_ddl():
    """K3 DDL parity (README.md:72-81)."""
    ddl = specs_to_column_types(
        [("id", "serial", "PRIMARY KEY"), ("key", "varchar"), ("created_at", "timestamp", "DEFAULT", "CURRENT_TIMESTAMP")]
    )
    assert ddl == "id SERIAL PRIMARY KEY, key VARCHAR, created_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP"
    sink = JdbcSink(url="jdbc:postgresql://x/db", table="t", specs=[("id", "serial", "PRIMARY KEY")])
    assert sink.spec()["createTableColumnTypes"] == "id SERIAL PRIMARY KEY"


def test_http_polling_source_state_machine(spark):
    """S2 (http.clj:17-95): start → poll until 200 → manifest fetch →
    distributed json read. Fake transport, zero network."""
    polls = {"n": 0}

    def transport(method, url, headers):
        if url == "https://api.example/export":
            if headers.get("prefer") != "respond-async":
                return 200, {}, b"{}"  # plain health probe (check())
            return 202, {"Content-Location": "https://api.example/jobs/42"}, b""
        if url == "https://api.example/jobs/42":
            polls["n"] += 1
            if polls["n"] < 3:
                return 202, {}, b""
            manifest = {"output": [{"url": "https://api.example/files/1"}]}
            return 200, {}, json.dumps(manifest).encode()
        if url == "https://api.example/files/1":
            return 200, {}, b'{"pid": 7, "status": "ok"}\n{"pid": 8, "status": "err"}'
        raise AssertionError(f"unexpected url {url}")

    src = HttpPollingSource("https://api.example/export", transport=transport, poll_interval_s=0.0)
    df = src.read(spark)
    assert sorted(r.pid for r in df.collect()) == [7, 8]
    assert polls["n"] == 3
    assert src.check(spark).ok


def test_http_polling_timeout():
    src = HttpPollingSource(
        "https://x/", transport=lambda m, u, h: (202, {"Content-Location": "https://x/j"}, b""),
        poll_interval_s=0.0, max_polls=2,
    )
    with pytest.raises(TimeoutError):
        src.poll("https://x/j")


def test_stdin_source(spark):
    import io as _io

    from etlp_spark.connectors.files import StdinSource

    src = StdinSource(stream=_io.StringIO("alpha\nbeta\n\ngamma\n"))
    df = src.read(spark)
    assert [r.value for r in df.collect()] == ["alpha", "beta", "", "gamma"]
    assert src.discover(spark)["streams"][0]["stream_name"] == "stdin_stream"
    empty = StdinSource(stream=_io.StringIO(""))
    assert empty.read(spark).count() == 0


def test_mapping_http_loader(spark, tmp_path):
    from etlp_spark.mapping import MappingRegistry, http_loader

    served = {"http://fake/mappings/m1": b"out: '$.id'\n"}
    reg = MappingRegistry(loader=http_loader("http://fake", transport=lambda u: served[u]))
    entries = reg.fetch({"m1": "m1", "m404": "m404"})
    assert callable(entries["m1"])
    assert isinstance(entries["m404"], str) and "KeyError" in entries["m404"]


def test_register_udf_row_and_vectorized(spark):
    import pandas as pd

    from etlp_spark.pipeline import register_udf

    register_udf(spark, "shout", lambda s: s.upper() + "!", "string")
    assert spark.sql("select shout('abc') as x").first().x == "ABC!"

    register_udf(
        spark, "vec_double", lambda s: s * 2, "long", vectorized=True
    )
    df = spark.range(3).selectExpr("vec_double(id) as y")
    assert [r.y for r in df.collect()] == [0, 2, 4]


def test_make_source_format_registry(spark, jsonl_dir):
    from etlp_spark.connectors.files import make_source

    src = make_source(jsonl_dir, reducer="jsonl", schema="id long, name string, tags array<string>")
    assert sorted(r.id for r in src.read(spark).collect()) == [1, 2, 3]
    with pytest.raises(ValueError, match="unknown reducer"):
        make_source("/x", reducer="hl7")


def test_orc_source_roundtrip(spark, tmp_path):
    from etlp_spark.connectors.files import OrcSource, make_source

    path = str(tmp_path / "orc_data")
    spark.range(100).selectExpr("id", "id * 2 AS v").write.orc(path)
    src = make_source(path, reducer="orc")
    assert isinstance(src, OrcSource)
    df = src.read(spark)
    assert df.count() == 100
    assert {r.id for r in df.where("v >= 196").collect()} == {98, 99}


def test_register_udtf_table_function(spark):
    """Spark 4 Python UDTF through the registry: one-to-many fan-out
    callable from SQL as a table function (T3 mapcat family, beyond
    what explode expresses — here: emit one row per sliding bigram
    with its position)."""
    from etlp_spark.pipeline import register_udtf

    class Bigrams:
        def eval(self, text: str):
            words = text.split()
            for i in range(len(words) - 1):
                yield (i, f"{words[i]} {words[i+1]}")

    register_udtf(spark, "bigrams", Bigrams, "pos int, bigram string")
    rows = spark.sql("SELECT * FROM bigrams('a b c d')").collect()
    assert [(r.pos, r.bigram) for r in rows] == [(0, "a b"), (1, "b c"), (2, "c d")]


def test_pipeline_expectations_quarantine(spark, tmp_path):
    """Round-5 contract enforcement: Pipeline(expectations=...) routes
    violating rows (wrapped as ETLP error envelopes) to error_sink,
    clean rows to sink, and counts reconcile with the input."""
    from etlp_spark import expectations as X

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, None, 5.0), (3, "c", -1.0), (4, "d", 7.0),
         (4, "d", 7.0)],
        ["id", "name", "score"],
    )
    data_sink = ParquetSink(str(tmp_path / "clean"))
    err_sink = ParquetSink(str(tmp_path / "errors"))
    p = Pipeline(
        source=df,
        sink=data_sink,
        expectations=[
            X.not_null("name"),
            X.in_range("score", 0, 100),
            X.unique("id"),
        ],
        error_sink=err_sink,
    )
    result = p.run(spark)
    clean = spark.read.parquet(str(tmp_path / "clean"))
    errors = spark.read.parquet(str(tmp_path / "errors"))
    assert sorted(r.id for r in clean.collect()) == [1]  # 2:null name, 3:range, 4&4:dup
    assert result.extra["n_clean"] == 1 and result.extra["n_violations"] == 4
    assert clean.count() + errors.count() == df.count()
    # violations carry which checks failed + a parseable error envelope
    err_rows = errors.collect()
    failed = {tuple(sorted(r.failed_checks)) for r in err_rows}
    assert ("not_null(name)",) in failed
    assert ("in_range(score,0,100)",) in failed
    assert ("unique(id)",) in failed
    env = json.loads(err_rows[0].envelope)
    assert env["type"] == "error" and json.loads(env["data"])["id"] in (2, 3, 4)


def test_pipeline_expectations_null_accepted_values_fails(spark):
    """ADVICE r4: a NULL input must FAIL accepted_values (NULL.isin is
    NULL in 3VL; the validate() coalesce makes it a definite False)."""
    from etlp_spark import expectations as X

    df = spark.createDataFrame([("a",), (None,), ("z",)], ["code"])
    p = Pipeline(source=df, expectations=[X.accepted_values("code", ["a", "b"])])
    clean, violations = p.quarantine(spark)
    assert [r.code for r in clean.collect()] == ["a"]
    assert sorted(r.code or "<null>" for r in violations.collect()) == ["<null>", "z"]


def test_pipeline_from_config_end_to_end(spark, jsonl_dir, tmp_path):
    """Config-driven construction (the reference's Integrant config
    map as a plain dict): source/transforms/expectations/sinks all
    named by string, built into a Pipeline, run end-to-end with the
    quarantine split."""
    from etlp_spark.config import pipeline_from_config

    cfg = {
        "name": "cfg-stream",
        "source": {
            "type": "file",
            "path": jsonl_dir,
            "reducer": "jsonl",
            "options": {"schema": "id long, name string, tags array<string>"},
        },
        "transforms": [
            {"op": "filter", "expr": "id IS NOT NULL"},
            {"op": "map", "cols": {"n_tags": "size(tags)"}},
        ],
        "expectations": [
            {"check": "not_null", "cols": ["name"]},
            {"check": "in_range", "col": "n_tags", "lo": 1, "hi": 10},
        ],
        "sink": {"type": "parquet", "path": str(tmp_path / "clean")},
        "error_sink": {"type": "parquet", "path": str(tmp_path / "errs")},
    }
    p = pipeline_from_config(cfg)
    result = p.run(spark)
    clean = spark.read.parquet(str(tmp_path / "clean"))
    errs = spark.read.parquet(str(tmp_path / "errs"))
    # ids 1 (tags x,y) and 3 (tags z) pass; id 2 has no tags -> in_range fails
    assert sorted(r.id for r in clean.collect()) == [1, 3]
    assert [r.id for r in errs.collect()] == [2]
    assert result.extra["n_clean"] == 2 and result.extra["n_violations"] == 1


def test_streaming_pipeline_from_config_quarantine(spark, tmp_path):
    """The streaming config block end-to-end: a file-drop stream built
    from config (watermark + availableNow trigger + checkpoint), the
    expectations quarantine applied PER MICRO-BATCH, clean rows
    committed exactly-once to a snapshot sink via write_batch,
    violations (envelope-wrapped) appended to a parquet error sink."""
    import json as _json

    from etlp_spark.config import streaming_pipeline_from_config
    from etlp_spark.connectors.snapshots import SnapshotStore

    indir = tmp_path / "in"
    indir.mkdir()
    rows = [
        {"id": 1, "v": 5.0, "ts": "2024-01-01T00:00:00"},
        {"id": 2, "v": -3.0, "ts": "2024-01-01T00:01:00"},  # in_range fails
        {"id": None, "v": 7.0, "ts": "2024-01-01T00:02:00"},  # not_null fails
        {"id": 4, "v": 9.0, "ts": "2024-01-01T00:03:00"},
    ]
    (indir / "a.jsonl").write_text("\n".join(_json.dumps(r) for r in rows))
    cfg = {
        "name": "cfg-live",
        "source": {
            "type": "file_stream",
            "path": str(indir),
            "schema": "id long, v double, ts timestamp",
        },
        "transforms": [{"op": "map", "cols": {"v2": "v * 2"}}],
        "expectations": [
            {"check": "not_null", "cols": ["id"]},
            {"check": "in_range", "col": "v", "lo": 0, "hi": 100},
        ],
        "streaming": {
            "watermark": {"col": "ts", "delay": "10 minutes"},
            "checkpoint": str(tmp_path / "ckpt"),
            "trigger": {"availableNow": True},
        },
        "sink": {"type": "snapshot", "path": str(tmp_path / "out"), "mode": "append"},
        "error_sink": {"type": "parquet", "path": str(tmp_path / "errs")},
    }
    q = streaming_pipeline_from_config(cfg).start(spark)
    q.awaitTermination(120)
    store = SnapshotStore(str(tmp_path / "out"))
    clean = store.read(spark)
    assert sorted((r.id, r.v2) for r in clean.collect()) == [(1, 10.0), (4, 18.0)]
    errs = spark.read.parquet(str(tmp_path / "errs"))
    got = {r.id: (r.failed_checks, r.envelope) for r in errs.collect()}
    assert set(got) == {2, None}
    assert any("in_range" in c for c in got[2][0])
    assert _json.loads(got[2][1])["type"] == "error"
    # a second drop of files streams ONLY the new data (incremental,
    # checkpointed) and appends a new store version
    (indir / "b.jsonl").write_text(
        _json.dumps({"id": 9, "v": 1.0, "ts": "2024-01-01T00:04:00"})
    )
    q2 = streaming_pipeline_from_config(cfg).start(spark)
    q2.awaitTermination(120)
    assert sorted(r.id for r in store.read(spark).collect()) == [1, 4, 9]


def test_streaming_config_unknown_source_loud(spark):
    from etlp_spark.config import streaming_pipeline_from_config

    with pytest.raises(ValueError, match="unknown stream source type"):
        streaming_pipeline_from_config({"source": {"type": "kafkaesque"}})


def test_pipeline_from_config_unknown_components_loud(spark):
    from etlp_spark.config import pipeline_from_config

    with pytest.raises(ValueError, match="unknown source type"):
        pipeline_from_config({"source": {"type": "nope"}})
    with pytest.raises(ValueError, match="unknown transform op"):
        pipeline_from_config({
            "source": {"type": "file", "path": "/tmp/x",
                       "options": {"schema": "id long"}},
            "transforms": [{"op": "zap"}],
        })


def test_streaming_parquet_sink_rejects_overwrite(spark, tmp_path):
    """ADVICE r6: an explicit "mode": "overwrite" on a foreachBatch
    parquet sink would make every micro-batch clobber the previous
    one (silent data loss) — rejected loudly at writer-resolution
    time instead of honored."""
    import json as _json

    from etlp_spark.config import streaming_pipeline_from_config

    indir = tmp_path / "in"
    indir.mkdir()
    (indir / "a.jsonl").write_text(_json.dumps({"id": 1, "v": 5.0}))
    cfg = {
        "source": {
            "type": "file_stream",
            "path": str(indir),
            "schema": "id long, v double",
        },
        "expectations": [{"check": "not_null", "cols": ["id"]}],
        "streaming": {
            "checkpoint": str(tmp_path / "ckpt"),
            "trigger": {"availableNow": True},
        },
        "sink": {
            "type": "parquet",
            "path": str(tmp_path / "out"),
            "mode": "overwrite",
        },
        "error_sink": {"type": "parquet", "path": str(tmp_path / "errs")},
    }
    with pytest.raises(ValueError, match="must be 'append'"):
        streaming_pipeline_from_config(cfg).start(spark)


def test_streaming_quarantine_without_error_sink_is_observable(spark, tmp_path):
    """ADVICE r6: with expectations configured but NO error_sink,
    dropped violations must not vanish silently — the stream records
    a per-batch violation count (and warns) so the loss is
    observable, mirroring the batch path's returned violations."""
    import json as _json

    from etlp_spark.config import streaming_pipeline_from_config

    indir = tmp_path / "in"
    indir.mkdir()
    rows = [
        {"id": 1, "v": 5.0},
        {"id": None, "v": 2.0},   # not_null fails
        {"id": 3, "v": -1.0},     # in_range fails
        {"id": 4, "v": 9.0},
    ]
    (indir / "a.jsonl").write_text("\n".join(_json.dumps(r) for r in rows))
    cfg = {
        "name": "no-errsink",
        "source": {
            "type": "file_stream",
            "path": str(indir),
            "schema": "id long, v double",
        },
        "expectations": [
            {"check": "not_null", "cols": ["id"]},
            {"check": "in_range", "col": "v", "lo": 0, "hi": 100},
        ],
        "streaming": {
            "checkpoint": str(tmp_path / "ckpt"),
            "trigger": {"availableNow": True},
        },
        "sink": {"type": "parquet", "path": str(tmp_path / "out")},
    }
    stream = streaming_pipeline_from_config(cfg)
    q = stream.start(spark)
    q.awaitTermination(120)
    clean = spark.read.parquet(str(tmp_path / "out"))
    assert sorted(r.id for r in clean.collect()) == [1, 4]
    assert sum(stream.violation_counts.values()) == 2


def test_config_snapshot_sink_merge_mode(spark, tmp_path):
    """Declarative upsert: a config-built pipeline whose snapshot sink
    uses mode 'merge' + key_cols replaces matched keys and inserts
    the rest — MERGE INTO as plain config data. Missing key_cols is a
    loud config error."""
    import json as _json

    from etlp_spark.config import pipeline_from_config
    from etlp_spark.connectors.snapshots import SnapshotStore

    store_path = str(tmp_path / "tbl")
    SnapshotStore(store_path).write(
        spark.createDataFrame([(1, "old"), (2, "keep")], ["id", "val"])
    )
    indir = tmp_path / "in"
    indir.mkdir()
    (indir / "u.jsonl").write_text(
        "\n".join(_json.dumps(r) for r in
                  [{"id": 1, "val": "NEW"}, {"id": 9, "val": "ins"}])
    )
    cfg = {
        "source": {"type": "file", "path": str(indir), "reducer": "jsonl",
                   "options": {"schema": "id long, val string"}},
        # drop the file source's provenance column so the schema
        # matches the store's parent version exactly
        "transforms": [{"op": "select", "cols": ["id", "val"]}],
        "sink": {"type": "snapshot", "path": store_path,
                 "mode": "merge", "key_cols": ["id"]},
    }
    pipeline_from_config(cfg).run(spark)
    got = {r.id: r.val for r in SnapshotStore(store_path).read(spark).collect()}
    assert got == {1: "NEW", 2: "keep", 9: "ins"}

    with pytest.raises(ValueError, match="requires key_cols"):
        pipeline_from_config({
            "source": cfg["source"],
            "sink": {"type": "snapshot", "path": store_path, "mode": "merge"},
        })


def test_streaming_config_stateful_op(spark, tmp_path):
    """Declarative TWS: the streaming config's 'stateful' block names
    an arbitrary-state operator (here: cross-batch EWMA) that runs
    after transforms — the transformWithStateInPandas family as plain
    config data. Unknown op names fail loudly."""
    import json as _json

    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="TWS needs a google.protobuf runtime; none vendorable",
    )
    from etlp_spark.config import streaming_pipeline_from_config

    indir = tmp_path / "in"
    indir.mkdir()
    (indir / "a.jsonl").write_text(
        "\n".join(_json.dumps(r) for r in
                  [{"k": "a", "v": 10.0}, {"k": "a", "v": 20.0}])
    )
    cfg = {
        "name": "cfg-ewma",
        "source": {
            "type": "file_stream",
            "path": str(indir),
            "schema": "k string, v double",
        },
        "stateful": {"op": "ewma", "key": "k", "value": "v", "alpha": 0.5},
        "streaming": {
            "checkpoint": str(tmp_path / "ckpt"),
            "trigger": {"availableNow": True},
            "output_mode": "update",
        },
        "sink": {"type": "memory", "name": "cfg_ewma_out"},
    }
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = streaming_pipeline_from_config(cfg).start(spark)
        q.awaitTermination(120)
        got = {r.k: (r.ewma, r.n) for r in
               spark.sql("select * from cfg_ewma_out").collect()}
        assert got["a"] == (15.0, 2)  # 0.5*20 + 0.5*10
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    with pytest.raises(ValueError, match="unknown stateful op"):
        streaming_pipeline_from_config(
            {**cfg, "stateful": {"op": "zap"}}
        )


def test_streaming_config_session_gap_append_mode(spark, tmp_path):
    """Declarative TWS, Append-mode shape: the 'stateful' session_gap
    operator composed with a watermark block — closed sessions emit
    exactly once through a config-built pipeline (the ewma test
    covers Update mode; this covers event-time timers + Append)."""
    import json as _json

    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="TWS needs a google.protobuf runtime; none vendorable",
    )
    from etlp_spark.config import streaming_pipeline_from_config

    indir = tmp_path / "in"
    indir.mkdir()
    (indir / "a.jsonl").write_text(
        "\n".join(_json.dumps(r) for r in [
            {"k": "a", "ts": "2024-01-01T00:00:00"},
            {"k": "a", "ts": "2024-01-01T00:00:30"},
            # same batch, > gap later: closes the first session in-batch
            {"k": "a", "ts": "2024-01-01T00:10:00"},
        ])
    )
    cfg = {
        "name": "cfg-sessions",
        "source": {
            "type": "file_stream",
            "path": str(indir),
            "schema": "k string, ts timestamp",
        },
        "stateful": {"op": "session_gap", "key": "k", "ts": "ts",
                     "gap_seconds": 60},
        "streaming": {
            "watermark": {"col": "ts", "delay": "0 seconds"},
            "checkpoint": str(tmp_path / "ckpt"),
            "trigger": {"availableNow": True},
            "output_mode": "append",
        },
        "sink": {"type": "memory", "name": "cfg_sessions_out"},
    }
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = streaming_pipeline_from_config(cfg).start(spark)
        q.awaitTermination(120)
        rows = {(r.k, str(r.session_start), r.n_events) for r in
                spark.sql("select * from cfg_sessions_out").collect()}
        assert ("a", "2024-01-01 00:00:00", 2) in rows
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_config_upsert_parquet_sink(spark, tmp_path):
    """The merge-by-key parquet sink as config vocabulary: a second
    config-built run replaces matched keys and inserts the rest —
    last-writer-wins without a snapshot store."""
    import json as _json

    from etlp_spark.config import pipeline_from_config

    indir1 = tmp_path / "in1"
    indir1.mkdir()
    (indir1 / "a.jsonl").write_text(
        "\n".join(_json.dumps(r) for r in
                  [{"id": 1, "v": "old"}, {"id": 2, "v": "keep"}])
    )
    out = str(tmp_path / "out")

    def cfg(indir):
        return {
            "source": {"type": "file", "path": str(indir), "reducer": "jsonl",
                       "options": {"schema": "id long, v string"}},
            "transforms": [{"op": "select", "cols": ["id", "v"]}],
            "sink": {"type": "upsert_parquet", "path": out, "key": ["id"]},
        }

    pipeline_from_config(cfg(indir1)).run(spark)
    indir2 = tmp_path / "in2"
    indir2.mkdir()
    (indir2 / "b.jsonl").write_text(
        "\n".join(_json.dumps(r) for r in
                  [{"id": 1, "v": "NEW"}, {"id": 9, "v": "ins"}])
    )
    pipeline_from_config(cfg(indir2)).run(spark)
    got = {r.id: r.v for r in spark.read.parquet(out).collect()}
    assert got == {1: "NEW", 2: "keep", 9: "ins"}


def test_streaming_config_snapshot_merge_sink(spark, tmp_path):
    """ADVICE r7: the snapshot sink's 'merge' mode used to be accepted
    by streaming config then die at the first micro-batch inside
    write_batch with an unrelated error. It is now a first-class
    exactly-once streaming UPSERT: key_cols resolve at STREAM-BUILD
    time (missing -> loud config error before anything runs), and
    each micro-batch applies via SnapshotStore.merge_batch (same
    batch-watermark replay skip as write_batch)."""
    import json as _json

    from etlp_spark.config import streaming_pipeline_from_config
    from etlp_spark.connectors.snapshots import SnapshotStore

    indir = tmp_path / "in"
    indir.mkdir()
    store_path = str(tmp_path / "out")

    def cfg():
        return {
            "name": "cfg-merge",
            "source": {
                "type": "file_stream",
                "path": str(indir),
                "schema": "id long, val string",
            },
            "streaming": {
                "checkpoint": str(tmp_path / "ckpt"),
                "trigger": {"availableNow": True},
            },
            "sink": {
                "type": "snapshot",
                "path": store_path,
                "mode": "merge",
                "key_cols": ["id"],
            },
        }

    # missing key_cols fails at build time, not in foreachBatch
    bad = cfg()
    del bad["sink"]["key_cols"]
    q0 = streaming_pipeline_from_config(bad)
    with pytest.raises(ValueError, match="requires 'key_cols'"):
        q0.start(spark)

    (indir / "a.jsonl").write_text(
        "\n".join(_json.dumps(r) for r in [
            {"id": 1, "val": "a1"}, {"id": 2, "val": "a2"},
        ])
    )
    streaming_pipeline_from_config(cfg()).start(spark).awaitTermination(120)
    store = SnapshotStore(store_path)
    assert {r.id: r.val for r in store.read(spark).collect()} == {1: "a1", 2: "a2"}

    # second drop UPSERTS: id=2 replaced, id=3 inserted; version chain
    # grows by exactly one merge version (no replay duplicates)
    (indir / "b.jsonl").write_text(
        "\n".join(_json.dumps(r) for r in [
            {"id": 2, "val": "B2"}, {"id": 3, "val": "b3"},
        ])
    )
    streaming_pipeline_from_config(cfg()).start(spark).awaitTermination(120)
    assert {r.id: r.val for r in store.read(spark).collect()} == {
        1: "a1", 2: "B2", 3: "b3",
    }
    vs = store.versions()
    assert store.manifest(vs[-1])["mode"] == "merge"
    # restart with NO new data: availableNow replays nothing new; the
    # watermark skip leaves the version chain untouched
    streaming_pipeline_from_config(cfg()).start(spark).awaitTermination(120)
    assert store.versions() == vs


def test_streaming_config_sketch_ops(spark, tmp_path):
    """The round-8 sketch family as config vocabulary: 'approx_distinct'
    (HLL registers in MapState) and 'ddsketch_quantiles' (bucket
    counts) both nameable from the streaming config's stateful block,
    emitting their documented schemas with sane values."""
    import json as _json

    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="TWS needs a google.protobuf runtime; none vendorable",
    )
    from etlp_spark.config import streaming_pipeline_from_config

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        for op, extra, check in (
            (
                "approx_distinct",
                {},
                lambda rows: abs(
                    {r.k: r.est_e6 for r in rows}["a"] / 1e6 - 50
                ) / 50 < 0.25,
            ),
            (
                "ddsketch_quantiles",
                {"qs": [0.5]},
                lambda rows: any(
                    r.pct == 50 and 0 < r.est_e6 / 1e6 < 100 for r in rows
                ),
            ),
        ):
            indir = tmp_path / f"in_{op}"
            indir.mkdir()
            (indir / "a.jsonl").write_text(
                "\n".join(
                    _json.dumps({"k": "a", "v": float(i % 50) + 1.0})
                    for i in range(200)
                )
            )
            cfg = {
                "name": f"cfg-{op}",
                "source": {
                    "type": "file_stream",
                    "path": str(indir),
                    "schema": "k string, v string"
                    if op == "approx_distinct"
                    else "k string, v double",
                },
                "stateful": {"op": op, "key": "k", "value": "v", **extra},
                "streaming": {
                    "checkpoint": str(tmp_path / f"ckpt_{op}"),
                    "trigger": {"availableNow": True},
                    "output_mode": "update",
                },
                "sink": {"type": "memory", "name": f"out_{op}"},
            }
            q = streaming_pipeline_from_config(cfg).start(spark)
            q.awaitTermination(120)
            rows = spark.sql(f"select * from out_{op}").collect()
            assert rows and check(rows), (op, rows)
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_config_snapshot_sink_cluster_by(spark, tmp_path):
    """Declarative z-order (r8 verdict #4): a config-built pipeline
    whose snapshot sink carries {"cluster_by": [a, b]} gets the full
    cluster -> zone-map -> prune loop with one key — the written
    version is Morton-clustered, stats_cols default to the clustering
    columns, and read_pruned skips files on BOTH single-dim ranges
    (the library-level guarantee of
    test_zorder_sort_tightens_zone_maps_on_both_dims, reached purely
    through config). cluster_by on a merge sink is a loud config
    error — a merge rewrites only hit files, so re-clustering a
    subset would scramble the parent layout."""
    from etlp_spark.config import pipeline_from_config
    from etlp_spark.connectors.snapshots import SnapshotStore

    df = spark.range(0, 4096).selectExpr("id", "id % 64 AS a", "id div 64 AS b")
    src = str(tmp_path / "in_pq")
    df.write.parquet(src)
    store_path = str(tmp_path / "ztbl")
    cfg = {
        "source": {"type": "file", "path": src, "reducer": "parquet"},
        "transforms": [{"op": "select", "cols": ["id", "a", "b"]}],
        "sink": {"type": "snapshot", "path": store_path,
                 "cluster_by": ["a", "b"], "cluster_files": 16},
    }
    pipeline_from_config(cfg).run(spark)
    st = SnapshotStore(store_path)
    m = st.manifest(1)
    assert m["stats_cols"] == ["a", "b"]
    assert len(m["files"]) == 16

    from pyspark.sql import functions as F

    for ranges in ({"a": (10, 20)}, {"b": (10, 20)}):
        out, info = st.read_pruned(spark, ranges)
        assert info["files_read"] < info["files_total"], ranges
        (col, (lo, hi)), = ranges.items()
        want = sorted(
            r.id for r in df.where(F.col(col).between(lo, hi)).collect()
        )
        assert sorted(r.id for r in out.collect()) == want

    with pytest.raises(ValueError, match="cluster_by"):
        pipeline_from_config({
            "source": cfg["source"],
            "sink": {"type": "snapshot", "path": store_path, "mode": "merge",
                     "key_cols": ["id"], "cluster_by": ["a"]},
        })


def test_streaming_config_cusum_op(spark, tmp_path):
    """'cusum' as config vocabulary: the drift detector is nameable
    from the stateful block with integer e6 params, emits its
    documented schema, and alarms on a stream that runs persistently
    above mu + slack."""
    import json as _json

    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="TWS needs a google.protobuf runtime; none vendorable",
    )
    from etlp_spark.config import streaming_pipeline_from_config

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        indir = tmp_path / "in_cusum"
        indir.mkdir()
        (indir / "a.jsonl").write_text(
            "\n".join(
                _json.dumps({"k": "drift", "v": 15})
                for _ in range(10)
            )
            + "\n"
            + "\n".join(_json.dumps({"k": "flat", "v": 10}) for _ in range(10))
        )
        cfg = {
            "name": "cfg-cusum",
            "source": {
                "type": "file_stream",
                "path": str(indir),
                "schema": "k string, v long",
            },
            "stateful": {
                "op": "cusum",
                "key": "k",
                "value": "v",
                "mu_e6": 10_000_000,
                "slack_e6": 1_000_000,
            },
            "streaming": {
                "checkpoint": str(tmp_path / "ckpt_cusum_cfg"),
                "trigger": {"availableNow": True},
                "output_mode": "update",
            },
            "sink": {"type": "memory", "name": "out_cusum"},
        }
        q = streaming_pipeline_from_config(cfg).start(spark)
        q.awaitTermination(120)
        rows = {r.k: r for r in spark.sql("select * from out_cusum").collect()}
        # drift: 10 points at +4e6 over mu+slack → S = 40e6 > h=10e6
        assert rows["drift"].alarmed is True and rows["drift"].s_e6 == 40_000_000
        # flat: every dev is -1e6 (slack) → S stays 0
        assert rows["flat"].alarmed is False and rows["flat"].s_e6 == 0
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_config_bucketed_table_sink(spark, tmp_path):
    """'bucketed_table' as config vocabulary: a config-built pipeline
    lands a hash-bucketed table, and a join between two such runs on
    the bucket key plans WITHOUT re-shuffling either side — the
    pay-the-shuffle-once-at-ingest layout, declaratively."""
    import json as _json
    import shutil

    from etlp_spark.config import pipeline_from_config

    for t in ("cfg_bk_a", "cfg_bk_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    for side, vals in (("a", [1, 2, 3, 4]), ("b", [2, 4, 6, 8])):
        indir = tmp_path / f"in_{side}"
        indir.mkdir()
        (indir / "r.jsonl").write_text(
            "\n".join(_json.dumps({"k": v, "v": v * 10}) for v in vals)
        )
        res = pipeline_from_config(
            {
                "source": {
                    "type": "file",
                    "path": str(indir),
                    "reducer": "jsonl",
                    "options": {"schema": "k long, v long"},
                },
                "sink": {
                    "type": "bucketed_table",
                    "table": f"cfg_bk_{side}",
                    "keys": ["k"],
                    "n_buckets": 4,
                    "sort": ["k"],
                    "path": str(tmp_path / f"bk_{side}"),
                },
            }
        ).run(spark)
        assert res.rows == 4
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("cfg_bk_a").join(spark.table("cfg_bk_b"), "k")
        j.write.format("noop").mode("overwrite").save()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        assert j.count() == 2  # keys 2 and 4
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for t in ("cfg_bk_a", "cfg_bk_b"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(str(tmp_path), ignore_errors=True)


def test_streaming_config_psi_drift_op(spark, tmp_path):
    """'psi_drift' as config vocabulary: the distribution-drift
    monitor is nameable from the stateful block with a frozen
    reference histogram, emits its documented schema, and alarms on
    a key whose live values pile into the reference's rarest bin."""
    import json as _json

    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="TWS needs a google.protobuf runtime; none vendorable",
    )
    from etlp_spark.config import streaming_pipeline_from_config

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        indir = tmp_path / "in_psi"
        indir.mkdir()
        # 'match' replays the reference shape; 'shift' lives in the
        # top (rarest) bin
        (indir / "a.jsonl").write_text(
            "\n".join(
                _json.dumps({"k": "match", "v": v})
                for v in [1, 2, 3, 4, 5, 6, 11, 12, 13, 21]
            )
            + "\n"
            + "\n".join(
                _json.dumps({"k": "shift", "v": v})
                for v in [25, 27, 29, 31, 33, 35, 37, 39, 41, 43]
            )
        )
        cfg = {
            "name": "cfg-psi",
            "source": {
                "type": "file_stream",
                "path": str(indir),
                "schema": "k string, v long",
            },
            "stateful": {
                "op": "psi_drift",
                "key": "k",
                "value": "v",
                "ref_counts": [6, 3, 1],
                "bin_width": 10,
            },
            "streaming": {
                "checkpoint": str(tmp_path / "ckpt_psi_cfg"),
                "trigger": {"availableNow": True},
                "output_mode": "update",
            },
            "sink": {"type": "memory", "name": "out_psi"},
        }
        q = streaming_pipeline_from_config(cfg).start(spark)
        q.awaitTermination(120)
        rows = {r.k: r for r in spark.sql("select * from out_psi").collect()}
        assert rows["match"].n == 10 and rows["shift"].n == 10
        assert rows["shift"].drifted is True
        assert rows["match"].drifted is False
        # 'match' mirrors the reference EXACTLY -> smoothed PSI is 0
        assert rows["shift"].psi_e6 > 200_000 and rows["match"].psi_e6 == 0
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_streaming_config_ks_and_mann_whitney_ops(spark, tmp_path):
    """'ks_drift' and 'mann_whitney' as config vocabulary: both
    rank/CDF drift monitors are nameable from the stateful block
    with a frozen reference histogram whose keys arrive as STRINGS
    (JSON objects can't carry int keys — the wrapper coerces), emit
    their documented schemas, and reject a pure location shift while
    staying quiet on a replay of the reference itself."""
    import json as _json

    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="TWS needs a google.protobuf runtime; none vendorable",
    )
    from etlp_spark.config import streaming_pipeline_from_config

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        for op, out_name in (("ks_drift", "out_ks"), ("mann_whitney", "out_mw")):
            indir = tmp_path / f"in_{op}"
            indir.mkdir()
            (indir / "a.jsonl").write_text(
                "\n".join(
                    _json.dumps({"k": "match", "v": v})
                    for v in [10, 10, 20, 20, 20, 30]
                )
                + "\n"
                + "\n".join(
                    _json.dumps({"k": "shift", "v": v})
                    for v in [90, 91, 92, 93, 94, 95]
                )
            )
            cfg = {
                "name": f"cfg-{op}",
                "source": {
                    "type": "file_stream",
                    "path": str(indir),
                    "schema": "k string, v long",
                },
                "stateful": {
                    "op": op,
                    "key": "k",
                    "value": "v",
                    # string keys, as a JSON config would carry them
                    "ref_hist": {"10": 2, "20": 3, "30": 1},
                },
                "streaming": {
                    "checkpoint": str(tmp_path / f"ckpt_{op}"),
                    "trigger": {"availableNow": True},
                    "output_mode": "update",
                },
                "sink": {"type": "memory", "name": out_name},
            }
            q = streaming_pipeline_from_config(cfg).start(spark)
            q.awaitTermination(120)
            rows = {
                r.k: r for r in spark.sql(f"select * from {out_name}").collect()
            }
            assert rows["match"].n1 == 6 and rows["match"].n2 == 6
            assert rows["shift"].rejected is True, (op, rows["shift"])
            assert rows["match"].rejected is False, (op, rows["match"])
            if op == "ks_drift":
                # live doubles the reference exactly -> CDFs coincide
                assert rows["match"].d_cross == 0
                # disjoint support above -> D = 1 -> d_e6 = 1e6
                assert rows["shift"].d_e6 == 1_000_000
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_streaming_config_bootstrap_ci_op(spark, tmp_path):
    """'bootstrap_ci' as config vocabulary: nameable with key/value/id
    columns, emits its documented schema with a sane interval."""
    import json as _json

    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="TWS needs a google.protobuf runtime; none vendorable",
    )
    from etlp_spark.config import streaming_pipeline_from_config

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        indir = tmp_path / "in_boot"
        indir.mkdir()
        (indir / "a.jsonl").write_text(
            "\n".join(
                _json.dumps({"k": "m", "rid": i, "cents": 1000 + 10 * i})
                for i in range(20)
            )
        )
        cfg = {
            "name": "cfg-boot",
            "source": {
                "type": "file_stream",
                "path": str(indir),
                "schema": "k string, rid long, cents long",
            },
            "stateful": {
                "op": "bootstrap_ci",
                "key": "k",
                "value": "cents",
                "id": "rid",
            },
            "streaming": {
                "checkpoint": str(tmp_path / "ckpt_boot_cfg"),
                "trigger": {"availableNow": True},
                "output_mode": "update",
            },
            "sink": {"type": "memory", "name": "out_boot"},
        }
        q = streaming_pipeline_from_config(cfg).start(spark)
        q.awaitTermination(120)
        row = spark.sql("select * from out_boot").collect()[-1]
        assert row.n == 20
        assert row.boot_lo_cents <= row.est_cents <= row.boot_hi_cents
        assert row.boot_lo_cents < row.boot_hi_cents
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_streaming_config_conformal_op(spark, tmp_path):
    """'conformal' as config vocabulary: the split-conformal twin is
    nameable with key/value/id columns and emits its documented
    schema — even ids calibrate, odd ids are scored, coverage rides
    the emitted row (the r11-verdict item 6 twin joins the family
    registry beside cusum/psi/ks/mann_whitney/bootstrap_ci)."""
    import json as _json

    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="TWS needs a google.protobuf runtime; none vendorable",
    )
    from etlp_spark.config import streaming_pipeline_from_config

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        indir = tmp_path / "in_conf"
        indir.mkdir()
        # even rids (calibration): cents 1000..1090; odd rids (eval):
        # 9 inliers + one wild outlier the interval must not cover
        rows = [
            {"k": "m", "rid": 2 * i, "cents": 1000 + 10 * i}
            for i in range(10)
        ] + [
            {"k": "m", "rid": 2 * i + 1, "cents": 1040}
            for i in range(9)
        ] + [{"k": "m", "rid": 99, "cents": 50_000}]
        (indir / "a.jsonl").write_text(
            "\n".join(_json.dumps(r) for r in rows)
        )
        cfg = {
            "name": "cfg-conformal",
            "source": {
                "type": "file_stream",
                "path": str(indir),
                "schema": "k string, rid long, cents long",
            },
            "stateful": {
                "op": "conformal",
                "key": "k",
                "value": "cents",
                "id": "rid",
            },
            "streaming": {
                "checkpoint": str(tmp_path / "ckpt_conf_cfg"),
                "trigger": {"availableNow": True},
                "output_mode": "update",
            },
            "sink": {"type": "memory", "name": "out_conf"},
        }
        q = streaming_pipeline_from_config(cfg).start(spark)
        q.awaitTermination(120)
        row = spark.sql("select * from out_conf").collect()[-1]
        assert row.n_cal == 10 and row.n_eval == 10
        # mu = 1045 (trunc div of 10450/10), residuals 5..45 ->
        # kr = min(ceil(0.9*11), 10) = 10 -> q_hat = max residual 45
        assert row.q_hat_cents == 45
        # the 9 inliers (|1040-1045|=5 <= 45) covered, outlier not
        assert row.covered == 9 and row.coverage_e6 == 900_000
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_streaming_config_funnel_op(spark, tmp_path):
    """'funnel' as config vocabulary: the ordered-funnel twin is
    nameable with key/type/ts columns and custom steps, and emits
    its documented schema — the r12-verdict item 8 twin joins the
    family registry beside conformal/bootstrap_ci/etc."""
    import json as _json

    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="TWS needs a google.protobuf runtime; none vendorable",
    )
    from etlp_spark.config import streaming_pipeline_from_config

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        indir = tmp_path / "in_funnel"
        indir.mkdir()
        rows = [
            {"k": "u1", "et": "install", "ts": 100},
            {"k": "u1", "et": "open", "ts": 150},
            {"k": "u1", "et": "open", "ts": 90},      # precedes install
            {"k": "u2", "et": "open", "ts": 10},      # no install at all
        ]
        (indir / "a.jsonl").write_text(
            "\n".join(_json.dumps(r) for r in rows)
        )
        cfg = {
            "name": "cfg-funnel",
            "source": {
                "type": "file_stream",
                "path": str(indir),
                "schema": "k string, et string, ts long",
            },
            "stateful": {
                "op": "funnel",
                "key": "k",
                "type": "et",
                "ts": "ts",
                "steps": ["install", "open"],
            },
            "streaming": {
                "checkpoint": str(tmp_path / "ckpt_funnel_cfg"),
                "trigger": {"availableNow": True},
                "output_mode": "update",
            },
            "sink": {"type": "memory", "name": "out_funnel"},
        }
        q = streaming_pipeline_from_config(cfg).start(spark)
        q.awaitTermination(120)
        got = {r.k: (r.stage, r.ts0_us, r.ts1_us)
               for r in spark.sql("select * from out_funnel").collect()}
        assert got["u1"] == (2, 100, 150)  # open@90 excluded (before)
        assert got["u2"] == (0, None, None)
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
