"""Declarative document-mapping DSL — the JUTE-equivalent layer
(ref: ``src/etlp/utils/mapper.clj:7-48``; JUTE dependency at
``project.clj:9``).

The reference fetches YAML templates over HTTP, compiles them with
JUTE into transform functions, and keeps a per-alias registry in
which *compile errors are stored as strings* (``mapper.clj:44-47``).
This module keeps that surface but compiles templates to **Column
expression trees** — the mapping runs inside Catalyst/codegen, not in
a per-record interpreter, which is the difference between scan-speed
and Python-speed at 100 TB.

Template language (a JUTE-inspired subset):

- literals: numbers, booleans, plain strings
- path refs: ``"$.a.b"`` → input column ``a.b``; inside ``$map``,
  ``"$var.field"`` → the bound lambda variable
- interpolation: ``"{{ $.a }}-{{ $.b }}"`` → concat
- ``{"$if": ref, "$then": tmpl, "$else": tmpl}`` — null/false test
- ``{"$map": "$.items", "$as": "it", "$body": tmpl}`` → ``transform``
- ``{"$filter": "$.items", "$as": "it", "$cond": tmpl}`` → ``filter``
- ``{"$let": {name: tmpl, ...}, "$body": tmpl}`` → scoped bindings
- ``{"$concat": [tmpl, ...]}`` → string concat
- ``{"$coalesce": [tmpl, ...]}``
- ``{"$switch": tmpl, "$cases": {key: tmpl, ...}, "$default": tmpl}``
  — value matched to case keys by string equality
- ``{"$reduce": arr, "$as": [acc, item], "$init": tmpl, "$body":
  tmpl}`` → ordered left fold (``aggregate``)
- ``{"$call": name, "$args": [tmpl, ...]}`` — whitelisted scalar
  functions (``_CALL_FNS``) whose Python twins match Spark exactly
- any other dict → ``named_struct`` of its fields
- list → ``array`` of compiled elements

Escape hatch: templates that can't compile to Columns can run in a
``mapInPandas`` interpreter (``apply_interpreted``) — same template,
Python semantics, Arrow-batched; use only when the declarative subset
genuinely can't express the mapping.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "compile_template",
    "apply_template",
    "apply_interpreted",
    "interp_template",
    "MappingRegistry",
    "TemplateError",
]


class TemplateError(ValueError):
    pass


#: whitelisted ``$call`` scalar functions. Only functions whose Python
#: twin (used by the interpreter) matches Spark semantics exactly are
#: listed — e.g. round() is deliberately absent (Python rounds
#: half-even, Spark half-up).
_CALL_FNS: dict[str, Callable[..., Column]] = {
    "upper": lambda c: F.upper(c.cast("string")),
    "lower": lambda c: F.lower(c.cast("string")),
    "trim": lambda c: F.trim(c.cast("string")),
    "length": lambda c: F.length(c.cast("string")),
    "abs": F.abs,
}


_INTERP = re.compile(r"\{\{\s*([^}]+?)\s*\}\}")


def _root_ref(path: str) -> Column:
    return F.col(path)


def compile_template(tmpl: Any, scope: dict[str, Column] | None = None) -> Column:
    """Template → Column. ``scope`` maps bound variable names to
    Columns; the root scope entry ``""`` is special-cased: ``$.a.b``
    compiles to ``F.col("a.b")`` directly so Catalyst sees a plain
    column reference (prunable, pushable)."""
    scope = scope if scope is not None else {}

    if isinstance(tmpl, (int, float, bool)) or tmpl is None:
        return F.lit(tmpl)

    if isinstance(tmpl, str):
        if _INTERP.search(tmpl):
            parts: list[Column] = []
            pos = 0
            for m in _INTERP.finditer(tmpl):
                if m.start() > pos:
                    parts.append(F.lit(tmpl[pos : m.start()]))
                parts.append(_compile_ref(m.group(1), scope).cast("string"))
                pos = m.end()
            if pos < len(tmpl):
                parts.append(F.lit(tmpl[pos:]))
            return F.concat(*parts)
        if tmpl.startswith("$"):
            return _compile_ref(tmpl, scope)
        return F.lit(tmpl)

    if isinstance(tmpl, list):
        return F.array(*[compile_template(t, scope) for t in tmpl])

    if isinstance(tmpl, dict):
        if "$if" in tmpl:
            cond = compile_template(tmpl["$if"], scope)
            then = compile_template(tmpl.get("$then"), scope)
            other = compile_template(tmpl.get("$else"), scope)
            return F.when(cond.isNotNull() & (cond.cast("string") != "false"), then).otherwise(other)
        if "$map" in tmpl:
            arr = compile_template(tmpl["$map"], scope)
            var = tmpl.get("$as", "this")
            body = tmpl.get("$body")
            return F.transform(arr, lambda x: compile_template(body, {**scope, var: x}))
        if "$filter" in tmpl:
            arr = compile_template(tmpl["$filter"], scope)
            var = tmpl.get("$as", "this")
            cond = tmpl.get("$cond")

            def keep(x: Column) -> Column:
                c = compile_template(cond, {**scope, var: x})
                return c.isNotNull() & (c.cast("string") != "false")

            return F.filter(arr, keep)
        if "$let" in tmpl:
            bound = dict(scope)
            for name, sub in tmpl["$let"].items():
                bound[name] = compile_template(sub, bound)
            return compile_template(tmpl.get("$body"), bound)
        if "$concat" in tmpl:
            return F.concat(*[compile_template(t, scope).cast("string") for t in tmpl["$concat"]])
        if "$coalesce" in tmpl:
            return F.coalesce(*[compile_template(t, scope) for t in tmpl["$coalesce"]])
        if "$switch" in tmpl:
            # value matched against case KEYS by string equality —
            # engine-portable; a null switch value takes $default
            val = compile_template(tmpl["$switch"], scope).cast("string")
            default = compile_template(tmpl.get("$default"), scope)
            expr = None
            for k, sub in tmpl.get("$cases", {}).items():
                cond = val == F.lit(str(k))
                branch = compile_template(sub, scope)
                expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
            return default if expr is None else expr.otherwise(default)
        if "$reduce" in tmpl:
            # {"$reduce": arr, "$as": [acc, item], "$init": t, "$body": t}
            # — ordered left fold; $init's type fixes the accumulator
            # type (Spark aggregate() requirement)
            arr = compile_template(tmpl["$reduce"], scope)
            acc_name, item_name = tmpl.get("$as", ["acc", "this"])
            init = compile_template(tmpl.get("$init"), scope)
            body = tmpl.get("$body")
            return F.aggregate(
                arr,
                init,
                lambda acc, x: compile_template(
                    body, {**scope, acc_name: acc, item_name: x}
                ),
            )
        if "$call" in tmpl:
            fn = _CALL_FNS.get(tmpl["$call"])
            if fn is None:
                raise TemplateError(
                    f"unknown $call function {tmpl['$call']!r}; "
                    f"allowed: {sorted(_CALL_FNS)}"
                )
            args = [compile_template(t, scope) for t in tmpl.get("$args", [])]
            return fn(*args)
        unknown = [k for k in tmpl if k.startswith("$")]
        if unknown:
            raise TemplateError(f"unknown directive(s) {unknown}")
        return F.struct(*[compile_template(v, scope).alias(k) for k, v in tmpl.items()])

    raise TemplateError(f"cannot compile template node of type {type(tmpl).__name__}")


def _compile_ref(ref: str, scope: dict[str, Column]) -> Column:
    body = ref[1:]
    if body.startswith("."):
        path = body[1:]
        if not path:
            raise TemplateError("bare '$.' reference")
        return _root_ref(path)
    var, _, path = body.partition(".")
    if var not in scope:
        raise TemplateError(f"unbound variable {var!r} in reference {ref!r}")
    col = scope[var]
    for part in path.split(".") if path else []:
        col = col.getField(part)
    return col


def apply_template(df: DataFrame, tmpl: dict[str, Any]) -> DataFrame:
    """Top-level template dict → one output column per key."""
    return df.select(*[compile_template(v).alias(k) for k, v in tmpl.items()])


@dataclass
class MappingRegistry:
    """Per-alias template registry (ref ``fetch-mappings``,
    ``mapper.clj:40-48``): loads templates by alias, compiles them,
    and — like the reference — stores compile *errors as strings*
    under the alias instead of raising."""

    loader: Callable[[str], Any] | None = None
    base_dir: str | None = None
    entries: dict[str, Any] = field(default_factory=dict)

    def _load(self, mapping_id: str) -> Any:
        if self.loader is not None:
            return self.loader(mapping_id)
        if self.base_dir is None:
            raise TemplateError("MappingRegistry needs a loader or base_dir")
        import yaml

        path = Path(self.base_dir) / f"{mapping_id}.yaml"
        return yaml.safe_load(path.read_text())

    def fetch(self, specs: dict[str, str]) -> dict[str, Any]:
        """``{alias: mapping_id}`` → populate ``entries`` with either a
        compiled transform ``DataFrame -> DataFrame`` or the error
        string."""
        for alias, mapping_id in specs.items():
            try:
                tmpl = self._load(mapping_id)
                # eager compile so errors surface at fetch time
                for k, v in tmpl.items():
                    compile_template(v)
                self.entries[alias] = _CompiledMapping(tmpl)
            except Exception as e:  # noqa: BLE001 — ref stores errors as strings
                self.entries[alias] = f"{type(e).__name__}: {e}"
        return self.entries


@dataclass(frozen=True)
class _CompiledMapping:
    template: dict[str, Any]

    def __call__(self, df: DataFrame) -> DataFrame:
        return apply_template(df, self.template)


def interp_template(node: Any, row: dict[str, Any], scope: dict[str, Any] | None = None) -> Any:
    """Pure-Python evaluator for the SAME template language
    ``compile_template`` compiles — directives, interpolation, nested
    ``$map`` scopes and all. Kept semantics-identical to the compiled
    path (the parity test in tests/test_mapping.py pins this), so
    ``apply_interpreted`` is a true drop-in fallback."""
    scope = scope if scope is not None else {}

    def deref(ref: str) -> Any:
        body = ref[1:]
        if body.startswith("."):
            if not body[1:]:
                raise TemplateError("bare '$.' reference")  # parity w/ compiler
            cur: Any = row
            parts = body[1:].split(".")
        else:
            var, _, path = body.partition(".")
            if var not in scope:
                raise TemplateError(f"unbound variable {var!r} in reference {ref!r}")
            cur = scope[var]
            parts = path.split(".") if path else []
        for part in parts:
            if cur is None:
                return None
            cur = cur.get(part) if isinstance(cur, dict) else getattr(cur, part, None)
        return cur

    def as_str(v: Any) -> str:
        # match Spark's cast-to-string for the types templates produce
        # (bool renders lowercase; floats/ints/strings agree already)
        if isinstance(v, bool):
            return "true" if v else "false"
        return str(v)

    if isinstance(node, (int, float, bool)) or node is None:
        return node

    if isinstance(node, str):
        if _INTERP.search(node):
            out: list[str] = []
            pos = 0
            for m in _INTERP.finditer(node):
                if m.start() > pos:
                    out.append(node[pos : m.start()])
                v = interp_template(m.group(1), row, scope)
                if v is None:  # concat of NULL → NULL, like Spark/SQL
                    return None
                out.append(as_str(v))
                pos = m.end()
            if pos < len(node):
                out.append(node[pos:])
            return "".join(out)
        if node.startswith("$"):
            return deref(node)
        return node

    if isinstance(node, list):
        return [interp_template(t, row, scope) for t in node]

    if isinstance(node, dict):
        if "$if" in node:
            cond = interp_template(node["$if"], row, scope)
            truthy = cond is not None and as_str(cond) != "false"
            return interp_template(node.get("$then") if truthy else node.get("$else"), row, scope)
        if "$map" in node:
            arr = interp_template(node["$map"], row, scope)
            var = node.get("$as", "this")
            body = node.get("$body")
            if arr is None:
                return None
            return [interp_template(body, row, {**scope, var: x}) for x in arr]
        if "$filter" in node:
            arr = interp_template(node["$filter"], row, scope)
            var = node.get("$as", "this")
            cond = node.get("$cond")
            if arr is None:
                return None
            return [
                x
                for x in arr
                if (c := interp_template(cond, row, {**scope, var: x})) is not None
                and as_str(c) != "false"
            ]
        if "$let" in node:
            bound = dict(scope)
            for name, sub in node["$let"].items():
                bound[name] = interp_template(sub, row, bound)
            return interp_template(node.get("$body"), row, bound)
        if "$concat" in node:
            vals = [interp_template(t, row, scope) for t in node["$concat"]]
            if any(v is None for v in vals):
                return None
            return "".join(as_str(v) for v in vals)
        if "$coalesce" in node:
            for t in node["$coalesce"]:
                v = interp_template(t, row, scope)
                if v is not None:
                    return v
            return None
        if "$switch" in node:
            v = interp_template(node["$switch"], row, scope)
            for k, sub in node.get("$cases", {}).items():
                if v is not None and as_str(v) == str(k):
                    return interp_template(sub, row, scope)
            return interp_template(node.get("$default"), row, scope)
        if "$reduce" in node:
            arr = interp_template(node["$reduce"], row, scope)
            acc_name, item_name = node.get("$as", ["acc", "this"])
            acc = interp_template(node.get("$init"), row, scope)
            body = node.get("$body")
            if arr is None:
                return None
            for x in arr:
                acc = interp_template(body, row, {**scope, acc_name: acc, item_name: x})
            return acc
        if "$call" in node:
            name = node["$call"]
            vals = [interp_template(t, row, scope) for t in node.get("$args", [])]
            py = {
                "upper": lambda v: None if v is None else as_str(v).upper(),
                "lower": lambda v: None if v is None else as_str(v).lower(),
                "trim": lambda v: None if v is None else as_str(v).strip(),
                "length": lambda v: None if v is None else len(as_str(v)),
                "abs": lambda v: None if v is None else abs(v),
            }.get(name)
            if py is None:
                raise TemplateError(
                    f"unknown $call function {name!r}; allowed: {sorted(_CALL_FNS)}"
                )
            return py(*vals)
        unknown = [k for k in node if k.startswith("$")]
        if unknown:
            raise TemplateError(f"unknown directive(s) {unknown}")
        return {k: interp_template(v, row, scope) for k, v in node.items()}

    raise TemplateError(f"cannot interpret template node of type {type(node).__name__}")


def apply_interpreted(df: DataFrame, tmpl: dict[str, Any], schema: str):
    """Escape-hatch interpreter in ``mapInPandas`` for templates the
    Column subset can't express. Same template semantics as the
    compiled path (``interp_template``), Python speed, Arrow-batched —
    keep off the hot path."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            records = pdf.to_dict("records")
            yield pd.DataFrame(
                [{k: interp_template(v, r) for k, v in tmpl.items()} for r in records]
            )

    return df.mapInPandas(kernel, schema)


def http_loader(base_url: str, transport=None):
    """Loader fetching templates over HTTP like the reference
    (``mapper.clj:27-38``: GET {base-url}/mappings/{id}, YAML parse).

    ``transport(url) -> bytes`` is injectable for tests; default uses
    urllib (which also serves file:// URLs).
    """
    import urllib.request

    import yaml

    def _fetch(mapping_id: str):
        url = f"{base_url.rstrip('/')}/mappings/{mapping_id}"
        if transport is not None:
            body = transport(url)
        else:
            with urllib.request.urlopen(url) as resp:  # noqa: S310 — connector by design
                body = resp.read()
        return yaml.safe_load(body)

    return _fetch
