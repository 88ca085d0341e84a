"""Config-driven pipeline construction — the reference's Integrant
config map (``src/etlp/core.clj:40-73``: ``::mapper``/``::config``/
``::options``/``::connection`` wired by ``ig/init``) re-expressed as
a plain declarative dict (JSON/YAML-shaped) → ``Pipeline``.

The reference's users describe a pipeline as DATA and hand it to the
framework; switching engines means their configs must keep working
as data. This module is that surface: every source/transform/
expectation/sink is named by string and parameterized by plain
values, so a config can live in a file, a database row, or an API
payload — no Python in the hot seat.

Shape::

    {
      "name": "orders-clean",
      "source":   {"type": "file", "path": "/in", "reducer": "jsonl",
                   "options": {"schema": "id long, v double"}},
      "transforms": [
        {"op": "filter",  "expr": "v > 0"},
        {"op": "map",     "cols": {"v2": "v * 2"}},
        {"op": "explode", "col": "tags", "out": "tag"},
        {"op": "keep",    "expr": "get_json_object(raw, '$.k')",
                          "out": "k"},
        {"op": "mapping", "template": {...}},   # JUTE template (M1)
      ],
      "expectations": [
        {"check": "not_null", "cols": ["id"]},
        {"check": "in_range", "col": "v", "lo": 0, "hi": 100},
        {"check": "accepted_values", "col": "k", "values": ["a", "b"]},
        {"check": "matches", "col": "k", "pattern": "^[ab]$"},
        {"check": "unique", "cols": ["id"]},
      ],
      "sink":       {"type": "parquet", "path": "/out"},
      "error_sink": {"type": "parquet", "path": "/errors"},
    }

Unknown component names raise ``ValueError`` listing what IS
registered — the reference's ``IllegalArgumentException`` behavior
(``src/etlp/core.clj:28-30``).

YAML: any loader that yields this dict works (``yaml.safe_load``);
the module deliberately takes dicts, not files, so it has no parser
dependency.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import functions as F

from etlp_spark import expectations as X
from etlp_spark import ops
from etlp_spark.pipeline import Pipeline

__all__ = ["pipeline_from_config", "SOURCE_TYPES", "SINK_TYPES", "TRANSFORM_OPS"]


def _file_source(cfg: dict[str, Any]):
    from etlp_spark.connectors.files import make_source

    return make_source(
        cfg["path"], reducer=cfg.get("reducer", "jsonl"), **cfg.get("options", {})
    )


def _snapshot_source(cfg: dict[str, Any]):
    from etlp_spark.connectors.snapshots import SnapshotSource

    return SnapshotSource(cfg["path"], version=cfg.get("version"))


def _http_source(cfg: dict[str, Any]):
    from etlp_spark.connectors.http import HttpPollingSource

    return HttpPollingSource(cfg["url"], **cfg.get("options", {}))  # api_url first


SOURCE_TYPES: dict[str, Callable[[dict[str, Any]], Any]] = {
    "file": _file_source,
    "snapshot": _snapshot_source,
    "http": _http_source,
}


def _parquet_sink(cfg: dict[str, Any]):
    from etlp_spark.connectors.files import ParquetSink

    return ParquetSink(
        cfg["path"],
        mode=cfg.get("mode", "overwrite"),
        partition_by=tuple(cfg.get("partition_by", ())),
    )


def _console_sink(cfg: dict[str, Any]):
    from etlp_spark.connectors.files import ConsoleSink

    return ConsoleSink(limit=cfg.get("limit", 20))


def _snapshot_sink(cfg: dict[str, Any]):
    from etlp_spark.connectors.snapshots import SnapshotSink

    return SnapshotSink(cfg["path"], mode=cfg.get("mode", "snapshot"))


def _jdbc_sink(cfg: dict[str, Any]):
    from etlp_spark.connectors.jdbc import JdbcSink

    return JdbcSink(cfg["url"], cfg["table"], **cfg.get("options", {}))


SINK_TYPES: dict[str, Callable[[dict[str, Any]], Any]] = {
    "parquet": _parquet_sink,
    "console": _console_sink,
    "snapshot": _snapshot_sink,
    "jdbc": _jdbc_sink,
}


def _t_filter(cfg):
    return ops.where(F.expr(cfg["expr"]))


def _t_map(cfg):
    return ops.map_cols(**{k: F.expr(v) for k, v in cfg["cols"].items()})


def _t_explode(cfg):
    return ops.flatten(cfg["col"], cfg["out"], keep=cfg.get("keep"))


def _t_keep(cfg):
    return ops.keep(F.expr(cfg["expr"]), cfg["out"])


def _t_select(cfg):
    cols = list(cfg["cols"])
    return lambda df: df.select(*cols)


def _t_mapping(cfg):
    from etlp_spark.mapping import apply_template

    tmpl = cfg["template"]
    return lambda df: apply_template(df, tmpl)


TRANSFORM_OPS: dict[str, Callable[[dict[str, Any]], Any]] = {
    "filter": _t_filter,
    "map": _t_map,
    "explode": _t_explode,
    "keep": _t_keep,
    "select": _t_select,
    "mapping": _t_mapping,
}

_CHECKS: dict[str, Callable[[dict[str, Any]], X.Check]] = {
    "not_null": lambda c: X.not_null(*c["cols"]),
    "in_range": lambda c: X.in_range(c["col"], c["lo"], c["hi"]),
    "accepted_values": lambda c: X.accepted_values(c["col"], c["values"]),
    "matches": lambda c: X.matches(c["col"], c["pattern"]),
    "unique": lambda c: X.unique(*c["cols"]),
    "predicate": lambda c: X.predicate(
        c.get("name", "predicate"), lambda df, e=c["expr"]: F.expr(e)
    ),
}


def _lookup(registry: dict, kind: str, name: str):
    if name not in registry:
        raise ValueError(
            f"unknown {kind} {name!r}; registered: {sorted(registry)}"
        )
    return registry[name]


def _discriminator(cfg: dict[str, Any], key: str, kind: str) -> str:
    """Config dicts are EXTERNAL data (file/DB/API payload) — a
    missing discriminator must be a loud config error, not a bare
    KeyError from library internals."""
    if key not in cfg:
        raise ValueError(
            f"{kind} config is missing its {key!r} field: {cfg!r}"
        )
    return cfg[key]


def pipeline_from_config(cfg: dict[str, Any]) -> Pipeline:
    """Build a ``Pipeline`` from a declarative dict (see module doc).
    ``source`` is required; everything else optional. Registries are
    module-level dicts — extend ``SOURCE_TYPES`` / ``SINK_TYPES`` /
    ``TRANSFORM_OPS`` to plug in custom components, exactly the
    reference's ``etlp-component`` extension point
    (``src/etlp/core.clj:15-30``)."""
    if "source" not in cfg:
        raise ValueError(f"pipeline config is missing 'source': {cfg!r}")
    src_cfg = cfg["source"]
    source = _lookup(
        SOURCE_TYPES, "source type", _discriminator(src_cfg, "type", "source")
    )(src_cfg)
    transforms = [
        _lookup(TRANSFORM_OPS, "transform op", _discriminator(t, "op", "transform"))(t)
        for t in cfg.get("transforms", ())
    ]
    checks = [
        _lookup(_CHECKS, "expectation check",
                _discriminator(c, "check", "expectation"))(c)
        for c in cfg.get("expectations", ())
    ]
    sink = None
    if "sink" in cfg:
        sink = _lookup(
            SINK_TYPES, "sink type", _discriminator(cfg["sink"], "type", "sink")
        )(cfg["sink"])
    error_sink = None
    if "error_sink" in cfg:
        error_sink = _lookup(
            SINK_TYPES, "sink type",
            _discriminator(cfg["error_sink"], "type", "error_sink"),
        )(cfg["error_sink"])
    return Pipeline(
        source=source,
        transforms=transforms,
        sink=sink,
        name=cfg.get("name", "etlp-stream"),
        expectations=checks,
        error_sink=error_sink,
    )
