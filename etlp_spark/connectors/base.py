"""Connector protocol (ref: ``src/etlp/connector/protocols.clj:4-13``).

The reference defines two protocols and a multimethod dispatcher:

    EtlpSource:      spec / check / discover / read!
    EtlpDestination: spec / check / write!
    (etlp-source op src)  — op ∈ {:read :spec :check :discover}
    (etlp-destination op dest) — op ∈ {:write :spec :check}
    (``src/etlp/connector/core.clj:6-30``)

Here they are ABCs with typed results; ``discover`` derives the
Airbyte-style stream catalog from the real DataFrame schema instead
of hand-written JSON-Schema (the reference hand-writes it, e.g.
``src/etlp/processors/stdin.clj:26-38``), and ``check`` is a cheap
``limit(0)`` probe instead of a side-effecting read.

On the Airbyte ``State`` parameter (``doc/intro.md`` cites
``read(Config, Catalog, State)``): the reference's ``read!`` takes no
state — its incremental story is aspirational. Here the State slot
maps onto Spark-native mechanisms instead of a bespoke cursor API:
**Structured Streaming checkpoints** (``streaming.file_stream`` + a
``checkpointLocation`` is exactly resumable incremental reading —
offsets ARE the state, fault-tolerant and exactly-once into
idempotent sinks), and for batch back-fills the scan-level
``modifiedAfter`` option / partition-pruning predicates carry the
watermark. The x38 incremental-dedup query shows the same pattern at
the table level (fingerprint-store anti-join).
"""

from __future__ import annotations

import abc
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


@dataclass(frozen=True)
class CheckResult:
    ok: bool
    message: str = ""


@dataclass(frozen=True)
class WriteResult:
    rows: int
    target: str
    extra: dict[str, Any] = field(default_factory=dict)


def _json_schema(schema: StructType) -> dict[str, Any]:
    """StructType → JSON-Schema-flavored dict (what the reference's
    ``discover`` returns, ``src/etlp/processors/stdin.clj:30-38``)."""
    type_map = {
        "string": "string",
        "long": "integer",
        "int": "integer",
        "integer": "integer",
        "double": "number",
        "float": "number",
        "boolean": "boolean",
        "timestamp": "string",
        "date": "string",
        "binary": "string",
    }
    props = {}
    for f in schema.fields:
        name = f.dataType.typeName()
        props[f.name] = {"type": type_map.get(name, name)}
    return {"type": "object", "properties": props}


class Source(abc.ABC):
    """A data source. ``read`` returns a DataFrame (lazy — nothing
    moves until an action, which is Spark's version of the
    channel-pull in the reference)."""

    stream_name: str = "etlp-stream"

    @abc.abstractmethod
    def spec(self) -> dict[str, Any]:
        """Static connector descriptor (config surface)."""

    @abc.abstractmethod
    def read(self, spark: SparkSession) -> DataFrame: ...

    def check(self, spark: SparkSession) -> CheckResult:
        try:
            self.read(spark).limit(0).collect()
            return CheckResult(True)
        except Exception as e:  # noqa: BLE001 — connector probe reports, never raises
            return CheckResult(False, f"{type(e).__name__}: {e}")

    def discover(self, spark: SparkSession) -> dict[str, Any]:
        df = self.read(spark)
        return {"streams": [{"stream_name": self.stream_name, "schema": _json_schema(df.schema)}]}


class Destination(abc.ABC):
    @abc.abstractmethod
    def spec(self) -> dict[str, Any]: ...

    @abc.abstractmethod
    def write(self, df: DataFrame) -> WriteResult: ...

    def check(self, spark: SparkSession) -> CheckResult:
        return CheckResult(True)
