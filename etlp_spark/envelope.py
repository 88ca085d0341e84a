"""The ETLP wire envelope (ref: ``src/etlp/utils/core.clj:4-20``).

The only schema the reference framework imposes: every record/error/
log message is wrapped as

    {:type t :timestamp millis :version "0.1.0" :schema "etlp_raw"
     :source_stream "etlp-stream" :data data}

and JSON-encoded. Here the constructors are Column-producing
functions (``F.to_json(F.struct(...))``) so wrapping happens JVM-side
inside codegen, never in Python.

``timestamp`` defaults to the current epoch millis like the
reference's ``(System/currentTimeMillis)`` — pass an explicit value
for deterministic output (tests/oracles freeze it to 0; SURVEY.md
§4.2 flags the wall-clock stamp as nondeterministic).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

__all__ = ["ENVELOPE", "ENVELOPE_VERSION", "wrap", "wrap_record", "wrap_error", "wrap_log", "unwrap"]

ENVELOPE_VERSION = "0.1.0"
ENVELOPE_SCHEMA_NAME = "etlp_raw"
ENVELOPE_SOURCE_STREAM = "etlp-stream"

ENVELOPE = StructType(
    [
        StructField("type", StringType()),  # 'record' | 'error' | 'log'
        StructField("timestamp", LongType()),  # epoch millis
        StructField("version", StringType()),
        StructField("schema", StringType()),
        StructField("source_stream", StringType()),
        StructField("data", StringType()),
    ]
)


def wrap(kind: str, data: Column, timestamp: int | Column | None = None) -> Column:
    """Build the JSON envelope string for ``data`` (a string column)."""
    if timestamp is None:
        ts: Column = (F.unix_timestamp(F.current_timestamp()) * 1000).cast("long")
    elif isinstance(timestamp, int):
        ts = F.lit(timestamp).cast("long")
    else:
        ts = timestamp.cast("long")
    return F.to_json(
        F.struct(
            F.lit(kind).alias("type"),
            ts.alias("timestamp"),
            F.lit(ENVELOPE_VERSION).alias("version"),
            F.lit(ENVELOPE_SCHEMA_NAME).alias("schema"),
            F.lit(ENVELOPE_SOURCE_STREAM).alias("source_stream"),
            data.cast("string").alias("data"),
        )
    )


def wrap_record(data: Column, timestamp: int | Column | None = None) -> Column:
    return wrap("record", data, timestamp)


def wrap_error(data: Column, timestamp: int | Column | None = None) -> Column:
    return wrap("error", data, timestamp)


def wrap_log(data: Column, timestamp: int | Column | None = None) -> Column:
    return wrap("log", data, timestamp)


def unwrap(envelope: Column) -> Column:
    """Parse an envelope JSON string back into its struct."""
    return F.from_json(envelope, ENVELOPE)
