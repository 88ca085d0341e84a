"""Connectors: Airbyte-style ``spec``/``check``/``discover`` sources
and ``spec``/``check``/``write`` destinations over Spark's native
readers/writers (ref: ``src/etlp/connector/protocols.clj:4-13``,
``doc/intro.md:7-27``)."""

from etlp_spark.connectors.base import CheckResult, Destination, Source, WriteResult
from etlp_spark.connectors.files import (
    ConsoleSink,
    CsvSource,
    JsonLinesSource,
    OrcSource,
    ParquetSink,
    ParquetSource,
    TextFileSource,
)
from etlp_spark.connectors.jdbc import JdbcSink, JdbcSource
from etlp_spark.connectors.http import HttpPollingSource
from etlp_spark.connectors.snapshots import SnapshotSink, SnapshotSource, SnapshotStore

__all__ = [
    "Source",
    "Destination",
    "CheckResult",
    "WriteResult",
    "TextFileSource",
    "JsonLinesSource",
    "CsvSource",
    "OrcSource",
    "ParquetSource",
    "ParquetSink",
    "ConsoleSink",
    "JdbcSource",
    "JdbcSink",
    "HttpPollingSource",
    "SnapshotStore",
    "SnapshotSource",
    "SnapshotSink",
]
