"""File sources/sinks (ref: S3-S6, K1-K2 in SURVEY.md §2.1).

- ``TextFileSource``: line-scan reader (ref ``read-lines``,
  ``src/etlp/utils/reducers.clj:18-34``) — ``spark.read.text`` over a
  file/dir/glob; directory listing (ref ``files-processor``,
  ``reducers.clj:9-15``) is Spark's native glob handling.
- ``JsonLinesSource``: the reference's ``json-reducer``
  (``reducers.clj:43-52``): JSON per line + ``{:file path}``
  provenance merge → ``from_json`` + ``input_file_name()``, with the
  reference's log-and-continue error behavior
  (``src/etlp/connector/dag.clj:39-45``) mapped to PERMISSIVE parse +
  a separated errors DataFrame.
- ``ConsoleSink``: the stdout destination (K1,
  ``src/etlp/processors/stdout.clj:29-58``) — prints a bounded sample
  and tracks the running record count via ``observe`` (the
  reference's atom-held count, ``stdout.clj:20-27``, without the
  cross-batch side effects Spark can't order).

Scale notes: file sources are plain DataFrameReader scans — splittable,
predicate-pushing, partition-pruning. Nothing here collects to the
driver except the console sample (explicitly bounded).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType

from etlp_spark.connectors.base import Destination, Source, WriteResult


@dataclass
class TextFileSource(Source):
    path: str
    stream_name: str = "text-stream"
    with_provenance: bool = True

    def spec(self) -> dict[str, Any]:
        return {"type": "file/text", "path": self.path, "provenance": self.with_provenance}

    def read(self, spark: SparkSession) -> DataFrame:
        df = spark.read.text(self.path)
        if self.with_provenance:
            df = df.withColumn("file", F.input_file_name())
        return df


@dataclass
class JsonLinesSource(Source):
    """JSON-lines with schema + error routing.

    ``read`` returns good records (parsed columns + ``file``
    provenance); ``errors_of`` splits out unparseable lines as an
    error DataFrame (reference behavior: log & continue — E1/E2).
    """

    path: str
    schema: StructType | str | None = None
    stream_name: str = "jsonl-stream"

    def spec(self) -> dict[str, Any]:
        return {"type": "file/jsonl", "path": self.path, "schema": str(self.schema)}

    def _schema(self) -> StructType | None:
        if self.schema is None:
            return None
        return StructType.fromDDL(self.schema) if isinstance(self.schema, str) else self.schema

    def _raw(self, spark: SparkSession) -> DataFrame:
        reader = spark.read
        schema = self._schema()
        if schema is not None:
            if "_corrupt_record" not in schema.names:
                schema = schema.add("_corrupt_record", "string")
            reader = reader.schema(schema)
        df = (
            reader.option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(self.path)
        )
        return df.withColumn("file", F.input_file_name())

    def read(self, spark: SparkSession) -> DataFrame:
        """Good records only — DROPMALFORMED, the reference's
        log-and-continue (E1). NB: filtering a PERMISSIVE read on
        ``_corrupt_record IS NULL`` instead would poison downstream
        ``count()``s with Spark's corrupt-record-only plan restriction
        (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN)."""
        reader = spark.read
        schema = self._schema()
        if schema is not None:
            reader = reader.schema(schema)
        df = reader.option("mode", "DROPMALFORMED").json(self.path)
        return df.withColumn("file", F.input_file_name())

    def errors_of(self, spark: SparkSession) -> DataFrame:
        """The reference wraps failures as error envelopes on a side
        channel (``src/etlp/utils/async.clj:49-51``); here they are a
        first-class DataFrame.

        Spark refuses plans that reference *only* ``_corrupt_record``
        (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), so the
        parsed frame is cached first — then released before returning
        (the error frame is eagerly localCheckpoint-ed so the result
        never re-reads through the unpersisted cache). The error path
        is a debugging flow; at 100 TB you'd land both sides from one
        pass instead.
        """
        df = self._raw(spark)
        if "_corrupt_record" not in df.columns:
            return df.limit(0).select(F.lit("").alias("_corrupt_record"), "file").limit(0)
        raw = df.persist()
        try:
            return (
                raw.where(F.col("_corrupt_record").isNotNull())
                .select("_corrupt_record", "file")
                .localCheckpoint(eager=True)
            )
        finally:
            raw.unpersist()


@dataclass
class CsvSource(Source):
    path: str
    header: bool = True
    infer_schema: bool = False
    schema: StructType | str | None = None
    stream_name: str = "csv-stream"

    def spec(self) -> dict[str, Any]:
        return {"type": "file/csv", "path": self.path, "header": self.header}

    def read(self, spark: SparkSession) -> DataFrame:
        reader = spark.read.option("header", self.header)
        if self.schema is not None:
            reader = reader.schema(self.schema)
        elif self.infer_schema:
            reader = reader.option("inferSchema", True)
        return reader.csv(self.path)


@dataclass
class ParquetSource(Source):
    path: str
    stream_name: str = "parquet-stream"

    def spec(self) -> dict[str, Any]:
        return {"type": "file/parquet", "path": self.path}

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)


@dataclass
class OrcSource(Source):
    path: str
    stream_name: str = "orc-stream"

    def spec(self) -> dict[str, Any]:
        return {"type": "file/orc", "path": self.path}

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.orc(self.path)


@dataclass
class ParquetSink(Destination):
    path: str
    mode: str = "overwrite"
    partition_by: tuple[str, ...] = ()

    def spec(self) -> dict[str, Any]:
        return {"type": "file/parquet", "path": self.path, "mode": self.mode}

    def write(self, df: DataFrame) -> WriteResult:
        from pyspark.sql import Observation

        # Row count rides the write itself via observe() — no second
        # scan (the reference's running-count atom, A1, as a metric).
        obs = Observation("etlp_sink")
        observed = df.observe(obs, F.count(F.lit(1)).alias("rows"))
        writer = observed.write.mode(self.mode)
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(self.path)
        return WriteResult(rows=obs.get["rows"], target=self.path)


@dataclass
class BucketedTableSink(Destination):
    """Persist as a hash-BUCKETED parquet table (layout.write_bucketed):
    pay the shuffle once at ingest; every later equi-join or
    aggregation on ``keys`` between same-bucketed tables plans with
    ZERO exchange — the co-located-join layout for repeated big-big
    joins at 100 TB (the declarative twin of the snapshot sink's
    ``cluster_by`` z-order, which serves range SCANS where this
    serves JOINS)."""

    table: str
    keys: tuple[str, ...]
    n_buckets: int = 8
    sort_cols: tuple[str, ...] = ()
    path: str | None = None

    def spec(self) -> dict[str, Any]:
        return {
            "type": "table/bucketed_parquet",
            "table": self.table,
            "keys": list(self.keys),
            "n_buckets": self.n_buckets,
        }

    def write(self, df: DataFrame) -> WriteResult:
        from pyspark.sql import Observation

        from etlp_spark.functions.layout import write_bucketed

        obs = Observation("etlp_bucketed_sink")
        observed = df.observe(obs, F.count(F.lit(1)).alias("rows"))
        write_bucketed(
            observed,
            self.table,
            tuple(self.keys),
            self.n_buckets,
            sort_cols=tuple(self.sort_cols),
            path=self.path,
        )
        return WriteResult(rows=obs.get["rows"], target=self.table)


@dataclass
class ConsoleSink(Destination):
    """K1/K2: print a bounded sample, report the exact count.

    The reference batches 100 records then updates a running count
    atom (``stdout.clj:44-47``); ``observe`` gives the same metric
    without breaking distributed execution.
    """

    limit: int = 20
    collected: list = field(default_factory=list)

    def spec(self) -> dict[str, Any]:
        return {"type": "console", "limit": self.limit}

    def write(self, df: DataFrame) -> WriteResult:
        # NB: an Observation riding limit() short-circuits (it only
        # sees the sampled partitions), so the exact count is its own
        # action — the console sink is a debugging endpoint, the extra
        # scan is deliberate.
        import json
        import time

        sample = df.limit(self.limit).collect()
        self.collected = sample
        for row in sample:
            print(row.asDict())
        rows = df.count()
        # A1 parity: the reference logs the running count as a log
        # envelope (stdout.clj:25-27 via wrap-log, utils/core.clj:19).
        print(
            json.dumps(
                {
                    "type": "log",
                    "timestamp": int(time.time() * 1000),
                    "version": "0.1.0",
                    "schema": "etlp_raw",
                    "source_stream": "etlp-stream",
                    "data": f"row_count: {rows}",
                }
            )
        )
        return WriteResult(rows=rows, target="console")


@dataclass
class StdinSource(Source):
    """S1: the reference's stdin line source
    (``src/etlp/processors/stdin.clj:5-54`` — read-line loop with an
    ``:etlp-stdin-eof`` sentinel, hand-written discover catalog).

    Batch model: drain stdin on the driver (bounded by ``max_lines``)
    and parallelize — stdin is an inherently driver-side, single-node
    endpoint, so this is the honest mapping; no sentinel rows (Spark
    ends streams natively, SURVEY.md §1.1). An injectable ``stream``
    makes it testable. For unbounded use, prefer the socket source
    (``spark.readStream.format("socket")``).
    """

    stream: Any = None  # file-like; defaults to sys.stdin
    max_lines: int = 1_000_000
    stream_name: str = "stdin_stream"

    def spec(self) -> dict[str, Any]:
        return {"type": "stdin", "max_lines": self.max_lines}

    def read(self, spark: SparkSession) -> DataFrame:
        import sys
        from itertools import islice

        stream = self.stream if self.stream is not None else sys.stdin
        lines = [(line.rstrip("\n"),) for line in islice(stream, self.max_lines)]
        return spark.createDataFrame(lines, "value string") if lines else spark.createDataFrame(
            [], "value string"
        )


@dataclass
class UpsertParquetSink(Destination):
    """Merge-by-key parquet sink: new rows replace existing rows with
    the same key (last-writer-wins by an optional version column).

    Without a transactional table format in the container (Delta/
    Iceberg), merge = read-existing ∪ incoming → keep one row per key
    → atomic swap via staging dir. At real scale this is the pattern
    table formats implement natively; the operator surface (upsert on
    key) is what the engine guarantees.
    """

    path: str
    key: tuple[str, ...] = ("id",)
    version_col: str | None = None

    def spec(self) -> dict[str, Any]:
        return {"type": "file/parquet-upsert", "path": self.path, "key": list(self.key)}

    def write(self, df: DataFrame) -> WriteResult:
        import os
        import shutil

        from pyspark.sql import Window

        spark = df.sparkSession
        if os.path.exists(self.path):
            existing = spark.read.parquet(self.path)
            merged = existing.withColumn("__gen", F.lit(0)).unionByName(
                df.withColumn("__gen", F.lit(1))
            )
        else:
            merged = df.withColumn("__gen", F.lit(1))
        order = [F.col("__gen").desc()]
        if self.version_col:
            order.insert(0, F.col(self.version_col).desc())
        w = Window.partitionBy(*self.key).orderBy(*order)
        deduped = (
            merged.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn", "__gen")
        )
        staging = f"{self.path}.__staging__"
        deduped.write.mode("overwrite").parquet(staging)
        if os.path.exists(self.path):
            shutil.rmtree(self.path)
        os.rename(staging, self.path)
        rows = spark.read.parquet(self.path).count()
        return WriteResult(rows=rows, target=self.path)


#: S5/K4 parity: the reference's per-format reducer registry
#: (``README.md:25-36``: ``:reducers {:json-reducer ... :csv-reducer
#: ...}`` + ``:reducer`` selector). Formats map to Source classes;
#: ``make_source`` is the ``create-s3-source!``-shaped factory — the
#: path may be any Hadoop-FS URI (file://, s3a://bucket/prefix, ...).
FORMAT_REDUCERS: dict[str, type[Source]] = {
    "text": TextFileSource,
    "jsonl": JsonLinesSource,
    "json": JsonLinesSource,
    "csv": CsvSource,
    "parquet": ParquetSource,
    "orc": OrcSource,
}


def make_source(path: str, reducer: str = "jsonl", **opts: Any) -> Source:
    """Factory mirroring the reference's source construction:

        (create-s3-source! {:bucket b :prefix p
                            :reducers registry :reducer :json-reducer})

    → ``make_source("s3a://b/p", reducer="jsonl", schema=...)``.
    Unknown reducers raise with the registry listing (the reference
    throws IllegalArgumentException for unknown components).
    """
    if reducer not in FORMAT_REDUCERS:
        raise ValueError(
            f"unknown reducer {reducer!r}; registered: {sorted(FORMAT_REDUCERS)}"
        )
    return FORMAT_REDUCERS[reducer](path, **opts)
