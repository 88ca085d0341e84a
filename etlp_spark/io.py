"""Test-data loaders for the driver-generated TPC-H-ish tables.

Tables live at ``{sf_dir}/{table}.parquet`` (see TESTDATA.md). Loading
is a plain parquet scan so Catalyst keeps predicate pushdown, column
pruning and partition pruning — at 100 TB these scans are the single
biggest lever, so nothing here materializes or caches by default.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["TABLES", "DEFAULT_SF_DIR", "load_table", "load_tables", "register_views"]

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables that should always broadcast in joins.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Timestamp columns in the testdata. Generators have shipped these
#: as parquet TIMESTAMP(NANOS) (Spark needs ``nanosAsLong`` → bigint)
#: and as TIMESTAMP(MICROS, isAdjustedToUTC=false) (Spark 4 reads
#: TIMESTAMP_NTZ natively). ``load_table`` normalizes EITHER physical
#: encoding to plain TimestampType (LTZ) under a UTC session zone, so
#: every downstream query sees one stable type with epoch semantics
#: identical to the tz-naive DuckDB oracle.
_TS_COLS = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    # Confs set here (runtime-settable) instead of at session-builder
    # time: load_table must work on ANY SparkSession, including one
    # built by an external harness.
    #
    # NB: both settings are DELIBERATE session-wide mutations — the
    # declared-query contract requires UTC timestamp semantics (the
    # DuckDB oracle is tz-naive), so any session loading these tables
    # is opted into it. A caller needing a different session zone for
    # unrelated work should use a separate SparkSession.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    dtypes = dict(df.dtypes)
    for col in _TS_COLS.get(name, ()):
        if dtypes.get(col) == "bigint":
            # TIMESTAMP(NANOS) read as long nanos: integer-divide to
            # micros — the same truncation DuckDB applies for nanos.
            df = df.withColumn(col, F.expr(f"timestamp_micros(`{col}` div 1000)"))
        elif dtypes.get(col) in ("timestamp_ntz", "date"):
            # NTZ → LTZ under the UTC session zone keeps the same wall
            # clock AND the same epoch as the naive oracle timestamps,
            # and restores unix_micros / cast-to-long arithmetic that
            # TIMESTAMP_NTZ rejects. DATE gets the same treatment
            # (midnight UTC) should a future generator ship dates.
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
