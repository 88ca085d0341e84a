"""Every declared query must match its DuckDB oracle at sf0.001.

This is a local pre-flight of the driver's t2 gate (which runs at
sf0.01); a failure here means CORRECTNESS_r{N}.json would fail too.
"""

import pytest

from etlp_spark.queries import QUERIES
from tests.oracle_harness import compare, duckdb_conn

NAMES = sorted(QUERIES)


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb_conn(sf_dir)
    yield con
    con.close()


def test_load_table_self_sufficient_on_foreign_session(spark, sf_dir):
    """Round-1 regression: the driver harness builds its OWN SparkSession
    without `nanosAsLong`, which made every events-table read crash with
    PARQUET_TYPE_ILLEGAL. load_table must self-configure at runtime."""
    from etlp_spark import io

    foreign = spark.newSession()
    foreign.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    df = io.load_table(foreign, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.limit(1).count() >= 0


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, sf_dir, con, name):
    q = QUERIES[name]
    df = q.fn(spark, sf_dir)
    assert df is not None
    if q.oracle is None:
        assert df.count() >= 0  # rows-only check, like the driver
        return
    problems = compare(df, con, q.oracle)
    assert not problems, f"{name}: " + "; ".join(problems)
