"""Regression gate for the duplicate-corpus-pass class (r17/r18
optimization rounds): every declared query's final physical plan must
not scan any table MORE times than the checked-in census
(SCAN_CENSUS.json) records. A rewrite that accidentally duplicates a
corpus subtree (unpinned frame referenced twice, union of selects over
an unpinned pipeline, broadcast side defeating ReusedExchange) shows
up here as an extra Scan parquet node and fails with the offending
query + table named.

The census counts the FINAL plan only — construct-time pin jobs are
covered by their own plan-shape tests. Regenerate the allowlist after
an intentional change with:  python tools_scan_census.py
"""

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CENSUS_PATH = os.path.join(REPO, "SCAN_CENSUS.json")


def test_scan_census_not_regressed(spark, sf_dir):
    from tools_scan_census import census_for

    from etlp_spark.queries import QUERIES

    with open(CENSUS_PATH) as fh:
        allow = json.load(fh)

    missing = sorted(set(QUERIES) - set(allow))
    assert not missing, (
        f"queries missing from SCAN_CENSUS.json (regenerate with "
        f"tools_scan_census.py): {missing}"
    )

    offenders = []
    import gc

    for name, q in QUERIES.items():
        got = census_for(q.fn(spark, sf_dir))
        for table, n in got.items():
            if n > allow[name].get(table, 0):
                offenders.append(
                    f"{name}: {table} scanned {n}x "
                    f"(allowed {allow[name].get(table, 0)})"
                )
        spark.catalog.clearCache()
        gc.collect()
    assert not offenders, (
        "duplicate-scan regression (extra Scan parquet nodes vs "
        "SCAN_CENSUS.json):\n" + "\n".join(offenders)
    )


def test_scan_census_catches_injected_duplicate(spark, sf_dir):
    """The gate must actually fire: a self-union of an unpinned
    corpus aggregate scans the table twice, which the census counts."""
    from pyspark.sql import functions as F

    from tools_scan_census import census_for

    from etlp_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    agg = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    dup = agg.unionAll(agg)
    got = census_for(dup)
    assert got.get("documents", 0) == 2, got
