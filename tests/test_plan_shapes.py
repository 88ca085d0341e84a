"""Plan-shape regression tests — pin the 100 TB scale claims.

PERF.md's plan audit (broadcast dims, pushed parquet filters, top-k
via TakeOrderedAndProject) was prose; these tests make the suite fail
if a future change silently de-broadcasts a dim join, blocks filter
pushdown with an opaque projection, or turns a top-k into a global
sort. Executed plans are inspected AFTER running the query so AQE's
final strategy (not the static guess) is what's asserted.
"""

import re

import pytest

from etlp_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


#: Joins whose big side must NEVER sort-merge at this scale: the dim
#: side is broadcast (explicitly or by AQE) so the fact table is
#: joined without a shuffle of its own.
BROADCAST_ONLY = [
    "j2_region_revenue",
    "q03_shipping_priority",
    "x38_incremental_dedup",
    "x39_funnel_conversion",
    "q19_disjunctive_revenue",
    # round-4 additions whose joins must stay broadcast:
    "x49_vocab_coverage",       # top-1000 vocab → token stream
    "x53_bigram_pmi",           # unigram/total tables → bigram counts
    "x55_daily_anomaly_zscore", # per-type stats → daily counts
    "x56_dup_rate_by_source",   # dup-doc flags → documents
]

#: Scans whose predicate must reach the parquet reader (PushedFilters
#: with a real comparison, not just IsNotNull) — the difference
#: between reading a row group and skipping it at 100 TB.
PUSHDOWN = {
    "q01_pricing_summary": r"LessThanOrEqual\(l_shipdate",
    "t2_filter_shipped": r"EqualTo\(l_returnflag,R\)",
    "q19_disjunctive_revenue": r"Or\(.*l_quantity",
    "q03_shipping_priority": r"EqualTo\(c_mktsegment,BUILDING\)",
}

#: Top-k queries that must plan TakeOrderedAndProject (per-partition
#: heap + single reduce) instead of a global sort + limit.
TOP_K = ["q03_shipping_priority", "w7_session_paths", "x57_uniform_k_sample"]


@pytest.mark.parametrize("name", BROADCAST_ONLY)
def test_no_sort_merge_join(spark, name):
    plan = _executed_plan(QUERIES[name].fn(spark, SF))
    assert "SortMergeJoin" not in plan, (
        f"{name} de-broadcasted a dim join:\n{plan[:2000]}"
    )
    assert "BroadcastHashJoin" in plan, f"{name} lost its broadcast join"


@pytest.mark.parametrize("name", sorted(PUSHDOWN))
def test_parquet_filter_pushdown(spark, name):
    plan = _executed_plan(QUERIES[name].fn(spark, SF))
    pushed = " ".join(re.findall(r"PushedFilters: \[[^\]]*", plan))
    assert re.search(PUSHDOWN[name], pushed), (
        f"{name}: predicate no longer reaches the parquet scan; "
        f"pushed = {pushed[:500]}"
    )


@pytest.mark.parametrize("name", TOP_K)
def test_top_k_plans_take_ordered(spark, name):
    plan = _executed_plan(QUERIES[name].fn(spark, SF))
    assert "TakeOrderedAndProject" in plan, (
        f"{name} plans a global sort instead of top-k:\n{plan[:2000]}"
    )
