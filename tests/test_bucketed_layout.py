"""Bucketed-table layout: the shuffle is paid once at write, then
equi-joins and aggregations on the bucket key plan with ZERO exchange.

This is the big-big join answer at 100 TB (broadcast covers dims,
z-order covers range scans): two fact tables bucketed the same way
sort-merge join without either side shuffling. The assertions read
the EXECUTED plan — if Catalyst stops recognizing the bucket spec
(catalog regression, disabled flag, mismatched bucket counts) the
exchange reappears and these tests fail.
"""

import pytest

from pyspark.sql import functions as F

from etlp_spark.functions.layout import write_bucketed


@pytest.fixture()
def no_broadcast(spark):
    """Force sort-merge joins so the exchange assertions are about
    bucketing, not about AQE broadcasting small test tables."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _executed(df) -> str:
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def _mk_tables(spark, sf_dir, tmp_path):
    from etlp_spark import io

    orders = io.load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    lineitem = io.load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(
        orders, "b_orders", ("o_orderkey",), 8,
        sort_cols=("o_orderkey",), path=str(tmp_path / "b_orders"),
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", ("o_orderkey",), 8,
        sort_cols=("o_orderkey",), path=str(tmp_path / "b_lineitem"),
    )


def test_bucketed_join_no_exchange(spark, sf_dir, tmp_path, no_broadcast):
    _mk_tables(spark, sf_dir, tmp_path)
    a = spark.table("b_orders")
    b = spark.table("b_lineitem")
    joined = a.join(b, "o_orderkey").groupBy("o_orderpriority").agg(
        F.sum("l_quantity").alias("q")
    )
    plan = _executed(joined)
    # the join itself must consume bucketed scans directly: the only
    # allowed exchange is the one feeding the FINAL per-priority
    # aggregate (5 groups), which keys on a non-bucket column
    assert "SortMergeJoin" in plan, plan[:2000]
    pre_join = plan.split("SortMergeJoin", 1)[1]
    assert "Exchange hashpartitioning(o_orderkey" not in pre_join, (
        "bucketed join re-shuffled a side:\n" + plan[:3000]
    )
    assert plan.count("Exchange hashpartitioning") <= 1, plan[:3000]
    # cross-check the result against the unbucketed plan
    from etlp_spark import io

    o = io.load_table(spark, sf_dir, "orders")
    li = io.load_table(spark, sf_dir, "lineitem")
    expect = {
        r["o_orderpriority"]: r["q"]
        for r in o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.sum("l_quantity").alias("q"))
        .collect()
    }
    got = {r["o_orderpriority"]: r["q"] for r in joined.collect()}
    assert got == expect


def test_bucketed_aggregate_no_exchange(spark, sf_dir, tmp_path, no_broadcast):
    _mk_tables(spark, sf_dir, tmp_path)
    agg = (
        spark.table("b_lineitem")
        .groupBy("o_orderkey")
        .agg(F.sum("l_quantity").alias("q"), F.count(F.lit(1)).alias("n"))
    )
    plan = _executed(agg)
    assert "Exchange" not in plan, (
        "bucket-key aggregate should be exchange-free:\n" + plan[:3000]
    )
