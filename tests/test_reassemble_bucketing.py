"""HL7-style multi-line reassembly (FIXTURES.md §B4) and the
bucketed-table co-located join scale pattern."""

import pytest
from pyspark.sql import functions as F

from etlp_spark.ops import reassemble


def test_hl7_reassembly(spark):
    """ref README.md:28-33: segments joined by \\r, boundary MSH|."""
    lines = [
        ("f1", 1, "MSH|^~\\&|A"),
        ("f1", 2, "PID|123"),
        ("f1", 3, "OBX|x"),
        ("f1", 4, "MSH|^~\\&|B"),
        ("f1", 5, "PID|456"),
        ("f2", 1, "MSH|^~\\&|C"),
        ("f2", 2, "NTE|note"),
    ]
    df = spark.createDataFrame(lines, "file string, line_id long, value string")
    out = {(r.file, r.msg_id): r.message for r in reassemble(df).collect()}
    assert out[("f1", 1)] == "MSH|^~\\&|A\rPID|123\rOBX|x"
    assert out[("f1", 2)] == "MSH|^~\\&|B\rPID|456"
    assert out[("f2", 1)] == "MSH|^~\\&|C\rNTE|note"


def test_hl7_leading_garbage_dropped(spark):
    """Lines before the first boundary belong to no record."""
    df = spark.createDataFrame(
        [("f", 1, "junk"), ("f", 2, "MSH|1"), ("f", 3, "PID|x")],
        "file string, line_id long, value string",
    )
    msgs = [r.message for r in reassemble(df).collect()]
    assert msgs == ["MSH|1\rPID|x"]


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """The co-located join pattern for repeated 100 TB joins: bucket
    both tables on the join key at write time; Spark then plans the
    join with ZERO Exchange (shuffle) nodes."""
    import shutil

    a = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("bk_a", "bk_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    a.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bk_a")
    b.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bk_b")
    # disable broadcast so the large-large (shuffle-vs-bucket) path is
    # what gets planned — at real scale neither side broadcasts
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bk_a").join(spark.table("bk_b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan, (
            f"bucketed join still shuffles:\n{plan[:2000]}"
        )
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_partitioned_sink_prunes(spark, tmp_path):
    """ParquetSink(partition_by): reading with a partition filter
    must prune at the PLAN level (PartitionFilters, not a post-scan
    filter) — the other half of the 100 TB scan story."""
    from etlp_spark.connectors.files import ParquetSink, ParquetSource
    from etlp_spark.io import load_table

    out = str(tmp_path / "ev_part")
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    res = ParquetSink(out, partition_by=("event_type",)).write(ev)
    assert res.rows == ev.count()
    df = ParquetSource(out).read(spark).where(F.col("event_type") == "click")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan
    n_click = ev.where(F.col("event_type") == "click").count()
    assert df.count() == n_click


def test_compact_rewrites_small_files(spark, tmp_path):
    from etlp_spark.ops import compact

    path = str(tmp_path / "frag")
    spark.range(10000).repartition(64).write.parquet(path)
    import glob

    assert len(glob.glob(f"{path}/*.parquet")) == 64
    n = compact(spark, path, target_partitions=2)
    assert n == 2
    assert len(glob.glob(f"{path}/*.parquet")) == 2
    assert spark.read.parquet(path).count() == 10000


def test_compact_file_uri_via_hadoop_fs(spark, tmp_path):
    """VERDICT r1 #9: compact must work through the Hadoop FileSystem
    API on an explicit file: URI — size probing AND the atomic swap,
    not just driver-local os/shutil paths. Auto-sizing (no explicit
    target_partitions) exercises getContentSummary."""
    import glob

    from etlp_spark.ops import compact

    local = tmp_path / "frag_uri"
    uri = f"file://{local}"
    spark.range(5000).repartition(16).write.parquet(uri)
    assert len(glob.glob(f"{local}/*.parquet")) == 16
    n = compact(spark, uri, target_mb=1024)
    assert n == 1  # tiny dataset → one right-sized file
    assert len(glob.glob(f"{local}/*.parquet")) == 1
    assert not (tmp_path / "frag_uri.__compact__").exists()
    assert spark.read.parquet(uri).count() == 5000


def test_dynamic_partition_pruning(spark, tmp_path):
    """Joining a partitioned fact to a FILTERED dim must plant a
    dynamic-pruning subquery in the fact scan's partition filters —
    at 100 TB this is what keeps a star join from scanning every
    partition when the predicate only exists on the dim side."""
    from etlp_spark.connectors.files import ParquetSink, ParquetSource
    from etlp_spark.io import load_table

    out = str(tmp_path / "ev_dpp")
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    ParquetSink(out, partition_by=("event_type",)).write(ev)
    fact = ParquetSource(out).read(spark)
    dim = spark.createDataFrame(
        [("click", 1), ("view", 2)], "event_type string, w int"
    ).where(F.col("w") == 1)
    joined = fact.join(F.broadcast(dim), "event_type")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    assert joined.count() == ev.where(F.col("event_type") == "click").count()
