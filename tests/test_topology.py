"""Golden DAG tests replicating the reference's connector tests
(``test/etlp/connector_test.clj`` — FIXTURES.md §B1).

Expected outputs are the reference's literal golden vectors compared
as multisets (engine semantics are order-insensitive, SURVEY.md §4.2).
"""

import pytest
from pyspark.sql import functions as F

from etlp_spark import ops
from etlp_spark.topology import Node, Topology

# ref: test/etlp/connector_test.clj:16-17
TEST_DATA = [
    (1, [[4, 4, 1, 1], [1, 2, 3, 4], [2, 3, 4, 5, 6, 4], [1321, 3214, 241234, 66234], [232, 4214, 281234, 88234]]),
    (2, [[2, 2, 2, 2], [3, 4, 5, 6], [3, 4, 5, 6, 7, 8], [2432, 4325, 352345, 77345], [343, 5325, 392345, 98345]]),
]

# ref: test/etlp/connector_test.clj:155-157
GOLDEN = sorted([360, 360, 864, 11232108, 13460904, 288, 648, 1188, 15712092, 17868888])


def _source(spark):
    return spark.createDataFrame(TEST_DATA, "batch_id long, arrays array<array<long>>")


# the reference's two xforms (connector_test.clj:106-118), built
# lazily — Columns need an active session:
#   xform-1: mapcat flatten → map sum → map *2 → map *3
#   xform-2: filter number → map *2 → map *3
def XFORM_1(df):
    return ops.compose(
        ops.flatten("arrays", "vec", keep=[]),
        ops.map_cols(summed=F.aggregate("vec", F.lit(0).cast("long"), lambda a, x: a + x)),
        lambda d: d.select((F.col("summed") * 2 * 3).alias("n")),
    )(df)


def XFORM_2(df):
    return ops.compose(
        ops.where(F.col("n").isNotNull()),
        lambda d: d.select((F.col("n") * 2 * 3).alias("n")),
    )(df)


def _collect_ns(df):
    return sorted(r.n for r in df.collect())


def test_processor_chain_topology(spark):
    """simple-topo (connector_test.clj:29-69): processors only."""
    topo = Topology(
        workflow=[("p1", "p2"), ("p2", "p3")],
        entities={
            "p1": Node.processor(_source),
            "p2": Node.processor(lambda df: XFORM_1(df)),
            "p3": Node.processor(lambda df: XFORM_2(df)),
        },
    )
    out = topo.build(spark)
    assert _collect_ns(out["p3"]) == GOLDEN


def test_processor_xform_alternating_topology(spark):
    """etlp-app topo (connector_test.clj:74-137): processor/xform."""
    topo = Topology(
        workflow=[("processor-1", "xform-1"), ("xform-1", "processor-3"),
                  ("processor-3", "xform-2"), ("xform-2", "processor-5")],
        entities={
            "processor-1": Node.processor(_source),
            "xform-1": Node.xform(XFORM_1),
            "processor-3": Node.processor(lambda df: df),
            "xform-2": Node.xform(XFORM_2),
            "processor-5": Node.processor(lambda df: df),
        },
    )
    out = topo.build(spark)
    assert _collect_ns(out["processor-5"]) == GOLDEN


def test_empty_passthrough_topology(spark):
    """connector_test.clj:140-152,159: [1,2,3] flows unchanged."""
    topo = Topology(
        workflow=[("src", "out")],
        entities={
            "src": Node.processor(lambda s: s.createDataFrame([(1,), (2,), (3,)], ["n"])),
            "out": Node.processor(lambda df: df),
        },
    )
    assert _collect_ns(topo.build(spark)["out"]) == [1, 2, 3]


def test_fanout_works_unlike_reference(spark):
    """The reference declares fan-out but its mult/tap is dead code
    (dag.clj:73,80-94 — last writer wins). Here one node feeds two
    consumers and both see the full stream."""
    topo = Topology(
        workflow=[("src", "evens"), ("src", "odds")],
        entities={
            "src": Node.processor(lambda s: s.range(10).select(F.col("id").alias("n"))),
            "evens": Node.xform(ops.where(F.col("n") % 2 == 0)),
            "odds": Node.xform(ops.where(F.col("n") % 2 == 1)),
        },
    )
    out = topo.build(spark)
    assert _collect_ns(out["evens"]) == [0, 2, 4, 6, 8]
    assert _collect_ns(out["odds"]) == [1, 3, 5, 7, 9]


def test_fanin_merges(spark):
    topo = Topology(
        workflow=[("a", "both"), ("b", "both")],
        entities={
            "a": Node.processor(lambda s: s.createDataFrame([(1,), (2,)], ["n"])),
            "b": Node.processor(lambda s: s.createDataFrame([(3,), (4,)], ["n"])),
            "both": Node.processor(lambda df: df),
        },
    )
    assert _collect_ns(topo.build(spark)["both"]) == [1, 2, 3, 4]


def test_cycle_rejected(spark):
    with pytest.raises(ValueError, match="cycle"):
        Topology(
            workflow=[("a", "b"), ("b", "a")],
            entities={"a": Node.processor(lambda df: df), "b": Node.processor(lambda df: df)},
        )


def test_unknown_node_rejected(spark):
    with pytest.raises(ValueError, match="unknown node"):
        Topology(workflow=[("a", "ghost")], entities={"a": Node.processor(lambda df: df)})
