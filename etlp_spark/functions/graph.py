"""Graph operators over co-occurrence edge lists (engine-added — the
reference has no graph surface; joins r1 reachability / r2 PageRank /
x92 triangles / x100 k-core as the §2.2 graph family's library home).

Scale design (the themes the query twins plan-pin):

- **Edge construction** (``cooccurrence_edges``): presence dedup →
  bucket-capped JVM-side pair generation from each bucket's sorted
  member array (one aggregate shuffle + one pair-count shuffle — the
  array form beat a bucket self-join 2.2× in the r7 study) → pair
  count threshold. The ``max_bucket`` cap bounds per-bucket expansion
  exactly like the LSH bucket cap: hub buckets are dropped, not
  exploded.
- **k-core peeling** (``kcore``): each round is a degree aggregate
  over the CURRENT edge set plus two semi-joins; edges only shrink,
  so round cost is bounded by round 0. The edge frame is eagerly
  ``localCheckpoint``ed per round to keep lineage flat (the r2
  Pregel-as-joins discipline). Rounds are explicit and bounded so the
  computation stays expressible as unrolled SQL for the oracle gate;
  x100's pytest verifies the bounded answer is the fixpoint at test
  scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["cooccurrence_edges", "degrees", "kcore"]


def cooccurrence_edges(
    df: DataFrame,
    node_col: str,
    bucket_cols: tuple[str, ...],
    min_shared: int = 3,
    max_bucket: int = 32,
) -> DataFrame:
    """Undirected edge list (a < b) between nodes sharing at least
    ``min_shared`` distinct presence buckets, with buckets larger
    than ``max_bucket`` dropped (the hub-bucket skew guard)."""
    pres = df.select(*bucket_cols, node_col).distinct()
    bu = (
        pres.groupBy(*bucket_cols)
        .agg(F.sort_array(F.collect_set(node_col)).alias("us"))
        .where((F.size("us") >= 2) & (F.size("us") <= max_bucket))
    )
    pairs = bu.select(
        F.explode(
            F.expr(
                "flatten(transform(us, (u, i) -> "
                "transform(slice(us, i + 2, size(us)), "
                "v -> struct(u AS a, v AS b))))"
            )
        ).alias("p")
    ).select("p.a", "p.b")
    return (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
        .select("a", "b")
    )


def degrees(edges: DataFrame) -> DataFrame:
    """(v, d) degree table of an undirected (a, b) edge list."""
    return (
        edges.select(F.col("a").alias("v"))
        .unionAll(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )


def kcore(edges: DataFrame, k: int = 3, rounds: int = 3) -> DataFrame:
    """``rounds`` peeling rounds toward the k-core (Matula & Beck
    1983): repeatedly drop nodes of degree < k. Returns the surviving
    edges. Bounded rounds keep the computation SQL-unrollable; pick
    ``rounds`` so a further peel is a no-op at your scale (verify
    like x100's fixpoint pytest does)."""
    cur = edges.select("a", "b").localCheckpoint(eager=True)
    for _ in range(rounds):
        ok = degrees(cur).where(F.col("d") >= k).select("v")
        cur = (
            cur.join(ok.withColumnRenamed("v", "a"), "a", "left_semi")
            .join(ok.withColumnRenamed("v", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    return cur
