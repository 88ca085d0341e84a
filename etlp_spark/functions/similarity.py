"""Similarity search over embedding columns (SURVEY.md §7 M7).

Two tiers:

- ``cosine_topk`` — brute-force baseline: broadcast the (small) query
  set against the candidate corpus; per-pair cosine is an ordered
  fold over the two arrays (bit-reproducible), ranked per query.
  At 100 TB the candidate side stays partitioned and never shuffles:
  cost is one scan + a per-partition top-k (the window is over the
  broadcast query id, so AQE handles the final k-merge).
- ``srp_buckets`` — the scale path: sign-random-projection LSH.
  Hyperplanes are derived deterministically from md5, so the same
  code runs identically everywhere (and the DuckDB oracle can
  reproduce it). Bucketing reduces ANN to an equi-join on bucket
  keys; recall is tuned by the number of planes/tables.

No MLlib, no UDFs — everything is higher-order Column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["dot", "norm", "cosine", "cosine_topk", "srp_bits", "srp_buckets"]


def dot(a: Column, b: Column) -> Column:
    """Ordered-fold dot product in DOUBLE (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 9,
) -> DataFrame:
    """Exact top-k neighbors per query vector.

    Returns (query_id, cand_id, cos, rnk). Ranking is on the rounded
    cosine with candidate id as tiebreaker → fully deterministic.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = candidates.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"))
    scored = F.broadcast(q).crossJoin(c).select(
        "query_id",
        "cand_id",
        F.round(cosine(F.col("qv"), F.col("cv")), scale).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return scored.select("query_id", "cand_id", "cos", F.row_number().over(w).alias("rnk")).where(
        F.col("rnk") <= k
    )


def _plane_weight(plane: int, dim: int) -> float:
    """Deterministic pseudo-random weight in [-1, 1): md5-derived so
    any engine reproduces the same hyperplanes.

    Computed in Python (hashlib md5 == every engine's md5) and
    embedded as a plain float literal — building it as a Column
    expression tree put 1024 md5 nodes into codegen and cost seconds
    of compilation per query."""
    import hashlib

    h = int(hashlib.md5(f"plane{plane}_{dim}".encode()).hexdigest()[:8], 16)
    return h / 2147483648.0 - 1.0


def srp_bits(vec_col: Column | str, n_planes: int = 16, dims: int = 64) -> Column:
    """Sign-random-projection signature: bit j = (v · plane_j) > 0.

    Each plane is a literal array (md5 of literals → constant-folded
    by Catalyst), so per row this is n_planes ordered folds."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bits = []
    for j in range(n_planes):
        plane = F.array(*[F.lit(_plane_weight(j, d)) for d in range(dims)])
        bits.append(F.when(dot(v, plane) > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat_ws("", *bits)


def srp_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    dims: int = 64,
) -> DataFrame:
    """(id, bucket): equal buckets ≈ high-cosine candidates. ANN
    search = equi-join on bucket, then exact re-rank inside buckets."""
    return df.select(F.col(id_col), srp_bits(vec_col, n_planes, dims).alias("bucket"))
