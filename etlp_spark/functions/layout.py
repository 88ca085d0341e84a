"""Data-layout operators: Morton (z-order) clustering for multi-
dimensional file skipping — the write-side companion to x102's layout
audit and the snapshot store's manifest zone maps (``stats_cols`` /
``read_pruned``). Together they close the lakehouse loop:

    zorder_key/zorder_sort (cluster the write) →
    SnapshotStore.write(stats_cols=...) (record per-file zones) →
    read_pruned (skip files whose zone can't match)

Spark has no OPTIMIZE ZORDER; this is that capability as plain
DataFrame ops: scale each dimension to ``2**bits`` ranks against
provided (or computed) min/max, interleave bits JVM-side, then
``repartitionByRange`` + ``sortWithinPartitions`` on the key so file
boundaries align with z-ranges and every file's per-dimension
[min, max] zone stays tight.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["zorder_key", "zorder_sort", "write_bucketed"]


def zorder_key(
    df: DataFrame, cols: tuple[str, ...], bits: int = 8
) -> Column:
    """Morton interleave of ``cols`` scaled to ``2**bits`` ranks each
    (min/max computed from ``df`` in one tiny aggregate and folded in
    as literals — scan-stage arithmetic, no join). Supports up to
    ``63 // bits`` dimensions in one BIGINT key."""
    if len(cols) * bits > 63:
        raise ValueError(f"{len(cols)} dims x {bits} bits exceeds a BIGINT")
    mm = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    terms = []
    n = 1 << bits
    for d, c in enumerate(cols):
        lo, hi = mm[f"lo_{c}"], mm[f"hi_{c}"]
        span = (hi - lo) or 1
        # rank in [0, n-1]: integer arithmetic, monotone in the value
        rank = f"least({n - 1}, ((`{c}` - {lo}) * {n}) div ({span} + 1))"
        # every shift term FULLY parenthesized: in Spark SQL `+` binds
        # tighter than `<<`, so `x << 4 + y << 7` parses as nested
        # shifts (x102's _z16_sql wraps its terms the same way)
        terms += [
            f"(((({rank}) >> {i}) & 1) << {i * len(cols) + d})"
            for i in range(bits)
        ]
    return F.expr(" + ".join(terms)).cast("long")


def zorder_sort(
    df: DataFrame, cols: tuple[str, ...], num_files: int = 16, bits: int = 8
) -> DataFrame:
    """Cluster ``df`` for multi-dimensional file skipping: range-
    partition into ``num_files`` splits of the Morton key and sort
    within each — written out, every file covers a compact z-range,
    so its per-dimension zone map is tight on EVERY ``cols`` member
    (a plain sort is tight on one). Feed the result to
    ``SnapshotStore.write(stats_cols=cols)``."""
    z = zorder_key(df, cols, bits).alias("__z")
    return (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: tuple[str, ...],
    n_buckets: int,
    sort_cols: tuple[str, ...] = (),
    path: str | None = None,
) -> None:
    """Persist ``df`` as a BUCKETED parquet table: rows hash-
    partitioned on ``keys`` into ``n_buckets`` files at WRITE time, so
    every later equi-join or aggregation on ``keys`` between tables
    bucketed the same way plans with ZERO exchange — the shuffle is
    paid once at ingest instead of on every query. This is the
    co-located-join layout a 100 TB fact/fact join wants (broadcast
    covers small dims; bucketing covers the big-big case z-order
    can't: z-order tightens zone maps for range SCANS, bucketing
    aligns partitioning for JOINS).

    ``sort_cols`` adds within-bucket sort (sort-merge joins then skip
    the sort too). Catalyst only recognizes bucketing through the
    catalog, hence ``saveAsTable`` rather than a bare path write —
    ``path`` pins the storage location (external table) so callers
    control layout on disk. At cluster scale the same call works
    against a Hive metastore; locally the in-memory catalog carries
    the bucket spec for the session.
    """
    if not keys:
        raise ValueError("bucketing requires at least one key column")
    w = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, *keys)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)
