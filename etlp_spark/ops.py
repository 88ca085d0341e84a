"""The engine's operator surface.

Two layers:

1. **The reference's pipeline surface** (SURVEY.md §2.1, aregee/etlp):
   per-record transducer ops re-expressed as Column/DataFrame
   combinators — ``map_cols`` (T1), ``where`` (T2), ``flatten`` (T3
   mapcat), ``keep`` (T4), ``batch_id`` (T5 partition-all),
   ``array_sum`` (T6 in-record reduce), ``concat_lines`` (T8 string
   join), ``compose`` (T9 transducer comp). Reference citations:
   map/filter/mapcat/keep in ``test/etlp/connector_test.clj:106-137``
   and ``src/etlp/processors/stdout.clj:42-47``; partition-all 100 at
   ``src/etlp/processors/stdout.clj:44``; ``(reduce + lst)`` at
   ``test/etlp/connector_test.clj:110``; ``(s/join "\\r" segments)``
   at ``README.md:31-32``.

2. **The relational layer** the reference lacks (SURVEY.md §2.2):
   joins (broadcast/semi/anti), aggregations, windows, set ops,
   sort/limit — thin wrappers over native Spark so Catalyst keeps
   full optimization freedom.

Scale notes (100 TB):

- Everything here stays inside Catalyst expressions → whole-stage
  codegen; no Python in the row path.
- ``flatten`` uses ``explode`` which is pipelined (no shuffle).
- ``batch_id`` derives batches from a *data* column, never from
  ``monotonically_increasing_id`` order, so it is deterministic and
  partition-stable.
- Joins: pass ``broadcast=True`` for dimension tables (< ~100 MB);
  large-large joins rely on AQE skew handling configured in
  ``session.py``.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "map_cols",
    "where",
    "flatten",
    "keep",
    "batch_id",
    "array_sum",
    "concat_lines",
    "compose",
    "join",
    "semi_join",
    "anti_join",
    "union_merge",
    "top_k",
    "dedupe_exact",
]

Transform = Callable[[DataFrame], DataFrame]


# ---------------------------------------------------------------- layer 1

def map_cols(**exprs: Column) -> Transform:
    """T1 map — add/replace columns with expressions (ref: ``(map f)``)."""

    def _t(df: DataFrame) -> DataFrame:
        return df.withColumns(dict(exprs))

    return _t


def where(pred: Column | str) -> Transform:
    """T2 filter (ref: ``(filter pred)``)."""

    def _t(df: DataFrame) -> DataFrame:
        return df.where(pred)

    return _t


def flatten(col: str, out: str, keep: Sequence[str] | None = None) -> Transform:
    """T3 mapcat — explode an array column into one row per element.

    ``explode`` is a generator in the same stage as the scan: no
    shuffle, no Python. (ref: ``(mapcat f)``,
    ``test/etlp/connector_test.clj:108``)
    """

    def _t(df: DataFrame) -> DataFrame:
        cols = [F.col(c) for c in (keep if keep is not None else df.columns)]
        return df.select(*cols, F.explode(F.col(col)).alias(out))

    return _t


def keep(expr: Column, out: str) -> Transform:
    """T4 keep — map then drop nulls (ref: ``(keep f)``,
    ``src/etlp/processors/stdout.clj:47``)."""

    def _t(df: DataFrame) -> DataFrame:
        return df.withColumn(out, expr).where(F.col(out).isNotNull())

    return _t


def batch_id(key: Column | str, n: int, out: str = "batch_id") -> Transform:
    """T5 partition-all — assign records to fixed-size batches keyed by
    a monotone data column (ref: ``(partition-all 100)``,
    ``src/etlp/processors/stdout.clj:44``).

    Spark has no ordered stream, so batching is defined on data, not
    arrival order: ``floor(key / n)``. Deterministic, shuffle-free.
    """

    def _t(df: DataFrame) -> DataFrame:
        k = F.col(key) if isinstance(key, str) else key
        return df.withColumn(out, F.floor(k / F.lit(n)).cast("long"))

    return _t


def array_sum(col: str, out: str, scale: int | None = None) -> Transform:
    """T6 in-record reduce — left-fold ``+`` over an array column
    (ref: ``(reduce + lst)``, ``test/etlp/connector_test.clj:110``).

    Uses the higher-order ``aggregate`` so the fold runs in the JVM
    per-row; accumulates in DOUBLE (left fold, element order) so the
    result is bit-reproducible.
    """

    def _t(df: DataFrame) -> DataFrame:
        acc = F.aggregate(F.col(col), F.lit(0.0), lambda a, x: a + x.cast("double"))
        if scale is not None:
            acc = F.round(acc, scale)
        return df.withColumn(out, acc)

    return _t


def concat_lines(sep: str, col: str, out: str, sort: bool = True) -> Transform:
    """T8 string join — reassemble grouped segments into one string
    (ref: ``(s/join "\\r" segments)``, ``README.md:31-32``).

    Sorts elements first by default: engine semantics are
    order-insensitive (SURVEY.md §4.2), so any deterministic output
    must pick an explicit order.
    """

    def _t(df: DataFrame) -> DataFrame:
        arr = F.array_sort(F.col(col)) if sort else F.col(col)
        return df.withColumn(out, F.array_join(arr, sep))

    return _t


def compose(*transforms: Transform) -> Transform:
    """T9 transducer composition — fuse transforms into one pipeline.

    Catalyst collapses the chained projections/filters into a single
    whole-stage-codegen'd pass, which is exactly what ``comp`` of
    transducers bought the reference
    (``src/etlp/processors/stdout.clj:42-47``).
    """

    def _t(df: DataFrame) -> DataFrame:
        for t in transforms:
            df = t(df)
        return df

    return _t


# ---------------------------------------------------------------- layer 2

def join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str] | Column,
    how: str = "inner",
    broadcast: bool = False,
) -> DataFrame:
    """Join with an explicit broadcast switch for dimension tables.

    At 100 TB the difference between a broadcast-hash join and a
    shuffled sort-merge join on a fact table is the whole game: pass
    ``broadcast=True`` whenever the right side fits in executor
    memory (dimensions, lookup maps).
    """
    r = F.broadcast(right) if broadcast else right
    return left.join(r, on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on: str | list[str] | Column) -> DataFrame:
    """EXISTS — keeps left rows with a match; never duplicates rows."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | list[str] | Column) -> DataFrame:
    """NOT EXISTS — keeps left rows without a match."""
    return left.join(right, on=on, how="left_anti")


def union_merge(*dfs: DataFrame) -> DataFrame:
    """D5 merge — channel-union ≈ UNION ALL by column name
    (ref: ``a/merge``, ``src/etlp/connector/core.clj:59``)."""
    it: Iterable[DataFrame] = iter(dfs)
    out = next(it)
    for df in it:
        out = out.unionByName(df)
    return out


def top_k(df: DataFrame, k: int, *order: Column) -> DataFrame:
    """Global top-k. Spark plans ``orderBy().limit(k)`` as
    TakeOrderedAndProject: per-partition heaps + a k-row merge on the
    driver — no global sort, safe at any scale."""
    return df.orderBy(*order).limit(k)


def dedupe_exact(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Exact dedup — hash-aggregate on the key columns (shuffles once
    on the dedup key; AQE handles skew)."""
    return df.dropDuplicates(list(cols) if cols else None)


def reassemble(
    df,
    value_col: str = "value",
    order_col: str = "line_id",
    group_cols: Sequence[str] = ("file",),
    boundary_prefix: str = "MSH|",
    sep: str = "\r",
):
    """Multi-line record reassembly (ref: the hl7-xform example,
    ``README.md:28-33`` — segments joined by ``\\r`` with a record
    boundary on lines starting ``MSH|``).

    Record id = running count of boundary lines in (group, order)
    order — one window pass; then one groupBy with an in-group sort
    for deterministic segment order. Two shuffles total, both on
    (group, message) keys; no Python.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*group_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = df.withColumn(
        "__msg_id",
        F.sum(F.when(F.col(value_col).startswith(boundary_prefix), 1).otherwise(0)).over(w),
    ).where(F.col("__msg_id") > 0)
    assembled = (
        marked.groupBy(*group_cols, "__msg_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(order_col).alias("o"), F.col(value_col).alias("v")))
            ).alias("segs")
        )
        .select(
            *group_cols,
            F.col("__msg_id").alias("msg_id"),
            F.array_join(F.transform("segs", lambda s: s.getField("v")), sep).alias("message"),
        )
    )
    return assembled


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    salt: int = 16,
    count_alias: str = "n",
):
    """Two-phase aggregation for skewed group keys.

    Phase 1 groups on (keys + salt bucket) so a hot key's rows spread
    over ``salt`` reducers; phase 2 re-aggregates the partials on the
    real keys (tiny input: one row per key per bucket). Counts and
    sums compose exactly; this helper covers count + sums, which is
    the common hot-key rollup shape.

    At 100 TB this is the manual fallback when AQE's skew handling
    can't help (e.g. a single pathological key inside one partition).
    """
    salt_col = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt))
    phase1 = (
        df.withColumn("__salt", salt_col)
        .groupBy(*keys, "__salt")
        .agg(
            F.count(F.lit(1)).alias("__cnt"),
            *[F.sum(c).alias(f"__sum_{c}") for c in sum_cols],
        )
    )
    return phase1.groupBy(*keys).agg(
        F.sum("__cnt").alias(count_alias),
        *[F.sum(f"__sum_{c}").alias(f"sum_{c}") for c in sum_cols],
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: replicate the (small-ish) right side once
    per salt bucket, scatter left rows uniformly across buckets, join
    on (key, salt). A hot left key now lands on ``salt`` reducers
    instead of one. Result is identical to the plain join.

    The salt is a hash of ALL left columns (deterministic →
    retry-reproducible, unlike rand()). Caveat: the left frame must
    carry at least one column that varies within a hot key — a
    key-only projection makes the salt a function of the key and the
    skew protection silently void.
    """
    buckets = F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("__salt")
    r = right.select("*", buckets)
    l = left.withColumn("__salt", F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(salt)))
    return l.join(r, on=[key, "__salt"], how=how).drop("__salt")


def apply_grouped(df: DataFrame, keys: Sequence[str], fn, schema: str) -> DataFrame:
    """Group-map escape hatch: ``applyInPandas`` over key groups —
    for per-group logic that genuinely can't be a Column expression
    (model scoring, scipy fits). Arrow-batched; one shuffle on keys.
    Everything expressible as expressions should stay expressions
    (see w4_per_user_trend: even regression slopes don't need this).
    """
    return df.groupBy(*keys).applyInPandas(fn, schema)


def profile(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Column profiling (ANALYZE-style data-quality summary): one
    pass, one aggregation — per column: null fraction, approx
    distinct, min/max as strings. The per-column metrics are computed
    in a single job (no per-column scans) and unpivoted via stack.
    """
    cols = list(cols) if cols else df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.round(F.avg(F.col(c).isNull().cast("double")), 6).alias(f"__null_{c}"),
            F.approx_count_distinct(c).alias(f"__dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', `__null_{c}`, `__dist_{c}`, `__min_{c}`, `__max_{c}`" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_expr}) as (column, null_frac, approx_distinct, min_s, max_s)"
        )
    )


def compact(spark, path: str, target_partitions: int | None = None, target_mb: int = 128):
    """Small-file compaction: rewrite a parquet dataset into
    right-sized files (the maintenance op every long-running pipeline
    needs — streaming sinks and frequent upserts fragment datasets,
    and at 100 TB listing/opening millions of tiny files dominates
    scan cost).

    Partition count defaults to total_bytes / target_mb (min 1);
    rewrite is staged + atomically swapped like UpsertParquetSink.

    Size probing and the swap go through the Hadoop FileSystem API
    (py4j), so any Hadoop-FS URI works — file:, hdfs:, s3a:, gs: —
    not just the driver's local disk. On a py4j-less session (Spark
    Connect) it falls back to ``os``/``shutil``, which is then
    local-only by construction.
    """
    df = spark.read.parquet(path)
    try:
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        src = jvm.org.apache.hadoop.fs.Path(path)
        fs = src.getFileSystem(hconf)
    except AttributeError:  # Spark Connect — no JVM bridge
        jvm = fs = src = None

    if target_partitions is None:
        if fs is not None:
            total = fs.getContentSummary(src).getLength()
        else:
            import os

            total = sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _, names in os.walk(path)
                for f in names
            )
        target_partitions = max(1, total // (target_mb * 1024 * 1024))
    staging = f"{path}.__compact__"
    df.repartition(target_partitions).write.mode("overwrite").parquet(staging)
    if fs is not None:
        stg = jvm.org.apache.hadoop.fs.Path(staging)
        fs.delete(src, True)
        if not fs.rename(stg, src):
            raise IOError(f"compact: rename {staging} -> {path} failed")
    else:
        import os
        import shutil

        shutil.rmtree(path)
        os.rename(staging, path)
    return target_partitions
