"""Temporal operators: as-of join, range join, time buckets.

These are the "operators the reference lacks and Spark lacks" tier
(SURVEY.md §2.2 / build-plan custom-operator guidance): implemented
as compositions of native DataFrame ops — no Pandas fallback needed.

**as_of_join** — for each left row, the latest right row at-or-before
(or strictly-before) the left timestamp, per key. The classic
implementations:

  a) inequality join + aggregate: O(n·m) pairs per key — explodes at
     scale; rejected.
  b) union + window (used here): tag both sides, one shuffle on
     (key), sort within partition by (ts, tiebreak), carry the last
     right payload forward with ``last(ignorenulls=True)``. Cost: ONE
     shuffle of left+right together, no pair explosion, skew handled
     by AQE. This is how kdb/QuestDB-style asof joins map onto a
     shuffle engine.

**range_join** — equi-anchored interval predicate. Spark executes the
equi part as a hash join and post-filters the range — at 100 TB make
sure the equi key is selective (here: orderkey) or bin the range.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["as_of_join", "range_join", "time_bucket"]


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tiebreak: str | None = None,
    strict: bool = True,
    suffix: str = "_asof",
) -> DataFrame:
    """Attach the most recent right-side values to each left row.

    ``strict=True`` → right.ts < left.ts (prior only);
    ``strict=False`` → right.ts <= left.ts.
    Ties within right are resolved by (ts, tiebreak) ascending, so
    "latest" is the max (ts, tiebreak) — fully deterministic.

    Returns all left columns plus ``{v}{suffix}`` for each value col.
    """
    keys = [on] if isinstance(on, str) else list(on)

    tb_type = dict(right.dtypes).get(tiebreak, "long") if tiebreak else "long"
    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__is_left"),
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(tb_type).alias("__tb"),
        *[F.lit(None).cast(dict(right.dtypes)[v]).alias(f"__rv_{v}") for v in value_cols],
    )
    rhs = right.select(
        *[F.lit(None).cast(dict(left.dtypes).get(c, "string")).alias(c) for c in left.columns if c not in keys],
        *[F.col(k) for k in keys],
        F.lit(0).alias("__is_left"),
        F.col(right_ts).alias("__ts"),
        (F.col(tiebreak) if tiebreak and tiebreak in right.columns else F.lit(None)).cast(tb_type).alias("__tb"),
        *[F.col(v).alias(f"__rv_{v}") for v in value_cols],
    )
    unioned = lhs.unionByName(rhs)

    # Sort order decides visibility: (ts, placement, tiebreak).
    # strict → at equal ts the left row sorts BEFORE right rows, so
    # with an exclusive frame it cannot see them; non-strict → right
    # rows first. The tiebreak orders right rows among themselves only
    # (left rows carry null there, already separated by placement).
    placement = F.col("__is_left").desc() if strict else F.col("__is_left").asc()
    order = [F.col("__ts").asc(), placement]
    if tiebreak is not None:
        order.append(F.col("__tb").asc_nulls_first())

    w = Window.partitionBy(*keys).orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    carried = unioned.select(
        "*",
        *[
            F.last(F.col(f"__rv_{v}"), ignorenulls=True).over(w).alias(f"{v}{suffix}")
            for v in value_cols
        ],
    )
    out_cols = [c for c in left.columns] + [f"{v}{suffix}" for v in value_cols]
    return carried.where(F.col("__is_left") == 1).select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    equi: Column,
    lower: Column,
    upper: Column,
    how: str = "inner",
) -> DataFrame:
    """Equi-anchored interval join: ``equi AND lower AND upper``.

    Catalyst plans the equi conjunct as the hash-join key and applies
    the range predicates as join filters — scan-side pushdown keeps
    the pair count bounded by the equi-key fan-out.
    """
    return left.join(right, equi & lower & upper, how)


def time_bucket(col: Column | str, width: str = "hour") -> Column:
    """Hypertable-style bucketing: truncate a timestamp to the bucket
    start (the shuffle key for time-series rollups)."""
    return F.date_trunc(width, F.col(col) if isinstance(col, str) else col)
