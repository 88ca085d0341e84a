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

__all__ = ["as_of_join", "binned_range_join", "range_join", "time_bucket"]


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
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Attach the nearest right-side values to each left row.

    ``direction="backward"`` (default, pandas ``merge_asof`` naming):
    the most recent right row at-or-before the left timestamp.
    ``direction="forward"``: the earliest right row at-or-after it.
    ``direction="nearest"``: whichever of the two is closer in time
    (equidistant → the backward match, i.e. the earlier row).
    ``strict=True`` → exclusive comparison (< / >);
    ``strict=False`` → inclusive (<= / >=).
    ``tolerance_seconds`` → matches farther than this from the left
    timestamp are nulled out (like ``merge_asof(tolerance=...)``).
    Accepts int or float; sub-second tolerances (e.g. 0.5) are honored
    at microsecond precision, not truncated to zero;
    for ``nearest`` the tolerance applies per side BEFORE the closer-
    of-two pick, so an out-of-window backward match can't shadow an
    in-window forward one.
    Ties within right are resolved by (ts, tiebreak), so the match is
    fully deterministic.

    Returns all left columns plus ``{v}{suffix}`` for each value col.

    All three directions share the same union+window plan — ONE
    shuffle of left+right together on the key, no pair explosion;
    forward just flips the sort order, and nearest runs BOTH sorted
    passes over the one exchange (two Sort operators, zero extra
    shuffles) then picks the smaller microsecond gap per row.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if (
        tolerance_seconds is not None
        and tolerance_seconds != 0
        and int(tolerance_seconds * 1_000_000) < 1
    ):
        # EXACTLY 0 is meaningful (match only at-equal timestamps; the
        # gap comparison needs no division), but a sub-microsecond
        # nonzero tolerance floors to 0µs and would silently tighten
        # to exact-match instead of erroring.
        raise ValueError(
            "nonzero tolerance must be at least 1 microsecond, got "
            f"{tolerance_seconds}s"
        )
    keys = [on] if isinstance(on, str) else list(on)
    need_match_ts = tolerance_seconds is not None or direction == "nearest"
    if need_match_ts and "__match_ts" not in value_cols:
        # carry the matched timestamp so the tolerance / nearest pick
        # can be applied after the window pass (internal column,
        # dropped at the end)
        right = right.withColumn("__match_ts", F.col(right_ts))
        value_cols = list(value_cols) + ["__match_ts"]

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
    # Backward scans time ascending; forward scans descending (so the
    # "last seen" right row is the EARLIEST future one). strict → at
    # equal ts the left row sorts BEFORE right rows in scan order, so
    # with an exclusive frame it cannot see them; non-strict → right
    # rows first. The tiebreak orders right rows among themselves only
    # (left rows carry null there, already separated by placement).
    def _order(fwd_: bool) -> list[Column]:
        ts_order = F.col("__ts").desc() if fwd_ else F.col("__ts").asc()
        placement = F.col("__is_left").desc() if strict else F.col("__is_left").asc()
        order = [ts_order, placement]
        if tiebreak is not None:
            # among equal-ts right rows the match is min(tiebreak)
            # forward / max(ts, tiebreak) backward — last in scan order.
            order.append(
                F.col("__tb").desc() if fwd_ else F.col("__tb").asc_nulls_first()
            )
        return order

    def _window(fwd_: bool) -> Window:
        return (
            Window.partitionBy(*keys)
            .orderBy(*_order(fwd_))
            .rowsBetween(Window.unboundedPreceding, -1)
        )

    if direction == "nearest":
        # Both directional passes over ONE exchange (same partition
        # key, two in-partition sorts), then the smaller-gap pick.
        carried = unioned.select(
            "*",
            *[
                F.last(F.col(f"__rv_{v}"), ignorenulls=True)
                .over(_window(False))
                .alias(f"__b_{v}")
                for v in value_cols
            ],
            *[
                F.last(F.col(f"__rv_{v}"), ignorenulls=True)
                .over(_window(True))
                .alias(f"__f_{v}")
                for v in value_cols
            ],
        ).where(F.col("__is_left") == 1)
        lts_us = F.unix_micros(F.col(left_ts))
        gap_b = lts_us - F.unix_micros(F.col("__b___match_ts"))
        gap_f = F.unix_micros(F.col("__f___match_ts")) - lts_us
        ok_b = F.col("__b___match_ts").isNotNull()
        ok_f = F.col("__f___match_ts").isNotNull()
        if tolerance_seconds is not None:
            tol_us = F.lit(int(tolerance_seconds * 1_000_000))
            ok_b = ok_b & (gap_b <= tol_us)
            ok_f = ok_f & (gap_f <= tol_us)
        use_b = ok_b & (~ok_f | (gap_b <= gap_f))  # tie → backward
        return carried.select(
            *[F.col(c) for c in left.columns],
            *[
                F.when(use_b, F.col(f"__b_{v}"))
                .when(ok_f, F.col(f"__f_{v}"))
                .alias(f"{v}{suffix}")
                for v in value_cols
                if v != "__match_ts"
            ],
        )

    fwd = direction == "forward"
    w = _window(fwd)
    carried = unioned.select(
        "*",
        *[
            F.last(F.col(f"__rv_{v}"), ignorenulls=True).over(w).alias(f"{v}{suffix}")
            for v in value_cols
        ],
    )
    out = carried.where(F.col("__is_left") == 1)
    if tolerance_seconds is not None:
        match_ts = F.col(f"__match_ts{suffix}")
        # Microsecond-exact gap: cast("long") truncates to whole seconds,
        # which can mis-classify sub-second data vs the oracle's exact
        # `ts <= l.ts + INTERVAL` comparison (same pitfall
        # binned_range_join avoids with unix_micros).
        gap = (
            (F.unix_micros(match_ts) - F.unix_micros(F.col(left_ts)))
            if fwd
            else (F.unix_micros(F.col(left_ts)) - F.unix_micros(match_ts))
        )
        in_tol = match_ts.isNotNull() & (
            gap <= F.lit(int(tolerance_seconds * 1_000_000))
        )
        out = out.select(
            *[F.col(c) for c in left.columns],
            *[
                F.when(in_tol, F.col(f"{v}{suffix}")).alias(f"{v}{suffix}")
                for v in value_cols
                if v != "__match_ts"
            ],
        )
        return out
    out_cols = [c for c in left.columns] + [f"{v}{suffix}" for v in value_cols]
    return out.select(*out_cols)


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


def binned_range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    tolerance_seconds: float,
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> DataFrame:
    """Pure-inequality time-proximity join — NO equi key: every left
    row pairs with every right row whose timestamp is within
    ``tolerance_seconds``. The naive form is a cross join with a
    range filter (quadratic, unusable at scale); this is the standard
    bin-replicate recipe that turns it into an EQUI join:

    - both sides bin their epoch seconds at ``tolerance_seconds``
      granularity;
    - the RIGHT side replicates into (bin-1, bin, bin+1) — a fixed 3×
      fan-out, independent of data size;
    - the join is a plain hash equi-join on the bin, post-filtered by
      the exact |Δt| ≤ tolerance predicate.

    Cost at scale: one shuffle of each side on the bin key, pair
    fan-out bounded by (rows per bin)² per bin — i.e. by data DENSITY
    in time, not corpus size. A hot bin (traffic spike) is the skew
    case; AQE skew-join splitting or a bin-size cap handles it, same
    as every LSH bucket guard in this repo.

    Column names collide unprefixed — both sides are prefixed with
    ``suffixes`` before the join.
    """
    sl, sr = suffixes
    # Microsecond precision throughout: cast-to-long truncates to whole
    # seconds, which silently widens the tolerance by up to a second
    # (and disagrees with any engine computing exact deltas).
    tol_us = int(tolerance_seconds * 1_000_000)
    if tol_us < 1:
        # floor(x / 0) yields NULL bins in non-ANSI mode — the join
        # would silently return zero rows instead of erroring.
        raise ValueError(
            "tolerance must be at least 1 microsecond, got "
            f"{tolerance_seconds}s"
        )
    lb = left.select(
        *[F.col(c).alias(f"{c}{sl}") for c in left.columns],
        F.floor(F.unix_micros(F.col(left_ts)) / tol_us).alias("__bin"),
    )
    rbin = F.floor(F.unix_micros(F.col(right_ts)) / tol_us)
    rb = right.select(
        *[F.col(c).alias(f"{c}{sr}") for c in right.columns],
        F.explode(F.array(rbin - 1, rbin, rbin + 1)).alias("__bin"),
    )
    close = (
        F.abs(
            F.unix_micros(F.col(f"{left_ts}{sl}"))
            - F.unix_micros(F.col(f"{right_ts}{sr}"))
        )
        <= tol_us
    )
    return lb.join(rb, "__bin").where(close).drop("__bin")
