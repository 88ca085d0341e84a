"""as_of_join / range_join edge cases (ops_temporal)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etlp_spark.ops_temporal import as_of_join, range_join


def ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, 100, ts("2024-01-01 10:00:00")),
            (2, 100, ts("2024-01-01 11:00:00")),
            (3, 200, ts("2024-01-01 10:30:00")),
            (4, 300, ts("2024-01-01 09:00:00")),  # key with no right rows
        ],
        "lid long, key long, lts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, 100, ts("2024-01-01 09:59:00"), 1.0),
            (11, 100, ts("2024-01-01 10:00:00"), 2.0),  # == left 1's ts
            (12, 100, ts("2024-01-01 10:30:00"), 3.0),
            (13, 100, ts("2024-01-01 10:30:00"), 4.0),  # tie on ts, higher rid
            (14, 200, ts("2024-01-01 10:00:00"), 5.0),
        ],
        "rid long, key long, rts timestamp, val double",
    )
    return left, right


def test_asof_strict_excludes_equal_ts(spark, frames):
    left, right = frames
    out = as_of_join(left, right, "key", "lts", "rts", ["val"], tiebreak="rid", strict=True)
    got = {r.lid: r.val_asof for r in out.collect()}
    assert got[1] == 1.0  # 10:00 left sees only 09:59, not the == row
    assert got[2] == 4.0  # tie at 10:30 resolved to the higher rid
    assert got[3] == 5.0
    assert got[4] is None  # no prior right row


def test_asof_nonstrict_includes_equal_ts(spark, frames):
    left, right = frames
    out = as_of_join(left, right, "key", "lts", "rts", ["val"], tiebreak="rid", strict=False)
    got = {r.lid: r.val_asof for r in out.collect()}
    assert got[1] == 2.0  # equal-ts right row now visible
    assert got[3] == 5.0


def test_asof_preserves_left_rowcount(spark, frames):
    left, right = frames
    out = as_of_join(left, right, "key", "lts", "rts", ["val"], tiebreak="rid")
    assert out.count() == left.count()


def test_range_join_bounds(spark):
    left = spark.createDataFrame([(1, 10), (2, 20)], "k long, lo long")
    right = spark.createDataFrame([(1, 12), (1, 31), (2, 25)], "k long, v long")
    out = range_join(
        left, right,
        equi=left.k == right.k,
        lower=right.v >= left.lo,
        upper=right.v <= left.lo + 10,
    )
    assert sorted((r.k, r.v) for r in out.select(left.k, right.v).collect()) == [(1, 12), (2, 25)]


def test_asof_forward_nonstrict(spark, frames):
    left, right = frames
    out = as_of_join(
        left, right, "key", "lts", "rts", ["val"],
        tiebreak="rid", strict=False, direction="forward",
    )
    got = {r.lid: r.val_asof for r in out.collect()}
    assert got[1] == 2.0  # equal-ts right row is the earliest at-or-after
    assert got[2] is None  # nothing after 11:00 for key 100
    assert got[4] is None  # key with no right rows


def test_asof_forward_strict_tiebreak(spark, frames):
    left, right = frames
    out = as_of_join(
        left, right, "key", "lts", "rts", ["val"],
        tiebreak="rid", strict=True, direction="forward",
    )
    got = {r.lid: r.val_asof for r in out.collect()}
    assert got[1] == 3.0  # skips the equal-ts row; 10:30 tie → LOWER rid
    assert got[3] is None  # 10:30 left, no strictly-later right for key 200


def test_asof_forward_tolerance(spark, frames):
    out = as_of_join(
        *frames, on="key", left_ts="lts", right_ts="rts", value_cols=["val"],
        tiebreak="rid", strict=False, direction="forward",
        tolerance_seconds=600,
    )
    got = {r.lid: r.val_asof for r in out.collect()}
    assert got[1] == 2.0  # match at 0s gap
    assert got[3] is None  # key 200: no at-or-after match at all
    # left 4 (09:00, key 300): no right rows — stays null, no crash
    assert got[4] is None
    assert len(got) == 4  # tolerance path preserves left rowcount too


def test_asof_backward_tolerance(spark, frames):
    left, right = frames
    out = as_of_join(
        left, right, "key", "lts", "rts", ["val"],
        tiebreak="rid", strict=True, tolerance_seconds=60,
    )
    got = {r.lid: r.val_asof for r in out.collect()}
    assert got[1] == 1.0  # 09:59 is 60s before 10:00 — inside tolerance
    assert got[2] is None  # latest prior is 10:30, 30min gap > 60s


def test_asof_bad_direction_raises(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="direction"):
        as_of_join(left, right, "key", "lts", "rts", ["val"], direction="sideways")


def test_asof_nearest_picks_closer_side_and_breaks_ties_backward(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ts(sec):
        return t0 + dt.timedelta(seconds=sec)

    left = spark.createDataFrame(
        [(1, "k", ts(100)), (2, "k", ts(500)), (3, "k", ts(1300))],
        ["lid", "key", "lts"],
    )
    right = spark.createDataFrame(
        [
            (10, "k", ts(90), 1.0),    # 10s before left#1 (closest)
            (11, "k", ts(130), 2.0),   # 30s after left#1
            (20, "k", ts(450), 3.0),   # 50s before left#2 — EQUIDISTANT
            (21, "k", ts(550), 4.0),   # 50s after left#2 — with this one
            (30, "k", ts(2000), 5.0),  # left#3: backward 750s / forward
            #                            700s away — BOTH beyond 600s
        ],
        ["rid", "key", "rts", "val"],
    )
    out = {
        r.lid: r.val_asof
        for r in as_of_join(
            left, right, "key", "lts", "rts", ["val"],
            tiebreak="rid", strict=False, direction="nearest",
            tolerance_seconds=600,
        ).collect()
    }
    assert out[1] == 1.0  # backward 10s beats forward 30s
    assert out[2] == 3.0  # equidistant -> backward (earlier) row
    assert out[3] is None  # only match is outside tolerance


def test_asof_nearest_tolerance_is_per_side(spark):
    """An out-of-window backward match must not shadow an in-window
    forward one."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)

    def ts(sec):
        return t0 + dt.timedelta(seconds=sec)

    left = spark.createDataFrame([(1, "k", ts(1000))], ["lid", "key", "lts"])
    right = spark.createDataFrame(
        [(10, "k", ts(0), 1.0), (11, "k", ts(1200), 2.0)],
        ["rid", "key", "rts", "val"],
    )
    out = as_of_join(
        left, right, "key", "lts", "rts", ["val"],
        tiebreak="rid", strict=False, direction="nearest",
        tolerance_seconds=300,
    ).collect()
    assert out[0].val_asof == 2.0  # backward is 1000s away (out), forward 200s (in)


def test_binned_range_join_matches_cross_filter(spark):
    """binned_range_join == the naive cross-join + range filter."""
    import datetime as dt

    from etlp_spark.ops_temporal import binned_range_join

    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(i, base + dt.timedelta(seconds=37 * i)) for i in range(40)],
        "lid long, lts timestamp",
    )
    right = spark.createDataFrame(
        [(i, base + dt.timedelta(seconds=53 * i + 11)) for i in range(40)],
        "rid long, rts timestamp",
    )
    got = {
        (r.lid_l, r.rid_r)
        for r in binned_range_join(left, right, "lts", "rts", 60).collect()
    }
    naive = {
        (r.lid, r.rid)
        for r in left.crossJoin(right)
        .where(F.abs(F.col("lts").cast("long") - F.col("rts").cast("long")) <= 60)
        .collect()
    }
    assert got == naive and len(got) > 0
