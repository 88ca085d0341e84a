"""Engine-portable distinct-count sketches (HyperLogLog).

``g9_hll_sketch_union`` exercises Spark's built-in datasketches HLL,
whose serialized bytes and estimates are JVM-implementation-specific —
a DuckDB oracle can only check it within a tolerance band. This module
is the complement: an EXPLICIT HyperLogLog (Flajolet et al. 2007,
"HyperLogLog: the analysis of a near-optimal cardinality estimation
algorithm") built from md5 bits and integer register arithmetic, so
the same registers — and therefore the same estimate, bit-for-bit —
fall out of any engine that has ``md5``, ``bin`` and 64-bit shifts.
That makes the sketch (a) hash-exact under the cross-engine oracle
gate and (b) portable: registers computed by Spark, DuckDB, or the
Python streaming twin (``streaming.approx_distinct_tws``) merge with
a plain element-wise ``max``.

Register derivation (p index bits, m = 2**p registers, p % 4 == 0 so
fields fall on hex-digit boundaries):

- ``bucket`` = first ``p/4`` md5 hex digits (p bits).
- ``v``      = next 13 hex digits (52 bits).
- ``rho``    = leading zeros of ``v`` within 52 bits, plus 1
             = ``53 - bit_length(v)`` (53 when v == 0) — computed as
             ``53 - length(bin(v))``, identical in Spark and DuckDB.

Exactness discipline for the ESTIMATE: the harmonic-mean denominator
``sum(2^-reg)`` is kept as the INTEGER ``sum(2^(53-reg))`` (each term
a power of two ≤ 2^52; the 2^53-scaled sum of ≤ m terms fits int64),
so partial aggregation is order-free and exact; the only floats are
one division and (in the small-range branch) one ``ln`` on identical
operands — IEEE-identical across engines, then e6-floored.

Scale shape: register extraction is scan-stage; the register table is
``m`` rows per group (CONSTANT in corpus size), so estimates and
unions always aggregate/broadcast trivially — the mergeability that
lets daily partials roll up to any horizon without rescanning raw
data, now with engine-portable bytes.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "hll_numer",
    "hll_bucket_rho",
    "hll_registers",
    "hll_estimate",
    "py_hll_update",
    "py_hll_estimate",
    "dd_gamma",
    "dd_bucket",
    "dd_sketch",
    "dd_quantiles",
]

_TWO53 = 1 << 53  # 2^-reg scaled to an exact int64 term: 2^(53-reg)


def hll_numer(p: int = 8) -> float:
    """``alpha_m * m^2 * 2^53`` as one Python double — embedded as the
    SAME literal in Spark and oracle SQL so the raw-estimate division
    is IEEE-identical (alpha for m >= 128, Flajolet et al. Fig. 3)."""
    m = float(1 << p)
    return 0.7213 / (1.0 + 1.079 / m) * m * m * 9007199254740992.0


def hll_bucket_rho(value: Column | str, p: int = 8) -> tuple[Column, Column]:
    """(bucket, rho) register-update columns for one value — the
    scan-stage kernel. md5-derived so any engine reproduces it."""
    if p % 4 != 0 or not 4 <= p <= 16:
        raise ValueError(f"p must be a multiple of 4 in [4,16], got {p}")
    c = F.col(value) if isinstance(value, str) else value
    h = F.md5(c.cast("string"))
    nb = p // 4
    bucket = F.conv(F.substring(h, 1, nb), 16, 10).cast("long")
    v = F.conv(F.substring(h, nb + 1, 13), 16, 10).cast("long")
    rho = F.when(v == 0, F.lit(53)).otherwise(F.lit(53) - F.length(F.bin(v)))
    return bucket, rho.cast("int")


def hll_registers(
    df: DataFrame, value: Column | str, keys: tuple[str, ...] = (), p: int = 8
) -> DataFrame:
    """Per-``keys`` HLL register table: (keys..., bucket, reg) with
    reg = max(rho) — at most ``2**p`` rows per key group regardless of
    corpus size. Register tables MERGE by element-wise max, so
    partials computed per day/partition/engine union freely."""
    bucket, rho = hll_bucket_rho(value, p)
    return (
        df.select(*keys, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*keys, "bucket")
        .agg(F.max("rho").alias("reg"))
    )


def hll_estimate(
    regs: DataFrame, keys: tuple[str, ...] = (), p: int = 8
) -> DataFrame:
    """Collapse a register table to per-``keys`` ``est_e6`` (the HLL
    estimate, e6-floored): raw harmonic-mean estimate with the
    small-range linear-counting correction (E_raw <= 2.5m with empty
    registers -> m * ln(m / V))."""
    m = 1 << p
    agg = regs.groupBy(*keys).agg(
        F.sum(F.expr("shiftleft(cast(1 as bigint), 53 - reg)"))
        .alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    s = (F.col("s_present") + (F.lit(m) - F.col("n_present")) * F.lit(_TWO53)).alias(
        "s_int"
    )
    v0 = (F.lit(m) - F.col("n_present")).alias("v0")
    d = agg.select(*keys, s, v0)
    e_raw = F.lit(hll_numer(p)) / F.col("s_int")
    e = F.when(
        (F.col("v0") > 0) & (e_raw <= F.lit(2.5 * m)),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v0")),
    ).otherwise(e_raw)
    return d.select(
        *keys,
        F.floor(e * F.lit(1000000.0) + F.lit(0.5)).cast("long").alias("est_e6"),
    )


# ----- DDSketch (relative-error quantiles, engine-portable) ----------


def dd_gamma(alpha: float = 0.01) -> float:
    """DDSketch gamma for relative-error bound ``alpha`` (Masson et
    al. 2019, "DDSketch: a fast and fully-mergeable quantile sketch
    with relative-error guarantees") — one Python double embedded
    identically in Spark and oracle SQL."""
    return (1.0 + alpha) / (1.0 - alpha)


def dd_bucket(value: Column | str, alpha: float = 0.01) -> Column:
    """Log-bucket index ``ceil(ln(v)/ln(gamma))`` for v > 0 — the
    same double ops in any engine give the same integer bucket."""
    c = F.col(value) if isinstance(value, str) else value
    g = dd_gamma(alpha)
    return F.ceil(F.log(c.cast("double")) / F.lit(math.log(g))).cast("long")


def dd_sketch(
    df: DataFrame, value: Column | str, keys: tuple[str, ...] = (),
    alpha: float = 0.01,
) -> DataFrame:
    """Per-``keys`` DDSketch: (keys..., bucket, cnt) over POSITIVE
    values. Sketches MERGE by adding counts bucket-wise — fully
    mergeable across partials/days/engines, the property exact
    quantiles lack. Bucket count is bounded by the dynamic range
    (log_gamma(max/min) buckets — ~2.3k for 10 decades at alpha=1%),
    CONSTANT in row count."""
    c = F.col(value) if isinstance(value, str) else value
    return (
        df.where(c > 0)
        .select(*keys, dd_bucket(c, alpha).alias("bucket"))
        .groupBy(*keys, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dd_quantiles(
    sketch: DataFrame, qs: tuple[float, ...], keys: tuple[str, ...] = (),
    alpha: float = 0.01,
) -> DataFrame:
    """Quantile estimates from a DDSketch: for each q, the bucket
    where the cumulative count first reaches rank floor(q*(n-1))+1,
    estimated at ``2*gamma^b/(gamma+1)`` (the bucket's geometric
    midpoint). Returns keys + q + est_e6 + n (the group's total
    count, free from the same window); the estimate is within
    relative error alpha of the true rank statistic by construction.

    Scale shape: one window cumsum over <=|buckets| rows per key
    group, then a constant-size qs explode — nothing here scales with
    row count; the corpus-sized work happened (and partial-aggregated
    map-side) in ``dd_sketch``."""
    from pyspark.sql import Window

    g = dd_gamma(alpha)
    w = Window.partitionBy(*keys).orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wn = Window.partitionBy(*keys)
    cum = sketch.select(
        *keys, "bucket", "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wn).alias("n"),
    )
    # qs as a literal VALUES LocalRelation (broadcast is free; see the
    # x98 createDataFrame lesson in PERF.md)
    qdf = cum.crossJoin(
        F.broadcast(
            cum.sparkSession.sql(
                "SELECT q FROM VALUES "
                + ", ".join(f"(CAST({q!r} AS DOUBLE))" for q in qs)
                + " AS t(q)"
            )
        )
    )
    rank = F.floor(F.col("q") * (F.col("n") - 1)) + 1
    hit = qdf.where(
        (F.col("cum") >= rank) & (F.col("cum") - F.col("cnt") < rank)
    )
    est = F.lit(2.0) * F.pow(F.lit(g), F.col("bucket")) / F.lit(g + 1.0)
    return hit.select(
        *keys,
        "q",
        F.floor(est * F.lit(1000000.0) + F.lit(0.5)).cast("long").alias("est_e6"),
        "n",
    )


# ----- Python twin (streaming TWS state; bit-identical registers) ----


def py_hll_update(values, regs: dict[int, int], p: int = 8) -> set[int]:
    """Fold ``values`` into a register dict IN PLACE; returns the set
    of buckets that changed (what a MapState twin writes back). md5 on
    UNIQUE values only — duplicates cannot raise a max."""
    nb = p // 4
    changed: set[int] = set()
    for val in set(str(v) for v in values):
        h = hashlib.md5(val.encode("utf-8")).hexdigest()
        bucket = int(h[:nb], 16)
        v = int(h[nb : nb + 13], 16)
        rho = 53 if v == 0 else 53 - v.bit_length()
        if rho > regs.get(bucket, 0):
            regs[bucket] = rho
            changed.add(bucket)
    return changed


def py_hll_estimate(regs: dict[int, int], p: int = 8) -> int:
    """``est_e6`` from a register dict — the same double operations in
    the same order as ``hll_estimate``, so a streaming twin's estimate
    equals the batch estimate on identical data, bit-for-bit."""
    import math

    m = 1 << p
    s_present = sum(1 << (53 - r) for r in regs.values())
    n_present = len(regs)
    s_int = s_present + (m - n_present) * _TWO53
    v0 = m - n_present
    e_raw = hll_numer(p) / s_int
    if v0 > 0 and e_raw <= 2.5 * m:
        e = float(m) * math.log(float(m) / v0)
    else:
        e = e_raw
    return math.floor(e * 1000000.0 + 0.5)
