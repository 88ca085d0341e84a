"""Experimentation statistics (engine-added): CUPED variance-reduced
deltas and the sample-ratio-mismatch guardrail — the analysis ops an
event log feeds after the pipeline work is done.

Exactness discipline (the repo rule): every MOMENT is an exact BIGINT
under order-free partial aggregation (per-unit values floored to
integers FIRST), and the statistics are then a fixed dag of float ops
on identical operands — engine-identical, e6-floored once at the
edge. At extreme scales swap the moment sums to DECIMAL(38,0) before
the products approach int64 range.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["cuped_adjusted_delta", "srm_chi2"]

#: chi-square 95% critical value, df=1 (scipy.stats.chi2.ppf(.95, 1))
CHI2_95_DF1 = 3.841458820694124


def cuped_adjusted_delta(
    units: DataFrame, arm_col: str = "arm", x_col: str = "x", y_col: str = "y"
) -> DataFrame:
    """CUPED readout (Deng et al. 2013) from per-unit integer rows
    (arm ∈ {0, 1}, x = pre-period covariate, y = experiment metric):
    one moment row → n_a, n_b, raw_delta_e6, theta_e6, adj_delta_e6,
    with pooled ``theta = cov(x, y) / var(x)`` and
    ``adj_delta = raw_delta - theta * delta_x``.

    Scale shape: a single all-reduce to ONE row (map-side partial
    sums); nothing downstream exceeds one row."""
    arm0 = F.col(arm_col) == 0
    x, y = F.col(x_col), F.col(y_col)
    m = units.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(F.when(arm0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(~arm0, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(arm0, x).otherwise(0)).alias("sx_a"),
        F.sum(F.when(~arm0, x).otherwise(0)).alias("sx_b"),
        F.sum(F.when(arm0, y).otherwise(0)).alias("sy_a"),
        F.sum(F.when(~arm0, y).otherwise(0)).alias("sy_b"),
    )
    raw_delta = (
        F.col("sy_b") * F.lit(1.0) / F.col("n_b")
        - F.col("sy_a") * F.lit(1.0) / F.col("n_a")
    )
    dx = (
        F.col("sx_b") * F.lit(1.0) / F.col("n_b")
        - F.col("sx_a") * F.lit(1.0) / F.col("n_a")
    )
    theta = (
        F.col("sxy") * F.lit(1.0) - F.col("sx") * F.lit(1.0) * F.col("sy") / F.col("n")
    ) / (
        F.col("sxx") * F.lit(1.0) - F.col("sx") * F.lit(1.0) * F.col("sx") / F.col("n")
    )
    e6 = lambda c: F.floor(c * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    return m.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        e6(raw_delta).alias("raw_delta_e6"),
        e6(theta).alias("theta_e6"),
        e6(raw_delta - theta * dx).alias("adj_delta_e6"),
    )


def srm_chi2(
    units: DataFrame, arm_col: str = "arm", keys: tuple[str, ...] = ()
) -> DataFrame:
    """Sample-ratio-mismatch guardrail (Fabijan et al. 2019): per
    ``keys``, the df=1 chi-square of the observed arm counts against
    the designed 50/50 split, flagged at the 95% critical value. Run
    this BEFORE reading any delta — a biased assignment invalidates
    the experiment regardless of the metric math."""
    m = units.groupBy(*keys).agg(
        F.sum(F.when(F.col(arm_col) == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col(arm_col) == 1, 1).otherwise(0)).alias("n_b"),
    )
    d = F.col("n_a") - F.col("n_b")
    chi2 = d * d * F.lit(1.0) / (F.col("n_a") + F.col("n_b"))
    return m.select(
        *keys,
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.floor(chi2 * F.lit(1000000.0) + F.lit(0.5)).cast("long").alias("chi2_e6"),
        (chi2 > F.lit(CHI2_95_DF1)).alias("srm_flag"),
    )
