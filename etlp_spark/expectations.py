"""Declarative data-quality expectations over DataFrames.

The reference's error story is per-record try/catch routed to an
error channel (``src/etlp/connector/dag.clj:39-45``,
``src/etlp/utils/async.clj:49-51``) — failures are *exceptions*. A
100 TB pipeline also needs the other kind of failure: rows that parse
fine but violate the data contract. This module supplies that as a
small expectations layer:

- **row-level checks** (not_null / in_range / accepted_values /
  matches / custom predicate) compile to Column predicates and are
  evaluated in ONE scan-stage pass — the violation report is a
  conditional-sum aggregate, no per-check scan;
- **unique** needs a shuffle on the key (count > 1 per group) and is
  deliberately separate so the caller can see which checks are free
  and which cost an exchange;
- **referential** is a broadcast-able anti-join against the reference
  keys;
- ``validate`` returns (clean_df, violations_df, summary): violations
  carry the list of failed check names per row, ready to wrap into
  the ETLP error envelope (``envelope.wrap_error``) and route to an
  error sink — the engine's version of the reference's error channel,
  but for contract violations instead of exceptions.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "Check",
    "not_null",
    "in_range",
    "accepted_values",
    "matches",
    "predicate",
    "unique",
    "referential",
    "validate",
    "ValidationResult",
]


@dataclass(frozen=True)
class Check:
    """A named expectation. ``kind`` routes the evaluation strategy:
    'row' (scan-stage predicate), 'unique' (windowed count per key),
    'referential' (anti-join)."""

    name: str
    kind: str
    build: Callable[[DataFrame], Column] | None = None  # row: True = OK
    cols: tuple[str, ...] = ()
    ref: DataFrame | None = None
    ref_col: str | None = None
    broadcast: bool = False  # referential: hint the (distinct) key set


def _and_all(conds: list[Column]) -> Column:
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def not_null(*cols: str) -> Check:
    return Check(
        name=f"not_null({','.join(cols)})",
        kind="row",
        build=lambda df: _and_all([F.col(c).isNotNull() for c in cols]),
        cols=cols,
    )


def in_range(col: str, lo, hi) -> Check:
    return Check(
        name=f"in_range({col},{lo},{hi})",
        kind="row",
        build=lambda df: F.col(col).isNotNull()
        & (F.col(col) >= F.lit(lo))
        & (F.col(col) <= F.lit(hi)),
        cols=(col,),
    )


def accepted_values(col: str, values: Sequence) -> Check:
    # NULL.isin(...) is NULL in three-valued logic; guard isNotNull so
    # a NULL input *fails* the check (consistent with not_null/in_range
    # and with the SQL oracle's CASE WHEN ... THEN 0 ELSE 1 counting).
    vals = list(values)
    return Check(
        name=f"accepted_values({col})",
        kind="row",
        build=lambda df: F.col(col).isNotNull() & F.col(col).isin(vals),
        cols=(col,),
    )


def matches(col: str, pattern: str) -> Check:
    return Check(
        name=f"matches({col})",
        kind="row",
        build=lambda df: F.col(col).isNotNull() & F.col(col).rlike(pattern),
        cols=(col,),
    )


def predicate(name: str, build: Callable[[DataFrame], Column]) -> Check:
    """Escape hatch: any Column predicate (True = row passes)."""
    return Check(name=name, kind="row", build=build)


def unique(*cols: str) -> Check:
    return Check(name=f"unique({','.join(cols)})", kind="unique", cols=cols)


def referential(
    col: str, ref: DataFrame, ref_col: str, *, broadcast: bool = False
) -> Check:
    """Existence check against a reference key set.

    ``broadcast=True`` adds an explicit broadcast hint — use it only
    when the reference side is known-small. The default leaves the
    join strategy to Catalyst/AQE so a large reference dimension gets
    a shuffle join instead of an executor-OOMing forced broadcast.
    """
    return Check(
        name=f"referential({col})", kind="referential", cols=(col,),
        ref=ref, ref_col=ref_col, broadcast=broadcast,
    )


@dataclass(frozen=True)
class ValidationResult:
    clean: DataFrame
    violations: DataFrame  # input rows + ``failed_checks`` array column
    summary: DataFrame  # (check, n_violations)


def validate(
    df: DataFrame, checks: Sequence[Check], *, materialize: bool = False
) -> ValidationResult:
    """Evaluate every check and split the frame.

    ``materialize=True`` eagerly localCheckpoints the flagged frame
    before the clean/violations split: both outputs (and the summary)
    then read ONE materialized evaluation instead of re-running the
    source + checks per consumer — required for correctness when the
    source is non-deterministic (an HTTP poll, a growing directory),
    and a 2× cost saving otherwise. Off by default so purely-
    declarative callers keep an unmaterialized lineage.

    Cost model (the point of the design): all row-kind checks share
    ONE scan — each contributes a boolean column and the summary is a
    single conditional-sum aggregate; each ``unique`` adds one
    windowed count over its key; each ``referential`` adds one
    anti-join-shaped flag (broadcast only when the caller opted in
    via ``referential(..., broadcast=True)``; otherwise Catalyst/AQE
    picks the strategy). The input is never scanned once per check.
    """
    flagged = df
    flag_cols: list[tuple[str, str]] = []  # (flag col, check name)
    for i, ch in enumerate(checks):
        flag = f"__ok_{i}"
        if ch.kind == "row":
            # Coerce to a definite boolean: a NULL predicate result
            # (three-valued logic) means the row did NOT pass.
            flagged = flagged.withColumn(
                flag, F.coalesce(ch.build(flagged), F.lit(False))
            )
        elif ch.kind == "unique":
            w = Window.partitionBy(*[F.col(c) for c in ch.cols])
            flagged = flagged.withColumn(flag, F.count(F.lit(1)).over(w) == 1)
        elif ch.kind == "referential":
            ref_keys = ch.ref.select(
                F.col(ch.ref_col).alias("__ref_key")
            ).distinct()
            # Join strategy is Catalyst/AQE's call unless the caller
            # opted into a broadcast hint via referential(broadcast=True).
            # The hint goes on the DISTINCT key set (hinting the raw
            # ref frame would bury the hint under the aggregate, where
            # the join planner can lose it).
            if ch.broadcast:
                ref_keys = F.broadcast(ref_keys)
            flagged = flagged.join(
                ref_keys,
                flagged[ch.cols[0]] == ref_keys["__ref_key"],
                "left",
            ).withColumn(flag, F.col("__ref_key").isNotNull()).drop("__ref_key")
        else:  # pragma: no cover - Check construction guards kinds
            raise ValueError(f"unknown check kind {ch.kind!r}")
        flag_cols.append((flag, ch.name))

    failed = F.filter(
        F.array(
            *[
                F.when(~F.col(flag), F.lit(name)).otherwise(F.lit(None))
                for flag, name in flag_cols
            ]
        ),
        lambda x: x.isNotNull(),
    )
    with_failed = flagged.withColumn("failed_checks", failed).drop(
        *[flag for flag, _ in flag_cols]
    )
    if materialize:
        with_failed = with_failed.localCheckpoint(eager=True)
    clean = with_failed.where(F.size("failed_checks") == 0).drop("failed_checks")
    violations = with_failed.where(F.size("failed_checks") > 0)
    summary = (
        violations.select(F.explode("failed_checks").alias("check"))
        .groupBy("check")
        .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
    )
    return ValidationResult(clean=clean, violations=violations, summary=summary)
