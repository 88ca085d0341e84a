"""Local replica of the driver's DuckDB-oracle comparison.

Mirrors the contract in ``__spark_entry__.py``: run the Spark query
and the oracle SQL on the same parquet tables, then compare row count,
column-name set, and order-insensitive values (columns sorted by
name, rows sorted by normalized tuple; values compared EXACTLY — the
driver's hash has no tolerance, and every declared query is designed
to be bit-identical across engines).
"""

from __future__ import annotations

import os

import duckdb

from etlp_spark.io import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


#: Output-edge type rule (round-1 lesson): the driver's comparator goes
#: through pandas, where Spark DECIMAL arrives as Decimal objects but
#: DuckDB DECIMAL arrives as float64, and DuckDB HUGEINT (sum of
#: BIGINT) arrives as float64 vs Spark's int64 — identical VALUES then
#: hash-mismatch. Python-object comparison can't see this (Decimal('1.5')
#: == 1.5), so we enforce it at the SCHEMA level on both sides.
_BANNED_SPARK_PREFIXES = ("decimal",)
_BANNED_DUCK_TYPES = ("DECIMAL", "HUGEINT", "UHUGEINT")


def _edge_type_problems(spark_df, con, sql: str) -> list[str]:
    problems = []
    for name, dtype in spark_df.dtypes:
        if dtype.startswith(_BANNED_SPARK_PREFIXES):
            problems.append(f"spark output column {name!r} is {dtype} (edge-type rule: cast to double)")
    rel = con.sql(sql)
    for name, t in zip(rel.columns, rel.types):
        ts = str(t)
        if any(b in ts for b in _BANNED_DUCK_TYPES):
            problems.append(f"oracle output column {name!r} is {ts} (edge-type rule: CAST to DOUBLE/BIGINT)")
    return problems


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    problems += _edge_type_problems(spark_df, con, sql)
    sp_rows = [r.asDict() for r in spark_df.collect()]
    du = con.execute(sql)
    du_cols = [d[0] for d in du.description]
    du_rows = [dict(zip(du_cols, row)) for row in du.fetchall()]

    sp_cols = sorted(spark_df.columns)
    if sorted(du_cols) != sp_cols:
        problems.append(f"columns differ: spark={sp_cols} duckdb={sorted(du_cols)}")
        return problems
    if len(sp_rows) != len(du_rows):
        problems.append(f"row count differs: spark={len(sp_rows)} duckdb={len(du_rows)}")

    def keyify(rows):
        return sorted(
            tuple(_norm(r[c]) for c in sp_cols) for r in rows
        ), None

    try:
        sp_sorted, _ = keyify(sp_rows)
        du_sorted, _ = keyify(du_rows)
    except TypeError as e:  # unorderable mixed types
        problems.append(f"sort failed: {e}")
        return problems

    # EXACT comparison — the driver's value hash has no tolerance, so
    # neither does this harness: every declared query is designed to
    # be bit-identical across engines (decimal sums, exact-scale
    # rounding, integer moments). A float tolerance here once masked a
    # real driver-level mismatch (w4 slopes).
    for i, (a, b) in enumerate(zip(sp_sorted, du_sorted)):
        if a != b:
            problems.append(f"row {i} differs: spark={a} duckdb={b}")
            if len(problems) > 5:
                break
    return problems
