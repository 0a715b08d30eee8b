"""Spark-vs-DuckDB comparison harness.

Mirrors the driver's correctness gate: for each registered query, run the
Spark plan and the oracle SQL on the same parquet tables and compare
row count, column names, and order-insensitive values.  Floats are
compared with a tight relative tolerance (the engine's decimal-sum policy
-- functions/numeric.py -- makes most aggregates bit-exact anyway).
"""

from __future__ import annotations

import datetime as dt
import math
from typing import Any

import duckdb

from rippled_historical_database_spark.sources.catalog import TABLES

REL_TOL = 1e-9
ABS_TOL = 1e-9


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    # Spark pins spark.sql.session.timeZone=UTC (session.py); DuckDB's
    # CAST(TIMESTAMPTZ AS TIMESTAMP) converts via the session TimeZone,
    # so the house CAST-to-naive convention in the oracles is only
    # environment-independent if DuckDB is pinned to UTC too.
    con.execute("SET TimeZone='UTC'")
    for name in TABLES:
        path = f"{sf_dir}/{name}.parquet"
        # Spark-written tables are directories of part files; glob them.
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")
    return con


def _norm_cell(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, dt.datetime):
        # Preserve tz-awareness: the driver's gate hashes a tz-aware
        # DuckDB TIMESTAMPTZ differently from Spark's naive TIMESTAMP
        # (round-8 red row golden_open_offers_asof slipped through
        # because this used to strip tzinfo).  An aware value keeps its
        # offset in the isoformat string, so aware != naive here too.
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if hasattr(v, "asDict"):  # pyspark Row (subclasses tuple -- check first)
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.asDict().items()))
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    return v


def _sort_key(row: tuple) -> tuple:
    return tuple((x is None, str(type(x)), str(x)) for x in row)


def _cells_equal(a: Any, b: Any, strict: bool = False) -> bool:
    """strict=True is driver parity: floats must be bit-equal (the
    driver hashes exact values), so a 1-ulp engine difference that the
    tolerant mode would absorb is reported.  Tolerant mode (default)
    stays available for diagnosis only -- the committed sweep runs
    strict (round-11 lesson: 1e-9 tolerance masked a pow-ulp that the
    driver's hash gate flagged)."""
    if isinstance(a, float) and isinstance(b, (int, float)):
        if strict:
            # Both-NaN is agreement, not a mismatch: the driver's hash
            # serializes NaN identically on both sides.  (_norm_cell
            # already maps NaN -> "NaN", so this is belt-and-braces for
            # any float that reaches here unnormalized.)
            if math.isnan(a) and math.isnan(float(b)):
                return True
            return a == float(b)
        return math.isclose(a, float(b), rel_tol=REL_TOL, abs_tol=ABS_TOL)
    if isinstance(b, float) and isinstance(a, (int, float)):
        if strict:
            if math.isnan(float(a)) and math.isnan(b):
                return True
            return float(a) == b
        return math.isclose(float(a), b, rel_tol=REL_TOL, abs_tol=ABS_TOL)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(
            _cells_equal(x, y, strict) for x, y in zip(a, b)
        )
    return a == b


def oracle_tz_columns(
    con: duckdb.DuckDBPyConnection, oracle_sql: str, strict: bool = False
) -> list[str]:
    """Column names whose DuckDB type is TIMESTAMP WITH TIME ZONE.

    The cursor .description collapses TIMESTAMPTZ and TIMESTAMP both to
    'DATETIME', so this plans the query with DESCRIBE (no execution) to
    read the real logical types.  The driver's gate hashes tz-aware
    values differently from Spark's naive timestamps, so any hit here
    is a latent schema/hash mismatch.

    ``strict=True`` (the registry-pinning test path) re-raises DESCRIBE
    failures so an unplannable oracle (trailing semicolon, multi-
    statement script) is flagged instead of silently exempted from the
    tz gate; the soft-fail default is for compare(), where the
    subsequent execution reports the real error anyway.
    """
    try:
        rows = con.execute(f"DESCRIBE ({oracle_sql})").fetchall()
    except duckdb.Error:
        if strict:
            raise
        # DESCRIBE can choke on statements the executor accepts (e.g.
        # PRAGMA-prefixed scripts); fall back to no-finding rather than
        # failing the whole comparison -- execution below surfaces any
        # genuine SQL error.
        return []
    return [r[0] for r in rows if "TIME ZONE" in str(r[1]).upper()]


def compare(
    spark_df,
    con: duckdb.DuckDBPyConnection,
    oracle_sql: str,
    strict: bool = False,
) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass).

    ``strict=True`` compares floats bit-exactly (driver hash parity);
    the default tolerant mode (1e-9) is for diagnosis only.
    """
    errors: list[str] = []

    s_cols = [c.lower() for c in spark_df.columns]
    s_rows = [tuple(_norm_cell(v) for v in row) for row in spark_df.collect()]

    tz_cols = oracle_tz_columns(con, oracle_sql)
    if tz_cols:
        errors.append(
            f"oracle columns are TIMESTAMP WITH TIME ZONE (driver would "
            f"hash-mismatch vs Spark naive timestamps): {tz_cols} -- "
            f"wrap in CAST(... AS TIMESTAMP)"
        )

    res = con.execute(oracle_sql)
    o_cols = [d[0].lower() for d in res.description]
    o_rows = [tuple(_norm_cell(v) for v in row) for row in res.fetchall()]

    if sorted(s_cols) != sorted(o_cols):
        errors.append(f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return errors
    if len(s_rows) != len(o_rows):
        errors.append(f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}")

    # Align column order by name, then compare order-insensitively.
    s_idx = [s_cols.index(c) for c in sorted(s_cols)]
    o_idx = [o_cols.index(c) for c in sorted(o_cols)]
    s_sorted = sorted((tuple(r[i] for i in s_idx) for r in s_rows), key=_sort_key)
    o_sorted = sorted((tuple(r[i] for i in o_idx) for r in o_rows), key=_sort_key)

    n_bad = 0
    for i, (sr, orow) in enumerate(zip(s_sorted, o_sorted)):
        if not _cells_equal(sr, orow, strict):
            n_bad += 1
            if n_bad <= 3:
                errors.append(f"row {i}: spark={sr!r} oracle={orow!r}")
    if n_bad > 3:
        errors.append(f"... {n_bad} mismatched rows total")
    return errors
