"""Deterministic numeric aggregation helpers.

The reference does all money math in arbitrary-precision decimal
(``bignumber.js``; e.g. ``lib/ledgerParser/balanceChanges.js:114-167``)
precisely because float accumulation is order-dependent.  Spark's
floating-point SUM is likewise non-associative: partial aggregation
order varies run to run and differs from any single-threaded oracle.

Policy (applies engine-wide):
  * per-row arithmetic stays in DOUBLE -- a single IEEE op is exact and
    identical across engines;
  * cross-row accumulation (SUM/AVG) goes through DECIMAL(38, s) --
    decimal addition is associative, so the result is independent of
    partition count and task order, on 32 local threads or 1000
    executors;
  * the final value is cast back to DOUBLE for a stable output schema.

The same construction is used verbatim in the DuckDB oracle SQL
(``CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)``), making the
comparison exact instead of epsilon-based.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_SCALE = 6


def dsum(col: Column | str, scale: int = DEFAULT_SCALE) -> Column:
    """Order-independent SUM of a double expression."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(38,{scale})")).cast("double")


def davg(col: Column | str, scale: int = DEFAULT_SCALE) -> Column:
    """Order-independent AVG: exact decimal sum, one double division."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(38,{scale})")).cast("double") / F.count(c)


def sql_dsum(expr: str, scale: int = DEFAULT_SCALE) -> str:
    """The oracle-side rendering of :func:`dsum` (ANSI SQL, DuckDB-ready)."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = DEFAULT_SCALE) -> str:
    return f"{sql_dsum(expr, scale)} / COUNT({expr})"
