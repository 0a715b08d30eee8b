"""Time-bucketing expressions.

The reference's interval machinery (``lib/utils.js:70-136``) aligns
candle buckets three ways:
  * calendar units (minute/hour/day/month/year) -> ``date_trunc``;
  * ISO-week (7-day aligned to Monday) -> ``date_trunc('week', ...)``;
  * epoch-anchored N-day buckets (days since 2013-01-01 modulo N,
    ``utils.js:99-115``) -> plain column arithmetic, no custom Catalyst
    expression needed (SURVEY.md section 4 conclusion).

All expressions are pure column arithmetic so they stay inside
whole-stage codegen and are usable as partition/cluster keys at scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The reference anchors multi-day buckets at 2013-01-01 (utils.js:99-115).
ANCHOR = "2013-01-01"

# Calendar intervals supported by date_trunc on both Spark and DuckDB.
CALENDAR_UNITS = {"minute", "hour", "day", "week", "month", "quarter", "year"}


def bucket_trunc(col: Column | str, unit: str) -> Column:
    """Calendar-aligned tumbling bucket start (UTC)."""
    c = F.col(col) if isinstance(col, str) else col
    if unit not in CALENDAR_UNITS:
        raise ValueError(f"unsupported calendar unit {unit!r}")
    return F.date_trunc(unit, c)


def anchored_bucket(col: Column | str, n_days: int, anchor: str = ANCHOR) -> Column:
    """Epoch-anchored N-day bucket start (reference utils.js:99-115).

    bucket_start = anchor + floor(datediff(ts, anchor) / N) * N days
    """
    c = F.col(col) if isinstance(col, str) else col
    days = F.floor(F.datediff(c, F.lit(anchor).cast("date")) / n_days) * n_days
    return F.to_timestamp(F.date_add(F.lit(anchor).cast("date"), days.cast("int")))


def sql_anchored_bucket(expr: str, n_days: int, anchor: str = ANCHOR) -> str:
    """DuckDB rendering of :func:`anchored_bucket`."""
    return (
        f"CAST(DATE '{anchor}' + INTERVAL (CAST(FLOOR(DATEDIFF('day', DATE '{anchor}', "
        f"{expr}) / {n_days}) AS INT) * {n_days}) DAY AS TIMESTAMP)"
    )
