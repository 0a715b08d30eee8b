"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's query registry
(``rippled_historical_database_spark/plans/registry.py``): every operator
from SURVEY.md section 2 registers a (spark callable, duckdb oracle SQL)
pair there; this module just re-exports them in the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rippled_historical_database_spark.plans.registry import all_queries

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: hourly OHLC candles over the event stream
    (the reference's exchange-candle aggregation,
    lib/aggregation/exchanges.js:515-582)."""
    q = all_queries()["agg_candles_hourly"]
    return q.spark(spark, _SMOKE_SF_DIR)


def _rotated(names: list[str], repo_dir: str | None = None) -> list[str]:
    """Order queries least-driver-checked first.

    The driver's correctness gate truncates at the first 50 entries, so a
    fixed order would leave the same ~73 queries unchecked forever.  Count
    how many prior CORRECTNESS_r*.json rounds record each query as GREEN
    and emit the least-evidenced first (registry order -- structural
    (rotation_group, name) -- as tiebreak): never-checked first, then
    previously-red, then repeatedly-green.

    Red-aware refinement (round 6): a query whose MOST RECENT driver row
    is red sorts ahead of healthy queries tied on green count (sort key
    ``green_count - 0.5 * latest_row_is_red``), so a stale red row gets
    re-confirmed instead of repeatedly losing the registration-order
    tiebreak (the r04/r05 failure mode the round-5 verdict flagged).

    Age-aware refinement (round 7): ties on the adjusted green count break
    by the round of the query's newest driver row (oldest evidence first),
    so rotation debt -- queries whose latest confirmation is >=3 rounds
    old, tracked in COVERAGE.md's freshness table -- drains steadily
    instead of depending on registration order.

    ``repo_dir`` overrides where CORRECTNESS files are read from (tests
    inject a temp dir; the driver always uses the repo root).
    """
    import glob
    import json
    import re

    repo = repo_dir or os.path.dirname(os.path.abspath(__file__))
    counts = {n: 0 for n in names}
    latest_red = {n: False for n in names}
    latest_round = {n: 0 for n in names}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as f:
                seen = json.load(f)
        except (OSError, ValueError):
            continue
        for n, row in seen.items():
            if n not in counts or not isinstance(row, dict):
                continue
            # green requires a positive rows_match, no negative flag, and
            # no recorded error -- an errored round (all flags None, err
            # set) must NOT count as green evidence.
            green = (
                row.get("rows_match") is True
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
                and not row.get("err")
            )
            if green:
                counts[n] += 1
            # files iterate in round order, so the last assignment for a
            # query reflects its newest driver row.
            latest_red[n] = not green
            latest_round[n] = max(latest_round[n], rnd)
    order = {n: i for i, n in enumerate(names)}
    return sorted(
        names,
        key=lambda n: (
            counts[n] - 0.5 * latest_red[n],
            latest_round[n],
            order[n],
        ),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs = all_queries()
    return {name: qs[name].spark for name in _rotated(list(qs))}


def oracle_sql() -> dict[str, str]:
    qs = all_queries()
    return {
        name: qs[name].oracle
        for name in _rotated(list(qs))
        if qs[name].oracle is not None
    }
