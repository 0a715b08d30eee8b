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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
