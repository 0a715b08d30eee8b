"""Skew-resistant aggregation: salted two-stage rollup.

At 100 TB a handful of hot keys (the XRP side of every pair, a viral
account) can dominate one reducer.  AQE's skew-join handling covers
joins; for aggregations the classic fix is salting: shard each key into
``n_salts`` sub-keys, partially aggregate per shard, then re-aggregate
per key.  Decimal accumulation keeps the two-stage result bit-identical
to the single-stage plan, so salting is a pure physical rewrite --
verified against the unsalted oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_rollup(
    df: DataFrame,
    keys: list[str],
    value: Column | str,
    n_salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """SUM/COUNT of ``value`` per ``keys`` via a salted two-stage plan.

    ``salt_source``: a high-cardinality column to derive the shard from
    (defaults to the value column); using a data column keeps the salt
    deterministic, so retries/re-runs land rows in the same shard.
    """
    v = F.col(value) if isinstance(value, str) else value
    salt = F.pmod(F.xxhash64(F.col(salt_source or keys[0]), *(
        [F.col(c) for c in [value]] if isinstance(value, str) else []
    )), F.lit(n_salts))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            F.sum(v.cast("decimal(38,6)")).alias("__psum"),
            F.count("*").alias("__pcnt"),
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("__psum").cast("double").alias("total"),
        F.sum("__pcnt").alias("count"),
    )
