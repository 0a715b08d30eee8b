"""OHLC candle aggregation -- the reference's flagship analytics.

Reference: the exchanges aggregation daemon reduces raw trades to
1-minute candles -- open/close picked by the (time, ledger, tx, node)
sort key, high/low of rate, summed volumes, vwap = sum(counter)/sum(base)
(``lib/aggregation/exchanges.js:515-582``) -- then hierarchically rolls
minutes into 12 coarser intervals (``exchanges.js:12-25, 282-359``) with
epoch-anchored multi-day alignment (``lib/utils.js:70-136, 99-115``).
The on-the-fly variant re-reduces raw rows at query time
(``lib/hbase/hbase-thrift/data.js:1590-1655``).

Synthetic-table mapping (events == trade stream): ``event_type`` is the
currency pair, ``ts/event_id`` the sort key, ``value`` the base amount;
the counter leg is derived per-row as ``value * (1 + user_id/100)``
(deterministic double arithmetic, identical in any engine), so
``rate = counter/base`` and vwap semantics carry over exactly.

Spark shape: one ``groupBy(pair, date_trunc(interval))`` per level --
a single shuffle keyed on (pair, bucket); open/close are ``min_by`` /
``max_by`` with a struct sort key, so no per-group sort or window pass
is needed.  Coarser intervals re-reduce the 1-hour gold table
(associativity verified against the raw-data oracle), which at 100 TB
means each rollup reads candle rows, not the trade log.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dsum, sql_dsum
from ..functions.timeutils import anchored_bucket, sql_anchored_bucket
from ..plans.registry import register
from ..sources.catalog import load_table

# Dust filter: the reference drops XRP legs below 0.0005 before candling
# (data.js:1609-1620, aggregation/exchanges.js:523-531).
DUST = 0.0005

# Per-row derived columns (pure double arithmetic -- engine-independent).
SQL_COUNTER = "value * (1 + user_id / 100.0)"


def _with_legs(e: DataFrame) -> DataFrame:
    return (
        e.filter(~(F.col("value") < DUST))
        .withColumn("counter_value", F.col("value") * (1 + F.col("user_id") / 100.0))
    )


def _sort_key() -> Column:
    # (executed_time, ledger_index, tx_index, node_index) analog:
    # event_id is globally unique -> deterministic open/close tie-break.
    # Packed into one DECIMAL(38,0) scalar (micros * 1e8 + event_id,
    # lexicographically equal to ordering by (ts, event_id)): a struct
    # ordering key forces SortAggregate, a fixed-width scalar keeps the
    # aggregation hash-based -- O(n) instead of a per-partition sort,
    # which is the difference that matters at 100 TB.
    return (
        F.unix_micros(F.col("ts")).cast("decimal(38,0)") * 100_000_000
        + F.col("event_id")
    )


def _candle_aggs(final: bool) -> list[Column]:
    """The OHLC aggregate set over rows with base/counter legs.

    ``final=False`` keeps volumes in DECIMAL for exact re-reduction at the
    next rollup level; ``final=True`` casts to DOUBLE for output.
    """
    key = _sort_key()
    vol = F.sum(F.col("value").cast("decimal(38,6)"))
    cvol = F.sum(F.col("counter_value").cast("decimal(38,6)"))
    aggs = [
        F.min_by("value", key).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", key).alias("close"),
        (vol.cast("double") if final else vol).alias("base_volume"),
        (cvol.cast("double") if final else cvol).alias("counter_volume"),
        F.count("*").alias("n_trades"),
        F.min("ts").alias("open_time"),
        F.max("ts").alias("close_time"),
    ]
    if final:
        aggs.append((cvol.cast("double") / vol.cast("double")).alias("vwap"))
    else:
        aggs.append(F.min(key).alias("open_key"))
        aggs.append(F.max(key).alias("close_key"))
    return aggs


def hourly_candles(e: DataFrame, final: bool = True) -> DataFrame:
    return (
        _with_legs(e)
        .groupBy(
            F.col("event_type").alias("pair"),
            F.date_trunc("hour", "ts").alias("bucket_start"),
        )
        .agg(*_candle_aggs(final))
    )


def _sql_candle_select(unit_expr: str) -> str:
    """Oracle rendering of one candle level computed from raw events."""
    return f"""
    SELECT event_type AS pair,
           {unit_expr} AS bucket_start,
           FIRST(value ORDER BY ts, event_id) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           LAST(value ORDER BY ts, event_id) AS close,
           {sql_dsum("value")} AS base_volume,
           {sql_dsum(SQL_COUNTER)} AS counter_volume,
           COUNT(*) AS n_trades,
           MIN(ts) AS open_time,
           MAX(ts) AS close_time,
           {sql_dsum(SQL_COUNTER)} / {sql_dsum("value")} AS vwap
    FROM events
    WHERE NOT (value < {DUST})
    GROUP BY 1, 2
    """


@register(
    "agg_candles_hourly",
    oracle=_sql_candle_select("DATE_TRUNC('hour', ts)"),
    doc="1-unit candle build: aggregation/exchanges.js:515-582 as a single "
        "groupBy(pair, date_trunc) with min_by/max_by open/close.",
    bench=True,
    tags=("aggregation", "flagship"),
)
def agg_candles_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hourly_candles(load_table(spark, sf_dir, "events"), final=True)


@register(
    "agg_candles_daily_rollup",
    # DuckDB DATE_TRUNC('day') yields DATE; cast for a TIMESTAMP schema.
    oracle=_sql_candle_select("CAST(DATE_TRUNC('day', ts) AS TIMESTAMP)"),
    doc="Hierarchical re-reduce minute->...->day (exchanges.js:282-359): the "
        "daily candle is computed FROM the hourly gold table (decimal-exact "
        "volumes), while the oracle aggregates the raw rows -- verifying the "
        "re-reduce associativity invariant (FIXTURES.md section 5.2).",
    bench=True,
    tags=("aggregation", "rollup"),
)
def agg_candles_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = hourly_candles(load_table(spark, sf_dir, "events"), final=False)
    vol = F.sum("base_volume")
    cvol = F.sum("counter_volume")
    return (
        hourly.groupBy("pair", F.date_trunc("day", "bucket_start").alias("bucket_start"))
        .agg(
            F.min_by("open", "open_key").alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", "close_key").alias("close"),
            vol.cast("double").alias("base_volume"),
            cvol.cast("double").alias("counter_volume"),
            F.sum("n_trades").alias("n_trades"),
            F.min("open_time").alias("open_time"),
            F.max("close_time").alias("close_time"),
            (cvol.cast("double") / vol.cast("double")).alias("vwap"),
        )
    )


@register(
    "agg_candles_3day_anchored",
    oracle=_sql_candle_select(sql_anchored_bucket("ts", 3)),
    doc="Epoch-anchored 3-day buckets (utils.js:99-115): days since "
        "2013-01-01 modulo 3 as plain column arithmetic -- no custom "
        "Catalyst expression needed (SURVEY.md section 4).",
    tags=("aggregation", "time"),
)
def agg_candles_3day_anchored(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        _with_legs(e)
        .groupBy(
            F.col("event_type").alias("pair"),
            anchored_bucket("ts", 3).alias("bucket_start"),
        )
        .agg(*_candle_aggs(final=True))
    )


@register(
    "agg_candles_reduce_range",
    oracle=f"""
    SELECT event_type AS pair,
           FIRST(value ORDER BY ts, event_id) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           LAST(value ORDER BY ts, event_id) AS close,
           {sql_dsum("value")} AS base_volume,
           {sql_dsum(SQL_COUNTER)} AS counter_volume,
           COUNT(*) AS n_trades
    FROM events
    WHERE NOT (value < {DUST})
      AND ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-12 00:00:00'
    GROUP BY 1
    """,
    doc="On-the-fly reduce=true: one candle per pair over an arbitrary "
        "query range (data.js:1590-1655). The reference caps this at 10000 "
        "scanned rows ('too many rows', data.js:1716-1722); distributed "
        "aggregation removes the cap.",
    tags=("aggregation",),
)
def agg_candles_reduce_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    key = _sort_key()
    in_range = (F.col("ts") >= F.lit("2024-01-05 00:00:00")) & (
        F.col("ts") < F.lit("2024-01-12 00:00:00")
    )
    return (
        _with_legs(e.filter(in_range))
        .groupBy(F.col("event_type").alias("pair"))
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            dsum("value").alias("base_volume"),
            dsum("counter_value").alias("counter_volume"),
            F.count("*").alias("n_trades"),
        )
    )


@register(
    "agg_candles_grouping_sets",
    oracle=f"""
    WITH legs AS (
        SELECT event_type AS pair, ts, event_id, value,
               {SQL_COUNTER} AS counter_value,
               DATE_TRUNC('hour', ts) AS h,
               CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS d,
               CAST(DATE_TRUNC('week', ts) AS TIMESTAMP) AS w
        FROM events WHERE NOT (value < {DUST})
    )
    SELECT pair,
           CASE WHEN GROUPING(h) = 0 THEN 'hour'
                WHEN GROUPING(d) = 0 THEN 'day'
                ELSE 'week' END AS interval,
           COALESCE(h, d, w) AS bucket_start,
           FIRST(value ORDER BY ts, event_id) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           LAST(value ORDER BY ts, event_id) AS close,
           {sql_dsum("value")} AS base_volume,
           {sql_dsum("counter_value")} AS counter_volume,
           COUNT(*) AS n_trades,
           {sql_dsum("counter_value")} / {sql_dsum("value")} AS vwap
    FROM legs
    GROUP BY GROUPING SETS ((pair, h), (pair, d), (pair, w))
    ORDER BY interval, pair, bucket_start
    """,
    doc="One-pass multi-interval candle build via GROUPING SETS: hour, "
        "day, and week candles from a SINGLE scan + Expand + one hash "
        "aggregate/shuffle, where the reference runs one re-reduce pass "
        "per interval (exchanges.js:282-359, 12 intervals). At 100 TB "
        "the trade log is read once instead of once per level; total "
        "shuffle bytes are the same as the per-level sum, but job "
        "scheduling, scan, and decode costs collapse 12x. Output carries "
        "an explicit `interval` column, matching the reference's "
        "agg_exchanges rowkey (interval|pair|time).",
    bench=True,
    tags=("aggregation", "rollup", "grouping-sets"),
)
def agg_candles_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _with_legs(load_table(spark, sf_dir, "events"))
    legs = e.select(
        F.col("event_type").alias("pair"),
        "ts", "event_id", "value", "counter_value",
        F.date_trunc("hour", "ts").alias("h"),
        F.date_trunc("day", "ts").alias("d"),
        F.date_trunc("week", "ts").alias("w"),
    )
    key = _sort_key()
    vol = F.sum(F.col("value").cast("decimal(38,6)"))
    cvol = F.sum(F.col("counter_value").cast("decimal(38,6)"))
    interval = (
        F.when(F.grouping("h") == 0, "hour")
        .when(F.grouping("d") == 0, "day")
        .otherwise("week")
    )
    return (
        legs.groupingSets(
            [["pair", "h"], ["pair", "d"], ["pair", "w"]],
            "pair", "h", "d", "w",
        )
        .agg(
            interval.alias("interval"),
            F.coalesce("h", "d", "w").alias("bucket_start"),
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            vol.cast("double").alias("base_volume"),
            cvol.cast("double").alias("counter_volume"),
            F.count("*").alias("n_trades"),
            (cvol.cast("double") / vol.cast("double")).alias("vwap"),
        )
        .select(
            "pair", "interval", "bucket_start", "open", "high", "low", "close",
            "base_volume", "counter_volume", "n_trades", "vwap",
        )
        .orderBy("interval", "pair", "bucket_start")
    )
