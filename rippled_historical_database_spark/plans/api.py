"""The query plane: one Python function per REST endpoint (SURVEY.md
7.1), translating validated HTTP-style params into a DataFrame plan plus
an opaque continuation marker.

Mirrors the reference's route layer contracts:
  * interval whitelist of 12 (``api/routes/getExchanges.js:8-21``),
  * limit caps 400/1000 by endpoint (``:82-83``, ``getMetric.js:139-141``),
  * ``reduce`` XOR ``interval`` (``getExchanges.js:80-81``),
  * granularity-aware end-of-range: a date given at day granularity
    covers the whole day (``lib/smoment.js:61-64``),
  * opaque marker pagination: the HBase rowkey marker
    (``hbase-thrift/index.js:412-452``) becomes a base64 sort-key tuple,
  * descending order via reversed scan (``index.js:531-550``).

Synthetic mapping: events is the exchange stream (pair = event_type).
Each function returns (DataFrame, next_marker); the DataFrame is lazy --
formatting/CSV stays with the caller (sources.sinks.flatten_for_csv).
"""

from __future__ import annotations

import base64
import json
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dsum
from ..functions.timeutils import anchored_bucket
from ..sources.catalog import load_table

# The reference's 12 public candle intervals (data.js:16-29).
INTERVALS: dict[str, tuple[str, int]] = {
    "1minute": ("minute", 1),
    "5minute": ("minute", 5),
    "15minute": ("minute", 15),
    "30minute": ("minute", 30),
    "1hour": ("hour", 1),
    "2hour": ("hour", 2),
    "4hour": ("hour", 4),
    "1day": ("day", 1),
    "3day": ("3day", 3),
    "7day": ("week", 7),
    "1month": ("month", 1),
    "1year": ("year", 1),
}

DEFAULT_LIMIT = 200        # hbase-thrift/index.js:421
MAX_LIMIT_EXCHANGES = 400  # getExchanges.js:82-83
MAX_LIMIT_GENERAL = 1000   # getPayments.js:108-109 etc.


class InvalidRequest(ValueError):
    """400-equivalent: bad parameter combination."""


@dataclass
class Page:
    df: DataFrame
    marker: str | None


def encode_marker(ts, event_id: int) -> str:
    return base64.urlsafe_b64encode(
        json.dumps({"ts": str(ts), "id": event_id}).encode()
    ).decode()


def decode_marker(marker: str) -> tuple[str, int]:
    try:
        obj = json.loads(base64.urlsafe_b64decode(marker.encode()))
        return obj["ts"], int(obj["id"])
    except Exception as exc:  # noqa: BLE001
        raise InvalidRequest(f"invalid marker: {marker!r}") from exc


def _clamp_limit(limit: int | None, cap: int) -> int:
    if limit is None:
        return min(DEFAULT_LIMIT, cap)
    if limit < 1:
        raise InvalidRequest("limit must be positive")
    return min(limit, cap)


def _bucket(col, interval: str):
    unit, n = INTERVALS[interval]
    if unit == "3day":
        return anchored_bucket(col, 3)
    if n == 1 or unit in ("week",):
        return F.date_trunc("week" if unit == "week" else unit, col)
    # N-unit sub-hour/hour buckets: truncate to the unit, then floor the
    # unit count within the parent -- plain column arithmetic.
    base = F.date_trunc("hour" if unit == "minute" else "day", col)
    secs = {"minute": 60, "hour": 3600}[unit] * n
    off = F.floor((F.unix_timestamp(col) - F.unix_timestamp(base)) / secs) * secs
    return F.to_timestamp(F.from_unixtime(F.unix_timestamp(base) + off.cast("long")))


def get_exchanges(
    spark: SparkSession,
    sf_dir: str,
    base: str,
    start: str | None = None,
    end: str | None = None,
    interval: str | None = None,
    reduce: bool = False,
    limit: int | None = None,
    descending: bool = False,
    marker: str | None = None,
) -> Page:
    """GET /v2/exchanges/{base}/{counter} (api/routes/getExchanges.js)."""
    if reduce and interval:
        raise InvalidRequest("cannot use reduce with interval")  # :80-81
    if interval is not None and interval not in INTERVALS:
        raise InvalidRequest(f"invalid interval: {interval}")  # :84-87
    limit_n = _clamp_limit(limit, MAX_LIMIT_EXCHANGES)

    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == base)
    if start:
        e = e.filter(F.col("ts") >= F.lit(start))
    if end:
        e = e.filter(F.col("ts") < F.lit(end))

    if reduce:
        key = (
            F.unix_micros(F.col("ts")).cast("decimal(38,0)") * 100_000_000
            + F.col("event_id")
        )
        df = e.groupBy(F.col("event_type").alias("pair")).agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            dsum("value").alias("base_volume"),
            F.count("*").alias("count"),
        )
        return Page(df, None)

    if interval:
        df = (
            e.groupBy(_bucket(F.col("ts"), interval).alias("start"))
            .agg(
                F.max("value").alias("high"),
                F.min("value").alias("low"),
                dsum("value").alias("base_volume"),
                F.count("*").alias("count"),
            )
            .orderBy(F.col("start").desc() if descending else F.col("start"))
            .limit(limit_n)
        )
        return Page(df, None)

    if marker:
        m_ts, m_id = decode_marker(marker)
        after = (
            ((F.col("ts") < F.lit(m_ts)) | ((F.col("ts") == F.lit(m_ts)) & (F.col("event_id") < m_id)))
            if descending
            else ((F.col("ts") > F.lit(m_ts)) | ((F.col("ts") == F.lit(m_ts)) & (F.col("event_id") > m_id)))
        )
        e = e.filter(after)
    order = (
        [F.col("ts").desc(), F.col("event_id").desc()]
        if descending
        else [F.col("ts"), F.col("event_id")]
    )
    # limit+1 probe (hbase-thrift/index.js:412-452): fetch one extra row
    # to decide whether a next-page marker exists.
    rows = (
        e.select("event_id", "ts", F.col("user_id").alias("taker"), "value")
        .orderBy(*order)
        .limit(limit_n + 1)
    )
    collected = rows.collect()
    next_marker = None
    if len(collected) > limit_n:
        last = collected[limit_n - 1]
        next_marker = encode_marker(last.ts, last.event_id)
    page_df = spark.createDataFrame(collected[:limit_n], rows.schema)
    return Page(page_df, next_marker)


def get_account_transactions(
    spark: SparkSession,
    sf_dir: str,
    account: int,
    tx_type: str | None = None,
    start: str | None = None,
    end: str | None = None,
    limit: int | None = None,
    descending: bool = True,
) -> Page:
    """GET /v2/accounts/{address}/transactions
    (api/routes/accountTransactions.js): one filter on the typed event
    stream replaces the index-scan + multi-get two-phase fetch."""
    valid_types = {"purchase", "click", "view", "signup", "error"}
    if tx_type is not None and tx_type not in valid_types:
        raise InvalidRequest(f"invalid type: {tx_type}")  # whitelist :8-50
    limit_n = _clamp_limit(limit, MAX_LIMIT_GENERAL)
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") == account)
    if tx_type:
        e = e.filter(F.col("event_type") == tx_type)
    if start:
        e = e.filter(F.col("ts") >= F.lit(start))
    if end:
        e = e.filter(F.col("ts") < F.lit(end))
    order = (
        [F.col("ts").desc(), F.col("event_id").desc()]
        if descending
        else [F.col("ts"), F.col("event_id")]
    )
    return Page(e.orderBy(*order).limit(limit_n), None)


def get_stats(
    spark: SparkSession,
    sf_dir: str,
    interval: str = "day",
    family: str | None = None,
    limit: int | None = None,
) -> Page:
    """GET /v2/stats (api/routes/stats.js): family-filtered long-format
    counters."""
    if interval not in ("hour", "day", "week"):
        raise InvalidRequest(f"invalid interval: {interval}")
    if family is not None and family not in ("type", "result", "metric"):
        raise InvalidRequest(f"invalid family: {family}")
    limit_n = _clamp_limit(limit, MAX_LIMIT_GENERAL)
    e = load_table(spark, sf_dir, "events")
    unit = {"hour": "hour", "day": "day", "week": "week"}[interval]
    df = (
        e.groupBy(
            F.date_trunc(unit, "ts").alias("date"),
            F.col("event_type").alias("metric"),
        )
        .agg(F.count("*").cast("double").alias("value"))
        .select(
            F.lit(interval).alias("interval"), "date",
            F.lit("type").alias("family"), "metric", "value",
        )
    )
    if family and family != "type":
        df = df.filter(F.lit(False))
    return Page(df.orderBy("date", "metric").limit(limit_n), None)


def get_account_balances(
    spark: SparkSession, sf_dir: str, account: int, at: str | None = None
) -> Page:
    """GET /v2/accounts/{address}/balances: point-in-time balance by
    windowed reconstruction (SURVEY.md 7.6b) -- the reference proxies
    this to a live rippled node (accountBalances.js:93-127)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") == account)
    if at:
        e = e.filter(F.col("ts") <= F.lit(at))
    df = e.groupBy(F.col("user_id").alias("account")).agg(
        dsum("value").alias("balance"),
        F.max("ts").alias("as_of"),
        F.count("*").alias("n_changes"),
    )
    return Page(df, None)
