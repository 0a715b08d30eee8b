"""Storage primitives: scans, point lookups, filters, pagination.

Reference: the HBase scan layer (``lib/hbase/hbase-thrift/index.js``):
``getScan`` (:459-605) rowkey-range scans, ``getScanWithMarker`` (:412-452)
keyset pagination, ``getRow(s)`` (:825-902) point lookups, ``getAllRows``
(:959-976) full scans, and the server-side filter builders
(``buildSingleColumnValueFilters`` :346-373).

In Spark each becomes a declarative filter/order/limit over typed columns:
Catalyst pushes the range predicate and the column projection into the
parquet scan (verify via ``PushedFilters``/``ReadSchema`` in
``.explain("formatted")``), so the "rowkey prefix scan" costs one
partition-pruned columnar read instead of a RegionServer iterator.  At
100 TB the events table is date-partitioned, making the time-range
predicate a partition-pruning predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.catalog import load_table

# A mid-range window that exists at every scale factor (data spans
# 2024-01-01 .. 2024-01-30 at all SFs).
T0, T1 = "2024-01-05 00:00:00", "2024-01-12 00:00:00"

EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value"]


@register(
    "scan_time_range",
    oracle=f"""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE ts >= TIMESTAMP '{T0}' AND ts < TIMESTAMP '{T1}'
    ORDER BY ts, event_id
    LIMIT 200
    """,
    doc="getScan: ascending rowkey-range scan with projection + limit "
        "(hbase-thrift/index.js:459-605). Range filter is pushed to parquet.",
)
def scan_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(*EVENT_COLS)
        .filter((F.col("ts") >= F.lit(T0)) & (F.col("ts") < F.lit(T1)))
        .orderBy("ts", "event_id")
        .limit(200)
    )


@register(
    "scan_reversed",
    oracle=f"""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE ts < TIMESTAMP '{T1}'
    ORDER BY ts DESC, event_id DESC
    LIMIT 100
    """,
    doc="Reversed scan for newest-first reads (hbase-thrift/index.js:531-550; "
        "inverse-timestamp rowkeys, lib/utils.js:39-42). Catalyst plans "
        "TakeOrderedAndProject -- no full sort.",
)
def scan_reversed(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(*EVENT_COLS)
        .filter(F.col("ts") < F.lit(T1))
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(100)
    )


@register(
    "scan_point_lookup",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE event_id IN (1, 5, 42, 117, 999)
    """,
    doc="getRows: point multi-get by key list with column projection "
        "(hbase-thrift/index.js:825-902; tx fetch data.js:2113-2123).",
)
def scan_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(*EVENT_COLS).filter(F.col("event_id").isin(1, 5, 42, 117, 999))


@register(
    "scan_full_table",
    oracle="SELECT r_regionkey, r_name FROM region",
    doc="getAllRows: full-table scan (hbase-thrift/index.js:959-976).",
)
def scan_full_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "region")


@register(
    "scan_count_only",
    oracle=f"""
    SELECT COUNT(*) AS n
    FROM events
    WHERE ts >= TIMESTAMP '{T0}' AND ts < TIMESTAMP '{T1}'
    """,
    doc="Count-only scan: FirstKeyOnlyFilter+KeyOnlyFilter (data.js:2405) -> "
        "count() over a pruned scan; parquet answers from row-group stats.",
)
def scan_count_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.filter((F.col("ts") >= F.lit(T0)) & (F.col("ts") < F.lit(T1)))
        .agg(F.count("*").alias("n"))
    )


# Keyset-pagination marker: the opaque HBase rowkey marker
# (hbase-thrift/index.js:412-452) becomes the last row's sort-key tuple.
M_TS, M_ID = "2024-01-15 00:00:00", 0


@register(
    "page_after_marker",
    oracle=f"""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE (ts > TIMESTAMP '{M_TS}') OR (ts = TIMESTAMP '{M_TS}' AND event_id > {M_ID})
    ORDER BY ts, event_id
    LIMIT 200
    """,
    doc="getScanWithMarker: keyset pagination -- marker is the (ts, event_id) "
        "sort-key tuple, page = filter(key > marker).orderBy.limit "
        "(hbase-thrift/index.js:412-452). O(page) work regardless of offset.",
)
def page_after_marker(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    after = (F.col("ts") > F.lit(M_TS)) | (
        (F.col("ts") == F.lit(M_TS)) & (F.col("event_id") > F.lit(M_ID))
    )
    return e.select(*EVENT_COLS).filter(after).orderBy("ts", "event_id").limit(200)


@register(
    "filter_conjunction",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    WHERE o_orderstatus = 'O' AND o_orderpriority = '1-URGENT'
      AND o_totalprice > 50000
    ORDER BY o_orderkey
    """,
    doc="buildSingleColumnValueFilters: AND-conjunction of column filters, "
        "skipping absent params (hbase-thrift/index.js:346-373). All "
        "conjuncts reach the parquet scan as PushedFilters.",
)
def filter_conjunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .filter(
            (F.col("o_orderstatus") == "O")
            & (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_totalprice") > 50000)
        )
        .orderBy("o_orderkey")
    )


@register(
    "filter_dust",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events
    WHERE NOT (value < 0.5)
    GROUP BY event_type
    """,
    doc="Client-side dust-trade exclusion (XRP legs below threshold dropped "
        "before reduce: data.js:1609-1620, aggregation/exchanges.js:523-531) "
        "as a declarative pre-aggregation filter.",
)
def filter_dust(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import dsum

    e = load_table(spark, sf_dir, "events")
    return (
        e.filter(~(F.col("value") < 0.5))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
    )


@register(
    "window_latest_row",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    ORDER BY ts DESC, event_id DESC
    LIMIT 1
    """,
    doc="'Latest ledger' resolution: descending scan limit 1 "
        "(data.js:1948-1975) -> orderBy(desc).limit(1).",
)
def window_latest_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(*EVENT_COLS)
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(1)
    )
