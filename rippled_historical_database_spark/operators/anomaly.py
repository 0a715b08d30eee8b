"""Rolling-baseline anomaly detection over metric series.

Reference: the stats daemon stores per-interval type/result counters
(``lib/aggregation/stats.js``) and leaves spike detection to whoever
reads the API; an engine serving ops dashboards needs the rolling
z-score built in.

Shape: aggregate the event log to an (entity, hour) count series first
(one keyed shuffle with map-side partials), then a RANGE-framed window
over the SERIES -- 24 buckets of trailing baseline per row, excluding
the current bucket so an anomalous hour cannot absorb itself into its
own baseline.  The window runs over series rows (hours x types), not
events: its cost is independent of event volume.

Determinism: the baseline keeps exact integer sums (count, sum, sum of
squares) inside the frame; mean/variance/z are then a fixed sequence of
single IEEE ops (divide, multiply-subtract, sqrt -- IEEE sqrt is
correctly rounded, so it is engine-identical), with the emitted z
rounded once at 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.registry import register
from ..sources.catalog import load_table

BASELINE_HOURS = 24   # trailing window, current hour excluded
Z_THRESHOLD = 3.0


@register(
    "window_rolling_zscore",
    rotation_group=2,
    oracle=f"""
    WITH series AS (
        SELECT event_type,
               CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS bucket_start,
               epoch(DATE_TRUNC('hour', ts)) // 3600 AS hour_idx,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2, 3
    ),
    based AS (
        SELECT event_type, bucket_start, n,
               COUNT(n) OVER w AS b_n,
               SUM(n) OVER w AS b_sum,
               SUM(n * n) OVER w AS b_sum2
        FROM series
        WINDOW w AS (PARTITION BY event_type ORDER BY hour_idx
                     RANGE BETWEEN {BASELINE_HOURS} PRECEDING
                           AND 1 PRECEDING)
    )
    SELECT event_type, bucket_start, n,
           CAST(b_n AS BIGINT) AS baseline_hours,
           CASE WHEN b_n >= 2 AND
                     CAST(b_sum2 AS DOUBLE) / b_n
                       - (CAST(b_sum AS DOUBLE) / b_n)
                         * (CAST(b_sum AS DOUBLE) / b_n) > 0
                THEN ROUND(
                    (n - CAST(b_sum AS DOUBLE) / b_n)
                    / SQRT(CAST(b_sum2 AS DOUBLE) / b_n
                           - (CAST(b_sum AS DOUBLE) / b_n)
                             * (CAST(b_sum AS DOUBLE) / b_n)), 6)
                END AS z,
           COALESCE(ABS(CASE WHEN b_n >= 2 AND
                     CAST(b_sum2 AS DOUBLE) / b_n
                       - (CAST(b_sum AS DOUBLE) / b_n)
                         * (CAST(b_sum AS DOUBLE) / b_n) > 0
                THEN ROUND(
                    (n - CAST(b_sum AS DOUBLE) / b_n)
                    / SQRT(CAST(b_sum2 AS DOUBLE) / b_n
                           - (CAST(b_sum AS DOUBLE) / b_n)
                             * (CAST(b_sum AS DOUBLE) / b_n)), 6)
                END) > {Z_THRESHOLD}, FALSE) AS is_anomaly
    FROM based
    ORDER BY event_type, bucket_start
    """,
    doc=f"Rolling z-score anomaly flags over the hourly metric series: "
        f"each (type, hour) count scored against the trailing "
        f"{BASELINE_HOURS}-hour baseline (RANGE frame on the hour index, "
        "current hour excluded so a spike cannot damp its own score; "
        "gaps in the series correctly shrink the baseline because RANGE "
        "frames span index distance, not row count).  The spike-"
        "detection layer the reference's stats counters leave to API "
        "consumers.  The window runs over the aggregated series, so its "
        "cost is hours x types regardless of event volume; baseline "
        "state is three exact integer sums, z is a fixed IEEE op "
        "sequence rounded once.",
    tags=("window", "anomaly"),
)
def window_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    series = e.groupBy(
        "event_type",
        F.date_trunc("hour", "ts").alias("bucket_start"),
        F.expr("unix_seconds(date_trunc('hour', ts)) div 3600").alias("hour_idx"),
    ).agg(F.count("*").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_idx")
        .rangeBetween(-BASELINE_HOURS, -1)
    )
    based = series.select(
        "event_type",
        "bucket_start",
        "n",
        F.count("n").over(w).alias("b_n"),
        F.sum("n").over(w).alias("b_sum"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("b_sum2"),
    )
    mean = F.col("b_sum").cast("double") / F.col("b_n")
    var = F.col("b_sum2").cast("double") / F.col("b_n") - mean * mean
    z = F.when(
        (F.col("b_n") >= 2) & (var > 0),
        F.round((F.col("n") - mean) / F.sqrt(var), 6),
    )
    return (
        based.select(
            "event_type",
            "bucket_start",
            "n",
            F.col("b_n").cast("bigint").alias("baseline_hours"),
            z.alias("z"),
            F.coalesce(F.abs(z) > Z_THRESHOLD, F.lit(False)).alias("is_anomaly"),
        )
        .orderBy("event_type", "bucket_start")
    )


# ---------------------------------------------- seasonal baseline z

@register(
    "profile_seasonal_baseline",
    rotation_group=7,
    oracle="""
    WITH hourly AS (
        SELECT event_type,
               CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ),
    keyed AS (
        SELECT event_type, bucket, cnt,
               CAST(epoch(bucket) AS BIGINT) // 86400 % 7 AS dow,
               CAST(epoch(bucket) AS BIGINT) // 3600 % 24 AS hod
        FROM hourly
    ),
    stats AS (
        SELECT event_type, bucket, cnt, dow, hod,
               CAST(COUNT(*) OVER w AS BIGINT) AS n,
               CAST(SUM(cnt) OVER w AS BIGINT) AS s1,
               CAST(SUM(cnt * cnt) OVER w AS BIGINT) AS s2
        FROM keyed
        WINDOW w AS (PARTITION BY event_type, dow, hod)
    )
    SELECT event_type, bucket, cnt,
           ROUND(CAST(s1 AS DOUBLE) / n, 6) AS seasonal_mean,
           ROUND((cnt - CAST(s1 AS DOUBLE) / n)
                 / SQRT((n * s2 - s1 * s1) / (CAST(n AS DOUBLE) * (n - 1))),
                 6) AS z
    FROM stats
    WHERE n >= 3 AND n * s2 > s1 * s1
    ORDER BY event_type, bucket
    """,
    doc="Seasonal-baseline anomaly score: each hourly event count "
        "against the mean/stddev of its OWN seasonal cell (event_type, "
        "day-of-week, hour-of-day) across all weeks -- the STL-lite "
        "outage/spike detector that complements the trailing "
        "window_rolling_zscore (a level shift that recurs weekly is "
        "normal here and anomalous there).  Day-of-week and hour are "
        "derived arithmetically from the epoch (identical in both "
        "engines -- calendar functions differ in week-start "
        "convention); moments are exact BIGINT window sums over the "
        "grouped hourly relation, one corpus shuffle total; cells with "
        "n < 3 samples or zero variance are excluded in both engines.  "
        "At 100 TB the grouped hourly relation is calendar-bounded "
        "(types x hours) -- the corpus is touched once.",
    tags=("anomaly", "profiling"),
)
def profile_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(F.count("*").cast("bigint").alias("cnt"))
    keyed = hourly.select(
        "event_type",
        "bucket",
        "cnt",
        F.expr("unix_timestamp(bucket) div 86400 % 7").alias("dow"),
        F.expr("unix_timestamp(bucket) div 3600 % 24").alias("hod"),
    )
    w = Window.partitionBy("event_type", "dow", "hod")
    stats = keyed.select(
        "event_type",
        "bucket",
        "cnt",
        F.count("*").over(w).cast("bigint").alias("n"),
        F.sum("cnt").over(w).cast("bigint").alias("s1"),
        F.sum(F.col("cnt") * F.col("cnt")).over(w).cast("bigint").alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    var = (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")) / (
        F.col("n").cast("double") * (F.col("n") - 1)
    )
    return (
        stats.filter(
            (F.col("n") >= 3) & (F.col("n") * F.col("s2") > F.col("s1") * F.col("s1"))
        )
        .select(
            "event_type",
            "bucket",
            "cnt",
            F.round(mean, 6).alias("seasonal_mean"),
            F.round((F.col("cnt") - mean) / F.sqrt(var), 6).alias("z"),
        )
        .orderBy("event_type", "bucket")
    )
