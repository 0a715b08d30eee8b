"""Data profiling and constraint validation: the quality gates a
pipeline runs before trusting a new batch.

The reference trusts its importer end-to-end (verification is a
separate daemon diffing ledger hashes, ``lib/verifyLedgers.js``-style);
a lake engine profiles every landed partition and fails fast on
constraint violations -- the Deequ / Great-Expectations shape, here as
plain one-pass aggregations.

Scale: both operators are ONE full-scan aggregation with map-side
partials; per-column state is a handful of scalars (the distinct counts
are the only cardinality-bearing term -- swap in the HLL sketch from
operators/sketches.py when the column is unbounded).  Zero joins,
zero windows.

Determinism: counts are integers; means go through the DECIMAL(38,6)
order-independent sum; min/max are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dsum, sql_dsum
from ..plans.registry import register
from ..sources.catalog import load_table


@register(
    "profile_column_stats",
    rotation_group=2,
    oracle=f"""
    SELECT 'value' AS column_name,
           COUNT(*) AS n_rows,
           COUNT(value) AS n_non_null,
           COUNT(DISTINCT value) AS n_distinct,
           MIN(value) AS min_value,
           MAX(value) AS max_value,
           {sql_dsum("value")} / COUNT(value) AS mean_value
    FROM events
    UNION ALL
    SELECT 'user_id',
           COUNT(*), COUNT(user_id), COUNT(DISTINCT user_id),
           CAST(MIN(user_id) AS DOUBLE), CAST(MAX(user_id) AS DOUBLE),
           {sql_dsum("user_id")} / COUNT(user_id)
    FROM events
    ORDER BY column_name
    """,
    doc="Per-column profile of a landed batch (row/non-null/distinct "
        "counts, min/max, decimal-exact mean) -- the summary a pipeline "
        "records per partition to detect drift before training on it.  "
        "One scan per profiled relation, map-side combinable "
        "throughout; COUNT(DISTINCT) is exact here and swaps for the "
        "mergeable HLL register sketch on unbounded columns.",
    tags=("profiling",),
)
def profile_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")

    def profile(col: str, cast_double: bool) -> DataFrame:
        c = F.col(col)
        mn, mx = F.min(c), F.max(c)
        if cast_double:
            mn, mx = mn.cast("double"), mx.cast("double")
        return e.agg(
            F.lit(col).alias("column_name"),
            F.count("*").alias("n_rows"),
            F.count(c).alias("n_non_null"),
            F.countDistinct(c).alias("n_distinct"),
            mn.alias("min_value"),
            mx.alias("max_value"),
            (dsum(c) / F.count(c)).alias("mean_value"),
        )

    return (
        profile("value", False)
        .unionByName(profile("user_id", True))
        .orderBy("column_name")
    )


# Constraint suite over the events batch: each rule counts violations.
CONSTRAINTS = {
    "event_id_not_null": "event_id IS NULL",
    "event_id_unique": None,  # special-cased: duplicates counted via agg
    "ts_in_range": "ts < TIMESTAMP '2020-01-01' OR ts > TIMESTAMP '2030-01-01'",
    "value_non_negative": "value < 0",
    "event_type_in_domain":
        "event_type NOT IN ('purchase','view','click','signup','error')",
}


@register(
    "validate_constraints",
    rotation_group=2,
    oracle="""
    WITH dup AS (
        SELECT CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT) AS d
        FROM events
    )
    SELECT * FROM (
        SELECT 'event_id_not_null' AS rule,
               CAST(COUNT(*) FILTER (WHERE event_id IS NULL) AS BIGINT)
                 AS n_violations
        FROM events
        UNION ALL
        SELECT 'event_id_unique', d FROM dup
        UNION ALL
        SELECT 'ts_in_range',
               CAST(COUNT(*) FILTER (WHERE ts < TIMESTAMP '2020-01-01'
                    OR ts > TIMESTAMP '2030-01-01') AS BIGINT)
        FROM events
        UNION ALL
        SELECT 'value_non_negative',
               CAST(COUNT(*) FILTER (WHERE value < 0) AS BIGINT)
        FROM events
        UNION ALL
        SELECT 'event_type_in_domain',
               CAST(COUNT(*) FILTER (WHERE event_type NOT IN
                    ('purchase','view','click','signup','error'))
                    AS BIGINT)
        FROM events
    ) ORDER BY rule
    """,
    doc="Constraint validation over a landed batch: null / uniqueness / "
        "range / domain rules evaluated as conditional counters in ONE "
        "aggregation pass (the uniqueness rule is count - distinct, "
        "same pass), emitting a (rule, violation count) report -- the "
        "fail-fast gate before a batch is admitted downstream.  Every "
        "counter is map-side combinable; adding a rule adds a column, "
        "not a scan.",
    tags=("profiling", "validation"),
)
def validate_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    counters = [
        F.sum(F.when(F.expr(pred), 1).otherwise(0)).cast("bigint").alias(rule)
        for rule, pred in CONSTRAINTS.items()
        if pred is not None
    ]
    counters.append(
        (F.count("*") - F.countDistinct("event_id")).cast("bigint")
        .alias("event_id_unique")
    )
    wide = e.agg(*counters)
    # unpivot the one-row wide report to (rule, n_violations)
    pairs = ", ".join(f"'{r}', {r}" for r in sorted(CONSTRAINTS))
    return (
        wide.selectExpr(f"stack({len(CONSTRAINTS)}, {pairs}) AS (rule, n_violations)")
        .orderBy("rule")
    )
