"""Change-data-capture apply: merge a changelog into a base snapshot
(the lakehouse MERGE INTO / upsert shape).

Reference: the importer's ``removeLedger`` + re-save cycle
(``lib/hbase/hbase-thrift/index.js`` deleteRow + putRows) IS a
hand-rolled changelog apply -- every re-imported ledger is a
delete-then-upsert against the stored snapshot.  Spark expresses the
whole reconciliation declaratively: latest-op-per-key over the
changelog, one full-outer join against the base, row-level CASE for
insert/update/delete resolution.

Scale design (100 TB): the latest-per-key window and the merge join
share the SAME key, so the changelog side is shuffled ONCE --
HashPartitioning(key) from the window satisfies the join requirement
(plan-asserted: exactly two hash exchanges total, one per side).  At
production scale the base side is bucketed by key on disk, which
removes its exchange too.  Delete handling is a filter, not a second
pass.

Determinism: changelog ordering is (ts, event_id) descending -- the
same total order in both engines -- and the op classification is a
pure CASE over event_type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.registry import register
from ..sources.catalog import load_table

# Spread changelog keys across [0, 20 * max_user): beyond the customer
# key range they exercise the INSERT branch, inside it the UPDATE/DELETE
# branches -- all three MERGE arms fire at every SF.
KEY_STRIDE = 20

OP_CASE = (
    "CASE WHEN event_type = 'signup' THEN 'I' "
    "WHEN event_type = 'error' THEN 'D' ELSE 'U' END"
)


@register(
    "cdc_merge_latest",
    rotation_group=2,
    oracle=f"""
    WITH ch AS (
        SELECT user_id * {KEY_STRIDE} AS key, ts, event_id, value,
               {OP_CASE} AS op
        FROM events
    ),
    latest AS (
        SELECT key, value, op,
               ROW_NUMBER() OVER (PARTITION BY key
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM ch
    ),
    l1 AS (SELECT key, value, op FROM latest WHERE rn = 1),
    base AS (SELECT c_custkey AS key, c_acctbal AS balance FROM customer)
    SELECT COALESCE(b.key, l.key) AS key,
           CASE WHEN l.op IN ('I', 'U') THEN l.value
                ELSE b.balance END AS balance,
           CASE WHEN l.op IS NULL THEN 'unchanged'
                WHEN b.key IS NULL THEN 'inserted'
                ELSE 'updated' END AS change_type
    FROM base b FULL OUTER JOIN l1 l ON b.key = l.key
    WHERE l.op IS NULL OR l.op <> 'D'
    ORDER BY key
    """,
    doc="CDC changelog apply (MERGE INTO semantics): latest op per key "
        "wins (I/U upsert the new value, D drops the row, absent keys "
        "pass the base through).  The declarative form of the "
        "reference's removeLedger-then-putRows reconciliation "
        "(hbase-thrift index.js) -- one window + one full-outer join "
        "replaces the daemon's per-row read-modify-write.  The "
        "changelog's latest-per-key window and the merge join share "
        "the key, so the changelog shuffles once (plan-asserted).",
    tags=("cdc", "joins"),
)
def cdc_merge_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ch = changelog(spark, sf_dir)
    base = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"), F.col("c_acctbal").alias("balance")
    )
    return merge_changelog(base, ch).orderBy("key")


def changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthetic changelog relation (key, ts, event_id, value, op)."""
    return load_table(spark, sf_dir, "events").select(
        (F.col("user_id") * KEY_STRIDE).alias("key"),
        "ts",
        "event_id",
        "value",
        F.expr(OP_CASE).alias("op"),
    )


def merge_changelog(base: DataFrame, ch: DataFrame) -> DataFrame:
    """MERGE a changelog into a (key, balance) base snapshot; returns
    (key, balance, change_type).  Reusable for incremental application
    (foreachBatch-style): feeding the output's (key, balance) back as
    the next base folds batches associatively -- fold(chunks) ==
    one-shot(all), the law tests/test_invariants.py asserts."""
    w = Window.partitionBy("key").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    l1 = (
        ch.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("key").alias("c_key"), "value", "op")
    )
    b = base.select(F.col("key").alias("b_key"), "balance")
    merged = b.join(l1, b.b_key == l1.c_key, "full_outer")
    return merged.filter(F.col("op").isNull() | (F.col("op") != "D")).select(
        F.coalesce(F.col("b_key"), F.col("c_key")).alias("key"),
        F.when(F.col("op").isin("I", "U"), F.col("value"))
        .otherwise(F.col("balance"))
        .alias("balance"),
        F.when(F.col("op").isNull(), F.lit("unchanged"))
        .when(F.col("b_key").isNull(), F.lit("inserted"))
        .otherwise(F.lit("updated"))
        .alias("change_type"),
    )
