"""Sinks: partitioned parquet (the warehouse), idempotent partition
overwrite (re-ingest/compensation), CSV export.

Reference write side (SURVEY.md 2.1):
  * ``putRows`` -- 100-row mutateRows chunks over Thrift
    (``lib/hbase/hbase-thrift/index.js:616-672``) -> ``df.write`` with
    task-level parallelism; chunking disappears.
  * ``removeLedger`` -- re-parse a saved ledger and delete every derived
    row, a hand-built compensating transaction (``data.js:3133-3217``)
    -> unnecessary: partitioning derived tables by ingest unit (ledger
    date) makes re-ingest an idempotent dynamic partition overwrite.
  * HDFS sink for Impala (``lib/hdfs.js:84-193``) -- one file per ledger
    of flattened columns -> ``df.write.parquet`` IS the warehouse.
  * CSV endpoint output (``lib/utils.js:142-168``) -> flatten +
    ``df.write.csv``.

Scale: partition by a low-cardinality time unit (day), never by ledger
(millions of tiny partitions kill the file index); within a partition
let AQE coalesce output files toward the 128 MB -- 1 GB sweet spot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Initial/backfill load of a date-partitioned table."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def overwrite_partitions(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Idempotent re-ingest: replace exactly the partitions present in
    ``df`` (dynamic partition overwrite), leaving all others untouched.
    This is the engine's ``removeLedger``: re-running an ingest unit
    compensates any previous bad write with no delete bookkeeping."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def _flatten_schema(schema: T.StructType, prefix: str = "") -> list[F.Column]:
    cols: list[F.Column] = []
    for field in schema.fields:
        name = f"{prefix}{field.name}"
        if isinstance(field.dataType, T.StructType):
            cols.extend(_flatten_schema(field.dataType, prefix=f"{name}."))
        else:
            cols.append(F.col(name).alias(name))
    return cols


def flatten_for_csv(df: DataFrame) -> DataFrame:
    """Nested struct columns -> dot-path leaf columns (the reference's
    flattenJSON, lib/utils.js:142-168); arrays/maps are JSON-encoded
    strings, matching the reference's stringify behavior."""
    out = df.select(*_flatten_schema(df.schema))
    for field in out.schema.fields:
        if isinstance(field.dataType, (T.ArrayType, T.MapType)):
            out = out.withColumn(field.name, F.to_json(F.col(field.name)))
    return out


def write_csv(df: DataFrame, path: str) -> None:
    """format=csv endpoint output (api/server.js:58)."""
    flatten_for_csv(df).write.mode("overwrite").option("header", True).csv(path)


def build_silver_tables(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> dict[str, str]:
    """Materialize the silver layer (SURVEY.md 7.1): run each parser over
    the bronze stream and write day-partitioned parquet.  Returns
    table -> path.  This is the batch ETL the reference's ledgerStream +
    parser + putRows pipeline becomes."""
    from ..plans.registry import all_queries

    queries = all_queries()
    silver = {
        "balance_changes": "parse_balance_mirror",
        "affected_accounts": "parse_affected_accounts",
        "accounts_created": "parse_accounts_created",
        "offers": "parse_offers_lifecycle",
        "escrows": "parse_escrows",
    }
    paths: dict[str, str] = {}
    for table, qname in silver.items():
        df = queries[qname].spark(spark, sf_dir)
        # Partition by ingest day when the table carries event time;
        # key-hash buckets otherwise (affected_accounts is time-free).
        if "ts" in df.columns or "executed_time" in df.columns:
            time_col = "ts" if "ts" in df.columns else "executed_time"
            with_day = df.withColumn("day", F.to_date(time_col))
        else:
            with_day = df.withColumn("day", F.pmod(F.col("event_id"), F.lit(16)))
        path = f"{out_dir}/{table}"
        write_partitioned(with_day, path, ["day"])
        paths[table] = path
    return paths
