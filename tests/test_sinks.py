"""Write-side behavior: partitioned warehouse writes, idempotent
partition overwrite (the removeLedger replacement), CSV flatten export,
silver-layer materialization."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from rippled_historical_database_spark.sources.catalog import load_table
from rippled_historical_database_spark.sources.sinks import (
    build_silver_tables,
    flatten_for_csv,
    overwrite_partitions,
    write_csv,
    write_partitioned,
)


def test_partition_overwrite_is_idempotent_compensation(spark, sf_dir, tmp_path):
    """Re-ingesting one day replaces exactly that day's rows -- the
    declarative removeLedger (data.js:3133-3217)."""
    out = str(tmp_path / "events_warehouse")
    e = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    write_partitioned(e, out, ["day"])
    total_before = spark.read.parquet(out).count()

    # "Bad ledger" re-ingest: day 2024-01-05 arrives again, corrected --
    # same rows, values doubled.
    day = e.filter(F.col("day") == F.lit("2024-01-05"))
    n_day = day.count()
    assert n_day > 0
    corrected = day.withColumn("value", F.col("value") * 2)
    overwrite_partitions(corrected, out, ["day"])

    after = spark.read.parquet(out)
    assert after.count() == total_before  # no rows lost elsewhere
    v_orig = day.agg(F.sum("value")).collect()[0][0]
    v_new = (
        after.filter(F.col("day") == F.lit("2024-01-05")).agg(F.sum("value")).collect()[0][0]
    )
    assert abs(v_new - 2 * v_orig) < 1e-6


def test_csv_flatten_roundtrip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "csv_out")
    o = load_table(spark, sf_dir, "orders").limit(50).select(
        "o_orderkey",
        F.struct(
            F.col("o_orderstatus").alias("status"), F.col("o_totalprice").alias("total")
        ).alias("order"),
        F.array(F.lit("a"), F.lit("b")).alias("tags"),
    )
    flat = flatten_for_csv(o)
    assert flat.columns == ["o_orderkey", "order.status", "order.total", "tags"]
    write_csv(o, out)
    files = glob.glob(os.path.join(out, "*.csv"))
    assert files
    back = spark.read.option("header", True).csv(out)
    assert back.count() == 50
    assert sorted(back.columns) == sorted(["o_orderkey", "order.status", "order.total", "tags"])


def test_build_silver_layer(spark, sf_dir, tmp_path):
    paths = build_silver_tables(spark, sf_dir, str(tmp_path / "silver"))
    assert set(paths) == {
        "balance_changes", "affected_accounts", "accounts_created", "offers", "escrows",
    }
    for table, path in paths.items():
        df = spark.read.parquet(path)
        assert df.count() > 0, table
        assert "day" in df.columns
        # day-partition pruning works on the materialized table
        one_day = df.select("day").distinct().limit(1).collect()[0][0]
        assert df.filter(F.col("day") == F.lit(one_day)).count() > 0
