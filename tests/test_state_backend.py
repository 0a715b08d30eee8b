"""RocksDB state store backend: the scale path for streaming state.

The default HDFS-backed state store keeps every key on the JVM heap --
fine for the test scale, fatal for a 100 TB entity rollup where state
is millions of (account, day) buckets per executor.  RocksDB (built
into Spark, enabled purely by config) spills state to local SSD with
incremental checkpointing, bounding heap usage regardless of key count.

This test runs the SAME applyInPandasWithState operator on the RocksDB
provider and asserts (a) results are identical to the batch oracle and
(b) the query really ran on RocksDB (its custom metrics appear in the
progress events).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from rippled_historical_database_spark.functions.numeric import dsum
from rippled_historical_database_spark.sources.catalog import TABLES, load_table
from rippled_historical_database_spark.streaming.stateful_buckets import (
    account_daily_buckets,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


def test_rocksdb_state_store_matches_batch(spark, tmp_path):
    src_dir = str(tmp_path / "events_rocksdb")
    os.makedirs(src_dir)
    src = os.path.join(SF_DIR, "events.parquet")
    shutil.copy(src, os.path.join(src_dir, "a.parquet"))
    shutil.copy(src, os.path.join(src_dir, "b.parquet"))  # replay copy

    prior = spark.conf.get(PROVIDER_CONF, None)
    spark.conf.set(PROVIDER_CONF, ROCKSDB_PROVIDER)
    try:
        from rippled_historical_database_spark.sources.catalog import (
            events_read_schema,
            normalize_events_ts,
        )

        schema, shim = events_read_schema(src_dir)
        raw = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        events = normalize_events_ts(raw, shim)
        name = "rocksdb_buckets_out"
        q = (
            account_daily_buckets(events)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
            progress = q.lastProgress
        finally:
            q.stop()
    finally:
        if prior is None:
            spark.conf.unset(PROVIDER_CONF)
        else:
            spark.conf.set(PROVIDER_CONF, prior)

    # (b) the state operator really ran on RocksDB
    custom = progress["stateOperators"][0]["customMetrics"]
    assert any(k.startswith("rocksdb") for k in custom), sorted(custom)

    # (a) final state per key == exactly-once batch aggregation,
    # despite the doubled (replayed) source
    out = spark.table(name)
    final = F.max_by(
        F.struct("n_events", "total_value", "high_value"), "n_events"
    ).alias("s")
    got = {
        (r["account"], r["day"]): r
        for r in out.groupBy("account", "day")
        .agg(final)
        .select("account", "day", "s.n_events", "s.total_value", "s.high_value")
        .collect()
    }
    expected = {
        (r["account"], r["day"]): r
        for r in load_table(spark, SF_DIR, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy(
            F.col("user_id").alias("account"),
            F.date_trunc("day", "ts").alias("day"),
        )
        .agg(
            F.count("*").alias("n_events"),
            dsum("value").alias("total_value"),
            F.max("value").alias("high_value"),
        )
        .collect()
    }
    assert set(got) == set(expected)
    for k, e in expected.items():
        g = got[k]
        assert g["n_events"] == e["n_events"], k
        assert abs(g["total_value"] - e["total_value"]) < 1e-9, k
        assert g["high_value"] == e["high_value"], k
