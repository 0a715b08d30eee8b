"""applyInPandasWithState bucket operator: replay dedup semantics.

The reference's accountPayments daemon checks tx_hash before adding a
payment to its daily bucket (accountPayments.js:155-163) precisely
because its upstream can redeliver.  This test feeds every event TWICE
(two copies of the source file, separate micro-batches) and asserts the
stateful result still equals the exactly-once batch aggregation.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from rippled_historical_database_spark.functions.numeric import dsum
from rippled_historical_database_spark.sources.catalog import load_table
from rippled_historical_database_spark.streaming.stateful_buckets import (
    run_buckets_stream,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_stateful_buckets_dedup_replayed_events(spark, tmp_path):
    src_dir = str(tmp_path / "events_replayed")
    os.makedirs(src_dir)
    # Two identical copies: an at-least-once source delivering every
    # event twice, in two different micro-batches.
    src = os.path.join(SF_DIR, "events.parquet")
    shutil.copy(src, os.path.join(src_dir, "copy_a.parquet"))
    shutil.copy(src, os.path.join(src_dir, "copy_b.parquet"))

    got = run_buckets_stream(
        spark, src_dir, "stateful_dedup_test_out", files_per_trigger=1
    ).collect()

    expected = (
        load_table(spark, SF_DIR, "events")
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
    )

    key = lambda r: (r["account"], r["day"])  # noqa: E731
    got_map = {key(r): r for r in got}
    exp_map = {key(r): r for r in expected}
    assert set(got_map) == set(exp_map)
    for k, e in exp_map.items():
        g = got_map[k]
        assert g["n_events"] == e["n_events"], k
        assert abs(g["total_value"] - e["total_value"]) < 1e-9, k
        assert g["high_value"] == e["high_value"], k
