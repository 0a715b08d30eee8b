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


def test_stateful_buckets_timeout_purge(spark, tmp_path):
    """ProcessingTimeTimeout eviction: an idle (account, day) bucket is
    sealed (emitted once with purged=True) and its state removed, so a
    later event for the same key starts a FRESH bucket.

    Mirrors the reference's hourly cache purge
    (lib/aggregation/exchanges.js:59-101) at a 1.5 s cadence.

    Harness note: with processing-time timeouts armed the engine keeps
    scheduling (empty) micro-batches to evaluate timers, so
    ``processAllAvailable()`` never settles -- the test polls the memory
    sink for each expected row instead.
    """
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from rippled_historical_database_spark.sources.catalog import TABLES
    from rippled_historical_database_spark.streaming.stateful_buckets import (
        account_daily_buckets_with_purge,
    )

    src_dir = str(tmp_path / "events_purge")
    os.makedirs(src_dir)
    DAY_NS = 946_684_800 * 10**6  # 2000-01-01 in micros (timestamp[us])

    def write_file(name, rows):
        table = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows], pa.string()),
            }
        )
        pq.write_table(table, os.path.join(src_dir, name))

    def flags():
        return [
            (r["purged"], r["n_events"], r["total_value"])
            for r in spark.table(name).collect()
            if r["account"] == 1
        ]

    def wait_for(row, deadline_s=90):
        end = time.time() + deadline_s
        while time.time() < end:
            if row in flags():
                return
            time.sleep(0.5)
        raise AssertionError(f"{row} never appeared; sink has {flags()}")

    events = (
        spark.readStream.schema(TABLES["events"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    name = "stateful_purge_test_out"
    q = (
        account_daily_buckets_with_purge(events, timeout_ms=1500)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        write_file("a.parquet", [(1, DAY_NS, 1, "purchase", 10.0, "{}"),
                                 (2, DAY_NS, 1, "purchase", 5.0, "{}")])
        wait_for((False, 2, 15.0))  # live bucket
        wait_for((True, 2, 15.0))  # sealed + evicted once the timer fires
        # Same key, NEW event id: if state had survived the bucket would
        # continue at n_events=3; after eviction it restarts at 1.
        write_file("c.parquet", [(3, DAY_NS, 1, "purchase", 7.0, "{}")])
        wait_for((False, 1, 7.0))
        assert (False, 3, 22.0) not in flags()  # state really was removed
    finally:
        q.stop()


def test_out_row_fast_path_matches_iat(spark):
    """r15: the output-row constructor writes scalars through the
    template copy's per-column ndarray views (probed at import); the
    fast path must produce a frame identical -- values AND dtypes --
    to the public-API iat path it replaced."""
    import pandas as pd

    from rippled_historical_database_spark.streaming import (
        stateful_buckets as sb,
    )

    cols = {
        "account": 42,
        "day": pd.Timestamp("2030-06-15"),
        "n_events": 7,
        "total_value": 123.456789,
        "high_value": 99.25,
    }
    sb._OUT_TMPL.pop("probe", None)
    first = sb._out_row("probe", cols)   # builds the template
    fast = sb._out_row("probe", cols)    # exercises the fast path
    # reference: force the iat fallback on a fresh copy
    ref = sb._OUT_TMPL["probe"].copy()
    for j, v in enumerate(cols.values()):
        ref.iat[0, j] = v
    assert fast.equals(ref) and list(fast.dtypes) == list(ref.dtypes)
    assert first.equals(ref)
    # template must stay isolated from returned rows
    fast2 = sb._out_row("probe", dict(cols, account=7))
    assert fast["account"].iloc[0] == 42 and fast2["account"].iloc[0] == 7
