"""Multi-batch Structured Streaming semantics: append-mode session
emission under a real advancing watermark, and the CDC merge folding
across genuine micro-batch boundaries.

The complete-mode replays in the registered stream_* queries verify
end-state equality in ONE batch; these tests split the event log into
five chronological files and trigger one file per micro-batch, so the
watermark actually advances between batches and state actually
carries across them -- the production shape.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from rippled_historical_database_spark.operators.sessions import (
    GAP_SECONDS,
    sessionize,
)
from rippled_historical_database_spark.sources.catalog import (
    events_read_schema,
    load_table,
    normalize_events_ts,
)

N_FILES = 5


def _write_chrono(e, d):
    """Split an events DataFrame into N_FILES chronological parquet
    files, written SEQUENTIALLY: the file streaming source orders files
    by modification time, so each slice needs a strictly later mtime
    than the previous one for micro-batches to arrive in event-time
    order."""
    import time as _time

    bounds = e.selectExpr(
        *[
            f"percentile(unix_micros(ts), {k / N_FILES}) AS b{k}"
            for k in range(1, N_FILES)
        ]
    ).collect()[0]
    cuts = [None, *[bounds[f"b{k}"] for k in range(1, N_FILES)], None]
    us = F.unix_micros(F.col("ts"))
    for i in range(N_FILES):
        sl = e
        if cuts[i] is not None:
            sl = sl.filter(us > cuts[i])
        if cuts[i + 1] is not None:
            sl = sl.filter(us <= cuts[i + 1])
        sl.coalesce(1).write.mode("append").parquet(d)
        _time.sleep(1.1)  # distinct whole-second mtimes for source ordering
    assert len(glob.glob(os.path.join(d, "part-*.parquet"))) == N_FILES
    return d


@pytest.fixture(scope="module")
def chrono_dir(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("chrono") / "events")
    return _write_chrono(load_table(spark, sf_dir, "events"), d)


@pytest.fixture(scope="module")
def chrono10x_dir(spark, sf_dir, tmp_path_factory):
    """The SCALE.md section-6 10x generator (id-offset + user-offset
    copies, so each copy is a disjoint user population over the same
    time range), written chronologically -- 10x the users and events
    flow through the same watermark window."""
    d = str(tmp_path_factory.mktemp("chrono10x") / "events")
    e = load_table(spark, sf_dir, "events")
    mx = e.agg(
        F.max("event_id").alias("me"), F.max("user_id").alias("mu")
    ).collect()[0]
    cols = e.columns
    big = None
    for i in range(10):
        c = (
            e.withColumn("event_id", F.col("event_id") + F.lit(i * (mx.me + 1)))
            .withColumn("user_id", F.col("user_id") + F.lit(i * (mx.mu + 1)))
            .select(cols)
        )
        big = c if big is None else big.unionByName(c)
    return _write_chrono(big, d)


def _stream(spark, chrono_dir):
    src = glob.glob(os.path.join(chrono_dir, "part-*.parquet"))[0]
    schema, shim = events_read_schema(src)
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(chrono_dir)
    )
    return normalize_events_ts(raw, shim)


def test_append_mode_sessions_emitted_match_batch(spark, sf_dir, chrono_dir):
    """Append mode with a 2 h watermark over five chronological
    micro-batches: every session the state store CLOSES and emits must
    be byte-identical to the batch sessionization's row for that
    (user, start) -- open sessions near the stream head legitimately
    stay unemitted."""
    agg = (
        _stream(spark, chrono_dir)
        .withWatermark("ts", "2 hours")
        .groupBy("user_id", F.session_window("ts", f"{GAP_SECONDS} seconds").alias("sw"))
        .agg(F.count("*").alias("n_events"))
    )
    name = "append_sessions_out"
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    emitted = {
        (r.user_id, r["sw"].start, r["sw"].end, r.n_events)
        for r in spark.table(name).collect()
    }
    assert emitted, "watermark passage over 30 days must close sessions"

    import datetime as dt

    gap = dt.timedelta(seconds=GAP_SECONDS)
    batch = {
        (r.user_id, r.session_start, r.session_end + gap, r.n_events)
        for r in sessionize(load_table(spark, sf_dir, "events")).collect()
    }
    assert emitted <= batch, emitted - batch
    # and the emission is substantial, not a trivial prefix
    assert len(emitted) >= len(batch) // 2, (len(emitted), len(batch))


def test_cdc_fold_across_real_micro_batches(spark, sf_dir, chrono_dir):
    """foreachBatch CDC merge with five REAL micro-batches (state built
    batch-over-batch) must land on the one-shot batch merge."""
    from cdc_util import make_cdc_apply_batch

    from rippled_historical_database_spark.operators.cdc import (
        changelog,
        merge_changelog,
    )

    base = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"), F.col("c_acctbal").alias("balance")
    )
    one_shot = {
        (r.key, r.balance)
        for r in merge_changelog(base, changelog(spark, sf_dir)).collect()
    }

    state = {"df": base.collect()}
    apply_batch = make_cdc_apply_batch(spark, state)

    q = (
        _stream(spark, chrono_dir)
        .writeStream.outputMode("append")
        .foreachBatch(apply_batch)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert state["batches"] == N_FILES  # genuinely multi-batch
    assert {(r.key, r.balance) for r in state["df"]} == one_shot


def test_stream_static_join_matches_batch(spark, sf_dir, chrono_dir):
    """Stream-static join: the file-streamed events joined to a static
    dimension (per-user cohort) and aggregated must equal the batch
    plan -- the enrichment pattern where a broadcastable dimension is
    joined into every micro-batch without any state store."""
    dim = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .withColumn("cohort", (F.col("user_id") % 3).cast("int"))
    )
    # distinct aggregates are unsupported on streams; count + decimal sum
    agg_cols = [
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("tv"),
    ]

    streamed = (
        _stream(spark, chrono_dir)
        .join(dim, "user_id")
        .groupBy("cohort")
        .agg(*agg_cols)
    )
    name = "stream_static_join_out"
    q = (
        streamed.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.cohort, r.n, round(r.tv, 6)) for r in spark.table(name).collect()
    }
    batch = {
        (r.cohort, r.n, round(r.tv, 6))
        for r in load_table(spark, sf_dir, "events")
        .join(dim, "user_id")
        .groupBy("cohort")
        .agg(*agg_cols)
        .collect()
    }
    assert got == batch and len(got) == 3


def test_append_sessions_match_batch_at_10x_with_eviction(spark, chrono10x_dir):
    """The streamed-equals-batch sessionization law at the 10x volume
    SCALE.md measures: append mode over five chronological micro-batches
    of the 10x corpus, with the state store PROVABLY evicting closed
    sessions (numRowsRemoved > 0 in the progress metrics) -- watermark
    passage under real volume, not just the single-batch replay."""
    import uuid

    agg = (
        _stream(spark, chrono10x_dir)
        .withWatermark("ts", "2 hours")
        .groupBy(
            "user_id",
            F.session_window("ts", f"{GAP_SECONDS} seconds").alias("sw"),
        )
        .agg(F.count("*").alias("n_events"))
    )
    name = f"sessions_10x_{uuid.uuid4().hex[:12]}"
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        evicted = sum(
            op.get("numRowsRemoved", 0)
            for p in q.recentProgress
            for op in p.get("stateOperators", [])
        )
    finally:
        q.stop()
    emitted = {
        (r.user_id, r["sw"].start, r["sw"].end, r.n_events)
        for r in spark.table(name).collect()
    }
    spark.catalog.dropTempView(name)
    assert evicted > 0, "watermark passage must evict closed sessions"
    assert emitted, "closed sessions must be emitted"

    import datetime as dt

    gap = dt.timedelta(seconds=GAP_SECONDS)
    batch = {
        (r.user_id, r.session_start, r.session_end + gap, r.n_events)
        for r in sessionize(spark.read.parquet(chrono10x_dir)).collect()
    }
    assert emitted <= batch, list(emitted - batch)[:3]
    assert len(emitted) >= len(batch) // 2, (len(emitted), len(batch))
