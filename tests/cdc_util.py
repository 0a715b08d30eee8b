"""Shared foreachBatch CDC helper for the stream-vs-batch equivalence
tests: projects a micro-batch of raw events into the changelog shape
(exactly operators/cdc.changelog's projection) and merges it into the
held state.  One definition, used by test_invariants.py and
test_streaming_sessions.py, so a change to the changelog projection
cannot silently leave a stale copy in one of them."""

from __future__ import annotations

from pyspark.sql import functions as F

from rippled_historical_database_spark.operators.cdc import (
    KEY_STRIDE,
    OP_CASE,
    merge_changelog,
)


def make_cdc_apply_batch(spark, state: dict):
    """Returns a foreachBatch callback folding each micro-batch into
    ``state['df']`` (a list of (key, balance) Rows) and counting batches
    in ``state['batches']``."""
    state.setdefault("batches", 0)

    def apply_batch(batch_df, _batch_id):
        ch = batch_df.select(
            (F.col("user_id") * KEY_STRIDE).alias("key"),
            "ts",
            "event_id",
            "value",
            F.expr(OP_CASE).alias("op"),
        )
        cur = spark.createDataFrame(state["df"], "key long, balance double")
        state["df"] = merge_changelog(cur, ch).select("key", "balance").collect()
        state["batches"] += 1

    return apply_batch
