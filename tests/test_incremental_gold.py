"""Incremental candle maintenance: multi-batch streaming partials merged
on read must equal the one-shot batch aggregation (the declarative
replacement for the exchanges daemon's cache+forceUpdate machinery)."""

from __future__ import annotations

from rippled_historical_database_spark.plans.registry import all_queries
from rippled_historical_database_spark.sources.catalog import load_table
from rippled_historical_database_spark.streaming.incremental_gold import (
    read_candles,
    run_incremental,
)


def test_incremental_equals_batch(spark, sf_dir, tmp_path):
    # Split the events table into many files so the stream runs real
    # multi-batch (3 files per trigger).
    events_dir = str(tmp_path / "events_split")
    gold_dir = str(tmp_path / "gold_partials")
    e = load_table(spark, sf_dir, "events")
    e.repartition(9).write.mode("overwrite").parquet(events_dir)

    n_batches = run_incremental(spark, events_dir, gold_dir, files_per_trigger=3)
    assert n_batches >= 3, f"expected multi-batch run, got {n_batches}"

    final = read_candles(spark, gold_dir)
    batch = all_queries()["agg_candles_hourly"].spark(spark, sf_dir)
    cols = sorted(batch.columns)
    a = sorted(map(tuple, final.select(*cols).collect()))
    b = sorted(map(tuple, batch.select(*cols).collect()))
    assert a == b
