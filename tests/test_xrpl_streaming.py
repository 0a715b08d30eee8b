"""Streaming ledger ingest == batch warehouse: the live-importer path
(ledgerStream.js) expressed as Structured Streaming must produce exactly
the batch gold candles, for any micro-batch size, including replays."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from rippled_historical_database_spark.streaming.xrpl_ingest import (
    read_streamed_candles,
    run_streaming_ingest,
)

MOCK_DIR = "/root/reference/test/mock/ledgers"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(MOCK_DIR), reason="reference mock ledgers not present"
)

FINAL_COLS = [
    "base_currency", "base_issuer", "counter_currency", "counter_issuer",
    "start", "open", "high", "low", "close", "base_volume",
    "counter_volume", "buy_volume", "count", "vwap",
]


def _ledger_paths() -> list[str]:
    return sorted(f for f in glob.glob(f"{MOCK_DIR}/*.json") if " - " not in f)


@pytest.fixture(scope="module")
def batch_candles(spark, tmp_path_factory):
    from rippled_historical_database_spark.plans.xrpl_etl import build_warehouse

    out = str(tmp_path_factory.mktemp("wh_stream_ref"))
    build_warehouse(spark, _ledger_paths(), out)
    return spark.read.parquet(os.path.join(out, "gold_candles_1m"))


def _assert_same(streamed, batch):
    s = streamed.select(*FINAL_COLS)
    b = batch.select(*FINAL_COLS)
    assert s.count() == b.count()
    assert s.exceptAll(b).count() == 0 and b.exceptAll(s).count() == 0


def test_streamed_candles_equal_batch(spark, tmp_path, batch_candles):
    src = str(tmp_path / "ledgers")
    os.makedirs(src)
    for p in _ledger_paths():
        shutil.copy(p, src)
    gold = str(tmp_path / "gold")
    n = run_streaming_ingest(spark, src, gold, ledgers_per_trigger=7)
    assert n >= 50 / 7  # really ran multiple micro-batches
    _assert_same(read_streamed_candles(spark, gold), batch_candles)


def test_streamed_candles_batch_size_invariant(spark, tmp_path, batch_candles):
    """1-ledger batches (the reference's one-at-a-time daemon cadence)
    give the same gold as 7-ledger batches: the merge is associative, so
    micro-batch boundaries are invisible."""
    src = str(tmp_path / "ledgers1")
    os.makedirs(src)
    for p in _ledger_paths()[:10]:
        shutil.copy(p, src)
    gold = str(tmp_path / "gold1")
    n = run_streaming_ingest(spark, src, gold, ledgers_per_trigger=1)
    assert n >= 10
    sub = read_streamed_candles(spark, gold)
    # exact reference: the batch parser over the same 10 files
    from rippled_historical_database_spark.operators.xrpl_silver import xrpl_exchanges
    from rippled_historical_database_spark.plans.xrpl_etl import candles_1m
    from rippled_historical_database_spark.sources.xrpl import (
        affected_nodes,
        read_ledgers_bronze,
        transactions_bronze,
    )

    ref = candles_1m(
        xrpl_exchanges(
            affected_nodes(
                transactions_bronze(read_ledgers_bronze(spark, _ledger_paths()[:10]))
            )
        )
    )
    _assert_same(sub, ref)
