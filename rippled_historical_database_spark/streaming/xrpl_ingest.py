"""Live ledger ingest as Structured Streaming over real XRPL JSON.

Reference: the importer tails a rippled websocket, queues closed
ledgers, and pushes each one through the parser into every table
(``lib/ledgerStream.js:30-113``); the aggregation daemons then
read-modify-write the ``agg_*`` tables (SURVEY.md section 2.9).

Spark shape: a file/Kafka stream of ledger JSON documents ->
``parse_json`` (VARIANT) -> the SAME silver parser functions the batch
warehouse uses -> ``foreachBatch`` appends; candles append as mergeable
PARTIALS re-reduced at read (streaming/incremental_gold.py pattern), so
replayed or out-of-order batches cannot corrupt the gold table -- the
exactly-once + associativity story that replaces the daemons'
forceUpdate heal.

Semantics are defined ONCE (operators/xrpl_silver.py); this module only
changes the execution mode, which is the whole point of the Spark-first
design: batch backfill and live tail are the same code.

Scale: each micro-batch is a handful of ledgers (one narrow parse, one
tiny (pair, minute) partial aggregate); the silver append is
shuffle-free, so ingest throughput scales with executors and is bounded
by the source, not the engine.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.xrpl_silver import xrpl_exchanges
from ..plans.xrpl_etl import _PAIR_COLS, _sort_key, candles_1m
from ..sources.xrpl import RIPPLE_EPOCH, vstr


def _parse_batch(batch_df: DataFrame) -> DataFrame:
    """text rows (one whole ledger document each) -> exchanges silver,
    via the exact batch parser."""
    v = batch_df.select(F.parse_json(F.col("value")).alias("v"))
    close_time = vstr("v", "$.close_time").cast("long") + F.lit(RIPPLE_EPOCH)
    ledgers = v.select(
        vstr("v", "$.ledger_index").cast("long").alias("ledger_index"),
        F.timestamp_seconds(close_time).alias("close_time"),
        F.col("v"),
    )
    txs = ledgers.select(
        "ledger_index",
        F.col("close_time").alias("executed_time"),
        F.posexplode(
            F.try_variant_get("v", "$.transactions", "array<variant>")
        ).alias("_pos", "tx"),
    ).select(
        "ledger_index", "executed_time",
        vstr("tx", "$.metaData.TransactionIndex").cast("int").alias("tx_index"),
        vstr("tx", "$.hash").alias("tx_hash"),
        vstr("tx", "$.TransactionType").alias("tx_type"),
        vstr("tx", "$.Account").alias("account"),
        vstr("tx", "$.metaData.TransactionResult").alias("result"),
        F.col("tx"),
    )
    from ..sources.xrpl import affected_nodes as _nodes_of

    # affected_nodes expects the bronze tx frame shape; fee_drops is not
    # needed by the exchange parser, so provide a null column.
    nodes = _nodes_of(txs.withColumn("fee_drops", F.lit(None).cast("decimal(38,18)")))
    return xrpl_exchanges(nodes)


def run_streaming_ingest(
    spark: SparkSession,
    ledger_dir: str,
    gold_dir: str,
    ledgers_per_trigger: int = 10,
) -> int:
    """Tail a directory of ledger JSON files to completion, appending
    per-batch PARTIAL candles; returns batches processed.  In production
    the source is Kafka and the sink a transactional table -- the lambda
    below is unchanged."""
    # binaryFile: one row per ledger DOCUMENT.  (The streaming text
    # source ignores the wholetext option and splits lines, which would
    # shred the JSON.)
    raw = (
        spark.readStream.format("binaryFile")
        .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
        .option("maxFilesPerTrigger", ledgers_per_trigger)
        .load(ledger_dir)
        .select(F.decode("content", "UTF-8").alias("value"))
    )
    n = {"batches": 0}

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        n["batches"] += 1
        ex = _parse_batch(batch_df)
        (
            candles_1m(ex)
            .withColumn("epoch", F.lit(epoch_id))
            .write.mode("append")
            .parquet(gold_dir)
        )

    q = raw.writeStream.foreachBatch(sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return n["batches"]


def read_streamed_candles(spark: SparkSession, gold_dir: str) -> DataFrame:
    """Serving view: merge the streamed partials into final 1m candles
    (associative re-reduce, same expressions as reduce_candles)."""
    p = spark.read.parquet(gold_dir).drop("epoch")
    vol = F.sum(F.col("base_volume").cast("decimal(38,18)"))
    cvol = F.sum(F.col("counter_volume").cast("decimal(38,18)"))
    return p.groupBy(*_PAIR_COLS, "start").agg(
        F.min_by("open", "open_key").alias("open"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max_by("close", "close_key").alias("close"),
        vol.cast("double").alias("base_volume"),
        cvol.cast("double").alias("counter_volume"),
        F.sum(F.col("buy_volume").cast("decimal(38,18)")).cast("double").alias("buy_volume"),
        F.sum("count").alias("count"),
        (cvol.cast("double") / vol.cast("double")).alias("vwap"),
        F.min("open_key").alias("open_key"),
        F.max("close_key").alias("close_key"),
    )
