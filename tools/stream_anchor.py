"""Streaming throughput anchor (round-5 verdict item #7).

Two measurements, printed as one JSON line for SCALE.md section 6:

1. ``xrpl_ingest``: sustained ledgers/s over a 10x replay of the
   54-fixture corpus (540 distinct ledgers -- copy k offsets
   ledger_index by k*100_000 and close_time by k*3600 s so replayed
   copies are real new work, not dedup no-ops).
2. ``stateful state footprint``: the account-day bucket operator
   (applyInPandasWithState) driven over the 10x events corpus (1M rows)
   on the RocksDB state-store backend; reports events/s plus the
   operator's reported state rows and RocksDB memory/SST bytes from the
   final StreamingQueryProgress.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURES = "/root/reference/test/mock/ledgers"
COPIES = 10
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


def build_replay(out_dir: str) -> int:
    """Write COPIES offset copies of every fixture ledger; returns file
    count.  Offsets applied textually (ledger_index appears as both int
    and string in the fixtures; close_time is seconds)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = sorted(glob.glob(os.path.join(FIXTURES, "*.json")))
    n = 0
    for p in paths:
        with open(p) as f:
            doc = json.load(f)
        base_idx = int(doc["ledger_index"])
        base_ct = int(doc["close_time"])
        for k in range(COPIES):
            doc["ledger_index"] = base_idx + k * 100_000
            doc["close_time"] = base_ct + k * 3600
            # tx hashes must stay unique per copy for honest downstream
            # dedup; APPEND the copy ordinal so two real txs whose hashes
            # differ only in a trailing slice can never collide in a copy.
            for tx in doc.get("transactions", []):
                if "hash" in tx:
                    tx["hash"] = re.sub(r"-\d+$", "", tx["hash"]) + f"-{k}"
            with open(os.path.join(out_dir, f"{base_idx}_{k}.json"), "w") as f:
                json.dump(doc, f)
            n += 1
    return n


def measure_ingest(spark) -> dict:
    from rippled_historical_database_spark.streaming.xrpl_ingest import (
        run_streaming_ingest,
    )

    replay = tempfile.mkdtemp(prefix="ledgers10x_")
    n_ledgers = build_replay(replay)
    gold = tempfile.mkdtemp(prefix="gold10x_")
    t0 = time.time()
    batches = run_streaming_ingest(spark, replay, gold, ledgers_per_trigger=10)
    wall = time.time() - t0
    return {
        "ledgers": n_ledgers,
        "batches": batches,
        "wall_s": round(wall, 1),
        "ledgers_per_s": round(n_ledgers / wall, 2),
    }


def measure_stateful(spark, events_dir: str) -> dict:
    from pyspark.sql import functions as F

    from rippled_historical_database_spark.sources.catalog import (
        events_read_schema,
        normalize_events_ts,
    )
    from rippled_historical_database_spark.streaming.stateful_buckets import (
        account_daily_buckets,
    )

    prior = spark.conf.get(PROVIDER_CONF, None)
    spark.conf.set(PROVIDER_CONF, ROCKSDB_PROVIDER)
    try:
        schema, shim = events_read_schema(events_dir)
        raw = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 8)
            .parquet(events_dir)
        )
        events = normalize_events_ts(raw, shim)
        name = f"anchor_buckets_{os.getpid()}"
        t0 = time.time()
        q = (
            account_daily_buckets(events)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
            wall = time.time() - t0
            progress = q.lastProgress
        finally:
            q.stop()
    finally:
        if prior is None:
            spark.conf.unset(PROVIDER_CONF)
        else:
            spark.conf.set(PROVIDER_CONF, prior)

    op = progress["stateOperators"][0]
    custom = op.get("customMetrics", {})
    n_events = spark.read.parquet(events_dir).count()
    return {
        "events": n_events,
        "wall_s": round(wall, 1),
        "events_per_s": round(n_events / wall),
        "state_rows": op.get("numRowsTotal"),
        "rocksdb_mem_bytes": custom.get("rocksdbTotalMemoryUsageBytes"),
        "rocksdb_sst_bytes": custom.get("rocksdbSstFileSize"),
        "rocksdb_metrics_present": any(k.startswith("rocksdb") for k in custom),
    }


if __name__ == "__main__":
    from rippled_historical_database_spark.session import get_spark

    spark = get_spark("stream-anchor")
    spark.sparkContext.setLogLevel("ERROR")
    from tools.scale10x import ensure_10x

    sf1x = ensure_10x(spark)
    out = {
        "xrpl_ingest_10x": measure_ingest(spark),
        "stateful_buckets_10x_rocksdb": measure_stateful(
            spark, os.path.join(sf1x, "events.parquet")
        ),
    }
    print(json.dumps(out))
