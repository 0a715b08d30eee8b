"""Measure the real-data warehouse ETL at replayed x30/x100 scale.

Round-10 verdict item #1: build_warehouse (plans/xrpl_etl.py) was only
ever exercised at the 54-ledger fixture, so SCALE.md's sizing model and
the "fixed per-table overhead amortizes at real batch sizes" claim for
the r10 ledgers/s dip were asserted, not measured.  This tool replays
the fixture corpus xN with DISTINCT synthetic identity -- replica i
shifts ledger_index by i*1_000_000, close_time by i days (so date
partitions spread), and rewrites every 64-hex identifier (tx hashes,
ledger hashes, node indexes, PreviousTxnID, channels, BookDirectories)
by splicing the replica number into the first 8 hex chars, which keeps
every intra-ledger reference consistent while making replicas disjoint
(BookDirectory's quality bits live in the LAST 16 chars, untouched) --
then runs the full build and records ledgers/s plus per-stage wall.

Equality laws on the replayed corpus: every per-event silver/gold table
must hold EXACTLY N x its base-corpus row count (replicas are disjoint
by construction, and the parsers are per-tx local), and the decimal fee
total must scale exactly N x.  A violation means the ETL invented or
lost rows under scale -- a correctness bug, not a perf number.

Usage:
    python tools/etl_replay.py            # N = 1, 30, 100
    python tools/etl_replay.py 1 10       # custom replication factors

Prints one JSON line per N; paste the table into SCALE.md section 1.
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MOCK_DIR = "/root/reference/test/mock/ledgers"
HEX64 = re.compile(r"^[0-9A-F]{64}$")

# Tables whose row count must scale exactly N x (per-event derivations;
# affected_accounts is distinct over (tx_hash, account) and tx hashes
# are replica-remapped, so it is N x too).
NX_TABLES = [
    "bronze_ledgers",
    "silver_transactions",
    "silver_exchanges",
    "silver_balance_changes",
    "silver_accounts_created",
    "silver_offers",
    "silver_memos",
    "silver_tx_client",
    "silver_ledger_fees",
    "silver_escrows",
    "silver_payment_channels",
    "silver_payments",
    "silver_affected_accounts",
    "gold_candles_1m",
    "gold_stats_hourly",
    "gold_balance_snapshots",
    "gold_open_offers",
]


def _remap(obj, tag: str):
    """Splice ``tag`` (8 hex chars) into every 64-hex string; recurse."""
    if isinstance(obj, dict):
        return {k: _remap(v, tag) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_remap(v, tag) for v in obj]
    if isinstance(obj, str) and HEX64.match(obj):
        return tag + obj[8:]
    return obj


def build_corpus(n: int, out_dir: str) -> list[str]:
    # ALL fixture ledgers, incl. the four " - "-suffixed ones (escrow,
    # paychan, accounts_created) -- same corpus as the golden warehouse
    # (operators/golden.py:65), so every parser family sees rows.
    base = [
        json.load(open(f))
        for f in sorted(glob.glob(os.path.join(MOCK_DIR, "*.json")))
    ]
    paths = []
    for i in range(n):
        for doc in base:
            if i == 0:
                d = doc
            else:
                d = _remap(doc, f"{i:08X}")
                # ledger_index is a string in some fixture docs
                d["ledger_index"] = int(doc["ledger_index"]) + i * 1_000_000
                # 10-year step: the base corpus spans ~5 years of close
                # dates, so a 1-day step would collide different base
                # dates across replicas and break the exact N x law on
                # date/hour-keyed gold buckets (measured: 296 vs 30x10
                # stats_hourly rows at a 1-day step).  Disjoint windows
                # make EVERY table exactly N x.
                d["close_time"] = int(doc["close_time"]) + i * 3650 * 86_400
            p = os.path.join(out_dir, f"{d['ledger_index']}.json")
            with open(p, "w") as fh:
                json.dump(d, fh)
            paths.append(p)
    return paths


def run(spark, n: int, base_counts: dict | None) -> tuple[dict, dict]:
    from decimal import Decimal

    from rippled_historical_database_spark.plans.xrpl_etl import (
        build_warehouse,
    )

    corpus_dir = tempfile.mkdtemp(prefix=f"etl_replay_in_{n}x_")
    wh_dir = tempfile.mkdtemp(prefix=f"etl_replay_wh_{n}x_")
    try:
        paths = build_corpus(n, corpus_dir)
        timings: dict = {}
        t0 = time.perf_counter()
        tables = build_warehouse(spark, paths, wh_dir, timings=timings)
        wall = time.perf_counter() - t0

        counts = {t: spark.read.parquet(p).count() for t, p in tables.items()}
        fees = spark.read.parquet(tables["silver_transactions"]).select(
            "fee_drops"
        )
        fee_total = Decimal(
            str(
                fees.groupBy()
                .sum("fee_drops")
                .collect()[0][0]
            )
        )

        # XRP conservation on the replayed corpus (the r8 law, re-run
        # at scale): per tx, the net XRP balance change equals -fee.
        from pyspark.sql import functions as F

        # Escrow/paychan txs move XRP between AccountRoots and Escrow/
        # PayChannel LEDGER OBJECTS, so their AccountRoot net is NOT
        # -fee; the law scopes to the tx types where conservation is
        # exact, same as tests/test_xrpl_golden.py's base-corpus form.
        bc = spark.read.parquet(tables["silver_balance_changes"])
        txf = (
            spark.read.parquet(tables["silver_transactions"])
            .filter(
                ~F.col("tx_type").startswith("Escrow")
                & ~F.col("tx_type").startswith("PaymentChannel")
            )
            .select(
                "tx_hash",
                (-F.col("fee_drops") / 1_000_000)
                .cast("decimal(38,6)")
                .alias("neg_fee"),
            )
        )
        nonconserving = (
            bc.filter(F.col("currency") == "XRP")
            .groupBy("tx_hash")
            .agg(F.sum(F.col("change").cast("decimal(38,6)")).alias("net"))
            .join(txf, "tx_hash")
            .filter(F.abs(F.col("net") - F.col("neg_fee")) > 1e-6)
            .count()
        )

        laws_ok = nonconserving == 0
        violations = (
            [f"xrp conservation: {nonconserving} txs"] if nonconserving else []
        )
        if base_counts is not None:
            for t in NX_TABLES:
                want = n * base_counts["counts"][t]
                if counts.get(t) != want:
                    laws_ok = False
                    violations.append(
                        f"{t}: {counts.get(t)} != {n}x{base_counts['counts'][t]}"
                    )
            if fee_total != n * Decimal(base_counts["fee_total"]):
                laws_ok = False
                violations.append(
                    f"fee_total {fee_total} != {n}x{base_counts['fee_total']}"
                )
        result = {
            "replication": n,
            "ledgers": len(paths),
            "wall_sec": round(wall, 2),
            "ledgers_per_sec": round(len(paths) / wall, 2),
            "stage_wall": {
                k: v for k, v in timings.items() if k.startswith("_")
            },
            "table_wall": {
                k: v for k, v in timings.items() if not k.startswith("_")
            },
            "laws_ok": laws_ok,
            "violations": violations,
        }
        baseline = {"counts": counts, "fee_total": str(fee_total)}
        return result, baseline
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)
        shutil.rmtree(wh_dir, ignore_errors=True)


def main(argv: list[str]) -> int:
    ns = [int(a) for a in argv] or [1, 30, 100]
    if ns[0] != 1:
        ns = [1] + ns  # the base corpus anchors the N x laws
    from rippled_historical_database_spark.session import get_spark

    spark = get_spark("etl-replay")
    spark.sparkContext.setLogLevel("ERROR")
    base = None
    rc = 0
    for n in ns:
        result, counts = run(spark, n, base)
        if n == 1:
            base = counts
        if not result["laws_ok"]:
            rc = 1
        print(json.dumps(result))
    return rc


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
