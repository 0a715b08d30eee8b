"""100x classification of the heaviest registry queries (r13 verdict #3).

Extends the 10x classification (tools/classify10x.py) two decades up:
builds /tmp/sf100x (the scale10x clone machinery with copies=100 --
10M events, 500k documents with 100-way near-dup groups) and runs the
top-20 heaviest CLASSIFY10X_r13 queries plus the verdict's named set
against it.  Per query it records:

  * the Spark wall (the 100x scale evidence -- a Spark hang IS a bug),
  * the result row count (pair-emitting dedup queries legitimately
    grow superlinearly here: a 100-copy near-dup group emits C(100,2)
    pairs vs C(10,2) at 10x, output-driven, not plan-driven),
  * the oracle verdict: full strict hash compare when the result is
    small enough to collect twice (<= ROWCAP rows), else a COUNT-only
    compare (the 10x artifact already carries the full hash), with the
    DuckDB side interrupt-bounded at TIMEOUT_S (an oracle timeout is
    an oracle limitation, recorded as such),
  * the wall ratio vs the CLASSIFY10X_r13 spark wall (growth note:
    ~10x is linear; output-superlinear rows say why when not).

Writes /tmp/classify100x_results.json; the round snapshots it as
CLASSIFY100X_r{N}.json and SCALE.md cites it.

Usage:
    python tools/classify100x.py              # the default target set
    python tools/classify100x.py name1 name2  # just those
    python tools/classify100x.py --resume     # skip finished rows
"""

from __future__ import annotations

import json
import os
import re
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RESULTS = "/tmp/classify100x_results.json"
OUT_DIR = "/tmp/sf100x"
TIMEOUT_S = 300
ROWCAP = 500_000

# top-20 total-wall CLASSIFY10X_r13 rows  +  the verdict-named set,
# CHEAPEST FIRST so an interrupted sweep still leaves a usable
# artifact; the two stateful streaming twins run LAST (their memory
# sink + slice-feed persist need the big-heap env below).
# Run with SPARK_GRAFT_DRIVER_MEM=48g: at 100x the single-JVM harness
# holds the 10M-row slice-feed persist and the drain in ONE heap that
# a real cluster spreads across executors -- with the default 8g the
# dollar-bars twin GC-thrashes (old gen 99.95%, 84 full GCs measured)
# instead of failing loudly.
TARGETS = [
    "sketch_bloom_prefilter", "graph_hits", "parse_delivered_amount",
    "sample_split_by_cluster", "parse_props_classifier",
    "multimodal_vad_segments", "pipeline_near_dup_curation",
    "pipeline_curated_corpus", "text_kneser_ney_bigram",
    "parse_balance_mirror", "parse_offers_lifecycle",
    "layout_hilbert_key", "dedup_connected_components",
    "dedup_sn_multikey_pairs", "dedup_minhash_calibration",
    "dedup_winnow_pairs", "dedup_minhash_lsh_pairs",
    "pipeline_quality_keeper", "dedup_containment_pairs",
    "pipeline_split_leakage", "dedup_ngram_jaccard",
    "stream_stateful_account_buckets", "agg_dollar_bars",
    "stream_dollar_bars",
]


def _walls_10x() -> dict[str, float]:
    path = os.path.join(REPO, "CLASSIFY10X_r13.json")
    try:
        with open(path) as f:
            rows = json.load(f)
    except OSError:
        return {}
    out = {}
    for k, v in rows.items():
        m = re.search(r"spark ([\d.]+)s", v)
        if m:
            out[k] = float(m.group(1))
    return out


def main(argv: list[str]) -> None:
    resume = "--resume" in argv
    names = [a for a in argv if not a.startswith("--")]
    os.environ["SPARK_GRAFT_ORACLE_VERIFY"] = "1"
    from rippled_historical_database_spark.plans.registry import all_queries
    from rippled_historical_database_spark.session import get_spark
    from tests.oracle import compare, duckdb_connection
    from tools.scale10x import ensure_10x

    spark = get_spark("classify100x")
    spark.sparkContext.setLogLevel("ERROR")
    sf = ensure_10x(spark, out=OUT_DIR, copies=100)
    qs = all_queries()
    walls10 = _walls_10x()
    results: dict[str, dict] = {}
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            results = json.load(f)
    targets = names or TARGETS
    if resume:
        # a row with a measured spark wall and a non-error verdict is
        # final: OK rows and ORACLE_TIMEOUT rows (the Spark side -- the
        # scale evidence -- was measured; rerunning only burns another
        # full oracle timeout) both skip.
        def _done(r: dict) -> bool:
            s = r.get("status", "")
            return "spark_s" in r and (
                s.startswith("OK") or s.startswith("ORACLE_TIMEOUT")
            )

        targets = [n for n in targets if not _done(results.get(n, {}))]
    for n in targets:
        q = qs[n]
        row: dict = {}
        t0 = time.time()
        try:
            live = q.spark(spark, sf)
            # wall via the noop sink: count() on a pure-projection
            # query collapses to parquet metadata (Catalyst prunes the
            # whole plan) and under-measures by 100x; the noop write
            # executes every operator and discards rows.
            live.write.mode("overwrite").format("noop").save()
            spark_s = time.time() - t0
            n_rows = live.count()
            row["spark_s"] = round(spark_s, 1)
            row["rows"] = n_rows
            w10 = walls10.get(n)
            if w10:
                row["vs_10x_spark"] = round(spark_s / w10, 1)
            # Snapshot the Spark result BEFORE the oracle timer starts
            # (same fix as classify10x: a slow Spark re-collect must
            # not eat the oracle budget and misfile as ORACLE_TIMEOUT).
            snap = None
            if n_rows <= ROWCAP:
                snap = spark.createDataFrame(live.collect(), live.schema)
                row["spark_s"] = round(time.time() - t0, 1)
            con = duckdb_connection(sf)
            # The oracle runs IN-PROCESS: on the 100x corpus a naive
            # pair-join oracle can balloon past the interrupt timer and
            # OOM-kill the whole sweep (measured: 85 GB anon RSS before
            # the kernel stepped in).  A memory cap makes DuckDB spill
            # to disk and, failing that, raise -- recorded as ERR, the
            # honest verdict for an oracle that cannot run at 100x.
            con.execute("SET memory_limit='24GB'")
            con.execute("SET temp_directory='/tmp/duck_spill'")
            timer = threading.Timer(TIMEOUT_S, con.interrupt)
            timer.start()
            t1 = time.time()
            try:
                if snap is not None:
                    errs = compare(snap, con, q.oracle, strict=True)
                    row["oracle_s"] = round(time.time() - t1, 1)
                    row["status"] = (
                        "OK strict" if not errs
                        else f"MISMATCH {errs[0][:100]}"
                    )
                else:
                    ocnt = con.execute(
                        f"SELECT COUNT(*) FROM ({q.oracle})"
                    ).fetchone()[0]
                    row["oracle_s"] = round(time.time() - t1, 1)
                    row["status"] = (
                        "OK count-only (full hash at 10x)"
                        if ocnt == n_rows
                        else f"MISMATCH count {n_rows} vs {ocnt}"
                    )
            except Exception as e:  # noqa: BLE001
                msg = str(e)[:120]
                hit = "INTERRUPT" in msg.upper() or "interrupted" in msg
                row["oracle_s"] = round(time.time() - t1, 1)
                row["status"] = (
                    f"ORACLE_TIMEOUT {TIMEOUT_S}s (spark side measured)"
                    if hit
                    else f"ERR {msg}"
                )
            finally:
                timer.cancel()
                con.close()
        except Exception as e:  # noqa: BLE001
            row["status"] = f"SPARK_ERR {str(e)[:120]}"
            row["spark_s"] = round(time.time() - t0, 1)
        results[n] = row
        print(n, "->", row, flush=True)
        with open(RESULTS, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main(sys.argv[1:])
