"""Round-14 optimization measurement harness (guide section 1).

Times registry queries in isolation with the noop sink (so the timed
action computes every column of every row -- ``count()`` lets the
optimizer prune; guide section 1.4) and captures ``explain("formatted")``
for plan-shape diffs.  This tool is measurement-only: bench.py keeps its
count-based timing untouched for cross-round comparability.

Usage:
    python tools/opt_measure.py --names q1,q2    # or --all, or --bench
    python tools/opt_measure.py --bench --plans plans/r14 --suffix before
    python tools/opt_measure.py --all --runs 1 --out /tmp/walls.json

Output: one JSON object {name: {"best": s, "runs": [...], "rows": n}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", default="")
    ap.add_argument("--bench", action="store_true", help="bench-tagged set")
    ap.add_argument("--all", action="store_true", help="every registry query")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plans", default="", help="directory for explain dumps")
    ap.add_argument("--suffix", default="before", help="plan file suffix")
    ap.add_argument("--out", default="", help="JSON output path (default stdout)")
    ap.add_argument("--skip", default="", help="comma list of names to skip")
    args = ap.parse_args()

    from rippled_historical_database_spark.plans.registry import all_queries
    from rippled_historical_database_spark.session import get_spark

    registry = all_queries()
    if args.names:
        names = [n.strip() for n in args.names.split(",") if n.strip()]
    elif args.bench:
        names = [n for n, q in registry.items() if q.bench]
    elif args.all:
        names = list(registry)
    else:
        ap.error("one of --names/--bench/--all required")
    skip = {n.strip() for n in args.skip.split(",") if n.strip()}
    names = [n for n in names if n not in skip]
    missing = [n for n in names if n not in registry]
    if missing:
        ap.error(f"unknown queries: {missing}")

    spark = get_spark("opt-measure")
    sc = spark.sparkContext

    # Warm JVM + parquet footer cache once, outside any timing.
    registry[names[0]].spark(spark, args.sf_dir).count()

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)

    results: dict[str, dict] = {}
    for name in names:
        q = registry[name]
        if args.plans:
            df = q.spark(spark, args.sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"))
            with open(os.path.join(
                    args.plans, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
        runs = []
        for _ in range(args.runs):
            sc.setJobDescription(f"opt-measure: {name}")
            t0 = time.perf_counter()
            df = q.spark(spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 4))
            sc.setJobDescription(None)
        results[name] = {"best": min(runs), "runs": runs}
        print(f"{name:45s} best={min(runs):8.3f}  runs={runs}",
              file=sys.stderr, flush=True)

    payload = json.dumps(results, indent=1, sort_keys=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(payload)
    else:
        print(payload)
    spark.stop()


if __name__ == "__main__":
    main()
