"""Hot-pair skew probe for the candle path (SCALE.md §3, round-13
verdict item #5).

SCALE.md §3 ARGUES that (pair, minute)-keyed candle aggregation plus
AQE keeps reducer walls bounded when one pair carries most of the
volume (the XRP-on-one-side reality); this tool MEASURES it.  It
builds the ×N replicated corpus (tools/scale10x.py), derives a
Zipf-hot variant in which ~80% of all trades collapse onto ONE pair
(deterministic md5 remap of event_type -- same row count, same
timestamps, radically different key distribution), then times the
flagship hourly-candle aggregation on both and reports, straight from
the Spark listener metrics, the max/median task time of the
aggregation stages -- the straggler evidence walls-vs-argument needs.

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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rippled_historical_database_spark.operators.candles import (  # noqa: E402
    hourly_candles,
)
from rippled_historical_database_spark.session import get_spark  # noqa: E402
from tools.scale10x import ensure_10x  # noqa: E402

HOT_PAIR = "purchase"   # the pair 80% of trades collapse onto
HOT_PCT = 8             # md5 % 10 < 8  ->  ~80% of rows


def _timed_run(spark, events, label: str) -> dict:
    out = hourly_candles(events, final=True)
    out.count()  # warmup: codegen + file-listing paid outside the band
    walls = []
    n = 0
    for _ in range(3):
        t0 = time.time()
        n = out.count()
        walls.append(time.time() - t0)
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
    }


def main() -> None:
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
