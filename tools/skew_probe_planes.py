"""Skew probes for the text and dedup planes (r13 verdict #4).

The candle-path probe (tools/skew_probe.py) measured the hot-PAIR
scenario; this tool measures the other two skew surfaces the engine
argues about in SCALE.md §3:

  * TEXT plane -- ``sample_stratified_exact_split`` ranks documents
    inside a ``Window.partitionBy(lang)``: one dominant language
    (~84% of the corpus remapped to 'en' by a deterministic md5 of
    doc_id) concentrates the row_number sort into ONE window
    partition, the classic straggler shape.  The probe reports
    uniform-vs-hot walls AND the max/median task duration of the
    stages each pass ran (Spark UI REST taskSummary), so a straggler
    shows up even when local[32] walls hide it.

  * DEDUP plane -- ``dedup_sorted_neighborhood_pairs`` blocks on a
    24-char normalized text prefix: the hot variant prefixes ~80% of
    documents with one constant 30-char string, collapsing them onto
    ONE blocking key.  The SN design claims skew-IMMUNITY: the pair
    budget is a fixed (W-1)*N regardless of key distribution (rank is
    a global sort, neighbors pair by adjacent rank, never by key
    equality) -- this measures that claim.

Usage: python tools/skew_probe_planes.py [copies]   (default 30)
Prints one JSON line per plane.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from pyspark.sql import functions as F  # noqa: E402

from rippled_historical_database_spark.session import get_spark  # noqa: E402
from tools.scale10x import ensure_10x  # noqa: E402
from tools.skew_probe import (  # noqa: E402
    _completed_stage_ids,
    stage_task_extremes,
)

HOT_PCT = 8          # md5 % 10 < 8 -> ~80% of rows remapped
HOT_LANG = "en"
HOT_PREFIX = "the same twenty-four chars "   # > SN_KEY_LEN after collapse


def _hot_flag():
    return (
        F.conv(
            F.substring(
                F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % 10
        < HOT_PCT
    )


def _derived_dir(spark, src: str, suffix: str, transform) -> str:
    """Clone dir with every table symlinked except a transformed
    documents.parquet."""
    out = f"{src}_{suffix}"
    docs_out = os.path.join(out, "documents.parquet")
    if os.path.exists(docs_out):
        return out
    os.makedirs(out, exist_ok=True)
    for t in os.listdir(src):
        if t != "documents.parquet" and not os.path.exists(
            os.path.join(out, t)
        ):
            os.symlink(os.path.join(src, t), os.path.join(out, t))
    d = spark.read.parquet(os.path.join(src, "documents.parquet"))
    transform(d).write.mode("overwrite").parquet(docs_out)
    return out


def _timed(spark, fn, passes: int = 3) -> dict:
    fn()  # warmup: codegen + file listing outside the band
    walls, extremes = [], {}
    for _ in range(passes):
        before = _completed_stage_ids(spark)
        t0 = time.time()
        n = fn()
        walls.append(time.time() - t0)
        ex = stage_task_extremes(spark, before)
        if ex and ex.get("max_task_ms", 0) >= extremes.get("max_task_ms", -1):
            extremes = ex
    return {
        "wall_sec": round(min(walls), 2),
        "walls": [round(w, 2) for w in walls],
        "rows": n,
        **extremes,
    }


def main() -> None:
    # Per-stage task metrics come from the Spark UI REST API, which
    # the harness session disables by default; set here (not at module
    # import) so merely importing the tool's helpers from another
    # process never mutates that process's session config.
    os.environ.setdefault("SPARK_GRAFT_UI", "true")
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    spark = get_spark("skew-probe-planes")
    spark.sparkContext.setLogLevel("ERROR")
    src = ensure_10x(spark, out=f"/tmp/sf{copies}x", copies=copies)

    from rippled_historical_database_spark.operators.dedup import (
        dedup_sorted_neighborhood_pairs,
    )
    from rippled_historical_database_spark.operators.sampling import (
        sample_stratified_exact_split,
    )

    # ---- TEXT plane: dominant language vs as-generated
    hot_lang_dir = _derived_dir(
        spark, src, "hotlang",
        lambda d: d.withColumn(
            "lang",
            F.when(_hot_flag(), F.lit(HOT_LANG)).otherwise(F.col("lang")),
        ),
    )
    res = {"plane": "text_stratified_split", "copies": copies}
    res["uniform"] = _timed(
        spark, lambda: sample_stratified_exact_split(spark, src).count()
    )
    res["hot"] = _timed(
        spark,
        lambda: sample_stratified_exact_split(spark, hot_lang_dir).count(),
    )
    hot_docs = spark.read.parquet(f"{hot_lang_dir}/documents.parquet")
    top = (
        hot_docs.groupBy("lang").count().orderBy(F.desc("count")).first()
    )
    res["hot_stratum_share"] = round(top["count"] / hot_docs.count(), 3)
    res["hot_over_uniform"] = round(
        res["hot"]["wall_sec"] / max(res["uniform"]["wall_sec"], 1e-9), 2
    )
    print(json.dumps(res), flush=True)

    # ---- DEDUP plane: one hot SN blocking key vs as-generated
    hot_key_dir = _derived_dir(
        spark, src, "hotkey",
        lambda d: d.withColumn(
            "text",
            F.when(
                _hot_flag(), F.concat(F.lit(HOT_PREFIX), F.col("text"))
            ).otherwise(F.col("text")),
        ),
    )
    res = {"plane": "dedup_sorted_neighborhood", "copies": copies}
    res["uniform"] = _timed(
        spark, lambda: dedup_sorted_neighborhood_pairs(spark, src).count()
    )
    res["hot"] = _timed(
        spark,
        lambda: dedup_sorted_neighborhood_pairs(spark, hot_key_dir).count(),
    )
    res["hot_key_share"] = HOT_PCT / 10
    res["hot_over_uniform"] = round(
        res["hot"]["wall_sec"] / max(res["uniform"]["wall_sec"], 1e-9), 2
    )
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
