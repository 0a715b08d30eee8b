"""Deterministic 10x-scale dataset builder (SCALE.md section 6).

Builds ``/tmp/sf1x``: the sf0.1 ``events``/``documents`` tables copied
``COPIES`` times with disjoint id spaces (copy k: ids + k*10M, users
+ k*100k) and a per-copy text salt (``copytag{k} `` prefix, so copies
are textually distinct but remain near-duplicates -- intentionally: the
dedup families must keep finding work at 10x).  All other tables are
symlinked from sf0.1 unchanged.  This codifies the ad-hoc round-4
script so the 10x law tests (tests/test_invariants_10x.py) and future
scale sweeps rebuild the exact same corpus when /tmp is wiped.

Usage: ``python tools/scale10x.py`` or ``ensure_10x(spark)`` from code.
"""

from __future__ import annotations

import os

SRC = "/root/testdata/sf0.1"
OUT = "/tmp/sf1x"
COPIES = 10
ID_STRIDE = 10_000_000
USER_STRIDE = 100_000
SYMLINKED = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "embeddings",
)


def _built(out: str) -> bool:
    return all(
        os.path.exists(os.path.join(out, f"{t}.parquet"))
        for t in SYMLINKED + ("events", "documents")
    )


def ensure_10x(spark, src: str = SRC, out: str = OUT, copies: int = COPIES) -> str:
    """Build (or reuse) the scaled dir; returns its path.  ``copies``
    parameterizes the 30x/100x points (out must differ per scale)."""
    if _built(out):
        return out
    from pyspark.sql import functions as F

    os.makedirs(out, exist_ok=True)
    for t in SYMLINKED:
        link = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(src, f"{t}.parquet"), link)

    ev = spark.read.parquet(os.path.join(src, "events.parquet"))
    ev_copies = [
        ev.select(
            (F.col("event_id") + k * ID_STRIDE).alias("event_id"),
            # NTZ keeps the parquet column naive (isAdjustedToUTC=false)
            # like the driver-generated source data: a plain TimestampType
            # write reads back as TIMESTAMPTZ in DuckDB, which the
            # compare() tz gate rightly flags at 10x.
            F.col("ts").cast("timestamp_ntz").alias("ts"),
            (F.col("user_id") + k * USER_STRIDE).alias("user_id"),
            "event_type", "value", "props",
        )
        for k in range(copies)
    ]
    u = ev_copies[0]
    for c in ev_copies[1:]:
        u = u.unionByName(c)
    u.write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))

    doc = spark.read.parquet(os.path.join(src, "documents.parquet"))
    doc_copies = [
        doc.select(
            (F.col("doc_id") + k * ID_STRIDE).alias("doc_id"),
            F.concat(F.lit(f"copytag{k} "), F.col("text")).alias("text"),
            "lang", "source",
            (F.col("n_chars") + F.lit(len(f"copytag{k} "))).alias("n_chars"),
        )
        for k in range(copies)
    ]
    d = doc_copies[0]
    for c in doc_copies[1:]:
        d = d.unionByName(c)
    d.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
    return out


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from rippled_historical_database_spark.session import get_spark

    print(ensure_10x(get_spark("scale10x")))
