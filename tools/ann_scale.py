"""ANN scale measurement (SCALE.md, round 12): index build + query +
recall at replayed corpus scales, the same methodology as the LSH
dedup table (tools/etl_replay.py / the x30/x100 dedup rows).

Builds ``/tmp/annx{K}/embeddings.parquet`` -- the sf0.1 embeddings
table replicated K times with disjoint vec_id spaces (copy 0 keeps the
original ids, so the IVF centroid / PQ codebook / query anchor rows
stay valid) -- then measures, per scale:

  * ``exact_s``    -- brute-force cosine top-k (ann_cosine_topk), the
                      ground truth and the thing IVF/PQ must beat
  * ``build_s``    -- the index build alone: IVF cell assignment + PQ
                      encoding, materialized to parquet partitioned by
                      cell_id (what a production pipeline writes once
                      and queries many times)
  * ``query_s``    -- ADC top-k served FROM the materialized index:
                      read the probed cells' code rows, join the
                      broadcast LUT, rank -- the amortized per-batch
                      query cost the index exists for
  * ``ivfpq_s``    -- the full fused ann_ivf_pq_topk run (build +
                      probe + ADC in one lineage; the registered
                      oracle-checked query -- build cost included by
                      design, so it is NOT the serving-path number)
  * ``recall``     -- |ivfpq top-k ∩ exact top-k| / (queries x k)
  * ``candidates`` -- (query, vector) pairs scored by ADC;
                      ``candidate_frac`` normalizes per query -- the
                      pruning ratio that carries the 100 TB argument

Usage: ``python tools/ann_scale.py [copies ...]`` (default 30 100).
Prints one JSON line per scale.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
STRIDE = 1_000_000


def ensure_scaled(spark, copies: int) -> str:
    out = f"/tmp/annx{copies}"
    dst = os.path.join(out, "embeddings.parquet")
    if os.path.exists(dst):
        return out
    from pyspark.sql import functions as F

    os.makedirs(out, exist_ok=True)
    emb = spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
    parts = [
        emb.select(
            (F.col("vec_id") + k * STRIDE).alias("vec_id"),
            "embedding",
            "label",
        )
        for k in range(copies)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.repartition(32).write.mode("overwrite").parquet(dst + ".tmp")
    os.replace(dst + ".tmp", dst)
    return out


def measure(spark, copies: int) -> dict:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from rippled_historical_database_spark.functions.numeric import dsum
    from rippled_historical_database_spark.operators.similarity import (
        IVF_CENTROID_IDS,
        IVF_NPROBE,
        N_QUERIES,
        PQ_CODEBOOK_IDS,
        PQ_M,
        PQ_ROUND,
        PQ_SUB,
        TOP_K,
        _dot,
        _norm,
        _sub_l2sq,
        ann_cosine_topk,
        ann_ivf_pq_topk,
    )

    sf_dir = ensure_scaled(spark, copies)
    raw = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    corpus = raw.count()

    t = time.time()
    exact = {
        (r.query_id, r.neighbor_id)
        for r in ann_cosine_topk(spark, sf_dir).collect()
    }
    exact_s = time.time() - t

    centroids = raw.filter(
        F.col("vec_id").isin(*IVF_CENTROID_IDS)
    ).select(F.col("vec_id").alias("cell_id"), F.col("embedding").alias("c_emb"))
    cell_cos = _dot(F.col("embedding"), F.col("c_emb")) / (
        _norm(F.col("embedding")) * _norm(F.col("c_emb"))
    )
    by_cell = Window.partitionBy("vec_id").orderBy(
        cell_cos.desc(), F.col("cell_id")
    )

    # ---- index BUILD: cell assignment + PQ codes, written once,
    # partitioned by cell -- the artifact a serving path reads.
    cb_subs_src = raw.filter(F.col("vec_id").isin(*PQ_CODEBOOK_IDS)).select(
        "vec_id",
        F.transform(
            "embedding", lambda x: x.cast("double") / _norm(F.col("embedding"))
        ).alias("embedding"),
    )
    subs = F.array(
        *[
            F.struct(
                F.lit(m).alias("m"),
                F.lit(m * PQ_SUB + 1).alias("start"),
                F.slice("embedding", m * PQ_SUB + 1, PQ_SUB).alias("c_sub"),
            )
            for m in range(PQ_M)
        ]
    )
    cb_subs = cb_subs_src.select(
        F.col("vec_id").alias("code"), F.explode(subs).alias("s")
    ).select("s.m", "s.start", "code", "s.c_sub")

    idx_dir = os.path.join(sf_dir, "ivfpq_index.parquet")
    shutil.rmtree(idx_dir, ignore_errors=True)
    d = _sub_l2sq(F.col("embedding"), F.col("c_sub"), F.col("start"))
    by_sub = Window.partitionBy("vec_id", "m").orderBy(d.asc(), F.col("code"))
    t = time.time()
    assigned = (
        raw.crossJoin(F.broadcast(centroids))
        .withColumn("rn", F.row_number().over(by_cell))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "cell_id")
    )
    n_emb = assigned.select(
        "vec_id",
        "cell_id",
        F.transform(
            "embedding", lambda x: x.cast("double") / _norm(F.col("embedding"))
        ).alias("embedding"),
    )
    (
        n_emb.crossJoin(F.broadcast(cb_subs))
        .withColumn("rn", F.row_number().over(by_sub))
        .filter(F.col("rn") == 1)
        .select("vec_id", "m", "code", "cell_id")
        .write.partitionBy("cell_id")
        .mode("overwrite")
        .parquet(idx_dir)
    )
    build_s = time.time() - t
    codes = spark.read.parquet(idx_dir)

    # ---- QUERY from the materialized index: probe cells, ADC-score
    # the probed cells' codes against the broadcast LUT, rank.
    queries = raw.filter(F.col("vec_id") < N_QUERIES)
    probes = (
        queries.crossJoin(F.broadcast(centroids))
        .withColumn("rn", F.row_number().over(by_cell))
        .filter(F.col("rn") <= IVF_NPROBE)
        .select(F.col("vec_id").alias("query_id"), "cell_id")
    )
    candidates = codes.filter(F.col("m") == 0).join(
        F.broadcast(probes), "cell_id"
    ).count()
    lut = (
        queries.select(
            "vec_id",
            F.transform(
                "embedding",
                lambda x: x.cast("double") / _norm(F.col("embedding")),
            ).alias("embedding"),
        )
        .crossJoin(F.broadcast(cb_subs))
        .select(
            F.col("vec_id").alias("query_id"),
            "m",
            F.col("code"),
            F.round(d, PQ_ROUND).alias("ld"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id")
    )
    t = time.time()
    served = (
        codes.join(F.broadcast(probes), "cell_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(lut), ["query_id", "m", "code"])
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(dsum("ld", PQ_ROUND).alias("adc_dist"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .collect()
    )
    query_s = time.time() - t
    served_set = {(r.query_id, r.neighbor_id) for r in served}

    t = time.time()
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ann_ivf_pq_topk(spark, sf_dir).collect()
    }
    ivfpq_s = time.time() - t

    denom = N_QUERIES * TOP_K
    return {
        "copies": copies,
        "corpus": corpus,
        "exact_s": round(exact_s, 2),
        "build_s": round(build_s, 2),
        "query_s": round(query_s, 2),
        "ivfpq_s": round(ivfpq_s, 2),
        "recall": round(len(exact & approx) / denom, 4),
        "served_recall": round(len(exact & served_set) / denom, 4),
        "served_matches_fused": served_set == approx,
        "candidates": candidates,
        "candidate_frac": round(candidates / (N_QUERIES * corpus), 4),
    }


def main(argv: list[str]) -> None:
    from rippled_historical_database_spark.session import get_spark

    spark = get_spark("ann-scale")
    for copies in [int(a) for a in argv] or [30, 100]:
        print(json.dumps(measure(spark, copies)))


if __name__ == "__main__":
    main(sys.argv[1:])
