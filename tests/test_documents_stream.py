"""The streaming document registry must fold duplicate content ACROSS
micro-batches (the synthetic corpus has no exact duplicates, so this
drives crafted ones through a real multi-batch stream)."""

from __future__ import annotations

import glob
import os
import time

import pytest
from pyspark.sql import functions as F

from rippled_historical_database_spark.streaming.memory_sink import (
    run_to_memory,
)


@pytest.mark.slow  # 22 s streaming replica (r15; see conftest slow gate)
def test_registry_folds_duplicates_across_batches(spark, tmp_path):
    d = str(tmp_path / "docs")
    os.makedirs(d)
    # three micro-batches; "dup text" arrives in every batch, "pair"
    # in two, each long enough to pass the 10-word cut
    long = lambda s: s + " filler" * 12  # noqa: E731
    batches = [
        [(1, long("dup text")), (2, long("only once"))],
        [(3, long("dup text")), (4, long("pair"))],
        [(5, long("dup text")), (6, long("pair")), (7, long("short"))],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(d)
        time.sleep(1.1)  # distinct mtimes: one file per micro-batch
    assert len(glob.glob(os.path.join(d, "part-*.parquet"))) == 3

    schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    kept = stream.filter(
        F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+")) >= 10
    ).select("doc_id", F.md5(F.col("text").cast("binary")).alias("h"))
    agg = kept.groupBy("h").agg(
        F.min("doc_id").alias("first_doc_id"),
        F.count("*").alias("n_copies"),
    )
    got = {
        r.first_doc_id: r.n_copies
        for r in run_to_memory(agg, "doc_reg_test", "complete").collect()
    }
    # dup text: ids 1,3,5 -> first 1, copies 3; pair: 4,6 -> first 4,
    # copies 2; singles keep their own id
    assert got == {1: 3, 2: 1, 4: 2, 7: 1}
