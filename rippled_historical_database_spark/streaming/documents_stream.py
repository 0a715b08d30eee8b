"""Structured Streaming over the DOCUMENT corpus: quality filtering +
content-dedup as data arrives, not as a nightly batch.

A training-data pipeline ingests crawl shards continuously; admitting
a document should not wait for the next full-corpus pass.  This module
streams the documents table through the SAME gopher rule stack the
batch operator registers (one formulation, two execution modes) and
maintains a per-content-hash registry -- first doc id seen and
duplicate count -- as streaming state.

State design: the aggregation keys on md5(text), so state is one row
per DISTINCT content, not per document; the hot path for crawl streams
(the same page fetched daily) folds into a counter update.  The
registered local form drives complete mode over a finite source so the
result is oracle-comparable; production runs update mode with the
registry as the sink upsert key, and bounds state by a TTL on ingest
time if the corpus is unbounded.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from .memory_sink import run_to_memory


def _documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The file streaming source lists a directory, non-recursively.  A
    # Spark-written documents.parquet IS a directory of part files --
    # stream it as-is; a single-file table (the generated testdata
    # shape) gets symlinked into a temp dir.
    src = os.path.join(sf_dir, "documents.parquet")
    schema = spark.read.parquet(src).schema
    if os.path.isdir(src):
        return spark.readStream.schema(schema).parquet(src)
    d = tempfile.mkdtemp(prefix="documents_stream_")
    link = os.path.join(d, "documents.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    return spark.readStream.schema(schema).parquet(d)


@register(
    "stream_document_dedup_registry",
    rotation_group=3,
    oracle="""
    WITH toks AS (
        SELECT doc_id, text,
               len(regexp_split_to_array(trim(lower(text)), '\\s+'))
                 AS n_words
        FROM documents
    ),
    kept AS (
        SELECT doc_id, md5(text) AS content_md5
        FROM toks WHERE n_words >= 10
    )
    SELECT content_md5,
           MIN(doc_id) AS first_doc_id,
           COUNT(*) AS n_copies
    FROM kept
    GROUP BY content_md5
    ORDER BY content_md5
    """,
    doc="Streaming document admission: a minimum-length quality cut "
        "(the gopher word-count rule as a streaming-safe projection) "
        "followed by a per-content-hash registry -- first doc id and "
        "copy count per distinct md5(text) -- maintained as streaming "
        "state.  MIN/COUNT are order-independent aggregates, so the "
        "registry is identical for ANY arrival order and the batch "
        "oracle checks the streamed result exactly.  State is one row "
        "per distinct content (crawl re-fetches fold into a counter), "
        "keyed on the hash: the same single-shuffle shape as batch "
        "exact dedup.",
    tags=("streaming", "dedup", "pipeline"),
)
def stream_document_dedup_registry(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = _documents_stream(spark, sf_dir)
    kept = docs.filter(
        F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+")) >= 10
    ).select("doc_id", F.md5(F.col("text").cast("binary")).alias("content_md5"))
    agg = kept.groupBy("content_md5").agg(
        F.min("doc_id").alias("first_doc_id"),
        F.count("*").alias("n_copies"),
    )
    return run_to_memory(agg, "stream_doc_registry", "complete").orderBy(
        "content_md5"
    )
