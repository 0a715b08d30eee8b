"""Composite training-data curation pipeline: the pipeline ops
(dedup, quality, language) composed end-to-end into one plan.

A corpus-curation run is never one operator -- it is exact-dedup ->
quality gate -> language gate -> corpus accounting, fused.  Expressing
the composition as a single DataFrame plan lets Catalyst collapse the
whole thing into: one scan + one dedup shuffle + one stats shuffle --
the quality/language gates and token features ride along inside the
same stages (three exchanges total: the dedup hash, the keeper
self-join alignment, the final stats aggregation).

Scale: the md5 keys are uniform (no skew); the keeper self-join keys on
doc_id so AQE can pick SMJ or shuffled-hash without a broadcast of the
(large) keeper set; the gates prune before the stats aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dsum
from ..plans.registry import register
from ..sources.catalog import load_table
from .text_analysis import SQL_TOKENS

MIN_TOKENS = 10
MEAN_TOKEN_LEN = (3.0, 12.0)  # chars/token band: too low = shredded, too high = code/garbage
KEEP_LANGS = ("en", "es")


@register(
    "pipeline_corpus_curation",
    bench=True,
    oracle=f"""
    WITH dedup AS (
        SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    ),
    kept AS (
        SELECT d.source, d.lang,
               LENGTH(d.text) AS n_chars,
               len({SQL_TOKENS}) AS n_tokens
        FROM documents d JOIN dedup USING (doc_id)
        WHERE len({SQL_TOKENS}) >= {MIN_TOKENS}
          AND CAST(LENGTH(d.text) AS DOUBLE) / len({SQL_TOKENS})
              BETWEEN {MEAN_TOKEN_LEN[0]} AND {MEAN_TOKEN_LEN[1]}
          AND d.lang IN {KEEP_LANGS!r}
    )
    SELECT source, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(n_tokens AS DECIMAL(38,6))) AS DOUBLE) AS total_tokens,
           CAST(SUM(CAST(n_chars AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_chars
    FROM kept GROUP BY source, lang ORDER BY source, lang
    """,
    doc="End-to-end corpus curation: exact dedup (keep lowest doc_id "
        "per content hash) -> token-count and mean-token-length quality "
        "gates -> language whitelist -> per-(source, lang) corpus "
        "accounting. One scan, two shuffles total.",
    tags=("pipeline", "dedup", "text"),
)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    keeper = d.groupBy(F.md5("text").alias("_h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    tokens = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    n_tokens = F.size(tokens)
    mean_len = F.length("text").cast("double") / n_tokens
    kept = (
        d.join(keeper.select("doc_id"), "doc_id")
        .filter(
            (n_tokens >= MIN_TOKENS)
            & mean_len.between(*MEAN_TOKEN_LEN)
            & F.col("lang").isin(*KEEP_LANGS)
        )
        .select(
            "source", "lang",
            F.length("text").alias("n_chars"),
            n_tokens.alias("n_tokens"),
        )
    )
    return (
        kept.groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            dsum("n_tokens").alias("total_tokens"),
            (dsum("n_chars") / F.count("*")).alias("avg_chars"),
        )
        .orderBy("source", "lang")
    )
