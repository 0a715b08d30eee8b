"""The end-to-end curation write plan: the landed corpus must equal the
independently-computed intersection of its stage predicates, the
partition layout must be real, and a re-run must be idempotent."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from rippled_historical_database_spark.plans.curate import (
    curated_documents,
    write_curated_corpus,
)
from rippled_historical_database_spark.sources.catalog import load_table


def _expected_ids(spark, sf_dir):
    from rippled_historical_database_spark.operators.dedup import (
        dedup_connected_components,
    )
    from rippled_historical_database_spark.operators.pipeline import (
        pipeline_source_gate,
    )
    from rippled_historical_database_spark.plans.registry import all_queries

    d = load_table(spark, sf_dir, "documents")
    good = {
        r.source
        for r in pipeline_source_gate(spark, sf_dir).collect()
        if r.source_kept
    }
    gopher = {
        r.doc_id
        for r in all_queries()["text_gopher_rules"].spark(spark, sf_dir).collect()
        if r.keep
    }
    dupes = {
        r.doc_id
        for r in dedup_connected_components(spark, sf_dir).collect()
        if not r.is_keeper
    }
    return {
        r.doc_id
        for r in d.select("doc_id", "source").collect()
        if r.source in good and r.doc_id in gopher and r.doc_id not in dupes
    }


def test_curated_corpus_is_the_stage_intersection(spark, sf_dir, tmp_path):
    out = str(tmp_path / "curated")
    acct = write_curated_corpus(spark, sf_dir, out)
    expected = _expected_ids(spark, sf_dir)
    landed = spark.read.parquet(out)
    got = {r.doc_id for r in landed.select("doc_id").collect()}
    assert got == expected
    assert acct["n_out"] == len(expected) < acct["n_in"]

    # real partition layout on disk: lang=*/source=* directories
    part_dirs = glob.glob(os.path.join(out, "lang=*", "source=*"))
    assert part_dirs, os.listdir(out)
    # partition pruning works: one (lang, source) cell reads back pure
    some = os.path.relpath(part_dirs[0], out)
    lang = some.split("/")[0].split("=")[1]
    src = some.split("/")[1].split("=")[1]
    cell = landed.filter((F.col("lang") == lang) & (F.col("source") == src))
    assert cell.count() > 0

    # idempotence: a second run lands the identical id set
    write_curated_corpus(spark, sf_dir, out)
    again = {r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()}
    assert again == expected


def test_curated_files_are_internally_sorted(spark, sf_dir, tmp_path):
    """The within-partition sort must be REAL in the landed files:
    repartition(lang, source) collapses each cell to one task (so one
    data file per partition directory), and inside each file the
    row-group n_chars envelopes must be non-decreasing AND the actual
    column values must be globally sorted -- the property row-group
    pruning on a range predicate depends on."""
    import pyarrow.parquet as pq

    out = str(tmp_path / "curated2")
    write_curated_corpus(spark, sf_dir, out)
    checked = 0
    for pdir in glob.glob(os.path.join(out, "lang=*", "source=*")):
        files = glob.glob(os.path.join(pdir, "*.parquet"))
        assert len(files) == 1, files  # one task per (lang, source) cell
        meta = pq.ParquetFile(files[0]).metadata
        idx = {
            meta.row_group(0).column(i).path_in_schema: i
            for i in range(meta.row_group(0).num_columns)
        }
        envs = [
            (
                meta.row_group(g).column(idx["n_chars"]).statistics.min,
                meta.row_group(g).column(idx["n_chars"]).statistics.max,
            )
            for g in range(meta.num_row_groups)
        ]
        for (lo, hi), (lo2, hi2) in zip(envs, envs[1:]):
            assert hi <= lo2, envs  # successive row groups don't overlap
        vals = pq.read_table(files[0], columns=["n_chars"])["n_chars"]
        vals = vals.to_pylist()
        assert vals == sorted(vals)
        checked += 1
    assert checked > 0
