"""WET source robustness: multi-file distributed writes, payloads with
internal blank lines, and the detectability guarantee for the one
documented mis-split case (payload containing the record magic)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rippled_historical_database_spark.sources.wet import read_wet, write_wet


def _roundtrip(spark, tmp_path, docs, n_parts=1):
    d = spark.createDataFrame(docs, "doc_id long, text string").repartition(
        n_parts
    )
    out = str(tmp_path / "wet")
    write_wet(d, out)
    return read_wet(spark, out)


def test_multi_file_write_reads_back_exactly(spark, tmp_path):
    docs = [(i, f"document body number {i} " * (i % 5 + 1)) for i in range(40)]
    parsed = _roundtrip(spark, tmp_path, docs, n_parts=4)
    rows = {
        int(r.target_uri.rsplit("/", 1)[1]): r for r in parsed.collect()
    }
    assert set(rows) == {d[0] for d in docs}
    by_id = dict(docs)
    for i, r in rows.items():
        assert r.payload == by_id[i].rstrip("\r\n") or r.payload == by_id[i]
        assert r.length_ok
        assert r.warc_type == "conversion"
        assert r.content_length == len(by_id[i].encode())


def test_internal_blank_lines_roundtrip(spark, tmp_path):
    body = "para one\r\n\r\npara two\r\n\r\npara three"
    parsed = _roundtrip(spark, tmp_path, [(1, body)])
    r = parsed.collect()[0]
    assert r.payload == body
    assert r.length_ok


def test_magic_in_payload_is_detected_not_silent(spark, tmp_path):
    """A payload containing the record magic mis-splits (documented
    limitation of separator-based framing) -- but the Content-Length
    cross-check must FLAG it: at least one emitted record fails
    length_ok, so a pipeline can quarantine instead of training on a
    torn document."""
    evil = "prefix text\r\nWARC/1.0\r\nlooks like a header\r\n\r\ntail"
    parsed = _roundtrip(spark, tmp_path, [(1, "clean doc"), (2, evil)])
    rows = parsed.collect()
    flags = [r.length_ok for r in rows]
    assert not all(flags), rows
    # and the clean record still parses fine
    clean = [r for r in rows if r.payload == "clean doc"]
    assert clean and clean[0].length_ok
