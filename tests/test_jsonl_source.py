"""JSONL source: the quarantine channel must catch malformed lines
without losing clean ones, and unicode/escaping must roundtrip."""

from __future__ import annotations

from pyspark.sql import functions as F

from rippled_historical_database_spark.sources.jsonl import (
    read_jsonl,
    write_jsonl,
)


def test_corrupt_lines_quarantine_not_crash_not_vanish(spark, tmp_path):
    docs = [(i, f"body {i}", "en", "src", 6) for i in range(10)]
    d = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "jl")
    write_jsonl(d, out)
    # inject garbage lines alongside the clean part files
    with open(f"{out}/zz-garbage.json", "w") as f:
        f.write('{"doc_id": 99, "text": unquoted}\n')
        f.write("not json at all\n")
        f.write('{"doc_id": 100, "text": "fine", "lang": "en", '
                '"source": "s", "n_chars": 4}\n')
    clean, quarantine = read_jsonl(spark, out)
    ids = {r.doc_id for r in clean.collect()}
    assert ids == set(range(10)) | {100}
    assert quarantine.count() == 2
    bad = [r._corrupt_record for r in quarantine.collect()]
    assert any("unquoted" in b for b in bad)


def test_escaping_and_unicode_roundtrip(spark, tmp_path):
    tricky = 'he said "hi"\tthen\nnew line \\ backslash é中'
    d = spark.createDataFrame(
        [(1, tricky, "mixed", "s", len(tricky))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = str(tmp_path / "jl2")
    write_jsonl(d, out)
    clean, quarantine = read_jsonl(spark, out)
    assert quarantine.count() == 0
    row = clean.collect()[0]
    assert row.text == tricky
