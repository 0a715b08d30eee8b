"""The learned int8-quantization range is a train-once artifact: written
on first use, read by every consumer, retrained only when the source
table changes.  Recomputing it per query is the silent-corruption path
(codes encoded with range A, served with range B).
"""

from __future__ import annotations

import os

from rippled_historical_database_spark.operators import similarity as S


def _artifact_dir(monkeypatch, tmp_path) -> str:
    root = str(tmp_path / "artifacts")
    monkeypatch.setattr(S, "QUANT_ARTIFACT_ROOT", root)
    return root


def test_artifact_written_once_and_reused(spark, sf_dir, monkeypatch, tmp_path):
    _artifact_dir(monkeypatch, tmp_path)

    first = S.quant_ranges_artifact(spark, sf_dir).collect()
    paths = []
    for base, _, files in os.walk(str(tmp_path / "artifacts")):
        paths += [os.path.join(base, f) for f in files if f == "_SUCCESS"]
    assert len(paths) == 1
    stamp = os.stat(paths[0]).st_mtime_ns

    second = S.quant_ranges_artifact(spark, sf_dir).collect()
    assert os.stat(paths[0]).st_mtime_ns == stamp, "artifact was rewritten"
    assert first == second

    # and it equals the directly-learned range
    emb = S.load_table(spark, sf_dir, "embeddings")
    assert S._quant_ranges(emb).collect() == first


def test_writer_reader_roundtrip(spark, sf_dir, tmp_path):
    emb = S.load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ranges")
    S.write_quant_ranges(emb, path)
    got = S.read_quant_ranges(spark, path).collect()
    assert got == S._quant_ranges(emb).collect()


def test_quantize_and_serve_share_the_artifact(spark, sf_dir, monkeypatch, tmp_path):
    _artifact_dir(monkeypatch, tmp_path)
    S.embedding_quantize_int8(spark, sf_dir).count()
    S.ann_quantized_topk(spark, sf_dir).count()
    # both consumers resolved to ONE trained artifact
    n_artifacts = sum(
        f == "_SUCCESS" for _, _, fs in os.walk(str(tmp_path / "artifacts")) for f in fs
    )
    assert n_artifacts == 1
