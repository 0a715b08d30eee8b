"""WAV codec + frame kernels (functions/audio.py): hand-built RIFF
fixtures, roundtrips, the documented error contract, integer-exact
energy features, and a Spark mapInPandas drive -- the same test shape
as tests/test_imaging.py gives the image kernels."""

from __future__ import annotations

import struct

import pytest

from rippled_historical_database_spark.functions.audio import (
    Audio,
    decode_wav,
    encode_wav,
    frame_rms,
    peak,
    samples,
)


def _s16(vals: list[int], rate: int = 8000, channels: int = 1) -> Audio:
    return Audio(rate, channels, 2, struct.pack(f"<{len(vals)}h", *vals))


def test_roundtrip_s16_mono():
    a = _s16([0, 1000, -1000, 32767, -32768, 7])
    out = decode_wav(encode_wav(a))
    assert out == a
    assert out.n_samples == 6
    assert samples(out) == [0, 1000, -1000, 32767, -32768, 7]


def test_roundtrip_s16_stereo_channel_split():
    # interleaved L/R: L = 10, 20, 30; R = -1, -2, -3
    a = Audio(44100, 2, 2, struct.pack("<6h", 10, -1, 20, -2, 30, -3))
    out = decode_wav(encode_wav(a))
    assert samples(out, 0) == [10, 20, 30]
    assert samples(out, 1) == [-1, -2, -3]
    assert out.duration_ms == 3 * 1000 // 44100


def test_roundtrip_u8_centered():
    a = Audio(8000, 1, 1, bytes([128, 255, 0, 200]))
    out = decode_wav(encode_wav(a))
    assert samples(out) == [0, 127, -128, 72]


def test_odd_sized_chunk_padding():
    # a 1-byte u8 data chunk forces the RIFF even-padding rule
    a = Audio(8000, 1, 1, bytes([200]))
    data = encode_wav(a)
    assert len(data) % 2 == 0
    assert samples(decode_wav(data)) == [72]


def test_error_contract():
    good = encode_wav(_s16([1, 2, 3]))
    with pytest.raises(ValueError):
        decode_wav(b"nope" + good)
    with pytest.raises(ValueError):
        decode_wav(good[:20])           # truncated mid-chunk
    # non-PCM format code -> NotImplementedError (fmt code offset: RIFF
    # hdr 12 + chunk hdr 8)
    bad = bytearray(good)
    bad[20] = 3                          # IEEE float
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(bad))
    bad = bytearray(good)
    bad[34] = 24                         # 24-bit depth
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(bad))
    # hostile data-chunk length beyond the payload -> ValueError, and
    # never an allocation beyond the input (the chunk is sliced)
    bad = bytearray(good)
    struct.pack_into("<I", bad, len(bad) - len(_s16([1, 2, 3]).frames) - 4,
                     2 ** 31 - 1)
    with pytest.raises(ValueError):
        decode_wav(bytes(bad))


def test_frame_rms_known_values():
    # constant amplitude 100 -> RMS exactly 100 per frame
    a = _s16([100] * 8)
    assert frame_rms(a, 4) == [100, 100]
    # square wave +/-3 -> RMS 3; ragged tail dropped
    a = _s16([3, -3, 3, -3, 3])
    assert frame_rms(a, 2) == [3, 3]
    assert peak(a) == 3
    # isqrt floor: frame [1, 2] -> isqrt((1+4)//2) = isqrt(2) = 1
    assert frame_rms(_s16([1, 2]), 2) == [1]


def test_real_kernel_through_mapinpandas(spark):
    import pandas as pd

    rows = []
    for i in range(4):
        vals = [((j * 37 + i * 101) % 2001) - 1000 for j in range(64)]
        rows.append((i, bytearray(encode_wav(_s16(vals, rate=16000)))))
    df = spark.createDataFrame(
        [(i, bytes(p)) for i, p in rows], "doc_id long, payload binary"
    )

    def extract(batches):
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                a = decode_wav(bytes(payload))
                out.append(
                    (int(doc_id), a.sample_rate, a.n_samples,
                     peak(a), frame_rms(a, 16)[0])
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "rate", "n", "peak", "rms0"],
            )

    got = {
        r.doc_id: r
        for r in df.mapInPandas(
            extract, "doc_id long, rate int, n int, peak int, rms0 int"
        ).collect()
    }
    assert len(got) == 4
    for i, _p in rows:
        assert got[i].rate == 16000 and got[i].n == 64
        assert 0 <= got[i].rms0 <= got[i].peak <= 1000
