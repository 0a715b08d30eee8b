"""Pure-Python WAV (RIFF PCM) codec + deterministic frame kernels.

The audio counterpart of functions/imaging.py (which retired the PIL
stub in round 12): the container has no audio libraries, but PCM WAV
is struct-level plumbing, not signal processing -- so the decode /
encode / frame-energy kernels a multimodal pipeline runs inside
``mapInPandas`` are REAL here, implemented from the public RIFF/WAVE
layout (the format the reference-adjacent tooling would hand us;
compare ``operators/multimodal.py`` where the registered queries keep
md5-derived deterministic metadata for oracle-checkability and this
module is what a production run swaps in).

Scope, mirroring imaging.py's documented boundaries:
  * PCM integer samples only, 8-bit (unsigned) and 16-bit (signed LE),
    any channel count / sample rate.  Compressed codecs and IEEE-float
    WAV (fmt codes != 1) raise NotImplementedError -- decompression is
    DSP, not plumbing.
  * Error contract (identical to the image kernels, so one UDF
    quarantine covers both): ValueError for malformed/truncated
    payloads, NotImplementedError for documented out-of-scope
    variants.  struct errors never escape.
  * Every kernel is integer-exact (isqrt/floor arithmetic, no floats),
    so per-frame features are bit-identical on any host -- the same
    determinism discipline as the engine's fround policy.

Safety: the chunk walk is bounds-checked and the data chunk is sliced
from the payload (never inflated), so a hostile length field cannot
allocate beyond the input size -- the audio analog of decode_png's
bounded inflate.
"""

from __future__ import annotations

import math
import struct
from typing import NamedTuple


class Audio(NamedTuple):
    sample_rate: int
    channels: int
    sample_width: int   # bytes per sample: 1 (u8) or 2 (s16le)
    frames: bytes       # interleaved PCM payload

    @property
    def n_samples(self) -> int:
        """Samples per channel."""
        return len(self.frames) // (self.sample_width * self.channels)

    @property
    def duration_ms(self) -> int:
        """Exact integer milliseconds (floor)."""
        return self.n_samples * 1000 // self.sample_rate


def decode_wav(data: bytes) -> Audio:
    """RIFF/WAVE PCM decoder.  ValueError for malformed payloads
    (truncation included), NotImplementedError for non-PCM encodings
    and unsupported bit depths."""
    try:
        return _decode_wav(data)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt WAV payload: {e}") from e


def _decode_wav(data: bytes) -> Audio:
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("fmt chunk truncated")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            if len(body) != size:
                raise ValueError("data chunk truncated")
            pcm = body
        # chunks pad to even length (RIFF rule)
        pos += 8 + size + (size & 1)
    if fmt is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, rate, _byte_rate, block_align, bits = fmt
    if audio_format != 1:
        raise NotImplementedError(
            f"WAV format code {audio_format} (only PCM=1; float/ADPCM "
            "decoding is DSP, out of scope for the pure-Python kernel)"
        )
    if bits not in (8, 16):
        raise NotImplementedError(f"PCM bit depth {bits} (8/16 only)")
    if channels < 1 or rate < 1:
        raise ValueError(f"bad WAV header: channels={channels} rate={rate}")
    width = bits // 8
    if block_align != width * channels:
        raise ValueError("block alignment disagrees with channels/width")
    # truncate a ragged tail (a cut-off final frame) rather than erroring:
    # decoders universally do; the length check above already rejected a
    # data chunk shorter than its declared size.
    usable = (len(pcm) // block_align) * block_align
    return Audio(rate, channels, width, pcm[:usable])


def encode_wav(a: Audio) -> bytes:
    """Canonical minimal RIFF writer (fmt + data, PCM)."""
    if a.sample_width not in (1, 2):
        raise ValueError("PCM sample width must be 1 or 2 bytes")
    if a.channels < 1 or a.sample_rate < 1:
        raise ValueError("channels and sample_rate must be positive")
    block = a.sample_width * a.channels
    fmt = struct.pack(
        "<HHIIHH", 1, a.channels, a.sample_rate,
        a.sample_rate * block, block, a.sample_width * 8,
    )
    data = a.frames
    chunks = b"".join(
        cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")
        for cid, body in ((b"fmt ", fmt), (b"data", data))
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def samples(a: Audio, channel: int = 0) -> list[int]:
    """One channel's samples as CENTERED integers (u8 -> -128..127 by
    subtracting the 128 bias, s16 as-is) so energy kernels treat both
    widths uniformly."""
    if not 0 <= channel < a.channels:
        raise ValueError(f"channel {channel} of {a.channels}")
    step = a.channels * a.sample_width
    off = channel * a.sample_width
    out = []
    if a.sample_width == 1:
        for i in range(off, len(a.frames), step):
            out.append(a.frames[i] - 128)
    else:
        for i in range(off, len(a.frames), step):
            (v,) = struct.unpack_from("<h", a.frames, i)
            out.append(v)
    return out


def frame_rms(a: Audio, frame_len: int, channel: int = 0) -> list[int]:
    """Integer RMS per non-overlapping frame of ``frame_len`` samples:
    isqrt(sum(x^2) // n) -- floor arithmetic end to end, so the energy
    contour is bit-identical on every host (the VAD-style feature the
    multimodal operators plan over).  The final ragged frame is dropped
    (fixed frame grid, matching audio_frame_plan's full-frame count)."""
    if frame_len < 1:
        raise ValueError("frame_len must be positive")
    xs = samples(a, channel)
    out = []
    for start in range(0, len(xs) - frame_len + 1, frame_len):
        frame = xs[start : start + frame_len]
        out.append(math.isqrt(sum(x * x for x in frame) // frame_len))
    return out


def peak(a: Audio, channel: int = 0) -> int:
    """Max absolute centered amplitude on the channel (0 for empty)."""
    xs = samples(a, channel)
    return max((abs(x) for x in xs), default=0)
