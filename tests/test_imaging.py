"""The pure-Python imaging kernels (functions/imaging.py) that back
multimodal.decode_image / resize_image -- the round-12 replacement for
the former PIL stub.

Covers: PNG round-trip (gray / RGB / RGBA), hand-built PNGs exercising
each of the five scanline filters (the encoder only emits filter 0, so
filters 1-4 are constructed chunk-by-chunk here), PPM/PGM and BMP
layouts (padding, bottom-up rows, BGR order), nearest-neighbor resize
laws, luma stats, format sniffing in decode_image, and one end-to-end
Spark mapInPandas drive of the REAL kernel over binary payloads.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from rippled_historical_database_spark.functions.imaging import (
    Image,
    decode_bmp,
    decode_png,
    decode_ppm,
    encode_png,
    encode_ppm,
    luma_stats,
    resize_nearest,
)
from rippled_historical_database_spark.operators.multimodal import (
    decode_image,
    resize_image,
)


def _gradient(w: int, h: int, ch: int) -> Image:
    px = bytearray()
    for y in range(h):
        for x in range(w):
            for c in range(ch):
                px.append((x * 37 + y * 101 + c * 53) % 256)
    return Image(w, h, ch, bytes(px))


# ----------------------------------------------------------- PNG


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_png_roundtrip(ch):
    img = _gradient(5, 4, ch)
    out = decode_png(encode_png(img))
    assert (out.width, out.height, out.channels) == (5, 4, ch)
    assert out.pixels == img.pixels


def _png_with_filters(img: Image, filters: list[int]) -> bytes:
    """Build a PNG whose y-th scanline uses filters[y] -- the inverse
    of the decoder's defiltering, per RFC 2083 §6."""
    ch = img.channels
    stride = img.width * ch
    raw = bytearray()
    for y in range(img.height):
        f = filters[y]
        line = img.pixels[y * stride : (y + 1) * stride]
        prev = img.pixels[(y - 1) * stride : y * stride] if y else b"\x00" * stride
        enc = bytearray([f])
        for i in range(stride):
            left = line[i - ch] if i >= ch else 0
            up = prev[i]
            ul = prev[i - ch] if i >= ch else 0
            if f == 0:
                v = line[i]
            elif f == 1:
                v = line[i] - left
            elif f == 2:
                v = line[i] - up
            elif f == 3:
                v = line[i] - ((left + up) >> 1)
            else:  # 4 -- Paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                v = line[i] - pred
            enc.append(v & 0xFF)
        raw += enc

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", img.width, img.height, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_all_five_filters_defilter_correctly():
    img = _gradient(7, 5, 3)
    data = _png_with_filters(img, [0, 1, 2, 3, 4])
    out = decode_png(data)
    assert out.pixels == img.pixels


def test_png_rejects_out_of_scope_variants():
    img = _gradient(3, 3, 3)
    good = encode_png(img)
    # flip the interlace byte inside IHDR (offset: 8 sig + 8 hdr + 12)
    bad = bytearray(good)
    bad[8 + 8 + 12] = 1
    # CRC now wrong but IHDR parse happens first
    with pytest.raises(NotImplementedError):
        decode_png(bytes(bad))
    with pytest.raises(ValueError):
        decode_png(b"nope" + good)


def test_png_zip_bomb_is_rejected_without_inflating():
    """A 3x3 IHDR whose IDAT inflates to ~64 MB must fail fast on the
    bounded decompressor (ValueError), never materialize the payload --
    the OOM guard for hostile bytes inside the Arrow-batched UDF path."""
    from rippled_historical_database_spark.functions.imaging import _chunk

    ihdr = struct.pack(">IIBBBBB", 3, 3, 8, 2, 0, 0, 0)
    bomb = zlib.compress(b"\x00" * (64 * 1024 * 1024), 9)  # ~64 KB packed
    data = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", bomb)
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(data)


def test_truncated_bmp_and_ppm_raise_valueerror():
    """The documented error contract (ValueError, never struct.error)
    holds for truncated headers too -- UDF quarantines catch ValueError."""
    # valid magic + plausible hdr_size, cut before the 34-byte header
    # ends: the compression field unpack hits a short slice
    truncated_bmp = b"BM" + b"\x00" * 12 + struct.pack("<I", 40) + b"\x00" * 12
    with pytest.raises(ValueError):
        decode_bmp(truncated_bmp)
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n3")               # header cut mid-token


# ------------------------------------------------------- PPM / BMP


@pytest.mark.parametrize("ch", [1, 3])
def test_ppm_roundtrip(ch):
    img = _gradient(6, 3, ch)
    out = decode_ppm(encode_ppm(img))
    assert out.pixels == img.pixels
    assert (out.width, out.height, out.channels) == (6, 3, ch)


def test_ppm_header_comments():
    img = _gradient(2, 2, 3)
    data = b"P6\n# a comment\n2 2\n# another\n255\n" + img.pixels
    assert decode_ppm(data).pixels == img.pixels


def _bmp_24(img: Image, bottom_up: bool = True) -> bytes:
    """Minimal uncompressed 24-bit BMP writer (BGR, 4-byte row pad)."""
    row_bytes = (img.width * 3 + 3) & ~3
    body = bytearray()
    ys = range(img.height - 1, -1, -1) if bottom_up else range(img.height)
    for y in ys:
        row = bytearray()
        for x in range(img.width):
            r, g, b = img.pixel(x, y)
            row += bytes((b, g, r))
        row += b"\x00" * (row_bytes - len(row))
        body += row
    h = img.height if bottom_up else -img.height
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, img.width, h, 1, 24, 0,
                      len(body), 2835, 2835, 0, 0)
    )
    return bytes(header) + bytes(body)


@pytest.mark.parametrize("bottom_up", [True, False])
def test_bmp_decode(bottom_up):
    img = _gradient(5, 3, 3)  # width 5 -> 15-byte rows pad to 16
    out = decode_bmp(_bmp_24(img, bottom_up))
    assert out.pixels == img.pixels


# ------------------------------------------------------- transforms


def test_resize_nearest_downsample_picks_expected_sources():
    img = _gradient(4, 4, 3)
    out = resize_nearest(img, 2, 2)
    # src index = (dst * 4) // 2 -> 0 and 2
    assert out.pixel(0, 0) == img.pixel(0, 0)
    assert out.pixel(1, 0) == img.pixel(2, 0)
    assert out.pixel(0, 1) == img.pixel(0, 2)
    assert out.pixel(1, 1) == img.pixel(2, 2)


def test_resize_nearest_upsample_and_identity():
    img = _gradient(3, 2, 1)
    assert resize_nearest(img, 3, 2).pixels == img.pixels
    up = resize_nearest(img, 6, 4)
    assert (up.width, up.height) == (6, 4)
    assert up.pixel(5, 3) == img.pixel(2, 1)


def test_luma_stats_gray_and_rgb():
    gray = Image(2, 1, 1, bytes([10, 250]))
    assert luma_stats(gray) == (10, 250, 130)
    rgb = Image(1, 1, 3, bytes([255, 0, 0]))
    lo, hi, mean = luma_stats(rgb)
    assert lo == hi == mean == (299 * 255) // 1000


# ----------------------------------------- multimodal kernel wiring


def test_decode_image_sniffs_formats():
    img = _gradient(4, 4, 3)
    assert decode_image(encode_png(img)).pixels == img.pixels
    assert decode_image(encode_ppm(img)).pixels == img.pixels
    assert decode_image(_bmp_24(img)).pixels == img.pixels
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0JFIF")
    with pytest.raises(ValueError):
        decode_image(b"garbage")


def test_resize_image_bytes_contract():
    img = _gradient(8, 6, 3)
    out = decode_png(resize_image(encode_png(img), 4, 3))
    assert (out.width, out.height) == (4, 3)
    assert out.pixel(0, 0) == img.pixel(0, 0)
    assert out.pixel(3, 2) == img.pixel(6, 4)


def test_real_kernel_through_mapinpandas(spark):
    """End-to-end: binary PNG payloads through the REAL decode kernel
    inside mapInPandas -- the production shape multimodal_feature_
    extract runs with its fixture metadata, now with actual pixels."""
    import pandas as pd

    rows = []
    for i in range(6):
        img = _gradient(4 + i, 3 + i, 3)
        rows.append((i, bytearray(encode_png(img)), img.width, img.height))
    df = spark.createDataFrame(
        [(i, bytes(p), w, h) for i, p, w, h in rows],
        "doc_id long, payload binary, true_w int, true_h int",
    )

    def extract(batches):
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                im = decode_image(bytes(payload))
                lo, hi, mean = luma_stats(im)
                out.append((int(doc_id), im.width, im.height, mean))
            yield pd.DataFrame(
                out, columns=["doc_id", "width", "height", "mean_luma"]
            )

    got = {
        r.doc_id: r
        for r in df.mapInPandas(
            extract, "doc_id long, width int, height int, mean_luma int"
        ).collect()
    }
    assert len(got) == 6
    for i, _p, w, h in rows:
        assert (got[i].width, got[i].height) == (w, h)
        assert 0 <= got[i].mean_luma <= 255


# ------------------------------------------------------------- GIF


def _pal_img(w, h, colors):
    px = bytearray()
    for i in range(w * h):
        px += bytes(colors[i % len(colors)])
    return Image(w, h, 3, bytes(px))


def test_gif_roundtrip_small_and_large():
    from rippled_historical_database_spark.functions.imaging import (
        decode_gif,
        encode_gif,
    )

    img = _pal_img(4, 3, [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)])
    assert decode_gif(encode_gif(img)) == img
    # >255-byte LZW stream (multiple sub-blocks) + periodic CLEAR codes
    colors = [(i, 255 - i, (i * 7) % 256) for i in range(0, 256, 16)]
    big = _pal_img(64, 48, colors)
    assert decode_gif(encode_gif(big)) == big


def test_gif_encode_explicit_palette_contract():
    """Caller-supplied palettes follow the decode side's ValueError
    contract (r13 ADVICE): color coverage, <=256 entries, 3-byte
    alignment -- never a raw KeyError or a corrupt >8-bit GCT field."""
    import pytest

    from rippled_historical_database_spark.functions.imaging import (
        decode_gif,
        encode_gif,
    )

    img = _pal_img(4, 3, [(255, 0, 0), (0, 255, 0)])
    pal = bytes((255, 0, 0, 0, 255, 0))
    assert decode_gif(encode_gif(img, palette=pal)) == img
    with pytest.raises(ValueError, match="absent from palette"):
        encode_gif(img, palette=bytes((255, 0, 0, 1, 1, 1)))
    with pytest.raises(ValueError, match="exceeds 256"):
        encode_gif(img, palette=bytes(257 * 3))
    with pytest.raises(ValueError, match="multiple of 3"):
        encode_gif(img, palette=pal + b"\x00")


def test_gif_real_lzw_dictionary_growth_path():
    """Hand-packed stream exercising the code == len(table) LZW case
    (prev + prev[0]) that a real compressor emits but the fixture
    encoder's literal stream never does: pixels [1, 1, 1] as codes
    CLEAR, 1, 6, END at width 3."""
    import struct as _struct

    from rippled_historical_database_spark.functions.imaging import decode_gif

    codes = [(4, 3), (1, 3), (6, 3), (5, 3)]
    acc = nbits = 0
    stream = bytearray()
    for code, width in codes:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        stream.append(acc & 0xFF)
    palette = bytes(
        v for i in range(4) for v in (i * 10, i * 20, i * 30)
    )
    data = (
        b"GIF89a"
        + _struct.pack("<HHBBB", 3, 1, 0x80 | 1, 0, 0)   # GCT, 4 colors
        + palette
        + b"\x2c" + _struct.pack("<HHHHB", 0, 0, 3, 1, 0)
        + bytes([2])                                       # min code size
        + bytes([len(stream)]) + bytes(stream) + b"\x00"
        + b"\x3b"
    )
    im = decode_gif(data)
    assert (im.width, im.height) == (3, 1)
    assert im.pixels == bytes((10, 20, 30)) * 3            # palette[1] x3


def test_gif_interlaced_rows_reorder():
    """Interlaced frame: rows arrive in 8/8/4/2 pass order; an 8-row
    single-column image with row-index palette colors must come back in
    display order."""
    import struct as _struct

    from rippled_historical_database_spark.functions.imaging import (
        decode_gif,
        encode_gif,
    )

    colors = [(i * 8, 0, 255 - i * 8) for i in range(8)]
    img = _pal_img(1, 8, colors)   # row y shows colors[y % 8] == colors[y]
    plain = encode_gif(img)
    # flip the interlace bit in the image descriptor and reorder the
    # pixel stream into pass order (rows 0,4,2,6,1,3,5,7)
    data = bytearray(plain)
    # image descriptor: after 13-byte header + 3*8 GCT (encoder pads to
    # 8 entries for 8 colors)
    gct_len = 3 * 8
    desc_at = 13 + gct_len
    assert data[desc_at] == 0x2C
    data[desc_at + 9] |= 0x40
    order = [0, 4, 2, 6, 1, 3, 5, 7]
    # re-encode pixel indices in pass order via the fixture encoder on a
    # reordered image, then splice its LZW section in
    reordered = Image(1, 8, 3, b"".join(bytes(colors[y]) for y in order))
    donor = bytearray(encode_gif(reordered))
    lzw_at = desc_at + 10
    data[lzw_at:] = donor[lzw_at:]
    data[desc_at + 9] |= 0x40
    out = decode_gif(bytes(data))
    assert out == img


def test_gif_error_contract():
    from rippled_historical_database_spark.functions.imaging import (
        decode_gif,
        encode_gif,
    )

    good = encode_gif(_pal_img(3, 3, [(1, 2, 3), (4, 5, 6)]))
    with pytest.raises(ValueError):
        decode_gif(b"nope" + good)
    with pytest.raises(ValueError):
        decode_gif(good[:15])                    # truncated GCT
    with pytest.raises(ValueError):
        decode_gif(good[:-10])                   # truncated LZW stream
    # trailer with no frame
    with pytest.raises(ValueError):
        decode_gif(good[:13 + 3 * 4] + b"\x3b")


def test_decode_image_sniffs_gif():
    from rippled_historical_database_spark.functions.imaging import encode_gif
    from rippled_historical_database_spark.operators.multimodal import (
        decode_image,
    )

    img = _pal_img(5, 4, [(0, 0, 0), (255, 255, 255)])
    assert decode_image(encode_gif(img)) == img
