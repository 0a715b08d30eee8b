"""Pure-Python image codecs for the multimodal decode kernel.

The container has no PIL/ffmpeg, but that never made DECODE itself
out of reach -- PNG is zlib (stdlib) + per-scanline unfiltering, and
PPM/BMP are raw pixel layouts.  This module implements the three
formats a deterministic pipeline fixture actually needs, end to end:

  * PNG  -- 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
            6 (RGBA), non-interlaced; all five scanline filters
            (None/Sub/Up/Average/Paeth, RFC 2083 §6).  Plus an encoder
            (filter 0) so tests and fixtures can round-trip without
            any external tool.
  * PPM  -- binary P6 (RGB) and P5 (gray), maxval 255.
  * BMP  -- uncompressed 24-bit BI_RGB, bottom-up or top-down.
  * GIF  -- 87a/89a first frame: full GIF-variant LZW (variable-width
            codes to 12 bits, CLEAR/END), global/local palettes,
            interlace; validated against real-encoder files.  Plus a
            fixture encoder (fixed-width literal LZW).

JPEG stays out of scope (a DCT entropy decoder is real signal-
processing code, not plumbing) -- ``decode_image`` raises for it with
a clear message.  Everything here is integer arithmetic on ``bytes``:
deterministic, dependency-free, executor-safe inside Arrow-batched
UDFs.

Public knowledge throughout: PNG per RFC 2083 / the W3C PNG spec,
GIF per the public CompuServe 89a spec, BMP/PPM per their
widely-published layouts.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


@dataclass(frozen=True)
class Image:
    """Decoded raster: row-major, interleaved channels, 8 bits each."""

    width: int
    height: int
    channels: int  # 1=gray, 2=gray+alpha, 3=RGB, 4=RGBA
    pixels: bytes  # len == width * height * channels

    def pixel(self, x: int, y: int) -> tuple[int, ...]:
        i = (y * self.width + x) * self.channels
        return tuple(self.pixels[i : i + self.channels])


# ------------------------------------------------------------------ PNG


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> Image:
    """Raises ValueError for malformed payloads (including truncated
    chunks / corrupt zlib streams -- the module's whole error contract
    is ValueError + NotImplementedError, so UDF-side quarantines can
    catch exactly those two), NotImplementedError for out-of-scope
    PNG variants."""
    try:
        return _decode_png(data)
    except (zlib.error, struct.error) as e:
        raise ValueError(f"corrupt PNG payload: {e}") from e


def _decode_png(data: bytes) -> Image:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, width = 8, None
    height = bit_depth = color_type = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard PNG compression/filter method")
            if interlace != 0:
                raise NotImplementedError("interlaced (Adam7) PNG")
            if bit_depth != 8:
                raise NotImplementedError(f"PNG bit depth {bit_depth}")
            if color_type == 3:
                raise NotImplementedError("palette PNG")
            if color_type not in _CHANNELS:
                raise ValueError(f"bad PNG color type {color_type}")
            if width <= 0 or height <= 0:
                raise ValueError(f"bad PNG dimensions {width}x{height}")
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    ch = _CHANNELS[color_type]
    stride = width * ch
    expected = (stride + 1) * height
    # Bounded inflate: IHDR already fixed the exact output size, so cap
    # decompression at expected+1 bytes (the +1 detects overflow).  An
    # unbounded zlib.decompress here would let a tiny hostile payload
    # that inflates to gigabytes (zip bomb) OOM the executor inside the
    # Arrow-batched UDF path this module is used from.
    d = zlib.decompressobj()
    raw = d.decompress(bytes(idat), expected + 1)
    if len(raw) != expected or d.unconsumed_tail or not d.eof:
        raise ValueError("PNG pixel data length mismatch")
    out = bytearray(stride * height)
    prev_start = -1
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        o = y * stride
        if f == 0:  # None
            out[o : o + stride] = line
        elif f == 1:  # Sub
            for i in range(stride):
                left = out[o + i - ch] if i >= ch else 0
                out[o + i] = (line[i] + left) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                up = out[prev_start + i] if y else 0
                out[o + i] = (line[i] + up) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = out[o + i - ch] if i >= ch else 0
                up = out[prev_start + i] if y else 0
                out[o + i] = (line[i] + ((left + up) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                left = out[o + i - ch] if i >= ch else 0
                up = out[prev_start + i] if y else 0
                ul = out[prev_start + i - ch] if (y and i >= ch) else 0
                out[o + i] = (line[i] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter byte {f}")
        prev_start = o
    return Image(width, height, ch, bytes(out))


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(img: Image) -> bytes:
    """Minimal encoder (filter 0 on every scanline) -- for fixtures and
    the resize kernel's bytes->bytes contract; decodable by anything."""
    try:
        color_type = {1: 0, 2: 4, 3: 2, 4: 6}[img.channels]
    except KeyError:
        raise ValueError(f"PNG is 1/2/3/4 channels, got {img.channels}") from None
    ihdr = struct.pack(
        ">IIBBBBB", img.width, img.height, 8, color_type, 0, 0, 0
    )
    stride = img.width * img.channels
    raw = b"".join(
        b"\x00" + img.pixels[y * stride : (y + 1) * stride]
        for y in range(img.height)
    )
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 9))
        + _chunk(b"IEND", b"")
    )


# ------------------------------------------------------------------ PPM


def decode_ppm(data: bytes) -> Image:
    """Error contract mirrors decode_png: ValueError for malformed
    payloads (truncated headers included), NotImplementedError only for
    documented out-of-scope variants."""
    try:
        return _decode_ppm(data)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt PPM payload: {e}") from e


def _decode_ppm(data: bytes) -> Image:
    magic = data[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM (P6/P5)")
    # header: magic, width, height, maxval -- whitespace separated,
    # '#' comments allowed between tokens.
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = tokens
    if width <= 0 or height <= 0:
        raise ValueError(f"bad PPM dimensions {width}x{height}")
    if maxval != 255:
        raise NotImplementedError(f"PPM maxval {maxval}")
    ch = 3 if magic == b"P6" else 1
    n = width * height * ch
    pix = data[pos : pos + n]
    if len(pix) != n:
        raise ValueError("PPM pixel data length mismatch")
    return Image(width, height, ch, pix)


def encode_ppm(img: Image) -> bytes:
    if img.channels not in (1, 3):
        raise ValueError("PPM is gray or RGB only")
    magic = b"P6" if img.channels == 3 else b"P5"
    return magic + f"\n{img.width} {img.height}\n255\n".encode() + img.pixels


# ------------------------------------------------------------------ BMP


def decode_bmp(data: bytes) -> Image:
    """Error contract mirrors decode_png: ValueError for malformed
    payloads (a header shorter than 34 bytes would otherwise surface
    as struct.error and crash UDF quarantines that catch ValueError)."""
    try:
        return _decode_bmp(data)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt BMP payload: {e}") from e


def _decode_bmp(data: bytes) -> Image:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (pix_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise NotImplementedError("BMP core-header variant")
    width, height = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
    bottom_up = height > 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise ValueError(f"bad BMP dimensions {width}x{height}")
    row_bytes = (width * 3 + 3) & ~3  # rows pad to 4 bytes
    out = bytearray(width * height * 3)
    for y in range(height):
        src_y = (height - 1 - y) if bottom_up else y
        row = data[pix_off + src_y * row_bytes :][: width * 3]
        o = y * width * 3
        for x in range(width):
            b, g, r = row[x * 3 : x * 3 + 3]
            out[o + x * 3 : o + x * 3 + 3] = bytes((r, g, b))
    return Image(width, height, 3, bytes(out))


# ------------------------------------------------------------ transforms


def resize_nearest(img: Image, out_w: int, out_h: int) -> Image:
    """Nearest-neighbor resize, integer-exact source mapping
    (src = (dst * src_dim) // out_dim) -- deterministic on any host."""
    if out_w <= 0 or out_h <= 0:
        raise ValueError("resize target must be positive")
    if img.width <= 0 or img.height <= 0:
        raise ValueError("resize source has no pixels")
    ch = img.channels
    src, w = img.pixels, img.width
    out = bytearray(out_w * out_h * ch)
    for y in range(out_h):
        sy = (y * img.height) // out_h
        row_off = sy * w
        o = y * out_w * ch
        for x in range(out_w):
            sx = (x * w) // out_w
            i = (row_off + sx) * ch
            out[o + x * ch : o + (x + 1) * ch] = src[i : i + ch]
    return Image(out_w, out_h, ch, bytes(out))


def luma_stats(img: Image) -> tuple[int, int, int]:
    """(min, max, mean) of integer ITU-R 601 luma -- the
    feature-extract kernel's scalar summary.  Gray images use the
    gray channel directly; alpha is ignored."""
    ch = img.channels
    px = img.pixels
    n = img.width * img.height
    if n <= 0:
        return 0, 0, 0
    lo, hi, total = 255, 0, 0
    for i in range(n):
        j = i * ch
        if ch >= 3:
            y = (299 * px[j] + 587 * px[j + 1] + 114 * px[j + 2]) // 1000
        else:
            y = px[j]
        if y < lo:
            lo = y
        if y > hi:
            hi = y
        total += y
    return lo, hi, total // n


# ------------------------------------------------------------------ GIF

# GIF87a/89a (the public CompuServe spec): palette-indexed pixels under
# GIF-variant LZW -- variable-width codes (LSB-first bit packing),
# CLEAR/END control codes, 12-bit ceiling.  Like PNG, this is container
# plumbing + a dictionary coder, not signal processing, so it belongs
# in the kernel; animation COMPOSITION (frame disposal, timing) is a
# player concern and stays out of scope -- the decoder returns the
# first image frame.  The encoder writes the classic fixed-width
# "literals + frequent CLEAR" stream so fixtures round-trip without
# implementing a compressor.


def decode_gif(data: bytes) -> Image:
    """First frame of a GIF87a/89a as an RGB Image.  ValueError for
    malformed payloads, NotImplementedError only for a frame without
    any palette (spec-legal but undisplayable)."""
    try:
        return _decode_gif(data)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt GIF payload: {e}") from e


def _lzw_decode(min_code: int, data: bytes, expected: int) -> bytearray:
    """GIF LZW: grows code width from min_code+1 up to 12 bits, resets
    on CLEAR.  Output is bounded by ``expected`` indices -- a hostile
    stream cannot inflate past the frame size (the GIF analog of
    decode_png's bounded inflate)."""
    if not 2 <= min_code <= 11:
        raise ValueError(f"bad LZW minimum code size {min_code}")
    clear = 1 << min_code
    end = clear + 1
    out = bytearray()
    # bit reader state
    acc = 0
    nbits = 0
    pos = 0
    width = min_code + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None

    def read_code() -> int | None:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                return None
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    while True:
        code = read_code()
        if code is None:
            # missing END terminator: tolerate (many writers do) if we
            # already produced the full frame
            if len(out) >= expected:
                break
            raise ValueError("LZW stream truncated")
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("LZW first code not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW code beyond table")
        out += entry
        if len(out) > expected:
            raise ValueError("LZW output exceeds frame size")
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < expected:
        raise ValueError("GIF pixel data length mismatch")
    return out


def _decode_gif(data: bytes) -> Image:
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    _sw, _sh, packed, _bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct: bytes | None = None
    if packed & 0x80:
        n = 3 * (2 << (packed & 0x07))
        gct = data[pos : pos + n]
        if len(gct) != n:
            raise ValueError("global color table truncated")
        pos += n

    def skip_subblocks(p: int) -> int:
        while True:
            if p >= len(data):
                raise ValueError("sub-blocks truncated")
            ln = data[p]
            p += 1 + ln
            if ln == 0:
                return p

    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            raise ValueError("GIF has no image frame")
        if block == 0x21:  # extension: label + sub-blocks
            pos = skip_subblocks(pos + 1)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        _l, _t, w, h, ipacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        if w <= 0 or h <= 0:
            raise ValueError(f"bad GIF frame dimensions {w}x{h}")
        pal = gct
        if ipacked & 0x80:
            n = 3 * (2 << (ipacked & 0x07))
            pal = data[pos : pos + n]
            if len(pal) != n:
                raise ValueError("local color table truncated")
            pos += n
        if pal is None:
            raise NotImplementedError("GIF frame without any color table")
        min_code = data[pos]
        pos += 1
        lzw = bytearray()
        while True:
            ln = data[pos]
            pos += 1
            if ln == 0:
                break
            chunk = data[pos : pos + ln]
            if len(chunk) != ln:
                raise ValueError("image sub-block truncated")
            lzw += chunk
            pos += ln
        idx = _lzw_decode(min_code, bytes(lzw), w * h)
        if ipacked & 0x40:  # interlaced: 4-pass row order
            rows = []
            for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                rows.extend(range(start, h, step))
            deint = bytearray(w * h)
            for src_row, dst_row in enumerate(rows):
                deint[dst_row * w : (dst_row + 1) * w] = idx[
                    src_row * w : (src_row + 1) * w
                ]
            idx = deint
        n_colors = len(pal) // 3
        out = bytearray(w * h * 3)
        for i, c in enumerate(idx):
            if c >= n_colors:
                raise ValueError(f"palette index {c} of {n_colors}")
            out[i * 3 : i * 3 + 3] = pal[c * 3 : c * 3 + 3]
        return Image(w, h, 3, bytes(out))
    raise ValueError("GIF ended without an image frame")


def encode_gif(img: Image, palette: bytes | None = None) -> bytes:
    """Minimal GIF89a writer for fixtures: RGB pixels are mapped
    through (or build) a palette, and the LZW stream is the classic
    fixed-width form -- all literal codes with a CLEAR every
    2^min - 2 pixels, so the code width never grows.  Decodable by
    anything that reads GIF."""
    if img.channels != 3:
        raise ValueError("GIF encoder takes RGB images")
    if palette is None:
        seen: dict[bytes, int] = {}
        for i in range(img.width * img.height):
            seen.setdefault(img.pixels[i * 3 : i * 3 + 3], len(seen))
        if len(seen) > 256:
            raise ValueError("more than 256 distinct colors")
        palette = b"".join(sorted(seen))
    else:
        # caller-supplied palettes get the same ValueError contract as
        # the decode side (r13 ADVICE): a GIF global color table holds
        # at most 256 entries, and every pixel must resolve through it
        # -- otherwise the KeyError below (or a >3-bit GCT size field)
        # would leak out as a raw crash / corrupt header.
        if len(palette) % 3:
            raise ValueError("palette length must be a multiple of 3")
        if len(palette) > 256 * 3:
            raise ValueError("palette exceeds 256 colors")
        colors = {
            palette[i * 3 : i * 3 + 3] for i in range(len(palette) // 3)
        }
        missing = {
            bytes(img.pixels[i * 3 : i * 3 + 3])
            for i in range(img.width * img.height)
        } - colors
        if missing:
            raise ValueError(
                f"{len(missing)} pixel color(s) absent from palette, "
                f"e.g. {sorted(missing)[0].hex()}"
            )
    n_colors = len(palette) // 3
    # palette size must be a power of two >= 4 (min code size >= 2)
    size_bits = 2
    while (1 << size_bits) < n_colors:
        size_bits += 1
    palette = palette + b"\x00" * (3 * ((1 << size_bits) - n_colors))
    lut = {palette[i * 3 : i * 3 + 3]: i for i in range(1 << size_bits)}
    indices = bytes(
        lut[img.pixels[i * 3 : i * 3 + 3]]
        for i in range(img.width * img.height)
    )
    min_code = size_bits
    clear, end = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    # pack codes LSB-first: CLEAR, then literals with periodic CLEAR
    acc = 0
    nbits = 0
    stream = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    budget = (1 << min_code) - 2
    since_clear = 0
    for c in indices:
        if since_clear == budget:
            emit(clear)
            since_clear = 0
        emit(c)
        since_clear += 1
    emit(end)
    if nbits:
        stream.append(acc & 0xFF)
    sub = bytearray()
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        sub += bytes([len(chunk)]) + chunk
    sub += b"\x00"
    header = b"GIF89a" + struct.pack(
        "<HHBBB", img.width, img.height, 0x80 | (size_bits - 1), 0, 0
    ) + palette
    desc = b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, img.width, img.height, 0
    ) + bytes([min_code])
    return header + desc + bytes(sub) + b"\x3b"
