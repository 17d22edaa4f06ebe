"""GIF decoder (GIF87a/GIF89a) in pure stdlib + numpy — no codec libs.

Written from the public GIF89a specification the way jpeg.py was written
from T.81 and the PNG decoder from RFC 2083: LZW decompression with
variable code width (LSB-first packing, CLEAR/EOI codes, 12-bit cap),
global and local color tables, interlaced row ordering, extension blocks
skipped (a multi-frame/animated GIF decodes its FIRST frame — the right
unit for pixel-stats features; transparency is ignored since the output
is opaque RGB).

Hostile-input posture matches the other decoders: the logical-screen /
frame dimensions are capped before allocation (≤ _MAX_DECODED_BYTES
decoded), and LZW output stops at the frame's declared pixel count, so a
looping or over-long code stream cannot balloon memory or CPU — work is
bounded by min(stored bytes × 8 / code_width, declared pixels) dictionary
steps.  Malformed structure raises ValueError.

``encode_gif`` (the test fixture) emits valid LZW the simple way: literal
root codes with a CLEAR every 254 outputs, which keeps the code width
fixed — small and obviously correct over compact, like the other encode_*
fixtures.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_DECODED_BYTES = 16 * 1024 * 1024


def decode_gif(b: bytes) -> np.ndarray:
    """Decode the first frame of a GIF to an (h, w, 3) uint8 RGB array."""
    try:
        return _decode_gif(bytes(b))
    except (KeyError, IndexError, StopIteration, struct.error) as e:
        raise ValueError(f"corrupt GIF: {type(e).__name__}") from e


def _decode_gif(b: bytes) -> np.ndarray:
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, bg, _ar = struct.unpack("<HHBBB", b[6:13])
    i = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(b[i : i + 3 * n], dtype=np.uint8).reshape(n, 3)
        if len(gct) != n:
            raise ValueError("truncated GIF color table")
        i += 3 * n
    while i < len(b):
        block = b[i]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, all skipped
            i += 2
            while i < len(b) and b[i] != 0:
                i += 1 + b[i]
            i += 1
            continue
        if block != 0x2C:
            raise ValueError(f"corrupt GIF: unexpected block 0x{block:02x}")
        # image descriptor
        _left, _top, w, h, iflags = struct.unpack("<HHHHB", b[i + 1 : i + 10])
        i += 10
        if w == 0 or h == 0:
            raise ValueError("corrupt GIF: zero dimension")
        if w * h * 3 > _MAX_DECODED_BYTES:
            raise ValueError(
                f"GIF dimensions {w}x{h} exceed the "
                f"{_MAX_DECODED_BYTES >> 20} MiB decode cap"
            )
        table = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            table = np.frombuffer(b[i : i + 3 * n], dtype=np.uint8).reshape(n, 3)
            i += 3 * n
        if table is None:
            raise ValueError("corrupt GIF: no color table for frame")
        min_code = b[i]
        i += 1
        if not (2 <= min_code <= 11):
            raise ValueError(f"corrupt GIF: LZW min code size {min_code}")
        # gather the frame's data sub-blocks
        data = bytearray()
        while i < len(b) and b[i] != 0:
            ln = b[i]
            data += b[i + 1 : i + 1 + ln]
            i += 1 + ln
        i += 1
        idx = _lzw_decode(bytes(data), min_code, w * h)
        if len(idx) < w * h:
            raise ValueError("corrupt GIF: LZW stream ended early")
        grid = np.asarray(idx[: w * h], dtype=np.int32).reshape(h, w)
        if int(grid.max()) >= len(table):
            raise ValueError("corrupt GIF: color index out of range")
        px = table[grid]
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            order = np.concatenate(
                [np.arange(0, h, 8), np.arange(4, h, 8),
                 np.arange(2, h, 4), np.arange(1, h, 2)]
            )
            out = np.empty_like(px)
            out[order] = px
            px = out
        return px  # first frame only
    raise ValueError("corrupt GIF: no image data")


def _lzw_decode(data: bytes, min_code: int, max_pixels: int) -> list[int]:
    """GIF-flavor LZW: LSB-first variable-width codes, dictionary grows
    to 12 bits then freezes until CLEAR.  Output stops at ``max_pixels``
    (the frame's declared size), bounding work and memory by the capped
    header dims regardless of the code stream."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1

    def reset():
        d = {c: (c,) for c in range(1 << min_code)}
        return d, min_code + 1, eoi + 1

    table, width, next_code = reset()
    out: list[int] = []
    acc = nbits = 0
    prev: tuple[int, ...] | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table, width, next_code = reset()
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = table[code]  # KeyError -> corrupt, caught above
            elif code < next_code:
                entry = table[code]
            elif code == next_code:
                entry = prev + (prev[0],)  # the KwKwK special case
            else:
                raise ValueError("corrupt GIF: LZW code out of sequence")
            out.extend(entry)
            if len(out) >= max_pixels:
                return out
            if prev is not None and next_code < 4096:
                table[next_code] = prev + (entry[0],)
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return out


def encode_gif(px: np.ndarray, palette: np.ndarray | None = None,
               interlace: bool = False) -> bytes:
    """Test-fixture GIF89a encoder: maps pixels to a palette (built from
    the image's unique colors unless given; ≤256 required) and emits
    8-bit literal LZW codes with a CLEAR every 254 outputs so the code
    width never grows — valid, simple, uncompressed-style LZW."""
    px = np.asarray(px, dtype=np.uint8)
    h, w = px.shape[:2]
    flat = px.reshape(-1, 3)
    if palette is None:
        palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    else:
        lut = {tuple(c): j for j, c in enumerate(palette)}
        inverse = np.array([lut[tuple(c)] for c in flat], dtype=np.int64)
    if len(palette) > 256:
        raise ValueError("encode_gif needs <= 256 unique colors")
    pal = np.zeros((256, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)  # GCT, 256 entries
    out += pal.tobytes()
    iflags = 0x40 if interlace else 0
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflags)
    idx = inverse.reshape(h, w)
    if interlace:
        order = np.concatenate(
            [np.arange(0, h, 8), np.arange(4, h, 8),
             np.arange(2, h, 4), np.arange(1, h, 2)]
        )
        idx = idx[order]
    seq = idx.reshape(-1)
    min_code = 8
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    acc = nbits = 0
    lzw = bytearray()

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            lzw.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    for j, v in enumerate(seq):
        if j and j % 254 == 0:
            emit(clear)  # keep the decoder's dictionary from growing
        emit(int(v))
    emit(eoi)
    if nbits:
        lzw.append(acc & 0xFF)
    out += bytes([min_code])
    for off in range(0, len(lzw), 255):
        chunk = lzw[off : off + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
