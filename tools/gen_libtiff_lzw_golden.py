#!/usr/bin/env python
"""Generate the vendored libtiff-LZW interop goldens (r8 ADVICE: the
table-full boundary and early-change interop against real libtiff
output were unverified — and indeed the first golden exposed that the
in-repo early-change point was off by one vs libtiff):

- tests/data/ext_lzw_libtiff_noise.tif — incompressible xorshift bytes:
  libtiff's periodic compression-ratio check fires, so the stream
  carries MID-STREAM Clears at arbitrary table sizes/widths.
- tests/data/ext_lzw_libtiff_lowent.tif — 16-value alphabet (xorshift
  & 0xF scaled): compresses well, so the string table grows through
  every code-width bump (9->10->11->12) to the 4094-entry table-full
  forced Clear.

Pixels are fixed xorshift32 streams (same recipe re-derived by
tests/test_tiff.py).  Run once from the repo root (requires
libtiff.so.6, present in the build container); the outputs are
committed, the tests only READ them.
"""
from __future__ import annotations

import ctypes
import os
import sys

W, H = 128, 160


def xorshift_bytes(n: int, low_entropy: bool) -> bytes:
    # xorshift32, seeded 0x9E3779B9 — duplicated in tests/test_tiff.py
    x = 0x9E3779B9
    out = bytearray()
    for _ in range(n):
        x ^= (x << 13) & 0xFFFFFFFF
        x ^= x >> 17
        x ^= (x << 5) & 0xFFFFFFFF
        out.append((x & 0xF) * 17 if low_entropy else x & 0xFF)
    return bytes(out)


def write_lzw_gray(path: str, px: bytes, w: int, h: int,
                   tile: tuple | None = None) -> None:
    lib = ctypes.CDLL("libtiff.so.6")
    lib.TIFFOpen.restype = ctypes.c_void_p
    lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    tif = lib.TIFFOpen(path.encode(), b"w")
    assert tif, "TIFFOpen failed"
    setf = lib.TIFFSetField
    setf.restype = ctypes.c_int
    t = ctypes.c_void_p(tif)
    assert setf(t, 256, ctypes.c_uint32(w))       # ImageWidth
    assert setf(t, 257, ctypes.c_uint32(h))       # ImageLength
    assert setf(t, 258, ctypes.c_int(8))          # BitsPerSample
    assert setf(t, 277, ctypes.c_int(1))          # SamplesPerPixel
    if tile is None:
        assert setf(t, 278, ctypes.c_uint32(h))   # RowsPerStrip: one strip
    else:
        assert setf(t, 322, ctypes.c_uint32(tile[0]))  # TileWidth
        assert setf(t, 323, ctypes.c_uint32(tile[1]))  # TileLength
    assert setf(t, 259, ctypes.c_int(5))          # Compression: LZW
    assert setf(t, 262, ctypes.c_int(1))          # Photometric: min-is-black
    assert setf(t, 284, ctypes.c_int(1))          # PlanarConfig: contig
    if tile is None:
        buf = ctypes.create_string_buffer(px, len(px))
        lib.TIFFWriteEncodedStrip.restype = ctypes.c_ssize_t
        n = lib.TIFFWriteEncodedStrip(t, 0, buf, ctypes.c_ssize_t(len(px)))
        assert n == len(px), n
    else:
        tw, tl = tile
        lib.TIFFWriteTile.restype = ctypes.c_ssize_t
        for y0 in range(0, h, tl):
            for x0 in range(0, w, tw):
                block = bytearray(tw * tl)
                for r in range(min(tl, h - y0)):
                    row = px[(y0 + r) * w + x0 : (y0 + r) * w + x0 + min(tw, w - x0)]
                    block[r * tw : r * tw + len(row)] = row
                buf = ctypes.create_string_buffer(bytes(block), len(block))
                n = lib.TIFFWriteTile(t, buf, ctypes.c_uint32(x0),
                                      ctypes.c_uint32(y0), 0, 0)
                assert n > 0, (x0, y0, n)
    lib.TIFFClose(t)
    print(f"wrote {path} ({os.path.getsize(path)} bytes)", file=sys.stderr)


def write_lzw_rgb_planar(path: str, px: bytes, w: int, h: int,
                         tile: tuple | None = None) -> None:
    """RGB with PlanarConfiguration=2: LZW, one strip per plane — or,
    with ``tile``, plane-major tiles via TIFFWriteTile's sample arg.
    ``px`` is plane-major (R plane, G plane, B plane)."""
    lib = ctypes.CDLL("libtiff.so.6")
    lib.TIFFOpen.restype = ctypes.c_void_p
    lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    tif = lib.TIFFOpen(path.encode(), b"w")
    assert tif, "TIFFOpen failed"
    setf = lib.TIFFSetField
    setf.restype = ctypes.c_int
    t = ctypes.c_void_p(tif)
    assert setf(t, 256, ctypes.c_uint32(w))
    assert setf(t, 257, ctypes.c_uint32(h))
    assert setf(t, 258, ctypes.c_int(8))
    assert setf(t, 277, ctypes.c_int(3))          # SamplesPerPixel: RGB
    if tile is None:
        assert setf(t, 278, ctypes.c_uint32(h))   # one strip per plane
    else:
        assert setf(t, 322, ctypes.c_uint32(tile[0]))  # TileWidth
        assert setf(t, 323, ctypes.c_uint32(tile[1]))  # TileLength
    assert setf(t, 259, ctypes.c_int(5))          # LZW
    assert setf(t, 262, ctypes.c_int(2))          # Photometric: RGB
    assert setf(t, 284, ctypes.c_int(2))          # PlanarConfig: SEPARATE
    n = w * h
    if tile is None:
        lib.TIFFWriteEncodedStrip.restype = ctypes.c_ssize_t
        for p in range(3):
            buf = ctypes.create_string_buffer(px[p * n : (p + 1) * n], n)
            r = lib.TIFFWriteEncodedStrip(t, p, buf, ctypes.c_ssize_t(n))
            assert r == n, (p, r)
    else:
        tw, tl = tile
        lib.TIFFWriteTile.restype = ctypes.c_ssize_t
        for p in range(3):
            plane = px[p * n : (p + 1) * n]
            for y0 in range(0, h, tl):
                for x0 in range(0, w, tw):
                    block = bytearray(tw * tl)
                    for r in range(min(tl, h - y0)):
                        row = plane[(y0 + r) * w + x0
                                    : (y0 + r) * w + x0 + min(tw, w - x0)]
                        block[r * tw : r * tw + len(row)] = row
                    buf = ctypes.create_string_buffer(bytes(block), len(block))
                    got = lib.TIFFWriteTile(t, buf, ctypes.c_uint32(x0),
                                            ctypes.c_uint32(y0), 0,
                                            ctypes.c_uint16(p))
                    assert got > 0, (p, x0, y0, got)
    lib.TIFFClose(t)
    print(f"wrote {path} ({os.path.getsize(path)} bytes)", file=sys.stderr)


def write_lzw_bilevel_tiled(path: str, bits: bytes, w: int, h: int,
                            tile: tuple) -> None:
    """1-bit min-is-black tiled LZW: ``bits`` is one byte per pixel in
    {0, 1}; rows pack MSB-first to the TILE width per spec §15."""
    lib = ctypes.CDLL("libtiff.so.6")
    lib.TIFFOpen.restype = ctypes.c_void_p
    lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    tif = lib.TIFFOpen(path.encode(), b"w")
    assert tif, "TIFFOpen failed"
    setf = lib.TIFFSetField
    setf.restype = ctypes.c_int
    t = ctypes.c_void_p(tif)
    tw, tl = tile
    assert setf(t, 256, ctypes.c_uint32(w))
    assert setf(t, 257, ctypes.c_uint32(h))
    assert setf(t, 258, ctypes.c_int(1))          # BitsPerSample: 1
    assert setf(t, 277, ctypes.c_int(1))
    assert setf(t, 322, ctypes.c_uint32(tw))
    assert setf(t, 323, ctypes.c_uint32(tl))
    assert setf(t, 259, ctypes.c_int(5))          # LZW
    assert setf(t, 262, ctypes.c_int(1))          # min-is-black
    assert setf(t, 284, ctypes.c_int(1))
    lib.TIFFWriteTile.restype = ctypes.c_ssize_t
    stride = (tw + 7) // 8
    for y0 in range(0, h, tl):
        for x0 in range(0, w, tw):
            block = bytearray(stride * tl)
            for r in range(min(tl, h - y0)):
                for c in range(min(tw, w - x0)):
                    if bits[(y0 + r) * w + x0 + c]:
                        block[r * stride + (c >> 3)] |= 0x80 >> (c & 7)
            buf = ctypes.create_string_buffer(bytes(block), len(block))
            got = lib.TIFFWriteTile(t, buf, ctypes.c_uint32(x0),
                                    ctypes.c_uint32(y0), 0, 0)
            assert got > 0, (x0, y0, got)
    lib.TIFFClose(t)
    print(f"wrote {path} ({os.path.getsize(path)} bytes)", file=sys.stderr)


def main() -> None:
    data = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "data",
    )
    for name, low in (("noise", False), ("lowent", True)):
        write_lzw_gray(
            os.path.join(data, f"ext_lzw_libtiff_{name}.tif"),
            xorshift_bytes(W * H, low), W, H,
        )
    # tiled golden: low-entropy pixels, 48x32 tiles over a 128x160 image
    # (edge tiles padded by libtiff) — pins the tiled walk, per-tile LZW,
    # and edge clipping against the reference implementation
    write_lzw_gray(
        os.path.join(data, "ext_lzw_libtiff_tiled.tif"),
        xorshift_bytes(W * H, True), W, H, tile=(48, 32),
    )
    # planar golden: RGB PlanarConfiguration=2 (one LZW strip per plane)
    write_lzw_rgb_planar(
        os.path.join(data, "ext_lzw_libtiff_planar.tif"),
        xorshift_bytes(3 * W * H, True), W, H,
    )
    # planar + TILED golden (round 10): plane-major 48x32 tiles —
    # the combination previously refused
    write_lzw_rgb_planar(
        os.path.join(data, "ext_lzw_libtiff_planar_tiled.tif"),
        xorshift_bytes(3 * W * H, True), W, H, tile=(48, 32),
    )
    # sub-byte (1-bit) TILED golden (round 10): derived from the same
    # xorshift stream, thresholded at 128
    write_lzw_bilevel_tiled(
        os.path.join(data, "ext_lzw_libtiff_bilevel_tiled.tif"),
        bytes(1 if v >= 128 else 0 for v in xorshift_bytes(W * H, True)),
        W, H, tile=(48, 32),
    )


if __name__ == "__main__":
    main()
