"""TIFF 6.0 baseline decoder (strip-organized) in pure stdlib + numpy.

Written from the public TIFF 6.0 specification (Adobe, June 1992) the
way gif.py was written from GIF89a and jpeg.py from T.81 — no codec
libs.  Surface:

- both byte orders (``II``/``MM``), first IFD (a multi-page TIFF
  decodes its FIRST image — the right unit for pixel-stats features);
- Compression 1 (none), 5 (LZW — MSB-first bit packing with TIFF's
  *early* code-width change, spec §13), 8 / 32946 (Deflate, stdlib
  zlib), 32773 (PackBits, spec §9);
- Predictor 2 (horizontal differencing, spec §14) for 8- and 16-bit
  samples;
- PhotometricInterpretation 0/1 (bilevel + grayscale, WhiteIsZero
  inverted), 2 (RGB with optional ExtraSamples alpha, dropped), 3
  (palette — 16-bit ColorMap scaled to 8);
- BitsPerSample 1/2/4/8/16 for single-channel images, uniform 8 or 16
  per channel for RGB(A); 16-bit samples are scaled to 8 (``>> 8``);
- BOTH PlanarConfigurations (1 chunky; 2 planar — one strip run per
  sample plane, prediction per plane, pinned against a real
  libtiff-written planar file), strip organization via
  StripOffsets / StripByteCounts / RowsPerStrip, TILED organization
  (spec §15: full padded edge tiles, per-tile compression with the
  predictor resetting at tile boundaries — round 9, pinned against a
  real libtiff-written tiled file; round 10 adds planar+tiled — a
  plane-major tile grid — and sub-byte single-channel tiles, both
  pinned against real libtiff-written files), and all eight
  Orientation transforms (spec §4, tag 274).

Honest refusals (NotImplementedError, same posture as the other
decoders — a fake decode would misreport pixel stats): sub-byte
MULTI-SAMPLE tiled images, CCITT G3/G4 and JPEG-in-TIFF compressions,
floating-point SampleFormat.

Hostile-input posture matches gif.py/webp.py: dimensions and strip
sizes are capped before allocation (≤ _MAX_DECODED_BYTES), LZW output
stops at the strip's declared byte count so a looping code stream
cannot balloon memory, and malformed structure raises ValueError.

``encode_tiff`` (the test fixture) writes uncompressed, PackBits,
Deflate, or real table-building LZW (exercising the decoder's
code-width bumps and early change), either byte order, optional
horizontal predictor, gray/palette/RGB(A) photometrics and sub-byte
bit depths — over compact, like the other encode_* fixtures.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAX_DECODED_BYTES = 16 * 1024 * 1024

# tag ids (TIFF 6.0 §8)
_T_WIDTH = 256
_T_HEIGHT = 257
_T_BPS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_ORIENTATION = 274
_T_SPP = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_PLANAR = 284
_T_PREDICTOR = 317
_T_COLORMAP = 320
_T_TILE_WIDTH = 322
_T_TILE_LENGTH = 323
_T_TILE_OFFSETS = 324
_T_TILE_COUNTS = 325


_T_EXTRA_SAMPLES = 338
_T_SAMPLE_FORMAT = 339


def _rows_to_pixels(
    arr: "np.ndarray", rows: int, wpix: int, spp: int, bps: int,
    bo: str, predictor: int,
) -> "np.ndarray":
    """(rows, row_stride) raw bytes -> (rows, wpix, spp) uint8 pixels:
    byte-order-aware 16-bit read (reduced to 8 after the predictor, which
    must run at the stored precision), horizontal differencing inverse
    per row, sub-byte unpack.  Shared by the strip path (one call over
    the whole image) and the tile path (one call per tile — prediction
    resets at tile boundaries)."""
    if bps == 16:
        dt = np.dtype(np.uint16).newbyteorder(bo)
        px16 = arr.reshape(rows, -1).view(np.uint8)[:, : wpix * spp * 2]
        px = np.ascontiguousarray(px16).view(dt).reshape(rows, wpix, spp).astype(np.uint16)
        if predictor == 2:
            px = np.cumsum(px, axis=1, dtype=np.uint32).astype(np.uint16)
        return (px >> 8).astype(np.uint8)
    if bps == 8:
        px = arr[:, : wpix * spp].reshape(rows, wpix, spp)
        if predictor == 2:
            px = np.cumsum(px, axis=1, dtype=np.uint32).astype(np.uint8)
        return px
    if predictor == 2:
        raise NotImplementedError("predictor on sub-byte samples not supported")
    bits = np.unpackbits(arr, axis=1)[:, : wpix * bps].reshape(rows, wpix, bps)
    weights = (1 << np.arange(bps - 1, -1, -1)).astype(np.uint16)
    return (bits * weights).sum(axis=2).astype(np.uint8).reshape(rows, wpix, 1)

# field-type byte sizes (type 0 is invalid; RATIONAL=2×LONG)
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}
_INT_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i"}


def decode_tiff(b: bytes) -> np.ndarray:
    """Decode the first IFD of a TIFF to an (h, w, 3) uint8 RGB array."""
    try:
        return _decode_tiff(bytes(b))
    except (KeyError, IndexError, struct.error, zlib.error) as e:
        raise ValueError(f"corrupt TIFF: {type(e).__name__}") from e


def tiff_native_ok(b: bytes) -> bool:
    """Cheap first-IFD probe: True iff this TIFF decodes BYTE-EXACTLY
    the same through the JVM ImageIO fast path (jvm_codecs.py) as
    through this spec decoder, so the sampled cross-check is meaningful.

    The gate is a strict SUBSET of this decoder's coverage — anything
    outside it stays on the spec path so fast-path availability never
    widens (or changes) decode behavior:
    - orientation 1 only: the JDK TIFF reader exposes tag 274 as
      metadata but does NOT transform pixels; this decoder does.
    - the four compressions this decoder implements (none/LZW/
      PackBits/Deflate) — JPEG-in-TIFF etc. must keep refusing.
    - unsigned integer samples at EXACTLY the depths this decoder
      accepts — 1/2/4/8/16 single-channel, uniform 8/16 multi-channel
      (round-10 review fix: "anything 1..16" let the JDK decode e.g.
      12-bit files the spec decoder refuses, so acceptance depended on
      JVM availability and the crc sample).
    - photometric gray/RGB only.  Palette (photometric 3) stays
      spec-side like palette PNG: the JDK scales 16-bit ColorMap
      entries as v*255/65535 while this decoder uses v>>8, so any
      colormap not of the v*257 form decodes off-by-one through the
      JVM (round-10 review fix — the byte-exact sweep missed it
      because encode_tiff writes v*257 colormaps).
    - planar+tiled routes native as of round 10 (the spec decoder now
      handles it; the JDK reader was swept byte-exact across
      compressions/orders/depths, and its one refusal — 16-bit +
      predictor — falls back to the spec decoder, which is always
      safe)."""
    try:
        if b[:4] == b"II*\x00":
            bo = "<"
        elif b[:4] == b"MM\x00*":
            bo = ">"
        else:
            return False
        tags = _read_ifd(b, bo, struct.unpack_from(bo + "I", b, 4)[0])
        # a mutated zero-count tag yields an empty value list; [0] on it
        # must mean "not routable", not an escaping IndexError
        bps_vals = tags.get(_T_BPS, [1])
        spp = tags.get(_T_SPP, [1])[0]
        return (
            tags.get(_T_ORIENTATION, [1])[0] == 1
            and tags.get(_T_COMPRESSION, [1])[0] in (1, 5, 8, 32773, 32946)
            and tags.get(_T_PHOTOMETRIC, [1])[0] in (0, 1, 2)
            and all(f == 1 for f in tags.get(_T_SAMPLE_FORMAT, [1]))
            and len(set(bps_vals)) == 1
            and bps_vals[0] in ((1, 2, 4, 8, 16) if spp == 1 else (8, 16))
        )
    except (ValueError, IndexError, struct.error):
        return False


def _read_ifd(b: bytes, bo: str, off: int) -> dict[int, list[int]]:
    """Read one IFD into {tag: [int values]} (rationals/floats skipped —
    none of the tags this decoder consumes use them)."""
    if off + 2 > len(b) or off < 8:
        raise ValueError("bad IFD offset")
    n = struct.unpack_from(bo + "H", b, off)[0]
    if n > 512:
        raise ValueError("implausible IFD entry count")
    tags: dict[int, list[int]] = {}
    for i in range(n):
        ent = off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(bo + "HHI", b, ent)
        if typ not in _TYPE_SIZES or typ not in _INT_FMT:
            continue  # rationals / floats / ascii: not consumed here
        total = _TYPE_SIZES[typ] * cnt
        if cnt > 1_000_000:
            raise ValueError("implausible tag count")
        if total <= 4:
            src = ent + 8
        else:
            src = struct.unpack_from(bo + "I", b, ent + 8)[0]
            if src + total > len(b):
                raise ValueError("tag value out of range")
        fmt = bo + _INT_FMT[typ] * cnt
        tags[tag] = list(struct.unpack_from(fmt, b, src))
    return tags


def _lzw_decode(data: bytes, max_out: int) -> bytes:
    """TIFF-variant LZW (spec §13): MSB-first bit packing, ClearCode=256,
    EOI=257, 12-bit cap, and the early code-width change — the decoder
    widens as soon as its table reaches (1 << width) - 1 entries, ONE
    entry before the code space is actually exhausted (a GIF-style
    decoder waits for (1 << width)).  This is libtiff's convention,
    pinned byte-exact against real libtiff-encoded strips in
    tests/data/ext_lzw_libtiff_*.tif — including mid-stream Clears that
    libtiff emits BOTH at the 4094-entry table-full boundary and, on
    poorly-compressing data, from its periodic compression-ratio check
    (so a Clear can arrive at ANY table size, at the current width)."""
    from streamsum_spark.operators._lzw import lzw_decode_tiff

    # decode via the shared vectorized core (_lzw.py): schedule-driven
    # numpy code extraction (the early change keeps widths a pure
    # function of table size) + output-slice emission; pinned against
    # the previous scalar decoder by a differential fuzz and the
    # vendored libtiff goldens
    return lzw_decode_tiff(data, max_out)


def _packbits_decode(data: bytes, max_out: int) -> bytes:
    """PackBits (spec §9): n in 0..127 copies n+1 literals, n in
    -127..-1 repeats the next byte 1-n times, -128 is a no-op."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < max_out:
        c = data[i]
        i += 1
        if c < 128:
            out += data[i : i + c + 1]
            i += c + 1
        elif c > 128:
            if i >= n:
                break
            out += data[i : i + 1] * (257 - c)
            i += 1
        # c == 128: no-op
    return bytes(out)


def _decode_tiff(b: bytes) -> np.ndarray:
    if b[:4] == b"II*\x00":
        bo = "<"
    elif b[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF")
    ifd_off = struct.unpack_from(bo + "I", b, 4)[0]
    tags = _read_ifd(b, bo, ifd_off)

    planar = tags.get(_T_PLANAR, [1])[0]
    if planar not in (1, 2):
        raise ValueError(f"corrupt TIFF: planar configuration {planar}")
    if any(f not in (1, 2) for f in tags.get(_T_SAMPLE_FORMAT, [1])):
        raise NotImplementedError("floating-point TIFF samples not supported")
    comp = tags.get(_T_COMPRESSION, [1])[0]
    if comp in (2, 3, 4):
        raise NotImplementedError("CCITT-compressed TIFF not supported")
    if comp in (6, 7):
        raise NotImplementedError("JPEG-in-TIFF not supported")
    if comp not in (1, 5, 8, 32773, 32946):
        raise ValueError(f"corrupt TIFF: unknown compression {comp}")

    w = tags[_T_WIDTH][0]
    h = tags[_T_HEIGHT][0]
    spp = tags.get(_T_SPP, [1])[0]
    bps_list = tags.get(_T_BPS, [1])
    if len(bps_list) < spp:
        bps_list = bps_list * spp
    photo = tags[_T_PHOTOMETRIC][0]
    if not (0 < w <= 65535 and 0 < h <= 65535) or w * h * spp * 2 > _MAX_DECODED_BYTES:
        raise ValueError("implausible TIFF dimensions")
    if spp not in (1, 2, 3, 4):
        raise ValueError(f"corrupt TIFF: {spp} samples per pixel")
    bps = bps_list[0]
    if any(x != bps for x in bps_list[:spp]):
        raise NotImplementedError("mixed per-channel bit depths not supported")
    if spp == 1:
        if bps not in (1, 2, 4, 8, 16):
            raise ValueError(f"corrupt TIFF: {bps}-bit samples")
    elif bps not in (8, 16):
        raise NotImplementedError(f"{bps}-bit multi-channel TIFF not supported")
    if photo not in (0, 1, 2, 3):
        raise NotImplementedError(f"photometric {photo} not supported")
    if photo == 3 and (_T_COLORMAP not in tags or spp != 1 or bps > 8):
        raise ValueError("corrupt TIFF: bad palette image")

    predictor = tags.get(_T_PREDICTOR, [1])[0]
    if predictor not in (1, 2):
        raise NotImplementedError(f"predictor {predictor} not supported")
    if predictor == 2 and comp not in (5, 8, 32946):
        # TIFF 6.0 defines the predictor for LZW (extended to Deflate);
        # on uncompressed/PackBits files both libtiff ("Unknown field
        # with tag 317" — predictor lives in the codec layer) and the
        # JDK TIFF reader IGNORE the tag.  Honoring it here made this
        # decoder the ecosystem outlier (caught by the JVM fast path's
        # sampled byte-exact cross-check, round 10) — ignore for parity.
        predictor = 1

    def decompress(chunk: bytes, want: int) -> bytes:
        if comp == 1:
            data = chunk
        elif comp == 5:
            data = _lzw_decode(chunk, want)
        elif comp == 32773:
            data = _packbits_decode(chunk, want)
        else:  # 8 / 32946 deflate
            data = zlib.decompress(chunk, bufsize=min(want, _MAX_DECODED_BYTES))
        if len(data) < want:
            data = data + b"\x00" * (want - len(data))
        return data[:want]

    if _T_TILE_WIDTH in tags or _T_TILE_LENGTH in tags:
        # tiled layout (spec §15): the image is a grid of tw x tl tiles,
        # each compressed independently and ALWAYS full-size (edge tiles
        # are padded by the encoder and clipped here).  The horizontal
        # predictor resets per tile row, so differencing must be undone
        # per tile BEFORE pasting — running it over assembled image rows
        # would leak deltas across tile boundaries.
        tw = tags.get(_T_TILE_WIDTH, [0])[0]
        tl = tags.get(_T_TILE_LENGTH, [0])[0]
        if tw <= 0 or tl <= 0:
            raise ValueError("corrupt TIFF: bad tile dimensions")
        if bps < 8 and spp != 1:
            raise NotImplementedError(
                "sub-byte multi-sample tiled TIFF not supported")
        across = (w + tw - 1) // tw
        down = (h + tl - 1) // tl
        if across * tw * down * tl * spp * 2 > _MAX_DECODED_BYTES:
            raise ValueError("implausible TIFF tile grid")
        # PlanarConfiguration 2 stores the tile grid once PER PLANE,
        # plane-major (spec §15 with §"Planar format"): each plane's
        # tile decodes as a single-channel tile
        n_planes = spp if planar == 2 and spp > 1 else 1
        nch_tile = 1 if n_planes > 1 else spp
        n_tiles = across * down
        offsets = tags.get(_T_TILE_OFFSETS)
        if offsets is None or len(offsets) < n_planes * n_tiles:
            raise ValueError("corrupt TIFF: missing tile offsets")
        tile_stride = (tw * nch_tile * bps + 7) // 8
        counts = tags.get(_T_TILE_COUNTS)
        if counts is None:
            if comp != 1:
                raise ValueError("corrupt TIFF: compressed tiles without byte counts")
            counts = [tile_stride * tl] * (n_planes * n_tiles)
        px = np.zeros((h, w, spp), dtype=np.uint8)
        for p in range(n_planes):
            for ty in range(down):
                for tx in range(across):
                    k = p * n_tiles + ty * across + tx
                    want = tile_stride * tl
                    off, cnt = offsets[k], counts[k]
                    if off + cnt > len(b) or cnt > _MAX_DECODED_BYTES:
                        raise ValueError("corrupt TIFF: tile out of range")
                    arr = np.frombuffer(
                        decompress(b[off : off + cnt], want), dtype=np.uint8
                    ).reshape(tl, tile_stride)
                    tpx = _rows_to_pixels(arr, tl, tw, nch_tile, bps, bo,
                                          predictor)
                    y0, x0 = ty * tl, tx * tw
                    ys, xs = min(tl, h - y0), min(tw, w - x0)
                    if n_planes > 1:
                        px[y0 : y0 + ys, x0 : x0 + xs, p] = tpx[:ys, :xs, 0]
                    else:
                        px[y0 : y0 + ys, x0 : x0 + xs] = tpx[:ys, :xs]
    elif planar == 2 and spp > 1:
        # PlanarConfiguration 2 (spec: "Planar format"): each sample
        # plane is stored as its OWN run of strips — all of plane 0's
        # strips, then plane 1's, ... (StripsPerImage strips per plane).
        # Each plane decodes exactly like a single-channel chunky image
        # (the predictor differences within the plane's rows), then the
        # planes stack into (h, w, spp).
        offsets = tags[_T_STRIP_OFFSETS]
        rows_per_strip = tags.get(_T_ROWS_PER_STRIP, [h])[0] or h
        rows_per_strip = min(rows_per_strip, h)
        n_strips = (h + rows_per_strip - 1) // rows_per_strip
        if len(offsets) < spp * n_strips:
            raise ValueError("corrupt TIFF: missing plane strip offsets")
        pstride = (w * bps + 7) // 8
        counts = tags.get(_T_STRIP_COUNTS)
        if counts is None:
            if comp != 1:
                raise ValueError("corrupt TIFF: compressed strips without byte counts")
            counts = [
                pstride * min(rows_per_strip, h - (i % n_strips) * rows_per_strip)
                for i in range(spp * n_strips)
            ]
        planes = []
        for p in range(spp):
            raw = bytearray()
            for s in range(n_strips):
                rows = min(rows_per_strip, h - s * rows_per_strip)
                k = p * n_strips + s
                off, cnt = offsets[k], counts[k]
                if off + cnt > len(b) or cnt > _MAX_DECODED_BYTES:
                    raise ValueError("corrupt TIFF: strip out of range")
                raw += decompress(b[off : off + cnt], pstride * rows)
            arr = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(h, pstride)
            planes.append(_rows_to_pixels(arr, h, w, 1, bps, bo, predictor)[:, :, 0])
        px = np.stack(planes, axis=2)
    else:
        offsets = tags[_T_STRIP_OFFSETS]
        rows_per_strip = tags.get(_T_ROWS_PER_STRIP, [h])[0] or h
        rows_per_strip = min(rows_per_strip, h)
        n_strips = (h + rows_per_strip - 1) // rows_per_strip
        if len(offsets) < n_strips:
            raise ValueError("corrupt TIFF: missing strip offsets")
        stride = (w * spp * bps + 7) // 8  # rows are byte-aligned (spec §3)
        counts = tags.get(_T_STRIP_COUNTS)
        if counts is None:
            if comp != 1:
                raise ValueError("corrupt TIFF: compressed strips without byte counts")
            counts = [stride * min(rows_per_strip, h - i * rows_per_strip) for i in range(n_strips)]

        raw = bytearray()
        for s in range(n_strips):
            rows = min(rows_per_strip, h - s * rows_per_strip)
            off, cnt = offsets[s], counts[s]
            if off + cnt > len(b) or cnt > _MAX_DECODED_BYTES:
                raise ValueError("corrupt TIFF: strip out of range")
            raw += decompress(b[off : off + cnt], stride * rows)

        arr = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(h, stride)
        px = _rows_to_pixels(arr, h, w, spp, bps, bo, predictor)

    if photo == 3:
        cmap = np.asarray(tags[_T_COLORMAP], dtype=np.uint32)
        n_pal = 1 << bps
        if len(cmap) < 3 * n_pal:
            raise ValueError("corrupt TIFF: short color map")
        pal = (cmap[: 3 * n_pal].reshape(3, n_pal).T >> 8).astype(np.uint8)
        rgb = pal[px[:, :, 0]]
    elif photo in (0, 1):
        g = px[:, :, 0]
        if bps < 8:  # scale e.g. 4-bit 0..15 to full range
            g = (g.astype(np.uint16) * 255 // ((1 << bps) - 1)).astype(np.uint8)
        if photo == 0:
            g = 255 - g
        rgb = np.repeat(g[:, :, None], 3, axis=2)
    else:  # RGB(A): ExtraSamples alpha dropped, like PNG/BMP
        if spp < 3:
            raise ValueError("corrupt TIFF: RGB image with <3 samples")
        rgb = px[:, :, :3]

    return _apply_orientation(np.ascontiguousarray(rgb), tags.get(_T_ORIENTATION, [1])[0])


def _apply_orientation(px: np.ndarray, o: int) -> np.ndarray:
    """Tag 274: 1=as-is, 2=mirror-x, 3=rot180, 4=mirror-y, 5..8 add a
    transpose (row/col swap) before the same four flips."""
    if o in (5, 6, 7, 8):
        px = px.transpose(1, 0, 2)
    if o in (2, 3, 6, 7):
        px = px[:, ::-1]
    if o in (3, 4, 7, 8):
        px = px[::-1]
    if o < 1 or o > 8:
        raise ValueError(f"corrupt TIFF: orientation {o}")
    return np.ascontiguousarray(px)


# ---------------------------------------------------------------------------
# encoder (test fixture)
# ---------------------------------------------------------------------------


def _lzw_encode(data: bytes) -> bytes:
    """Real table-building TIFF LZW (spec §13) — exercises the decoder's
    width bumps, early change, and clear-on-full paths."""
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    put(256, width)  # initial Clear
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        put(table[w], width)
        table[wc] = next_code
        next_code += 1
        # early change, encoder side (libtiff convention, mirrored by
        # the decoder widening at (1<<width)-1): once the table holds
        # (1<<width) entries the NEXT code is written one bit wider —
        # the receiving decoder's table lags by one, at (1<<width)-1
        if next_code == 4094:  # libtiff CODE_MAX-1: table full, reset
            put(256, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        elif next_code == (1 << width) and width < 12:
            width += 1
        w = bytes([ch])
    if w:
        put(table[w], width)
        # the code just written grows the decoder's table too — stay in sync
        next_code += 1
        if next_code == (1 << width) and width < 12:
            width += 1
    put(257, width)  # EOI
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        j = i + 1
        while j < n and j - i < 128 and not (j + 1 < n and data[j] == data[j + 1]):
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


def encode_tiff(
    px: np.ndarray,
    compression: str = "none",
    predictor: int = 1,
    byte_order: str = "<",
    rows_per_strip: int | None = None,
    photometric: int | None = None,
    colormap: np.ndarray | None = None,
    bits_per_sample: int | None = None,
    orientation: int = 1,
    tile: tuple[int, int] | None = None,
    planar: int = 1,
) -> bytes:
    """Encode a TIFF test fixture.

    ``px``: (h, w) gray, (h, w) palette indices (with ``colormap`` of
    shape (n, 3) uint8), or (h, w, 3|4) RGB(A) uint8; (h, w) uint16 for
    16-bit gray.  ``compression`` in none/lzw/packbits/deflate.
    ``tile``: (tile_width, tile_length) switches to the tiled layout
    (full padded edge tiles, per-tile compression and prediction,
    TileOffsets/TileByteCounts instead of strip tags).  ``planar=2``
    stores each sample plane as its own strip run (PlanarConfiguration
    2), prediction per plane.
    """
    if predictor == 2 and compression in ("none", "packbits"):
        # out-of-spec combination (TIFF 6.0 defines the predictor for
        # LZW/Deflate): libtiff and the JDK ignore tag 317 on these
        # codecs, so a file we differenced would decode to garbage
        # everywhere but here — refuse instead of emitting it
        raise ValueError("predictor=2 requires lzw or deflate compression")
    px = np.asarray(px)
    h, w = px.shape[:2]
    bo = byte_order
    if colormap is not None:
        photometric = 3
        spp, bps = 1, bits_per_sample or 8
        flat = px.astype(np.uint8)
    elif px.ndim == 2:
        if photometric is None:
            photometric = 1
        spp = 1
        bps = 16 if px.dtype == np.uint16 else (bits_per_sample or 8)
        flat = px
    else:
        photometric = 2
        spp = px.shape[2]
        bps = 16 if px.dtype == np.uint16 else 8
        flat = px
    rows_per_strip = rows_per_strip or h

    def serialize(block: np.ndarray, hh: int, ww: int, nch: int | None = None) -> bytes:
        # rows of one strip set / one tile (byte-aligned, MSB-first for
        # sub-byte depths); horizontal differencing per row — so calling
        # this per TILE makes prediction reset at tile boundaries, the
        # spec's tiled semantics
        nch = spp if nch is None else nch
        if bps == 16:
            vals = block.reshape(hh, ww, nch).astype(np.uint16)
            if predictor == 2:  # per-channel diff along the row, mod 2**16
                vals = np.concatenate([vals[:, :1, :], np.diff(vals, axis=1)], axis=1)
            return vals.reshape(hh, -1).astype(np.dtype(np.uint16).newbyteorder(bo)).tobytes()
        if bps == 8:
            vals = block.reshape(hh, ww, nch)
            if predictor == 2:
                vals = np.concatenate([vals[:, :1, :], np.diff(vals.astype(np.int16), axis=1).astype(np.uint8)], axis=1)
            return vals.astype(np.uint8).tobytes()
        bits = ((block.reshape(hh, ww, 1).astype(np.uint16) >> np.arange(bps - 1, -1, -1)) & 1).astype(np.uint8)
        st = (ww * bps + 7) // 8
        padded = np.zeros((hh, st * 8), dtype=np.uint8)
        padded[:, : ww * bps] = bits.reshape(hh, ww * bps)
        return np.packbits(padded, axis=1).tobytes()

    def compress(blob: bytes) -> bytes:
        if compression == "lzw":
            return _lzw_encode(blob)
        if compression == "packbits":
            return _packbits_encode(blob)
        if compression == "deflate":
            return zlib.compress(blob)
        return blob

    strips = []
    if planar == 2 and spp > 1 and tile is not None:
        # plane-major tile grid (spec §15 + "Planar format"): each
        # plane's tiles serialize as single-channel tiles
        tw, tl = tile
        grid = flat.reshape(h, w, spp)
        for p in range(spp):
            for y0 in range(0, h, tl):
                for x0 in range(0, w, tw):
                    block = np.zeros((tl, tw, 1), dtype=grid.dtype)
                    ys, xs = min(tl, h - y0), min(tw, w - x0)
                    block[:ys, :xs, 0] = grid[y0 : y0 + ys, x0 : x0 + xs, p]
                    strips.append(compress(serialize(block, tl, tw, nch=1)))
    elif planar == 2 and spp > 1:
        grid = flat.reshape(h, w, spp)
        for p in range(spp):
            prows = serialize(grid[:, :, p : p + 1], h, w, nch=1)
            pstride = len(prows) // h
            for r0 in range(0, h, rows_per_strip):
                r1 = min(r0 + rows_per_strip, h)
                strips.append(compress(prows[r0 * pstride : r1 * pstride]))
    elif tile is not None:
        tw, tl = tile
        if bps not in (8, 16) and spp != 1:
            raise ValueError(
                "sub-byte tiled fixture encoding needs a single sample")
        grid = flat.reshape(h, w, spp)
        for y0 in range(0, h, tl):
            for x0 in range(0, w, tw):
                block = np.zeros((tl, tw, spp), dtype=grid.dtype)
                ys, xs = min(tl, h - y0), min(tw, w - x0)
                block[:ys, :xs] = grid[y0 : y0 + ys, x0 : x0 + xs]
                strips.append(compress(serialize(block, tl, tw)))
    else:
        rows = serialize(flat, h, w)
        stride = len(rows) // h
        for r0 in range(0, h, rows_per_strip):
            r1 = min(r0 + rows_per_strip, h)
            strips.append(compress(rows[r0 * stride : r1 * stride]))
    comp_id = {"none": 1, "lzw": 5, "packbits": 32773, "deflate": 8}[compression]

    # assemble: header, pixel strips, then the IFD and out-of-line values
    entries: list[tuple[int, int, int, bytes | int]] = []

    def tag(t: int, typ: int, values: list[int]) -> None:
        entries.append((t, typ, len(values), values))

    tag(_T_WIDTH, 3, [w])
    tag(_T_HEIGHT, 3, [h])
    tag(_T_BPS, 3, [bps] * spp)
    tag(_T_COMPRESSION, 3, [comp_id])
    tag(_T_PHOTOMETRIC, 3, [photometric])
    if orientation != 1:
        tag(_T_ORIENTATION, 3, [orientation])
    tag(_T_SPP, 3, [spp])
    if tile is None:
        tag(_T_ROWS_PER_STRIP, 3, [rows_per_strip])
    else:
        tag(_T_TILE_WIDTH, 3, [tile[0]])
        tag(_T_TILE_LENGTH, 3, [tile[1]])
    tag(_T_PLANAR, 3, [planar])
    if predictor == 2:
        tag(_T_PREDICTOR, 3, [predictor])
    if colormap is not None:
        n_pal = 1 << bps
        cm = np.zeros((3, n_pal), dtype=np.uint32)
        cm[:, : colormap.shape[0]] = colormap.T.astype(np.uint32) * 257
        tag(_T_COLORMAP, 3, [int(v) for v in cm.reshape(-1)])
    if spp == 4:
        tag(_T_EXTRA_SAMPLES, 3, [2])

    body = bytearray(b"II*\x00" if bo == "<" else b"MM\x00*")
    body += b"\x00\x00\x00\x00"  # IFD offset patched below
    strip_offsets = []
    for sdata in strips:
        strip_offsets.append(len(body))
        body += sdata
        if len(body) % 2:
            body += b"\x00"
    tag(_T_TILE_OFFSETS if tile is not None else _T_STRIP_OFFSETS, 4, strip_offsets)
    tag(_T_TILE_COUNTS if tile is not None else _T_STRIP_COUNTS, 4, [len(s) for s in strips])
    entries.sort(key=lambda e: e[0])

    ifd_off = len(body)
    struct.pack_into(bo + "I", body, 4, ifd_off)
    body += struct.pack(bo + "H", len(entries))
    tail = bytearray()
    tail_base = ifd_off + 2 + 12 * len(entries) + 4
    tsz = {3: "H", 4: "I"}
    for t, typ, cnt, values in entries:
        raw = struct.pack(bo + tsz[typ] * cnt, *values)
        if len(raw) <= 4:
            val = raw + b"\x00" * (4 - len(raw))
        else:
            pos = tail_base + len(tail)
            tail += raw
            if len(tail) % 2:
                tail += b"\x00"
            val = struct.pack(bo + "I", pos)
        body += struct.pack(bo + "HHI", t, typ, cnt) + val
    body += b"\x00\x00\x00\x00"  # next-IFD pointer: none
    body += tail
    return bytes(body)
