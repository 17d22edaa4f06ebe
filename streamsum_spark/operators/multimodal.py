"""Multimodal column plumbing (north-star extension): image/audio/video as
opaque BINARY columns with typed metadata, processed by Arrow-batched
pandas functions via mapInPandas.

Uncompressed formats decode for real with only the stdlib + numpy:
BMP (24/32-bit BI_RGB, via struct header parse), PNM (binary P5/P6 and
ascii P2/P3), and WAV (PCM16, RIFF chunk walk).  Compressed codec formats
(PNG/JPEG/GIF/MP3/...) raise NotImplementedError — the container has no
codecs, and pretending otherwise would hide a real production dependency.
The default pipeline path (extract_features over synthetic_media) is
fully real: header parse -> pixel/sample array -> per-channel statistics.

Scale notes:
- media rows are wide: keep `spark.sql.files.maxPartitionBytes` moderate
  and repartition by content hash before heavy decode so stragglers from
  size skew are split;
- metadata-only predicates (mime, width, duration) are ordinary columns —
  they push down to parquet and prune row groups without touching blobs;
- mapInPandas streams Arrow batches, so peak executor memory is one batch
  of blobs, not one partition.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Native fast-path routing (see native_codecs.py and jvm_codecs.py for
# the full design notes): True routes formats with a bound system codec
# (WebP via libwebp ctypes; JPEG/PNG/TIFF via the per-worker JVM
# ImageIO sidecar) through it for throughput, cross-checking a
# deterministic per-format sample against the spec decoder — byte-exact
# for the lossless formats, ISO-tolerance-banded for JPEG (see
# _jvm_native_decode).  Module-level so tests (and a cluster bootstrap)
# can force the pure-spec path; absent java/javac/libraries degrade to
# it automatically.
NATIVE_DECODE = True

# Cost-proportional verification budget (r10 verdict order #1).  A flat
# sample rate lets slow spec decoders dominate the ROUTED throughput —
# at 5% the expected verify time was ~100% of native decode time for
# PNG and ~1700% for VP8 (routed 0.95 vs 17.4 native MB/s).  Each
# format's percent is sized so the EXPECTED verification time is a
# bounded fraction (~25-50%) of its native decode time, using the
# spec/native throughput ratios measured in BENCH_r10 codec_throughput,
# floored at NATIVE_VERIFY_FLOOR_PCT = 0.2% — still millions of
# verified blobs at 100 TB corpus scale.  The integrity posture is
# unchanged: the sample is a pure function of blob bytes
# (crc32 % 10000, 0.01% granularity), any sampled divergence raises
# RuntimeError, and the known ImageIO-leniency classes remain
# structurally gated OFF the native path (palette PNG, jpeg_native_ok,
# tiff_native_ok, GIF not routed) rather than left to sampling.
# bench.py records the pct next to each routed_mb_s row so the budget
# stays auditable per round.
NATIVE_VERIFY_PCT = {
    # spec 1.3 vs sidecar 26.2 Mpix/s (~20x): 2% -> ~40% of native time
    "PNG": 2.0,
    # baseline spec 0.30 vs sidecar 13.4 MB/s (~45x): 0.5% -> ~22%;
    # progressive (~18x) -> ~9%
    "JPEG": 0.5,
    # spec LZW (53 Mpix/s) now BEATS the sidecar (30): a sampled verify
    # costs less than the native decode it checks, so the full 5% stays
    "TIFF": 5.0,
    # VP8 spec is ~350x slower than libwebp: even the 0.2% floor puts
    # expected verify at ~70% of native time — above the band, but the
    # floor is the sanctioned lower bound on verification coverage
    "WebP": 0.2,
}
NATIVE_VERIFY_FLOOR_PCT = 0.2  # design floor for production values above
_VERIFY_DEFAULT_PCT = 5.0  # unlisted formats: conservative flat sample


def _verify_hit(b: bytes, fmt: str) -> bool:
    """Deterministic per-blob sample membership: pure function of blob
    bytes at 0.01% granularity, so re-decodes of the same corpus check
    the same blobs and a mismatch cannot hide behind sampling luck."""
    pct = NATIVE_VERIFY_PCT.get(fmt, _VERIFY_DEFAULT_PCT)
    return zlib.crc32(b) % 10000 < round(pct * 100)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("content", T.BinaryType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_sha", T.StringType(), True),
        T.StructField("decoded", T.BooleanType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

_CODEC_MAGICS = (b"\x89PNG", b"\xff\xd8", b"GIF8", b"ID3", b"\x00\x00\x00\x1cftyp")


# ---------------------------------------------------------------------------
# image decode (BMP / PNM), stdlib struct + numpy only
# ---------------------------------------------------------------------------


def _dib_indices(rows: np.ndarray, w: int, bpp: int) -> np.ndarray:
    """Packed palette indices (1/4/8 bpp, MSB-first sub-byte order)
    from padded DIB rows -> (h, w) index array."""
    if bpp == 8:
        return rows[:, :w]
    bits = np.unpackbits(rows, axis=1)
    if bpp == 1:
        return bits[:, :w]
    nib = bits.reshape(rows.shape[0], -1, 4)  # 4: high nibble first
    return (nib[:, :, 0] * 8 + nib[:, :, 1] * 4
            + nib[:, :, 2] * 2 + nib[:, :, 3])[:, :w]


def _dib_palette(b: bytes, pos: int, bpp: int, clr_used: int) -> np.ndarray:
    n_pal = clr_used or (1 << bpp)
    if n_pal > 1 << bpp or pos + 4 * n_pal > len(b):
        raise ValueError("bad DIB palette")
    pal = np.frombuffer(b, np.uint8, count=4 * n_pal, offset=pos)
    return pal.reshape(n_pal, 4)[:, [2, 1, 0]]  # BGR0 -> RGB


def _decode_rle(data: bytes, w: int, h: int, bpp: int) -> np.ndarray:
    """BI_RLE8 / BI_RLE4 -> (h, w) bottom-up-ordered palette indices
    (row 0 of the result is the BOTTOM row, caller flips).  Escapes:
    00 00 end-of-line, 00 01 end-of-bitmap, 00 02 dx dy delta,
    00 nn absolute run (word-aligned)."""
    idx = np.zeros((h, w), np.uint8)
    x = y = i = 0
    n = len(data)
    while i + 1 < n and y < h:
        cnt, val = data[i], data[i + 1]
        i += 2
        if cnt > 0:  # encoded run
            if bpp == 8:
                run = [val] * cnt
            else:
                run = [(val >> 4, val & 0x0F)[k & 1] for k in range(cnt)]
            take = min(cnt, w - x)
            idx[y, x:x + take] = run[:take]
            x += take
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            break
        elif val == 2:  # delta
            if i + 1 >= n:
                raise ValueError("truncated RLE delta")
            x = min(w, x + data[i])
            y = y + data[i + 1]
            i += 2
        else:  # absolute run of `val` pixels, word-aligned
            if bpp == 8:
                nbytes = val
                if i + nbytes > n:
                    raise ValueError("truncated RLE absolute run")
                run = list(data[i:i + nbytes])
            else:
                nbytes = (val + 1) // 2
                if i + nbytes > n:
                    raise ValueError("truncated RLE absolute run")
                run = []
                for k in range(val):
                    byte = data[i + k // 2]
                    run.append(byte >> 4 if k % 2 == 0 else byte & 0x0F)
            take = min(val, w - x)
            idx[y, x:x + take] = run[:take]
            x += take
            i += (nbytes + 1) & ~1  # pad to word boundary
    return idx


def _mask_channel(vals: np.ndarray, mask: int) -> np.ndarray:
    if mask == 0:
        return np.zeros(vals.shape, np.uint8)
    shift = (mask & -mask).bit_length() - 1
    top = mask >> shift
    ch = (vals >> shift) & top
    return ((ch * 255) // top).astype(np.uint8)


def _decode_bmp(b: bytes) -> np.ndarray:
    """BITMAPINFOHEADER BMP: BI_RGB 1/4/8-bit palettized, 16-bit
    (555), 24/32-bit direct, BI_RLE8/BI_RLE4 runs, and BI_BITFIELDS
    16/32-bit with arbitrary channel masks.  Rows are 4-byte padded
    and bottom-up when height > 0; pixels are BGR(A) on disk.  Pinned
    against Java ImageIO's BMP reader in tests."""
    if len(b) < 54:
        raise ValueError("truncated BMP header")
    off = struct.unpack_from("<I", b, 10)[0]
    hdr_size = struct.unpack_from("<I", b, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP not supported")
    w, h = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    comp = struct.unpack_from("<I", b, 30)[0]
    clr_used = struct.unpack_from("<I", b, 46)[0]
    bottom_up, h = h > 0, abs(h)
    if w <= 0 or h == 0 or w * h > 1 << 26:
        # w < 0 would make stride 0 and the reshape below would hit a
        # negative dim, which numpy treats as "infer" — garbage, not error
        raise ValueError(f"bad BMP dimensions {w}x{h}")
    if comp in (1, 2):  # BI_RLE8 / BI_RLE4 (always bottom-up)
        if (comp == 1) != (bpp == 8) or (comp == 2) != (bpp == 4):
            raise ValueError("RLE compression/bpp mismatch")
        pal = _dib_palette(b, 14 + hdr_size, bpp, clr_used)
        idx = _decode_rle(b[off:], w, h, bpp)
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("BMP palette index out of range")
        return np.ascontiguousarray(pal[idx][::-1])
    if comp not in (0, 3) or bpp not in (1, 4, 8, 16, 24, 32):
        raise NotImplementedError(
            f"BMP bpp={bpp} compression={comp} not supported")
    stride = ((w * bpp + 31) // 32) * 4
    if off + stride * h > len(b):
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(
        b, dtype=np.uint8, count=stride * h, offset=off).reshape(h, stride)
    if bpp in (1, 4, 8):
        pal = _dib_palette(b, 14 + hdr_size, bpp, clr_used)
        idx = _dib_indices(rows, w, bpp)
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("BMP palette index out of range")
        px = pal[idx]
    elif bpp == 16 or (bpp == 32 and comp == 3):
        if comp == 3:  # masks follow the info header
            # the three masks occupy bytes 54..66 whether they are the
            # 12 bytes after a BITMAPINFOHEADER or the leading fields of
            # a V4/V5 header — either way a file shorter than 66 bytes
            # cannot carry them, regardless of the hdr_size it DECLARES
            # (a truncated file claiming hdr_size >= 52 used to slip
            # past a declared-size guard into struct.error)
            if len(b) < 66:
                raise ValueError("truncated BITFIELDS masks")
            rm, gm, bm = struct.unpack_from("<III", b, 54)
        else:
            rm, gm, bm = 0x7C00, 0x03E0, 0x001F  # BI_RGB 16 = 555
        dt = "<u2" if bpp == 16 else "<u4"
        vals = rows[:, : w * (bpp // 8)].reshape(h, -1).view(dt)[:, :w]
        vals = vals.astype(np.int64)
        px = np.stack([_mask_channel(vals, m) for m in (rm, gm, bm)], -1)
    else:
        nch = bpp // 8
        px = rows[:, : w * nch].reshape(h, w, nch)[:, :, [2, 1, 0]]
    if bottom_up:
        px = px[::-1]
    return np.ascontiguousarray(px)  # RGB, alpha dropped


def _decode_pnm(b: bytes) -> np.ndarray:
    """PNM: binary P5 (gray) / P6 (rgb) and ascii P2 / P3.  Header is
    ascii tokens (width height maxval) with '#' comments."""
    magic = b[:2].decode("ascii", "replace")
    vals: list[int] = []
    i = 2
    while len(vals) < 3:
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if b[i : i + 1] == b"#":
            while i < len(b) and b[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PNM header")
        vals.append(int(b[i:j]))
        i = j
    w, h, maxval = vals
    if w <= 0 or h <= 0:
        # negative dims must fail loudly: w*h*nch == -1 would reach
        # np.frombuffer(count=-1), which silently reads the WHOLE buffer
        raise ValueError(f"bad PNM dimensions {w}x{h}")
    if maxval > 255:
        raise NotImplementedError("16-bit PNM not supported")
    nch = 3 if magic in ("P3", "P6") else 1
    if magic in ("P5", "P6"):
        i += 1  # exactly one whitespace byte after maxval, then raster
        if i + w * h * nch > len(b):
            raise ValueError("truncated PNM raster")
        px = np.frombuffer(b, dtype=np.uint8, count=w * h * nch, offset=i).reshape(h, w, nch)
    else:
        toks = b[i:].split()
        if len(toks) < w * h * nch:
            raise ValueError("truncated ascii PNM raster")
        px = np.array(toks[: w * h * nch], dtype=np.int64).astype(np.uint8).reshape(h, w, nch)
    if nch == 1:
        px = np.repeat(px, 3, axis=2)
    return px


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# channels per PNG color type: 0 gray, 2 RGB, 3 palette-index, 4 gray+alpha,
# 6 RGBA
_PNG_NCH = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# decoded-scanline ceiling: bounds MEMORY and, with it, CPU.  None/up rows
# unfilter as numpy expressions and sub rows as a per-lane uint8 cumsum,
# but average/paeth recur on the reconstructed left neighbor and must walk
# the row in Python — so an in-cap hostile image is a CPU-amplification
# vector exactly as large as the cap.  16 MiB of scanlines (~5.5 MP RGB,
# ~16 MP gray — far beyond what a pixel-stats pass needs) keeps the
# worst-case all-paeth decode at seconds, not minutes, so decode TIME is
# bounded like decode memory.
_PNG_MAX_RAW_BYTES = 16 << 20


def _png_unfilter_row(f: int, row: np.ndarray, prev: np.ndarray, nch: int) -> np.ndarray:
    """Invert one PNG row filter (spec §9: none/sub/up/average/paeth).
    ``row``/``prev`` are int32 arrays of the filtered/reconstructed bytes
    (values 0..255); returns the reconstructed row mod 256.

    None/up are numpy expressions; sub's recurrence out[x] = row[x] +
    out[x-nch] is a per-lane prefix sum, done as a vectorized uint8
    cumsum (wraparound == mod 256).  Average/paeth genuinely recur on the
    reconstructed left neighbor, so they walk the row — over plain Python
    ints (lists, not numpy scalar indexing, ~10× less interpreter
    overhead), with worst-case iterations bounded by _PNG_MAX_RAW_BYTES."""
    if f == 0:
        return row % 256
    if f == 2:
        return (row + prev) % 256
    if f == 1:  # sub: per-lane prefix sum; stride = w*nch is lane-divisible
        lanes = (row % 256).astype(np.uint8).reshape(-1, nch)
        return np.cumsum(lanes, axis=0, dtype=np.uint8).reshape(-1).astype(np.int32)
    r = (row % 256).tolist()
    p = (prev % 256).tolist()
    out = [0] * len(r)
    if f == 3:  # average
        for x in range(len(r)):
            left = out[x - nch] if x >= nch else 0
            out[x] = (r[x] + ((left + p[x]) >> 1)) & 255
    elif f == 4:  # paeth (predictor simplified: p-left=|up-ul| etc.)
        for x in range(len(r)):
            left = out[x - nch] if x >= nch else 0
            up = p[x]
            ul = p[x - nch] if x >= nch else 0
            pa = up - ul if up >= ul else ul - up
            pb = left - ul if left >= ul else ul - left
            d = left + up - 2 * ul
            pc = d if d >= 0 else -d
            pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
            out[x] = (r[x] + pred) & 255
    else:
        raise ValueError(f"bad PNG filter type {f}")
    return np.array(out, dtype=np.int32)


# Adam7 interlace passes: (x_start, y_start, x_step, y_step)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]
# spec-legal (color type -> bit depths); palette (3) requires PLTE
_PNG_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8), 4: (8, 16), 6: (8, 16)}


def _decode_png(b: bytes, rgba: bool = False) -> np.ndarray:
    """Stdlib PNG decode: chunk walk -> zlib inflate -> per-pass, per-row
    unfilter -> depth conversion.  Covers the full spec surface a
    pixel-stats pass can meet: all five color types (gray, RGB,
    PLTE-palette, gray+alpha, RGBA), bit depths 1/2/4/8/16 (16-bit
    samples downconvert to their high byte; sub-byte gray rescales to
    0..255), and Adam7 interlacing (seven filtered sub-images written
    back on their stride grids).  Only genuinely compressed codecs
    (JPEG/...) remain NotImplementedError.

    ``rgba=True`` (the APNG compositor's path) returns (h, w, 4)
    straight-alpha: color type 6 as stored, 4 as gray+alpha, 3 with
    per-index tRNS alpha (255 past the table), 0/2 opaque (the color-key
    form of tRNS is not applied — gray/RGB color-keyed animation frames
    are vanishingly rare)."""
    import zlib

    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    w = h = depth = ctype = interlace = None
    idat = bytearray()
    plte = None
    trns = None
    i = 8
    while i + 8 <= len(b):
        ln = int.from_bytes(b[i : i + 4], "big")
        typ = b[i + 4 : i + 8]
        if i + 8 + ln > len(b):
            raise ValueError("truncated PNG chunk")
        data = b[i + 8 : i + 8 + ln]
        if typ == b"IHDR":
            if len(data) < 13:
                raise ValueError("truncated IHDR")
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data[:13]
            )
        elif typ == b"PLTE":
            plte = data
        elif typ == b"tRNS":
            trns = data
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        i += 12 + ln  # length + type + data + crc
    if w is None:
        raise ValueError("missing IHDR")
    if ctype not in _PNG_DEPTHS or depth not in _PNG_DEPTHS[ctype] or interlace not in (0, 1):
        raise NotImplementedError(
            f"PNG depth={depth} color_type={ctype} interlace={interlace} not supported"
        )
    if ctype == 3:
        if plte is None or len(plte) % 3 or not plte:
            raise ValueError("palette PNG missing or malformed PLTE")
    if not idat:
        raise ValueError("missing IDAT")
    nch = _PNG_NCH[ctype]
    # the filter's left-neighbor step in BYTES (>= 1 even for sub-byte
    # depths, per spec)
    step = max(1, (nch * depth) // 8)

    def stride_bytes(pw: int) -> int:
        return (pw * nch * depth + 7) // 8

    if interlace == 0:
        passes = [(0, 0, 1, 1, w, h)]
    else:
        passes = []
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            passes.append((x0, y0, dx, dy, pw, ph))
    # Bound BOTH the claimed geometry and the inflate: a malformed header
    # or a deflate bomb (KBs of IDAT inflating to GBs) must fail with
    # ValueError — which extract_features turns into the fingerprint
    # fallback — never blow executor memory inside an Arrow batch.
    need = sum(ph * (1 + stride_bytes(pw)) for _, _, _, _, pw, ph in passes if pw and ph)
    if need > _PNG_MAX_RAW_BYTES:
        raise ValueError(
            f"PNG {w}x{h}x{nch} exceeds the {_PNG_MAX_RAW_BYTES >> 20} MiB "
            "decoded-scanline cap"
        )
    try:
        raw = zlib.decompressobj().decompress(bytes(idat), need)
    except zlib.error as e:
        # zlib.error is not a ValueError; unwrapped it would escape
        # extract_features' fallback catch and fail the whole task
        raise ValueError(f"bad PNG deflate stream: {e}")
    if len(raw) < need:
        raise ValueError("truncated PNG scanlines")
    samples = np.zeros((h, w, nch), dtype=np.uint8)
    pos = 0
    for x0, y0, dx, dy, pw, ph in passes:
        if not pw or not ph:
            continue
        sb = stride_bytes(pw)
        rows = np.empty((ph, sb), dtype=np.uint8)
        prev = np.zeros(sb, dtype=np.int32)
        for y in range(ph):
            f = raw[pos]
            row = np.frombuffer(raw, dtype=np.uint8, count=sb, offset=pos + 1).astype(
                np.int32
            )
            pos += 1 + sb
            prev = _png_unfilter_row(f, row, prev, step)
            rows[y] = prev.astype(np.uint8)
        if depth == 8:
            px = rows[:, : pw * nch].reshape(ph, pw, nch)
        elif depth == 16:
            # big-endian sample pairs: keep the high byte (8-bit downconvert)
            px = rows[:, : pw * nch * 2].reshape(ph, pw, nch, 2)[:, :, :, 0]
        else:
            # sub-byte depths are gray or palette indices (nch == 1),
            # packed high-bit-first within each byte
            bits = np.unpackbits(rows, axis=1)[:, : pw * depth]
            weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
            vals = (bits.reshape(ph, pw, depth) * weights).sum(axis=2)
            if ctype == 0:  # rescale 0..(2^d - 1) to 0..255
                vals = vals * 255 // ((1 << depth) - 1)
            px = vals.astype(np.uint8)[:, :, None]
        samples[y0::dy, x0::dx, :] = px
    if ctype == 3:
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = samples[:, :, 0]
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("palette index out of range")
        rgb = pal[idx]
        if not rgba:
            return np.ascontiguousarray(rgb)
        a = np.full(256, 255, np.uint8)
        if trns is not None:
            t = np.frombuffer(trns, dtype=np.uint8)[:256]
            a[: len(t)] = t
        return np.ascontiguousarray(np.dstack([rgb, a[idx]]))
    if ctype == 0:
        rgb = np.repeat(samples, 3, axis=2)
    elif ctype == 4:
        rgb = np.repeat(samples[:, :, :1], 3, axis=2)
    elif ctype == 6:
        rgb = samples[:, :, :3]
    else:
        rgb = samples
    if not rgba:
        return np.ascontiguousarray(rgb)
    if ctype in (4, 6):
        a = samples[:, :, -1]
    else:
        a = np.full(rgb.shape[:2], 255, np.uint8)
    return np.ascontiguousarray(np.dstack([rgb, a]))


def _jvm_native_decode(b: bytes, fmt: str, spec_decode, exact: bool) -> np.ndarray:
    """Route a blob through the JVM ImageIO sidecar (jvm_codecs.py) with
    the native-fast-path contract native_codecs.py established for WebP:
    spec decoder on refusal or when the sidecar is unavailable (results
    identical either way for ``exact`` formats, only throughput
    changes), and a deterministic NATIVE_VERIFY_PCT[fmt]% sample decoded BOTH
    ways.  ``exact=True`` (PNG/GIF/TIFF — lossless formats whose outputs
    were pinned byte-identical across every color type, depth, interlace
    and compression variant in tests) demands byte equality; JPEG decode
    is implementation-defined within ISO tolerance (IDCT rounding, fancy
    vs box chroma upsampling), so ``exact=False`` asserts a tolerance
    band instead: per-pixel mean |diff| <= 24 AND 8x8-block-mean max
    |diff| <= 16 — chroma-upsampling divergence is high-frequency and
    block means agree within ~6 empirically, while a BROKEN decode
    (plane swap, stride bug, wrong quant table) blows both.  Any
    violation raises RuntimeError (deliberately NOT in
    extract_features' fallback set): loud, never wrong pixels
    downstream."""
    from streamsum_spark.operators import jvm_codecs as jc

    if not jc.have_jvm_imageio():
        return spec_decode(b)
    return _native_decode(b, fmt, jc.decode_image_jvm, spec_decode, exact)


def _native_decode(b: bytes, fmt: str, native_fn, spec_decode,
                   exact: bool) -> np.ndarray:
    """The ONE native-fast-path contract, shared by the JVM sidecar
    formats and libwebp (round-10 review fix: the WebP branch carried
    its own copy of this policy, inviting drift — the unguarded GIF
    route was exactly that kind of drift)."""
    try:
        px = native_fn(b)
    except (ValueError, RuntimeError):
        # refusal/crash/unavailable: the spec decoder owns the
        # malformed-input contract — let it decide
        return spec_decode(b)
    if _verify_hit(b, fmt):
        try:
            ours = spec_decode(b)
        except (ValueError, NotImplementedError):
            # native leniency: ImageIO decoded a blob the spec decoder
            # refuses (e.g. a mutated-but-salvageable stream).  Spec owns
            # the acceptance contract, so the sampled blob follows the
            # refusal (quarantine) path — re-raise, never RuntimeError: a
            # hostile blob must not be able to kill the task by landing
            # in the sample.  Known divergences are gated off instead
            # (palette-index range: PNG ctype 3 below, jpeg_native_ok,
            # tiff_native_ok).
            raise
        if ours.shape != px.shape:
            raise RuntimeError(f"native/spec {fmt} shape mismatch — codec bug")
        if exact:
            if not np.array_equal(ours, px):
                raise RuntimeError(f"native/spec {fmt} decode mismatch — codec bug")
        else:
            d = np.abs(ours.astype(np.int16) - px.astype(np.int16))
            h, w = d.shape[:2]
            h8, w8 = h // 8 * 8, w // 8 * 8
            bmax = 0.0
            if h8 and w8:
                bm = lambda a: a[:h8, :w8].astype(np.float64).reshape(
                    h8 // 8, 8, w8 // 8, 8, -1
                ).mean(axis=(1, 3))
                bmax = float(np.abs(bm(ours) - bm(px)).max())
            if float(d.mean()) > 24.0 or bmax > 16.0:
                raise RuntimeError(
                    f"native/spec {fmt} decode outside the ISO tolerance band "
                    f"(mean {d.mean():.1f}, blockmean {bmax:.1f}) — codec bug"
                )
    return px


def decode_image(content: bytes) -> np.ndarray:
    """Decode an image to an (h, w, 3) uint8 RGB array.

    Real for BMP (BI_RGB 24/32-bit), PNM (P2/P3/P5/P6), the full PNG
    spec surface (all five color types incl. PLTE palette, bit depths
    1/2/4/8/16, Adam7 interlace — stdlib zlib + the five row filters, no
    codec libs), JPEG — baseline SOF0/SOF1 AND progressive SOF2 with
    spectral selection + successive approximation (grayscale / YCbCr,
    4:4:4 / 4:2:2 / 4:2:0 / 4:4:0 subsampling, restart intervals —
    operators/jpeg.py, written from ITU-T T.81), GIF (87a/89a LZW
    incl. interlace, first frame — operators/gif.py), and lossless WebP
    (VP8L: prefix codes, color cache, LZ77 2D backrefs, all four
    transforms — operators/webp.py, written from RFC 9649), lossy WebP
    (VP8 key frame: boolean coder, token/coefficient decode, intra
    prediction, WHT/DCT, loop filter — operators/vp8.py, written from
    RFC 6386, byte-exact vs libwebp), and TIFF
    (strips AND tiles: none/LZW/PackBits/Deflate compressions,
    horizontal predictor, gray/palette/RGB(A), bit depths 1-16, both
    byte orders, all eight orientations — operators/tiff.py, written
    from the TIFF 6.0 spec), and ICO/CUR (largest directory entry;
    PNG-in-ICO or 1/4/8/24/32bpp DIB with the doubled-height AND
    mask).  Remaining codecs (arithmetic-coded JPEG, ...) raise
    NotImplementedError: a fake decode would misreport pixel stats."""
    if content is None:
        raise ValueError("null content")
    b = bytes(content)
    if b[:2] == b"BM":
        return _decode_bmp(b)
    if b[:2] in (b"P2", b"P3", b"P5", b"P6"):
        return _decode_pnm(b)
    if b[:8] == _PNG_SIG:
        # palette PNGs (IHDR color type 3, byte 25) stay on the spec
        # path: ImageIO leniently renders out-of-range palette indices
        # that the spec decoder (correctly) refuses, and the refusal
        # contract must not depend on which path a blob took
        if NATIVE_DECODE and len(b) > 25 and b[25] != 3:
            return _jvm_native_decode(b, "PNG", _decode_png, exact=True)
        return _decode_png(b)
    if b[:2] == b"\xff\xd8":
        from streamsum_spark.operators.jpeg import decode_jpeg, jpeg_native_ok

        if NATIVE_DECODE and jpeg_native_ok(b):
            return _jvm_native_decode(b, "JPEG", decode_jpeg, exact=False)
        return decode_jpeg(b)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        from streamsum_spark.operators.gif import decode_gif

        # GIF deliberately does NOT route through the JVM sidecar
        # (round-10 review fix): ImageIO leniently decodes GIFs the
        # spec decoder refuses — e.g. an LZW stream ending before w*h
        # pixels zero-fills the remainder — and unlike palette PNG or
        # the TIFF gates there is no cheap structural probe for that
        # class (acceptance depends on the decoded LZW output length),
        # so routing would make acceptance depend on JVM availability
        # and the crc sample.  The vectorized LZW core (_lzw.py) puts
        # the spec decoder within ~2x of the sidecar, so the honest
        # path is also a fast one.
        return decode_gif(b)
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        from streamsum_spark.operators.webp import decode_webp

        if NATIVE_DECODE:
            from streamsum_spark.operators import native_codecs as nc

            if nc.HAVE_LIBWEBP:
                # WebP decode is bit-exact by spec, so exact=True: ANY
                # sampled divergence raises loud (RuntimeError is
                # intentionally NOT in extract_features' fallback set)
                return _native_decode(b, "WebP", nc.decode_webp_rgb,
                                      decode_webp, exact=True)
        return decode_webp(b)  # VP8L lossless or lossy VP8 key frame
    if b[:4] in (b"II*\x00", b"MM\x00*"):
        from streamsum_spark.operators.tiff import decode_tiff, tiff_native_ok

        if NATIVE_DECODE and tiff_native_ok(b):
            return _jvm_native_decode(b, "TIFF", decode_tiff, exact=True)
        return decode_tiff(b)
    if b[:4] in (b"\x00\x00\x01\x00", b"\x00\x00\x02\x00"):
        return _decode_ico(b)
    raise NotImplementedError("compressed image codecs not available in this environment")


def _decode_ico(b: bytes) -> np.ndarray:
    """ICO/CUR container: picks the largest/deepest directory entry and
    decodes it — PNG-in-ICO (modern favicons) via the PNG decoder, else
    a headerless DIB whose biHeight covers XOR+AND masks (height is
    halved; the 1-bit AND mask is transparency, dropped for RGB output
    like the BMP path drops alpha).  Palette (1/4/8 bpp) and direct
    (24/32 bpp) XOR images, bottom-up, 4-byte-aligned rows."""
    if len(b) < 6 + 16:
        raise ValueError("truncated ICO directory")
    _, rtype, count = struct.unpack_from("<HHH", b, 0)
    if count == 0:
        raise ValueError("empty ICO")
    best = None
    for k in range(min(count, 64)):
        e = 6 + 16 * k
        if e + 16 > len(b):
            raise ValueError("truncated ICO directory entry")
        ew = b[e] or 256
        eh = b[e + 1] or 256
        # ICONDIRENTRY bytes 4-7 are (planes, bitcount) only for icons
        # (type 1); for cursors (type 2) they hold the hotspot, so using
        # them as a depth tiebreak would prefer whichever same-area entry
        # has the larger hotspot-Y.  Actual bpp comes from the DIB header
        # either way — for CUR, tiebreak on area alone.
        bpp = struct.unpack_from("<H", b, e + 6)[0] if rtype != 2 else 0
        size, off = struct.unpack_from("<II", b, e + 8)
        key = (ew * eh, bpp)
        if best is None or key > best[0]:
            best = (key, off, size)
    _, off, size = best
    if off + size > len(b) or size < 8:
        raise ValueError("ICO image data out of bounds")
    d = b[off:off + size]
    if d[:8] == _PNG_SIG:
        return _decode_png(d)
    return _decode_ico_dib(d)


def _decode_ico_dib(d: bytes) -> np.ndarray:
    if len(d) < 40 or struct.unpack_from("<I", d, 0)[0] != 40:
        raise ValueError("ICO DIB must use BITMAPINFOHEADER")
    w, h2 = struct.unpack_from("<ii", d, 4)
    bpp = struct.unpack_from("<H", d, 14)[0]
    comp = struct.unpack_from("<I", d, 16)[0]
    clr_used = struct.unpack_from("<I", d, 32)[0]
    if comp != 0:
        raise NotImplementedError(f"ICO DIB compression={comp}")
    bottom_up = h2 > 0  # negative biHeight = top-down, same as BMP
    h = abs(h2) // 2  # XOR + AND stacked
    if w <= 0 or h <= 0 or w * h > 1 << 24:
        raise ValueError("bad ICO dimensions")
    pos = 40
    if bpp in (1, 4, 8):
        pal = _dib_palette(d, pos, bpp, clr_used)
        pos += 4 * (clr_used or (1 << bpp))
        stride = ((w * bpp + 31) // 32) * 4
        if pos + stride * h > len(d):
            raise ValueError("truncated ICO XOR image")
        rows = np.frombuffer(
            d, np.uint8, count=stride * h, offset=pos).reshape(h, stride)
        idx = _dib_indices(rows, w, bpp)
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("ICO palette index out of range")
        px = pal[idx]
    elif bpp in (24, 32):
        nch = bpp // 8
        stride = (w * nch + 3) & ~3
        if pos + stride * h > len(d):
            raise ValueError("truncated ICO XOR image")
        rows = np.frombuffer(
            d, np.uint8, count=stride * h, offset=pos).reshape(h, stride)
        px = rows[:, : w * nch].reshape(h, w, nch)[:, :, [2, 1, 0]]
    else:
        raise NotImplementedError(f"ICO bpp={bpp}")
    return np.ascontiguousarray(px[::-1] if bottom_up else px)


def _decode_g711(data: bytes, law: str) -> np.ndarray:
    """ITU-T G.711 companded 8-bit telephony samples -> int16, via a
    256-entry lookup table built from the spec's expansion formulas —
    one vectorized take(), no per-sample Python."""
    codes = np.arange(256, dtype=np.uint8)
    if law == "mu":
        u = ~codes
        sign = np.where(u & 0x80, -1, 1)
        exponent = (u >> 4) & 0x07
        mantissa = u & 0x0F
        magnitude = ((mantissa.astype(np.int32) << 3) + 0x84) << exponent
        lut = (sign * (magnitude - 0x84)).astype(np.int16)
    else:  # A-law (bit 7 SET means positive, per the reference tables)
        a = codes ^ 0x55
        sign = np.where(a & 0x80, 1, -1)
        exponent = (a >> 4) & 0x07
        mantissa = (a & 0x0F).astype(np.int32)
        magnitude = np.where(
            exponent == 0,
            (mantissa << 4) + 8,
            ((mantissa << 4) + 0x108) << (exponent - 1),
        )
        lut = (sign * magnitude).astype(np.int16)
    return lut[np.frombuffer(data, dtype=np.uint8)]


_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int32)
_IMA_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _ima_decode_nibbles(nibbles, pred: int, index: int) -> list[int]:
    """The IMA step-predictor walk shared by the mono and stereo paths:
    inherently sequential (like the JPEG Huffman walk), bounded by the
    stored bytes the feature path's decode cap already limits."""
    out = [pred]
    for nib in nibbles:
        step = int(_IMA_STEPS[index])
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        pred = pred - diff if nib & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        index = min(88, max(0, index + int(_IMA_INDEX_ADJ[nib & 7])))
        out.append(pred)
    return out


def _decode_ima_adpcm(data: bytes, nch: int, block_align: int) -> np.ndarray:
    """IMA/DVI ADPCM (WAV format tag 0x11), mono or stereo: 4-bit deltas
    against a per-channel stepped predictor, block-reset headers.  In
    stereo, each block carries a 4-byte header PER CHANNEL and the data
    interleaves in 4-byte (8-nibble) channel groups, per the spec."""
    if nch not in (1, 2):
        raise NotImplementedError(f"IMA ADPCM with {nch} channels not supported")
    chans: list[list[int]] = [[] for _ in range(nch)]
    for off in range(0, len(data) - 4 * nch + 1, block_align):
        block = data[off : off + block_align]
        nibs: list[list[int]] = [[] for _ in range(nch)]
        seeds = []
        for c in range(nch):
            pred = struct.unpack_from("<h", block, 4 * c)[0]
            index = min(88, max(0, block[4 * c + 2]))
            seeds.append((pred, index))
        body = block[4 * nch :]
        # data interleaves per channel in 4-byte groups
        for g in range(0, len(body), 4 * nch):
            for c in range(nch):
                for byte in body[g + 4 * c : g + 4 * c + 4]:
                    nibs[c].append(byte & 0x0F)
                    nibs[c].append(byte >> 4)
        for c in range(nch):
            chans[c].extend(_ima_decode_nibbles(nibs[c], *seeds[c]))
    n = min(len(ch) for ch in chans)
    # interleaved (n, nch) like the PCM path; decode_audio reshapes by nch
    return np.stack([ch[:n] for ch in chans], axis=1).reshape(-1).astype(np.int16)


def _parse_f80(raw: bytes) -> float:
    """IEEE 754 80-bit extended float (AIFF COMM sampleRate): 1 sign +
    15 exponent + 64 explicit-integer-bit mantissa."""
    if len(raw) < 10:
        raise ValueError("truncated extended float")
    se = struct.unpack(">H", raw[:2])[0]
    mant = struct.unpack(">Q", raw[2:10])[0]
    if se & 0x7FFF == 0 and mant == 0:
        return 0.0
    exp = (se & 0x7FFF) - 16383 - 63
    if not -126 <= exp <= 63:  # sane audio rates only; a hostile
        # exponent would overflow the float multiply below
        raise ValueError("AIFF sample rate out of range")
    val = mant * (2.0 ** exp)
    return -val if se & 0x8000 else val


def _pcm_be_to_i16(data: bytes, bits: int, little: bool = False) -> np.ndarray:
    nbytes = (bits + 7) // 8
    n = len(data) // nbytes
    if bits == 8:
        return np.frombuffer(data, np.int8, count=n).astype(np.int16) << 8
    if bits == 16:
        dt = "<i2" if little else ">i2"
        return np.frombuffer(data, dt, count=n).astype(np.int16)
    raw = np.frombuffer(data, np.uint8, count=n * nbytes).reshape(n, nbytes)
    if little:
        raw = raw[:, ::-1]
    acc = np.zeros(n, np.int64)
    for k in range(nbytes):
        acc = (acc << 8) | raw[:, k]
    shift = nbytes * 8
    acc = np.where(acc >= 1 << (shift - 1), acc - (1 << shift), acc)
    return (acc >> (shift - 16)).astype(np.int16)


def _decode_aiff(b: bytes) -> tuple[np.ndarray, int]:
    """AIFF / AIFF-C ('FORM'): big-endian chunks, COMM with an 80-bit
    extended-float sample rate, SSND sample data.  PCM 8/16/24/32,
    AIFF-C 'NONE'/'sowt' (byte-swapped LE)/'ulaw'/'alaw' (G.711)."""
    is_aifc = b[8:12] == b"AIFC"
    comm = ssnd = None
    i = 12
    while i + 8 <= len(b):
        cid = b[i:i + 4]
        sz = struct.unpack_from(">I", b, i + 4)[0]
        body = b[i + 8:i + 8 + sz]
        if cid == b"COMM":
            comm = body
        elif cid == b"SSND":
            ssnd = body
        i += 8 + sz + (sz & 1)
    if comm is None or ssnd is None or len(comm) < 18 or len(ssnd) < 8:
        raise ValueError("AIFF missing/truncated COMM or SSND")
    nch, _nframes, bits = struct.unpack_from(">hIh", comm, 0)
    rate = int(round(_parse_f80(comm[8:18])))
    if nch < 1 or rate <= 0 or not 1 <= bits <= 32:
        raise ValueError("corrupt AIFF COMM")
    comp = comm[18:22] if (is_aifc and len(comm) >= 22) else b"NONE"
    off = struct.unpack_from(">I", ssnd, 0)[0]
    data = ssnd[8 + off:]
    if comp in (b"NONE",):
        samples = _pcm_be_to_i16(data, bits)
    elif comp == b"sowt":  # byte-swapped (little-endian) PCM
        samples = _pcm_be_to_i16(data, bits, little=True)
    elif comp.lower() in (b"ulaw", b"alaw"):
        samples = _decode_g711(
            data, "mu" if comp.lower() == b"ulaw" else "alaw")
    else:
        raise NotImplementedError(f"AIFF-C compression {comp!r}")
    n = (len(samples) // nch) * nch
    return samples[:n].reshape(-1, nch), rate


def _decode_au(b: bytes) -> tuple[np.ndarray, int]:
    """Sun AU ('.snd'): big-endian header (offset, size, encoding,
    rate, channels).  mu-law/A-law (G.711), PCM 8/16/24/32, float
    32/64 scaled to int16."""
    if len(b) < 24:
        raise ValueError("truncated AU header")
    _, off, _size, enc, rate, nch = struct.unpack_from(">IIIIII", b, 0)
    if off < 24 or off > len(b) or nch < 1 or nch > 64 or rate <= 0:
        raise ValueError("corrupt AU header")
    data = b[off:]
    if enc == 1:
        samples = _decode_g711(data, "mu")
    elif enc == 27:
        samples = _decode_g711(data, "alaw")
    elif enc in (2, 3, 4, 5):
        samples = _pcm_be_to_i16(data, {2: 8, 3: 16, 4: 24, 5: 32}[enc])
    elif enc in (6, 7):
        dt = ">f4" if enc == 6 else ">f8"
        f = np.frombuffer(data, dt, count=len(data) // (4 if enc == 6 else 8))
        if not np.isfinite(f).all():  # NaN->int16 is undefined; refuse
            raise ValueError("non-finite AU float samples")
        samples = np.clip(np.rint(f * 32767.0), -32768, 32767).astype(np.int16)
    else:
        raise NotImplementedError(f"AU encoding {enc}")
    n = (len(samples) // nch) * nch
    return samples[:n].reshape(-1, nch), rate


def decode_audio(content: bytes) -> tuple[np.ndarray, int]:
    """Decode an audio blob to ((n_samples, n_channels) int16,
    sample_rate).  WAV (RIFF): PCM16 (tag 1), G.711 A-law/mu-law
    telephony (tags 6/7 — LUT expansion, vectorized), mono IMA ADPCM
    (tag 0x11).  FLAC (operators/flac.py — full fixed-blocksize
    surface from RFC 9639, CRC-verified, returned as int32).  AIFF /
    AIFF-C: big-endian PCM 8-32, 'sowt', G.711 (80-bit extended-float
    rate; pinned vs the stdlib aifc module).  Sun AU: G.711, PCM,
    float32/64 (pinned vs stdlib sunau).  Other codecs (MP3, AAC, ...)
    raise NotImplementedError: a fake decode would misreport the audio
    stats."""
    b = bytes(content)
    if b[:4] == b"fLaC":
        from streamsum_spark.operators.flac import decode_flac

        return decode_flac(b)
    if b[:4] == b"FORM" and b[8:12] in (b"AIFF", b"AIFC"):
        return _decode_aiff(b)
    if b[:4] == b".snd":
        return _decode_au(b)
    if b[:3] == b"ID3":
        # ID3v2 tags prefix MP3 *and*, in the wild, FLAC — skip the tag
        # and re-sniff before committing to the MPEG-audio path, else an
        # ID3-tagged FLAC gets quarantined despite being decodable
        from streamsum_spark.operators.mp3 import _skip_id3v2, decode_mp3

        j = _skip_id3v2(b, 0)
        if b[j : j + 4] == b"fLaC":
            from streamsum_spark.operators.flac import decode_flac

            return decode_flac(b[j:])
        return decode_mp3(b)
    if len(b) > 1 and b[0] == 0xFF and b[1] & 0xE0 == 0xE0:
        # MPEG audio: framing parses and validates (mp3.py), spectral
        # decode honestly refuses — see mp3.decode_mp3's rationale
        from streamsum_spark.operators.mp3 import decode_mp3

        return decode_mp3(b)
    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        # a video container's soundtrack: the first auds stream's
        # WAVEFORMATEX + '##wb' chunks rebuild as a WAV and re-enter
        # here (operators/avi.py) — same formats, same refusals
        from streamsum_spark.operators.avi import decode_avi_audio

        return decode_avi_audio(b)
    if len(b) >= 12 and b[4:8] == b"ftyp":
        # MOV/MP4 PCM audio tracks ('sowt'/'twos') via the sample
        # tables; compressed codecs (mp4a AAC) refuse by name
        from streamsum_spark.operators.mp4_frames import decode_mp4_audio

        return decode_mp4_audio(b)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise NotImplementedError("only RIFF/WAVE audio supported")
    fmt = data = None
    i = 12
    while i + 8 <= len(b):
        cid, sz = b[i : i + 4], struct.unpack_from("<I", b, i + 4)[0]
        if cid == b"fmt ":
            if i + 8 + 16 > len(b) or sz < 16:  # "<HHIIHH" needs 16 bytes
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", b, i + 8)
        elif cid == b"data":
            data = b[i + 8 : i + 8 + sz]
        i += 8 + sz + (sz & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, nch, rate, _, block_align, bits = fmt
    if nch < 1:
        raise ValueError("corrupt WAV: zero channels")
    if audio_fmt == 1 and bits == 16:
        samples = np.frombuffer(data, dtype="<i2")
    elif audio_fmt in (6, 7) and bits == 8:
        samples = _decode_g711(data, "alaw" if audio_fmt == 6 else "mu")
    elif audio_fmt == 0x11 and bits == 4:
        # a block needs a 4-byte header PER CHANNEL; a declared
        # block_align below that would slice undersized blocks and
        # crash channel 1's header unpack mid-decode
        try:
            samples = _decode_ima_adpcm(data, nch, max(block_align, 4 * nch))
        except (struct.error, IndexError) as exc:
            raise ValueError(f"corrupt IMA ADPCM stream: {exc}") from exc
    else:
        raise NotImplementedError(
            f"WAV format tag {audio_fmt} ({bits}-bit) not supported"
        )
    samples = samples[: (len(samples) // nch) * nch].reshape(-1, nch)
    return samples, rate


def _image_feature(px: np.ndarray) -> list[float]:
    """Real pixel statistics, unit-scaled: per-channel means, gray std /
    min / max, and normalized dimensions.  Deterministic by construction."""
    g = px.astype(np.float32).mean(axis=2)
    return [
        float(px[:, :, 0].mean() / 255.0),
        float(px[:, :, 1].mean() / 255.0),
        float(px[:, :, 2].mean() / 255.0),
        float(g.std() / 255.0),
        float(g.min() / 255.0),
        float(g.max() / 255.0),
        float(px.shape[1] / 1024.0),
        float(px.shape[0] / 1024.0),
    ]


def _audio_feature(samples: np.ndarray, rate: int) -> list[float]:
    """Real sample statistics: RMS, peak, mean, zero-cross rate, duration."""
    x = samples.astype(np.float32) / 32768.0
    mono = x.mean(axis=1)
    zc = float(np.mean(np.abs(np.diff(np.signbit(mono).astype(np.int8))))) if len(mono) > 1 else 0.0
    return [
        float(np.sqrt(np.mean(x * x))),
        float(np.abs(x).max() if x.size else 0.0),
        float(mono.mean() if mono.size else 0.0),
        zc,
        float(len(mono) / rate),
        float(rate / 48000.0),
        float(samples.shape[1]),
        0.0,
    ]


def _fake_feature(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for codec formats we cannot decode here:
    derives `dim` floats from the byte content (stable across runs)."""
    if content is None:
        return [0.0] * dim
    acc, out = 2166136261, []
    for i, b in enumerate(content):
        acc = (acc ^ b) * 16777619 % (1 << 32)
        if i % max(1, len(content) // dim) == 0 and len(out) < dim:
            out.append((acc % 2000) / 1000.0 - 1.0)
    while len(out) < dim:
        acc = acc * 16777619 % (1 << 32)
        out.append((acc % 2000) / 1000.0 - 1.0)
    return out


def _byte_budget_chunks(
    batches: "Iterator[pd.DataFrame]", byte_budget: int, row_cap: int
) -> "Iterator[pd.DataFrame]":
    """Re-slice incoming Arrow batches so each processed chunk holds at
    most ``byte_budget`` cumulative content bytes (and ``row_cap`` rows).

    Spark slices mapInPandas input by ROW COUNT only
    (spark.sql.execution.arrow.maxRecordsPerBatch; the byte-based
    maxBytesPerBatch conf applies only to transformWithState), so a
    default 10k-row batch of multi-MB blobs is an executor-memory cliff
    the per-blob dimension caps don't bound.  Slicing here bounds what
    the decode loop and each yielded output frame hold live at once —
    iloc slices share the parent's buffers (no copy), and the parent
    batch itself is released as soon as the iterator advances.  A chunk
    always takes at least one row, so a single blob larger than the
    budget still processes (its size is bounded upstream by the source's
    per-blob cap, not here)."""
    for pdf in batches:
        n = len(pdf)
        if n == 0:
            continue
        sizes = pdf["content"].map(lambda c: len(c) if c is not None else 0)
        start = 0
        cum = 0
        for i in range(n):
            cum += int(sizes.iat[i])
            rows = i - start + 1
            if cum >= byte_budget or rows >= row_cap or i == n - 1:
                yield pdf.iloc[start : i + 1]
                start = i + 1
                cum = 0


def extract_features(
    media: DataFrame,
    batch_hint: int = 256,
    byte_budget: int = 64 << 20,
) -> DataFrame:
    """mapInPandas feature extraction over binary content.

    Arrow streams batches of (media_id, content); Python touches each blob
    once.  BMP/PNM images and PCM WAV audio decode for real (header parse
    -> array -> channel statistics); codec formats fall back to the
    deterministic byte fingerprint with decoded=false so downstream can
    filter or route them to a codec-equipped cluster.

    Each processed chunk is bounded by ``byte_budget`` cumulative blob
    bytes AND ``batch_hint`` rows (_byte_budget_chunks), sized so chunk +
    decode intermediates fit executor memory at 100 TB blob mixes."""
    import hashlib

    def one(content) -> tuple[bool, int | None, int | None, int | None, list[float]]:
        if content is None:
            return False, None, None, None, _fake_feature(content)
        b = bytes(content)
        try:
            # RIFF is a shared container: WAVE routes to audio, WEBP to
            # the image path (both VP8L and lossy VP8 decode)
            if (b[:4] == b"RIFF" and b[8:12] == b"WAVE" or b[:4] == b"fLaC"
                    or (b[:4] == b"FORM" and b[8:12] in (b"AIFF", b"AIFC"))
                    or b[:4] == b".snd" or b[:3] == b"ID3"
                    or (len(b) > 1 and b[0] == 0xFF and b[1] & 0xE0 == 0xE0)):
                samples, rate = decode_audio(b)
                return True, None, None, int(samples.shape[1]), _audio_feature(samples, rate)
            px = decode_image(b)
            return True, int(px.shape[1]), int(px.shape[0]), int(px.shape[2]), _image_feature(px)
        except (NotImplementedError, ValueError, struct.error):
            # struct.error: malformed container headers past the magic
            # check — one bad blob must fall back, not fail the task
            return False, None, None, None, _fake_feature(b)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in _byte_budget_chunks(batches, byte_budget, batch_hint):
            decoded = pdf["content"].map(one)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["content"].map(lambda c: len(c) if c is not None else 0),
                    "content_sha": pdf["content"].map(
                        lambda c: hashlib.sha256(c).hexdigest() if c is not None else None
                    ),
                    "decoded": decoded.map(lambda t: t[0]),
                    "width": decoded.map(lambda t: t[1]).astype("Int32"),
                    "height": decoded.map(lambda t: t[2]).astype("Int32"),
                    "channels": decoded.map(lambda t: t[3]).astype("Int32"),
                    "feature": decoded.map(lambda t: t[4]),
                }
            )

    return media.select("media_id", "content").mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling *plan*: one row per (media_id, frame_ts_ms) without
    decoding — pure sequence/explode arithmetic, JVM-side.  The plan is
    the cheap half of sampled decode: extract_sampled_frames consumes it
    to decode ONLY the frames the timestamps select."""
    # strictly positive, not just non-null: sequence(0, -1, step)
    # THROWS in Spark, so a single zero-duration row (a truncated or
    # still-uploading clip is exactly how these appear in a crawl)
    # must not be able to fail the whole job
    return (
        media.where(F.col("duration_ms") > 0)
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def decode_apng_frames(b: bytes) -> list[tuple[int, int, np.ndarray]]:
    """Decode EVERY frame of a (possibly animated) PNG, composited onto
    the IHDR canvas: [(start_ms, duration_ms, (h, w, 3) uint8 RGB), ...]
    in presentation order.  A PNG without an acTL chunk returns one
    zero-duration frame.

    APNG semantics (PNG spec third edition): acTL declares the frame
    count; each frame is an fcTL (region, delay as num/den seconds,
    dispose_op, blend_op) followed by its data — the shared IDAT when an
    fcTL precedes it (that frame must cover the full canvas at (0,0)),
    else fdAT chunks (4-byte sequence number stripped, concatenated).
    An IDAT with NO preceding fcTL is the non-animated default image and
    takes no part in compositing.  Each frame's data decodes as a
    standalone PNG reusing the stream's bit depth / color type /
    PLTE+tRNS with the fcTL's dimensions.  blend_op 0 replaces the rect
    (alpha included), 1 alpha-composites OVER (straight alpha, integer
    round-half-up — same arithmetic as the WebP compositor); dispose_op
    1 clears the rect to fully-transparent black, 2 restores the
    pre-frame rect.  The canvas starts fully transparent; emitted frames
    flatten over black (PNG has no background-color chunk in play).
    Sequence numbers must be exactly 0..N-1 in order."""
    b = bytes(b)
    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    ihdr = None
    plte = trns = None
    actl = None
    frames_raw: list[dict] = []
    default_idat_seen = False
    seqs: list[int] = []
    i = 8
    while i + 8 <= len(b):
        ln = int.from_bytes(b[i : i + 4], "big")
        typ = b[i + 4 : i + 8]
        if i + 8 + ln > len(b):
            raise ValueError("truncated PNG chunk")
        data = b[i + 8 : i + 8 + ln]
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"PLTE":
            plte = data
        elif typ == b"tRNS":
            trns = data
        elif typ == b"acTL":
            actl = struct.unpack(">II", data[:8])
        elif typ == b"fcTL":
            if len(data) < 26:
                raise ValueError("truncated fcTL")
            (seq, fw, fh, fx, fy, dnum, dden, dispose, blend) = struct.unpack(
                ">IIIIIHHBB", data[:26]
            )
            seqs.append(seq)
            frames_raw.append(
                {"w": fw, "h": fh, "x": fx, "y": fy, "dnum": dnum,
                 "dden": dden, "dispose": dispose, "blend": blend,
                 "data": bytearray()}
            )
        elif typ == b"IDAT":
            if frames_raw:
                frames_raw[-1]["data"] += data
            else:
                default_idat_seen = True
        elif typ == b"fdAT":
            if len(data) < 4 or not frames_raw:
                raise ValueError("fdAT without fcTL")
            seqs.append(int.from_bytes(data[:4], "big"))
            frames_raw[-1]["data"] += data[4:]
        elif typ == b"IEND":
            break
        i += 12 + ln
    if ihdr is None:
        raise ValueError("missing IHDR")
    if actl is None:
        return [(0, 0, decode_image(b))]
    w, h = struct.unpack(">II", ihdr[:8])
    if seqs != list(range(len(seqs))):
        raise ValueError("APNG sequence numbers out of order")
    if actl[0] != len(frames_raw) or not frames_raw:
        raise ValueError("acTL frame count mismatch")
    from streamsum_spark.operators._compositing import (
        MAX_FRAMES_BYTES, check_canvas,
    )

    # bound the canvas ALLOCATION (int32 RGBA + same-sized flatten/blend
    # temporaries) and the cumulative emitted output separately
    check_canvas(w, h, "APNG")
    if w * h * 4 * (len(frames_raw) + 1) > MAX_FRAMES_BYTES:
        raise ValueError("APNG exceeds the composited-output cap")
    if not default_idat_seen:
        f0 = frames_raw[0]
        if (f0["w"], f0["h"], f0["x"], f0["y"]) != (w, h, 0, 0):
            raise ValueError("APNG first frame must cover the canvas")

    def chunk(typ: bytes, data: bytes) -> bytes:
        import zlib as _z

        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", _z.crc32(typ + data) & 0xFFFFFFFF))

    canvas = np.zeros((h, w, 4), dtype=np.int32)
    frames: list[tuple[int, int, np.ndarray]] = []
    t = 0
    for fr in frames_raw:
        fw, fh, fx, fy = fr["w"], fr["h"], fr["x"], fr["y"]
        if fx + fw > w or fy + fh > h or not fw or not fh:
            raise ValueError("APNG frame exceeds the canvas")
        sub_ihdr = struct.pack(">II", fw, fh) + ihdr[8:]
        sub = _PNG_SIG + chunk(b"IHDR", sub_ihdr)
        if plte is not None:
            sub += chunk(b"PLTE", plte)
        if trns is not None:
            sub += chunk(b"tRNS", trns)
        sub += chunk(b"IDAT", bytes(fr["data"])) + chunk(b"IEND", b"")
        px = _decode_png(sub, rgba=True).astype(np.int32)
        region = canvas[fy : fy + fh, fx : fx + fw]
        saved = region.copy() if fr["dispose"] == 2 else None
        if fr["blend"] == 0:  # source: replace, alpha included
            region[:] = px
        else:  # over: straight-alpha, round half up (shared compositor)
            from streamsum_spark.operators._compositing import over

            over(region, px)
        a = canvas[:, :, 3:4]
        flat = ((canvas[:, :, :3] * a + 127) // 255).astype(np.uint8)
        dur = round(1000 * fr["dnum"] / (fr["dden"] or 100))
        frames.append((t, dur, flat))
        t += dur
        if fr["dispose"] == 1:
            region[:] = 0
        elif fr["dispose"] == 2:
            region[:] = saved
    return frames


def encode_apng(
    frames: list,
    delays_ms: list[int],
    offsets: list[tuple[int, int]] | None = None,
    blends: list[int] | None = None,
    disposes: list[int] | None = None,
    canvas: tuple[int, int] | None = None,
) -> bytes:
    """Test-fixture APNG: IHDR at canvas size, acTL, frame 0 as
    fcTL+IDAT (spec requires it to cover the canvas), later frames as
    fcTL+fdAT.  ``frames`` are (h, w, 3|4) uint8 (all the same channel
    count); delays are exact-millisecond fcTL fractions (num/1000).
    ``blends[i]``/``disposes[i]`` are the raw fcTL ops (blend: 0 source,
    1 over; dispose: 0 none, 1 background, 2 previous)."""
    import zlib as _z

    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    offsets = offsets or [(0, 0)] * len(frames)
    blends = blends if blends is not None else [0] * len(frames)
    disposes = disposes or [0] * len(frames)
    ch, cw = canvas or frames[0].shape[:2]
    ctype = 6 if frames[0].shape[2] == 4 else 2

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", _z.crc32(typ + data) & 0xFFFFFFFF))

    def idat_of(px: np.ndarray) -> bytes:
        blob = encode_png(px, color_type=ctype)
        i = 8
        while True:
            ln = int.from_bytes(blob[i : i + 4], "big")
            typ = blob[i + 4 : i + 8]
            if typ == b"IDAT":
                return blob[i + 8 : i + 8 + ln]
            i += 12 + ln

    out = bytearray(_PNG_SIG)
    out += chunk(b"IHDR", struct.pack(">IIBBBBB", cw, ch, 8, ctype, 0, 0, 0))
    out += chunk(b"acTL", struct.pack(">II", len(frames), 0))
    seq = 0
    for k, (f, delay, (x, y), blend, disp) in enumerate(
        zip(frames, delays_ms, offsets, blends, disposes)
    ):
        fh, fw = f.shape[:2]
        out += chunk(b"fcTL", struct.pack(
            ">IIIIIHHBB", seq, fw, fh, x, y, delay, 1000, disp, blend
        ))
        seq += 1
        data = idat_of(f)
        if k == 0:
            out += chunk(b"IDAT", data)
        else:
            out += chunk(b"fdAT", struct.pack(">I", seq) + data)
            seq += 1
    out += chunk(b"IEND", b"")
    return bytes(out)


def decode_frames(content: bytes) -> list[tuple[int, int, np.ndarray]]:
    """All frames of an animated GIF/WebP/APNG — or of an MJPEG /
    24-bit-DIB AVI video (operators/avi.py) — as [(start_ms,
    duration_ms, RGB canvas)], or a single zero-duration frame for any
    other decodable image.  The animated decoders composite delta
    frames, transparency, and disposal/blend modes onto the logical
    canvas (gif.decode_gif_frames / webp.decode_webp_frames /
    decode_apng_frames), so every entry is a full presentation-ready
    frame."""
    b = bytes(content)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        from streamsum_spark.operators.gif import decode_gif_frames

        return decode_gif_frames(b)
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        from streamsum_spark.operators.webp import decode_webp_frames

        return decode_webp_frames(b)
    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        from streamsum_spark.operators.avi import decode_avi_frames

        return decode_avi_frames(b)
    if len(b) >= 12 and b[4:8] == b"ftyp":
        from streamsum_spark.operators.mp4_frames import decode_mp4_frames

        return decode_mp4_frames(b)
    if b[:8] == _PNG_SIG:
        return decode_apng_frames(b)
    return [(0, 0, decode_image(b))]


def frames_at_iter(
    content: bytes, ts_list: list[int]
) -> Iterator[tuple[int, np.ndarray]]:
    """Lazily yield (frame_idx, pixels) per requested timestamp — the
    decode half of sampled frame extraction.  Containers whose frames
    are independent and whose frame clock is analytic decode ONLY the
    selected frames, one live at a time (AVI MJPEG/DIB:
    iter_avi_frames_at — a 1-hour clip sampled every second pays ~4% of
    a full decode and holds ONE decoded frame, not 3.6k of them);
    animated GIF/APNG/WebP frames delta-composite onto a canvas, so
    they need the full decode_frames pass regardless of how few
    timestamps are asked for.  Mapping in both paths: the frame whose
    [start, next_start) span covers the timestamp; timestamps past the
    last frame hold it."""
    import bisect

    b = bytes(content)
    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        from streamsum_spark.operators.avi import iter_avi_frames_at

        yield from iter_avi_frames_at(b, ts_list)
        return
    if len(b) >= 12 and b[4:8] == b"ftyp":
        from streamsum_spark.operators.mp4_frames import iter_mp4_frames_at

        yield from iter_mp4_frames_at(b, ts_list)
        return
    frames = decode_frames(b)
    starts = [s for s, _, _ in frames]
    for t in ts_list:
        j = max(0, bisect.bisect_right(starts, int(t)) - 1)
        yield j, frames[j][2]


def frames_at(content: bytes, ts_list: list[int]) -> list[tuple[int, np.ndarray]]:
    """Materialized frames_at_iter (point lookups and tests; a long
    sampled clip should be consumed lazily — extract_sampled_frames
    does)."""
    return list(frames_at_iter(content, ts_list))


FRAME_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_ts_ms", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), True),
        T.StructField("decoded", T.BooleanType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def extract_sampled_frames(
    media: DataFrame,
    every_ms: int = 1000,
    batch_hint: int = 64,
    byte_budget: int = 64 << 20,
) -> DataFrame:
    """Sampled-frame feature extraction: frame_sample_plan's timestamps
    DRIVE the decode (r8 verdict item 5) — each visual blob is decoded
    ONCE per task and serves all of its sampled timestamps, emitting one
    feature row per (media_id, frame_ts_ms).

    Plan shape: the plan aggregates to a per-media sorted timestamp list
    JVM-side (collect_list is bounded by duration/every_ms, not corpus
    size), joins to the content relation on media_id (both sides hash on
    the key; the list side is tiny so AQE broadcast-joins it when it
    fits), and one mapInPandas pass decodes via frames_at — which pays
    only for the SELECTED frames where the container allows (AVI), and
    one full decode otherwise.  Timestamp→frame mapping: the frame
    whose [start, start+duration) span covers the timestamp; timestamps
    past the last frame hold it (player semantics).  Stills have one
    zero-duration frame covering every timestamp.  Undecodable blobs
    emit decoded=false fingerprint rows per timestamp, mirroring
    extract_features' error isolation."""
    plan = frame_sample_plan(media, every_ms)
    visual = media.where(
        F.col("mime").startswith("image/") | F.col("mime").startswith("video/")
    )
    ts_lists = (
        plan.join(visual.select("media_id"), "media_id", "left_semi")
        .groupBy("media_id")
        .agg(F.sort_array(F.collect_list("frame_ts_ms")).alias("ts_list"))
    )
    src = visual.select("media_id", "content").join(ts_lists, "media_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in _byte_budget_chunks(batches, byte_budget, batch_hint):
            out: dict[str, list] = {k.name: [] for k in FRAME_FEATURE_SCHEMA}
            for media_id, content, ts_list in zip(
                pdf["media_id"], pdf["content"], pdf["ts_list"]
            ):
                ts = [int(t) for t in ts_list]
                # consume lazily: each frame folds into its (small)
                # feature row immediately, so the selective AVI path
                # holds ONE decoded frame regardless of sample count.
                # Buffer this media's rows and commit only on success:
                # a frame that fails mid-stream (corrupt chunk 7 of 10)
                # must yield all-decoded=false rows, not a partial mix.
                rows: list[tuple] = []
                try:
                    for j, px in frames_at_iter(content, ts):
                        rows.append(
                            (j, True, px.shape[1], px.shape[0],
                             _image_feature(px))
                        )
                except (NotImplementedError, ValueError, struct.error):
                    rows = [
                        (None, False, None, None, _fake_feature(bytes(content)))
                    ] * len(ts)
                for t, (j, ok, w, h, feat) in zip(ts, rows):
                    out["media_id"].append(int(media_id))
                    out["frame_ts_ms"].append(t)
                    out["frame_idx"].append(j)
                    out["decoded"].append(ok)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["feature"].append(feat)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out["media_id"], dtype="int64"),
                    "frame_ts_ms": pd.Series(out["frame_ts_ms"], dtype="int64"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="Int32"),
                    "decoded": pd.Series(out["decoded"], dtype="bool"),
                    "width": pd.Series(out["width"], dtype="Int32"),
                    "height": pd.Series(out["height"], dtype="Int32"),
                    "feature": out["feature"],
                }
            )

    return src.mapInPandas(run, FRAME_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# encoders (test fixtures; also the proof the decoders parse real headers)
# ---------------------------------------------------------------------------


def encode_bmp(px: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit BI_RGB BMP
    (bottom-up rows, 4-byte padded, BGR byte order)."""
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = px[:, :, ::-1].reshape(h, w * 3)
    data = rows[::-1].tobytes()
    return (
        struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
        + data
    )


def encode_ppm(px: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as binary P6 (with a comment
    line, so the decoder's comment handling is exercised by fixtures)."""
    h, w, _ = px.shape
    return b"P6\n# streamsum test fixture\n%d %d\n255\n" % (w, h) + px.tobytes()


def encode_png(px: np.ndarray, filter_type: int = 0, color_type: int = 2) -> bytes:
    """Encode a uint8 array as a PNG (8-bit, non-interlaced) applying the
    SAME row filter to every scanline — the encoder-side inverse of
    _png_unfilter_row, so fixtures can exercise each of the five filters.
    ``color_type``: 0 gray (h, w), 2 RGB (h, w, 3), 6 RGBA (h, w, 4)."""
    import zlib

    nch = _PNG_NCH[color_type]
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    assert c == nch, (c, nch)
    flat = px.reshape(h, w * nch).astype(np.int32)
    lines = bytearray()
    prev = np.zeros(w * nch, dtype=np.int32)
    for y in range(h):
        row = flat[y]
        if filter_type == 0:
            filt = row
        elif filter_type == 2:
            filt = (row - prev) % 256
        else:
            filt = np.empty_like(row)
            for x in range(len(row)):
                left = int(row[x - nch]) if x >= nch else 0
                up = int(prev[x])
                if filter_type == 1:
                    filt[x] = (row[x] - left) % 256
                elif filter_type == 3:
                    filt[x] = (row[x] - (left + up) // 2) % 256
                else:  # paeth
                    ul = int(prev[x - nch]) if x >= nch else 0
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                    filt[x] = (row[x] - pred) % 256
        lines.append(filter_type)
        lines += filt.astype(np.uint8).tobytes()
        prev = row

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Encode mono/stereo int16 samples as a PCM16 RIFF WAV."""
    if samples.ndim == 1:
        samples = samples[:, None]
    nch = samples.shape[1]
    data = samples.astype("<i2").tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, nch, rate, rate * 2 * nch, 2 * nch, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def encode_aiff(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Encode mono/stereo int16 samples as big-endian PCM AIFF (COMM
    with the 80-bit extended-float rate + SSND)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    nframes, nch = samples.shape
    # 80-bit extended float for an integer rate: exponent so the
    # 64-bit mantissa's top bit is the integer MSB
    e = rate.bit_length() - 1
    mant = rate << (63 - e)
    f80 = struct.pack(">HQ", 16383 + e, mant)
    comm = struct.pack(">hIh", nch, nframes, 16) + f80
    data = samples.astype(">i2").tobytes()
    ssnd = struct.pack(">II", 0, 0) + data
    body = (b"AIFF" + b"COMM" + struct.pack(">I", len(comm)) + comm
            + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd)
    return b"FORM" + struct.pack(">I", len(body)) + body


def encode_au(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Encode mono/stereo int16 samples as big-endian PCM16 Sun AU."""
    if samples.ndim == 1:
        samples = samples[:, None]
    nch = samples.shape[1]
    data = samples.astype(">i2").tobytes()
    return struct.pack(">IIIIII", 0x2E736E64, 24, len(data), 3, rate,
                       nch) + data


def encode_ico(px: np.ndarray, inner: str = "bmp") -> bytes:
    """Encode RGB pixels as a one-entry ICO: inner='bmp' writes a
    32bpp DIB (doubled biHeight, XOR image + all-opaque AND mask),
    inner='png' embeds a PNG (the modern favicon form)."""
    h, w = px.shape[:2]
    if not (0 < w <= 256 and 0 < h <= 256):
        raise ValueError("ICO entries are at most 256x256")
    if inner == "png":
        img = encode_png(px)
        bpp = 32
    else:
        bgra = np.zeros((h, w, 4), np.uint8)
        bgra[:, :, 0] = px[:, :, 2]
        bgra[:, :, 1] = px[:, :, 1]
        bgra[:, :, 2] = px[:, :, 0]
        bgra[:, :, 3] = 255
        xor = bgra[::-1].tobytes()  # bottom-up, stride = 4w (aligned)
        and_stride = ((w + 31) // 32) * 4
        mask = b"\x00" * (and_stride * h)
        img = struct.pack("<IiiHHIIiiII", 40, w, 2 * h, 1, 32, 0,
                          len(xor) + len(mask), 0, 0, 0, 0) + xor + mask
        bpp = 32
    entry = struct.pack("<BBBBHHII", w & 0xFF, h & 0xFF, 0, 0, 1, bpp,
                        len(img), 22)
    return struct.pack("<HHH", 0, 1, 1) + entry + img


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic real-format media table for tests: BMP (every 6th
    replaced by a WebP since round 8 — alternating VP8L lossless
    cycling its transforms and lossy VP8 key frames from the in-repo
    encoder cycling token-partition counts and filter types, so the
    default pipeline exercises both WebP decoders),
    PPM (every other PPM slot a TIFF since round 8, cycling
    LZW/PackBits/Deflate and the horizontal predictor), PNG (cycling
    all five row filters), animated GIF/WebP/APNG rows with real
    durations (round 9), structurally-valid MPEG-audio rows exercising
    the quarantine path (round 9), and JPEG — alternating
    4:4:4 and 4:2:0, alternating BASELINE and PROGRESSIVE encodings
    (most web JPEGs over ~64 KB are progressive, so the default
    pipeline path must exercise it) — images with gradient pixels, plus
    PCM WAV tones; every blob decodes with the stdlib decoders above,
    no codec libs needed."""
    from streamsum_spark.operators.jpeg import encode_jpeg, encode_jpeg_progressive
    from streamsum_spark.operators.webp import encode_webp_lossless

    if n in _SYNTHETIC_ROWS_CACHE:  # deterministic per n — memoized so
        # repeated bench/test calls don't re-run the fixture encoders
        return spark.createDataFrame(_SYNTHETIC_ROWS_CACHE[n], MEDIA_SCHEMA)
    rows = []
    for i in range(n):
        kind = i % 3
        if kind < 2:
            w, h = 16 + i % 13, 8 + i % 7
            yy, xx = np.mgrid[0:h, 0:w]
            px = np.stack(
                [(xx * 7 + i) % 256, (yy * 11 + 2 * i) % 256, (xx + yy + 3 * i) % 256],
                axis=2,
            ).astype(np.uint8)
            if kind == 0:
                if (i // 3) % 2 == 1:
                    if (i // 6) % 2 == 1:
                        from streamsum_spark.operators.vp8_encode import (
                            encode_webp_lossy,
                        )

                        content, mime = (
                            encode_webp_lossy(
                                px, quality=88,
                                n_parts=(1, 2)[(i // 12) % 2],
                                filter_simple=(i // 24) % 2,
                            ),
                            "image/webp",
                        )
                    else:
                        tr = (None, "subtract_green", "predictor")[
                            (i // 6) % 3]
                        content, mime = (
                            encode_webp_lossless(px, transform=tr),
                            "image/webp",
                        )
                elif (i // 6) % 3 == 2:
                    content, mime = (
                        encode_ico(px, inner=("bmp", "png")[(i // 12) % 2]),
                        "image/x-icon",
                    )
                elif (i // 6) % 3 == 1 and (i // 18) % 2 == 1:
                    # animated: 3-frame GIF (delta frame + disposal) or
                    # 3-frame lossless WebP (RGBA delta, alpha blend),
                    # alternating — carries duration_ms so the
                    # frame-sampling pipeline has real rows to drive
                    from streamsum_spark.operators.gif import (
                        encode_gif_animated,
                    )
                    from streamsum_spark.operators.webp import (
                        encode_webp_animated,
                    )

                    q = (px // 64) * 64  # <= 64 colors for the GIF palette
                    f2 = np.roll(q, 3, axis=1)
                    f3 = np.roll(q, 2, axis=0)
                    if (i // 36) % 3 == 2:
                        d = np.dstack(
                            [f2[: h // 2], np.full((h // 2, w), 255, np.uint8)]
                        )
                        d[1::2, ::4, 3] = 0
                        content, mime = (
                            encode_apng(
                                [np.dstack([q, np.full((h, w), 255, np.uint8)]),
                                 d, np.dstack([f3, np.full((h, w), 255, np.uint8)])],
                                [40, 60, 80],
                                offsets=[(0, 0), (0, 2), (0, 0)],
                                blends=[0, 1, 0],
                                disposes=[0, 2, 0],
                                canvas=(h, w),
                            ),
                            "image/apng",
                        )
                        rows.append((i, mime, w, h, 180, content))
                        continue
                    if (i // 36) % 3 == 0:
                        content, mime = (
                            encode_gif_animated(
                                [q, f2[: h // 2], f3],
                                [10, 20, 30],
                                disposals=[1, 3, 0],
                                offsets=[(0, 0), (1, 1), (0, 0)],
                                canvas=(h, w),
                            ),
                            "image/gif",
                        )
                    else:
                        d = np.dstack(
                            [f2[: h // 2], np.full((h // 2, w), 255, np.uint8)]
                        )
                        d[::2, ::3, 3] = 0  # punch-through pixels
                        content, mime = (
                            encode_webp_animated(
                                [q, d, f3],
                                [100, 150, 200],
                                offsets=[(0, 0), (0, 2), (0, 0)],
                                blends=[True, True, False],
                                disposals=[0, 1, 0],
                                canvas=(h, w),
                            ),
                            "image/webp",
                        )
                    rows.append((i, mime, w, h, 60 * 10 if mime ==
                                 "image/gif" else 450, content))
                    continue
                else:
                    content, mime = encode_bmp(px), "image/bmp"
            elif (i // 3) % 2 == 0:
                if (i // 3) % 4 == 0:
                    if (i // 12) % 2 == 1:
                        from streamsum_spark.operators.tiff import encode_tiff

                        comp = ("lzw", "packbits", "deflate")[(i // 24) % 3]
                        # predictor only where the spec defines it
                        # (encode_tiff refuses the out-of-spec combo)
                        pred = 1 + (i // 24) % 2 if comp != "packbits" else 1
                        content, mime = (
                            encode_tiff(px, compression=comp, predictor=pred),
                            "image/tiff",
                        )
                    else:
                        content, mime = encode_ppm(px), "image/x-portable-pixmap"
                else:
                    enc = encode_jpeg if (i // 12) % 2 == 0 else encode_jpeg_progressive
                    content, mime = (
                        enc(px, quality=92, subsampling=(1 + (i // 6) % 2,) * 2),
                        "image/jpeg",
                    )
            else:
                content, mime = encode_png(px, filter_type=(i // 6) % 5), "image/png"
            rows.append((i, mime, w, h, None, content))
        else:
            if (i // 3) % 8 == 7:
                # MPEG audio: structurally VALID Layer III framing with
                # deterministic (non-audio) payload bytes — spectral
                # decode honestly refuses (mp3.py), so these rows
                # exercise the sniff -> refusal -> decoded=false
                # quarantine path inside the DEFAULT pipeline mix, the
                # posture a real crawl (overwhelmingly MP3) hits.
                # MPEG-1 L3 128k/32kHz: exactly 576 bytes/frame, no pad.
                n_frames = 2 + i % 5
                hdr = (0x7FF << 21 | 3 << 19 | 1 << 17 | 1 << 16
                       | 9 << 12 | 2 << 10 | 3 << 6).to_bytes(4, "big")
                body = bytes((j * 37 + i) % 256 for j in range(572))
                rows.append((
                    i, "audio/mpeg", None, None,
                    round(n_frames * 1152 * 1000 / 32000),
                    (hdr + body) * n_frames,
                ))
                continue
            rate, dur_ms = 8000, 1000 * (1 + i % 7)
            t = np.arange(rate * dur_ms // 1000)
            tone = (3000 * np.sin(2 * np.pi * (110 + i) * t / rate)).astype(np.int16)
            enc, mime = ((encode_wav, "audio/wav"), (encode_aiff, "audio/aiff"),
                         (encode_au, "audio/basic"))[(i // 3) % 3]
            rows.append((i, mime, None, None, dur_ms, enc(tone, rate)))
    _SYNTHETIC_ROWS_CACHE[n] = rows
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


_SYNTHETIC_ROWS_CACHE: dict[int, list] = {}
