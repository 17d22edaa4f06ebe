"""WebP lossless (VP8L) decoder in pure stdlib + numpy — no codec libs.

Written from the public WebP Lossless Bitstream Specification (RFC 9649
/ the webp container spec) the way jpeg.py was written from T.81 and the
PNG decoder from RFC 2083.  Covered surface:

- RIFF/WEBP container walk: bare ``VP8L`` files and extended ``VP8X``
  containers whose image chunk is VP8L.  Lossy ``VP8 `` payloads
  dispatch to vp8.py (RFC 6386 key-frame decoder, byte-exact vs
  libwebp), so both WebP flavors decode.
- The VP8L entropy layer: canonical prefix codes (simple 1/2-symbol and
  full code-length-coded forms with 16/17/18 repeats and the optional
  max_symbol early-out), LSB-first bit reader with DEFLATE-style
  MSB-first code packing, per-tile meta prefix codes, color cache
  (0x1e35a7bd multiplicative hash), and LZ77 backward references with
  the 120-entry two-dimensional distance mapping.  The distance table
  is GENERATED from its definition — the 120 closest (dx, dy ∈
  dx -7..8, dy 0..7, dy>0 or dx>0) offsets ordered by euclidean
  distance, ties by larger dy first, positive dx before negative —
  which reproduces the spec's listed table exactly (sanity-pinned
  against its first entries in tests).
- All four transforms, inverse-applied in reverse bitstream order:
  predictor (14 modes incl. Select and the ClampAddSubtract pair, with
  the spec's flat-array edge semantics), cross-color (signed 3.5
  fixed-point deltas), subtract-green, and color indexing incl. the
  packed-pixel widths for palettes of ≤ 16 colors.

Validation posture: decode(encode(x)) == x roundtrips across all
transforms (``encode_webp_lossless`` below quantizes nothing — VP8L is
lossless, so roundtrips are byte-exact), crafted bitstreams pin the
color-cache and backward-reference paths, mutation fuzz pins the
hostile-input bounds, and — closing the gap earlier rounds documented —
externally-encoded streams from libwebp's own lossless encoder
(WebPEncodeLosslessRGB/RGBA through the test-only ctypes oracle) are
decoded byte-equal to libwebp's output, exercising meta prefix codes,
color cache + meta combinations, and degenerate code-length codes the
in-repo encoder never emits.  That external pin is what caught the
color-cache-info/meta-prefix field-order swap (the spec's ABNF puts
cache info first) which symmetric roundtrips could never see.

The ALPH chunk (lossy alpha plane) decodes both methods — raw and
compressed (a headerless VP8L image stream whose green channel is
alpha) — plus all four prediction filters; ``decode_webp_rgba``
composes it with the vp8.py luma/chroma decode, byte-equal to
WebPDecodeRGBA.

Hostile-input posture matches gif.py: declared dimensions are capped
before allocation (≤ _MAX_DECODED_BYTES), every prefix-code read is
bounded by the stored bytes, backward references are range-checked, and
malformed structure raises ValueError.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_DECODED_BYTES = 16 * 1024 * 1024

# code-length-code read order (spec: "kCodeLengthCodeOrder")
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _distance_map() -> list[tuple[int, int]]:
    """The 120 short-distance (dx, dy) offsets, generated from their
    definition instead of transcribing the spec's table: every offset
    with dx in [-7, 8], dy in [0, 7], pointing at an already-decoded
    pixel (dy > 0, or dy == 0 and dx > 0) — exactly 120 such — ordered
    by euclidean distance, larger dy first within ties, positive dx
    before its negative twin."""
    cands = [
        (dx, dy)
        for dy in range(8)
        for dx in range(-7, 9)
        if dy > 0 or dx > 0
    ]
    cands.sort(key=lambda p: (p[0] ** 2 + p[1] ** 2, -p[1], -(p[0] > 0), abs(p[0])))
    assert len(cands) == 120
    return cands


_DIST_MAP = _distance_map()


class _Bits:
    """LSB-first bit reader over the VP8L payload: an integer
    accumulator refilled a byte at a time — O(1) per read, no per-bit
    indexing (this is the decoder's hottest loop)."""

    __slots__ = ("d", "i", "acc", "cnt")

    def __init__(self, data: bytes):
        self.d = data
        self.i = 0  # next byte
        self.acc = 0
        self.cnt = 0  # bits in acc

    def read(self, n: int) -> int:
        acc, cnt, i, d = self.acc, self.cnt, self.i, self.d
        while cnt < n:
            if i >= len(d):
                raise ValueError("truncated VP8L stream")
            acc |= d[i] << cnt
            i += 1
            cnt += 8
        self.acc = acc >> n
        self.cnt = cnt - n
        self.i = i
        return acc & ((1 << n) - 1)

    def _peek(self, n: int) -> tuple[int, int]:
        """(next n bits LSB-packed zero-padded past EOF, bits actually
        available) — for the prefix-code LUT."""
        acc, cnt, i, d = self.acc, self.cnt, self.i, self.d
        while cnt < n and i < len(d):
            acc |= d[i] << cnt
            i += 1
            cnt += 8
        self.acc, self.cnt, self.i = acc, cnt, i
        return acc & ((1 << n) - 1), cnt

    def _consume(self, n: int) -> None:
        self.acc >>= n
        self.cnt -= n


class _Prefix:
    """Canonical prefix code (DEFLATE numbering): codes assigned in
    order of (length, symbol); the stream stores each code MSB-first,
    so the decoder accumulates left-shifted bits."""

    def __init__(self, lengths: list[int]):
        self.single = None
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise ValueError("empty prefix code")
        if len(nz) == 1:
            self.single = nz[0][1]
            return
        # completeness (kraft == 1) — an over/under-subscribed code is
        # corrupt and could otherwise loop the decode
        kraft = sum(2 ** -l for l, _ in nz)
        if abs(kraft - 1.0) > 1e-9:
            raise ValueError("invalid prefix code (kraft sum != 1)")
        # standard canonical construction (length-major, then symbol)
        self.table: dict[tuple[int, int], int] = {}
        next_code = 0
        prev_len = 0
        for l, s in sorted(nz):
            next_code <<= l - prev_len
            self.table[(l, next_code)] = s
            next_code += 1
            prev_len = l
        self.max_len = max(l for l, _ in nz)
        # one-level LUT over the next max_len bits in READ order (codes
        # pack MSB-first, the reader is LSB-first, so a code's j-th read
        # bit lands at key bit j) — one lookup per symbol instead of a
        # dict probe per bit.  Skipped for deep codes to bound build
        # cost under hostile many-group streams.
        self.lut = None
        if self.max_len <= 10:
            lut = [(-1, 0)] * (1 << self.max_len)
            for (l, code), s in self.table.items():
                key = 0
                for j in range(l):
                    key |= ((code >> (l - 1 - j)) & 1) << j
                for t in range(1 << (self.max_len - l)):
                    lut[key | (t << l)] = (s, l)
            self.lut = lut

    def decode(self, br: _Bits) -> int:
        if self.single is not None:
            return self.single
        if self.lut is not None:
            key, avail = br._peek(self.max_len)
            s, l = self.lut[key]
            if s < 0 or l > avail:
                raise ValueError("invalid prefix code word")
            br._consume(l)
            return s
        code = 0
        for l in range(1, self.max_len + 1):
            code = (code << 1) | br.read(1)
            s = self.table.get((l, code))
            if s is not None:
                return s
        raise ValueError("invalid prefix code word")


def _read_prefix_code(br: _Bits, alphabet_size: int) -> _Prefix:
    if br.read(1):  # simple code: 1 or 2 symbols
        num = br.read(1) + 1
        first_8 = br.read(1)
        s0 = br.read(8 if first_8 else 1)
        lengths = [0] * alphabet_size
        if num == 1:
            if s0 >= alphabet_size:
                raise ValueError("simple-code symbol out of range")
            lengths[s0] = 1  # single-symbol: decode consumes 0 bits
            p = _Prefix.__new__(_Prefix)
            p.single = s0
            return p
        s1 = br.read(8)
        if s0 >= alphabet_size or s1 >= alphabet_size or s0 == s1:
            raise ValueError("simple-code symbols out of range")
        lengths[s0] = lengths[s1] = 1
        return _Prefix(lengths)
    # full form: code-length code, then run-length-coded lengths
    n_cl = 4 + br.read(4)
    if n_cl > len(_CL_ORDER):
        raise ValueError("bad code-length count")
    cl_lengths = [0] * 19
    for i in range(n_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = _Prefix(cl_lengths)
    if br.read(1):  # limited number of coded symbols
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    sym = 0
    while sym < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_code.decode(br)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl:
                prev = cl
        elif cl == 16:
            for _ in range(3 + br.read(2)):
                if sym >= alphabet_size:
                    raise ValueError("prefix repeat overruns alphabet")
                lengths[sym] = prev
                sym += 1
        elif cl == 17:
            sym += 3 + br.read(3)
        else:  # 18
            sym += 11 + br.read(7)
        if sym > alphabet_size:
            raise ValueError("prefix repeat overruns alphabet")
    return _Prefix(lengths)


def _lz77_value(code: int, br: _Bits) -> int:
    """Shared length/distance prefix decoding: code -> value with the
    spec's (2 + (code & 1)) << extra  offset scheme."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


class _Group:
    __slots__ = ("g", "r", "b", "a", "d")

    def __init__(self, br: _Bits, cache_size: int):
        self.g = _read_prefix_code(br, 256 + 24 + cache_size)
        self.r = _read_prefix_code(br, 256)
        self.b = _read_prefix_code(br, 256)
        self.a = _read_prefix_code(br, 256)
        self.d = _read_prefix_code(br, 40)


def _decode_entropy_image(
    br: _Bits, w: int, h: int, is_main: bool
) -> np.ndarray:
    """One entropy-coded ARGB image (the spec's 'spatially-coded image'
    when is_main, else a transform/meta subimage): optional color cache,
    optional per-tile meta prefix codes (main image only), prefix-coded
    literals, LZ77 backrefs, cache hits.  Returns uint32 (h, w) ARGB."""
    if w <= 0 or h <= 0 or w * h * 4 > _MAX_DECODED_BYTES:
        raise ValueError("VP8L dimensions out of bounds")
    # field order per the spec's ABNF: spatially-coded-image =
    # color-cache-info meta-prefix data (cache info FIRST; pinned by
    # externally-encoded streams in tests — libwebp emits both fields)
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad color-cache size")
    meta = None
    meta_bits = 0
    n_groups = 1
    if is_main and br.read(1):  # meta prefix codes
        meta_bits = 2 + br.read(3)
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _decode_entropy_image(br, mw, mh, False)
        meta = ((meta_img >> 8) & 0xFFFF).astype(np.int64)  # (red<<8)|green
        n_groups = int(meta.max()) + 1
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size
    groups = [_Group(br, cache_size) for _ in range(n_groups)]
    out = np.zeros(w * h, dtype=np.uint32)
    pos = 0
    total = w * h

    def insert(argb: int) -> None:
        if cache_bits:
            cache[(0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - cache_bits)] = argb

    while pos < total:
        if meta is not None:
            x, y = pos % w, pos // w
            grp = groups[int(meta[y >> meta_bits, (x >> meta_bits)])]
        else:
            grp = groups[0]
        s = grp.g.decode(br)
        if s < 256:  # literal: G, R, B, A
            r = grp.r.decode(br)
            b = grp.b.decode(br)
            a = grp.a.decode(br)
            argb = (a << 24) | (r << 16) | (s << 8) | b
            out[pos] = argb
            insert(argb)
            pos += 1
        elif s < 256 + 24:  # backward reference
            length = _lz77_value(s - 256, br)
            dist_code = _lz77_value(grp.d.decode(br), br)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > total:
                raise ValueError("backward reference out of range")
            for _ in range(length):
                argb = int(out[pos - dist])
                out[pos] = argb
                insert(argb)
                pos += 1
        else:  # color-cache hit
            if not cache_bits:
                raise ValueError("cache hit without color cache")
            idx = s - 256 - 24
            if idx >= cache_size:
                raise ValueError("color-cache index out of range")
            out[pos] = cache[idx]
            pos += 1
    return out.reshape(h, w)


# ---- inverse transforms ---------------------------------------------

def _channels(argb: int) -> np.ndarray:
    return np.array(
        [(argb >> 24) & 0xFF, (argb >> 16) & 0xFF, (argb >> 8) & 0xFF, argb & 0xFF],
        dtype=np.int32,
    )


def _predict(mode: int, L, T, TL, TR):
    """One predicted pixel as a length-4 (A, R, G, B) sequence of
    uint8-range ints; L/T/TL/TR are the same.  Plain-int arithmetic —
    per-pixel numpy vectors cost ~20x more in this per-pixel loop.
    Modes per the spec's table."""
    if mode == 0:
        return (0xFF, 0, 0, 0)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return [((((L[i] + TR[i]) >> 1) + T[i]) >> 1) for i in range(4)]
    if mode == 6:
        return [(L[i] + TL[i]) >> 1 for i in range(4)]
    if mode == 7:
        return [(L[i] + T[i]) >> 1 for i in range(4)]
    if mode == 8:
        return [(TL[i] + T[i]) >> 1 for i in range(4)]
    if mode == 9:
        return [(T[i] + TR[i]) >> 1 for i in range(4)]
    if mode == 10:
        return [
            (((L[i] + TL[i]) >> 1) + ((T[i] + TR[i]) >> 1)) >> 1 for i in range(4)
        ]
    if mode == 11:  # Select
        p = [L[i] + T[i] - TL[i] for i in range(4)]
        pl = sum(abs(p[i] - L[i]) for i in range(4))
        pt = sum(abs(p[i] - T[i]) for i in range(4))
        return L if pl < pt else T
    if mode == 12:  # ClampAddSubtractFull
        return [min(255, max(0, L[i] + T[i] - TL[i])) for i in range(4)]
    if mode == 13:  # ClampAddSubtractHalf
        out = []
        for i in range(4):
            a = (L[i] + T[i]) >> 1
            d = a - TL[i]
            # C-style truncation toward zero for the signed half-delta
            half = d // 2 if d >= 0 else -((-d) // 2)
            out.append(min(255, max(0, a + half)))
        return out
    raise ValueError(f"bad predictor mode {mode}")


def _inverse_predictor(px: np.ndarray, modes: np.ndarray, bits: int) -> None:
    """In-place: px is (h, w, 4) int32 residuals -> actual values.  Flat
    array semantics per the spec: pixel 0 predicts black, rest of row 0
    uses L, column 0 uses T; TR of the last column is the first pixel of
    the current row (flat index i - w + 1)."""
    h, w, _ = px.shape
    rows = px.tolist()  # plain-int rows: the loop is per-pixel
    mrows = modes.tolist()
    for y in range(h):
        ry = rows[y]
        ry1 = rows[y - 1] if y else None
        my = mrows[y >> bits] if y else None
        for x in range(w):
            if x == 0 and y == 0:
                pred = (0xFF, 0, 0, 0)
            elif y == 0:
                pred = ry[x - 1]
            elif x == 0:
                pred = ry1[0]
            else:
                L = ry[x - 1]
                T = ry1[x]
                TL = ry1[x - 1]
                TR = ry[0] if x == w - 1 else ry1[x + 1]
                pred = _predict(my[x >> bits], L, T, TL, TR)
            cur = ry[x]
            ry[x] = [
                (cur[0] + pred[0]) & 0xFF,
                (cur[1] + pred[1]) & 0xFF,
                (cur[2] + pred[2]) & 0xFF,
                (cur[3] + pred[3]) & 0xFF,
            ]
    px[:] = rows


def _inverse_color_transform(px: np.ndarray, cte: np.ndarray, bits: int) -> None:
    """In-place cross-color inverse: the transform image pixel stores
    red_to_blue in RED, green_to_blue in GREEN, green_to_red in BLUE;
    each is a signed 3.5 fixed-point multiplier, delta = (t * c) >> 5
    on sign-extended int8 values."""
    h, w, _ = px.shape
    ty = np.arange(h) >> bits
    tx = np.arange(w) >> bits
    tiles = cte[np.ix_(ty, tx)]  # (h, w) uint32
    g2r = ((tiles & 0xFF).astype(np.int32) ^ 0x80) - 0x80
    g2b = (((tiles >> 8) & 0xFF).astype(np.int32) ^ 0x80) - 0x80
    r2b = (((tiles >> 16) & 0xFF).astype(np.int32) ^ 0x80) - 0x80
    g = ((px[:, :, 2] ^ 0x80) - 0x80).astype(np.int32)
    px[:, :, 1] = (px[:, :, 1] + ((g2r * g) >> 5)) & 0xFF
    r = ((px[:, :, 1] ^ 0x80) - 0x80).astype(np.int32)
    px[:, :, 3] = (px[:, :, 3] + ((g2b * g) >> 5) + ((r2b * r) >> 5)) & 0xFF


def _decode_vp8l_argb(payload: bytes):
    """Full VP8L stream (signature + size header) -> ((h, w) uint32
    ARGB, h, w)."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = _Bits(payload[1:])  # skip the byte-aligned signature
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha-is-used hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    if w * h * 4 > _MAX_DECODED_BYTES:
        raise ValueError("VP8L dimensions out of bounds")
    return _decode_image_stream(br, w, h), h, w


def _decode_image_stream(br: _Bits, w: int, h: int) -> np.ndarray:
    """Headerless VP8L image stream (transforms + entropy-coded pixels)
    at known dimensions -> (h, w) uint32 ARGB.  Shared by the main
    VP8L path and compressed ALPH chunks (container spec: alpha is a
    lossless stream of implicit dimensions, no signature/size)."""
    transforms = []  # (type, data) in bitstream order
    seen = set()
    dec_w = w  # width shrinks under color-indexing packing
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("duplicate VP8L transform")
        seen.add(ttype)
        if ttype in (0, 1):  # predictor / cross-color
            bits = 2 + br.read(3)
            tw = (dec_w + (1 << bits) - 1) >> bits
            th = (h + (1 << bits) - 1) >> bits
            img = _decode_entropy_image(br, tw, th, False)
            transforms.append((ttype, (bits, img)))
        elif ttype == 2:  # subtract-green
            transforms.append((2, None))
        else:  # color indexing
            n_colors = br.read(8) + 1
            pal_img = _decode_entropy_image(br, n_colors, 1, False)
            # palette entries are component-wise delta-coded
            pal = pal_img[0].astype(np.uint32)
            acc = np.zeros(4, dtype=np.uint32)
            entries = []
            for p in pal:
                acc = (acc + _channels(int(p)).astype(np.uint32)) & 0xFF
                entries.append(
                    (int(acc[0]) << 24) | (int(acc[1]) << 16)
                    | (int(acc[2]) << 8) | int(acc[3])
                )
            if n_colors <= 2:
                wbits = 3
            elif n_colors <= 4:
                wbits = 2
            elif n_colors <= 16:
                wbits = 1
            else:
                wbits = 0
            transforms.append((3, (np.array(entries, dtype=np.uint32), wbits)))
            if wbits:
                dec_w = (dec_w + (1 << wbits) - 1) >> wbits
    argb = _decode_entropy_image(br, dec_w, h, True)
    # inverse transforms, reverse bitstream order
    for ttype, data in reversed(transforms):
        if ttype == 3:
            pal, wbits = data
            if wbits:
                per = 1 << wbits  # pixels packed per green byte
                ibits = 8 >> wbits
                g = ((argb >> 8) & 0xFF).astype(np.uint32)
                idx = np.zeros((h, argb.shape[1] * per), dtype=np.uint32)
                for k in range(per):
                    idx[:, k::per] = (g >> (k * ibits)) & ((1 << ibits) - 1)
                idx = idx[:, :w]
            else:
                idx = (argb >> 8) & 0xFF
            oob = idx >= len(pal)
            lut = np.concatenate([pal, np.zeros(1, dtype=np.uint32)])
            argb = lut[np.where(oob, len(pal), idx)]
        elif ttype == 2:
            g = (argb >> 8) & 0xFF
            r = (((argb >> 16) & 0xFF) + g) & 0xFF
            b = ((argb & 0xFF) + g) & 0xFF
            argb = (argb & 0xFF00FF00) | (r << 16) | b
        else:
            ch = np.empty((h, argb.shape[1], 4), dtype=np.int32)
            ch[:, :, 0] = (argb >> 24) & 0xFF
            ch[:, :, 1] = (argb >> 16) & 0xFF
            ch[:, :, 2] = (argb >> 8) & 0xFF
            ch[:, :, 3] = argb & 0xFF
            bits, img = data
            if ttype == 0:
                _inverse_predictor(ch, (img >> 8) & 0xFF, bits)
            else:
                _inverse_color_transform(ch, img, bits)
            argb = (
                (ch[:, :, 0].astype(np.uint32) << 24)
                | (ch[:, :, 1].astype(np.uint32) << 16)
                | (ch[:, :, 2].astype(np.uint32) << 8)
                | ch[:, :, 3].astype(np.uint32)
            )
    if argb.shape != (h, w):
        raise ValueError("transform output dimensions mismatch")
    return argb


def _unfilter_alpha(a: np.ndarray, method: int) -> np.ndarray:
    """Invert the ALPH prediction filter (container spec 'Alpha
    filtering method'; libwebp dsp/filters.c unfilter semantics).
    ``a`` is (h, w) int32 residuals; returns uint8 plane.  Row 0 of
    every method reduces to the horizontal filter."""
    h, w = a.shape
    if method == 1:  # horizontal: pred = left; col 0 preds from above
        a[:, 0] = np.cumsum(a[:, 0]) & 0xFF
        a = np.cumsum(a, axis=1) & 0xFF
    elif method == 2:  # vertical: pred = above; row 0 preds from left
        a[0, :] = np.cumsum(a[0, :]) & 0xFF
        a = np.cumsum(a, axis=0) & 0xFF
    else:  # gradient: clamp(left + above - above_left), serial
        a[0, :] = np.cumsum(a[0, :]) & 0xFF
        for r in range(1, h):
            prev = a[r - 1]
            row = a[r]
            left = int(prev[0])
            top_left = left
            for c in range(w):
                top = int(prev[c])
                p = left + top - top_left
                p = 0 if p < 0 else (255 if p > 255 else p)
                left = (int(row[c]) + p) & 0xFF
                row[c] = left
                top_left = top
    return a.astype(np.uint8)


def _decode_alpha(body: bytes, w: int, h: int) -> np.ndarray:
    """ALPH chunk -> (h, w) uint8 alpha plane.  1-byte header
    (preprocessing / filter / compression), then either a raw plane or
    a headerless VP8L image stream whose green channel is alpha."""
    if not body:
        raise ValueError("empty ALPH chunk")
    head = body[0]
    filt = (head >> 2) & 3
    comp = head & 3
    if comp == 0:
        if len(body) - 1 < w * h:
            raise ValueError("truncated ALPH plane")
        a = np.frombuffer(body, np.uint8, count=w * h, offset=1)
        a = a.reshape(h, w)
    elif comp == 1:
        argb = _decode_image_stream(_Bits(body[1:]), w, h)
        a = ((argb >> 8) & 0xFF).astype(np.uint8)
    else:
        raise ValueError("bad ALPH compression method")
    if filt:
        a = _unfilter_alpha(a.astype(np.int32), filt)
    return a


def _walk_chunks(buf: bytes, start: int):
    i = start
    while i + 8 <= len(buf):
        tag = buf[i : i + 4]
        (n,) = struct.unpack("<I", buf[i + 4 : i + 8])
        body = buf[i + 8 : i + 8 + n]
        if len(body) < n:
            raise ValueError("truncated WEBP chunk")
        yield tag, body
        i += 8 + n + (n & 1)  # chunks are 2-byte aligned


def _decode_chunkset(chunks, rgba: bool) -> np.ndarray | None:
    """Decode the first VP8L/VP8(+preceding ALPH) image in an iterable
    of (tag, body) chunks — the shared payload decode for still files,
    first-frame extraction, and per-ANMF-frame decode.  Returns None if
    no image chunk appears (the caller owns that error)."""
    alph = None
    chunks = list(chunks)
    k = 0
    while k < len(chunks):
        tag, body = chunks[k]
        k += 1
        if tag == b"ALPH":
            alph = body
        elif tag == b"ANMF":
            # animated WebP: splice in the first frame's subchunks
            # (container spec: 16-byte frame params, then image chunks)
            if len(body) < 16:
                raise ValueError("truncated ANMF header")
            chunks[k:k] = list(_walk_chunks(body, 16))
        elif tag == b"VP8L":
            argb, h, w = _decode_vp8l_argb(body)
            ch = 4 if rgba else 3
            out = np.empty((h, w, ch), dtype=np.uint8)
            out[:, :, 0] = (argb >> 16) & 0xFF
            out[:, :, 1] = (argb >> 8) & 0xFF
            out[:, :, 2] = argb & 0xFF
            if rgba:
                out[:, :, 3] = (argb >> 24) & 0xFF
            return out
        elif tag == b"VP8 ":
            from . import vp8 as _vp8

            if not rgba:
                return _vp8.decode_vp8_to_rgb(body)
            y, u, v = _vp8.decode_vp8(body)
            h, w = y.shape
            out = np.empty((h, w, 4), dtype=np.uint8)
            out[:, :, :3] = _vp8.yuv_to_rgb(y, u, v)
            out[:, :, 3] = (
                _decode_alpha(alph, w, h) if alph is not None else 255)
            return out
    return None


def _decode_container(b: bytes, rgba: bool) -> np.ndarray:
    b = bytes(b)
    try:
        if len(b) < 20 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
            raise ValueError("not a WEBP RIFF container")
        out = _decode_chunkset(_walk_chunks(b, 12), rgba)
        if out is None:
            raise ValueError("no image chunk in WEBP container")
        return out
    except (IndexError, struct.error) as e:
        raise ValueError(f"corrupt WEBP: {type(e).__name__}") from e


from streamsum_spark.operators._compositing import (  # noqa: E402
    MAX_FRAMES_BYTES as _MAX_FRAMES_BYTES,
)
from streamsum_spark.operators._compositing import check_canvas as _check_canvas  # noqa: E402
from streamsum_spark.operators._compositing import over as _composite_over  # noqa: E402


def decode_webp_frames(b: bytes) -> list[tuple[int, int, np.ndarray]]:
    """Decode EVERY frame of a (possibly animated) WebP, composited onto
    the VP8X canvas: [(start_ms, duration_ms, (ch, cw, 3) uint8 RGB),
    ...] in presentation order.  A still file returns one zero-duration
    frame (its own size).

    Container-spec animation semantics per ANMF frame: placement at
    (2*frame_x, 2*frame_y), ALPHA BLENDING of the frame onto the canvas
    (flags bit 1 = 0) or plain replacement (bit 1 = 1), and disposal
    (flags bit 0): 1 fills the frame rect with the ANIM background
    color after display.  The canvas starts as the ANIM background
    color; compositing is straight-alpha OVER with round-half-up
    integer arithmetic, and each emitted frame is the canvas flattened
    over the background RGB (output is opaque RGB).

    Hostile-input bound: per-frame decode caps as decode_webp, frames
    must fit the declared canvas, and cumulative composited output is
    capped (_MAX_FRAMES_BYTES)."""
    b = bytes(b)
    try:
        return _decode_webp_frames(b)
    except (IndexError, struct.error) as e:
        raise ValueError(f"corrupt WEBP: {type(e).__name__}") from e


def _decode_webp_frames(b: bytes) -> list[tuple[int, int, np.ndarray]]:
    if len(b) < 20 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        raise ValueError("not a WEBP RIFF container")
    cw = ch = None
    bg = np.zeros(4, np.int32)  # RGBA
    anmf = []
    for tag, body in _walk_chunks(b, 12):
        if tag == b"VP8X":
            if len(body) < 10:
                raise ValueError("truncated VP8X")
            cw = 1 + int.from_bytes(body[4:7], "little")
            ch = 1 + int.from_bytes(body[7:10], "little")
        elif tag == b"ANIM":
            if len(body) < 6:
                raise ValueError("truncated ANIM")
            # spec byte order: B, G, R, A
            bg = np.array([body[2], body[1], body[0], body[3]], np.int32)
        elif tag == b"ANMF":
            anmf.append(body)
    if not anmf:
        px = decode_webp(b)
        return [(0, 0, px)]
    if cw is None:
        raise ValueError("animated WEBP without VP8X canvas size")
    # bound the CANVAS allocation itself, not just cumulative output:
    # the working canvas is int32 RGBA and the blend makes same-sized
    # temporaries, so a huge declared canvas must refuse pre-allocation
    _check_canvas(cw, ch, "WEBP")
    canvas = np.broadcast_to(bg, (ch, cw, 4)).astype(np.int32).copy()
    bg_rgb = bg[:3]

    def flatten(c) -> np.ndarray:
        a = c[:, :, 3:4]
        return (
            (c[:, :, :3] * a + bg_rgb * (255 - a) + 127) // 255
        ).astype(np.uint8)

    frames: list[tuple[int, int, np.ndarray]] = []
    t = 0
    out_bytes = 0
    for body in anmf:
        if len(body) < 16:
            raise ValueError("truncated ANMF header")
        fx = 2 * int.from_bytes(body[0:3], "little")
        fy = 2 * int.from_bytes(body[3:6], "little")
        fw = 1 + int.from_bytes(body[6:9], "little")
        fh = 1 + int.from_bytes(body[9:12], "little")
        dur = int.from_bytes(body[12:15], "little")
        flags = body[15]
        if fx + fw > cw or fy + fh > ch:
            raise ValueError("ANMF frame exceeds the canvas")
        fr = _decode_chunkset(_walk_chunks(body, 16), rgba=True)
        if fr is None:
            raise ValueError("ANMF frame without image chunk")
        if fr.shape[:2] != (fh, fw):
            raise ValueError("ANMF frame size mismatch")
        fr = fr.astype(np.int32)
        region = canvas[fy : fy + fh, fx : fx + fw]
        if flags & 0x02:  # no blend: frame replaces rect, alpha included
            region[:] = fr
        else:  # straight-alpha OVER, round half up (shared compositor)
            _composite_over(region, fr)
        # per-frame floor: tiny canvases pay object overhead per emitted
        # frame far beyond their pixel bytes (see gif.py's twin cap)
        out_bytes += max(canvas.nbytes, 4096)
        if out_bytes > _MAX_FRAMES_BYTES:
            raise ValueError("animated WEBP exceeds the composited-output cap")
        frames.append((t, dur, flatten(canvas)))
        t += dur
        if flags & 0x01:  # dispose to background color
            region[:] = bg
    return frames


def decode_webp_rgba(b: bytes) -> np.ndarray:
    """Decode a WebP blob to (h, w, 4) non-premultiplied RGBA —
    byte-comparable to WebPDecodeRGBA.  VP8L alpha comes from the ARGB
    stream itself; lossy VP8 alpha from the ALPH chunk (opaque 255
    when absent).  Animated files decode their first frame."""
    return _decode_container(b, rgba=True)


def decode_webp(b: bytes) -> np.ndarray:
    """Decode a WebP blob (lossless VP8L or lossy VP8; still or the
    first frame of an animation) to (h, w, 3) uint8 RGB.  Malformed
    input raises ValueError."""
    return _decode_container(b, rgba=False)


# ---- fixture encoder -------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def write_code(self, code: int, length: int) -> None:
        """Prefix codes pack MSB-first (DEFLATE convention)."""
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, bit in enumerate(self.bits):
            out[i >> 3] |= bit << (i & 7)
        return bytes(out)


def _write_flat8_code(bw: _BitWriter) -> None:
    """A complete 256-symbol code with every length 8 (canonical code ==
    symbol value), written via a two-symbol {8, 16} code-length code:
    '8' once, then repeat-previous (16) runs."""
    bw.write(0, 1)  # not simple
    bw.write(12 - 4, 4)  # 12 code-length slots: covers order idx of 16 and 8
    for sym in _CL_ORDER[:12]:
        bw.write(1 if sym in (8, 16) else 0, 3)
    # '8' once, then repeat-previous (16) runs covering the other 255.
    # max_symbol = the EXACT count of code-length symbols written: the
    # reader's loop is bounded by the alphabet size (280 for green with
    # 24 length codes), so without the early-out it would misread the
    # next code's bits as further lengths.
    runs = []
    remaining = 255
    while remaining >= 3:
        take = min(6, remaining)
        if remaining - take in (1, 2):  # leave a legal (>=3) last run
            take = remaining - 3
        runs.append(take)
        remaining -= take
    n_syms = 1 + len(runs) + remaining
    bw.write(1, 1)  # use max_symbol
    bw.write(3, 3)  # length_nbits = 2 + 2*3 = 8
    bw.write(n_syms - 2, 8)
    # cl-code canonical: symbol 8 -> 0, symbol 16 -> 1 (1 bit each)
    bw.write_code(0, 1)  # '8'
    for take in runs:
        bw.write_code(1, 1)  # '16': repeat previous
        bw.write(take - 3, 2)
    for _ in range(remaining):
        bw.write_code(0, 1)


def _write_simple_single(bw: _BitWriter, symbol: int) -> None:
    bw.write(1, 1)  # simple
    bw.write(0, 1)  # one symbol
    if symbol < 2:
        bw.write(0, 1)
        bw.write(symbol, 1)
    else:
        bw.write(1, 1)
        bw.write(symbol, 8)


def _write_literal_image(bw: _BitWriter, argb: np.ndarray, is_main: bool) -> None:
    """Entropy-code an ARGB image as pure literals: flat 8-bit G/R/B
    codes, single-symbol alpha (the image's constant alpha) and
    distance codes, no cache, no meta codes."""
    h, w = argb.shape
    alphas = np.unique((argb >> 24) & 0xFF)
    bw.write(0, 1)  # no color cache (cache info precedes meta-prefix)
    if is_main:
        bw.write(0, 1)  # no meta prefix codes
    _write_flat8_code(bw)  # green
    _write_flat8_code(bw)  # red
    _write_flat8_code(bw)  # blue
    if len(alphas) == 1:
        _write_simple_single(bw, int(alphas[0]))  # alpha: 0 bits/pixel
    else:
        _write_flat8_code(bw)  # varying alpha (delta-coded palettes)
    _write_simple_single(bw, 0)  # distance (never used)
    flat = argb.reshape(-1)
    for p in flat:
        p = int(p)
        bw.write_code((p >> 8) & 0xFF, 8)  # green first
        bw.write_code((p >> 16) & 0xFF, 8)
        bw.write_code(p & 0xFF, 8)
        if len(alphas) != 1:
            bw.write_code((p >> 24) & 0xFF, 8)


def _apply_predictor_forward(px: np.ndarray, mode: int, bits: int) -> np.ndarray:
    """Residuals for a uniform predictor mode — the encoder-side twin of
    _inverse_predictor (same edge rules, so roundtrip is exact)."""
    h, w, _ = px.shape
    out = np.empty_like(px)
    recon = px.astype(np.int32).tolist()
    for y in range(h):
        ry = recon[y]
        ry1 = recon[y - 1] if y else None
        for x in range(w):
            if x == 0 and y == 0:
                pred = (0xFF, 0, 0, 0)
            elif y == 0:
                pred = ry[x - 1]
            elif x == 0:
                pred = ry1[0]
            else:
                L = ry[x - 1]
                T = ry1[x]
                TL = ry1[x - 1]
                TR = ry[0] if x == w - 1 else ry1[x + 1]
                pred = _predict(mode, L, T, TL, TR)
            cur = ry[x]
            out[y, x] = [
                (cur[0] - pred[0]) & 0xFF,
                (cur[1] - pred[1]) & 0xFF,
                (cur[2] - pred[2]) & 0xFF,
                (cur[3] - pred[3]) & 0xFF,
            ]
    return out


def encode_webp_lossless(
    px: np.ndarray, transform: str | None = None, predictor_mode: int = 2
) -> bytes:
    """Encode (h, w, 3) uint8 RGB — or (h, w, 4) RGBA when ``transform``
    is None — as a valid VP8L file: the test fixture, small and
    obviously correct over compact (pure literals with flat 8-bit
    codes; ~3.4 bytes/pixel).  ``transform`` exercises one decoder
    inverse-transform path: None, 'subtract_green', 'predictor'
    (uniform ``predictor_mode`` over one whole-image block), or
    'palette' (image must have ≤ 256 distinct colors; ≤ 16 exercises
    packed indices)."""
    px = np.asarray(px, dtype=np.uint8)
    h, w, nch = px.shape
    if nch == 4 and transform is not None:
        raise ValueError("RGBA fixture encoding supports transform=None only")
    alpha = (
        px[:, :, 3].astype(np.uint32)
        if nch == 4
        else np.full((h, w), 0xFF, np.uint32)
    )
    argb = (
        (alpha << 24)
        | (px[:, :, 0].astype(np.uint32) << 16)
        | (px[:, :, 1].astype(np.uint32) << 8)
        | px[:, :, 2].astype(np.uint32)
    )
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if nch == 4 else 0, 1)  # alpha-used hint
    bw.write(0, 3)  # version
    if transform == "subtract_green":
        bw.write(1, 1)
        bw.write(2, 2)
        g = (argb >> 8) & 0xFF
        r = (((argb >> 16) & 0xFF) - g) & 0xFF
        b = ((argb & 0xFF) - g) & 0xFF
        argb = (argb & 0xFF00FF00) | (r << 16) | b
    elif transform == "predictor":
        bw.write(1, 1)
        bw.write(0, 2)
        # one block covering the whole image: bits chosen so the
        # subimage is 1x1
        bits = max(2, (max(w, h) - 1).bit_length())
        bw.write(bits - 2, 3)
        mode_img = np.full((1, 1), (0xFF << 24) | (predictor_mode << 8), np.uint32)
        _write_literal_image(bw, mode_img, False)
        ch = np.empty((h, w, 4), dtype=np.int32)
        ch[:, :, 0] = (argb >> 24) & 0xFF
        ch[:, :, 1] = (argb >> 16) & 0xFF
        ch[:, :, 2] = (argb >> 8) & 0xFF
        ch[:, :, 3] = argb & 0xFF
        res = _apply_predictor_forward(ch, predictor_mode, bits)
        argb = (
            (res[:, :, 0].astype(np.uint32) << 24)
            | (res[:, :, 1].astype(np.uint32) << 16)
            | (res[:, :, 2].astype(np.uint32) << 8)
            | res[:, :, 3].astype(np.uint32)
        )
    elif transform == "palette":
        colors = np.unique(argb.reshape(-1))
        n = len(colors)
        if n > 256:
            raise ValueError("palette transform needs <= 256 colors")
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(n - 1, 8)
        # delta-code the palette entries component-wise
        deltas = np.empty(n, dtype=np.uint32)
        prev = np.zeros(4, dtype=np.int64)
        for i, c in enumerate(colors):
            cur = _channels(int(c)).astype(np.int64)
            d = (cur - prev) & 0xFF
            deltas[i] = (
                (int(d[0]) << 24) | (int(d[1]) << 16) | (int(d[2]) << 8) | int(d[3])
            )
            prev = cur
        _write_literal_image(bw, deltas.reshape(1, n), False)
        lut = {int(c): i for i, c in enumerate(colors)}
        idx = np.vectorize(lambda v: lut[int(v)])(argb).astype(np.uint32)
        if n <= 2:
            wbits = 3
        elif n <= 4:
            wbits = 2
        elif n <= 16:
            wbits = 1
        else:
            wbits = 0
        if wbits:
            per = 1 << wbits
            ibits = 8 >> wbits
            pw = (w + per - 1) // per
            packed = np.zeros((h, pw), dtype=np.uint32)
            for k in range(per):
                col = idx[:, k::per]
                packed[:, : col.shape[1]] |= col << (k * ibits)
            argb = (np.uint32(0xFF) << 24) | (packed << 8)
        else:
            argb = (np.uint32(0xFF) << 24) | (idx << 8)
    elif transform is not None:
        raise ValueError(f"unknown transform {transform}")
    bw.write(0, 1)  # transform-list terminator
    _write_literal_image(bw, argb, True)
    payload = bw.bytes()
    riff_size = 4 + 8 + len(payload) + (len(payload) & 1)
    out = (
        b"RIFF"
        + struct.pack("<I", riff_size)
        + b"WEBP"
        + b"VP8L"
        + struct.pack("<I", len(payload))
        + payload
    )
    if len(payload) & 1:
        out += b"\x00"
    return out


def encode_webp_animated(
    frames: list,
    durations_ms: list[int],
    offsets: list[tuple[int, int]] | None = None,
    blends: list[bool] | None = None,
    disposals: list[int] | None = None,
    canvas: tuple[int, int] | None = None,
    bg_rgba: tuple[int, int, int, int] = (0, 0, 0, 255),
) -> bytes:
    """Test-fixture animated WebP: VP8X (animation flag + canvas size) +
    ANIM (background color, infinite loop) + one ANMF per frame wrapping
    a lossless VP8L payload (RGB or RGBA arrays; RGBA exercises the
    alpha-blend compositing path).  ``offsets`` are even (x, y) pixel
    positions (the wire format stores x/2, y/2); ``blends[i]`` True
    means alpha-blend onto the canvas (flags bit 1 = 0), False means
    replace; ``disposals[i]`` 1 restores the frame rect to the ANIM
    background after display."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    offsets = offsets or [(0, 0)] * len(frames)
    blends = blends if blends is not None else [True] * len(frames)
    disposals = disposals or [0] * len(frames)
    ch, cw = canvas or frames[0].shape[:2]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    body = bytearray()
    vp8x = bytes([0x02, 0, 0, 0]) + (cw - 1).to_bytes(3, "little") + (
        ch - 1
    ).to_bytes(3, "little")
    body += chunk(b"VP8X", vp8x)
    r, g, bl, a = bg_rgba
    body += chunk(b"ANIM", bytes([bl, g, r, a]) + struct.pack("<H", 0))
    for f, dur, (x, y), blend, disp in zip(
        frames, durations_ms, offsets, blends, disposals
    ):
        if x % 2 or y % 2:
            raise ValueError("ANMF offsets must be even")
        h, w = f.shape[:2]
        still = encode_webp_lossless(f)
        vp8l = next(
            bd for tg, bd in _walk_chunks(still, 12) if tg == b"VP8L"
        )
        head = (
            (x // 2).to_bytes(3, "little")
            + (y // 2).to_bytes(3, "little")
            + (w - 1).to_bytes(3, "little")
            + (h - 1).to_bytes(3, "little")
            + int(dur).to_bytes(3, "little")
            + bytes([(0 if blend else 0x02) | (0x01 if disp == 1 else 0)])
        )
        body += chunk(b"ANMF", head + chunk(b"VP8L", vp8l))
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + bytes(body)
