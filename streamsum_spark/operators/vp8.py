"""VP8 key-frame (lossy WebP) decoder — pure stdlib + numpy, no codec libs.

Implements the intra-frame half of RFC 6386 ("VP8 Data Format and Decoding
Guide"), which is exactly what a WebP ``VP8 `` chunk contains: every WebP
lossy still image is a single VP8 key frame.  Written from the RFC text;
section numbers are cited at each stage:

- §7   boolean entropy decoder (arithmetic coder over 8-bit probabilities)
- §9   frame header (segmentation, loop-filter, partitions, quantizers)
- §11  key-frame intra mode decoding (ymode / bmode / uvmode trees)
- §13  DCT coefficient token decoding (bands, contexts, categories)
- §14  dequantization, inverse WHT (Y2) and inverse DCT
- §12  intra prediction (16x16, 8x8 chroma, 4x4 B_PRED with the
       above-right macroblock quirk)
- §15  in-loop deblocking filter (normal and simple), applied after the
       whole frame is reconstructed — intra prediction always sees
       UNFILTERED pixels

Tests pin the decoder byte-exact against the system libwebp (when
present) through tests/libwebp_oracle.py, both with and without the loop
filter (bypass_filtering), plus an embedded hex fixture so one external
pin survives without the library.  Constant tables live in
vp8_tables.py.

Reference parity note: the reference engine (caches.clj, system.clj) has
no media path at all; this module belongs to the training-data-pipeline
surface (multimodal decode), same tier as jpeg.py/gif.py/webp.py.

Scale posture: decoding is per-blob, embarrassingly parallel, invoked
from Arrow-batched mapInPandas in multimodal.py — no shuffle, no state.
Hostile input is bounded: dimensions are capped, every loop is bounded
by macroblock counts derived from the 14-bit header fields, and the
boolean decoder reads zeros past end-of-buffer (RFC behavior) so
truncated data degrades to garbage pixels, never an unbounded loop.
"""
from __future__ import annotations

import struct

import numpy as np

from . import vp8_tables as T

_MAX_PIXELS = 1 << 26  # same hostile-input bound as webp.py / jpeg.py

# ---- trees (RFC 6386 §8.2, §11.2, §11.4, §13.2) ----------------------

# leaf = -value (node 0 is only ever the root, so -0 is unambiguous)
_KF_YMODE_TREE = (-4, 2, 4, 6, -0, -1, -2, -3)  # B_PRED=4, DC,V,H,TM=0..3
_KF_YMODE_PROB = (145, 156, 163, 128)
_UV_MODE_TREE = (-0, 2, -1, 4, -2, -3)
_KF_UV_MODE_PROB = (142, 114, 183)
# intra_bmode enum order (§11.4): DC,TM,VE,HE,LD,RD,VR,VL,HD,HU
_BMODE_TREE = (
    -0, 2,
    -1, 4,
    -2, 6,
    8, 12,
    -3, 10,
    -5, -6,
    -4, 14,
    -7, 16,
    -8, -9,
)
# token tree (§13.2): EOB=11 sentinel; values 0..4 literal, 5..10 = cat1..6
_TOKEN_TREE = (
    -11, 2,
    -0, 4,
    -1, 6,
    8, 12,
    -2, 10,
    -3, -4,
    14, 16,
    -5, -6,
    18, 20,
    -7, -8,
    -9, -10,
)
_CAT_PROBS = (
    (159,),
    (165, 145),
    (173, 148, 140),
    (176, 155, 140, 135),
    (180, 157, 141, 134, 130),
    (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
)
_CAT_BASE = (5, 7, 11, 19, 35, 67)
_ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)
# 16x16 / chroma mode -> implied sub-mode for bmode context (§11.3)
_IMPLIED_BMODE = (0, 2, 3, 1)  # DC->B_DC, V->B_VE, H->B_HE, TM->B_TM


class _Bool:
    """RFC 6386 §7.2 boolean decoder.  ``value`` is the 16-bit decode
    window; bytes past end-of-buffer read as zero (spec behavior)."""

    __slots__ = ("d", "n", "pos", "value", "range", "count")

    def __init__(self, data: bytes):
        self.d = data
        self.n = len(data)
        b0 = data[0] if self.n > 0 else 0
        b1 = data[1] if self.n > 1 else 0
        self.pos = 2
        self.value = (b0 << 8) | b1
        self.range = 255
        self.count = 0

    def bit(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        v = self.value
        if v >= big:
            ret = 1
            r = self.range - split
            v -= big
        else:
            ret = 0
            r = split
        if r < 128:
            c = self.count
            pos = self.pos
            d = self.d
            n = self.n
            while r < 128:
                v <<= 1
                r <<= 1
                c += 1
                if c == 8:
                    c = 0
                    if pos < n:
                        v |= d[pos]
                    pos += 1
            self.count = c
            self.pos = pos
        self.value = v
        self.range = r
        return ret

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit(128)
        return v

    def signed_literal(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.bit(128) else v

    def tree(self, tr, probs, start: int = 0, off: int = 0) -> int:
        i = start
        while True:
            i = tr[i + self.bit(probs[off + (i >> 1)])]
            if i <= 0:
                return -i


def _clamp_q(q: int) -> int:
    return 0 if q < 0 else (127 if q > 127 else q)


def _parse_header(bd: _Bool):
    """First-partition frame header, key-frame layout (RFC 6386 §9, §19.2)."""
    h = {}
    if bd.literal(1) != 0:
        raise ValueError("VP8 reserved color space")
    bd.literal(1)  # clamping_type (both values use the same clamp here)

    # §9.3 segmentation
    seg_enabled = bd.bit(128)
    update_map = 0
    h["seg_abs"] = 0
    h["seg_q"] = [0, 0, 0, 0]
    h["seg_lf"] = [0, 0, 0, 0]
    tree_probs = [255, 255, 255]
    if seg_enabled:
        update_map = bd.bit(128)
        update_data = bd.bit(128)
        if update_data:
            h["seg_abs"] = bd.bit(128)
            for i in range(4):
                if bd.bit(128):
                    h["seg_q"][i] = bd.signed_literal(7)
            for i in range(4):
                if bd.bit(128):
                    h["seg_lf"][i] = bd.signed_literal(6)
        if update_map:
            for i in range(3):
                if bd.bit(128):
                    tree_probs[i] = bd.literal(8)
    h["seg_enabled"] = seg_enabled
    h["update_map"] = update_map
    h["seg_tree_probs"] = tree_probs

    # §9.4 loop filter
    h["filter_simple"] = bd.literal(1)
    h["filter_level"] = bd.literal(6)
    h["sharpness"] = bd.literal(3)
    h["ref_lf_delta"] = [0, 0, 0, 0]
    h["mode_lf_delta"] = [0, 0, 0, 0]
    h["lf_delta_enabled"] = bd.bit(128)
    if h["lf_delta_enabled"]:
        if bd.bit(128):  # mode_ref_lf_delta_update
            for i in range(4):
                if bd.bit(128):
                    h["ref_lf_delta"][i] = bd.signed_literal(6)
            for i in range(4):
                if bd.bit(128):
                    h["mode_lf_delta"][i] = bd.signed_literal(6)

    # §9.5 partitions
    h["n_parts"] = 1 << bd.literal(2)

    # §9.6 quantizers
    h["y_ac_qi"] = bd.literal(7)
    h["y1_dc_dq"] = bd.signed_literal(4) if bd.bit(128) else 0
    h["y2_dc_dq"] = bd.signed_literal(4) if bd.bit(128) else 0
    h["y2_ac_dq"] = bd.signed_literal(4) if bd.bit(128) else 0
    h["uv_dc_dq"] = bd.signed_literal(4) if bd.bit(128) else 0
    h["uv_ac_dq"] = bd.signed_literal(4) if bd.bit(128) else 0

    bd.bit(128)  # refresh_entropy_probs — single-frame, irrelevant

    # §13.4 coefficient probability updates
    probs = list(T.DEFAULT_COEFF_PROBS)
    upd = T.COEFF_UPDATE_PROBS
    for idx in range(4 * 8 * 3 * 11):
        if bd.bit(upd[idx]):
            probs[idx] = bd.literal(8)
    h["coeff_probs"] = probs

    h["use_skip"] = bd.bit(128)
    h["skip_prob"] = bd.literal(8) if h["use_skip"] else 0
    return h


def _dequant_factors(h, seg: int):
    """Per-segment dequantization factors (RFC 6386 §9.6, §14.1)."""
    q = h["y_ac_qi"]
    if h["seg_enabled"]:
        q = h["seg_q"][seg] if h["seg_abs"] else q + h["seg_q"][seg]
    q = _clamp_q(q)
    dc, ac = T.DC_QLOOKUP, T.AC_QLOOKUP
    y1dc = dc[_clamp_q(q + h["y1_dc_dq"])]
    y1ac = ac[q]
    y2dc = dc[_clamp_q(q + h["y2_dc_dq"])] * 2
    y2ac = ac[_clamp_q(q + h["y2_ac_dq"])] * 155 // 100
    if y2ac < 8:
        y2ac = 8
    uvdc = dc[_clamp_q(q + h["uv_dc_dq"])]
    if uvdc > 132:  # §14.1: chroma DC factor is clamped to 132
        uvdc = 132
    uvac = ac[_clamp_q(q + h["uv_ac_dq"])]
    return y1dc, y1ac, y2dc, y2ac, uvdc, uvac


def _filter_level(h, seg: int, is_b_pred: bool) -> int:
    """Per-macroblock loop-filter level (RFC 6386 §15.1); key frames use
    ref_lf_delta[0] (INTRA_FRAME) and mode_lf_delta[0] (B_PRED)."""
    lvl = h["filter_level"]
    if h["seg_enabled"]:
        lvl = h["seg_lf"][seg] if h["seg_abs"] else lvl + h["seg_lf"][seg]
    if h["lf_delta_enabled"]:
        lvl += h["ref_lf_delta"][0]
        if is_b_pred:
            lvl += h["mode_lf_delta"][0]
    return 0 if lvl < 0 else (63 if lvl > 63 else lvl)


# ---- coefficient token decoding (RFC 6386 §13) -----------------------

def _get_coeffs(bd: _Bool, probs, plane_off: int, ctx: int, first: int, out):
    """Decode one 4x4 block's tokens into out[16] (unquantized values,
    zigzag applied).  Returns the EOB position n; the neighbor context
    flag is (n > first), libwebp-equivalent.  After a ZERO token the EOB
    branch is skipped (tree restarts at node 2) — §13.3.

    Hot path: the §7.2 boolean-decoder step is inlined on local
    (value, range, count, pos) state — identical math to _Bool.bit,
    written back once per block — because attribute loads and call
    frames per decoded bit dominate an interpreter-run token loop."""
    bands = T.COEFF_BANDS
    tree = _TOKEN_TREE
    zz = _ZIGZAG
    n = first
    start = 0
    value = bd.value
    rng = bd.range
    count = bd.count
    pos = bd.pos
    d = bd.d
    nd = bd.n
    while n < 16:
        off = plane_off + bands[n] * 33 + ctx * 11
        # tree walk with inline bit decode
        i = start
        while True:
            prob = probs[off + (i >> 1)]
            split = 1 + (((rng - 1) * prob) >> 8)
            big = split << 8
            if value >= big:
                bit = 1
                rng -= split
                value -= big
            else:
                bit = 0
                rng = split
            while rng < 128:
                value <<= 1
                rng <<= 1
                count += 1
                if count == 8:
                    count = 0
                    if pos < nd:
                        value |= d[pos]
                    pos += 1
            i = tree[i + bit]
            if i <= 0:
                break
        tok = -i
        if tok == 11:  # EOB
            break
        if tok == 0:
            ctx = 0
            start = 2  # no EOB immediately after a zero run
            n += 1
            continue
        if tok <= 4:
            v = tok
            ctx = 1 if v == 1 else 2
        else:
            v = 0
            for prob in _CAT_PROBS[tok - 5]:
                split = 1 + (((rng - 1) * prob) >> 8)
                big = split << 8
                if value >= big:
                    bit = 1
                    rng -= split
                    value -= big
                else:
                    bit = 0
                    rng = split
                while rng < 128:
                    value <<= 1
                    rng <<= 1
                    count += 1
                    if count == 8:
                        count = 0
                        if pos < nd:
                            value |= d[pos]
                        pos += 1
                v = (v << 1) | bit
            v += _CAT_BASE[tok - 5]
            ctx = 2
        # sign bit (prob 128)
        split = 1 + (((rng - 1) * 128) >> 8)
        big = split << 8
        if value >= big:
            rng -= split
            value -= big
            v = -v
        else:
            rng = split
        while rng < 128:
            value <<= 1
            rng <<= 1
            count += 1
            if count == 8:
                count = 0
                if pos < nd:
                    value |= d[pos]
                pos += 1
        out[zz[n]] = v
        start = 0
        n += 1
    bd.value = value
    bd.range = rng
    bd.count = count
    bd.pos = pos
    return n


# ---- inverse transforms (RFC 6386 §14.3, §14.4) ----------------------

def _wht_inverse(inp):
    """Inverse Walsh-Hadamard for the Y2 block; returns 16 DC values in
    subblock raster order (§14.3)."""
    t = [0] * 16
    for i in range(4):
        a1 = inp[i] + inp[12 + i]
        b1 = inp[4 + i] + inp[8 + i]
        c1 = inp[4 + i] - inp[8 + i]
        d1 = inp[i] - inp[12 + i]
        t[i] = a1 + b1
        t[4 + i] = c1 + d1
        t[8 + i] = a1 - b1
        t[12 + i] = d1 - c1
    out = [0] * 16
    for i in range(4):
        a1 = t[4 * i] + t[4 * i + 3]
        b1 = t[4 * i + 1] + t[4 * i + 2]
        c1 = t[4 * i + 1] - t[4 * i + 2]
        d1 = t[4 * i] - t[4 * i + 3]
        out[4 * i] = (a1 + b1 + 3) >> 3
        out[4 * i + 1] = (c1 + d1 + 3) >> 3
        out[4 * i + 2] = (a1 - b1 + 3) >> 3
        out[4 * i + 3] = (d1 - c1 + 3) >> 3
    return out


def _idct_batch(blocks: np.ndarray) -> np.ndarray:
    """Inverse DCT for n blocks at once: (n, 16) int64 -> (n, 4, 4)
    residuals (§14.4; constants 20091/35468, arithmetic >>)."""
    x = blocks.reshape(-1, 4, 4)
    c, s = 20091, 35468
    # column pass (stride-4 walk in the spec == axis 1 here)
    a1 = x[:, 0, :] + x[:, 2, :]
    b1 = x[:, 0, :] - x[:, 2, :]
    c1 = ((x[:, 1, :] * s) >> 16) - (x[:, 3, :] + ((x[:, 3, :] * c) >> 16))
    d1 = (x[:, 1, :] + ((x[:, 1, :] * c) >> 16)) + ((x[:, 3, :] * s) >> 16)
    y = np.empty_like(x)
    y[:, 0, :] = a1 + d1
    y[:, 1, :] = b1 + c1
    y[:, 2, :] = b1 - c1
    y[:, 3, :] = a1 - d1
    # row pass with final (v + 4) >> 3
    a1 = y[:, :, 0] + y[:, :, 2]
    b1 = y[:, :, 0] - y[:, :, 2]
    c1 = ((y[:, :, 1] * s) >> 16) - (y[:, :, 3] + ((y[:, :, 3] * c) >> 16))
    d1 = (y[:, :, 1] + ((y[:, :, 1] * c) >> 16)) + ((y[:, :, 3] * s) >> 16)
    z = np.empty_like(x)
    z[:, :, 0] = (a1 + d1 + 4) >> 3
    z[:, :, 1] = (b1 + c1 + 4) >> 3
    z[:, :, 2] = (b1 - c1 + 4) >> 3
    z[:, :, 3] = (a1 - d1 + 4) >> 3
    return z


# ---- intra prediction (RFC 6386 §12) ---------------------------------

def _edges(plane, y0, x0, size, mb_x, mb_y):
    """(above, left, corner) for a whole-macroblock predictor, with the
    VP8 synthetic border: above=127, left=129, corner 127/129 (§12.2)."""
    if mb_y > 0:
        above = plane[y0 - 1, x0:x0 + size].astype(np.int32)
    else:
        above = np.full(size, 127, np.int32)
    if mb_x > 0:
        left = plane[y0:y0 + size, x0 - 1].astype(np.int32)
    else:
        left = np.full(size, 129, np.int32)
    if mb_y == 0:
        corner = 127
    elif mb_x == 0:
        corner = 129
    else:
        corner = int(plane[y0 - 1, x0 - 1])
    return above, left, corner


def _whole_mb_pred(plane, y0, x0, size, mode, mb_x, mb_y):
    """DC/V/H/TM for 16x16 luma (size=16) or 8x8 chroma (size=8).  Only
    DC special-cases edge availability; V/H/TM use the synthetic border
    values (§12.2)."""
    above, left, corner = _edges(plane, y0, x0, size, mb_x, mb_y)
    if mode == 0:  # DC
        if mb_y > 0 and mb_x > 0:
            dc = (int(above.sum()) + int(left.sum()) + size) >> (
                5 if size == 16 else 4)
        elif mb_y > 0:
            dc = (int(above.sum()) + (size >> 1)) >> (4 if size == 16 else 3)
        elif mb_x > 0:
            dc = (int(left.sum()) + (size >> 1)) >> (4 if size == 16 else 3)
        else:
            dc = 128
        return np.full((size, size), dc, np.int32)
    if mode == 1:  # V
        return np.broadcast_to(above, (size, size)).copy()
    if mode == 2:  # H
        return np.broadcast_to(left[:, None], (size, size)).copy()
    # TM
    return np.clip(left[:, None] + above[None, :] - corner, 0, 255)


def _bpred_block(mode, A, L, C, AR):
    """One 4x4 B_PRED predictor (§12.3).  A=above[4], L=left[4],
    C=corner, AR=above-right[4], all plain ints; returns 4x4 list rows."""
    p = [[0] * 4 for _ in range(4)]
    if mode == 0:  # B_DC_PRED
        dc = (A[0] + A[1] + A[2] + A[3] + L[0] + L[1] + L[2] + L[3] + 4) >> 3
        for r in range(4):
            pr = p[r]
            pr[0] = pr[1] = pr[2] = pr[3] = dc
    elif mode == 1:  # B_TM_PRED
        for r in range(4):
            base = L[r] - C
            pr = p[r]
            for c in range(4):
                v = base + A[c]
                pr[c] = 0 if v < 0 else (255 if v > 255 else v)
    elif mode == 2:  # B_VE_PRED
        x = (C, A[0], A[1], A[2], A[3], AR[0])
        row = [(x[c] + 2 * x[c + 1] + x[c + 2] + 2) >> 2 for c in range(4)]
        for r in range(4):
            p[r] = row[:]
    elif mode == 3:  # B_HE_PRED
        col = (
            (C + 2 * L[0] + L[1] + 2) >> 2,
            (L[0] + 2 * L[1] + L[2] + 2) >> 2,
            (L[1] + 2 * L[2] + L[3] + 2) >> 2,
            (L[2] + 2 * L[3] + L[3] + 2) >> 2,
        )
        for r in range(4):
            pr = p[r]
            pr[0] = pr[1] = pr[2] = pr[3] = col[r]
    elif mode == 4:  # B_LD_PRED
        x = (A[0], A[1], A[2], A[3], AR[0], AR[1], AR[2], AR[3])
        e = [(x[i] + 2 * x[i + 1] + x[i + 2] + 2) >> 2 for i in range(6)]
        e.append((x[6] + 3 * x[7] + 2) >> 2)
        for r in range(4):
            for c in range(4):
                p[r][c] = e[r + c]
    elif mode == 5:  # B_RD_PRED
        e = (L[3], L[2], L[1], L[0], C, A[0], A[1], A[2], A[3])
        f = [(e[i] + 2 * e[i + 1] + e[i + 2] + 2) >> 2 for i in range(7)]
        for r in range(4):
            for c in range(4):
                p[r][c] = f[c - r + 3]
    elif mode == 6:  # B_VR_PRED
        p[0][0] = p[2][1] = (C + A[0] + 1) >> 1
        p[0][1] = p[2][2] = (A[0] + A[1] + 1) >> 1
        p[0][2] = p[2][3] = (A[1] + A[2] + 1) >> 1
        p[0][3] = (A[2] + A[3] + 1) >> 1
        p[1][0] = p[3][1] = (L[0] + 2 * C + A[0] + 2) >> 2
        p[1][1] = p[3][2] = (C + 2 * A[0] + A[1] + 2) >> 2
        p[1][2] = p[3][3] = (A[0] + 2 * A[1] + A[2] + 2) >> 2
        p[1][3] = (A[1] + 2 * A[2] + A[3] + 2) >> 2
        p[2][0] = (C + 2 * L[0] + L[1] + 2) >> 2
        p[3][0] = (L[0] + 2 * L[1] + L[2] + 2) >> 2
    elif mode == 7:  # B_VL_PRED
        p[0][0] = (A[0] + A[1] + 1) >> 1
        p[1][0] = (A[0] + 2 * A[1] + A[2] + 2) >> 2
        p[2][0] = p[0][1] = (A[1] + A[2] + 1) >> 1
        p[1][1] = p[3][0] = (A[1] + 2 * A[2] + A[3] + 2) >> 2
        p[2][1] = p[0][2] = (A[2] + A[3] + 1) >> 1
        p[3][1] = p[1][2] = (A[2] + 2 * A[3] + AR[0] + 2) >> 2
        p[2][2] = p[0][3] = (A[3] + AR[0] + 1) >> 1
        p[3][2] = p[1][3] = (A[3] + 2 * AR[0] + AR[1] + 2) >> 2
        p[2][3] = (AR[0] + 2 * AR[1] + AR[2] + 2) >> 2
        p[3][3] = (AR[1] + 2 * AR[2] + AR[3] + 2) >> 2
    elif mode == 8:  # B_HD_PRED
        p[0][0] = p[1][2] = (L[0] + C + 1) >> 1
        p[0][1] = p[1][3] = (L[0] + 2 * C + A[0] + 2) >> 2
        p[0][2] = (C + 2 * A[0] + A[1] + 2) >> 2
        p[0][3] = (A[0] + 2 * A[1] + A[2] + 2) >> 2
        p[1][0] = p[2][2] = (L[1] + L[0] + 1) >> 1
        p[1][1] = p[2][3] = (C + 2 * L[0] + L[1] + 2) >> 2
        p[2][0] = p[3][2] = (L[2] + L[1] + 1) >> 1
        p[2][1] = p[3][3] = (L[0] + 2 * L[1] + L[2] + 2) >> 2
        p[3][0] = (L[3] + L[2] + 1) >> 1
        p[3][1] = (L[1] + 2 * L[2] + L[3] + 2) >> 2
    else:  # B_HU_PRED
        p[0][0] = (L[0] + L[1] + 1) >> 1
        p[0][1] = (L[0] + 2 * L[1] + L[2] + 2) >> 2
        p[0][2] = p[1][0] = (L[1] + L[2] + 1) >> 1
        p[0][3] = p[1][1] = (L[1] + 2 * L[2] + L[3] + 2) >> 2
        p[1][2] = p[2][0] = (L[2] + L[3] + 1) >> 1
        p[1][3] = p[2][1] = (L[2] + 2 * L[3] + L[3] + 2) >> 2
        p[2][2] = p[2][3] = L[3]
        p[3][0] = p[3][1] = p[3][2] = p[3][3] = L[3]
    return p


def _bpred_workspace(Y, y0, x0, mx, my, mb_w):
    """17x21 B_PRED border workspace (§12.2/§12.3): synthetic 127/129
    edges, the above-right macroblock quirk, and the MB-level top-right
    quartet reused for rows 4/8/12.  Shared by the decoder and the
    fixture encoder so the prediction chain stays bit-identical."""
    L = np.empty((17, 21), np.int32)
    if my > 0:
        L[0, 1:17] = Y[y0 - 1, x0:x0 + 16]
        L[0, 0] = 129 if mx == 0 else Y[y0 - 1, x0 - 1]
        if mx < mb_w - 1:
            L[0, 17:21] = Y[y0 - 1, x0 + 16:x0 + 20]
        else:
            L[0, 17:21] = Y[y0 - 1, x0 + 15]
    else:
        L[0, :] = 127
    if mx > 0:
        L[1:17, 0] = Y[y0:y0 + 16, x0 - 1]
    else:
        L[1:17, 0] = 129
    # rows below reuse the MB-level top-right quartet
    L[4, 17:21] = L[8, 17:21] = L[12, 17:21] = L[0, 17:21]
    return L


def _decode_vp8_frame(data: bytes, apply_filter: bool = True):
    """Decode one key frame; returns (y, u, v, w, h) with full-MB-padded
    planes and the display dimensions."""
    if len(data) < 10:
        raise ValueError("truncated VP8 frame")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise ValueError("VP8 interframe in still image")
    first_part_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 start code")
    (wraw,) = struct.unpack("<H", data[6:8])
    (hraw,) = struct.unpack("<H", data[8:10])
    w, h = wraw & 0x3FFF, hraw & 0x3FFF  # upper 2 bits: display scaling
    if w == 0 or h == 0 or w * h > _MAX_PIXELS:
        raise ValueError("VP8 dimensions out of bounds")
    if 10 + first_part_size > len(data):
        raise ValueError("VP8 first partition overruns frame")
    bd = _Bool(data[10:10 + first_part_size])
    hd = _parse_header(bd)

    mb_w, mb_h = (w + 15) >> 4, (h + 15) >> 4

    # token partitions (§9.5): sizes of all but the last are explicit
    n_parts = hd["n_parts"]
    rest = data[10 + first_part_size:]
    sizes_len = 3 * (n_parts - 1)
    if len(rest) < sizes_len:
        raise ValueError("VP8 partition size table truncated")
    parts = []
    off = sizes_len
    for i in range(n_parts - 1):
        sz = rest[3 * i] | (rest[3 * i + 1] << 8) | (rest[3 * i + 2] << 16)
        if off + sz > len(rest):
            raise ValueError("VP8 partition overruns frame")
        parts.append(_Bool(rest[off:off + sz]))
        off += sz
    parts.append(_Bool(rest[off:]))

    # ---- pass 1: per-MB prediction records (all in partition 1, §11) --
    n_mb = mb_w * mb_h
    seg_ids = np.zeros(n_mb, np.uint8)
    skips = np.zeros(n_mb, np.uint8)
    ymodes = np.zeros(n_mb, np.uint8)
    uvmodes = np.zeros(n_mb, np.uint8)
    bmodes = np.zeros((mb_h, mb_w, 4, 4), np.uint8)
    stp = hd["seg_tree_probs"]
    kb = T.KF_BMODE_PROBS
    for my in range(mb_h):
        for mx in range(mb_w):
            i = my * mb_w + mx
            if hd["update_map"]:
                b0 = bd.bit(stp[0])
                seg_ids[i] = 2 * b0 + bd.bit(stp[1 + b0])
            if hd["use_skip"]:
                skips[i] = bd.bit(hd["skip_prob"])
            ym = bd.tree(_KF_YMODE_TREE, _KF_YMODE_PROB)
            ymodes[i] = ym
            if ym == 4:  # B_PRED: 16 sub-modes with neighbor contexts
                bm = bmodes[my, mx]
                for r in range(4):
                    for c in range(4):
                        if r > 0:
                            a = bm[r - 1, c]
                        elif my > 0:
                            a = bmodes[my - 1, mx, 3, c]
                        else:
                            a = 0
                        if c > 0:
                            l = bm[r, c - 1]
                        elif mx > 0:
                            l = bmodes[my, mx - 1, r, 3]
                        else:
                            l = 0
                        bm[r, c] = bd.tree(
                            _BMODE_TREE, kb, 0, (int(a) * 10 + int(l)) * 9)
            else:
                bmodes[my, mx, :, :] = _IMPLIED_BMODE[ym]
            uvmodes[i] = bd.tree(_UV_MODE_TREE, _KF_UV_MODE_PROB)

    # ---- pass 2: tokens + reconstruction, MB raster order -------------
    Y = np.zeros((mb_h * 16, mb_w * 16), np.uint8)
    U = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
    V = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
    dq_cache = {}
    has_coeffs = np.zeros(n_mb, np.uint8)
    probs = hd["coeff_probs"]
    # nonzero contexts: above per MB column, left reset per row (§13.3)
    above_nz = np.zeros((mb_w, 9), np.uint8)  # 4 Y, 2 U, 2 V, 1 Y2
    for my in range(mb_h):
        tbd = parts[my % n_parts]
        left_nz = np.zeros(9, np.uint8)
        for mx in range(mb_w):
            i = my * mb_w + mx
            seg = int(seg_ids[i])
            if seg not in dq_cache:
                dq_cache[seg] = _dequant_factors(hd, seg)
            y1dc, y1ac, y2dc, y2ac, uvdc, uvac = dq_cache[seg]
            ym = int(ymodes[i])
            b_pred = ym == 4
            anz = above_nz[mx]
            coeffs_y = np.zeros((16, 16), np.int64)
            coeffs_u = np.zeros((4, 16), np.int64)
            coeffs_v = np.zeros((4, 16), np.int64)
            y2_out = None
            any_nz = False
            if skips[i]:
                # §13.3 / libwebp: a skipped MB zeroes its contexts,
                # except the Y2 context survives for B_PRED (no Y2 here)
                left_nz[:8] = 0
                anz[:8] = 0
                if not b_pred:
                    left_nz[8] = 0
                    anz[8] = 0
            else:
                if not b_pred:
                    blk = [0] * 16
                    n = _get_coeffs(
                        tbd, probs, 1 * 264, int(anz[8]) + int(left_nz[8]),
                        0, blk)
                    flag = 1 if n > 0 else 0
                    anz[8] = flag
                    left_nz[8] = flag
                    if flag:
                        any_nz = True
                    dq = [0] * 16
                    dq[0] = blk[0] * y2dc
                    for k in range(1, 16):
                        dq[k] = blk[k] * y2ac
                    y2_out = _wht_inverse(dq)
                    first, ptype = 1, 0
                else:
                    first, ptype = 0, 3
                poff = ptype * 264
                for r in range(4):
                    l = int(left_nz[r])
                    for c in range(4):
                        blk = [0] * 16
                        n = _get_coeffs(
                            tbd, probs, poff, l + int(anz[c]), first, blk)
                        l = 1 if n > first else 0
                        anz[c] = l
                        if n > first:
                            any_nz = True
                            coeffs_y[r * 4 + c] = blk
                    left_nz[r] = l
                for pi, (cf, base) in enumerate(
                        ((coeffs_u, 4), (coeffs_v, 6))):
                    for r in range(2):
                        l = int(left_nz[base + r])
                        for c in range(2):
                            blk = [0] * 16
                            n = _get_coeffs(
                                tbd, probs, 2 * 264,
                                l + int(anz[base + c]), 0, blk)
                            l = 1 if n > 0 else 0
                            anz[base + c] = l
                            if n > 0:
                                any_nz = True
                                cf[r * 2 + c] = blk
                        left_nz[base + r] = l
            has_coeffs[i] = 1 if any_nz else 0

            # dequantize + inverse transforms
            coeffs_y[:, 1:] *= y1ac
            if y2_out is not None:
                for k in range(16):
                    coeffs_y[k, 0] = y2_out[k]
            else:
                coeffs_y[:, 0] *= y1dc
            coeffs_u[:, 1:] *= uvac
            coeffs_u[:, 0] *= uvdc
            coeffs_v[:, 1:] *= uvac
            coeffs_v[:, 0] *= uvdc
            ry = _idct_batch(coeffs_y)
            ru = _idct_batch(coeffs_u)
            rv = _idct_batch(coeffs_v)

            y0, x0 = my * 16, mx * 16
            if not b_pred:
                pred = _whole_mb_pred(Y, y0, x0, 16, ym, mx, my)
                # (16,4,4) subblock residuals -> one (16,16) tile
                mb = pred + ry.reshape(4, 4, 4, 4).transpose(
                    0, 2, 1, 3).reshape(16, 16)
                Y[y0:y0 + 16, x0:x0 + 16] = _clip(mb, 0, 255)
            else:
                L = _bpred_workspace(Y, y0, x0, mx, my, mb_w)
                bm = bmodes[my, mx]
                for r in range(4):
                    rr = 4 * r
                    for c in range(4):
                        cc = 4 * c + 1
                        A = L[rr, cc:cc + 4].tolist()
                        C = int(L[rr, cc - 1])
                        Lt = L[rr + 1:rr + 5, cc - 1].tolist()
                        AR = L[rr, cc + 4:cc + 8].tolist()
                        pred = _bpred_block(int(bm[r, c]), A, Lt, C, AR)
                        blkres = ry[r * 4 + c]
                        dst = L[rr + 1:rr + 5, cc:cc + 4]
                        for q in range(4):
                            row = pred[q]
                            res = blkres[q]
                            for t in range(4):
                                v = row[t] + int(res[t])
                                dst[q, t] = 0 if v < 0 else (
                                    255 if v > 255 else v)
                Y[y0:y0 + 16, x0:x0 + 16] = L[1:17, 1:17]

            cy0, cx0 = my * 8, mx * 8
            uvm = int(uvmodes[i])
            for plane, res in ((U, ru), (V, rv)):
                pred = _whole_mb_pred(plane, cy0, cx0, 8, uvm, mx, my)
                mbuv = pred + res.reshape(2, 2, 4, 4).transpose(
                    0, 2, 1, 3).reshape(8, 8)
                plane[cy0:cy0 + 8, cx0:cx0 + 8] = _clip(mbuv, 0, 255)

    # ---- pass 3: loop filter (§15) ------------------------------------
    # frame-level 0 disables filtering entirely, even with per-segment
    # overrides (libwebp filter_type_ derivation; RFC 6386 §15.1)
    if apply_filter and hd["filter_level"] != 0:
        _loop_filter(Y, U, V, hd, seg_ids, ymodes, skips, has_coeffs,
                     mb_w, mb_h)
    return Y, U, V, w, h


# ---- loop filter (RFC 6386 §15.2, §15.3) -----------------------------

try:  # raw clip ufunc skips np.clip dispatch overhead; the module
    # path moved in numpy 2.x, so fall back to the public API there
    _clip = np.core.umath.clip
except AttributeError:
    _clip = np.clip


def _s8(x):
    return _clip(x, -128, 127)


def _common_adjust(P, rows, use_outer):
    """§15.2 common adjustment (P is a signed int32 array (n, 8) of
    p3..q3 across the edge); rows selects which lanes are written and
    use_outer is the per-lane use_outer_taps flag.  Returns F."""
    p1, p0, q0, q1 = P[:, 2], P[:, 3], P[:, 4], P[:, 5]
    a = _s8((np.where(use_outer, _s8(p1 - q1), 0)) + 3 * (q0 - p0))
    F = _s8(a + 4) >> 3
    E = _s8(a + 3) >> 3
    P[:, 4] = np.where(rows, _s8(q0 - F), q0)
    P[:, 3] = np.where(rows, _s8(p0 + E), p0)
    return F


def _filter_edge(P, edge_limit, interior, hev_t, is_mb_edge, simple):
    """Filter one edge: P is (n, 8) int32 of unsigned pixel values
    p3..p0 q0..q3 across the edge; modified in place."""
    u = P
    abs_ = np.abs
    mask = (abs_(u[:, 3] - u[:, 4]) * 2 + (abs_(u[:, 2] - u[:, 5]) >> 1)
            ) <= edge_limit
    if simple:
        S = u - 128
        _common_adjust(S, mask, np.ones(len(u), bool))
        u[:] = S + 128
        return
    for a, b in ((0, 1), (1, 2), (2, 3), (5, 4), (6, 5), (7, 6)):
        mask &= abs_(u[:, a] - u[:, b]) <= interior
    if not mask.any():
        return
    hev = (abs_(u[:, 2] - u[:, 3]) > hev_t) | (abs_(u[:, 5] - u[:, 4]) > hev_t)
    S = u - 128
    if is_mb_edge:
        p2, p1, p0 = S[:, 1], S[:, 2], S[:, 3]
        q0, q1, q2 = S[:, 4], S[:, 5], S[:, 6]
        m_nh = mask & ~hev
        w = _s8(_s8(p1 - q1) + 3 * (q0 - p0))
        a = _s8((27 * w + 63) >> 7)
        S[:, 4] = np.where(m_nh, _s8(q0 - a), S[:, 4])
        S[:, 3] = np.where(m_nh, _s8(p0 + a), S[:, 3])
        a = _s8((18 * w + 63) >> 7)
        S[:, 5] = np.where(m_nh, _s8(q1 - a), S[:, 5])
        S[:, 2] = np.where(m_nh, _s8(p1 + a), S[:, 2])
        a = _s8((9 * w + 63) >> 7)
        S[:, 6] = np.where(m_nh, _s8(q2 - a), S[:, 6])
        S[:, 1] = np.where(m_nh, _s8(p2 + a), S[:, 1])
        _common_adjust(S, mask & hev, np.ones(len(u), bool))
    else:
        # subblock filter: use_outer_taps = hev (§15.3)
        F = _common_adjust(S, mask, hev)
        m_nh = mask & ~hev
        a = (F + 1) >> 1
        S[:, 5] = np.where(m_nh, _s8(S[:, 5] - a), S[:, 5])
        S[:, 2] = np.where(m_nh, _s8(S[:, 2] + a), S[:, 2])
    u[:] = S + 128


def _loop_filter(Y, U, V, hd, seg_ids, ymodes, skips, has_coeffs,
                 mb_w, mb_h):
    simple = hd["filter_simple"]
    sharp = hd["sharpness"]
    lvl_cache = {}
    for my in range(mb_h):
        for mx in range(mb_w):
            i = my * mb_w + mx
            seg = int(seg_ids[i])
            b_pred = int(ymodes[i]) == 4
            key = (seg, b_pred)
            if key not in lvl_cache:
                lvl_cache[key] = _filter_level(hd, seg, b_pred)
            lvl = lvl_cache[key]
            if lvl == 0:
                continue
            interior = lvl
            if sharp:
                interior >>= 2 if sharp > 4 else 1
                if interior > 9 - sharp:
                    interior = 9 - sharp
            if interior < 1:
                interior = 1
            mb_lim = ((lvl + 2) * 2) + interior
            sub_lim = (lvl * 2) + interior
            hev_t = 2 if lvl >= 40 else (1 if lvl >= 15 else 0)
            inner = has_coeffs[i] or b_pred
            y0, x0 = my * 16, mx * 16
            cy0, cx0 = my * 8, mx * 8

            def vedge(plane, r0, c, n, lim, mb_edge):
                P = plane[r0:r0 + n, c - 4:c + 4].astype(np.int32)
                _filter_edge(P, lim, interior, hev_t, mb_edge, simple)
                plane[r0:r0 + n, c - 4:c + 4] = P

            def hedge(plane, r, c0, n, lim, mb_edge):
                P = plane[r - 4:r + 4, c0:c0 + n].T.astype(np.int32)
                _filter_edge(P, lim, interior, hev_t, mb_edge, simple)
                plane[r - 4:r + 4, c0:c0 + n] = P.T

            def uv_vedge(c, lim, mb_edge):
                # U and V share every filter parameter — one stacked
                # 16-lane call instead of two 8-lane calls
                P = np.concatenate((
                    U[cy0:cy0 + 8, c - 4:c + 4],
                    V[cy0:cy0 + 8, c - 4:c + 4])).astype(np.int32)
                _filter_edge(P, lim, interior, hev_t, mb_edge, simple)
                U[cy0:cy0 + 8, c - 4:c + 4] = P[:8]
                V[cy0:cy0 + 8, c - 4:c + 4] = P[8:]

            def uv_hedge(r, lim, mb_edge):
                P = np.concatenate((
                    U[r - 4:r + 4, cx0:cx0 + 8].T,
                    V[r - 4:r + 4, cx0:cx0 + 8].T)).astype(np.int32)
                _filter_edge(P, lim, interior, hev_t, mb_edge, simple)
                U[r - 4:r + 4, cx0:cx0 + 8] = P[:8].T
                V[r - 4:r + 4, cx0:cx0 + 8] = P[8:].T

            if mx > 0:
                vedge(Y, y0, x0, 16, mb_lim, True)
                if not simple:
                    uv_vedge(cx0, mb_lim, True)
            if inner:
                for dx in (4, 8, 12):
                    vedge(Y, y0, x0 + dx, 16, sub_lim, False)
                if not simple:
                    uv_vedge(cx0 + 4, sub_lim, False)
            if my > 0:
                hedge(Y, y0, x0, 16, mb_lim, True)
                if not simple:
                    uv_hedge(cy0, mb_lim, True)
            if inner:
                for dy in (4, 8, 12):
                    hedge(Y, y0 + dy, x0, 16, sub_lim, False)
                if not simple:
                    uv_hedge(cy0 + 4, sub_lim, False)


# ---- public API ------------------------------------------------------

def decode_vp8(payload: bytes, apply_loop_filter: bool = True):
    """Decode a VP8 key frame ('VP8 ' WebP chunk body) to cropped
    (y, u, v) uint8 planes: y is (h, w); u/v are ((h+1)//2, (w+1)//2).

    apply_loop_filter=False skips §15 deblocking (test bring-up knob,
    mirrors libwebp's bypass_filtering)."""
    payload = bytes(payload)
    y, u, v, w, h = _decode_vp8_frame(payload, apply_filter=apply_loop_filter)
    cw, ch = (w + 1) >> 1, (h + 1) >> 1
    return y[:h, :w], u[:ch, :cw], v[:ch, :cw]


def _fancy_upsample(c: np.ndarray, h: int, w: int) -> np.ndarray:
    """Chroma half-plane -> full plane with the 9-3-3-1 diagonal filter
    libwebp applies by default ("fancy upsampling", upsampling.c): each
    output pixel blends the 4 nearest chroma samples, treating them as
    centered on 2x2 luma quads, with edge replication."""
    ch, cw = c.shape
    r = np.arange(h)
    col = np.arange(w)
    rn = np.clip(r >> 1, 0, ch - 1)
    rf = np.clip(rn + np.where(r & 1, 1, -1), 0, ch - 1)
    cn = np.clip(col >> 1, 0, cw - 1)
    cf = np.clip(cn + np.where(col & 1, 1, -1), 0, cw - 1)
    C = c.astype(np.int32)
    near = C[np.ix_(rn, cn)]
    horiz = C[np.ix_(rn, cf)]
    vert = C[np.ix_(rf, cn)]
    diag = C[np.ix_(rf, cf)]
    return (9 * near + 3 * horiz + 3 * vert + diag + 8) >> 4


def yuv_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """YUV420 -> RGB with libwebp's default fancy (9-3-3-1) chroma
    upsampling and its published fixed-point BT.601 coefficients
    (yuv.h) — the composed decode is byte-exact vs WebPDecodeRGB."""
    h, w = y.shape
    uu = _fancy_upsample(u, h, w)
    vv = _fancy_upsample(v, h, w)
    yy = y.astype(np.int32)
    ys = (yy * 19077) >> 8
    r = (ys + ((vv * 26149) >> 8) - 14234) >> 6
    g = (ys - ((uu * 6419) >> 8) - ((vv * 13320) >> 8) + 8708) >> 6
    b = (ys + ((uu * 33050) >> 8) - 17685) >> 6
    out = np.empty((h, w, 3), np.uint8)
    out[:, :, 0] = np.clip(r, 0, 255)
    out[:, :, 1] = np.clip(g, 0, 255)
    out[:, :, 2] = np.clip(b, 0, 255)
    return out


def decode_vp8_to_rgb(payload: bytes) -> np.ndarray:
    """'VP8 ' chunk body -> (h, w, 3) uint8 RGB."""
    return yuv_to_rgb(*decode_vp8(payload))
