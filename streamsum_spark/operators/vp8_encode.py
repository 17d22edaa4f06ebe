"""VP8 key-frame fixture ENCODER (RFC 6386 write side) — stdlib + numpy.

Role mirrors the other codecs' fixture encoders (encode_jpeg,
encode_webp_lossless, encode_tiff): produce real, spec-valid lossy WebP
streams inside the repo so synthetic_media and the tests can exercise
the decoder without any codec library.  Uniquely for VP8, the encoder
is also a *coverage* tool: libwebp's encoder always emits one token
partition, the normal loop filter, and no segmentation, so the decoder
paths for multiple partitions (vp8.py partition dispatch), the simple
filter, per-segment quantizers, and segment-map parsing were otherwise
untestable against an external implementation.  The tests encode with
these knobs and demand my decoder and libwebp's decoder agree
byte-for-byte on the result — libwebp acts as referee on streams it
could never have produced itself.

Write-side structures mirror vp8.py one-for-one (same trees, bands,
contexts, zigzag); reconstruction inside the encoder calls the
decoder's own prediction/IDCT helpers so the intra prediction chain is
exact.  Forward DCT/WHT are the numerically-inverted float analogs of
the decoder's fixed-point inverses — any rounding gap lands in image
distortion, never in bitstream validity.

Boolean encoder follows RFC 6386 7.3 (bottom/range with carry
propagation); roundtrip against the 7.2 decoder is pinned in tests.
"""
from __future__ import annotations

import struct

import numpy as np

from . import vp8 as D
from . import vp8_tables as T


class _BoolEnc:
    """RFC 6386 7.3 boolean encoder."""

    def __init__(self):
        self.out = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def _carry(self):
        i = len(self.out) - 1
        while i >= 0 and self.out[i] == 0xFF:
            self.out[i] = 0
            i -= 1
        if i >= 0:
            self.out[i] += 1
        else:  # carry past the first byte: cannot occur mid-stream
            self.out.insert(0, 1)

    def bit(self, b: int, prob: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if b:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            if self.bottom & (1 << 31):
                self._carry()
                self.bottom &= 0x7FFFFFFF
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.range <<= 1
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8

    def literal(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bit((v >> i) & 1, 128)

    def signed_literal(self, v: int, n: int) -> None:
        self.literal(abs(v), n)
        self.bit(1 if v < 0 else 0, 128)

    def flush(self) -> bytes:
        c = self.bit_count
        v = self.bottom
        if v & (1 << (32 - c)):
            self._carry()
        v = (v << (c & 7)) & 0xFFFFFFFF
        for _ in range(c >> 3):
            v = (v << 8) & 0xFFFFFFFF
        for _ in range(4):
            self.out.append((v >> 24) & 0xFF)
            v = (v << 8) & 0xFFFFFFFF
        return bytes(self.out)


def _tree_paths(tree, start=0):
    """symbol -> [(prob_index, bit), ...] walking from `start`."""
    paths = {}

    def walk(i, path):
        for b in (0, 1):
            nxt = tree[i + b]
            p = path + [(i >> 1, b)]
            if nxt <= 0:
                paths[-nxt] = p
            else:
                walk(nxt, p)

    walk(start, [])
    return paths


_YMODE_PATH = _tree_paths(D._KF_YMODE_TREE)
_UV_PATH = _tree_paths(D._UV_MODE_TREE)
_BMODE_PATH = _tree_paths(D._BMODE_TREE)
_TOKEN_PATH = _tree_paths(D._TOKEN_TREE)       # with the EOB branch
_TOKEN_PATH_NOEOB = _tree_paths(D._TOKEN_TREE, 2)  # after a zero run
# category ranges for |v| >= 5: (token, base, n_extra_bits)
_CATS = [(5 + c, D._CAT_BASE[c], len(D._CAT_PROBS[c])) for c in range(6)]


def _emit_tree(enc, path, probs, off):
    for idx, b in path:
        enc.bit(b, probs[off + idx])


# ---- forward transforms: float inverses of the decoder's inverses ----

def _linear_matrix(apply_fn, n):
    m = np.zeros((n, n))
    for i in range(n):
        e = np.zeros(n)
        e[i] = 1.0
        m[:, i] = apply_fn(e)
    return m


def _idct_float(x):
    x = x.reshape(4, 4).astype(float)
    c, s = 20091 / 65536.0, 35468 / 65536.0
    y = np.empty_like(x)
    a1 = x[0] + x[2]
    b1 = x[0] - x[2]
    c1 = x[1] * s - (x[3] + x[3] * c)
    d1 = (x[1] + x[1] * c) + x[3] * s
    y[0], y[1], y[2], y[3] = a1 + d1, b1 + c1, b1 - c1, a1 - d1
    z = np.empty_like(x)
    a1 = y[:, 0] + y[:, 2]
    b1 = y[:, 0] - y[:, 2]
    c1 = y[:, 1] * s - (y[:, 3] + y[:, 3] * c)
    d1 = (y[:, 1] + y[:, 1] * c) + y[:, 3] * s
    z[:, 0], z[:, 1], z[:, 2], z[:, 3] = (
        (a1 + d1) / 8, (b1 + c1) / 8, (b1 - c1) / 8, (a1 - d1) / 8)
    return z.reshape(16)


def _wht_float(x):
    t = np.empty(16)
    for i in range(4):
        a1 = x[i] + x[12 + i]
        b1 = x[4 + i] + x[8 + i]
        c1 = x[4 + i] - x[8 + i]
        d1 = x[i] - x[12 + i]
        t[i], t[4 + i], t[8 + i], t[12 + i] = a1 + b1, c1 + d1, a1 - b1, d1 - c1
    out = np.empty(16)
    for i in range(4):
        a1 = t[4 * i] + t[4 * i + 3]
        b1 = t[4 * i + 1] + t[4 * i + 2]
        c1 = t[4 * i + 1] - t[4 * i + 2]
        d1 = t[4 * i] - t[4 * i + 3]
        out[4 * i:4 * i + 4] = [(a1 + b1) / 8, (c1 + d1) / 8,
                                (a1 - b1) / 8, (d1 - c1) / 8]
    return out


_FDCT = np.linalg.inv(_linear_matrix(_idct_float, 16))
_FWHT = np.linalg.inv(_linear_matrix(_wht_float, 16))


def _quant(vec, dq_dc, dq_ac):
    lv = np.rint(vec / np.array([dq_dc] + [dq_ac] * 15)).astype(np.int64)
    return np.clip(lv, -2047, 2047)


# ---- token emission (mirror of vp8._get_coeffs) ----------------------

def _put_coeffs(enc, probs, plane_off, ctx, first, levels):
    """Emit one block's tokens; `levels` is the 16 natural-order
    quantized values.  Returns the decoder's nz flag (n > first)."""
    bands = T.COEFF_BANDS
    zz = D._ZIGZAG
    toks = [int(levels[zz[n]]) for n in range(16)]
    eob = 16
    while eob > first and toks[eob - 1] == 0:
        eob -= 1
    n = first
    start_noeob = False
    while n < 16:
        off = plane_off + bands[n] * 33 + ctx * 11
        paths = _TOKEN_PATH_NOEOB if start_noeob else _TOKEN_PATH
        if n >= eob:
            _emit_tree(enc, paths[11], probs, off)
            break
        v = toks[n]
        av = abs(v)
        if av == 0:
            _emit_tree(enc, paths[0], probs, off)
            ctx = 0
            start_noeob = True
            n += 1
            continue
        if av <= 4:
            _emit_tree(enc, paths[av], probs, off)
        else:
            for tok, base, nbits in _CATS:
                if av < base + (1 << nbits):
                    break
            _emit_tree(enc, paths[tok], probs, off)
            extra = av - base
            for i, p in enumerate(D._CAT_PROBS[tok - 5]):
                enc.bit((extra >> (nbits - 1 - i)) & 1, p)
        enc.bit(1 if v < 0 else 0, 128)
        ctx = 1 if av == 1 else 2
        start_noeob = False
        n += 1
    return eob > first


# ---- color conversion ------------------------------------------------

def _rgb_to_yuv420(px: np.ndarray):
    r = px[:, :, 0].astype(float)
    g = px[:, :, 1].astype(float)
    b = px[:, :, 2].astype(float)
    y = 0.2568 * r + 0.5041 * g + 0.0979 * b + 16
    u = -0.1482 * r - 0.2910 * g + 0.4392 * b + 128
    v = 0.4392 * r - 0.3678 * g - 0.0714 * b + 128
    h, w = y.shape
    ph, pw = (h + 1) & ~1, (w + 1) & ~1  # even for 2x2 chroma pooling
    def pad(p):
        return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
    u, v = pad(u), pad(v)
    u = (u[0::2, 0::2] + u[0::2, 1::2] + u[1::2, 0::2] + u[1::2, 1::2]) / 4
    v = (v[0::2, 0::2] + v[0::2, 1::2] + v[1::2, 0::2] + v[1::2, 1::2]) / 4
    clip = lambda p: np.clip(np.rint(p), 0, 255).astype(np.uint8)  # noqa: E731
    return clip(y), clip(u), clip(v)


def _pad_to_mb(plane: np.ndarray, size: int) -> np.ndarray:
    h, w = plane.shape
    ph = -h % size
    pw = -w % size
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


# ---- header ----------------------------------------------------------

def _write_header(enc, hd, probs):
    """Mirror of vp8._parse_header, same field order."""
    enc.literal(0, 1)  # color space
    enc.literal(0, 1)  # clamping
    seg = hd["seg_enabled"]
    enc.bit(seg, 128)
    if seg:
        enc.bit(hd["update_map"], 128)
        enc.bit(1, 128)  # update_data
        enc.bit(hd["seg_abs"], 128)
        for q in hd["seg_q"]:
            if q:
                enc.bit(1, 128)
                enc.signed_literal(q, 7)
            else:
                enc.bit(0, 128)
        for lf in hd["seg_lf"]:
            if lf:
                enc.bit(1, 128)
                enc.signed_literal(lf, 6)
            else:
                enc.bit(0, 128)
        if hd["update_map"]:
            for p in hd["seg_tree_probs"]:
                if p != 255:
                    enc.bit(1, 128)
                    enc.literal(p, 8)
                else:
                    enc.bit(0, 128)
    enc.literal(hd["filter_simple"], 1)
    enc.literal(hd["filter_level"], 6)
    enc.literal(hd["sharpness"], 3)
    enc.bit(0, 128)  # lf_delta_enabled
    enc.literal({1: 0, 2: 1, 4: 2, 8: 3}[hd["n_parts"]], 2)
    enc.literal(hd["y_ac_qi"], 7)
    for k in ("y1_dc_dq", "y2_dc_dq", "y2_ac_dq", "uv_dc_dq", "uv_ac_dq"):
        dq = hd[k]
        if dq:
            enc.bit(1, 128)
            enc.signed_literal(dq, 4)
        else:
            enc.bit(0, 128)
    enc.bit(0, 128)  # refresh_entropy_probs
    upd = T.COEFF_UPDATE_PROBS
    defaults = T.DEFAULT_COEFF_PROBS
    for idx in range(4 * 8 * 3 * 11):
        if probs[idx] != defaults[idx]:
            enc.bit(1, upd[idx])
            enc.literal(probs[idx], 8)
        else:
            enc.bit(0, upd[idx])
    enc.bit(hd["use_skip"], 128)
    if hd["use_skip"]:
        enc.literal(hd["skip_prob"], 8)


# ---- main ------------------------------------------------------------

def encode_vp8(
    px: np.ndarray,
    quality: int = 75,
    *,
    n_parts: int = 1,
    n_segments: int = 1,
    seg_abs: bool = False,
    use_skip: bool = True,
    filter_level: int = 20,
    filter_simple: int = 0,
    sharpness: int = 0,
    coeff_updates: dict | None = None,
    mode_seed: int = 0,
) -> bytes:
    """(h, w, 3) uint8 RGB -> 'VP8 ' chunk payload (one key frame).

    Knobs map straight to decoder paths: n_parts (1/2/4/8 token
    partitions, row-dispatched), n_segments (per-segment quantizers +
    tree-coded segment map), filter_simple/sharpness (loop-filter
    variants), coeff_updates ({flat_index: prob} header updates),
    mode_seed (varies the deterministic intra-mode cycling)."""
    if n_parts not in (1, 2, 4, 8):
        raise ValueError("n_parts must be 1/2/4/8")
    if not 1 <= n_segments <= 4:
        raise ValueError("n_segments must be 1..4")
    h, w = px.shape[:2]
    if not (0 < w < 16384 and 0 < h < 16384):
        raise ValueError("dimensions out of range")
    y_src, u_src, v_src = _rgb_to_yuv420(px)
    y_src = _pad_to_mb(y_src, 16).astype(np.int64)
    u_src = _pad_to_mb(u_src, 8).astype(np.int64)
    v_src = _pad_to_mb(v_src, 8).astype(np.int64)
    mb_h, mb_w = y_src.shape[0] >> 4, y_src.shape[1] >> 4

    qi = max(0, min(127, int(127 - quality * 1.27)))
    seg_deltas = [0, 10, -10, 20][:n_segments] + [0] * (4 - n_segments)
    hd = {
        "seg_enabled": 1 if n_segments > 1 else 0,
        "update_map": 1 if n_segments > 1 else 0,
        "seg_abs": 1 if (seg_abs and n_segments > 1) else 0,
        "seg_q": ([min(127, qi + d) for d in seg_deltas]
                  if seg_abs else seg_deltas),
        "seg_lf": [0, 0, 0, 0],
        "seg_tree_probs": [128, 128, 128] if n_segments > 1 else [255] * 3,
        "filter_simple": filter_simple,
        "filter_level": filter_level,
        "sharpness": sharpness,
        "lf_delta_enabled": 0,
        "ref_lf_delta": [0] * 4,
        "mode_lf_delta": [0] * 4,
        "n_parts": n_parts,
        "y_ac_qi": qi,
        "y1_dc_dq": 0, "y2_dc_dq": 0, "y2_ac_dq": 0,
        "uv_dc_dq": 0, "uv_ac_dq": 0,
        "use_skip": 1 if use_skip else 0,
        "skip_prob": 128,
    }
    probs = list(T.DEFAULT_COEFF_PROBS)
    for idx, val in (coeff_updates or {}).items():
        probs[idx] = val

    p1 = _BoolEnc()
    _write_header(p1, hd, probs)
    tparts = [_BoolEnc() for _ in range(n_parts)]

    # reconstruction planes (decoder-identical prediction sources)
    Y = np.zeros_like(y_src, dtype=np.uint8)
    U = np.zeros_like(u_src, dtype=np.uint8)
    V = np.zeros_like(v_src, dtype=np.uint8)
    bmodes = np.zeros((mb_h, mb_w, 4, 4), np.uint8)
    above_nz = np.zeros((mb_w, 9), np.int64)
    dq_cache = {}
    stp = hd["seg_tree_probs"]
    kb = T.KF_BMODE_PROBS

    for my in range(mb_h):
        tbd = tparts[my % n_parts]
        left_nz = np.zeros(9, np.int64)
        for mx in range(mb_w):
            seg = (mx + my) % n_segments
            if seg not in dq_cache:
                dq_cache[seg] = D._dequant_factors(hd, seg)
            y1dc, y1ac, y2dc, y2ac, uvdc, uvac = dq_cache[seg]
            ym = (mx + 2 * my + mode_seed) % 5
            uvm = (mx + my + mode_seed) % 4
            b_pred = ym == 4
            y0, x0 = my * 16, mx * 16
            cy0, cx0 = my * 8, mx * 8
            anz = above_nz[mx]

            # ---- choose modes / compute coefficients ----------------
            if b_pred:
                bm = bmodes[my, mx]
                for r in range(4):
                    for c in range(4):
                        bm[r, c] = (mx * 4 + my + r * 4 + c + mode_seed) % 10
            else:
                bmodes[my, mx, :, :] = D._IMPLIED_BMODE[ym]

            y_levels = np.zeros((16, 16), np.int64)
            y2_levels = np.zeros(16, np.int64)
            if not b_pred:
                pred = D._whole_mb_pred(Y, y0, x0, 16, ym, mx, my)
                res = y_src[y0:y0 + 16, x0:x0 + 16] - pred
                dcs = np.empty(16)
                ac = np.empty((16, 16))
                for r in range(4):
                    for c in range(4):
                        blk = res[4 * r:4 * r + 4, 4 * c:4 * c + 4]
                        co = _FDCT @ blk.reshape(16).astype(float)
                        dcs[r * 4 + c] = co[0]
                        ac[r * 4 + c] = co
                y2_levels = _quant(_FWHT @ dcs, y2dc, y2ac)
                for k in range(16):
                    lv = _quant(ac[k], 1, y1ac)
                    lv[0] = 0  # DC carried by Y2
                    y_levels[k] = lv
                # reconstruct exactly as the decoder will
                dq = [0] * 16
                dq[0] = int(y2_levels[0]) * y2dc
                for k in range(1, 16):
                    dq[k] = int(y2_levels[k]) * y2ac
                y2_out = D._wht_inverse(dq)
                cy = y_levels.copy()
                cy[:, 1:] *= y1ac
                for k in range(16):
                    cy[k, 0] = y2_out[k]
                ry = D._idct_batch(cy)
                mb = pred + ry.reshape(4, 4, 4, 4).transpose(
                    0, 2, 1, 3).reshape(16, 16)
                Y[y0:y0 + 16, x0:x0 + 16] = np.clip(mb, 0, 255)
            else:
                # sequential subblock encode through the decoder's own
                # B_PRED workspace builder (bit-identical border rules)
                L = D._bpred_workspace(Y, y0, x0, mx, my, mb_w)
                bm = bmodes[my, mx]
                for r in range(4):
                    rr = 4 * r
                    for c in range(4):
                        cc = 4 * c + 1
                        A = L[rr, cc:cc + 4].tolist()
                        C = int(L[rr, cc - 1])
                        Lt = L[rr + 1:rr + 5, cc - 1].tolist()
                        AR = L[rr, cc + 4:cc + 8].tolist()
                        pred = np.array(
                            D._bpred_block(int(bm[r, c]), A, Lt, C, AR))
                        src = y_src[y0 + rr:y0 + rr + 4,
                                    x0 + 4 * c:x0 + 4 * c + 4]
                        co = _FDCT @ (src - pred).reshape(16).astype(float)
                        lv = _quant(co, y1dc, y1ac)
                        y_levels[r * 4 + c] = lv
                        dqv = lv.copy()
                        dqv[0] *= y1dc
                        dqv[1:] *= y1ac
                        rec = pred + D._idct_batch(
                            dqv.reshape(1, 16))[0]
                        L[rr + 1:rr + 5, cc:cc + 4] = np.clip(rec, 0, 255)
                Y[y0:y0 + 16, x0:x0 + 16] = L[1:17, 1:17]

            u_levels = np.zeros((4, 16), np.int64)
            v_levels = np.zeros((4, 16), np.int64)
            for plane_src, plane_rec, levels in (
                    (u_src, U, u_levels), (v_src, V, v_levels)):
                pred = D._whole_mb_pred(plane_rec, cy0, cx0, 8, uvm, mx, my)
                res = plane_src[cy0:cy0 + 8, cx0:cx0 + 8] - pred
                for r in range(2):
                    for c in range(2):
                        blk = res[4 * r:4 * r + 4, 4 * c:4 * c + 4]
                        co = _FDCT @ blk.reshape(16).astype(float)
                        levels[r * 2 + c] = _quant(co, uvdc, uvac)
                dqv = levels.copy()
                dqv[:, 0] *= uvdc
                dqv[:, 1:] *= uvac
                ruv = D._idct_batch(dqv)
                mbuv = pred + ruv.reshape(2, 2, 4, 4).transpose(
                    0, 2, 1, 3).reshape(8, 8)
                plane_rec[cy0:cy0 + 8, cx0:cx0 + 8] = np.clip(mbuv, 0, 255)

            all_zero = (not y_levels.any() and not u_levels.any()
                        and not v_levels.any()
                        and (b_pred or not y2_levels.any()))
            skip = hd["use_skip"] and all_zero

            # ---- partition 1: per-MB records (decoder pass-1 order) --
            if hd["update_map"]:
                b0 = 1 if seg >= 2 else 0
                p1.bit(b0, stp[0])
                p1.bit(seg & 1, stp[1 + b0])
            if hd["use_skip"]:
                p1.bit(1 if skip else 0, hd["skip_prob"])
            _emit_tree(p1, _YMODE_PATH[ym], D._KF_YMODE_PROB, 0)
            if b_pred:
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
                            lft = bm[r, c - 1]
                        elif mx > 0:
                            lft = bmodes[my, mx - 1, r, 3]
                        else:
                            lft = 0
                        _emit_tree(p1, _BMODE_PATH[int(bm[r, c])], kb,
                                   (int(a) * 10 + int(lft)) * 9)
            _emit_tree(p1, _UV_PATH[uvm], D._KF_UV_MODE_PROB, 0)

            # ---- token partition (decoder pass-2 order + contexts) ---
            if skip:
                left_nz[:8] = 0
                anz[:8] = 0
                if not b_pred:
                    left_nz[8] = 0
                    anz[8] = 0
                continue
            if not b_pred:
                nz = _put_coeffs(tbd, probs, 1 * 264,
                                 int(anz[8] + left_nz[8]), 0, y2_levels)
                flag = 1 if nz else 0
                anz[8] = flag
                left_nz[8] = flag
                first, poff = 1, 0
            else:
                first, poff = 0, 3 * 264
            for r in range(4):
                lv = int(left_nz[r])
                for c in range(4):
                    nz = _put_coeffs(tbd, probs, poff, lv + int(anz[c]),
                                     first, y_levels[r * 4 + c])
                    lv = 1 if nz else 0
                    anz[c] = lv
                left_nz[r] = lv
            for levels, base in ((u_levels, 4), (v_levels, 6)):
                for r in range(2):
                    lv = int(left_nz[base + r])
                    for c in range(2):
                        nz = _put_coeffs(tbd, probs, 2 * 264,
                                         lv + int(anz[base + c]), 0,
                                         levels[r * 2 + c])
                        lv = 1 if nz else 0
                        anz[base + c] = lv
                    left_nz[base + r] = lv

    first_part = p1.flush()
    token_parts = [t.flush() for t in tparts]
    tag = (len(first_part) << 5) | (1 << 4)  # show_frame, keyframe, v0
    head = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    head += b"\x9d\x01\x2a" + struct.pack("<HH", w, h)
    sizes = b"".join(
        struct.pack("<I", len(p))[:3] for p in token_parts[:-1])
    return head + first_part + sizes + b"".join(token_parts)


def encode_webp_lossy(px: np.ndarray, quality: int = 75, **knobs) -> bytes:
    """RGB -> complete lossy WebP file (RIFF/'VP8 ')."""
    payload = encode_vp8(px, quality, **knobs)
    if len(payload) & 1:
        chunk = payload + b"\x00"
    else:
        chunk = payload
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(chunk)) + b"WEBP"
            + b"VP8 " + struct.pack("<I", len(payload)) + chunk)
