"""Vectorized LZW decode core shared by the GIF and TIFF flavors.

LZW's dictionary looks sequential, but two structural facts make the
decode vectorizable (same playbook as flac.py's Rice reader):

1. Within a clear-segment, code WIDTHS follow a schedule that depends
   only on the emitting-code index — the table grows by exactly one
   entry per code after the first — so every code's bit position is
   known in advance.  Codes extract as numpy reshape+matmul over an
   unpacked bit window, restarting only at an actual Clear.
2. Every dictionary entry's string is a CONTIGUOUS SLICE of already
   emitted output: entry m (created while processing code k = m -
   first_entry + 1) is string(code[k-1]) + first_char(code[k]), i.e.
   out[S[k-1] : S[k-1] + len[k-1] + 1].  Emission is therefore a copy
   of an earlier output range (LZ77-style), one numpy slice copy per
   code — never per byte, never tuple concatenation.

The per-code Python work is a short scalar loop (length lookup, slice
copy); chunks that are entirely literal codes (the fixture encoders'
output, and common in sparse images) emit as ONE vectorized store.

Flavor differences, both preserved exactly (pinned by the crafted
KwKwK/width-bump/out-of-range tests, the vendored libtiff goldens, and
a differential fuzz against the previous scalar decoders):

- GIF (spec 89a, appendix F): LSB-first packing, root size 2-11 bits,
  Clear/EOI = (1<<mc), (1<<mc)+1, the decoder widens AFTER next_code
  reaches 1<<width, table freezes at 4096 — decode keeps going without
  new entries.
- TIFF (spec 6.0 §13, libtiff convention): MSB-first, 256/257
  Clear/EOI, EARLY CHANGE (widen at (1<<width)-1 table entries, one
  before the code space fills), table capped at 4095 with KwKwK
  invalid at the cap, truncated streams return partial output.
"""

from __future__ import annotations

from bisect import bisect_right

import numpy as np

# (n_literals, init_width, early_change, cap) -> (widths, maxv) arrays:
# widths[k] = code width before emitting-code k of a segment; maxv[k] =
# table size before code k (code == maxv is the KwKwK self-reference);
# the last element repeats for every later k (frozen table).
_SCHED: dict[tuple, tuple] = {}


def _schedule(n_literals: int, init_width: int, early_change: bool,
              cap: int) -> tuple:
    key = (n_literals, init_width, early_change, cap)
    got = _SCHED.get(key)
    if got is not None:
        return got
    first_entry = n_literals + 2
    w, nc = init_width, first_entry
    widths: list[int] = []
    maxv: list[int] = []
    k = 0
    while True:
        widths.append(w)
        maxv.append(nc)
        if nc >= cap and k >= 1:
            break  # steady state: last entry repeats forever
        if k >= 1 and nc < cap:
            nc += 1
            if w < 12 and nc == ((1 << w) - 1 if early_change else (1 << w)):
                w += 1
        k += 1
    widths_a = np.asarray(widths, np.int64)
    chg = (np.flatnonzero(np.diff(widths_a)) + 1).tolist()  # width-change ks
    out = (widths_a, maxv, chg, first_entry)
    _SCHED[key] = out
    return out


_WEIGHTS: dict[tuple[int, bool], np.ndarray] = {}


def _weights(w: int, msb: bool) -> np.ndarray:
    got = _WEIGHTS.get((w, msb))
    if got is None:
        got = np.int32(1) << (np.arange(w - 1, -1, -1, dtype=np.int32)
                              if msb else np.arange(w, dtype=np.int32))
        _WEIGHTS[(w, msb)] = got
    return got


def _bitlen(k0: int, m: int, widths_a: np.ndarray, last: int) -> int:
    """Total bits of codes k0..k0+m-1 under the schedule."""
    hi = min(k0 + m, last)
    s = int(widths_a[k0:hi].sum()) if k0 < last else 0
    if k0 + m > last:
        s += (k0 + m - max(k0, last)) * int(widths_a[last])
    return s


class _LazyBits:
    """Bit array over the compressed input, unpacked in geometrically
    doubled prefixes: a decode that stops early (small max_out, EOI
    near the front) never pays the 8x-input unpack for bytes it does
    not read (round-10 review fix — a strip near the decode cap cost a
    ~128 MiB transient per call otherwise).  Doubling keeps total
    unpack work O(consumed bytes)."""

    __slots__ = ("data", "order", "bits", "total")

    def __init__(self, data: bytes, msb: bool):
        self.data = np.frombuffer(data, np.uint8)
        self.order = "big" if msb else "little"
        self.total = len(data) * 8
        n0 = min(len(data), 1 << 16)
        self.bits = np.unpackbits(self.data[:n0], bitorder=self.order)

    def ensure(self, nbits: int) -> None:
        if nbits <= self.bits.shape[0]:
            return
        nbytes = min(len(self.data),
                     max((nbits + 7) >> 3, (self.bits.shape[0] >> 3) * 2))
        self.bits = np.unpackbits(self.data[:nbytes], bitorder=self.order)


def _extract(lb: _LazyBits, pos: int, k0: int, n: int,
             widths_a: np.ndarray, chg: list[int], last: int,
             msb: bool) -> tuple[np.ndarray, int]:
    """Extract up to n codes at bit `pos`, emitting-index k0; returns
    (codes, new_pos).  A trailing partial code is dropped (both scalar
    decoders drop unfinished codes at end of data)."""
    parts: list[np.ndarray] = []
    p, k, got = pos, k0, 0
    total = lb.total
    while got < n:
        w = int(widths_a[k]) if k < last else int(widths_a[last])
        if k < last:
            i = bisect_right(chg, k)
            nxt = chg[i] if i < len(chg) else last
            run = min(n - got, nxt - k)
        else:
            run = n - got
        run = min(run, (total - p) // w)
        if run <= 0:
            break
        lb.ensure(p + run * w)
        seg = lb.bits[p : p + run * w].reshape(run, w).astype(np.int32)
        parts.append(seg @ _weights(w, msb))
        p += run * w
        k += run
        got += run
    if not parts:
        return np.empty(0, np.int32), pos
    return (parts[0] if len(parts) == 1 else np.concatenate(parts)), p


def lzw_decode(
    data: bytes,
    *,
    n_literals: int,
    init_width: int,
    msb: bool,
    early_change: bool,
    cap: int,
    max_out: int,
    out_dtype,
    err_prefix: str,
    first_code_msg: str,
    range_msg: str,
) -> np.ndarray:
    clear = n_literals
    eoi = clear + 1
    widths_a, maxv_l, chg, first_entry = _schedule(
        n_literals, init_width, early_change, cap)
    last = len(widths_a) - 1
    store_cap = cap - first_entry + 2  # entries never reference later codes
    if max_out <= 0:
        return np.empty(0, out_dtype)
    lb = _LazyBits(data, msb)
    # headroom: the final code may overshoot max_out by one entry whose
    # length is bounded by the per-segment entry count (< cap)
    out = np.empty(max_out + cap + 2, out_dtype)
    n_out = 0
    pos = 0
    # initial per-segment chunk adapts to the stream's observed segment
    # length (e.g. encoders that Clear on a fixed cadence), so a normal
    # segment extracts in ONE pass while hostile Clear-spam (tiny
    # segments) keeps re-extraction waste at the 64-code floor
    seg_hint = 64
    while True:  # one iteration per clear-segment
        k = 0
        S_l: list[int] = []  # output start of code k (while k < store_cap)
        L_l: list[int] = []  # emitted length of code k
        chunk = seg_hint
        while True:  # chunks within the segment
            codes, p_new = _extract(lb, pos, k, chunk, widths_a, chg,
                                    last, msb)
            ncodes = codes.shape[0]
            if ncodes == 0:
                return out[:n_out]  # data exhausted (partial output)
            spec = np.flatnonzero((codes == clear) | (codes == eoi))
            n_emit = int(spec[0]) if spec.size else ncodes
            k0c = k
            if n_emit:
                emit = codes[:n_emit]
                if int(emit.max()) < n_literals:
                    # all-literal chunk: one vectorized store
                    take = min(n_emit, max_out - n_out)
                    out[n_out : n_out + take] = emit[:take]
                    if k < store_cap:
                        m_store = min(take, store_cap - k)
                        S_l.extend(range(n_out, n_out + m_store))
                        L_l.extend([1] * m_store)
                    n_out += take
                    k += take
                    if n_out >= max_out:
                        return out[:n_out]
                else:
                    kk = k
                    for c in emit.tolist():
                        if c < n_literals:
                            out[n_out] = c
                            ln = 1
                        else:
                            mv = maxv_l[kk] if kk < last else maxv_l[last]
                            if kk == 0:
                                raise ValueError(
                                    f"{err_prefix}{first_code_msg}")
                            if c > mv or (c == mv and mv >= cap):
                                raise ValueError(f"{err_prefix}{range_msg}")
                            j = c - first_entry
                            src = S_l[j]
                            ln = L_l[j] + 1
                            if j + 1 < kk:
                                # fully materialized earlier slice
                                out[n_out : n_out + ln] = out[src : src + ln]
                            else:
                                # KwKwK: string = prev + prev[0]
                                out[n_out : n_out + ln - 1] = (
                                    out[src : src + ln - 1])
                                out[n_out + ln - 1] = out[src]
                        if kk < store_cap:
                            S_l.append(n_out)
                            L_l.append(ln)
                        n_out += ln
                        kk += 1
                        if n_out >= max_out:
                            return out[:n_out]
                    k = kk
            if spec.size:
                # reposition just past the special code (the chunk may
                # have mis-extracted past it under a stale schedule)
                pos += _bitlen(k0c, n_emit + 1, widths_a, last)
                if int(codes[n_emit]) == eoi:
                    return out[:n_out]
                seg_hint = max(64, min(4096, 2 * k))
                break  # Clear: restart segment
            pos = p_new
            chunk = min(chunk * 4, 4096)


def lzw_decode_gif(data: bytes, min_code: int, max_pixels: int) -> np.ndarray:
    """GIF-flavor LZW (see module docstring); returns int16 indices."""
    return lzw_decode(
        data,
        n_literals=1 << min_code,
        init_width=min_code + 1,
        msb=False,
        early_change=False,
        cap=4096,
        max_out=max_pixels,
        out_dtype=np.int16,
        err_prefix="corrupt GIF: ",
        first_code_msg="LZW code out of sequence",
        range_msg="LZW code out of sequence",
    )


def lzw_decode_tiff(data: bytes, max_out: int) -> bytes:
    """TIFF-flavor LZW (see module docstring); returns bytes."""
    return lzw_decode(
        data,
        n_literals=256,
        init_width=9,
        msb=True,
        early_change=True,
        cap=4095,
        max_out=max_out,
        out_dtype=np.uint8,
        err_prefix="corrupt TIFF: ",
        first_code_msg="LZW non-literal after clear",
        range_msg="LZW code out of range",
    ).tobytes()
