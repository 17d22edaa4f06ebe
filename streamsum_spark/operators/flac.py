"""FLAC decoder in pure stdlib + numpy — no codec libraries.

Written from the public FLAC format specification (RFC 9639 / the
xiph.org format document), like jpeg.py from T.81 and gif.py from the
GIF89a spec.  Covers the full fixed-blocksize decode surface a lossless
audio corpus needs:

- STREAMINFO parsing (sample rate, channels, bits-per-sample, totals);
- frame decode: all block-size/sample-rate/sample-size codes, UTF-8
  coded frame numbers, CRC-8-verified headers and CRC-16-verified
  frames (a corrupted frame fails loudly, never yields wrong samples);
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
  (quantized-coefficient recurrence with arithmetic shift), wasted-bits;
- Rice residuals: both 4- and 5-bit parameter widths, partition orders,
  and the escape-to-raw encoding;
- stereo decorrelation: independent, left/side, right/side, mid/side.

The decode hot paths are numpy-vectorized (this is the production
decode path — unlike JPEG/PNG/GIF/TIFF there is no JVM or system
library fallback for FLAC in scope):

- Rice partitions decode via a window-unpacked bit array: unary
  terminators come from ``np.flatnonzero``; the only per-residual
  Python work is the sequential ones-index chain
  ``m += 1 + popcount(remainder window)``, which costs ~2 operations
  per residual instead of ~1 per BIT; quotients and remainders then
  assemble as single numpy expressions.
- FIXED prediction is the inverse of an order-k difference, so
  reconstruction is k successive ``np.cumsum`` calls seeded from the
  warmup diffs — no per-sample loop.  (LPC stays a scalar recurrence:
  the mid-stream ``>> shift`` truncation makes it genuinely
  sequential and non-linear; FIXED dominates real encoders' output.)
- CRC-16 exploits GF(2) linearity: per-byte states tree-combine with
  precomputed advance-by-2^k-bytes tables, so frame verification is a
  handful of numpy passes instead of 8 Python ops per byte.
- Scalar header reads use O(1) ``int.from_bytes`` windows and a
  byte-skipping unary scan.

Hostile-input posture matches the other decoders: the sample budget is
capped before allocation (``_MAX_DECODED_BYTES``), every bit-read is
bounds-checked, and the Rice window scan cannot spin past the frame's
real bytes — work is linear in the stored blob (windows grow
geometrically and are clipped to it).  Malformed structure surfaces as
ValueError.

``encode_flac`` (the test fixture) writes valid fixed-blocksize streams
through the same CRCs, choosing CONSTANT for constant blocks and FIXED
order 0-2 Rice-coded subframes otherwise (plus hooks for VERBATIM and
hand-specified LPC in tests) — decode(encode(x)) is bit-exact because
FLAC is lossless, which makes the roundtrip pin unusually strong.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_DECODED_BYTES = 16 * 1024 * 1024


def _build_crc8_table() -> list[int]:
    t = []
    for b in range(256):
        crc = b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
        t.append(crc)
    return t


_CRC8_T = _build_crc8_table()


def _crc8(data: bytes) -> int:
    crc = 0
    t = _CRC8_T
    for byte in data:
        crc = t[crc ^ byte]
    return crc


def _build_crc16_byte_table() -> np.ndarray:
    t = np.zeros(256, np.uint16)
    for b in range(256):
        crc = b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
        t[b] = crc
    return t


_CRC16_T = _build_crc16_byte_table()
# advance-by-2^k-zero-bytes linear maps, as (hi, lo) uint16 tables:
# state s advances to hi[s >> 8] ^ lo[s & 0xFF]
_CRC16_ADV: list[tuple[np.ndarray, np.ndarray]] = []


def _crc16_adv(k: int) -> tuple[np.ndarray, np.ndarray]:
    while len(_CRC16_ADV) <= k:
        idx = np.arange(256, dtype=np.uint16)
        if not _CRC16_ADV:
            # one zero byte: s' = ((s << 8) & 0xFFFF) ^ T[s >> 8]
            _CRC16_ADV.append((_CRC16_T[idx].copy(), (idx << 8).astype(np.uint16)))
        else:
            hi_p, lo_p = _CRC16_ADV[-1]

            def f(s: np.ndarray) -> np.ndarray:
                return hi_p[s >> 8] ^ lo_p[s & 0xFF]

            _CRC16_ADV.append((f(f(idx << 8)), f(f(idx))))
    return _CRC16_ADV[k]


def _crc16(data: bytes) -> int:
    """CRC-16/BUYPASS via GF(2) tree combine: crc(A||B) =
    advance(crc(A), |B|) ^ crc(B); leading zero bytes are identity, so
    front-padding to a power of two is free."""
    a = np.frombuffer(data, np.uint8)
    if len(a) == 0:
        return 0
    s = _CRC16_T[a].copy()  # per-byte states (init 0)
    n = 1 << (len(s) - 1).bit_length() if len(s) > 1 else 1
    if n != len(s):
        s = np.concatenate([np.zeros(n - len(s), np.uint16), s])
    k = 0
    while len(s) > 1:
        hi, lo = _crc16_adv(k)
        left = s[0::2]
        s = (hi[left >> 8] ^ lo[left & 0xFF]) ^ s[1::2]
        k += 1
    return int(s[0])


class _Bits:
    """MSB-first bit reader with byte-position tracking (CRC windows).

    Scalar reads are O(1) ``int.from_bytes`` windows; unary scans skip
    whole zero bytes.  Bulk reads (residuals, VERBATIM) bypass this
    class entirely via the vectorized helpers below."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.bit = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.bit + n
        nbytes = (end + 7) >> 3
        chunk = self.data[self.pos : self.pos + nbytes]
        if len(chunk) < nbytes:
            raise ValueError("corrupt FLAC: truncated bitstream")
        v = (int.from_bytes(chunk, "big") >> ((nbytes << 3) - end)) & ((1 << n) - 1)
        self.pos += end >> 3
        self.bit = end & 7
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def unary(self) -> int:
        data, pos, bit = self.data, self.pos, self.bit
        size = len(data)
        n = 0
        while True:
            if pos >= size:
                raise ValueError("corrupt FLAC: truncated unary code")
            cur = data[pos] & (0xFF >> bit)
            if cur:
                first = 8 - cur.bit_length()  # MSB-side index of the first 1
                n += first - bit
                bit = first + 1
                if bit == 8:
                    bit = 0
                    pos += 1
                self.pos, self.bit = pos, bit
                return n
            n += 8 - bit
            bit = 0
            pos += 1

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _read_utf8_number(br: _Bits) -> int:
    first = br.read(8)
    if first < 0x80:
        return first
    n_more = 0
    mask = 0x40
    while first & mask:
        n_more += 1
        mask >>= 1
    if n_more < 1 or n_more > 6:
        raise ValueError("corrupt FLAC: bad UTF-8 frame number")
    v = first & (mask - 1)
    for _ in range(n_more):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("corrupt FLAC: bad UTF-8 continuation")
        v = (v << 6) | (b & 0x3F)
    return v


_BLOCKSIZE = {1: 192, **{n: 576 << (n - 2) for n in range(2, 6)},
              **{n: 256 << (n - 8) for n in range(8, 16)}}
_SAMPLE_SIZE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_SAMPLE_RATE = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
                6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}

_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _read_fixed_width(data: bytes, cursor: int, count: int,
                      width: int) -> tuple[np.ndarray, int]:
    """Vectorized read of `count` signed big-endian `width`-bit values
    starting at absolute bit `cursor` (escape partitions, VERBATIM)."""
    if count == 0 or width == 0:
        return np.zeros(count, np.int64), cursor
    total = count * width
    end = cursor + total
    if end > len(data) * 8:
        raise ValueError("corrupt FLAC: truncated bitstream")
    sb = cursor >> 3
    eb = (end + 7) >> 3
    bits = np.unpackbits(np.frombuffer(data, np.uint8, count=eb - sb, offset=sb))
    w = bits[cursor - (sb << 3) :][:total].reshape(count, width).astype(np.int64)
    vals = w @ (np.int64(1) << np.arange(width - 1, -1, -1, dtype=np.int64))
    vals -= (vals >> (width - 1)) << width  # sign-extend
    return vals, end


def _read_rice_partition(data: bytes, cursor: int, count: int,
                         p: int) -> tuple[np.ndarray, int]:
    """Vectorized decode of `count` Rice(p) codes at absolute bit
    `cursor`; returns zigzag-decoded residuals and the new cursor.

    Unpacks a geometrically-grown bit window (clipped to the blob, so
    hostile inputs stay linear in stored bytes); unary terminators are
    the window's set bits, walked by index with
    ``m += 1 + popcount(remainder bits after terminator m)`` — the one
    Python loop, ~2 ops per residual; everything else is numpy."""
    if count == 0:
        return np.zeros(0, np.int64), cursor
    sb = cursor >> 3
    max_bits = (len(data) << 3) - cursor
    guess = min(count * (p + 3) + 64, max_bits)
    while True:
        nbytes = min(len(data) - sb, ((guess + (cursor & 7)) >> 3) + 16)
        bits = np.unpackbits(np.frombuffer(data, np.uint8, count=nbytes, offset=sb))
        w = bits[cursor - (sb << 3) :]
        ones = np.flatnonzero(w)
        window_is_whole_blob = (sb + nbytes) == len(data)
        if p:
            limit = len(w) - p
            usable = int(np.searchsorted(ones, limit))
            if usable:
                # R[m] = set bits in the remainder window (o_m, o_m+p]
                o = ones[:usable]
                if len(w) <= (1 << 22):
                    # popcount prefix over the window: fastest, and the
                    # int32 array is capped at 16 MiB by the branch
                    cs = np.concatenate(
                        ([0], np.cumsum(w[: limit + p], dtype=np.int32)))
                    R = (cs[o + 1 + p] - cs[o + 1]).tolist()
                else:
                    # huge (hostile-grown) window: O(ones) memory —
                    # ones are few exactly when the window had to grow,
                    # so a sparse blob can't force a window-sized
                    # allocation here
                    R = (np.searchsorted(ones, o + p, side="right")
                         - np.arange(1, usable + 1)).tolist()
                # the sequential ones-index chain: R has exactly
                # `usable` entries, so walking past the window surfaces
                # as IndexError (never a wrong decode) and grows it
                ms: list[int] = [0] * count
                m = 0
                ok = True
                try:
                    for k in range(count - 1):
                        ms[k] = m
                        m += 1 + R[m]
                except IndexError:
                    ok = False
                if ok and m < usable:
                    ms[count - 1] = m
                    t = ones[np.asarray(ms, np.int64)]
                    prev = np.empty_like(t)
                    prev[0] = 0
                    prev[1:] = t[:-1] + 1 + p
                    q = t - prev
                    idx = t[:, None] + 1 + np.arange(p, dtype=np.int64)
                    r = w[idx].astype(np.int64) @ (
                        np.int64(1) << np.arange(p - 1, -1, -1, dtype=np.int64))
                    v = (q << p) | r
                    return (v >> 1) ^ -(v & 1), cursor + int(t[-1]) + 1 + p
        else:
            if len(ones) >= count:
                t = ones[:count]
                prev = np.empty_like(t)
                prev[0] = 0
                prev[1:] = t[:-1] + 1
                q = t - prev
                return (q >> 1) ^ -(q & 1), cursor + int(t[-1]) + 1
        if window_is_whole_blob:
            raise ValueError("corrupt FLAC: truncated unary code")
        guess = min(guess * 4, max_bits)


def _read_residual(br: _Bits, blocksize: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError("corrupt FLAC: reserved residual coding method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    po = br.read(4)
    n_parts = 1 << po
    # partitions must divide the block, and the first partition (which
    # is short by ``order`` warmup samples) must not go negative
    if blocksize % n_parts or blocksize // n_parts < order:
        raise ValueError("corrupt FLAC: bad partition order")
    data = br.data
    chunks: list[np.ndarray] = []
    for pi in range(n_parts):
        count = blocksize // n_parts - (order if pi == 0 else 0)
        param = br.read(plen)
        if param == escape:
            width = br.read(5)
            cursor = (br.pos << 3) + br.bit
            vals, cursor = _read_fixed_width(data, cursor, count, width)
        else:
            cursor = (br.pos << 3) + br.bit
            vals, cursor = _read_rice_partition(data, cursor, count, param)
        br.pos, br.bit = cursor >> 3, cursor & 7
        chunks.append(vals)
    return chunks[0] if len(chunks) == 1 else np.concatenate(chunks)


def _invert_fixed(warm: list[int], resid: np.ndarray, order: int) -> np.ndarray:
    """Reconstruct from FIXED-predictor residuals: the order-k fixed
    predictor is exactly the k-th binomial difference, so inversion is
    k successive cumulative sums seeded from the warmup diffs.

    Hostile frames can carry escape-coded residuals near 2^31 whose
    nested cumsums exceed int64 (real streams never do: intermediate
    Δ^j values reconstruct genuine samples); the magnitude bound below
    routes those to an exact arbitrary-precision scalar fold so the
    wraparound can't silently change decoded values."""
    if order == 0:
        return resid.astype(np.int64)
    m = int(np.abs(resid).max()) if resid.size else 0
    mw = max((abs(v) for v in warm), default=0)
    n = resid.size + order
    # loose bound: |j-th cumsum| <= max|input| * n^j
    if (max(m, mw, 1).bit_length() + order * max(n, 2).bit_length()) >= 62:
        out = list(warm)
        coefs = _FIXED_COEFS[order]
        for e in resid.tolist():
            pred = sum(c * out[-1 - j] for j, c in enumerate(coefs))
            out.append(pred + e)
        if any(not -(1 << 62) <= v < (1 << 62) for v in out):
            raise ValueError("corrupt FLAC: reconstructed sample overflow")
        return np.asarray(out, np.int64)
    s = resid.astype(np.int64)
    wa = np.asarray(warm, np.int64)
    for j in range(order - 1, -1, -1):
        d0 = int(np.diff(wa, n=j)[0])  # Δ^j x at position j
        s = np.concatenate(([d0], d0 + np.cumsum(s)))
    return s


def _read_subframe(br: _Bits, blocksize: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("corrupt FLAC: subframe padding bit set")
    sf_type = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.unary() + 1
        bps -= wasted
        if bps <= 0:
            raise ValueError("corrupt FLAC: wasted bits exceed sample size")
    if sf_type == 0:  # CONSTANT
        out = np.full(blocksize, br.read_signed(bps), np.int64)
    elif sf_type == 1:  # VERBATIM
        cursor = (br.pos << 3) + br.bit
        out, cursor = _read_fixed_width(br.data, cursor, blocksize, bps)
        br.pos, br.bit = cursor >> 3, cursor & 7
    elif 8 <= sf_type <= 12:  # FIXED order 0-4
        order = sf_type & 0x07
        warm = [br.read_signed(bps) for _ in range(order)]
        resid = _read_residual(br, blocksize, order)
        out = _invert_fixed(warm, resid, order)
    elif sf_type >= 32:  # LPC, order 1..32
        order = (sf_type & 0x1F) + 1
        warm = [br.read_signed(bps) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("corrupt FLAC: invalid LPC precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("corrupt FLAC: negative LPC shift")
        coefs = [br.read_signed(precision) for _ in range(order)]
        resid = _read_residual(br, blocksize, order)
        # the per-step ``>> shift`` truncation feeds back into the
        # recurrence, so exact LPC is genuinely sequential — scalar
        # Python ints here (arbitrary precision, arithmetic shift)
        out_l = list(warm)
        for e in resid.tolist():
            acc = sum(c * out_l[-1 - j] for j, c in enumerate(coefs))
            out_l.append((acc >> shift) + e)
        out = np.asarray(out_l, np.int64)
    else:
        raise ValueError(f"corrupt FLAC: reserved subframe type {sf_type}")
    if wasted:
        out = out << wasted
    return out


def decode_flac(b: bytes) -> tuple[np.ndarray, int]:
    """Decode a FLAC blob to ((n_samples, n_channels) int32, rate)."""
    try:
        return _decode_flac(bytes(b))
    except (KeyError, IndexError, struct.error) as e:
        raise ValueError(f"corrupt FLAC: {type(e).__name__}") from e


def _decode_flac(b: bytes) -> tuple[np.ndarray, int]:
    if b[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    i = 4
    info = None
    while i + 4 <= len(b):
        hdr = b[i]
        last, btype = hdr & 0x80, hdr & 0x7F
        length = int.from_bytes(b[i + 1 : i + 4], "big")
        body = b[i + 4 : i + 4 + length]
        if btype == 0:  # STREAMINFO
            if length < 34:
                raise ValueError("corrupt FLAC: short STREAMINFO")
            br = _Bits(body)
            br.read(16)  # min block
            br.read(16)  # max block
            br.read(24)  # min frame
            br.read(24)  # max frame
            rate = br.read(20)
            nch = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            info = {"rate": rate, "nch": nch, "bps": bps, "total": total}
        elif btype == 127:
            raise ValueError("corrupt FLAC: invalid metadata block type")
        i += 4 + length
        if last:
            break
    if info is None:
        raise ValueError("corrupt FLAC: no STREAMINFO")
    if info["rate"] == 0 or info["nch"] < 1:
        raise ValueError("corrupt FLAC: bad STREAMINFO")
    est = max(info["total"], 1) * info["nch"] * 4
    if est > _MAX_DECODED_BYTES:
        raise ValueError(
            f"FLAC declares {info['total']} samples x {info['nch']} ch, "
            f"beyond the {_MAX_DECODED_BYTES >> 20} MiB decode cap"
        )

    frames: list[np.ndarray] = []  # (nch, blocksize) per frame
    n_out = 0
    budget = _MAX_DECODED_BYTES // (4 * info["nch"])
    while i < len(b) - 1:
        frame_start = i
        br = _Bits(b, i)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError("corrupt FLAC: lost frame sync")
        if br.read(1):
            raise ValueError("corrupt FLAC: reserved frame bit")
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise ValueError("corrupt FLAC: reserved frame bit")
        _read_utf8_number(br)
        if bs_code == 0:
            raise ValueError("corrupt FLAC: reserved block size code")
        elif bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = _BLOCKSIZE[bs_code]
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code == 15:
            raise ValueError("corrupt FLAC: invalid sample rate code")
        bps = info["bps"] if ss_code == 0 else _SAMPLE_SIZE.get(ss_code)
        if bps is None:
            raise ValueError("corrupt FLAC: reserved sample size code")
        br.align()
        header_crc = b[br.pos]
        if _crc8(b[frame_start : br.pos]) != header_crc:
            raise ValueError("corrupt FLAC: frame header CRC mismatch")
        br.pos += 1

        if ch_code <= 7:
            nch, mode = ch_code + 1, "independent"
        elif ch_code == 8:
            nch, mode = 2, "left_side"
        elif ch_code == 9:
            nch, mode = 2, "right_side"
        elif ch_code == 10:
            nch, mode = 2, "mid_side"
        else:
            raise ValueError("corrupt FLAC: reserved channel assignment")
        if nch != info["nch"]:
            raise ValueError("corrupt FLAC: frame/STREAMINFO channel mismatch")
        subs = []
        for c in range(nch):
            side = (
                mode in ("left_side", "mid_side") and c == 1
            ) or (mode == "right_side" and c == 0)
            subs.append(_read_subframe(br, blocksize, bps + (1 if side else 0)))
        br.align()
        crc = struct.unpack_from(">H", b, br.pos)[0]
        if _crc16(b[frame_start : br.pos]) != crc:
            raise ValueError("corrupt FLAC: frame CRC mismatch")
        br.pos += 2
        i = br.pos

        if mode == "left_side":
            left, side = subs
            subs = [left, left - side]
        elif mode == "right_side":
            side, right = subs
            subs = [right + side, right]
        elif mode == "mid_side":
            mid, side = subs
            t = (mid << 1) | (side & 1)
            subs = [(t + side) >> 1, (t - side) >> 1]
        frames.append(np.stack(subs))
        n_out += blocksize
        if n_out > budget:
            raise ValueError("FLAC frames exceed the decode cap")
    if not frames:
        out = np.zeros((0, info["nch"]), np.int32)
    else:
        out = np.concatenate(frames, axis=1).T.astype(np.int32)
    if info["total"]:
        out = out[: info["total"]]
    return out, info["rate"]


# ---------------------------------------------------------------------------
# encoder (test fixture)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        v &= (1 << n) - 1 if n else 0
        self.acc = (self.acc << n) | v
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
            self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)


def _write_rice(bw: _BitWriter, resid: list[int], param: int) -> None:
    for e in resid:
        v = ((-e) << 1) - 1 if e < 0 else (e << 1)  # zigzag
        bw.write_unary(v >> param)
        if param:
            bw.write(v & ((1 << param) - 1), param)


def _best_rice_param(resid: list[int]) -> int:
    if not resid:
        return 0
    mean = sum((abs(e) << 1) for e in resid) / len(resid) + 1
    p = 0
    while (1 << (p + 1)) < mean and p < 14:
        p += 1
    return p


def encode_flac(
    samples: np.ndarray,
    rate: int = 8000,
    bps: int = 16,
    block_size: int = 4096,
    force_type: str | None = None,
    lpc: tuple[list[int], int, int] | None = None,
    stereo_mode: str = "independent",
) -> bytes:
    """Fixed-blocksize FLAC encoder (test fixture): CONSTANT for flat
    blocks, else FIXED order 0-2 with Rice residuals — or ``force_type``
    in {"verbatim", "fixed0".."fixed4"} / ``lpc=(coefs, precision,
    shift)`` to pin specific decode paths.  ``stereo_mode`` selects the
    decorrelation (independent / left_side / right_side / mid_side; the
    side channel carries bps+1 bits per the spec).  Correct
    CRC-8/CRC-16 throughout."""
    x = np.asarray(samples)
    if x.ndim == 1:
        x = x[:, None]
    n, nch = x.shape
    out = bytearray(b"fLaC")
    info = _BitWriter()
    info.write(block_size, 16)
    info.write(block_size, 16)
    info.write(0, 24)
    info.write(0, 24)
    info.write(rate, 20)
    info.write(nch - 1, 3)
    info.write(bps - 1, 5)
    info.write(n, 36)
    info.out += bytes(16)  # md5 unset (all zero = unknown, per spec)
    body = bytes(info.out)
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    frame_no = 0
    for off in range(0, n, block_size):
        blk = x[off : off + block_size]
        bs = len(blk)
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocksize strategy
        bw.write(7, 4)  # blocksize: 16-bit field
        bw.write(0, 4)  # sample rate: from STREAMINFO
        ch_code = {
            "independent": nch - 1, "left_side": 8,
            "right_side": 9, "mid_side": 10,
        }[stereo_mode]
        bw.write(ch_code, 4)
        bw.write(0, 3)  # sample size: from STREAMINFO
        bw.write(0, 1)
        if frame_no < 0x80:
            bw.write(frame_no, 8)
        else:
            bw.write(0xC0 | (frame_no >> 6), 8)
            bw.write(0x80 | (frame_no & 0x3F), 8)
        bw.write(bs - 1, 16)
        bw.align()
        hdr = bytes(bw.out)
        hdr += bytes([_crc8(hdr)])
        if stereo_mode == "independent":
            sub_chs = [([int(v) for v in blk[:, c]], bps) for c in range(nch)]
        else:
            l = [int(v) for v in blk[:, 0]]
            r = [int(v) for v in blk[:, 1]]
            side = [a - b2 for a, b2 in zip(l, r)]
            if stereo_mode == "left_side":
                sub_chs = [(l, bps), (side, bps + 1)]
            elif stereo_mode == "right_side":
                sub_chs = [(side, bps + 1), (r, bps)]
            else:  # mid_side
                mid = [(a + b2) >> 1 for a, b2 in zip(l, r)]
                sub_chs = [(mid, bps), (side, bps + 1)]
        fw = _BitWriter()
        for ch, ch_bps in sub_chs:
            fw.write(0, 1)
            if lpc is not None:
                coefs, precision, shift = lpc
                order = len(coefs)
                fw.write(32 | (order - 1), 6)
                fw.write(0, 1)
                for v in ch[:order]:
                    fw.write(v, ch_bps)
                fw.write(precision - 1, 4)
                fw.write(shift, 5)
                for cf in coefs:
                    fw.write(cf, precision)
                resid = [
                    ch[i]
                    - (sum(cf * ch[i - 1 - j] for j, cf in enumerate(coefs)) >> shift)
                    for i in range(order, bs)
                ]
                _write_fixed_residual(fw, resid)
            elif force_type == "verbatim":
                fw.write(1, 6)
                fw.write(0, 1)
                for v in ch:
                    fw.write(v, ch_bps)
            elif force_type and force_type.startswith("fixed"):
                order = int(force_type[5])
                _write_fixed_subframe(fw, ch, order, ch_bps, bs)
            elif len(set(ch)) == 1:
                fw.write(0, 6)
                fw.write(0, 1)
                fw.write(ch[0], ch_bps)
            else:
                order = min(2, bs - 1)
                _write_fixed_subframe(fw, ch, order, ch_bps, bs)
        fw.align()
        frame = hdr + bytes(fw.out)
        frame += struct.pack(">H", _crc16(frame))
        out += frame
        frame_no += 1
    return bytes(out)


def _fixed_residual(ch: list[int], order: int) -> list[int]:
    coefs = _FIXED_COEFS[order]
    return [
        ch[i] - sum(c * ch[i - 1 - j] for j, c in enumerate(coefs))
        for i in range(order, len(ch))
    ]


def _write_fixed_residual(fw: _BitWriter, resid: list[int]) -> None:
    fw.write(0, 2)  # 4-bit rice params
    fw.write(0, 4)  # partition order 0
    param = _best_rice_param(resid)
    fw.write(param, 4)
    _write_rice(fw, resid, param)


def _write_fixed_subframe(
    fw: _BitWriter, ch: list[int], order: int, bps: int, bs: int
) -> None:
    fw.write(8 | order, 6)
    fw.write(0, 1)
    for v in ch[:order]:
        fw.write(v, bps)
    _write_fixed_residual(fw, _fixed_residual(ch, order))
