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

Hostile-input posture matches the other decoders: the sample budget is
capped before allocation (``_MAX_DECODED_BYTES``), every bit-read is
bounds-checked, and the Rice unary walk cannot spin past the frame's
real bytes — work is linear in the stored blob.  Malformed structure
surfaces as ValueError.

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


def _crc8(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _Bits:
    """MSB-first bit reader with byte-position tracking (CRC windows)."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            if self.pos >= len(self.data):
                raise ValueError("corrupt FLAC: truncated bitstream")
            v = (v << 1) | ((self.data[self.pos] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def unary(self) -> int:
        n = 0
        while True:
            if self.pos >= len(self.data):
                raise ValueError("corrupt FLAC: truncated unary code")
            if (self.data[self.pos] >> (7 - self.bit)) & 1:
                self.bit += 1
                if self.bit == 8:
                    self.bit = 0
                    self.pos += 1
                return n
            n += 1
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1

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


def _read_residual(br: _Bits, blocksize: int, order: int) -> list[int]:
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
    out: list[int] = []
    for p in range(n_parts):
        count = blocksize // n_parts - (order if p == 0 else 0)
        if count < 0:
            raise ValueError("corrupt FLAC: bad partition order")
        param = br.read(plen)
        if param == escape:
            width = br.read(5)
            for _ in range(count):
                out.append(br.read_signed(width) if width else 0)
        else:
            for _ in range(count):
                q = br.unary()
                r = br.read(param) if param else 0
                v = (q << param) | r
                out.append((v >> 1) ^ -(v & 1))
    return out


def _read_subframe(br: _Bits, blocksize: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("corrupt FLAC: subframe padding bit set")
    sf_type = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.unary() + 1
        bps -= wasted
    if sf_type == 0:  # CONSTANT
        v = br.read_signed(bps)
        out = [v] * blocksize
    elif sf_type == 1:  # VERBATIM
        out = [br.read_signed(bps) for _ in range(blocksize)]
    elif 8 <= sf_type <= 12:  # FIXED order 0-4
        order = sf_type & 0x07
        warm = [br.read_signed(bps) for _ in range(order)]
        resid = _read_residual(br, blocksize, order)
        out = list(warm)
        coefs = _FIXED_COEFS[order]
        for i, e in enumerate(resid):
            pred = sum(c * out[order + i - 1 - j] for j, c in enumerate(coefs))
            out.append(pred + e)
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
        out = list(warm)
        for i, e in enumerate(resid):
            acc = sum(c * out[order + i - 1 - j] for j, c in enumerate(coefs))
            out.append((acc >> shift) + e)
    else:
        raise ValueError(f"corrupt FLAC: reserved subframe type {sf_type}")
    if wasted:
        out = [v << wasted for v in out]
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

    channels: list[list[int]] = [[] for _ in range(info["nch"])]
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
            left = subs[0]
            subs = [left, [l - s for l, s in zip(left, subs[1])]]
        elif mode == "right_side":
            right = subs[1]
            subs = [[r + s for s, r in zip(subs[0], right)], right]
        elif mode == "mid_side":
            mids, sides = subs
            lr = [
                (((m << 1) | (s & 1)) + s >> 1, (((m << 1) | (s & 1)) - s) >> 1)
                for m, s in zip(mids, sides)
            ]
            subs = [[x for x, _ in lr], [y for _, y in lr]]
        for c in range(info["nch"]):
            channels[c].extend(subs[c])
        if len(channels[0]) > budget:
            raise ValueError("FLAC frames exceed the decode cap")
    out = np.array(channels, dtype=np.int64).T.astype(np.int32)
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
