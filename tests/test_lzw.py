"""Differential pins for the shared vectorized LZW core (_lzw.py)
against straight-from-the-spec scalar reference decoders — the exact
implementations gif.py/tiff.py shipped before vectorization (round 10).
Valid streams come from real table-building compressors (tiff's own
encoder; a spec GIF compressor with configurable Clear cadence, which
also exercises the core's adaptive segment-chunk sizing); hostile
streams from truncation/bit-flip mutations, where both decoders must
agree byte-for-byte or both refuse."""

from __future__ import annotations

import random

import numpy as np

from streamsum_spark.operators import tiff as tf
from streamsum_spark.operators._lzw import lzw_decode_gif, lzw_decode_tiff


def _ref_gif(data, min_code, max_pixels):
    clear, eoi = 1 << min_code, (1 << min_code) + 1

    def reset():
        return {c: (c,) for c in range(1 << min_code)}, min_code + 1, eoi + 1

    table, width, next_code = reset()
    out = []
    acc = nbits = 0
    prev = None
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
                entry = table[code]
            elif code < next_code:
                entry = table[code]
            elif code == next_code:
                entry = prev + (prev[0],)
            else:
                raise ValueError("out of sequence")
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


def _ref_tiff(data, max_out):
    out = bytearray()
    table = [bytes([i]) for i in range(256)] + [b"", b""]
    acc = nbits = 0
    width = 9
    prev = None
    pos = 0
    n = len(data)
    while len(out) < max_out:
        while nbits < width:
            if pos >= n:
                return bytes(out)
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == 257:
            break
        if code == 256:
            table = table[:258]
            width = 9
            prev = None
            continue
        if prev is None:
            if code > 255:
                raise ValueError("non-literal after clear")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4095:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4095:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
    return bytes(out)


def _gif_compress(seq, min_code, clear_every=None):
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    acc = nbits = 0
    out = bytearray()
    emitted = 0
    table: dict = {}
    next_code = width = 0

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def reset():
        nonlocal table, next_code, width
        width = width or min_code + 1
        emit(clear)
        table = {(c,): c for c in range(1 << min_code)}
        next_code, width = eoi + 1, min_code + 1

    reset()
    run = (seq[0],)
    for v in seq[1:]:
        if run + (v,) in table:
            run = run + (v,)
            continue
        emit(table[run])
        emitted += 1
        if next_code < 4096:
            table[run + (v,)] = next_code
            next_code += 1
            # giflib convention: the code that fills the table is still
            # written at the old width
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            reset()
        if clear_every and emitted % clear_every == 0:
            reset()
        run = (v,)
    emit(table[run])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_gif_lzw_matches_scalar_reference_across_streams():
    rng = random.Random(41)
    npr = np.random.RandomState(41)
    for trial in range(12):
        mc = rng.choice([2, 3, 8, 11])
        n = rng.randrange(1, 12000)
        seq = [int(v) for v in npr.randint(0, min(6, 1 << mc), n)]
        enc = _gif_compress(seq, mc, clear_every=rng.choice([None, 1, 254]))
        for mp in (n, n // 3 + 1, 1):
            assert list(lzw_decode_gif(enc, mc, mp)) == _ref_gif(enc, mc, mp)


def test_tiff_lzw_matches_scalar_reference_across_streams():
    rng = random.Random(42)
    npr = np.random.RandomState(42)
    for trial in range(10):
        n = rng.randrange(1, 12000)
        raw = bytes(npr.randint(0, rng.choice([3, 256]), n, dtype=np.uint8))
        enc = tf._lzw_encode(raw)
        for mo in (len(raw), len(raw) // 2 + 1, 1):
            assert lzw_decode_tiff(enc, mo) == _ref_tiff(enc, mo)


def test_lzw_mutation_fuzz_agrees_or_both_refuse():
    rng = random.Random(43)
    npr = np.random.RandomState(43)
    cases = [
        ("gif",
         _gif_compress([int(v) for v in npr.randint(0, 5, 8000)], 8),
         lambda m, mo: _ref_gif(m, 8, mo),
         lambda m, mo: list(lzw_decode_gif(m, 8, mo))),
        ("tiff",
         tf._lzw_encode(bytes(npr.randint(0, 5, 8000, dtype=np.uint8))),
         _ref_tiff,
         lambda m, mo: lzw_decode_tiff(m, mo)),
    ]
    for name, enc, reff, newf in cases:
        for trial in range(120):
            m = bytearray(enc)
            if trial % 3 == 0:
                m = m[: rng.randrange(1, len(m))]
            else:
                for _ in range(rng.randrange(1, 4)):
                    m[rng.randrange(len(m))] ^= 1 << rng.randrange(8)
            m = bytes(m)
            try:
                a = ("ok", list(reff(m, 8000)))
            except (ValueError, KeyError):
                a = ("err",)
            try:
                b = ("ok", list(newf(m, 8000)))
            except ValueError:
                b = ("err",)
            assert a[0] == b[0], (name, trial, a[0], b[0])
            if a[0] == "ok":
                assert a == b, (name, trial)
