"""Native (ctypes) fast-path routing pins: fast path == spec path on
every blob, spec fallback when the library is absent or the native
decode refuses, and a LOUD RuntimeError (never silent wrong pixels, and
never the fingerprint fallback) on a sampled cross-check mismatch."""

from __future__ import annotations

import numpy as np
import pytest

from streamsum_spark.operators import multimodal as mm
from streamsum_spark.operators import native_codecs as nc
from streamsum_spark.operators.webp import decode_webp


def _webp_blobs() -> list[bytes]:
    from streamsum_spark.operators.vp8_encode import encode_webp_lossy
    from streamsum_spark.operators.webp import encode_webp_lossless

    blobs = []
    for i in range(6):
        w, h = 24 + 3 * i, 16 + 2 * i
        yy, xx = np.mgrid[0:h, 0:w]
        px = np.stack(
            [(xx * 5 + i) % 256, (yy * 9 + i) % 256, (xx + yy + i) % 256], axis=2
        ).astype(np.uint8)
        blobs.append(encode_webp_lossless(px))
        blobs.append(encode_webp_lossy(px, quality=85))
    return blobs


@pytest.mark.skipif(not nc.HAVE_LIBWEBP, reason="libwebp not available")
def test_native_webp_equals_spec_on_all_blobs(monkeypatch):
    """Not just the sampled check: EVERY lossless and lossy blob must
    decode byte-identically through libwebp and the spec decoder (WebP
    decode is bit-exact by construction)."""
    monkeypatch.setattr(mm, "NATIVE_DECODE", True)
    monkeypatch.setitem(mm.NATIVE_VERIFY_PCT, "WebP", 0)
    for b in _webp_blobs():
        assert np.array_equal(mm.decode_image(b), decode_webp(b))


def test_spec_fallback_when_library_absent(monkeypatch):
    """With the library flagged absent, decode_image must produce the
    spec decoder's result — the fast path is an optimization, never a
    dependency."""
    monkeypatch.setattr(nc, "HAVE_LIBWEBP", False)
    b = _webp_blobs()[0]
    assert np.array_equal(mm.decode_image(b), decode_webp(b))


@pytest.mark.skipif(not nc.HAVE_LIBWEBP, reason="libwebp not available")
def test_native_refusal_falls_back_to_spec(monkeypatch):
    """A native ValueError routes the blob to the spec decoder, which
    owns the malformed-input contract (so hostile-blob behavior is
    identical with and without the library)."""
    def refuse(b):
        raise ValueError("injected native refusal")

    monkeypatch.setattr(nc, "decode_webp_rgb", refuse)
    b = _webp_blobs()[1]
    assert np.array_equal(mm.decode_image(b), decode_webp(b))


@pytest.mark.skipif(not nc.HAVE_LIBWEBP, reason="libwebp not available")
def test_cross_check_mismatch_raises_runtime_error(monkeypatch):
    """A sampled mismatch means a codec BUG: it must raise RuntimeError
    — which extract_features' (ValueError, NotImplementedError,
    struct.error) fallback deliberately does NOT catch — rather than
    flow wrong pixels or a silent fingerprint row downstream."""
    b = _webp_blobs()[0]
    wrong = decode_webp(b).copy()
    wrong[0, 0, 0] ^= 0xFF
    monkeypatch.setattr(nc, "decode_webp_rgb", lambda _: wrong)
    monkeypatch.setitem(mm.NATIVE_VERIFY_PCT, "WebP", 100)
    with pytest.raises(RuntimeError, match="mismatch"):
        mm.decode_image(b)


@pytest.mark.skipif(not nc.HAVE_LIBWEBP, reason="libwebp not available")
def test_sampling_is_deterministic_by_content(monkeypatch):
    """The verify sample is a pure function of blob bytes (crc32 % 10000),
    so re-decodes of the same corpus check the same blobs — reruns are
    reproducible and a mismatch cannot hide behind sampling luck."""
    import zlib

    blobs = _webp_blobs()
    picked = [b for b in blobs if zlib.crc32(b) % 10000 < 5000]
    assert picked and len(picked) < len(blobs)
    calls = []
    real = decode_webp

    def spy(b):
        calls.append(b)
        return real(b)

    monkeypatch.setitem(mm.NATIVE_VERIFY_PCT, "WebP", 50)
    import streamsum_spark.operators.multimodal as mmod

    monkeypatch.setattr(
        "streamsum_spark.operators.webp.decode_webp", spy
    )
    for b in blobs:
        mmod.decode_image(b)
    assert calls == picked


def test_verify_budget_floor_and_determinism():
    """r10 verdict order #1 pins: every production sample pct respects
    the 0.2% floor (still millions of verified blobs at corpus scale),
    every natively-routed format has an explicit budget, and the sample
    predicate is a pure function of blob bytes at 0.01% granularity —
    the SAME blobs verify on every re-decode of a corpus."""
    import zlib

    assert set(mm.NATIVE_VERIFY_PCT) >= {"PNG", "JPEG", "TIFF", "WebP"}
    for fmt, pct in mm.NATIVE_VERIFY_PCT.items():
        assert pct >= mm.NATIVE_VERIFY_FLOOR_PCT, (fmt, pct)
    # determinism + granularity: membership is exactly crc32 % 10000
    # against pct * 100, for every format including sub-1% budgets
    for i in range(200):
        b = b"blob-%d" % i
        for fmt, pct in mm.NATIVE_VERIFY_PCT.items():
            expect = zlib.crc32(b) % 10000 < round(pct * 100)
            assert mm._verify_hit(b, fmt) == expect
            assert mm._verify_hit(b, fmt) == mm._verify_hit(bytes(b), fmt)
    # unlisted formats fall back to the conservative flat default
    assert mm._verify_hit(b"x" * 3, "NOPE") == (
        zlib.crc32(b"x" * 3) % 10000 < 500
    )


def test_verify_budget_bounds_expected_cost():
    """The budget's design property, pinned against the r10 measured
    spec/native throughput ratios: expected verification time
    (pct * native_rate / spec_rate) stays within ~70% of native decode
    time for every routed format — the flat 5% it replaced paid ~100%
    for PNG and ~1700% for VP8."""
    r10 = {  # native_mb_s / spec_mb_s per BENCH_r10 codec_throughput
        "PNG": 26.2 / 1.3,
        "JPEG": 13.4 / 0.30,
        "TIFF": 30.0 / 53.0,  # spec LZW beats the sidecar
        "WebP": 17.4 / 0.0502,
    }
    for fmt, ratio in r10.items():
        frac = mm.NATIVE_VERIFY_PCT[fmt] / 100.0 * ratio
        assert frac <= 0.72, (fmt, frac)
