"""Lossy VP8 (WebP key-frame) decoder pins.

Validation is cross-implementation by construction: RFC 6386 normatively
describes the reference decoder, so every pin demands BYTE equality
against libwebp — pre-loop-filter YUV (bypass_filtering), post-filter
YUV, and composed RGB (fancy upsampling) — across image contents,
qualities, and non-MB-aligned sizes.  An embedded externally-encoded
fixture (CPython's test asset python.webp, a 16x16 lossy VP8X+ALPH
file produced by an independent encoder) keeps one external pin alive
when libwebp is absent.

Regression note: the kf_bmode probability table is indexed by neighbor
sub-modes in the RFC enum order (LD=4, RD=5, VR=6); libwebp's binary
keeps the same vectors under its permuted enum (RD=4, VR=5, LD=6).  A
table cross-checked against the binary but indexed with RFC modes
decodes flat images fine and desyncs on the first B_PRED neighbor
context ≥ 4 — test_bmode_context_above_left_permutation pins it.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from streamsum_spark.operators import vp8, webp

from libwebp_oracle import HAVE_LIBWEBP

if HAVE_LIBWEBP:
    import libwebp_oracle as lo

needs_libwebp = pytest.mark.skipif(
    not HAVE_LIBWEBP, reason="system libwebp not available")

# CPython test asset python.webp (Lib/test/test_email/data, PSF
# license): 16x16 lossy VP8 key frame in a VP8X container with an ALPH
# chunk — encoded by an independent toolchain, not this container's
# libwebp build.
_EXTERNAL_WEBP = bytes.fromhex(
    "52494646a801000057454250565038580a000000100000000f00000f0000414c5048c300"
    "00000127a2a89124e57ae7185fe7df2a998898ff74718de02630e2e18b7732c8c1115c83"
    "2b30e8b078158e785135c1080c024f92a06ab055191cd6b66d462f4ec6763cb6ed77fbaf"
    "29ae21a2ff49d1fd8f90f7ba4449241b3a259134f3146d0ec7d3e51620f40b14be90e183"
    "b71a329e36827f1d297e4e7608fb889eb391ef997346e83282dbf8cc48b2f745307d20fd"
    "36178c2132562da5d66b23bc5de3a55915d59c81a4d96e96758a18310f8aaa2c5034fa30"
    "82dfba6b505229b52dcfe954140a0100000056503820be0000009002009d012a10001000"
    "03003425b00274304f08850c7c031d082cfde800fefd74a0fd029b1f8af7437c9c37f6d2"
    "0cafd3ff3568e2eea7bdc96f1bf4aac563aeba9f9784df41a23bda5be4eff8cbf1bd7fe1"
    "affa3fe509ecf4bb665fffaa29d97fc96ce786e6ac97b9e4c6f493238c5fdd8f3955207f"
    "954ffc39f8ff6fd26b03e89fbc8398666db1d513ff7617e6b1fe5d8ae49f47bfb3fabffe"
    "1d1df3128ffe5ccfc1faf918c3bdcfcf1f9139a001fd9a014b312cdebcd97baaac000000"
)
# sha256 of libwebp's WebPDecodeRGB output for the asset (16x16x3)
_EXTERNAL_RGB_SHA256 = (
    "de1a3cfed46fb46b8269ff0ff1cbe28269a634ea53322c197813583d6b677a53")


def _payload(blob: bytes) -> bytes:
    i = 12
    while i + 8 <= len(blob):
        tag = blob[i:i + 4]
        (n,) = struct.unpack("<I", blob[i + 4:i + 8])
        if tag == b"VP8 ":
            return blob[i + 8:i + 8 + n]
        i += 8 + n + (n & 1)
    raise AssertionError("no VP8 chunk")


def _smooth(h, w):
    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    return np.stack([
        (gx * 2 + gy).clip(0, 255), (gx + gy * 2).clip(0, 255),
        (gx * 3).clip(0, 255)], -1).astype(np.uint8)


def _images():
    rng = np.random.default_rng(7)
    yield "smooth", _smooth(48, 64)
    yield "noise", rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    yield "mixed", (_smooth(72, 88) // 2
                    + rng.integers(0, 128, (72, 88, 3), dtype=np.uint8) // 2)
    yield "flat", np.full((48, 64, 3), 77, np.uint8)


# ---- embedded external pin (runs with or without libwebp) ------------

def test_external_fixture_decodes_byte_exact():
    out = webp.decode_webp(_EXTERNAL_WEBP)
    assert out.shape == (16, 16, 3)
    assert hashlib.sha256(out.tobytes()).hexdigest() == _EXTERNAL_RGB_SHA256


@needs_libwebp
def test_external_fixture_matches_live_libwebp():
    assert np.array_equal(
        webp.decode_webp(_EXTERNAL_WEBP), lo.decode_rgb(_EXTERNAL_WEBP))


# ---- byte-exact sweeps vs libwebp ------------------------------------

@needs_libwebp
@pytest.mark.parametrize("name,img", list(_images()))
@pytest.mark.parametrize("q", [10, 50, 75, 95])
def test_yuv_byte_exact_with_and_without_filter(name, img, q):
    blob = lo.encode_rgb(np.ascontiguousarray(img), q)
    payload = _payload(blob)
    for bypass in (True, False):
        gy, gu, gv = lo.decode_yuv(blob, bypass_filtering=bypass)
        my, mu, mv = vp8.decode_vp8(payload, apply_loop_filter=not bypass)
        assert np.array_equal(my, gy), (name, q, bypass, "Y")
        assert np.array_equal(mu, gu), (name, q, bypass, "U")
        assert np.array_equal(mv, gv), (name, q, bypass, "V")


@needs_libwebp
@pytest.mark.parametrize("hw", [(33, 49), (16, 16), (7, 5), (1, 1),
                                (64, 47), (80, 112)])
def test_odd_sizes_rgb_byte_exact(hw):
    """Non-MB-aligned dimensions: padded decode + crop + fancy chroma
    upsampling must still match WebPDecodeRGB exactly."""
    h, w = hw
    img = _smooth(h, w)
    for q in (50, 90):
        blob = lo.encode_rgb(np.ascontiguousarray(img), q)
        assert np.array_equal(webp.decode_webp(blob), lo.decode_rgb(blob))


@needs_libwebp
def test_segmentation_and_many_coeff_updates():
    """High-entropy content at low quality exercises segment maps and
    dozens of coefficient-probability updates in the header."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (96, 128, 3), dtype=np.uint8)
    for q in (5, 30, 80):
        blob = lo.encode_rgb(np.ascontiguousarray(img), q)
        assert np.array_equal(webp.decode_webp(blob), lo.decode_rgb(blob))


@needs_libwebp
def test_bmode_context_above_left_permutation():
    """The smallest reproducer of the kf_bmode enum-order bug: a smooth
    gradient at q75 whose row-1 macroblocks are B_PRED with left
    neighbor sub-modes ≥ 4 (LD/RD/VR).  A libwebp-enum-ordered table
    decodes row 0 perfectly and desyncs at MB(1,0) subblock (0,1)."""
    img = _smooth(48, 64)
    blob = lo.encode_rgb(np.ascontiguousarray(img), 75)
    gy, _, _ = lo.decode_yuv(blob, bypass_filtering=True)
    my, _, _ = vp8.decode_vp8(_payload(blob), apply_loop_filter=False)
    assert np.array_equal(my[16:32], gy[16:32])


# ---- hostile inputs --------------------------------------------------

def test_truncated_and_malformed_refuse():
    with pytest.raises(ValueError, match="truncated"):
        vp8.decode_vp8(b"\x00\x00\x00")
    # interframe bit set
    with pytest.raises(ValueError, match="interframe"):
        vp8.decode_vp8(b"\x01\x00\x00\x9d\x01\x2a\x10\x00\x10\x00" + b"\x00" * 8)
    # bad start code
    with pytest.raises(ValueError, match="start code"):
        vp8.decode_vp8(b"\x00\x00\x00\xff\xff\xff\x10\x00\x10\x00" + b"\x00" * 8)
    # oversized dimensions
    big = struct.pack("<HH", 0x3FFF, 0x3FFF)
    with pytest.raises(ValueError, match="bounds"):
        vp8.decode_vp8(b"\x00\x00\x00\x9d\x01\x2a" + big + b"\x00" * 8)
    # first partition overruns the frame
    tag = (1000 << 5)
    hdr = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    with pytest.raises(ValueError, match="overruns"):
        vp8.decode_vp8(hdr + b"\x9d\x01\x2a\x10\x00\x10\x00" + b"\x00" * 8)


def test_mutation_fuzz_never_escapes_valueerror():
    """Single-byte corruptions of a real lossy stream either decode to
    a bounded image or raise ValueError — extract_features' fallback
    contract.  The boolean decoder reads zeros past end-of-buffer, so
    truncation degrades to garbage pixels, never an unbounded loop."""
    rs = np.random.RandomState(13)
    base = bytearray(_EXTERNAL_WEBP)
    for _ in range(500):
        mut = bytearray(base)
        i = int(rs.randint(12, len(mut)))
        mut[i] ^= 1 << int(rs.randint(8))
        try:
            out = webp.decode_webp(bytes(mut))
            assert out.dtype == np.uint8 and out.ndim == 3
            assert out.size <= 3 * vp8._MAX_PIXELS
        except (ValueError, NotImplementedError):
            pass


def test_truncated_payload_decodes_bounded():
    """Cutting the token partition mid-stream still yields a full-size
    image (zeros read past EOF), not an exception or hang."""
    payload = _payload(_EXTERNAL_WEBP)
    for cut in (len(payload) - 10, len(payload) // 2):
        out = vp8.decode_vp8(payload[:cut])
        assert out[0].shape == (16, 16)
    # cutting into the first partition breaks a structural check
    with pytest.raises(ValueError, match="overruns"):
        vp8.decode_vp8(payload[:12])


# ---- pipeline integration --------------------------------------------

def test_lossy_webp_through_extract_features(spark):
    """A lossy VP8 blob decodes on the default Arrow pipeline with real
    pixel dimensions; a truncated blob falls back without failing."""
    from streamsum_spark.operators import multimodal as mm

    rows = [
        (1, "image/webp", 16, 16, None, _EXTERNAL_WEBP),
        (2, "image/webp", 16, 16, None, _EXTERNAL_WEBP[:100]),  # truncated
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {r.media_id: r for r in mm.extract_features(df).collect()}
    assert out[1].decoded and out[1].width == 16 and out[1].height == 16
    assert not out[2].decoded
