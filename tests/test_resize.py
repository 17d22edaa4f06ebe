"""Pins for the antialiased resize kernel and the resize_media
operator: byte-exact vs a per-pixel reference over a shape grid,
analytic invariants (identity, constants, separable kernel weights,
linear-ramp preservation), and the Spark plumbing contract (schema,
per-row error isolation, decode round-trip of the re-encoded PNG)."""

from __future__ import annotations

import numpy as np
import pytest

from streamsum_spark.operators import multimodal as mm
from streamsum_spark.operators.resize import resize_image, resize_media


def _ref_resize(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Per-pixel definition of the kernel (the spec the vectorized
    implementation must match byte-for-byte): triangle filter, support
    max(1, scale), half-pixel centers, border renormalization, taps
    accumulated in ascending order — float64 throughout."""
    a = px.astype(np.float64)
    h, w = a.shape[:2]

    def taps(in_len, out_len, o):
        scale = in_len / out_len
        support = max(1.0, scale)
        center = (o + 0.5) * scale
        left = int(np.floor(center - support + 0.5))
        pairs = []
        for k in range(int(np.ceil(support)) * 2 + 1):
            i = left + k
            if i < 0 or i >= in_len:
                continue
            pairs.append((i, max(0.0, 1.0 - abs((i + 0.5 - center) / support))))
        s = sum(p[1] for p in pairs)
        return [(i, wg / s) for i, wg in pairs]

    tmp = np.zeros((out_h, w, a.shape[2]))
    for o in range(out_h):
        for i, wg in taps(h, out_h, o):
            tmp[o] += wg * a[i]
    out = np.zeros((out_h, out_w, a.shape[2]))
    for o in range(out_w):
        for i, wg in taps(w, out_w, o):
            out[:, o] += wg * tmp[:, i]
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


SHAPES = [
    (24, 32, 12, 16),   # clean 2x down
    (24, 32, 7, 5),     # fractional down
    (10, 10, 30, 21),   # up, mixed ratio
    (17, 13, 17, 13),   # identity
    (5, 5, 1, 1),       # collapse to a pixel
    (3, 7, 9, 2),       # up one axis, down the other
    (64, 48, 224, 224), # the model-input normalization case
    (1, 1, 4, 4),       # single-pixel source
    (1, 33, 33, 1),     # row <-> column
    (100, 77, 31, 129), # large fractional both ways
]


def test_kernel_matches_per_pixel_reference_byte_exact():
    rng = np.random.default_rng(7)
    for h, w, oh, ow in SHAPES:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        got = resize_image(px, ow, oh)
        assert got.shape == (oh, ow, 3)
        assert np.array_equal(got, _ref_resize(px, ow, oh)), (h, w, oh, ow)


def test_identity_and_constant_exact():
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    assert np.array_equal(resize_image(px, 30, 20), px)
    c = np.full((15, 9, 3), 137, np.uint8)
    assert np.array_equal(resize_image(c, 4, 40), np.full((40, 4, 3), 137, np.uint8))
    # constants exact at a deep fractional downscale too (weight rows
    # renormalize to exactly 1)
    assert np.array_equal(resize_image(c, 2, 2), np.full((2, 2, 3), 137, np.uint8))


def test_exact_2x_downscale_is_separable_1331_kernel_interior():
    """At scale 2 the triangle taps are [1, 3, 3, 1]/8 per axis — an
    ANTIALIASING average over 4 input pixels, not bilinear's 2 and not
    a plain box: pin the kernel at every interior output pixel (border
    pixels drop out-of-range taps and renormalize, covered by the
    reference-equality pin) so the semantics can't silently drift."""
    rng = np.random.default_rng(13)
    px = rng.integers(0, 256, (8, 6, 3), dtype=np.uint8)
    a = px.astype(np.float64)
    k = np.array([1.0, 3.0, 3.0, 1.0]) / 8.0
    got = resize_image(px, 3, 4)
    # output pixel (o_r, o_c) uses input rows 2*o_r-1..2*o_r+2, cols
    # 2*o_c-1..2*o_c+2; interior = all taps in range
    for o_r in (1, 2):
        for o_c in (1,):
            v = sum(
                k[t] * k[u] * a[2 * o_r - 1 + t, 2 * o_c - 1 + u]
                for t in range(4)
                for u in range(4)
            )
            want = np.clip(np.rint(v), 0, 255).astype(np.uint8)
            assert np.array_equal(got[o_r, o_c], want), (o_r, o_c)


def test_upscale_preserves_linear_ramp_interior():
    """Triangle kernels reproduce affine signals away from the borders:
    a 2x upscale of a slope-8 ramp is EXACTLY a slope-4 ramp in the
    interior — successive differences all equal 4."""
    ramp = np.tile(
        np.arange(8, 128, 8, dtype=np.uint8)[None, :, None], (4, 1, 3)
    )
    up = resize_image(ramp, 30, 4)
    diffs = np.diff(up[0, 2:28, 0].astype(int))
    assert (diffs == 4).all()


def test_grayscale_2d_input():
    rng = np.random.default_rng(17)
    g = rng.integers(0, 256, (12, 18), dtype=np.uint8)
    got = resize_image(g, 9, 6)
    want = _ref_resize(g[:, :, None], 9, 6)[:, :, 0]
    assert got.shape == (6, 9)
    assert np.array_equal(got, want)


def test_invalid_target_raises():
    px = np.zeros((4, 4, 3), np.uint8)
    with pytest.raises(ValueError):
        resize_image(px, 0, 4)
    with pytest.raises(ValueError):
        resize_image(px, 4, -1)


def test_resize_media_plumbing(spark):  # noqa: F811
    """Spark contract: schema, per-row error isolation, and the output
    PNG decoding byte-exactly back to the kernel's result."""
    rng = np.random.default_rng(23)
    imgs = {
        1: rng.integers(0, 256, (48, 64, 3), dtype=np.uint8),
        2: rng.integers(0, 256, (16, 16, 3), dtype=np.uint8),
    }
    rows = [
        (1, bytearray(mm.encode_png(imgs[1], filter_type=4))),
        (2, bytearray(mm.encode_bmp(imgs[2]))),
        (3, bytearray(b"\xff\xd8garbage-not-a-jpeg")),  # refused -> isolated
        (4, None),
    ]
    media = spark.createDataFrame(rows, "media_id long, content binary").repartition(3)
    out = resize_media(media, out_w=20, out_h=10).collect()
    assert {r.media_id for r in out} == {1, 2, 3, 4}
    by_id = {r.media_id: r for r in out}
    for mid in (1, 2):
        r = by_id[mid]
        assert r.decoded and (r.width, r.height) == (20, 10)
        assert (r.src_width, r.src_height) == (imgs[mid].shape[1], imgs[mid].shape[0])
        got = mm.decode_image(bytes(r.content))
        assert np.array_equal(got, resize_image(imgs[mid], 20, 10))
    for mid in (3, 4):
        r = by_id[mid]
        assert not r.decoded and r.content is None and r.width is None
    with pytest.raises(ValueError):
        resize_media(media, out_w=0)


def test_empty_source_raises():
    with pytest.raises(ValueError):
        resize_image(np.zeros((0, 4, 3), np.uint8), 2, 2)
    with pytest.raises(ValueError):
        resize_image(np.zeros((4, 0, 3), np.uint8), 2, 2)
    with pytest.raises(ValueError):
        resize_image(np.zeros(5, np.uint8), 2, 2)


def test_center_crop():
    from streamsum_spark.operators.resize import center_crop

    rng = np.random.default_rng(29)
    px = rng.integers(0, 256, (10, 8, 3), dtype=np.uint8)
    got = center_crop(px, 4, 6)
    assert np.array_equal(got, px[2:8, 2:6])
    # odd excess floors (torchvision convention)
    assert np.array_equal(center_crop(px, 7, 9), px[0:9, 0:7])
    with pytest.raises(ValueError):
        center_crop(px, 9, 4)
    with pytest.raises(ValueError):
        center_crop(px, 0, 4)


def test_patchify_roundtrip():
    from streamsum_spark.operators.resize import patchify

    rng = np.random.default_rng(31)
    px = rng.integers(0, 256, (8, 12, 3), dtype=np.uint8)
    p = patchify(px, 4)
    assert p.shape == (6, 4, 4, 3)
    # patch (r, c) is the original block, row-major
    assert np.array_equal(p[0], px[0:4, 0:4])
    assert np.array_equal(p[2], px[0:4, 8:12])
    assert np.array_equal(p[3], px[4:8, 0:4])
    # reassembly is lossless
    back = (
        p.reshape(2, 3, 4, 4, 3).transpose(0, 2, 1, 3, 4).reshape(8, 12, 3)
    )
    assert np.array_equal(back, px)
    with pytest.raises(ValueError):
        patchify(px, 5)
    with pytest.raises(ValueError):
        patchify(px, 0)
