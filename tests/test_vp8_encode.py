"""VP8 fixture-encoder pins.

The encoder's job is coverage: libwebp's own encoder always produces
one token partition, the normal loop filter, and no segmentation, so
the decoder paths for multiple partitions, the simple filter,
per-segment quantizers, and segment maps have no external stream to
test against.  Here we generate those streams ourselves and use
libwebp's DECODER as referee: every encoded stream must (a) be
accepted by libwebp and (b) decode byte-identically in vp8.py and
libwebp.  Without libwebp the same matrix still runs as
encode->my-decode with a reconstruction-quality bound.
"""

from __future__ import annotations

import numpy as np
import pytest

from streamsum_spark.operators import vp8_encode as E
from streamsum_spark.operators import webp

from libwebp_oracle import HAVE_LIBWEBP

if HAVE_LIBWEBP:
    import libwebp_oracle as lo


def _img(h, w, seed=0):
    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    return np.dstack([
        (gx * 3 + seed) % 256, (gy * 4 + seed) % 256,
        (gx + gy) % 256]).astype(np.uint8)


def test_bool_encoder_roundtrips_against_decoder():
    """RFC 6386 7.3 encode -> 7.2 decode over random decision
    sequences, including carry-heavy low-probability runs."""
    from streamsum_spark.operators.vp8 import _Bool

    rs = np.random.RandomState(42)
    for _ in range(60):
        n = rs.randint(1, 400)
        probs = rs.randint(1, 255, n)
        bits = rs.randint(0, 2, n)
        enc = E._BoolEnc()
        for b, p in zip(bits, probs):
            enc.bit(int(b), int(p))
        bd = _Bool(enc.flush())
        assert [bd.bit(int(p)) for p in probs] == list(bits)


_MATRIX = [
    dict(),
    dict(n_parts=2),
    dict(n_parts=4),
    dict(n_parts=8),
    dict(n_segments=2),
    dict(n_segments=4),
    dict(n_segments=3, seg_abs=True),
    dict(filter_simple=1),
    dict(filter_simple=1, sharpness=7),
    dict(sharpness=3),
    dict(filter_level=0),
    dict(filter_level=63),
    dict(use_skip=False),
    dict(coeff_updates={(1 * 264 + 1 * 33 + 2 * 11 + 3): 100,
                        5: 200, 1000: 30}),
    dict(n_parts=4, n_segments=3, filter_simple=1, sharpness=2,
         coeff_updates={7: 50}, mode_seed=3),
]


@pytest.mark.parametrize("knobs", _MATRIX,
                         ids=lambda k: "+".join(k) if k else "defaults")
def test_encoded_streams_decode_exact_vs_libwebp(knobs):
    import zlib

    # deterministic per-config seed (str hash() is salted per process)
    img = _img(48, 64, zlib.crc32("+".join(sorted(knobs)).encode()) % 97)
    blob = E.encode_webp_lossy(img, 75, **knobs)
    mine = webp.decode_webp(blob)
    err = np.abs(mine.astype(int) - img.astype(int)).mean()
    assert err < 15, f"reconstruction error {err}"
    if HAVE_LIBWEBP:
        gold = lo.decode_rgb(blob)  # libwebp as referee
        assert np.array_equal(mine, gold)


@pytest.mark.parametrize("hw,q", [((33, 49), 60), ((17, 23), 80),
                                  ((16, 16), 75), ((80, 112), 40),
                                  ((1, 1), 75), ((15, 15), 90)])
def test_encoded_odd_sizes_and_qualities(hw, q):
    h, w = hw
    img = _img(h, w, h + w)
    blob = E.encode_webp_lossy(img, q, n_parts=2 if h > 16 else 1,
                               n_segments=2 if w > 16 else 1)
    mine = webp.decode_webp(blob)
    assert mine.shape == (h, w, 3)
    if HAVE_LIBWEBP:
        assert np.array_equal(mine, lo.decode_rgb(blob))


def test_quality_monotonicity():
    """Higher quality -> lower reconstruction error and larger file."""
    img = _img(48, 64, 7)
    prev_err, prev_size = None, None
    for q in (10, 50, 95):
        blob = E.encode_webp_lossy(img, q)
        out = webp.decode_webp(blob)
        err = np.abs(out.astype(int) - img.astype(int)).mean()
        if prev_err is not None:
            assert err <= prev_err
            assert len(blob) >= prev_size
        prev_err, prev_size = err, len(blob)


def test_mode_cycling_covers_all_intra_modes():
    """The deterministic mode policy must actually exercise every
    16x16 ymode, every uvmode, and all ten B_PRED sub-modes across a
    5x5-MB frame (the coverage claim the encoder exists for)."""
    img = _img(80, 80, 3)
    blob = E.encode_webp_lossy(img, 75)
    payload = blob[20:]  # RIFF(12) + chunk header(8)
    from streamsum_spark.operators import vp8 as D

    tag = payload[0] | (payload[1] << 8) | (payload[2] << 16)
    bd = D._Bool(payload[10:10 + (tag >> 5)])
    hd = D._parse_header(bd)
    seen_y, seen_uv, seen_b = set(), set(), set()
    bmodes = np.zeros((5, 5, 4, 4), np.uint8)
    for my in range(5):
        for mx in range(5):
            if hd["use_skip"]:
                bd.bit(hd["skip_prob"])
            ym = bd.tree(D._KF_YMODE_TREE, D._KF_YMODE_PROB)
            seen_y.add(ym)
            if ym == 4:
                bm = bmodes[my, mx]
                import streamsum_spark.operators.vp8_tables as T

                for r in range(4):
                    for c in range(4):
                        a = (bm[r - 1, c] if r else
                             (bmodes[my - 1, mx, 3, c] if my else 0))
                        lf = (bm[r, c - 1] if c else
                              (bmodes[my, mx - 1, r, 3] if mx else 0))
                        bm[r, c] = bd.tree(
                            D._BMODE_TREE, T.KF_BMODE_PROBS, 0,
                            (int(a) * 10 + int(lf)) * 9)
                        seen_b.add(int(bm[r, c]))
            else:
                bmodes[my, mx, :, :] = D._IMPLIED_BMODE[ym]
            seen_uv.add(bd.tree(D._UV_MODE_TREE, D._KF_UV_MODE_PROB))
    assert seen_y == {0, 1, 2, 3, 4}
    assert seen_uv == {0, 1, 2, 3}
    assert seen_b == set(range(10))


def test_lossy_fixture_through_extract_features(spark):
    from streamsum_spark.operators import multimodal as mm

    img = _img(32, 48, 1)
    rows = [(1, "image/webp", 48, 32, None,
             E.encode_webp_lossy(img, 75, n_parts=2))]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = mm.extract_features(df).collect()[0]
    assert out.decoded and out.width == 48 and out.height == 32
