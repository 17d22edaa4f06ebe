"""Animated GIF/WebP full-frame decode pins (r8 verdict item 5): frame-
accurate canvases across delta frames, transparency, every disposal
mode, and both WebP blend modes — each expected canvas is derived by
independent hand arithmetic in the test, not by trusting the decoder —
plus the end-to-end sampled-frame extraction where frame_sample_plan's
timestamps drive which frames are decoded."""

from __future__ import annotations

import numpy as np
import pytest

from streamsum_spark.operators import gif, multimodal as mm, webp

R, G, B, K, W = (255, 0, 0), (0, 255, 0), (0, 0, 255), (0, 0, 0), (255, 255, 255)


# ---- GIF -------------------------------------------------------------


def _gif_fixture():
    f1 = np.full((4, 4, 3), R, np.uint8)
    f2 = np.full((2, 2, 3), G, np.uint8)
    f3 = np.full((2, 2, 3), B, np.uint8)
    f4 = np.full((4, 4, 3), K, np.uint8)
    f4[0, 0] = R
    return gif.encode_gif_animated(
        [f1, f2, f3, f4],
        [10, 20, 30, 0],
        disposals=[1, 3, 2, 0],
        offsets=[(0, 0), (1, 1), (0, 0), (0, 0)],
        canvas=(4, 4),
        transparent_color=K,
        bg_color=R,
    )


def test_gif_frames_disposal_transparency_and_timestamps():
    """Frame 2 is a delta at (1,1) with disposal 3 (restore previous),
    frame 3 disposal 2 (restore background), frame 4 is transparent
    everywhere except one pixel.  Every canvas and timestamp is pinned
    against hand-composited expectations."""
    frames = gif.decode_gif_frames(_gif_fixture())
    c1 = np.full((4, 4, 3), R, np.uint8)
    c2 = c1.copy(); c2[1:3, 1:3] = G
    c3 = c1.copy(); c3[0:2, 0:2] = B       # disposal 3 restored c1 first
    c4 = c1.copy()                          # disposal 2 -> bg (= R); f4
    c4[0, 0] = R                            # paints only its opaque pixel
    assert [(t, d) for t, d, _ in frames] == [
        (0, 100), (100, 200), (300, 300), (600, 0)
    ]
    for got, want in zip(frames, [c1, c2, c3, c4]):
        assert np.array_equal(got[2], want)


def test_gif_first_frame_contract_unchanged():
    """decode_gif keeps the historical still contract: frame-sized first
    frame, no canvas compositing."""
    out = gif.decode_gif(_gif_fixture())
    assert np.array_equal(out, np.full((4, 4, 3), R, np.uint8))


def test_gif_frame_clipped_to_canvas():
    """A frame whose rect extends past the canvas edge is clipped (the
    visible part still composites; nothing allocates past the screen)."""
    f1 = np.full((2, 2, 3), R, np.uint8)
    f2 = np.full((2, 2, 3), G, np.uint8)
    blob = gif.encode_gif_animated(
        [f1, f2], [10, 10], offsets=[(0, 0), (1, 1)], canvas=(2, 2)
    )
    frames = gif.decode_gif_frames(blob)
    want = np.full((2, 2, 3), R, np.uint8)
    want[1, 1] = G
    assert np.array_equal(frames[1][2], want)


def test_gif_frames_hostile_refuses():
    with pytest.raises(ValueError):
        gif.decode_gif_frames(b"GIF89a" + b"\x00" * 8)
    # valid single frame still yields exactly one entry
    px = np.full((3, 3, 3), W, np.uint8)
    frames = gif.decode_gif_frames(gif.encode_gif(px))
    assert len(frames) == 1 and np.array_equal(frames[0][2], px)
    assert frames[0][:2] == (0, 0)


# ---- WebP ------------------------------------------------------------


def test_webp_lossless_rgba_roundtrip():
    rng = np.random.default_rng(4)
    px = rng.integers(0, 256, (7, 9, 4), dtype=np.uint8)
    out = webp.decode_webp_rgba(webp.encode_webp_lossless(px))
    assert np.array_equal(out, px)


def test_webp_frames_blend_dispose_and_timestamps():
    """Alpha-blend vs no-blend vs dispose-to-background, pinned against
    hand-computed integer OVER compositing."""
    base = np.full((4, 6, 3), (200, 10, 10), np.uint8)
    delta = np.zeros((2, 2, 4), np.uint8)
    delta[...] = (10, 200, 10, 255)
    delta[0, 0] = (0, 0, 0, 0)              # transparent: keeps canvas
    half = np.zeros((2, 2, 4), np.uint8)
    half[...] = (100, 100, 200, 128)        # fractional alpha, no-blend
    blob = webp.encode_webp_animated(
        [base, delta, half],
        [100, 50, 25],
        offsets=[(0, 0), (2, 0), (0, 2)],
        blends=[True, True, False],
        disposals=[0, 1, 0],
        canvas=(4, 6),
        bg_rgba=(7, 8, 9, 255),
    )
    frames = webp.decode_webp_frames(blob)
    assert [(t, d) for t, d, _ in frames] == [(0, 100), (100, 50), (150, 25)]
    bg = np.array([7, 8, 9])
    c1 = np.broadcast_to(np.array([200, 10, 10]), (4, 6, 3)).copy()
    c2 = c1.copy()
    c2[0:2, 2:4] = (10, 200, 10)
    c2[0, 2] = (200, 10, 10)
    # frame 2's rect disposed to bg, then frame 3 REPLACES its own rect
    # (alpha included): flattening over bg = (rgb*128 + bg*127 + 127)//255
    c3 = c1.copy()
    c3[0:2, 2:4] = bg
    c3[2:4, 0:2] = (np.array([100, 100, 200]) * 128 + bg * 127 + 127) // 255
    for got, want in zip(frames, [c1, c2, c3]):
        assert np.array_equal(got[2], want.astype(np.uint8))


def test_webp_still_yields_single_frame():
    px = np.full((3, 5, 3), G, np.uint8)
    frames = webp.decode_webp_frames(webp.encode_webp_lossless(px))
    assert len(frames) == 1 and frames[0][:2] == (0, 0)
    assert np.array_equal(frames[0][2], px)


def test_webp_frames_hostile_refuses():
    with pytest.raises(ValueError):  # frame exceeding the canvas
        big = np.full((4, 4, 3), R, np.uint8)
        blob = webp.encode_webp_animated([big], [10], canvas=(2, 2))
        webp.decode_webp_frames(blob)
    with pytest.raises(ValueError):
        webp.decode_webp_frames(b"RIFF\x04\x00\x00\x00WEBP")


def test_webp_first_frame_contract_unchanged():
    base = np.full((4, 6, 3), (1, 2, 3), np.uint8)
    blob = webp.encode_webp_animated([base], [10])
    assert np.array_equal(webp.decode_webp(blob), base)


# ---- sampled-frame extraction ----------------------------------------


def test_frame_sample_plan_drives_decode(spark):
    """End to end: the plan's timestamps select frames; each timestamp
    maps to the frame whose [start, start+duration) covers it, holding
    the last frame past the end; a still covers every timestamp with
    frame 0; an undecodable blob degrades to decoded=false rows."""
    f1 = np.full((4, 4, 3), R, np.uint8)
    f2 = np.full((4, 4, 3), G, np.uint8)
    anim = gif.encode_gif_animated([f1, f2], [15, 10], canvas=(4, 4))
    still = mm.encode_bmp(np.full((3, 3, 3), B, np.uint8))
    rows = [
        (1, "image/gif", 4, 4, 400, bytearray(anim)),
        (2, "image/bmp", 3, 3, 250, bytearray(still)),
        (3, "image/gif", 4, 4, 150, bytearray(b"GIF89a" + b"\xff" * 20)),
        (4, "audio/wav", None, None, 300, bytearray(b"RIFF")),  # not visual
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {
        (r.media_id, r.frame_ts_ms): (r.frame_idx, r.decoded)
        for r in mm.extract_sampled_frames(media, every_ms=100).collect()
    }
    # anim: frame starts 0 (150ms) and 150 (100ms); hold last past 250
    assert got[(1, 0)] == (0, True)
    assert got[(1, 100)] == (0, True)
    assert got[(1, 200)] == (1, True)
    assert got[(1, 300)] == (1, True)   # held past the last frame's end
    assert got[(2, 0)] == (0, True) and got[(2, 200)] == (0, True)
    assert got[(3, 0)] == (None, False) and got[(3, 100)] == (None, False)
    assert not any(mid == 4 for mid, _ in got)  # audio rows excluded
    feats = {
        r.frame_ts_ms: r.feature
        for r in mm.extract_sampled_frames(media, every_ms=100)
        .where("media_id = 1").collect()
    }
    # frame 0 is pure red, frame 1 pure green: mean-channel features flip
    assert feats[0][0] == 1.0 and feats[0][1] == 0.0
    assert feats[200][0] == 0.0 and feats[200][1] == 1.0


# ---- APNG ------------------------------------------------------------


def _apng_fixture():
    base = np.zeros((4, 6, 4), np.uint8)
    base[...] = (200, 10, 10, 255)
    delta = np.zeros((2, 2, 4), np.uint8)
    delta[...] = (10, 200, 10, 255)
    delta[0, 0] = (0, 0, 0, 0)              # transparent: keeps canvas (over)
    half = np.zeros((2, 2, 4), np.uint8)
    half[...] = (100, 100, 200, 128)        # fractional alpha, blend=source
    return mm.encode_apng(
        [base, delta, half],
        [100, 50, 25],
        offsets=[(0, 0), (2, 0), (0, 2)],
        blends=[0, 1, 0],
        disposes=[0, 1, 0],
        canvas=(4, 6),
    )


def test_apng_frames_blend_dispose_and_timestamps():
    """fcTL blend_op over/source, dispose_op background, exact-ms
    delays — every canvas hand-composited (flattened over black, the
    APNG default since the canvas starts fully transparent)."""
    frames = mm.decode_apng_frames(_apng_fixture())
    assert [(t, d) for t, d, _ in frames] == [(0, 100), (100, 50), (150, 25)]
    c1 = np.zeros((4, 6, 3), np.uint8)
    c1[...] = (200, 10, 10)
    c2 = c1.copy()
    c2[0:2, 2:4] = (10, 200, 10)
    c2[0, 2] = (200, 10, 10)                 # alpha-0 delta pixel: canvas shows
    c3 = c1.copy()
    c3[0:2, 2:4] = 0                          # disposed to transparent -> black
    c3[2:4, 0:2] = (np.array([100, 100, 200]) * 128 + 127) // 255  # a=128 over black
    for got, want in zip(frames, [c1, c2, c3]):
        assert np.array_equal(got[2], want.astype(np.uint8))


def test_apng_dispose_previous_and_palette_trns():
    """dispose_op 2 restores the pre-frame rect; a palette APNG with
    per-index tRNS alpha composites through the palette path."""
    f1 = np.zeros((3, 3, 4), np.uint8); f1[...] = (9, 9, 9, 255)
    f2 = np.zeros((1, 1, 4), np.uint8); f2[...] = (250, 0, 0, 255)
    f3 = np.zeros((3, 3, 4), np.uint8); f3[...] = (0, 0, 250, 255)
    blob = mm.encode_apng(
        [f1, f2, f3], [10, 10, 10],
        offsets=[(0, 0), (1, 1), (0, 0)],
        blends=[0, 1, 0],
        disposes=[0, 2, 0],
    )
    frames = mm.decode_apng_frames(blob)
    assert np.array_equal(frames[1][2][1, 1], [250, 0, 0])
    assert np.array_equal(frames[2][2], np.broadcast_to([0, 0, 250], (3, 3, 3)))
    # palette + tRNS through the rgba path
    import struct as _s
    import zlib as _z

    def chunk(t, d):
        return _s.pack(">I", len(d)) + t + d + _s.pack(">I", _z.crc32(t + d) & 0xFFFFFFFF)

    # 2-entry palette, index 1 transparent; 2x1 image [0, 1]
    raw = b"\x00\x00\x01"  # filter 0, indices 0,1
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _s.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", bytes([10, 20, 30, 40, 50, 60]))
        + chunk(b"tRNS", bytes([255, 0]))
        + chunk(b"IDAT", _z.compress(raw))
        + chunk(b"IEND", b"")
    )
    px = mm._decode_png(blob, rgba=True)
    assert px[0, 0].tolist() == [10, 20, 30, 255]
    assert px[0, 1].tolist() == [40, 50, 60, 0]


def test_apng_still_and_first_frame_contract():
    still = mm.encode_png(np.full((3, 5, 3), 77, np.uint8))
    frames = mm.decode_apng_frames(still)
    assert len(frames) == 1 and frames[0][:2] == (0, 0)
    # decode_image on an animated file keeps the first-frame contract
    c1 = np.zeros((4, 6, 3), np.uint8)
    c1[...] = (200, 10, 10)
    assert np.array_equal(mm.decode_image(_apng_fixture()), c1)


def test_apng_hostile_refuses():
    blob = bytearray(_apng_fixture())
    with pytest.raises(ValueError):  # frame count mismatch
        i = blob.index(b"acTL")
        bad = bytes(blob[: i + 4]) + b"\x00\x00\x00\x09" + bytes(blob[i + 8 :])
        mm.decode_apng_frames(bad)
    with pytest.raises(ValueError):  # out-of-order sequence numbers
        i = blob.index(b"fdAT")
        bad = bytearray(blob)
        bad[i + 4 : i + 8] = b"\x00\x00\x00\x63"
        mm.decode_apng_frames(bytes(bad))
    f = np.zeros((2, 2, 4), np.uint8)
    big = np.zeros((4, 6, 4), np.uint8)
    with pytest.raises(ValueError):  # frame exceeds canvas
        mm.decode_apng_frames(
            mm.encode_apng([big, f], [10, 10],
                           offsets=[(0, 0), (5, 3)], canvas=(4, 6))
        )
    with pytest.raises(ValueError):  # first frame must cover the canvas
        mm.decode_apng_frames(
            mm.encode_apng([f, f], [10, 10], canvas=(8, 8))
        )


def test_apng_through_sampled_frames(spark):
    blob = _apng_fixture()
    rows = [(1, "image/apng", 6, 4, 175, bytearray(blob))]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {
        r.frame_ts_ms: r.frame_idx
        for r in mm.extract_sampled_frames(media, every_ms=50).collect()
    }
    # frame starts 0 (100ms), 100 (50ms), 150 (25ms)
    assert got == {0: 0, 50: 0, 100: 1, 150: 2}


# ---- round-9 review findings pinned ------------------------------------


def test_animated_canvas_bombs_refused_before_allocation():
    """A tiny file declaring a canvas whose BYTE cap (4 B/px) passes but
    whose int RGBA working canvas + blend temporaries would be
    gigabytes must refuse at the canvas check, pre-allocation (r9
    review: a 156-byte WebP drove 4 GB of int64 temporaries)."""
    import struct

    def chunk(tag, body):
        return tag + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    vp8x = bytes([0x02, 0, 0, 0]) + (16384 - 1).to_bytes(3, "little") + (
        4096 - 1
    ).to_bytes(3, "little")
    bomb = (b"RIFF" + struct.pack("<I", 200) + b"WEBP"
            + chunk(b"VP8X", vp8x) + chunk(b"ANIM", bytes(6))
            + chunk(b"ANMF", bytes(16) + chunk(b"VP8L", b"\x2f\x00\x00\x00\x00")))
    with pytest.raises(ValueError, match="canvas exceeds"):
        webp.decode_webp_frames(bomb)

    import struct as _s
    import zlib as _z

    def pchunk(t, d):
        return _s.pack(">I", len(d)) + t + d + _s.pack(
            ">I", _z.crc32(t + d) & 0xFFFFFFFF
        )

    apng = (b"\x89PNG\r\n\x1a\n"
            + pchunk(b"IHDR", _s.pack(">IIBBBBB", 8192, 4095, 8, 6, 0, 0, 0))
            + pchunk(b"acTL", _s.pack(">II", 1, 0))
            + pchunk(b"fcTL", _s.pack(">IIIIIHHBB", 0, 8192, 4095, 0, 0, 1, 100, 0, 0))
            + pchunk(b"IDAT", b"x") + pchunk(b"IEND", b""))
    with pytest.raises(ValueError, match="canvas exceeds"):
        mm.decode_apng_frames(apng)


def test_gif_zero_dimension_canvas_refused():
    """A 0x0 logical screen passed the byte cap at 0 and emitted
    (0, 0, 3) frames whose pixel stats were NaN — poisoned features (r9
    review).  Corrupt input instead."""
    import struct

    blob = gif.encode_gif_animated([np.full((2, 2, 3), 5, np.uint8)], [10])
    zero = blob[:6] + struct.pack("<HH", 0, 0) + blob[10:]
    with pytest.raises(ValueError, match="zero-dimension"):
        gif.decode_gif_frames(zero)


def test_compositors_share_one_blend_and_cap():
    """The WebP and APNG compositors must route through the ONE shared
    OVER implementation and cap constant (drift risk pinned)."""
    import inspect

    from streamsum_spark.operators import _compositing

    assert "over" in dir(_compositing) and "MAX_FRAMES_BYTES" in dir(_compositing)
    assert "_composite_over(region, fr)" in inspect.getsource(webp._decode_webp_frames)
    assert "over(region, px)" in inspect.getsource(mm.decode_apng_frames)


def test_animated_decoders_mutation_fuzz_value_error_only():
    """Bit-flip fuzz across all three animated containers: every decode
    must return frames or raise ValueError — never leak struct/Key/
    IndexError, hang, or blow the output caps (same contract as the
    still-image decoders' fuzz batteries)."""
    import random

    gif_blob = _gif_fixture()
    f1 = np.full((4, 6, 3), R, np.uint8)
    f2 = np.zeros((2, 2, 4), np.uint8)
    f2[...] = (1, 2, 3, 200)
    webp_blob = webp.encode_webp_animated(
        [f1, f2], [20, 30], offsets=[(0, 0), (2, 2)], canvas=(4, 6)
    )
    apng_blob = _apng_fixture()
    rnd = random.Random(17)
    for base, dec in [
        (gif_blob, gif.decode_gif_frames),
        (webp_blob, webp.decode_webp_frames),
        (apng_blob, mm.decode_apng_frames),
    ]:
        for _ in range(150):
            b = bytearray(base)
            for _ in range(rnd.randrange(1, 4)):
                b[rnd.randrange(len(b))] ^= 1 << rnd.randrange(8)
            try:
                frames = dec(bytes(b))
                assert frames and all(px.ndim == 3 for _, _, px in frames)
            except (ValueError, NotImplementedError):
                pass


def test_tiny_canvas_frame_bomb_hits_byte_floor(monkeypatch):
    """A 1x1-canvas GIF pays only 3 bytes/frame toward the composited
    cap while each emitted frame costs ~hundreds of bytes of object
    overhead — the cap charges a 4096-byte floor per frame so a
    million-frame tiny-canvas bomb still trips it (r9 ADVICE)."""
    px = np.full((1, 1, 3), R, np.uint8)
    blob = gif.encode_gif_animated([px] * 12, [1] * 12)
    monkeypatch.setattr(gif, "_MAX_FRAMES_BYTES", 4096 * 10)
    with pytest.raises(ValueError, match="composited-output cap"):
        gif.decode_gif_frames(blob)
    monkeypatch.setattr(webp, "_MAX_FRAMES_BYTES", 4096 * 10)
    f = np.zeros((1, 1, 4), np.uint8)
    wblob = webp.encode_webp_animated([f] * 12, [1] * 12, canvas=(1, 1))
    with pytest.raises(ValueError, match="composited-output cap"):
        webp.decode_webp_frames(wblob)


def test_encode_gif_transparent_color_absent_from_frames():
    """transparent_color gets a reserved palette slot even when no frame
    pixel carries it — previously a bare KeyError from the LUT (r9
    ADVICE).  The punched-through pixels must expose the background."""
    f1 = np.full((2, 2, 3), R, np.uint8)
    f2 = np.full((2, 2, 3), G, np.uint8)
    blob = gif.encode_gif_animated(
        [f1, f2], [10, 10], transparent_color=W, bg_color=B
    )
    frames = gif.decode_gif_frames(blob)
    assert len(frames) == 2
    assert (frames[0][2] == R).all() and (frames[1][2] == G).all()
