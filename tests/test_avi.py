"""AVI (RIFF) container: probe metadata, MJPEG/DIB frame decode, the
Annex-K default-Huffman splice, hostile-input bounds, and the Spark
integration (probe_media, with_probed_duration, extract_sampled_frames
over a real decodable video)."""

import random
import struct

import numpy as np
import pytest

from streamsum_spark.operators.avi import (
    _strip_dht,
    _with_default_dht,
    decode_avi_frames,
    encode_avi_dib,
    encode_avi_mjpeg,
    probe_avi,
)
from streamsum_spark.operators.multimodal import decode_frames
from streamsum_spark.operators.video_probe import probe_video


def _frames(n=4, h=48, w=64):
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for k in range(n):
        f = np.stack(
            [(xx * 3 + k * 20) % 256, (yy * 5) % 256, ((xx + yy) * 2 + k * 10) % 256],
            -1,
        ).astype(np.uint8)
        out.append(f)
    return out


# --- probe -------------------------------------------------------------------


def test_probe_mjpeg_metadata():
    blob = encode_avi_mjpeg(_frames(), rate=10, scale=1)
    p = probe_avi(blob)
    assert p["container"] == "avi"
    assert p["brand"] is None
    assert p["duration_ms"] == 400  # 4 frames @ 10 fps
    (t,) = p["tracks"]
    assert t["handler"] == "vide"
    assert t["codec"] == "MJPG"
    assert (t["width"], t["height"]) == (64, 48)
    assert t["duration_ms"] == 400
    # probe_video routes RIFF-AVI here
    assert probe_video(blob) == p


def test_probe_dib_metadata():
    p = probe_avi(encode_avi_dib(_frames(), rate=25))
    assert p["tracks"][0]["codec"] == "DIB"
    assert p["duration_ms"] == 160  # 4 frames @ 25 fps


def test_probe_fractional_rate():
    # 30000/1001 NTSC: track duration from the exact rational
    blob = encode_avi_mjpeg(_frames(2), rate=30000, scale=1001)
    t = probe_avi(blob)["tracks"][0]
    assert t["duration_ms"] == 2 * 1001 * 1000 // 30000


# --- decode ------------------------------------------------------------------


def test_mjpeg_decode_tolerance_and_timing():
    src = _frames()
    out = decode_avi_frames(encode_avi_mjpeg(src, rate=10, scale=1))
    assert [(s, d) for s, d, _ in out] == [(0, 100), (100, 100), (200, 100), (300, 100)]
    for (_, _, px), f in zip(out, src):
        assert px.shape == f.shape
        assert np.abs(px.astype(int) - f.astype(int)).max() <= 8


def test_tableless_frames_decode_identically():
    src = _frames()
    tabled = decode_avi_frames(encode_avi_mjpeg(src, rate=10))
    bare = decode_avi_frames(encode_avi_mjpeg(src, rate=10, table_less=True))
    for (_, _, a), (_, _, b) in zip(tabled, bare):
        assert (a == b).all()


def test_dib_decode_byte_exact():
    src = _frames(3, h=17, w=21)  # odd width exercises row padding
    out = decode_avi_frames(encode_avi_dib(src, rate=25))
    for (_, _, px), f in zip(out, src):
        assert (px == f).all()


def test_decode_frames_dispatch():
    src = _frames(2)
    out = decode_frames(encode_avi_dib(src, rate=25))
    assert len(out) == 2 and (out[1][2] == src[1]).all()


def test_dropped_frame_repeats_previous():
    src = _frames(3)
    blob = bytearray(encode_avi_dib(src, rate=25))
    # rebuild with the middle frame chunk emptied
    from streamsum_spark.operators.avi import _avi_container

    stride = (64 * 3 + 3) & ~3
    payloads = []
    for i, f in enumerate(src):
        rows = np.zeros((48, stride), np.uint8)
        rows[:, : 64 * 3] = f[:, :, ::-1].reshape(48, 64 * 3)
        payloads.append(b"" if i == 1 else rows[::-1].tobytes())
    blob = _avi_container(
        payloads, 64, 48, 25, 1, b"DIB ", b"\x00\x00\x00\x00", 24, b"00db"
    )
    out = decode_avi_frames(blob)
    assert (out[1][2] == out[0][2]).all()
    assert (out[2][2] == src[2]).all()


def test_rec_list_nesting():
    from streamsum_spark.operators.avi import _chunk, _list

    src = _frames(2, h=8, w=8)
    # rebuild with the frame chunks wrapped in a LIST('rec ') group
    stride = (8 * 3 + 3) & ~3
    payloads = []
    for f in src:
        rows = np.zeros((8, stride), np.uint8)
        rows[:, : 8 * 3] = f[:, :, ::-1].reshape(8, 8 * 3)
        payloads.append(rows[::-1].tobytes())
    movi_inner = b"".join(_chunk(b"00db", p) for p in payloads)
    rec = _list(b"rec ", movi_inner)
    # take hdrl from the original encode, swap the movi list
    orig = bytes(encode_avi_dib(src, rate=25))
    movi_at = orig.index(b"movi") - 8
    body = orig[8:movi_at] + _list(b"movi", rec)
    blob2 = b"RIFF" + struct.pack("<I", len(body)) + body
    out = decode_avi_frames(blob2)
    assert len(out) == 2 and (out[0][2] == src[0]).all()


def test_unsupported_codec_refuses():
    from streamsum_spark.operators.avi import _avi_container

    blob = _avi_container([b"\x00" * 64], 64, 48, 25, 1, b"xvid", b"XVID", 24, b"00dc")
    with pytest.raises(NotImplementedError, match="XVID"):
        decode_avi_frames(blob)


def test_dib_16bit_refuses():
    from streamsum_spark.operators.avi import _avi_container

    blob = _avi_container(
        [b"\x00" * (64 * 48 * 2)], 64, 48, 25, 1, b"DIB ", b"\x00" * 4, 16, b"00db"
    )
    with pytest.raises(NotImplementedError, match="biBitCount=16"):
        decode_avi_frames(blob)


def test_non_avi_refuses():
    with pytest.raises(ValueError):
        probe_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        decode_avi_frames(b"not a riff at all....")


# --- the DHT splice ----------------------------------------------------------


def test_with_default_dht_noop_when_tabled():
    from streamsum_spark.operators.jpeg import encode_jpeg

    j = encode_jpeg(_frames(1)[0])
    assert _with_default_dht(j) is j or _with_default_dht(j) == j


def test_strip_then_splice_restores_exact_bytes():
    from streamsum_spark.operators.jpeg import encode_jpeg

    j = encode_jpeg(_frames(1)[0], quality=75)
    bare = _strip_dht(j)
    assert b"\xff\xc4" not in bare.split(b"\xff\xda")[0]
    restored = _with_default_dht(bare)
    # the encoder emits DHT right before (optional DRI and) SOS, and
    # the splice inserts before SOS, so the restored file decodes to
    # the identical pixels (encoder tables == Annex K.3 defaults)
    from streamsum_spark.operators.jpeg import decode_jpeg

    assert (decode_jpeg(restored) == decode_jpeg(j)).all()


# --- hostile input -----------------------------------------------------------


def test_truncation_fuzz():
    blob = encode_avi_mjpeg(_frames(2, h=16, w=16), rate=10)
    for cut in range(0, len(blob), 7):
        try:
            decode_avi_frames(blob[:cut])
        except (ValueError, NotImplementedError, struct.error):
            pass
    blob = encode_avi_dib(_frames(2, h=16, w=16), rate=10)
    for cut in range(0, len(blob), 7):
        try:
            decode_avi_frames(blob[:cut])
        except (ValueError, NotImplementedError, struct.error):
            pass


def test_mutation_fuzz():
    rng = random.Random(11)
    goods = [
        encode_avi_mjpeg(_frames(2, h=16, w=16), rate=10),
        encode_avi_dib(_frames(2, h=16, w=16), rate=10),
    ]
    for _ in range(300):
        b = bytearray(rng.choice(goods))
        for _ in range(rng.randint(1, 4)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            decode_avi_frames(bytes(b))
            probe_avi(bytes(b))
        except (ValueError, NotImplementedError, struct.error):
            pass


def test_frame_cap_bounds_allocation():
    # huge declared canvas must refuse before decoding
    from streamsum_spark.operators.avi import _avi_container

    blob = _avi_container(
        [b"\x00"] * 8, 60000, 60000, 25, 1, b"MJPG", b"MJPG", 24, b"00dc"
    )
    with pytest.raises(ValueError):
        decode_avi_frames(blob)


# --- audio track -------------------------------------------------------------


def _tone(n=8000, ch=2):
    return (np.sin(np.arange(n * ch) * 0.05) * 12000).astype(np.int16).reshape(-1, ch)


def test_av_audio_extraction_byte_exact():
    from streamsum_spark.operators.avi import decode_avi_audio, encode_avi_av
    from streamsum_spark.operators.multimodal import decode_audio

    tone = _tone()
    blob = encode_avi_av(_frames(4, h=32, w=32), tone, 16000, rate=8)
    s, r = decode_avi_audio(blob)
    assert r == 16000 and (s == tone).all()
    # decode_audio dispatches RIFF-AVI here
    s2, r2 = decode_audio(blob)
    assert r2 == 16000 and (s2 == tone).all()


def test_av_probe_and_interleaved_video():
    from streamsum_spark.operators.avi import encode_avi_av

    tone = _tone(4000)
    blob = encode_avi_av(_frames(4, h=32, w=32), tone, 16000, rate=8)
    p = probe_avi(blob)
    assert [(t["handler"], t["codec"]) for t in p["tracks"]] == [
        ("vide", "MJPG"),
        ("soun", "pcm"),
    ]
    assert p["tracks"][1]["duration_ms"] == 250  # 4000 samples @ 16 kHz
    # the interleaved 01wb chunks don't confuse the video collector
    v = decode_avi_frames(blob)
    assert len(v) == 4 and [f[0] for f in v] == [0, 125, 250, 375]


def test_av_audio_feeds_prep_chain():
    from streamsum_spark.operators.audio_prep import downmix_mono, log_mel_spectrogram
    from streamsum_spark.operators.avi import decode_avi_audio, encode_avi_av

    tone = _tone(16000)
    blob = encode_avi_av(_frames(2, h=16, w=16), tone, 16000, rate=2)
    s, r = decode_avi_audio(blob)
    mel = log_mel_spectrogram(downmix_mono(s), r)
    assert mel.shape[1] == 80 and mel.shape[0] > 0


def test_av_soundtrack_flows_through_resample_media(spark):
    # no new plumbing needed: resample_media calls decode_audio, which
    # dispatches RIFF-AVI to the soundtrack extractor
    from streamsum_spark.operators.audio_prep import resample_media
    from streamsum_spark.operators.avi import encode_avi_av

    blob = encode_avi_av(_frames(2, h=16, w=16), _tone(16000), 16000, rate=2)
    media = spark.createDataFrame(
        [(1, bytearray(blob))], "media_id long, content binary"
    )
    (row,) = resample_media(media, out_rate=8000).collect()
    assert row.decoded and row.src_rate == 16000 and row.src_channels == 2


def test_audio_missing_stream_refuses():
    from streamsum_spark.operators.avi import decode_avi_audio

    blob = encode_avi_mjpeg(_frames(2, h=8, w=8), rate=10)
    with pytest.raises(ValueError, match="without an audio stream"):
        decode_avi_audio(blob)


# --- selective decode --------------------------------------------------------


def test_frames_at_matches_full_decode():
    from streamsum_spark.operators.avi import decode_avi_frames_at
    from streamsum_spark.operators.multimodal import frames_at

    src = _frames(6, h=16, w=16)
    blob = encode_avi_mjpeg(src, rate=4, scale=1)  # 250 ms/frame
    full = decode_avi_frames(blob)
    starts = [s for s, _, _ in full]
    ts = [0, 100, 250, 700, 1300, 99999]
    picked = decode_avi_frames_at(blob, ts)
    import bisect

    for t, (j, px) in zip(ts, picked):
        expect_j = max(0, bisect.bisect_right(starts, t) - 1)
        assert j == expect_j
        assert (px == full[j][2]).all()
    # the multimodal dispatcher routes AVI to the selective path and
    # everything else through a full decode with the same mapping
    assert all(
        a[0] == b[0] and (a[1] == b[1]).all()
        for a, b in zip(frames_at(blob, ts), picked)
    )


def test_frames_at_decodes_only_selected(monkeypatch):
    from streamsum_spark.operators import multimodal as mm
    from streamsum_spark.operators.avi import decode_avi_frames_at

    src = _frames(30, h=16, w=16)
    blob = encode_avi_mjpeg(src, rate=10, scale=1)  # 3000 ms total
    calls = []
    real = mm.decode_image
    monkeypatch.setattr(mm, "decode_image", lambda b: calls.append(1) or real(b))
    out = decode_avi_frames_at(blob, [0, 1000, 2500])
    assert len(out) == 3
    assert len(calls) == 3  # 3 of 30 frames decoded
    # repeated timestamps hit the cache, not the decoder
    calls.clear()
    decode_avi_frames_at(blob, [500, 505, 509])
    assert len(calls) == 1


def test_frames_at_resolves_dropped_frames():
    from streamsum_spark.operators.avi import _avi_container, decode_avi_frames_at

    src = _frames(3, h=8, w=8)
    stride = (8 * 3 + 3) & ~3
    payloads = []
    for i, f in enumerate(src):
        rows = np.zeros((8, stride), np.uint8)
        rows[:, : 8 * 3] = f[:, :, ::-1].reshape(8, 8 * 3)
        payloads.append(b"" if i == 1 else rows[::-1].tobytes())
    blob = _avi_container(
        payloads, 8, 8, 10, 1, b"DIB ", b"\x00\x00\x00\x00", 24, b"00db"
    )
    (j, px), = decode_avi_frames_at(blob, [100])  # the dropped frame
    assert j == 1 and (px == src[0]).all()


def test_iter_frames_holds_one_frame(monkeypatch):
    # the generator's cache is ONE frame: sorted timestamps over a long
    # clip never accumulate decoded frames (the scale contract)
    from streamsum_spark.operators import multimodal as mm
    from streamsum_spark.operators.avi import iter_avi_frames_at

    src = _frames(20, h=16, w=16)
    blob = encode_avi_mjpeg(src, rate=10, scale=1)
    live = []
    real = mm.decode_image

    def counting(b):
        px = real(b)
        live.append(px)
        return px

    monkeypatch.setattr(mm, "decode_image", counting)
    seen = 0
    for j, px in iter_avi_frames_at(blob, [0, 500, 1000, 1500, 1900]):
        seen += 1
    assert seen == 5 and len(live) == 5  # decoded exactly the 5 selected


def test_sampled_frames_midstream_corruption_isolates(spark):
    # frame 2's chunk is garbage: ALL rows for that media must come
    # back decoded=false (no partial good/bad mix from lazy decode)
    from streamsum_spark.operators.avi import _avi_container
    from streamsum_spark.operators.jpeg import encode_jpeg
    from streamsum_spark.operators.multimodal import extract_sampled_frames

    good = encode_jpeg(_frames(1, h=16, w=16)[0])
    blob = _avi_container(
        [good, b"\xff\xd8 utterly broken"], 16, 16, 1, 1, b"MJPG", b"MJPG",
        24, b"00dc",
    )
    media = spark.createDataFrame(
        [(1, "video/x-msvideo", 2000, bytearray(blob))],
        "media_id long, mime string, duration_ms long, content binary",
    )
    out = extract_sampled_frames(media, every_ms=1000).collect()
    assert len(out) == 2 and all(not r.decoded for r in out)


def test_frames_at_still_image_fallback():
    from streamsum_spark.operators.multimodal import encode_bmp, frames_at

    f = _frames(1, h=8, w=8)[0]
    out = frames_at(encode_bmp(f), [0, 1000])
    assert [j for j, _ in out] == [0, 0]
    assert (out[0][1] == f).all()


# --- Spark integration -------------------------------------------------------


def test_probe_media_and_sampled_frames(spark):
    from streamsum_spark.operators.multimodal import extract_sampled_frames
    from streamsum_spark.operators.video_probe import (
        probe_media,
        with_probed_duration,
    )

    src = _frames(5, h=16, w=16)
    avi = encode_avi_mjpeg(src, rate=2, scale=1)  # 2 fps → 2500 ms
    rows = [(1, "video/x-msvideo", None, bytearray(avi))]
    media = spark.createDataFrame(
        rows, "media_id long, mime string, duration_ms long, content binary"
    )
    probed = {r.media_id: r for r in probe_media(media).collect()}
    assert probed[1].container == "avi"
    assert probed[1].duration_ms == 2500
    assert probed[1].tracks[0].codec == "MJPG"

    # duration flows from the probe into the sample plan, and the
    # sampled decode emits REAL decoded frames (decoded=true)
    out = extract_sampled_frames(with_probed_duration(media), every_ms=1000).collect()
    got = {r.frame_ts_ms: r for r in out}
    assert set(got) == {0, 1000, 2000}
    for ts, r in got.items():
        assert r.decoded
        assert (r.width, r.height) == (16, 16)
    # ts→frame mapping: frame i covers [i*500, (i+1)*500)
    assert got[0].frame_idx == 0
    assert got[1000].frame_idx == 2
    assert got[2000].frame_idx == 4


# --- OpenDML AVIX multi-segment -------------------------------------------------


def test_avix_segments_decode_in_order():
    from streamsum_spark.operators.avi import decode_avi_frames, encode_avix_mjpeg

    segs = [_frames(3, h=16, w=16), _frames(2, h=16, w=16), _frames(2, h=16, w=16)]
    # brand each segment with a whole-frame red offset (DCT quantization
    # crushes single-pixel markers; a DC shift survives exactly)
    for si, seg in enumerate(segs):
        for k, f in enumerate(seg):
            seg[k] = np.where(
                np.arange(3) == 0, np.minimum(f.astype(int) // 2 + si * 60, 255), f
            ).astype(np.uint8)
    blob = encode_avix_mjpeg(segs, rate=10)
    out = decode_avi_frames(blob)
    assert len(out) == 7
    assert [s for s, _, _ in out] == [0, 100, 200, 300, 400, 500, 600]
    # the frame clock spans segments continuously, and frames arrive in
    # segment order
    flat = [f for seg in segs for f in seg]
    for (_, _, px), src in zip(out, flat):
        assert abs(px[:, :, 0].mean() - src[:, :, 0].mean()) < 10


def test_avix_probe_uses_dml_grand_total():
    from streamsum_spark.operators.avi import encode_avix_mjpeg

    segs = [_frames(3, h=16, w=16), _frames(4, h=16, w=16)]
    p = probe_avi(encode_avix_mjpeg(segs, rate=10))
    assert p["duration_ms"] == 700  # 7 frames @ 10 fps, not segment 0's 3


def test_avix_selective_decode_across_segments(monkeypatch):
    from streamsum_spark.operators import multimodal as mm
    from streamsum_spark.operators.avi import encode_avix_mjpeg, iter_avi_frames_at

    segs = [_frames(5, h=16, w=16), _frames(5, h=16, w=16)]
    blob = encode_avix_mjpeg(segs, rate=10)
    calls = []
    real = mm.decode_image
    monkeypatch.setattr(mm, "decode_image", lambda b: calls.append(1) or real(b))
    picked = list(iter_avi_frames_at(blob, [0, 700, 900]))
    assert [j for j, _ in picked] == [0, 7, 9]  # indices cross the seam
    assert len(calls) == 3


def test_avix_truncation_fuzz():
    from streamsum_spark.operators.avi import encode_avix_mjpeg

    blob = encode_avix_mjpeg([_frames(2, h=8, w=8), _frames(2, h=8, w=8)], rate=10)
    for cut in range(0, len(blob), 11):
        try:
            decode_avi_frames(blob[:cut])
        except (ValueError, NotImplementedError, struct.error):
            pass


# --- round-12 regressions ----------------------------------------------------


def test_chunk_budget_scales_with_blob_size():
    """A long recording's chunk count (>65k — the OpenDML case the AVIX
    support targets) must not trip the hostile-input budget: one real
    DIB frame followed by 70,000 dropped (zero-length) frame chunks."""
    from streamsum_spark.operators.avi import (
        _avi_container,
        decode_avi_frames_at,
        _decode_dib_frame,
    )

    f = _frames(1, h=4, w=4)[0]
    stride = (4 * 3 + 3) & ~3
    dib = np.zeros((4, stride), np.uint8)
    dib[:, : 4 * 3] = f[::-1, :, ::-1].reshape(4, -1)
    payloads = [dib.tobytes()] + [b""] * 70_000
    blob = _avi_container(
        payloads, 4, 4, 25, 1, b"DIB ", b"\x00\x00\x00\x00", 24, b"00db"
    )
    p = probe_avi(blob)
    assert p["container"] == "avi" and p["tracks"][0]["handler"] == "vide"
    # selective decode touches only the covering frame
    out = decode_avi_frames_at(blob, [0])
    assert len(out) == 1 and (out[0][1] == f).all()


def test_dib_frame_with_jpeg_soi_bytes_not_misrouted():
    """A DIB '##db' frame whose bottom-left pixel stores B=0xFF, G=0xD8
    (the JPEG SOI bytes) must decode as DIB rows, not be sniffed into
    the MJPEG path."""
    src = _frames(2, h=8, w=8)
    for f in src:
        f[7, 0] = (10, 0xD8, 0xFF)  # RGB -> stored bottom-up BGR = FF D8 0A...
    blob = encode_avi_dib(src, rate=25)
    out = decode_avi_frames(blob)
    assert len(out) == 2
    for (_, _, px), f in zip(out, src):
        assert (px == f).all()


def test_dc_chunk_in_dib_stream_refuses():
    """Compressed ('dc') chunks in an uncompressed DIB stream are a
    malformation, not a sniffing opportunity."""
    from streamsum_spark.operators.avi import _avi_container

    blob = _avi_container(
        [b"\xff\xd8" + b"\x00" * 46], 4, 4, 25, 1,
        b"DIB ", b"\x00\x00\x00\x00", 24, b"00dc",
    )
    with pytest.raises(ValueError, match="dc"):
        decode_avi_frames(blob)
