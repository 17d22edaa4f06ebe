"""MJPEG-in-MP4: sample-table parsing (stts/stsc/stsz/stco), full and
selective frame decode, honest refusals for non-JPEG codecs, hostile-
input bounds, and the Spark sampled-extraction integration."""

import random
import struct

import numpy as np
import pytest

from streamsum_spark.operators.mp4_frames import (
    decode_mp4_frames,
    encode_mp4_mjpeg,
    iter_mp4_frames_at,
)


def _img(k, h=32, w=48):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 3 + k * 15) % 256, (yy * 5) % 256, ((xx + yy) * 2) % 256], -1
    ).astype(np.uint8)


def test_decode_tolerance_and_timing():
    src = [_img(k) for k in range(5)]
    out = decode_mp4_frames(encode_mp4_mjpeg(src, timescale=1000, delta=100))
    assert [(s, d) for s, d, _ in out] == [(i * 100, 100) for i in range(5)]
    for (_, _, px), f in zip(out, src):
        assert px.shape == f.shape
        assert np.abs(px.astype(int) - f.astype(int)).max() <= 8


def test_two_chunk_stsc_layout():
    # the fixture packs samples into TWO chunks — decoding all frames
    # correctly means the stsc run walk and per-chunk offset
    # accumulation are right (odd count: chunks of 3 and 2)
    src = [_img(k) for k in range(5)]
    out = decode_mp4_frames(encode_mp4_mjpeg(src))
    assert len(out) == 5
    for (_, _, px), f in zip(out, src):
        assert np.abs(px.astype(int) - f.astype(int)).max() <= 8


def test_nonuniform_timescale():
    # 30000/1001-style: timescale 30000, delta 1001
    src = [_img(k, h=16, w=16) for k in range(3)]
    out = decode_mp4_frames(encode_mp4_mjpeg(src, timescale=30000, delta=1001))
    assert [s for s, _, _ in out] == [0, 1001 * 1000 // 30000, 2 * 1001 * 1000 // 30000]


def test_selective_decode_only_selected(monkeypatch):
    from streamsum_spark.operators import multimodal as mm

    src = [_img(k, h=16, w=16) for k in range(20)]
    blob = encode_mp4_mjpeg(src, timescale=1000, delta=100)  # 2 s
    calls = []
    real = mm.decode_image
    monkeypatch.setattr(mm, "decode_image", lambda b: calls.append(1) or real(b))
    picked = list(iter_mp4_frames_at(blob, [0, 950, 1999]))
    assert [j for j, _ in picked] == [0, 9, 19]
    assert len(calls) == 3
    calls.clear()
    list(iter_mp4_frames_at(blob, [500, 540, 599]))  # same frame
    assert len(calls) == 1


def test_frames_at_dispatch_and_sampled_extraction(spark):
    from streamsum_spark.operators.multimodal import (
        extract_sampled_frames,
        frames_at,
    )
    from streamsum_spark.operators.video_probe import with_probed_duration

    src = [_img(k, h=16, w=16) for k in range(4)]
    blob = encode_mp4_mjpeg(src, timescale=1000, delta=500)  # 2 s @ 2 fps
    out = frames_at(blob, [0, 800, 1700])
    assert [j for j, _ in out] == [0, 1, 3]
    media = spark.createDataFrame(
        [(1, "video/mp4", None, bytearray(blob))],
        "media_id long, mime string, duration_ms long, content binary",
    )
    rows = extract_sampled_frames(with_probed_duration(media), every_ms=1000).collect()
    got = {r.frame_ts_ms: r for r in rows}
    assert set(got) == {0, 1000}
    assert all(r.decoded and (r.width, r.height) == (16, 16) for r in got.values())
    assert got[1000].frame_idx == 2


def test_avc1_refuses_with_codec_name():
    # a real-codec MP4 (the test_video_probe fixture declares avc1)
    from tests.test_video_probe import make_mp4

    with pytest.raises(NotImplementedError, match="avc1"):
        decode_mp4_frames(make_mp4())


def test_sample_outside_blob_refuses():
    src = [_img(k, h=8, w=8) for k in range(2)]
    blob = bytearray(encode_mp4_mjpeg(src))
    # truncate mdat: moov survives (it's at the end... so cut from the
    # middle): zero out a sample size beyond the blob instead
    i = bytes(blob).index(b"stco")
    # corrupt the first chunk offset to point past the end
    struct.pack_into(">I", blob, i + 8 + 4, len(blob) + 1000)
    with pytest.raises(ValueError, match="outside the blob"):
        decode_mp4_frames(bytes(blob))


def test_truncation_and_mutation_fuzz():
    src = [_img(k, h=8, w=8) for k in range(3)]
    blob = encode_mp4_mjpeg(src)
    for cut in range(0, len(blob), 9):
        try:
            decode_mp4_frames(blob[:cut])
        except (ValueError, NotImplementedError, struct.error):
            pass
    rng = random.Random(17)
    for _ in range(300):
        b = bytearray(blob)
        for _ in range(rng.randint(1, 4)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            decode_mp4_frames(bytes(b))
        except (ValueError, NotImplementedError, struct.error):
            pass


# --- PCM audio tracks ----------------------------------------------------------


def test_mov_pcm_audio_byte_exact():
    from streamsum_spark.operators.mp4_frames import decode_mp4_audio, encode_mov_pcm
    from streamsum_spark.operators.multimodal import decode_audio

    tone = (np.sin(np.arange(8001 * 2) * 0.05) * 12000).astype(np.int16).reshape(-1, 2)
    for codec in (b"sowt", b"twos"):
        blob = encode_mov_pcm(tone, 16000, codec)
        s, r = decode_mp4_audio(blob)
        assert r == 16000 and (s == tone).all()
        # decode_audio dispatches ftyp blobs here, so the audio prep
        # chain (downmix/resample/mel) works off MOV captures directly
        s2, r2 = decode_audio(blob)
        assert r2 == 16000 and (s2 == tone).all()


def test_mp4_aac_refuses_by_name():
    from streamsum_spark.operators.mp4_frames import decode_mp4_audio
    from tests.test_video_probe import make_mp4

    with pytest.raises(NotImplementedError, match="mp4a"):
        decode_mp4_audio(make_mp4())


def test_mov_pcm_feeds_resample_media(spark):
    from streamsum_spark.operators.audio_prep import resample_media
    from streamsum_spark.operators.mp4_frames import encode_mov_pcm

    tone = (np.sin(np.arange(16000) * 0.05) * 9000).astype(np.int16).reshape(-1, 1)
    blob = encode_mov_pcm(tone, 16000)
    media = spark.createDataFrame(
        [(1, bytearray(blob))], "media_id long, content binary"
    )
    (row,) = resample_media(media, out_rate=8000).collect()
    assert row.decoded and row.src_rate == 16000
