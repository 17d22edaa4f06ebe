"""Decode-free header probe: every field pinned against the in-repo
encoders (whose outputs the full decoders already verify), plus the
vendored real assets, truncation/mutation fuzz, and the Spark operator
with per-row isolation."""

import random
import struct
from pathlib import Path

import numpy as np
import pytest

from streamsum_spark.operators.media_probe import (
    probe_audio_header,
    probe_header,
    probe_image_header,
)

DATA = Path(__file__).parent / "data"


def _img(w=40, h=24):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(xx * 7) % 256, (yy * 11) % 256, (xx + yy) % 256], 2).astype(
        np.uint8
    )


def _tone(n=8000, ch=1):
    return (np.sin(np.arange(n * ch) * 0.05) * 9000).astype(np.int16).reshape(-1, ch)


# --- images -------------------------------------------------------------------


def test_bmp_pnm_headers():
    from streamsum_spark.operators.multimodal import encode_bmp, encode_ppm

    p = probe_image_header(encode_bmp(_img()))
    assert (p["format"], p["width"], p["height"], p["bit_depth"]) == ("bmp", 40, 24, 24)
    p = probe_image_header(encode_ppm(_img()))
    assert (p["format"], p["width"], p["height"], p["color_mode"]) == (
        "pnm", 40, 24, "rgb",
    )


def test_png_headers_and_apng_frames():
    from streamsum_spark.operators.multimodal import encode_apng, encode_png

    p = probe_image_header(encode_png(_img()))
    assert (p["format"], p["width"], p["height"], p["bit_depth"], p["color_mode"],
            p["n_frames"]) == ("png", 40, 24, 8, "rgb", 1)
    apng = encode_apng([_img(), _img(), _img()], [100, 100, 100])
    assert probe_image_header(apng)["n_frames"] == 3


def test_jpeg_headers():
    from streamsum_spark.operators.jpeg import encode_jpeg, encode_jpeg_progressive

    for enc in (encode_jpeg, encode_jpeg_progressive):
        p = probe_image_header(enc(_img()))
        assert (p["format"], p["width"], p["height"], p["bit_depth"],
                p["color_mode"]) == ("jpeg", 40, 24, 8, "ycbcr")
    p = probe_image_header(encode_jpeg(_img()[:, :, 0]))
    assert p["color_mode"] == "gray"
    # the vendored real JPEGs
    p = probe_image_header((DATA / "ext_baseline_color.jpg").read_bytes())
    assert p["format"] == "jpeg" and p["width"] > 0 and p["height"] > 0


def test_gif_headers_and_frame_count():
    from streamsum_spark.operators.gif import encode_gif, encode_gif_animated

    q = (_img() // 51) * 51
    p = probe_image_header(encode_gif(q))
    assert (p["format"], p["width"], p["height"], p["color_mode"], p["n_frames"]) == (
        "gif", 40, 24, "palette", 1,
    )
    anim = encode_gif_animated([q, q, q, q], [10, 10, 10, 10])
    assert probe_image_header(anim)["n_frames"] == 4


def test_webp_headers():
    from streamsum_spark.operators.vp8_encode import encode_webp_lossy
    from streamsum_spark.operators.webp import encode_webp_animated, encode_webp_lossless

    p = probe_image_header(encode_webp_lossless(_img(64, 32)))
    assert (p["format"], p["width"], p["height"]) == ("webp", 64, 32)
    p = probe_image_header(encode_webp_lossy(_img(64, 48), quality=80))
    assert (p["width"], p["height"]) == (64, 48)
    anim = encode_webp_animated([_img(16, 16), _img(16, 16)], [50, 50])
    p = probe_image_header(anim)
    assert p["n_frames"] == 2


def test_tiff_headers_and_page_count():
    from streamsum_spark.operators.tiff import encode_tiff

    p = probe_image_header(encode_tiff(_img(), compression="lzw"))
    assert (p["format"], p["width"], p["height"], p["bit_depth"],
            p["color_mode"], p["n_frames"]) == ("tiff", 40, 24, 8, "rgb", 1)
    # the vendored libtiff goldens parse too
    p = probe_image_header((DATA / "ext_lzw_libtiff_noise.tif").read_bytes())
    assert p["format"] == "tiff" and p["width"] > 0


def test_exif_orientation():
    from streamsum_spark.operators.jpeg import encode_jpeg
    from streamsum_spark.operators.tiff import encode_tiff

    # splice an APP1 Exif segment (orientation=6) right after SOI
    tiff = (
        b"II*\x00" + (8).to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + struct.pack("<HHI", 274, 3, 1) + struct.pack("<HH", 6, 0)
        + (0).to_bytes(4, "little")
    )
    app1 = b"Exif\x00\x00" + tiff
    j = encode_jpeg(_img())
    blob = j[:2] + b"\xff\xe1" + struct.pack(">H", 2 + len(app1)) + app1 + j[2:]
    p = probe_image_header(blob)
    assert p["orientation"] == 6 and (p["width"], p["height"]) == (40, 24)
    # no EXIF → null, not a default
    assert probe_image_header(j)["orientation"] is None
    # TIFF carries tag 274 directly
    p = probe_image_header(encode_tiff(_img(), orientation=5))
    assert p["orientation"] == 5


def test_jpeg_quality_estimate():
    from streamsum_spark.operators.jpeg import encode_jpeg

    # exact round-trip for the Annex-K encoder across the useful range
    for q in (10, 25, 50, 75, 90, 95):
        p = probe_image_header(encode_jpeg(_img(), quality=q))
        assert p["quality"] == q, (q, p["quality"])
    # real-world JPEG: plausible estimate, not a crash
    est = probe_image_header((DATA / "ext_baseline_color.jpg").read_bytes())["quality"]
    assert est is None or 1 <= est <= 100


def test_ico_headers():
    from streamsum_spark.operators.multimodal import encode_ico

    p = probe_image_header(encode_ico(_img(32, 32)))
    assert (p["format"], p["width"], p["height"]) == ("ico", 32, 32)


# --- audio --------------------------------------------------------------------


def test_wav_header():
    from streamsum_spark.operators.multimodal import encode_wav

    p = probe_audio_header(encode_wav(_tone(16000), 16000))
    assert (p["format"], p["sample_rate"], p["channels"], p["bits"],
            p["codec"]) == ("wav", 16000, 1, 16, "pcm")
    assert p["duration_ms"] == 1000


def test_flac_header():
    from streamsum_spark.operators.flac import encode_flac

    p = probe_audio_header(encode_flac(_tone(8000), 16000))
    assert (p["format"], p["sample_rate"], p["channels"], p["bits"]) == (
        "flac", 16000, 1, 16,
    )
    assert p["duration_ms"] == 500


def test_aiff_au_headers():
    from streamsum_spark.operators.multimodal import encode_aiff, encode_au

    p = probe_audio_header(encode_aiff(_tone(4000), 8000))
    assert (p["format"], p["sample_rate"], p["channels"], p["duration_ms"]) == (
        "aiff", 8000, 1, 500,
    )
    p = probe_audio_header(encode_au(_tone(4000), 8000))
    assert (p["format"], p["sample_rate"], p["duration_ms"]) == ("au", 8000, 500)


def test_mp3_header_real_stream():
    b = (DATA / "ext_mpeg2_l3.mp3").read_bytes()
    p = probe_audio_header(b)
    assert p["format"] == "mp3" and p["sample_rate"] > 0 and p["duration_ms"] > 0


def _ogg_page(serial, seq, granule, payload, htype=0):
    segs = []
    n = len(payload)
    while n >= 255:
        segs.append(255)
        n -= 255
    segs.append(n)
    return (
        b"OggS\x00" + bytes([htype])
        + granule.to_bytes(8, "little", signed=True)
        + serial.to_bytes(4, "little") + seq.to_bytes(4, "little")
        + b"\x00\x00\x00\x00" + bytes([len(segs)]) + bytes(segs) + payload
    )


def test_ogg_vorbis_header():
    ident = (b"\x01vorbis" + b"\x00" * 4 + bytes([2])
             + (44100).to_bytes(4, "little") + b"\x00" * 14)
    blob = (_ogg_page(7, 0, -1, ident, htype=2)
            + _ogg_page(7, 1, 44100, b"\x05" * 64, htype=4))
    p = probe_audio_header(blob)
    assert (p["format"], p["codec"], p["sample_rate"], p["channels"],
            p["duration_ms"]) == ("ogg", "vorbis", 44100, 2, 1000)


def test_ogg_opus_header():
    ident = (b"OpusHead\x01" + bytes([1]) + (312).to_bytes(2, "little")
             + (48000).to_bytes(4, "little") + b"\x00" * 3)
    blob = (_ogg_page(9, 0, -1, ident, htype=2)
            + _ogg_page(9, 1, 48000 + 312, b"\x05" * 64, htype=4))
    p = probe_audio_header(blob)
    assert (p["codec"], p["sample_rate"], p["channels"]) == ("opus", 48000, 1)
    assert p["duration_ms"] == 1000  # granule minus pre-skip


def test_ogg_unknown_codec_still_probes():
    blob = _ogg_page(3, 0, -1, b"\x7fFLAC..some..header", htype=2)
    p = probe_audio_header(blob)
    assert p["format"] == "ogg" and p["codec"] is None


def test_m4a_reports_audio_kind():
    # an MP4 whose only track is sound — the .m4a case
    from tests.test_video_probe import box, make_mp4, mvhd, trak

    m4a = (
        box(b"ftyp", b"M4A " + struct.pack(">I", 0) + b"M4A mp42")
        + box(b"moov", mvhd(1000, 5000, 0)
              + trak(1, 0, 0, b"soun", b"mp4a", 48000, 240000, "eng", 0))
    )
    p = probe_header(m4a)
    assert p["kind"] == "audio" and p["format"] == "mp4"
    assert p["duration_ms"] == 5000
    # the A/V fixture keeps kind video
    assert probe_header(make_mp4())["kind"] == "video"


# --- dispatch / video ---------------------------------------------------------


def test_probe_header_video_delegates():
    from streamsum_spark.operators.avi import encode_avi_mjpeg

    blob = encode_avi_mjpeg([_img(64, 48), _img(64, 48)], rate=4)
    p = probe_header(blob)
    assert (p["kind"], p["format"], p["width"], p["height"], p["duration_ms"]) == (
        "video", "avi", 64, 48, 500,
    )


def test_probe_header_kinds():
    from streamsum_spark.operators.multimodal import encode_bmp, encode_wav

    assert probe_header(encode_bmp(_img()))["kind"] == "image"
    assert probe_header(encode_wav(_tone(), 8000))["kind"] == "audio"
    with pytest.raises(ValueError):
        probe_header(b"\x00" * 64)


# --- probe never decodes ------------------------------------------------------


def test_probe_reads_headers_only():
    # a PNG whose IDAT is garbage still probes (nothing decodes it);
    # the full decoder would refuse
    from streamsum_spark.operators.multimodal import decode_image, encode_png

    blob = bytearray(encode_png(_img()))
    i = bytes(blob).index(b"IDAT")
    for j in range(i + 4, min(i + 40, len(blob) - 8)):
        blob[j] ^= 0xA5
    p = probe_image_header(bytes(blob))
    assert (p["width"], p["height"]) == (40, 24)
    with pytest.raises(ValueError):
        decode_image(bytes(blob))


# --- hostile input ------------------------------------------------------------


def test_truncation_fuzz():
    from streamsum_spark.operators.flac import encode_flac
    from streamsum_spark.operators.gif import encode_gif
    from streamsum_spark.operators.jpeg import encode_jpeg
    from streamsum_spark.operators.multimodal import encode_png, encode_wav
    from streamsum_spark.operators.tiff import encode_tiff

    goods = [
        encode_png(_img(16, 16)), encode_jpeg(_img(16, 16)),
        encode_gif((_img(16, 16) // 51) * 51), encode_tiff(_img(16, 16)),
        encode_wav(_tone(400), 8000), encode_flac(_tone(400), 8000),
    ]
    for g in goods:
        for cut in range(0, len(g), 5):
            try:
                probe_header(g[:cut])
            except (ValueError, NotImplementedError, struct.error):
                pass


def test_mutation_fuzz():
    from streamsum_spark.operators.gif import encode_gif_animated
    from streamsum_spark.operators.multimodal import encode_png
    from streamsum_spark.operators.tiff import encode_tiff

    q = (_img(16, 16) // 51) * 51
    rng = random.Random(5)
    goods = [
        encode_png(_img(16, 16)),
        encode_gif_animated([q, q], [10, 10]),
        encode_tiff(_img(16, 16)),
    ]
    for _ in range(400):
        b = bytearray(rng.choice(goods))
        for _ in range(rng.randint(1, 4)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            probe_header(bytes(b))
        except (ValueError, NotImplementedError, struct.error):
            pass


# --- Spark operator -----------------------------------------------------------


def test_probe_media_headers(spark):
    from streamsum_spark.operators.avi import encode_avi_mjpeg
    from streamsum_spark.operators.flac import encode_flac
    from streamsum_spark.operators.media_probe import probe_media_headers
    from streamsum_spark.operators.multimodal import encode_png, encode_wav

    rows = [
        (1, bytearray(encode_png(_img()))),
        (2, bytearray(encode_wav(_tone(16000), 16000))),
        (3, bytearray(encode_flac(_tone(8000), 16000))),
        (4, bytearray(encode_avi_mjpeg([_img(64, 48)] * 2, rate=4))),
        (5, bytearray(b"garbage" * 10)),
        (6, None),
    ]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r.media_id: r for r in probe_media_headers(media).collect()}
    assert got[1].kind == "image" and (got[1].width, got[1].height) == (40, 24)
    assert got[2].kind == "audio" and got[2].duration_ms == 1000
    assert got[3].format == "flac" and got[3].sample_rate == 16000
    assert got[4].kind == "video" and got[4].duration_ms == 500
    assert not got[5].probed and got[5].kind is None
    assert not got[6].probed
    # the typed facts filter without decode: the "keep >= 32x32" rule
    big = probe_media_headers(media).where("width >= 32 and height >= 32")
    assert {r.media_id for r in big.collect()} == {4}
