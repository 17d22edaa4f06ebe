"""Multimodal plumbing: real stdlib decode (BMP/PNM/WAV), Arrow batch flow,
deterministic features, honest codec stubs."""

from __future__ import annotations

import os

import numpy as np
import pytest

from streamsum_spark.operators import multimodal as mm


def _gradient(w: int, h: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(xx * 5) % 256, (yy * 9) % 256, (xx + yy) % 256], axis=2).astype(np.uint8)


def test_bmp_roundtrip_pixel_exact():
    # non-multiple-of-4 width exercises row padding; bottom-up flip
    px = _gradient(13, 7)
    assert np.array_equal(mm.decode_image(mm.encode_bmp(px)), px)


def test_ppm_roundtrip_pixel_exact_with_comment_header():
    px = _gradient(16, 9)
    blob = mm.encode_ppm(px)
    assert b"#" in blob[:40]  # comment line present and skipped by parser
    assert np.array_equal(mm.decode_image(blob), px)


def test_ascii_pgm_decodes_and_replicates_gray_to_rgb():
    raster = " ".join(str((3 * i) % 256) for i in range(12))
    blob = ("P2\n# c\n4 3\n255\n" + raster + "\n").encode()
    px = mm.decode_image(blob)
    assert px.shape == (3, 4, 3)
    assert np.array_equal(px[:, :, 0], px[:, :, 2])
    assert px[0, 1, 0] == 3


def test_wav_roundtrip_sample_exact():
    tone = (1000 * np.sin(np.arange(800) / 10.0)).astype(np.int16)
    samples, rate = mm.decode_audio(mm.encode_wav(tone, rate=8000))
    assert rate == 8000 and samples.shape == (800, 1)
    assert np.array_equal(samples[:, 0], tone)


def test_extract_features_real_stats_default_path(spark):
    media = mm.synthetic_media(spark, n=33)
    rows = {r.media_id: r for r in mm.extract_features(media).collect()}
    assert len(rows) == 33
    # everything on the default path really decodes EXCEPT the
    # deliberately-present MPEG-audio rows (round 9): those exercise the
    # honest-refusal quarantine inside the default mix — decoded=false
    # fingerprint rows, exactly what a real crawl's MP3s produce
    mpeg_ids = {r.media_id for r in media.collect() if r.mime == "audio/mpeg"}
    assert mpeg_ids and all(
        r.decoded != (i in mpeg_ids) for i, r in rows.items()
    )
    assert all(len(r.feature) == 8 for r in rows.values())
    assert all(r.content_sha and len(r.content_sha) == 64 for r in rows.values())
    # image rows carry real dimensions; audio rows carry channel count
    img = rows[0]
    assert (img.width, img.height, img.channels) == (16, 8, 3)
    wav = rows[2]
    assert wav.channels == 1 and wav.width is None
    # pixel stats are the REAL means: check one image against numpy
    media0 = [r for r in media.collect() if r.media_id == 0][0]
    px = mm.decode_image(media0.content)
    assert rows[0].feature[0] == pytest.approx(px[:, :, 0].mean() / 255.0, abs=1e-6)
    # deterministic across runs
    again = {r.media_id: r for r in mm.extract_features(media).collect()}
    assert all(rows[i].feature == again[i].feature for i in rows)


def test_extract_features_codec_fallback_flagged(spark):
    rows = [(1, "image/png", None, None, None, b"\x89PNG\r\n\x1a\n" + bytes(64))]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = mm.extract_features(media).collect()[0]
    assert out.decoded is False and out.width is None
    assert len(out.feature) == 8  # fingerprint fallback, not a crash


def test_metadata_predicates_prune_without_touching_blobs(spark):
    media = mm.synthetic_media(spark, n=33)
    # the kind-0 slot cycles BMP / ICO / WebP (lossless + lossy) plus,
    # since round 9, animated GIF/WebP on some former-BMP slots
    imgs = media.where(
        mm.F.col("mime").isin(
            "image/bmp", "image/webp", "image/x-icon", "image/gif"
        )
    ).select("media_id", "width")
    assert imgs.count() == 11
    assert media.where(mm.F.col("mime") == "image/webp").count() >= 5


def test_frame_sample_plan(spark):
    media = mm.synthetic_media(spark, n=15)
    plan = mm.frame_sample_plan(media, every_ms=1000)
    counts = {r.media_id: r["count"] for r in plan.groupBy("media_id").count().collect()}
    # only audio rows have durations; durations cycle with media_id
    assert set(counts) == {2, 5, 8, 11, 14}
    assert counts[2] == 3 and counts[5] == 6


def test_decode_is_honest_stub_for_codecs():
    # baseline AND progressive JPEG are real decodes (operators/jpeg.py);
    # the modes a DCT Huffman decoder cannot serve stay honestly
    # unsupported (arithmetic coding needs the MQ coder, a separate spec)
    import struct as st

    sof = st.pack(">BHHB", 8, 2, 2, 1) + bytes([1, 0x11, 0])
    arithmetic = (
        b"\xff\xd8" + b"\xff\xc9" + st.pack(">H", 2 + len(sof)) + sof + b"\xff\xd9"
    )
    with pytest.raises(NotImplementedError, match="arithmetic"):
        mm.decode_image(arithmetic)
    # a VALID MPEG stream refuses spectral decode honestly (mp3.py's
    # documented B.7 rationale); an ID3 tag with NO frames behind it is
    # malformed input, so it ValueErrors instead (round 9: MP3 routing
    # now parses framing before refusing)
    with pytest.raises(NotImplementedError, match="B.7"):
        hdr = (0x7FF << 21 | 3 << 19 | 1 << 17 | 1 << 16 | 10 << 12
               | 2 << 10 | 3 << 6).to_bytes(4, "big")
        mm.decode_audio(hdr + bytes(716))
    with pytest.raises(ValueError):
        mm.decode_audio(b"ID3\x04" + bytes(32))
    # spec-ILLEGAL depth/color combos still refuse (16-bit and palette
    # are now real decodes — see the palette/16-bit/Adam7 tests)
    import struct as st
    import zlib

    def png_with_ihdr(depth, ctype):
        ihdr = st.pack(">IIBBBBB", 2, 2, depth, ctype, 0, 0, 0)
        chunk = st.pack(">I", len(ihdr)) + b"IHDR" + ihdr + st.pack(
            ">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF
        )
        idat = st.pack(">I", 0) + b"IDAT" + st.pack(">I", zlib.crc32(b"IDAT"))
        return b"\x89PNG\r\n\x1a\n" + chunk + idat
    with pytest.raises(NotImplementedError):
        mm.decode_image(png_with_ihdr(4, 2))  # sub-byte RGB is not legal
    with pytest.raises(NotImplementedError):
        mm.decode_image(png_with_ihdr(16, 3))  # 16-bit palette is not legal
    # palette PNG without a PLTE fails loudly, never fake-decodes
    with pytest.raises(ValueError, match="PLTE"):
        mm.decode_image(png_with_ihdr(8, 3))


def test_bmp_32bit_decode():
    """BI_RGB 32-bit (BGRA on disk): alpha drops, channels map to RGB."""
    import struct

    w, h = 3, 2
    px = _gradient(w, h)
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        row = b""
        for x in range(w):
            r, g, b = (int(v) for v in px[y, x])
            row += bytes((b, g, r, 255))
        rows.append(row)  # stride w*4 is already 4-byte aligned
    data = b"".join(rows)
    blob = (
        struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 32, 0, len(data), 0, 0, 0, 0)
        + data
    )
    assert np.array_equal(mm.decode_image(blob), px)


def test_roundtrips_property_based():
    """Hypothesis: encode->decode is pixel/sample-exact for arbitrary
    sizes (including width padding edge cases) and contents."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 37),
        h=st.integers(1, 17),
        seed=st.integers(0, 2**31 - 1),
        fmt=st.sampled_from(["bmp", "ppm"]),
    )
    def roundtrip_img(w, h, seed, fmt):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        blob = mm.encode_bmp(px) if fmt == "bmp" else mm.encode_ppm(px)
        assert np.array_equal(mm.decode_image(blob), px)

    @settings(max_examples=10, deadline=None)
    @given(
        n=st.integers(1, 2000),
        nch=st.integers(1, 2),
        seed=st.integers(0, 2**31 - 1),
    )
    def roundtrip_wav(n, nch, seed):
        rng = np.random.default_rng(seed)
        samples = rng.integers(-32768, 32768, size=(n, nch), dtype=np.int16)
        got, rate = mm.decode_audio(mm.encode_wav(samples, rate=16000))
        assert rate == 16000 and np.array_equal(got, samples)

    roundtrip_img()
    roundtrip_wav()


def test_truncated_wav_falls_back_not_task_failure(spark):
    """A RIFF/WAVE blob truncated inside the fmt chunk must not raise out
    of the Arrow batch (one bad blob would fail the whole task): decode
    raises ValueError and extract_features falls back to the fingerprint
    path with decoded=false (ADVICE r4)."""
    import pytest

    good = mm.encode_wav(np.zeros((100, 1), dtype=np.int16), rate=8000)
    bad = good[:20]  # RIFF/WAVE magic intact, fmt chunk truncated
    with pytest.raises((ValueError, NotImplementedError)):
        mm.decode_audio(bad)

    media = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(bad))], "media_id long, content binary"
    )
    rows = {r.media_id: r for r in mm.extract_features(media).collect()}
    assert rows[1].decoded is True
    assert rows[2].decoded is False and len(rows[2].feature) == 8


def test_png_roundtrip_all_filters():
    """PNG decode is exact for every row-filter type and supported color
    type: encode (forward filter) -> decode (inverse) recovers the
    pixels bit-for-bit.  Alpha channels drop to RGB on decode."""
    rng = np.random.default_rng(11)
    for f in range(5):
        px = rng.integers(0, 256, size=(9, 13, 3), dtype=np.uint8)
        assert np.array_equal(mm.decode_image(mm.encode_png(px, filter_type=f)), px), f
    # grayscale replicates to 3 channels
    g = rng.integers(0, 256, size=(5, 7), dtype=np.uint8)
    got = mm.decode_image(mm.encode_png(g, filter_type=4, color_type=0))
    assert np.array_equal(got, np.repeat(g[:, :, None], 3, axis=2))
    # RGBA drops alpha
    rgba = rng.integers(0, 256, size=(4, 6, 4), dtype=np.uint8)
    got = mm.decode_image(mm.encode_png(rgba, filter_type=3, color_type=6))
    assert np.array_equal(got, rgba[:, :, :3])


def test_png_roundtrip_property():
    """Property-based: any 8-bit RGB image survives encode->decode for a
    randomly chosen filter type."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 23),
        h=st.integers(1, 11),
        f=st.integers(0, 4),
        seed=st.integers(0, 2**31 - 1),
    )
    def roundtrip(w, h, f, seed):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(mm.decode_image(mm.encode_png(px, filter_type=f)), px)

    roundtrip()


def test_synthetic_media_pngs_decode_on_default_path(spark):
    """The default pipeline path now decodes PNG for real: synthetic_media
    includes PNGs across all five filters and extract_features reports
    decoded=true with REAL pixel stats for them."""
    media = mm.synthetic_media(spark, n=64)
    pngs = {r.media_id for r in media.where("mime = 'image/png'").collect()}
    assert len(pngs) >= 10
    rows = {r.media_id: r for r in mm.extract_features(media).collect()}
    assert all(rows[i].decoded for i in pngs)
    one = sorted(pngs)[0]
    blob = [r.content for r in media.collect() if r.media_id == one][0]
    px = mm.decode_image(blob)
    assert rows[one].feature[0] == pytest.approx(px[:, :, 0].mean() / 255.0, abs=1e-6)


def test_png_hostile_headers_fail_bounded(spark):
    """Malformed or hostile PNGs must raise ValueError (the fingerprint-
    fallback signal) with BOUNDED memory — a deflate bomb or a giant
    claimed geometry cannot blow an executor inside an Arrow batch."""
    import struct as st
    import zlib

    def chunk(typ, data):
        return st.pack(">I", len(data)) + typ + data + st.pack(">I", zlib.crc32(typ + data))

    sig = b"\x89PNG\r\n\x1a\n"
    # 1) hostile geometry: 100k x 100k RGB claims ~30 GB of scanlines
    ihdr = chunk(b"IHDR", st.pack(">IIBBBBB", 100_000, 100_000, 8, 2, 0, 0, 0))
    bomb = sig + ihdr + chunk(b"IDAT", zlib.compress(b"\x00" * 1000)) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="cap"):
        mm.decode_image(bomb)
    # 2) corrupt deflate stream: zlib.error must surface as ValueError so
    # extract_features falls back instead of failing the task
    ihdr2 = chunk(b"IHDR", st.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
    corrupt = sig + ihdr2 + chunk(b"IDAT", b"\xff\xfe\xfd\xfc") + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="deflate"):
        mm.decode_image(corrupt)
    # 3) in-cap geometry whose IDAT inflates to fewer bytes than claimed
    short = sig + ihdr2 + chunk(b"IDAT", zlib.compress(b"\x00" * 5)) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="truncated"):
        mm.decode_image(short)
    # the fallback contract end-to-end: hostile blobs fingerprint
    # (decoded=false), the task never fails
    media = spark.createDataFrame(
        [(i, blob) for i, blob in enumerate((bomb, corrupt, short))],
        "media_id long, content binary",
    )
    rows = mm.extract_features(media).collect()
    assert len(rows) == 3 and all(not r.decoded for r in rows)


def test_bmp_pnm_negative_dimensions_fail_loudly():
    """Negative/zero dims in BMP or PNM headers must raise ValueError —
    numpy treats a negative reshape dim as "infer" and frombuffer(-1) as
    "whole buffer", so unguarded they decode garbage instead of failing."""
    import struct as st

    def bmp(w, h):
        hdr = b"BM" + st.pack("<IHHI", 54 + 12, 0, 0, 54)
        hdr += st.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, 12, 0, 0, 0, 0)
        return hdr + b"\x00" * 12

    with pytest.raises(ValueError, match="dimensions"):
        mm.decode_image(bmp(-1, 4))
    with pytest.raises(ValueError, match="dimensions"):
        mm.decode_image(bmp(0, 4))
    with pytest.raises(ValueError, match="dimensions"):
        mm.decode_image(b"P5\n-1 1\n255\n" + b"\x00" * 64)
    with pytest.raises(ValueError, match="dimensions"):
        mm.decode_image(b"P6\n2 -3\n255\n" + b"\x00" * 64)


def test_png_unfilter_vectorized_paths_and_cpu_cap():
    """The unfilter rewrite (vectorized sub cumsum, list-walk average/
    paeth) must stay pixel-exact at non-trivial sizes, and the decoded-
    scanline cap must stay small: average/paeth rows walk pixels in
    Python, so the cap bounds worst-case decode TIME as well as memory —
    raising it without re-vectorizing reopens the CPU-amplification
    vector."""
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(64, 200, 3), dtype=np.uint8)
    for f in (1, 3, 4):
        assert np.array_equal(mm.decode_image(mm.encode_png(px, filter_type=f)), px), f
    assert mm._PNG_MAX_RAW_BYTES <= 16 << 20


def _png_chunk(typ, data):
    import struct as st
    import zlib

    return st.pack(">I", len(data)) + typ + data + st.pack(
        ">I", zlib.crc32(typ + data) & 0xFFFFFFFF
    )


def _png_blob(w, h, depth, ctype, interlace, raw, plte=None):
    import struct as st
    import zlib

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = _png_chunk(b"IHDR", st.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace))
    body = ihdr
    if plte is not None:
        body += _png_chunk(b"PLTE", plte)
    body += _png_chunk(b"IDAT", zlib.compress(bytes(raw))) + _png_chunk(b"IEND", b"")
    return sig + body


def test_png_palette_decodes_through_plte():
    """PLTE-indexed PNG (color type 3), 8-bit and 4-bit indices: decoded
    pixels are the palette entries, not the raw indices."""
    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(5, 7), dtype=np.uint8)
    # 8-bit indices, filter 0 rows
    raw8 = bytearray()
    for y in range(5):
        raw8.append(0)
        raw8 += idx[y].tobytes()
    got8 = mm.decode_image(_png_blob(7, 5, 8, 3, 0, raw8, plte=pal.tobytes()))
    assert np.array_equal(got8, pal[idx])
    # 4-bit indices: two per byte, high nibble first, row-padded
    raw4 = bytearray()
    for y in range(5):
        raw4.append(0)
        row = idx[y]
        for i in range(0, 7, 2):
            hi = int(row[i])
            lo = int(row[i + 1]) if i + 1 < 7 else 0
            raw4.append((hi << 4) | lo)
    got4 = mm.decode_image(_png_blob(7, 5, 4, 3, 0, raw4, plte=pal.tobytes()))
    assert np.array_equal(got4, pal[idx])
    # out-of-range index fails loudly (short palette)
    with pytest.raises(ValueError, match="palette index"):
        mm.decode_image(_png_blob(7, 5, 8, 3, 0, raw8, plte=pal[:8].tobytes()))


def test_png_sub_byte_gray_rescales():
    """1- and 4-bit grayscale: packed high-bit-first, sample values
    rescale to the full 0..255 range."""
    # 1-bit: 10 px wide -> 2 bytes/row, pattern 1010101010
    raw1 = bytearray()
    for _ in range(3):
        raw1.append(0)
        raw1 += bytes([0b10101010, 0b10000000])
    got = mm.decode_image(_png_blob(10, 3, 1, 0, 0, raw1))
    row = got[0, :, 0]
    assert list(row) == [255, 0] * 5
    assert np.array_equal(got[:, :, 0], got[:, :, 1])
    # 4-bit: values 0..15 rescale v*255//15
    vals = np.arange(8, dtype=np.uint8).reshape(1, 8)
    raw4 = bytearray([0])
    for i in range(0, 8, 2):
        raw4.append((int(vals[0, i]) << 4) | int(vals[0, i + 1]))
    got4 = mm.decode_image(_png_blob(8, 1, 4, 0, 0, raw4))
    assert list(got4[0, :, 0]) == [v * 255 // 15 for v in range(8)]


def test_png_16bit_keeps_high_byte():
    """16-bit RGB: big-endian sample pairs downconvert to the high byte."""
    rng = np.random.default_rng(5)
    hi = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    lo = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    raw = bytearray()
    for y in range(4):
        raw.append(0)
        for x in range(6):
            for c in range(3):
                raw += bytes([int(hi[y, x, c]), int(lo[y, x, c])])
    got = mm.decode_image(_png_blob(6, 4, 16, 2, 0, raw))
    assert np.array_equal(got, hi)


def _adam7_raw(px, filter_type=0):
    """Adam7-interlaced scanlines for an (h, w, 3) image: seven filtered
    sub-images; supports filter 0 (none) and 2 (up) for fixtures."""
    h, w = px.shape[:2]
    raw = bytearray()
    for x0, y0, dx, dy in mm._ADAM7:
        sub = px[y0::dy, x0::dx]
        ph, pw = sub.shape[:2]
        if not ph or not pw:
            continue
        flat = sub.reshape(ph, pw * 3).astype(np.int32)
        prev = np.zeros(pw * 3, dtype=np.int32)
        for y in range(ph):
            raw.append(filter_type)
            filt = flat[y] if filter_type == 0 else (flat[y] - prev) % 256
            raw += filt.astype(np.uint8).tobytes()
            prev = flat[y]
    return raw


@pytest.mark.parametrize("ft", [0, 2])
def test_png_adam7_interlace_roundtrips(ft):
    """Adam7: seven passes re-assemble on their stride grids, pixel-exact,
    with per-pass row filtering honored."""
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(13, 9, 3), dtype=np.uint8)
    got = mm.decode_image(_png_blob(9, 13, 8, 2, 1, _adam7_raw(px, ft)))
    assert np.array_equal(got, px)
    # tiny images where some passes are empty
    small = rng.integers(0, 256, size=(3, 2, 3), dtype=np.uint8)
    got2 = mm.decode_image(_png_blob(2, 3, 8, 2, 1, _adam7_raw(small, ft)))
    assert np.array_equal(got2, small)


# ---------------------------------------------------------------------------
# baseline JPEG (operators/jpeg.py — written from ITU-T T.81, no codec libs)
# ---------------------------------------------------------------------------


def _jpeg_gradient(h=37, w=53):
    x = np.linspace(0, 255, w)[None, :] * np.ones((h, 1))
    y = np.linspace(0, 255, h)[:, None] * np.ones((1, w))
    return np.dstack([x, y, (x + y) / 2]).astype(np.uint8)


@pytest.mark.parametrize("sub", [(1, 1), (2, 2), (2, 1), (1, 2)])
@pytest.mark.parametrize("ri", [0, 3])
def test_jpeg_roundtrip_subsampling_and_restarts(sub, ri):
    """Every subsampling mode (4:4:4 / 4:2:0 / 4:2:2 / 4:4:0) and the
    restart-interval path roundtrip a smooth gradient within JPEG's lossy
    tolerance at quality 95 — odd dimensions exercise MCU padding/crop."""
    from streamsum_spark.operators import jpeg

    px = _jpeg_gradient()
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=95, subsampling=sub,
                                            restart_interval=ri))
    assert out.shape == px.shape
    err = np.abs(out.astype(int) - px.astype(int))
    assert err.max() <= 10 and err.mean() <= 2.5


def test_jpeg_grayscale_roundtrip():
    from streamsum_spark.operators import jpeg

    g = _jpeg_gradient()[:, :, 0]
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=95))
    assert out.shape == (*g.shape, 3)
    # gray replicates across channels and tracks the input
    assert np.array_equal(out[:, :, 0], out[:, :, 1])
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).max() <= 4


def test_jpeg_hostile_inputs_fail_bounded():
    """Header-declared dims are capped before allocation; malformed
    structure raises ValueError (never a stray KeyError/IndexError the
    batch decode loop would not catch); unsupported modes refuse."""
    import struct as st

    from streamsum_spark.operators import jpeg

    # dimension bomb: 60000 x 60000 declared in a ~30-byte file
    sof = st.pack(">BHHB", 8, 60000, 60000, 1) + bytes([1, 0x11, 0])
    bomb = b"\xff\xd8\xff\xc0" + st.pack(">H", 2 + len(sof)) + sof + b"\xff\xd9"
    with pytest.raises(ValueError, match="decode cap"):
        jpeg.decode_jpeg(bomb)
    # truncated scan: valid headers, entropy data cut off
    full = jpeg.encode_jpeg(_jpeg_gradient(), quality=80)
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(full[: len(full) * 2 // 3])
    # 12-bit precision refuses
    sof12 = st.pack(">BHHB", 12, 2, 2, 1) + bytes([1, 0x11, 0])
    with pytest.raises(NotImplementedError, match="12-bit"):
        jpeg.decode_jpeg(
            b"\xff\xd8\xff\xc0" + st.pack(">H", 2 + len(sof12)) + sof12
        )
    # arbitrary garbage after SOI: ValueError, not a crash
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(b"\xff\xd8" + bytes(40))


def test_jpeg_mutation_fuzz_never_escapes_valueerror():
    """Single-byte corruptions of a valid JPEG either still decode or
    raise ValueError/NotImplementedError — the contract extract_features
    relies on (one bad blob falls back to fingerprint, never fails the
    Arrow batch)."""
    from streamsum_spark.operators import jpeg

    blob = bytearray(jpeg.encode_jpeg(_jpeg_gradient(16, 24), quality=85))
    rng = np.random.RandomState(7)
    for _ in range(40):
        i = int(rng.randint(2, len(blob) - 2))
        mut = bytearray(blob)
        mut[i] ^= 1 << int(rng.randint(8))
        try:
            out = jpeg.decode_jpeg(bytes(mut))
            assert out.dtype == np.uint8 and out.ndim == 3
        except (ValueError, NotImplementedError):
            pass


def test_jpeg_through_extract_features(spark):
    """synthetic_media now includes JPEGs (4:4:4 and 4:2:0); they decode
    on the default Arrow path with real pixel stats."""
    media = mm.synthetic_media(spark, n=64)
    jpegs = {r.media_id for r in media.where("mime = 'image/jpeg'").collect()}
    assert len(jpegs) >= 4
    rows = {r.media_id: r for r in mm.extract_features(media).collect()}
    assert all(rows[i].decoded for i in jpegs)
    one = sorted(jpegs)[0]
    blob = [r.content for r in media.collect() if r.media_id == one][0]
    px = mm.decode_image(blob)
    assert rows[one].feature[0] == pytest.approx(px[:, :, 0].mean() / 255.0, abs=1e-6)


# ---------------------------------------------------------------------------
# GIF (operators/gif.py — GIF89a spec LZW, no codec libs)
# ---------------------------------------------------------------------------


def _gif_px(h=23, w=31, ncolors=64, seed=3):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(ncolors, 3), dtype=np.uint8)
    return pal[rng.integers(0, ncolors, size=(h, w))]


@pytest.mark.parametrize("interlace", [False, True])
def test_gif_roundtrip_pixel_exact(interlace):
    """GIF is lossless: encode->decode is pixel-exact, interlaced or not."""
    from streamsum_spark.operators import gif

    px = _gif_px()
    out = gif.decode_gif(gif.encode_gif(px, interlace=interlace))
    assert np.array_equal(out, px)


def test_gif_real_lzw_with_dictionary_growth():
    """The fixture encoder emits literal codes only; a REAL LZW stream
    (growing dictionary, code-width bumps at 512/1024/..., the KwKwK
    self-reference) must decode identically — compressor written here
    from the spec to cross-check the decoder's growth path."""
    from streamsum_spark.operators import gif

    px = _gif_px(h=40, w=40, ncolors=8, seed=9)  # repetitive -> real growth
    flat = px.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    seq = [int(v) for v in inverse]

    min_code = 8  # encode with 8-bit roots like the fixture
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    table = {(c,): c for c in range(1 << min_code)}
    next_code, width = eoi + 1, min_code + 1
    acc = nbits = 0
    out = bytearray()

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    run = (seq[0],)
    for v in seq[1:]:
        if run + (v,) in table:
            run = run + (v,)
            continue
        emit(table[run])
        if next_code < 4096:
            table[run + (v,)] = next_code
            next_code += 1
            # interop convention (giflib): the code that FILLS the table
            # is still emitted at the old width; widen for the next one
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        run = (v,)
    emit(table[run])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)

    pal = np.zeros((256, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    import struct as st

    blob = bytearray(b"GIF89a")
    blob += st.pack("<HHBBB", 40, 40, 0x87, 0, 0) + pal.tobytes()
    blob += b"\x2c" + st.pack("<HHHHB", 0, 0, 40, 40, 0) + bytes([min_code])
    for off in range(0, len(out), 255):
        chunk = out[off : off + 255]
        blob += bytes([len(chunk)]) + chunk
    blob += b"\x00\x3b"
    assert len(out) < len(seq)  # the stream really compressed (dict grew)
    got = gif.decode_gif(bytes(blob))
    assert np.array_equal(got, px)


def test_gif_hostile_inputs_fail_bounded():
    from streamsum_spark.operators import gif
    import struct as st

    bomb = (
        b"GIF89a" + st.pack("<HHBBB", 60000, 60000, 0, 0, 0)
        + b"\x2c" + st.pack("<HHHHB", 0, 0, 60000, 60000, 0)
    )
    with pytest.raises(ValueError, match="decode cap"):
        gif.decode_gif(bomb)
    full = gif.encode_gif(_gif_px())
    with pytest.raises(ValueError):
        gif.decode_gif(full[: len(full) // 2])
    with pytest.raises(ValueError):
        gif.decode_gif(b"GIF89a" + bytes(20))
    # mutation fuzz: ValueError or a successful bounded decode, never else
    rng = np.random.RandomState(11)
    blob = bytearray(full)
    for _ in range(40):
        mut = bytearray(blob)
        i = int(rng.randint(6, len(mut)))
        mut[i] ^= 1 << int(rng.randint(8))
        try:
            out = gif.decode_gif(bytes(mut))
            assert out.dtype == np.uint8 and out.ndim == 3
        except (ValueError, NotImplementedError):
            pass


def test_gif_through_extract_features(spark):
    from streamsum_spark.operators import gif

    px = _gif_px(h=12, w=18, ncolors=32, seed=5)
    blob = gif.encode_gif(px)
    media = spark.createDataFrame(
        [(1, "image/gif", 18, 12, None, blob)], mm.MEDIA_SCHEMA
    )
    out = mm.extract_features(media).collect()[0]
    assert out.decoded and (out.width, out.height) == (18, 12)
    assert out.feature[0] == pytest.approx(px[:, :, 0].mean() / 255.0, abs=1e-6)


# ---------------------------------------------------------------------------
# WAV codec breadth: G.711 A-law / mu-law, IMA ADPCM (spec-built, no libs)
# ---------------------------------------------------------------------------


def _wav_blob(data: bytes, audio_fmt: int, bits: int, nch=1, rate=8000, block_align=None):
    import struct as st

    ba = block_align if block_align is not None else nch * max(1, bits // 8)
    return (
        b"RIFF" + st.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + st.pack("<I", 16)
        + st.pack("<HHIIHH", audio_fmt, nch, rate, rate * ba, ba, bits)
        + b"data" + st.pack("<I", len(data)) + data
    )


@pytest.mark.parametrize("law,tag", [("mu", 7), ("alaw", 6)])
def test_g711_encode_of_decode_is_identity(law, tag):
    """The strong no-reference check: G.711 is a bijection from the 256
    codes onto its quantized magnitudes, so compressing each code's
    DECODED value (compressor written here from the spec) must return
    the original code — and the WAV path routes tags 6/7 through it."""
    from streamsum_spark.operators import multimodal as mmx

    decoded = mmx._decode_g711(bytes(range(256)), law).astype(np.int32)

    def mu_encode(x):
        BIAS, CLIP = 0x84, 32635
        s = 0x80 if x < 0 else 0
        x = min(abs(int(x)), CLIP) + BIAS
        exp = 7
        for e in range(7, -1, -1):
            if x & (0x4000 >> (7 - e)):
                exp = e
                break
        mant = (x >> (exp + 3)) & 0x0F
        return ~(s | (exp << 4) | mant) & 0xFF

    def alaw_encode(x):
        s = 0x80 if x >= 0 else 0
        x = min(abs(int(x)), 32767) >> 4  # 12-bit magnitude (<<4 in decode)
        if x < 16:
            code = x
        else:
            exp = x.bit_length() - 5
            mant = (x >> exp) & 0x0F
            code = ((exp + 1) << 4) | mant
        return (s | code) ^ 0x55

    enc = mu_encode if law == "mu" else alaw_encode
    for code in range(256):
        if law == "mu" and code == 0x7F:
            continue  # negative zero: 0x7F and 0xFF both decode to 0, and
            # the compressor canonically returns 0xFF for 0
        assert enc(decoded[code]) == code, (law, code, decoded[code])
    # and through the WAV container
    samples, rate = mmx.decode_audio(_wav_blob(bytes(range(256)), tag, 8))
    assert rate == 8000 and np.array_equal(samples[:, 0], decoded.astype(np.int16))


def test_ima_adpcm_tracks_the_signal():
    """IMA ADPCM is lossy: encode a smooth tone with a spec-built
    compressor and assert the decode tracks it closely (and exactly
    reproduces the per-block predictor seeds)."""
    import struct as st

    from streamsum_spark.operators import multimodal as mmx

    t = np.arange(2000)
    sig = (6000 * np.sin(2 * np.pi * 220 * t / 8000)).astype(np.int16)

    steps, adj = mmx._IMA_STEPS, mmx._IMA_INDEX_ADJ
    blocks = bytearray()
    block_align = 256  # 2-byte pred + reserved + 252 data bytes = 505 samples
    i = 0
    while i < len(sig):
        pred, index = int(sig[i]), 0 if i == 0 else index  # carry index over
        blocks += st.pack("<hBB", pred, index, 0)
        nibs = []
        for x in sig[i + 1 : i + 1 + (block_align - 4) * 2]:
            step = int(steps[index])
            delta = int(x) - pred
            nib = 8 if delta < 0 else 0
            delta = abs(delta)
            diff = step >> 3
            if delta >= step:
                nib |= 4
                delta -= step
                diff += step
            if delta >= step >> 1:
                nib |= 2
                delta -= step >> 1
                diff += step >> 1
            if delta >= step >> 2:
                nib |= 1
                diff += step >> 2
            pred = pred - diff if nib & 8 else pred + diff
            pred = max(-32768, min(32767, pred))
            index = min(88, max(0, index + int(adj[nib & 7])))
            nibs.append(nib)
        if len(nibs) % 2:
            nibs.append(0)
        for a, b in zip(nibs[::2], nibs[1::2]):
            blocks += bytes([(b << 4) | a])
        i += 1 + (block_align - 4) * 2

    samples, rate = mmx.decode_audio(
        _wav_blob(bytes(blocks), 0x11, 4, block_align=block_align)
    )
    got = samples[:, 0].astype(np.int32)[: len(sig)]
    want = sig.astype(np.int32)[: len(got)]
    err = np.abs(got - want)
    # the first samples show classic slope overload (index seeds at 0 and
    # adapts up); once adapted the decode tracks the tone tightly
    assert err.mean() < 300
    assert err[500:].max() < 1000, err[500:].max()
    assert got[0] == want[0]  # block seed exact


def test_unsupported_wav_tags_still_refuse():
    from streamsum_spark.operators import multimodal as mmx

    with pytest.raises(NotImplementedError, match="format tag 85"):
        mmx.decode_audio(_wav_blob(b"\x00" * 64, 85, 0))  # MP3-in-WAV


# ---------------------------------------------------------------------------
# FLAC (operators/flac.py — RFC 9639, no codec libs; lossless => exact pins)
# ---------------------------------------------------------------------------


def _flac_tone(n=3000, seed=3):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (
        5000 * np.sin(2 * np.pi * 220 * t / 8000)
        + rng.integers(-50, 50, n)
    ).astype(np.int16)


def test_flac_roundtrip_bit_exact_all_subframe_types():
    from streamsum_spark.operators import flac

    mono = _flac_tone()
    for kw in (
        {},  # constant/fixed auto
        {"force_type": "verbatim"},
        {"force_type": "fixed0"},
        {"force_type": "fixed1"},
        {"force_type": "fixed3"},
        {"force_type": "fixed4"},
        {"lpc": ([60, -29], 7, 5)},
    ):
        out, rate = flac.decode_flac(flac.encode_flac(mono, block_size=500, **kw))
        assert rate == 8000
        assert np.array_equal(out[:, 0], mono.astype(np.int32)), kw
    silence = np.zeros(400, dtype=np.int16)
    out, _ = flac.decode_flac(flac.encode_flac(silence, block_size=200))
    assert np.array_equal(out[:, 0], silence.astype(np.int32))


@pytest.mark.parametrize(
    "mode", ["independent", "left_side", "right_side", "mid_side"]
)
def test_flac_stereo_decorrelation_bit_exact(mode):
    from streamsum_spark.operators import flac

    l = _flac_tone()
    rng = np.random.default_rng(9)
    r = (l // 2 + rng.integers(-30, 30, len(l))).astype(np.int16)
    st_arr = np.stack([l, r], axis=1)
    out, _ = flac.decode_flac(
        flac.encode_flac(st_arr, block_size=512, stereo_mode=mode)
    )
    assert np.array_equal(out, st_arr.astype(np.int32))


def test_flac_crc_guards_and_hostile_inputs():
    """A flipped bit anywhere in a frame must be CAUGHT by the CRC, not
    decoded into wrong samples; dimension bombs and truncation refuse."""
    import struct as st

    from streamsum_spark.operators import flac

    blob = bytearray(flac.encode_flac(_flac_tone(800), block_size=400))
    # sample-budget bomb: STREAMINFO declaring 2^35 samples
    bomb = bytearray(blob)
    # total-samples field: last 36 bits of the 18-byte STREAMINFO body
    with pytest.raises(ValueError, match="decode cap"):
        hdr = flac.encode_flac(np.zeros(4, dtype=np.int16))
        big = bytearray(hdr)
        big[21] ^= 0  # locate STREAMINFO: bytes 8.. (4 magic + 4 block hdr)
        # craft: set total-samples bits high (byte 8+13 .. 8+17)
        big[8 + 13] = 0xFF
        big[8 + 14] = 0xFF
        big[8 + 15] = 0xFF
        flac.decode_flac(bytes(big))
    with pytest.raises(ValueError):
        flac.decode_flac(bytes(blob[: len(blob) // 2]))
    # single-bit corruption across the stream: ValueError every time a
    # frame byte flips (CRC-8/CRC-16), never silent wrong samples
    want, _ = flac.decode_flac(bytes(blob))
    rng = np.random.RandomState(17)
    caught = 0
    for _ in range(30):
        mut = bytearray(blob)
        i = int(rng.randint(46, len(mut)))  # past STREAMINFO: frame bytes
        mut[i] ^= 1 << int(rng.randint(8))
        try:
            got, _ = flac.decode_flac(bytes(mut))
            assert np.array_equal(got, want)  # flip in slack bits only
        except (ValueError, NotImplementedError):
            caught += 1
    assert caught >= 25  # CRCs catch essentially all frame corruption


def test_flac_through_decode_audio_and_features(spark):
    from streamsum_spark.operators import flac
    from streamsum_spark.operators import multimodal as mmx

    tone = _flac_tone(1600)
    blob = flac.encode_flac(tone, rate=16000, block_size=800)
    samples, rate = mmx.decode_audio(blob)
    assert rate == 16000 and np.array_equal(samples[:, 0], tone.astype(np.int32))
    media = spark.createDataFrame(
        [(1, "audio/flac", None, None, 100, blob)], mmx.MEDIA_SCHEMA
    )
    out = mmx.extract_features(media).collect()[0]
    assert out.decoded and out.channels == 1


def test_jpeg_incomplete_scan_coverage_refuses_not_scrambles():
    """Round 7: per-component multi-scan files now DECODE (the
    progressive machinery gives non-interleaved traversal for free), so
    the old blanket refusal is gone — but a file whose scans never cover
    some component (here: a color image rewritten to scan only Y) must
    still refuse, never return the untouched components as flat zero
    pretending to be real pixels."""
    import struct as st

    from streamsum_spark.operators import jpeg

    full = bytearray(jpeg.encode_jpeg(_jpeg_gradient(16, 16), quality=90))
    # rewrite the SOS to a single-component scan (ns=1) over the same data
    i = full.find(b"\xff\xda")
    assert i > 0
    sos = bytes([1, 1, 0x00]) + b"\x00\x3f\x00"
    mut = full[:i] + b"\xff\xda" + st.pack(">H", 2 + len(sos)) + sos + full[
        i + 2 + st.unpack_from(">H", full, i + 2)[0] :
    ]
    with pytest.raises(ValueError, match="without a scan"):
        jpeg.decode_jpeg(bytes(mut))


@pytest.mark.parametrize("bps", [8, 24])
def test_flac_other_bit_depths_roundtrip(bps):
    """The decoder's sample-size surface beyond 16-bit: 8- and 24-bit
    streams roundtrip bit-exact (values generated within range)."""
    from streamsum_spark.operators import flac

    rng = np.random.default_rng(bps)
    lim = 1 << (bps - 1)
    sig = rng.integers(-lim, lim, 1200)
    out, rate = flac.decode_flac(
        flac.encode_flac(sig, bps=bps, block_size=400, force_type="fixed1")
    )
    assert np.array_equal(out[:, 0], sig.astype(np.int64).astype(np.int32))


def test_flac_crc16_tree_combine_matches_bitwise():
    """The decoder's CRC-16 is a GF(2) tree combine over numpy byte
    states; pin it against the direct bit-at-a-time definition
    (poly 0x8005, init 0) across lengths straddling the power-of-two
    padding boundaries."""
    from streamsum_spark.operators import flac

    def ref_crc16(data):
        crc = 0
        for byte in data:
            crc ^= byte << 8
            for _ in range(8):
                crc = (
                    ((crc << 1) ^ 0x8005) & 0xFFFF
                    if crc & 0x8000
                    else (crc << 1) & 0xFFFF
                )
        return crc

    rng = np.random.default_rng(5)
    for n in (0, 1, 2, 3, 7, 8, 9, 255, 256, 257, 5000):
        d = bytes(rng.integers(0, 256, n, dtype=np.uint8).tobytes())
        assert flac._crc16(d) == ref_crc16(d), n


def test_flac_rice_window_growth_on_long_unary():
    """Huge quotients overflow the Rice reader's initial bit-window
    guess, forcing the geometric-growth path (and, clipped at the blob
    edge, the truncation error) — both with and without remainder
    bits."""
    from streamsum_spark.operators import flac

    vals = [40000, -3, 0, 12345, -40000]
    for p in (0, 3):
        bw = flac._BitWriter()
        flac._write_rice(bw, vals, p)
        bw.align()
        out, _ = flac._read_rice_partition(bytes(bw.out), 0, len(vals), p)
        assert out.tolist() == vals
        with pytest.raises(ValueError, match="truncated unary"):
            flac._read_rice_partition(bytes(bw.out), 0, len(vals) + 1, p)


def test_flac_fixed_inversion_property():
    """FIXED reconstruction is the cumsum inverse of the order-k
    binomial difference: inverting _fixed_residual recovers the signal
    exactly for every order."""
    from streamsum_spark.operators import flac

    rng = np.random.default_rng(6)
    for order in range(5):
        x = [int(v) for v in rng.integers(-30000, 30000, 300)]
        resid = flac._fixed_residual(x, order)
        got = flac._invert_fixed(x[:order], np.asarray(resid, np.int64), order)
        assert got.tolist() == x, order


def test_flac_fixed_inversion_pathological_magnitudes():
    """Hostile escape-coded residuals near int64's edge (round-10
    review): the magnitude bound routes them to the exact scalar fold —
    same values as a bigint reference when they fit, a loud ValueError
    (never silent wraparound) when reconstruction exceeds int64."""
    from streamsum_spark.operators import flac

    # trips the bound but fits: scalar fold must equal a bigint fold
    resid = np.asarray([1 << 50, -(1 << 50), 3, -7] * 4, np.int64)
    warm = [5, -2]
    got = flac._invert_fixed(warm, resid, 2)
    ref = list(warm)
    for e in [int(v) for v in resid]:
        ref.append(2 * ref[-1] - ref[-2] + e)
    assert got.tolist() == ref
    # genuinely overflows int64: refuse, never wrap
    with pytest.raises(ValueError, match="sample overflow"):
        flac._invert_fixed([0, 0, 0, 0],
                           np.full(3000, 1 << 30, np.int64), 4)


def test_ima_adpcm_stereo_tracks_both_channels():
    """Stereo IMA ADPCM: per-channel block headers + 4-byte interleaved
    nibble groups; both channels decode independently and track their
    signals (spec-built stereo compressor in the test)."""
    import struct as st

    from streamsum_spark.operators import multimodal as mmx

    t = np.arange(1600)
    sigs = [
        (5000 * np.sin(2 * np.pi * 220 * t / 8000)).astype(np.int16),
        (4000 * np.sin(2 * np.pi * 330 * t / 8000 + 1.0)).astype(np.int16),
    ]
    steps, adj = mmx._IMA_STEPS, mmx._IMA_INDEX_ADJ

    def compress(sig, pred, index):
        nibs = []
        for x in sig:
            step = int(steps[index])
            delta = int(x) - pred
            nib = 8 if delta < 0 else 0
            delta = abs(delta)
            diff = step >> 3
            if delta >= step:
                nib |= 4; delta -= step; diff += step
            if delta >= step >> 1:
                nib |= 2; delta -= step >> 1; diff += step >> 1
            if delta >= step >> 2:
                nib |= 1; diff += step >> 2
            pred = pred - diff if nib & 8 else pred + diff
            pred = max(-32768, min(32767, pred))
            index = min(88, max(0, index + int(adj[nib & 7])))
            nibs.append(nib)
        return nibs, pred, index

    block_align = 256  # 8 header bytes + 248 data = 31 groups x 4 bytes/ch
    samples_per_block = 1 + (block_align - 8) // 8 * 8  # 1 seed + 248/8*8 nibbles
    blocks = bytearray()
    idx = [0, 0]
    i = 0
    while i < len(sigs[0]):
        hdr = b""
        payload_nibs = []
        for c in range(2):
            seed = int(sigs[c][i])
            hdr += st.pack("<hBB", seed, idx[c], 0)
            nibs, _, idx[c] = compress(
                sigs[c][i + 1 : i + samples_per_block], seed, idx[c]
            )
            while len(nibs) % 8:
                nibs.append(0)
            payload_nibs.append(nibs)
        blocks += hdr
        for g in range(0, len(payload_nibs[0]), 8):
            for c in range(2):
                chunk = payload_nibs[c][g : g + 8]
                for a, b in zip(chunk[::2], chunk[1::2]):
                    blocks += bytes([(b << 4) | a])
        i += samples_per_block

    samples, rate = mmx.decode_audio(
        _wav_blob(bytes(blocks), 0x11, 4, nch=2, block_align=block_align)
    )
    assert samples.shape[1] == 2
    for c in range(2):
        got = samples[:, c].astype(np.int32)[: len(sigs[c])]
        want = sigs[c].astype(np.int32)[: len(got)]
        err = np.abs(got - want)
        assert err.mean() < 300 and err[500:].max() < 1200, (c, err.mean())
        assert got[0] == want[0]


def test_stereo_adpcm_undersized_block_align_raises_valueerror():
    """A stereo IMA ADPCM WAV declaring block_align < 8 (too small for
    the 4-byte-per-channel block headers) must raise the module's
    ValueError contract, not leak struct.error from the header unpack."""
    from streamsum_spark.operators import multimodal as mmx

    blob = _wav_blob(b"\x00" * 64, audio_fmt=0x11, bits=4, nch=2, block_align=4)
    try:
        out, _ = mmx.decode_audio(blob)
        assert out.shape[1] == 2  # clamped block_align decoded cleanly
    except ValueError:
        pass  # also within contract for malformed input
    except Exception as exc:  # struct.error / IndexError leak = bug
        raise AssertionError(f"non-ValueError leaked: {type(exc).__name__}: {exc}")


# ---------------------------------------------------------------------------
# progressive JPEG (SOF2 — spectral selection + successive approximation)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sub,ri", [((1, 1), 0), ((2, 2), 0), ((2, 1), 3), ((1, 2), 1)])
def test_progressive_jpeg_equals_baseline_decode(sub, ri):
    """THE cross-check that validates the progressive entropy layer:
    encode_jpeg and encode_jpeg_progressive quantize identically, and
    both entropy layers are lossless, so decoding the progressive bytes
    must reproduce the baseline decode BYTE-EXACTLY — any error in the
    EOB-run / refinement / spectral-band logic breaks the equality."""
    from streamsum_spark.operators import jpeg

    px = _jpeg_gradient()
    rng = np.random.RandomState(5)
    noisy = ((px.astype(int) + rng.randint(0, 40, px.shape)) % 256).astype(np.uint8)
    for img in (px, noisy):
        for q in (92, 50):
            want = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=q, subsampling=sub))
            got = jpeg.decode_jpeg(
                jpeg.encode_jpeg_progressive(
                    img, quality=q, subsampling=sub, restart_interval=ri
                )
            )
            assert np.array_equal(want, got)


def test_progressive_jpeg_grayscale_and_flat():
    """Grayscale path + flat images (all-zero AC bands -> EOB runs that
    span many blocks, the decoder's eobrun skip path)."""
    from streamsum_spark.operators import jpeg

    g = _jpeg_gradient()[:, :, 0]
    assert np.array_equal(
        jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=85)),
        jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(g, quality=85)),
    )
    for val in (0, 128, 255):
        img = np.full((48, 64, 3), val, dtype=np.uint8)
        assert np.array_equal(
            jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90)),
            jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(img, quality=90)),
        )


def test_progressive_jpeg_mutation_fuzz_never_escapes_valueerror():
    """Same contract as the baseline fuzz pin, over the progressive scan
    machinery (EOB runs, refinement bits, per-scan restarts)."""
    from streamsum_spark.operators import jpeg

    blob = bytearray(
        jpeg.encode_jpeg_progressive(
            _jpeg_gradient(16, 24), quality=85, subsampling=(2, 1), restart_interval=3
        )
    )
    rng = np.random.RandomState(11)
    for _ in range(60):
        mut = bytearray(blob)
        for _ in range(int(rng.randint(1, 4))):
            mut[int(rng.randint(2, len(mut)))] = int(rng.randint(256))
        try:
            out = jpeg.decode_jpeg(bytes(mut))
            assert out.dtype == np.uint8 and out.ndim == 3
        except (ValueError, NotImplementedError):
            pass
    # truncations refuse cleanly at every cut point
    for cut in range(2, len(blob), 199):
        try:
            jpeg.decode_jpeg(bytes(blob[:cut]))
        except (ValueError, NotImplementedError):
            pass


def test_progressive_jpeg_through_extract_features(spark):
    """synthetic_media now mixes progressive JPEGs in; they decode on the
    default Arrow path with real pixel stats (decoded=true)."""
    media = mm.synthetic_media(spark, n=64)
    rows = {r.media_id: r for r in mm.extract_features(media).collect()}
    blobs = {r.media_id: bytes(r.content) for r in media.collect() if r.mime == "image/jpeg"}
    n_prog = 0
    for mid, b in blobs.items():
        assert rows[mid].decoded
        if b"\xff\xc2" in b[:200]:  # SOF2 marker in the header region
            n_prog += 1
            px = mm.decode_image(b)
            assert rows[mid].feature[0] == pytest.approx(
                px[:, :, 0].mean() / 255.0, abs=1e-6
            )
    assert n_prog >= 2  # the mix really contains progressive files


def test_progressive_jpeg_refinement_before_first_scan_refuses():
    """A progressive file whose scan schedule starts at a refinement
    (first DC/AC scans excised) must refuse: OR-ing refinement bits into
    all-zero coefficients would pass the coverage guard and present
    near-flat noise as real pixels."""
    from streamsum_spark.operators import jpeg

    g = _jpeg_gradient()[:, :, 0]
    blob = jpeg.encode_jpeg_progressive(g, quality=85)
    # entropy bytes can never contain FF DA (FF is stuffed), so scan
    # boundaries split cleanly; gray scan order is
    # [DC first, AC(1,5), AC(6,63), DC refine, AC ref(1,5), AC ref(6,63)]
    parts = blob.split(b"\xff\xda")
    assert len(parts) == 7
    # drop the three FIRST-pass scans: the stream now opens on DC refine
    mut = parts[0] + b"\xff\xda" + b"\xff\xda".join(parts[4:])
    with pytest.raises(ValueError, match="refinement before DC scan"):
        jpeg.decode_jpeg(mut)
    # drop only the DC first scan: the stream opens on an AC scan
    mut2 = parts[0] + b"\xff\xda" + b"\xff\xda".join(parts[2:])
    with pytest.raises(ValueError, match="AC scan before DC scan"):
        jpeg.decode_jpeg(mut2)


# --- externally-encoded golden fixtures (round-8 ADVICE) -------------
#
# Until now the progressive decoder was validated only against this
# repo's own progressive encoder — a symmetric misreading of T.81 G.2
# (EOB-run length, refinement correction-bit order) in both halves
# would pass every round-trip yet misdecode real libjpeg files.  These
# fixtures are INDEPENDENTLY encoded JPEGs vendored from public
# artifacts shipped in this environment:
#
#   ext_progressive_color.jpg  nodejs doc asset (libjpeg progressive,
#                              YCbCr 4:2:0, SOF2)
#   ext_progressive_gray.jpg   Apache Spark data/mllib sample
#                              (progressive grayscale, SOF2)
#   ext_baseline_color.jpg     Apache Spark data/mllib kitten sample
#                              (baseline, YCbCr subsampled, SOF0)
#
# and the golden pixels come from a SECOND independent decoder: Java
# ImageIO via Spark's built-in `image` source (JVM-side, zero new
# deps).  T.81 does not mandate a bit-exact IDCT, so the pin allows a
# small rounding band — what it cannot allow is structural error (wrong
# EOB runs smear whole blocks, wrong bit order inverts refinements:
# both blow the band by orders of magnitude).

_EXT_FIXTURES = [
    # (name, max abs diff, max fraction of pixels differing by > 2)
    ("ext_progressive_color.jpg", 4, 0.001),
    ("ext_progressive_gray.jpg", 4, 0.001),
    # chroma upsampling on sharp 4:2:0 edges differs more between
    # implementations (box vs fancy upsampling) — wider band, still
    # far below any structural-misdecode signature
    ("ext_baseline_color.jpg", 16, 0.02),
]


@pytest.mark.parametrize("name,max_diff,max_frac", _EXT_FIXTURES)
def test_external_jpeg_matches_imageio_golden(spark, name, max_diff, max_frac):
    from streamsum_spark.operators import jpeg

    path = os.path.join(os.path.dirname(__file__), "data", name)
    with open(path, "rb") as fh:
        blob = fh.read()
    # confirm the fixture really is what it claims (SOF marker)
    sof2 = b"\xff\xc2" in blob[:2048] or b"\xff\xc2" in blob
    assert sof2 == name.startswith("ext_progressive")
    ours = jpeg.decode_jpeg(blob).astype(int)
    row = spark.read.format("image").load(path).select("image.*").collect()[0]
    golden = np.frombuffer(bytes(row.data), np.uint8).reshape(
        row.height, row.width, row.nChannels
    )
    if row.nChannels == 3:
        golden = golden[:, :, ::-1]  # Spark image schema stores BGR
    else:
        golden = np.repeat(golden, 3, axis=2)  # decode_jpeg returns HxWx3
    assert ours.shape == golden.shape
    d = np.abs(ours - golden.astype(int))
    assert d.max() <= max_diff, (name, d.max())
    assert (d > 2).mean() <= max_frac, (name, (d > 2).mean())
    assert d.mean() <= 1.0, (name, d.mean())


def test_bmp_v4_header_truncated_bitfields_raises_valueerror():
    """A BMP declaring a V4/V5-size info header (masks live inline at
    bytes 54-65) but truncated below 66 bytes must raise the module's
    ValueError contract, not leak struct.error (r8 ADVICE: the old
    guard only fired for the BITMAPINFOHEADER+masks layout)."""
    import struct as _s

    from streamsum_spark.operators import multimodal as mmx

    # file header + V4 header declaring comp=3 (BITFIELDS), 16bpp —
    # then truncate the blob at 60 bytes, inside the mask words
    hdr = b"BM" + _s.pack("<IHHI", 200, 0, 0, 14 + 108)
    v4 = _s.pack("<IiiHHIIiiII", 108, 4, 4, 1, 16, 3, 32, 0, 0, 0, 0)
    blob = (hdr + v4)[:60]
    with pytest.raises(ValueError):
        mmx.decode_image(blob)


def test_byte_budget_chunks_bound_peak_batch():
    """_byte_budget_chunks must cap each processed chunk at the byte
    budget (large-blob regime), the row cap (small-blob regime), take at
    least one row even when a single blob exceeds the budget, preserve
    order/coverage, and share buffers (iloc views, no content copy)."""
    import pandas as pd

    from streamsum_spark.operators.multimodal import _byte_budget_chunks

    blobs = [b"x" * (8 << 20)] * 5 + [b"y" * (40 << 20)] + [b"z" * 100] * 10
    pdf = pd.DataFrame({"media_id": range(len(blobs)), "content": blobs})
    chunks = list(_byte_budget_chunks(iter([pdf]), 16 << 20, 4))
    # coverage + order
    assert [int(m) for c in chunks for m in c["media_id"]] == list(
        range(len(blobs))
    )
    for c in chunks:
        total = sum(len(b) for b in c["content"])
        # a chunk either fits the budget, or closed AT the blob that
        # crossed it (cum >= budget), or is a single oversized blob
        assert len(c) <= 4
        assert total < (16 << 20) + (40 << 20) + 1
        if total > 16 << 20:
            assert sum(len(b) for b in c["content"][:-1]) < 16 << 20
    # the 40 MiB blob rides alone or closes its chunk
    big_chunk = [c for c in chunks if any(len(b) > 20 << 20 for b in c["content"])]
    assert len(big_chunk) == 1
    # small blobs re-batch by the row cap
    tail = [c for c in chunks if all(len(b) == 100 for b in c["content"])]
    assert tail and all(len(c) <= 4 for c in tail)


def test_extract_features_results_unchanged_by_byte_budget(spark):
    """Re-batching is a pure memory bound: features must be identical
    under a tiny budget (every blob its own chunk) and the default."""
    from streamsum_spark.operators import multimodal as mmx

    media = mmx.synthetic_media(spark, n=48)
    base = {
        (r.media_id, r.content_sha, r.decoded, r.width, r.height,
         tuple(round(f, 12) for f in r.feature))
        for r in mmx.extract_features(media).collect()
    }
    tiny = {
        (r.media_id, r.content_sha, r.decoded, r.width, r.height,
         tuple(round(f, 12) for f in r.feature))
        for r in mmx.extract_features(media, batch_hint=3, byte_budget=1).collect()
    }
    assert base == tiny and base
