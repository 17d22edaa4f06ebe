"""AIFF/AIFF-C, Sun AU, and ICO/CUR pins.

Audio is pinned against the CPython stdlib writers (aifc, sunau) as
independent oracles — note their input conventions differ: aifc PCM
and 'sowt' take big-endian input (sowt swaps on write), while aifc
G.711 and sunau take native little-endian.  ICO has no oracle in this
environment; its DIB payload is BMP semantics (already oracle-pinned
via Java ImageIO for BMP-family rasters in test_multimodal), so the
pins are roundtrips through the in-repo encoder plus crafted palette
images with hand-computed pixels.
"""

from __future__ import annotations

import io
import struct
import warnings

import numpy as np
import pytest

from streamsum_spark.operators import multimodal as mm

with warnings.catch_warnings():
    warnings.simplefilter("ignore", DeprecationWarning)
    try:
        import aifc
        import sunau
    except ImportError:  # removed in Python 3.13
        aifc = sunau = None

needs_stdlib_audio = pytest.mark.skipif(
    aifc is None, reason="stdlib aifc/sunau removed (py3.13+)")


class _KeepOpen(io.BytesIO):
    def close(self):  # aifc/sunau close the underlying file
        self.flush()


def _tone(n=4000, f=440, rate=8000):
    t = np.arange(n)
    return (3000 * np.sin(2 * np.pi * f * t / rate)).astype(np.int16)


# ---- AIFF ------------------------------------------------------------

@needs_stdlib_audio
def test_aiff_pcm16_stereo_matches_stdlib_writer():
    tone = _tone()
    stereo = np.stack([tone, -tone], 1)
    buf = _KeepOpen()
    w = aifc.open(buf, "wb")
    w.setnchannels(2)
    w.setsampwidth(2)
    w.setframerate(8000)
    w.writeframes(stereo.astype(">i2").tobytes())
    w.close()
    s, r = mm.decode_audio(buf.getvalue())
    assert r == 8000 and np.array_equal(s, stereo)


@needs_stdlib_audio
def test_aifc_sowt_byte_swapped_pcm():
    tone = _tone(rate=11025)
    buf = _KeepOpen()
    w = aifc.open(buf, "wb")
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(11025)
    w.setcomptype(b"sowt", b"")
    w.writeframes(tone.astype(">i2").tobytes())  # aifc swaps on write
    w.close()
    s, r = mm.decode_audio(buf.getvalue())
    assert r == 11025 and np.array_equal(s[:, 0], tone)


@needs_stdlib_audio
def test_aifc_g711_ulaw_matches_audioop():
    import audioop

    tone = _tone()
    buf = _KeepOpen()
    w = aifc.open(buf, "wb")
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(8000)
    w.setcomptype(b"ulaw", b"")
    w.writeframes(tone.tobytes())  # audioop path takes native LE
    w.close()
    s, r = mm.decode_audio(buf.getvalue())
    ref = np.frombuffer(
        audioop.ulaw2lin(audioop.lin2ulaw(tone.tobytes(), 2), 2), "<i2")
    assert r == 8000 and np.array_equal(s[:, 0], ref)


def test_aiff_fixture_encoder_roundtrip():
    tone = _tone(rate=44100, f=1000)
    stereo = np.stack([tone, tone // 2], 1)
    s, r = mm.decode_audio(mm.encode_aiff(stereo, 44100))
    assert r == 44100 and np.array_equal(s, stereo)
    if aifc is not None:  # stdlib reader accepts our fixture too
        f = aifc.open(io.BytesIO(mm.encode_aiff(stereo, 44100)))
        assert f.getframerate() == 44100 and f.getnchannels() == 2
        assert f.readframes(4) == stereo[:4].astype(">i2").tobytes()


def test_aiff_pcm24_crafted():
    """24-bit big-endian samples downshift to int16."""
    vals = np.array([0x123456, -0x123456, 0x7FFFFF, -0x800000], np.int64)
    data = b"".join(int(v & 0xFFFFFF).to_bytes(3, "big") for v in vals)
    rate_f80 = struct.pack(">HQ", 16383 + 12, 8000 << 51)
    comm = struct.pack(">hIh", 1, len(vals), 24) + rate_f80
    ssnd = struct.pack(">II", 0, 0) + data
    body = (b"AIFF" + b"COMM" + struct.pack(">I", len(comm)) + comm
            + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd)
    s, r = mm.decode_audio(b"FORM" + struct.pack(">I", len(body)) + body)
    assert r == 8000
    assert list(s[:, 0]) == [v >> 8 for v in
                             [0x123456, -0x123456, 0x7FFFFF, -0x800000]]


# ---- AU --------------------------------------------------------------

@needs_stdlib_audio
def test_au_pcm16_and_ulaw_match_stdlib_writer():
    import audioop

    tone = _tone()
    stereo = np.stack([tone, -tone], 1)
    buf = _KeepOpen()
    w = sunau.open(buf, "wb")
    w.setnchannels(2)
    w.setsampwidth(2)
    w.setframerate(16000)
    w.setcomptype("NONE", "")  # sunau DEFAULTS to ULAW
    w.writeframes(stereo.astype(">i2").tobytes())  # NONE writes verbatim
    w.close()
    s, r = mm.decode_audio(buf.getvalue())
    assert r == 16000 and np.array_equal(s, stereo)

    buf = _KeepOpen()
    w = sunau.open(buf, "wb")
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(8000)
    w.setcomptype("ULAW", "")
    w.writeframes(tone.tobytes())
    w.close()
    s, r = mm.decode_audio(buf.getvalue())
    ref = np.frombuffer(
        audioop.ulaw2lin(audioop.lin2ulaw(tone.tobytes(), 2), 2), "<i2")
    assert r == 8000 and np.array_equal(s[:, 0], ref)


@pytest.mark.parametrize("enc,bits", [(2, 8), (4, 24), (5, 32)])
def test_au_pcm_widths_crafted(enc, bits):
    tone = _tone(200)
    if bits == 8:
        data = (tone >> 8).astype(np.int8).tobytes()
        want = (tone >> 8).astype(np.int16) << 8
    else:
        v = tone.astype(np.int64) << (bits - 16)
        data = b"".join(
            int(x & ((1 << bits) - 1)).to_bytes(bits // 8, "big") for x in v)
        want = tone
    hdr = struct.pack(">IIIIII", 0x2E736E64, 24, len(data), enc, 8000, 1)
    s, r = mm.decode_audio(hdr + data)
    assert r == 8000 and np.array_equal(s[:, 0], want)


def test_au_float32_crafted():
    tone = _tone(200)
    data = (tone / 32767.0).astype(">f4").tobytes()
    hdr = struct.pack(">IIIIII", 0x2E736E64, 24, len(data), 6, 8000, 1)
    s, r = mm.decode_audio(hdr + data)
    assert np.abs(s[:, 0].astype(int) - tone).max() <= 1


def test_au_fixture_encoder_roundtrip():
    tone = _tone()
    s, r = mm.decode_audio(mm.encode_au(tone, 22050))
    assert r == 22050 and np.array_equal(s[:, 0], tone)
    if sunau is not None:
        f = sunau.open(io.BytesIO(mm.encode_au(tone, 22050)))
        assert f.getframerate() == 22050


def test_audio_hostile_headers_refuse():
    with pytest.raises(ValueError):
        mm.decode_audio(b".snd" + b"\x00" * 10)
    with pytest.raises(ValueError):  # offset past end
        mm.decode_audio(struct.pack(">IIIIII", 0x2E736E64, 9999, 0, 3, 8000, 1))
    with pytest.raises((ValueError, NotImplementedError)):
        mm.decode_audio(b"FORM\x00\x00\x00\x04AIFF")
    with pytest.raises(NotImplementedError):  # unknown AIFC codec
        f80 = struct.pack(">HQ", 16383 + 12, 8000 << 51)
        comm = struct.pack(">hIh", 1, 0, 16) + f80 + b"ima4"
        body = (b"AIFC" + b"COMM" + struct.pack(">I", len(comm)) + comm
                + b"SSND" + struct.pack(">II", 8, 0) + b"\x00" * 8)
        mm.decode_audio(b"FORM" + struct.pack(">I", len(body)) + body)


# ---- ICO -------------------------------------------------------------

def test_ico_bmp_and_png_roundtrip():
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (13, 21, 3), dtype=np.uint8)
    for inner in ("bmp", "png"):
        out = mm.decode_image(mm.encode_ico(px, inner=inner))
        assert np.array_equal(out, px), inner


def test_ico_palette_4bpp_crafted():
    """Hand-built 4bpp DIB entry: 2 palette colors, high-nibble-first
    packing, bottom-up rows, doubled biHeight."""
    pal = [(255, 0, 0), (0, 0, 255)]  # RGB
    w, h = 5, 2
    # rows (top-down, indices): row0 = 0 1 0 1 0, row1 = 1 1 0 0 1
    rows_td = [[0, 1, 0, 1, 0], [1, 1, 0, 0, 1]]
    stride = ((w * 4 + 31) // 32) * 4
    xor = b""
    for row in reversed(rows_td):  # bottom-up
        packed = bytearray(stride)
        for c, idx in enumerate(row):
            packed[c // 2] |= idx << (4 if c % 2 == 0 else 0)
        xor += bytes(packed)
    and_stride = ((w + 31) // 32) * 4
    dib = (struct.pack("<IiiHHIIiiII", 40, w, 2 * h, 1, 4, 0, 0, 0, 0, 2, 0)
           + bytes([0, 0, 255, 0]) + bytes([255, 0, 0, 0])  # BGR0 palette
           + xor + b"\x00" * (and_stride * h))
    entry = struct.pack("<BBBBHHII", w, h, 2, 0, 1, 4, len(dib), 22)
    blob = struct.pack("<HHH", 0, 1, 1) + entry + dib
    out = mm.decode_image(blob)
    want = np.array([[pal[i] for i in row] for row in rows_td], np.uint8)
    assert np.array_equal(out, want)


def test_ico_picks_largest_entry():
    rng = np.random.default_rng(6)
    small = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    big = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    b_small = mm.encode_ico(small)
    b_big = mm.encode_ico(big)
    # splice both entries into one directory (recompute offsets)
    img_small = b_small[22:]
    img_big = b_big[22:]
    e1 = struct.pack("<BBBBHHII", 4, 4, 0, 0, 1, 32, len(img_small), 38)
    e2 = struct.pack("<BBBBHHII", 16, 16, 0, 0, 1, 32, len(img_big),
                     38 + len(img_small))
    blob = struct.pack("<HHH", 0, 1, 2) + e1 + e2 + img_small + img_big
    assert np.array_equal(mm.decode_image(blob), big)


def test_ico_hostile_refuses():
    with pytest.raises(ValueError):
        mm.decode_image(b"\x00\x00\x01\x00\x01\x00" + b"\x00" * 10)
    # entry pointing past the blob
    entry = struct.pack("<BBBBHHII", 4, 4, 0, 0, 1, 32, 1000, 22)
    with pytest.raises(ValueError):
        mm.decode_image(struct.pack("<HHH", 0, 1, 1) + entry + b"\x00" * 8)


def test_new_formats_through_extract_features(spark):
    tone = _tone()
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (9, 12, 3), dtype=np.uint8)
    rows = [
        (1, "audio/aiff", None, None, 500, mm.encode_aiff(tone, 8000)),
        (2, "audio/basic", None, None, 500, mm.encode_au(tone, 8000)),
        (3, "image/x-icon", 12, 9, None, mm.encode_ico(px)),
        (4, "image/x-icon", 12, 9, None, mm.encode_ico(px, inner="png")),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {r.media_id: r for r in mm.extract_features(df).collect()}
    assert all(out[k].decoded for k in (1, 2, 3, 4))
    assert out[3].width == 12 and out[3].height == 9
    assert out[1].channels == 1


def test_hostile_f80_exponent_and_au_nan_refuse_as_valueerror():
    """Corrupt blobs must fall back via ValueError, not crash the
    Arrow task with OverflowError / undefined NaN casts."""
    # AIFF with an astronomically large 80-bit sample-rate exponent
    f80 = struct.pack(">HQ", 0x7FFE, 1 << 63)
    comm = struct.pack(">hIh", 1, 0, 16) + f80
    ssnd = struct.pack(">II", 0, 0) + b"\x00" * 4
    body = (b"AIFF" + b"COMM" + struct.pack(">I", len(comm)) + comm
            + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd)
    with pytest.raises(ValueError, match="rate"):
        mm.decode_audio(b"FORM" + struct.pack(">I", len(body)) + body)
    # AU float32 payload full of NaNs
    data = np.full(16, np.nan, ">f4").tobytes()
    hdr = struct.pack(">IIIIII", 0x2E736E64, 24, len(data), 6, 8000, 1)
    with pytest.raises(ValueError, match="finite"):
        mm.decode_audio(hdr + data)


def test_ico_top_down_dib_not_flipped():
    """Negative biHeight = top-down rows; the decoder must not mirror
    them (same rule as _decode_bmp)."""
    rng = np.random.default_rng(8)
    px = rng.integers(0, 256, (6, 8, 3), dtype=np.uint8)
    bgra = np.zeros((6, 8, 4), np.uint8)
    bgra[:, :, 0] = px[:, :, 2]
    bgra[:, :, 1] = px[:, :, 1]
    bgra[:, :, 2] = px[:, :, 0]
    bgra[:, :, 3] = 255
    xor = bgra.tobytes()  # TOP-DOWN rows
    mask = b"\x00" * (((8 + 31) // 32) * 4 * 6)
    dib = struct.pack("<IiiHHIIiiII", 40, 8, -2 * 6, 1, 32, 0, 0,
                      0, 0, 0, 0) + xor + mask
    entry = struct.pack("<BBBBHHII", 8, 6, 0, 0, 1, 32, len(dib), 22)
    blob = struct.pack("<HHH", 0, 1, 1) + entry + dib
    assert np.array_equal(mm.decode_image(blob), px)


def test_cur_hotspot_not_misread_as_bpp():
    """CUR (type 2) directory entries carry the HOTSPOT in bytes 4-7,
    not planes/bitcount — the best-entry tiebreak must not read
    hotspot-Y as depth (r8 ADVICE: a same-area shallower image with a
    big hotspot-Y used to win).  Two same-area 32bpp entries, the
    second with hotspot (0, 9999): the FIRST must still be picked."""
    rng = np.random.default_rng(8)
    a = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    b = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    img_a = mm.encode_ico(a)[22:]
    img_b = mm.encode_ico(b)[22:]
    e1 = struct.pack("<BBBBHHII", 8, 8, 0, 0, 0, 0, len(img_a), 38)
    e2 = struct.pack("<BBBBHHII", 8, 8, 0, 0, 0, 9999, len(img_b),
                     38 + len(img_a))
    blob = struct.pack("<HHH", 0, 2, 2) + e1 + e2 + img_a + img_b
    assert np.array_equal(mm.decode_image(blob), a)
    # the same layout as an ICO (type 1) legitimately tiebreaks on
    # bitcount, so entry 2's (planes=0, bitcount=9999) wins there —
    # pinning that the CUR branch, not a behavior change, is what fixed
    # the cursor case
    blob_ico = struct.pack("<HHH", 0, 1, 2) + e1 + e2 + img_a + img_b
    assert np.array_equal(mm.decode_image(blob_ico), b)
