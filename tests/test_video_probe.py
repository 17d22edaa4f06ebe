"""Pins for the video container probes: crafted MP4 (v0+v1 fullboxes,
64-bit largesize, nested track layout) and WebM/EBML fixtures built
box-by-box from the specs, hostile-input bounds (no hangs, ValueError
past the magic), and the Spark plumbing contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from streamsum_spark.operators.video_probe import (
    probe_ebml,
    probe_media,
    probe_mp4,
    probe_video,
)


# --- fixture builders -------------------------------------------------------

def box(btype: bytes, payload: bytes, large: bool = False) -> bytes:
    if large:
        return struct.pack(">I4sQ", 1, btype, 16 + len(payload)) + payload
    return struct.pack(">I4s", 8 + len(payload), btype) + payload


def full(version: int, payload: bytes) -> bytes:
    return bytes([version, 0, 0, 0]) + payload


def mvhd(timescale, duration, version=0) -> bytes:
    if version == 1:
        p = struct.pack(">QQIQ", 0, 0, timescale, duration)
    else:
        p = struct.pack(">IIII", 0, 0, timescale, duration)
    return box(b"mvhd", full(version, p + b"\x00" * 80))


def tkhd(track_id, w, h, version=0) -> bytes:
    if version == 1:
        head = struct.pack(">QQI", 0, 0, track_id) + b"\x00" * 4 + struct.pack(">Q", 0)
    else:
        head = struct.pack(">III", 0, 0, track_id) + b"\x00" * 4 + struct.pack(">I", 0)
    tail = b"\x00" * 52 + struct.pack(">II", w << 16, h << 16)
    return box(b"tkhd", full(version, head + tail))


def mdhd(timescale, duration, lang="eng", version=0) -> bytes:
    packed = 0
    for c in lang:
        packed = (packed << 5) | (ord(c) - 0x60)
    if version == 1:
        p = struct.pack(">QQIQH", 0, 0, timescale, duration, packed) + b"\x00\x00"
    else:
        p = struct.pack(">IIIIH", 0, 0, timescale, duration, packed) + b"\x00\x00"
    return box(b"mdhd", full(version, p))


def hdlr(handler: bytes) -> bytes:
    return box(b"hdlr", full(0, b"\x00" * 4 + handler + b"\x00" * 13))


def stsd(*fourccs: bytes) -> bytes:
    entries = b"".join(
        struct.pack(">I4s", 16, fc) + b"\x00" * 8 for fc in fourccs
    )
    return box(b"stsd", full(0, struct.pack(">I", len(fourccs)) + entries))


def trak(track_id, w, h, handler, codec, ts, dur, lang="eng", v=0) -> bytes:
    stbl = box(b"stbl", stsd(codec))
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", mdhd(ts, dur, lang, v) + hdlr(handler) + minf)
    return box(b"trak", tkhd(track_id, w, h, v) + mdia)


def make_mp4(version=0, large_moov=False) -> bytes:
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"mp41avc1")
    moov = box(
        b"moov",
        mvhd(1000, 5000, version)
        + trak(1, 640, 360, b"vide", b"avc1", 30000, 150000, "eng", version)
        + trak(2, 0, 0, b"soun", b"mp4a", 48000, 240000, "fra", version),
        large=large_moov,
    )
    free = box(b"free", b"\x00" * 16)
    mdat = box(b"mdat", b"\xde\xad" * 32)
    return ftyp + free + moov + mdat


def ebml_elem(eid: int, payload: bytes) -> bytes:
    idb = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
    n = len(payload)
    assert n < 0x3FFE
    return idb + struct.pack(">H", 0x4000 | n) + payload


def euint(eid: int, v: int) -> bytes:
    return ebml_elem(eid, v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big"))


def make_webm(unknown_segment_size=False) -> bytes:
    header = ebml_elem(
        0x1A45DFA3,
        euint(0x4286, 1) + ebml_elem(0x4282, b"webm") + euint(0x4287, 4),
    )
    info = ebml_elem(
        0x1549A966,
        euint(0x2AD7B1, 1_000_000) + ebml_elem(0x4489, struct.pack(">d", 12345.0)),
    )
    video = ebml_elem(0xE0, euint(0xB0, 1280) + euint(0xBA, 720))
    t1 = ebml_elem(
        0xAE,
        euint(0xD7, 1) + euint(0x83, 1) + ebml_elem(0x86, b"V_VP9")
        + ebml_elem(0x22B59C, b"eng") + video,
    )
    t2 = ebml_elem(
        0xAE, euint(0xD7, 2) + euint(0x83, 2) + ebml_elem(0x86, b"A_OPUS")
    )
    tracks = ebml_elem(0x1654AE6B, t1 + t2)
    seg_payload = info + tracks
    if unknown_segment_size:
        seg = (0x18538067).to_bytes(4, "big") + b"\xff" + seg_payload
    else:
        seg = ebml_elem(0x18538067, seg_payload)
    return header + seg


# --- MP4 --------------------------------------------------------------------

@pytest.mark.parametrize("version", [0, 1])
@pytest.mark.parametrize("large", [False, True])
def test_mp4_probe_full_layout(version, large):
    d = probe_mp4(make_mp4(version, large))
    assert d["container"] == "mp4" and d["brand"] == "isom"
    assert d["duration_ms"] == 5000 * 1000 // 1000
    v, a = d["tracks"]
    assert v == {
        "track_id": 1, "handler": "vide", "codec": "avc1", "width": 640,
        "height": 360, "duration_ms": 150000 * 1000 // 30000, "lang": "eng",
    }
    assert a["handler"] == "soun" and a["codec"] == "mp4a"
    assert a["lang"] == "fra" and a["width"] is None and a["duration_ms"] == 5000


def test_mp4_probe_via_router_and_no_moov():
    assert probe_video(make_mp4())["brand"] == "isom"
    only_ftyp = box(b"ftyp", b"mp42" + b"\x00" * 4)
    d = probe_mp4(only_ftyp)
    assert d["brand"] == "mp42" and d["duration_ms"] is None and d["tracks"] == []


def test_mp4_hostile_inputs_bounded():
    good = make_mp4()
    # size field pointing past the end
    bad = bytearray(good)
    struct.pack_into(">I", bad, 0, len(good) + 100)
    with pytest.raises(ValueError):
        probe_mp4(bytes(bad))
    # size smaller than the header (would loop without the guard)
    with pytest.raises(ValueError):
        probe_mp4(struct.pack(">I4s", 4, b"ftyp") + b"\x00" * 8)
    # truncations at every prefix: ValueError/metadata, never a hang
    for cut in range(0, len(good), 7):
        try:
            probe_mp4(good[:cut])
        except ValueError:
            pass
    # box-count budget: thousands of empty boxes then ftyp
    flood = box(b"free", b"") * 5000
    with pytest.raises(ValueError):
        probe_mp4(flood)


def test_not_a_container_raises():
    with pytest.raises(ValueError):
        probe_video(b"\x89PNG\r\n\x1a\n" + b"\x00" * 20)
    with pytest.raises(ValueError):
        probe_video(b"")


# --- EBML / WebM ------------------------------------------------------------

@pytest.mark.parametrize("unknown", [False, True])
def test_webm_probe(unknown):
    d = probe_ebml(make_webm(unknown_segment_size=unknown))
    assert d["container"] == "webm" and d["brand"] == "webm"
    assert d["duration_ms"] == 12345
    v, a = d["tracks"]
    assert v == {
        "track_id": 1, "handler": "vide", "codec": "V_VP9", "width": 1280,
        "height": 720, "duration_ms": None, "lang": "eng",
    }
    assert a["handler"] == "soun" and a["codec"] == "A_OPUS"
    assert probe_video(make_webm())["brand"] == "webm"


def test_ebml_hostile_inputs_bounded():
    good = make_webm()
    for cut in range(4, len(good), 5):
        try:
            probe_ebml(good[:cut])
        except ValueError:
            pass
    with pytest.raises(ValueError):
        probe_ebml(b"\x1a\x45\xdf\xa3" + b"\x00" * 32)  # zero vint
    flood = ebml_elem(0xEC, b"") * 10000  # Void elements over budget
    with pytest.raises(ValueError):
        probe_ebml(flood)


# --- Spark plumbing ---------------------------------------------------------

def test_probe_media_plumbing(spark):
    rows = [
        (1, bytearray(make_mp4())),
        (2, bytearray(make_webm())),
        (3, bytearray(b"not video at all")),
        (4, None),
    ]
    media = spark.createDataFrame(rows, "media_id long, content binary").repartition(2)
    out = {r.media_id: r for r in probe_media(media).collect()}
    assert out[1].probed and out[1].container == "mp4" and out[1].n_tracks == 2
    assert out[1].duration_ms == 5000
    assert out[1].tracks[0].codec == "avc1" and out[1].tracks[0].width == 640
    assert out[2].probed and out[2].container == "webm"
    assert out[2].tracks[0].codec == "V_VP9" and out[2].tracks[1].handler == "soun"
    for mid in (3, 4):
        assert not out[mid].probed and out[mid].tracks is None


def test_unknown_durations_are_null_not_garbage():
    """All-ones mvhd/mdhd durations mean 'unknown' (ISO 14496-12) and a
    hostile inf EBML Duration must refuse as ValueError, not escape as
    OverflowError past probe_media's isolation."""
    unk = box(
        b"moov",
        box(b"mvhd", full(0, struct.pack(">IIII", 0, 0, 1000, 0xFFFFFFFF) + b"\x00" * 80)),
    )
    d = probe_mp4(box(b"ftyp", b"isom" + b"\x00" * 4) + unk)
    assert d["duration_ms"] is None
    inf_webm = ebml_elem(
        0x18538067,
        ebml_elem(0x1549A966, ebml_elem(0x4489, struct.pack(">d", float("inf")))),
    )
    with pytest.raises(ValueError):
        probe_ebml(inf_webm)


def test_probe_mutation_fuzz_bounded():
    """300 random single/multi-byte mutations of valid fixtures: the
    probe either returns metadata or raises ValueError — never hangs,
    never escapes another exception type (the isolation contract
    probe_media relies on)."""
    import random

    rng = random.Random(42)
    goods = [make_mp4(), make_mp4(1, True), make_webm(), make_webm(True)]
    for _ in range(300):
        b = bytearray(rng.choice(goods))
        for _ in range(rng.randint(1, 4)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            probe_video(bytes(b))
        except ValueError:
            pass


def test_with_probed_duration(spark):
    from streamsum_spark.operators.video_probe import with_probed_duration
    from streamsum_spark.operators.multimodal import frame_sample_plan

    rows = [
        (1, "video/mp4", None, bytearray(make_mp4())),     # filled by probe
        (2, "video/mp4", 777, bytearray(make_mp4())),      # metadata wins
        (3, "image/png", None, bytearray(b"not video")),   # stays null
    ]
    media = spark.createDataFrame(
        rows, "media_id long, mime string, duration_ms long, content binary"
    )
    out = {r.media_id: r for r in with_probed_duration(media).collect()}
    assert out[1].duration_ms == 5000
    assert out[2].duration_ms == 777
    assert out[3].duration_ms is None
    # the filled column drives the sample plan
    plan = frame_sample_plan(with_probed_duration(media), every_ms=1000)
    n = plan.groupBy("media_id").count().collect()
    assert {r.media_id: r["count"] for r in n} == {1: 5, 2: 1}


def test_head_bounded_probe_equals_full():
    """Round-12 head feed (sources/blobs.py): a head that covers the
    header but cuts the payload probes identically to the full blob —
    moov-first MP4 with a truncated mdat, WebM with a truncated
    Cluster, and AVI cut inside movi."""
    from streamsum_spark.operators.avi import encode_avi_mjpeg, probe_avi

    full_mp4 = make_mp4() + box(b"mdat", b"\x00" * 4096)
    head_mp4 = full_mp4[: len(make_mp4()) + 64]  # cuts inside mdat
    assert probe_mp4(head_mp4) == probe_mp4(full_mp4)

    cluster = ebml_elem(0x1F43B675, b"\x00" * 2048)
    base = make_webm()
    # graft the cluster INSIDE the Segment: rebuild with payload + cluster
    hdr = ebml_elem(
        0x1A45DFA3,
        euint(0x4286, 1) + ebml_elem(0x4282, b"webm") + euint(0x4287, 4),
    )
    seg_payload = base[len(hdr) :]
    # strip the outer Segment wrapper, re-wrap with the cluster added
    sid = (0x18538067).to_bytes(4, "big")
    assert seg_payload.startswith(sid)
    inner = seg_payload[6:]  # 4 id + 2 size bytes (ebml_elem layout)
    full_webm = hdr + ebml_elem(0x18538067, inner + cluster)
    head_webm = full_webm[: len(full_webm) - 1024]  # cuts inside cluster
    assert probe_ebml(head_webm) == probe_ebml(full_webm)

    frames = [np.zeros((16, 16, 3), np.uint8) for _ in range(4)]
    full_avi = encode_avi_mjpeg(frames, rate=10)
    head_avi = full_avi[: len(full_avi) // 2]  # cuts inside movi
    assert probe_avi(head_avi) == probe_avi(full_avi)
