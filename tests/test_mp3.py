"""MPEG-audio framing pins: the REAL external asset (gsutil's public
test.mp3, an MPEG-2 Layer III 64 kbps 22.05 kHz mono stream behind an
ID3v2 tag) must parse as a STRICT frame chain covering every byte —
each header's computed size landing exactly on the next sync is the
self-check that validates the bitrate/samplerate/padding arithmetic
without needing a decoder — plus crafted streams for every layer's
size formula, ID3 skipping, resync, hostile input, and the honest
Layer-III decode refusal routed through decode_audio."""

from __future__ import annotations

import os

import pytest

from streamsum_spark.operators import mp3
from streamsum_spark.operators import multimodal as mm


def _data(name: str) -> bytes:
    with open(os.path.join(os.path.dirname(__file__), "data", name), "rb") as fh:
        return fh.read()


def _hdr(version_bits, layer_bits, br_idx, sr_idx, pad=0, mode=3, prot=1):
    h = (0x7FF << 21) | (version_bits << 19) | (layer_bits << 17) | (
        prot << 16
    ) | (br_idx << 12) | (sr_idx << 10) | (pad << 9) | (mode << 6)
    return h.to_bytes(4, "big")


def test_external_asset_strict_chain_and_metadata():
    b = _data("ext_mpeg2_l3.mp3")
    frames = mp3.parse_mp3_frames(b)  # strict: no resync allowed
    assert frames[0].offset == 32  # ID3v2 (22-byte body) skipped
    assert frames[-1].offset + frames[-1].size == len(b)  # full coverage
    assert sorted({f.size for f in frames}) == [208, 209]  # padding mix
    info = mp3.mp3_stream_info(b)
    assert info == {
        "n_frames": 45, "mpeg_version": "2", "layer": 3,
        "sample_rate": 22050, "channels": 1, "bitrate_kbps": 64,
        "vbr": False, "duration_ms": 1176, "has_crc": False,
    }


@pytest.mark.parametrize(
    "version_bits,layer_bits,br_idx,sr_idx,size,samples",
    [
        (3, 3, 4, 1, 128, 384),    # MPEG-1 Layer I 128k/48k: (12*128000/48000)*4
        (3, 2, 4, 0, 208, 1152),   # MPEG-1 Layer II 64k/44.1k: 144*64000/44100
        (3, 1, 10, 2, 720, 1152),  # MPEG-1 Layer III 160k/32k: 144*160000/32000
        (2, 1, 8, 0, 208, 576),    # MPEG-2 LSF Layer III 64k/22.05k
        (0, 1, 9, 2, 720, 576),    # MPEG-2.5 Layer III 80k/8k: 72*80000/8000
    ],
)
def test_frame_size_formulas(version_bits, layer_bits, br_idx, sr_idx, size, samples):
    hdr = _hdr(version_bits, layer_bits, br_idx, sr_idx)
    blob = hdr + b"\x00" * (size - 4)
    (fr,) = mp3.parse_mp3_frames(blob)
    assert (fr.size, fr.samples) == (size, samples)


def test_padding_and_chain():
    """Two CBR frames, second padded: the chain must land exactly."""
    f1 = _hdr(3, 1, 10, 2) + b"\x00" * 716          # 720
    f2 = _hdr(3, 1, 10, 2, pad=1) + b"\x00" * 717   # 721
    frames = mp3.parse_mp3_frames(f1 + f2)
    assert [f.size for f in frames] == [720, 721]
    assert frames[1].padded and not frames[0].padded


def test_id3v2_and_id3v1_are_skipped():
    body = _hdr(3, 1, 10, 2) + b"\x00" * 716
    id3v2 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 10]) + b"\x00" * 10
    id3v1 = b"TAG" + b"\x00" * 125
    frames = mp3.parse_mp3_frames(id3v2 + body + id3v1)
    assert len(frames) == 1 and frames[0].offset == 20


def test_vbr_mix_reports_average_and_flag():
    f1 = _hdr(3, 1, 10, 2) + b"\x00" * 716           # 160k
    f2 = _hdr(3, 1, 9, 2) + b"\x00" * 572            # 128k -> 576 bytes
    info = mp3.mp3_stream_info(f1 + f2)
    assert info["vbr"] and info["bitrate_kbps"] == 144


def test_hostile_inputs_value_error_only():
    with pytest.raises(ValueError):
        mp3.parse_mp3_frames(b"")
    with pytest.raises(ValueError):  # sync with free-format bitrate
        mp3.parse_mp3_frames(_hdr(3, 1, 0, 2) + b"\x00" * 100)
    with pytest.raises(ValueError):  # truncated mid-frame, single frame
        mp3.parse_mp3_frames((_hdr(3, 1, 10, 2) + b"\x00" * 716)[:100])
    with pytest.raises(ValueError):  # non-syncsafe ID3 size byte
        mp3.parse_mp3_frames(b"ID3\x04\x00\x00" + bytes([0x80, 0, 0, 0]))
    # mid-stream garbage: strict raises, bounded resync recovers
    f = _hdr(3, 1, 10, 2) + b"\x00" * 716
    noisy = f + b"\x55" * 33 + f
    with pytest.raises(ValueError):
        mp3.parse_mp3_frames(noisy)
    assert len(mp3.parse_mp3_frames(noisy, max_resync=1)) == 2


def test_mutation_fuzz_value_error_contract():
    """Bit flips across the real asset must parse, ValueError, or (for
    flips inside frame payloads) still chain — never leak struct/index
    errors or hang."""
    base = bytearray(_data("ext_mpeg2_l3.mp3"))
    import random

    rnd = random.Random(9)
    for _ in range(300):
        b = bytearray(base)
        for _ in range(rnd.randrange(1, 4)):
            b[rnd.randrange(len(b))] ^= 1 << rnd.randrange(8)
        try:
            mp3.parse_mp3_frames(bytes(b))
        except ValueError:
            pass


def test_decode_refusal_routes_through_decode_audio():
    """decode_audio sniffs MPEG audio (ID3 tag or sync byte) and raises
    the honest NotImplementedError — which extract_features maps to a
    decoded=false fingerprint row, the quarantine path — while MALFORMED
    MPEG streams still raise ValueError."""
    b = _data("ext_mpeg2_l3.mp3")
    with pytest.raises(NotImplementedError, match="B.7"):
        mm.decode_audio(b)
    with pytest.raises(ValueError):
        mm.decode_audio(b"\xff\xe3" + b"\x00" * 10)  # sync but no valid frame


def test_extract_features_quarantines_mp3(spark):
    rows = [(1, "audio/mpeg", None, None, 1176, bytearray(_data("ext_mpeg2_l3.mp3")))]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = mm.extract_features(media).collect()[0]
    assert out.decoded is False and len(out.feature) == 8


def test_truncated_id3_cannot_hang(spark_noop=None):
    """A truncated ID3 header — at stream start OR mid-stream — must
    ValueError immediately: the old skip returned the cursor unchanged
    and parse_mp3_frames' `continue` spun forever, wedging the executor
    task on a 5-byte hostile blob (r9 review finding)."""
    with pytest.raises(ValueError, match="ID3"):
        mp3.parse_mp3_frames(b"ID3\x00\x00")
    f = _hdr(3, 1, 10, 2) + b"\x00" * 716
    with pytest.raises(ValueError, match="ID3"):
        mp3.parse_mp3_frames(f + b"ID3\x04\x00", max_resync=5)


def test_xing_detection_at_side_info_offset_only():
    """'Info' bytes inside the compressed payload must NOT flag VBR; a
    Xing/Info marker at the spec offset (4 + side-info size, here
    MPEG-1 mono = 17) must (r9 review finding: whole-payload substring
    scan misflagged CBR streams)."""
    hdr = _hdr(3, 1, 10, 2)
    body = bytearray(716)
    body[300:304] = b"Info"
    assert mp3.mp3_stream_info(hdr + bytes(body))["vbr"] is False
    body2 = bytearray(716)
    body2[17:21] = b"Xing"
    assert mp3.mp3_stream_info(hdr + bytes(body2))["vbr"] is True


def test_id3_tagged_flac_resniffed_and_decoded():
    """An ID3v2 tag commonly prefixes FLAC files in the wild: the sniff
    must skip the tag and re-detect fLaC instead of quarantining the
    blob down the MPEG refusal path (r9 ADVICE)."""
    import numpy as np

    from streamsum_spark.operators.flac import encode_flac

    tone = (np.sin(np.arange(512) / 7.0) * 12000).astype(np.int16)
    flac = encode_flac(tone, rate=8000)
    ref, ref_rate = mm.decode_audio(flac)
    payload = b"\x00" * 64
    tag = b"ID3\x04\x00\x00" + bytes(
        [(len(payload) >> s) & 0x7F for s in (21, 14, 7, 0)]
    )
    got, rate = mm.decode_audio(tag + payload + flac)
    assert rate == ref_rate and np.array_equal(got, ref)
    # an ID3 tag followed by neither fLaC nor MPEG sync still refuses
    # via the MPEG path (framing ValueError), not a silent success
    with pytest.raises(ValueError):
        mm.decode_audio(tag + payload + b"\x00" * 32)
