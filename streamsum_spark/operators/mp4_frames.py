"""MP4/QuickTime sample-table parsing + MJPEG-in-MP4 frame decode.

video_probe.py reads the MP4 container's *descriptive* metadata; this
module reads the sample tables (ISO/IEC 14496-12 §8.5-8.7: stsd, stts,
stsc, stsz, stco/co64) — the index that maps sample number → file
offset, size, and decode time — and decodes the one video codec class
this engine can honestly decode: MJPEG ('jpeg' / 'mjpa' sample
entries, each sample a self-contained baseline JPEG; Photo-JPEG and
MJPEG-A are the formats QuickTime-era cameras and scientific capture
rigs actually produced).  'mjpb' (MJPEG-B) is NOT a JPEG bitstream
(its markers are rewritten) and refuses, as do avc1/hev1/vp09/av01 —
no codec exists in this container and a fake decode would misreport
content.

Same contracts as operators/avi.py:
- frames route through multimodal.decode_image → the JVM sidecar fast
  path + sampled spec verification apply per frame; the Annex K.3
  default-Huffman splice handles table-less samples;
- the frame clock is analytic (stts deltas over the mdhd timescale), so
  iter_mp4_frames_at decodes ONLY the selected samples, one live at a
  time — the sampled-extraction scale path;
- hostile-input bounds: the box walk reuses video_probe's budgeted
  walker; sample counts and table sizes are budget-capped; offsets are
  validated against the blob before any slice.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np

from streamsum_spark.operators._compositing import (
    MAX_FRAMES_BYTES as _MAX_FRAMES_BYTES,
    check_canvas as _check_canvas,
)
from streamsum_spark.operators.video_probe import (
    _find,
    _fullbox,
    _mp4_boxes,
)

_MAX_SAMPLES = 1_000_000
_MJPEG_CODECS = (b"jpeg", b"mjpa")


def _u32s(b: bytes, s: int, n: int) -> list[int]:
    if s + 4 * n > len(b):
        raise ValueError("truncated MP4 sample table")
    return list(struct.unpack_from(f">{n}I", b, s))


def _parse_stts(b: bytes, s: int, e: int) -> list[tuple[int, int]]:
    _, p = _fullbox(b, s)
    (n,) = _u32s(b, p, 1)
    if n > _MAX_SAMPLES:
        raise ValueError("implausible stts entry count")
    vals = _u32s(b, p + 4, 2 * n)
    return [(vals[2 * i], vals[2 * i + 1]) for i in range(n)]


def _parse_stsz(b: bytes, s: int, e: int) -> list[int]:
    _, p = _fullbox(b, s)
    uniform, count = _u32s(b, p, 2)
    if count > _MAX_SAMPLES:
        raise ValueError("implausible stsz sample count")
    if uniform:
        return [uniform] * count
    return _u32s(b, p + 8, count)


def _parse_stsc(b: bytes, s: int, e: int) -> list[tuple[int, int]]:
    """[(first_chunk 1-based, samples_per_chunk)] runs."""
    _, p = _fullbox(b, s)
    (n,) = _u32s(b, p, 1)
    if n > _MAX_SAMPLES:
        raise ValueError("implausible stsc entry count")
    vals = _u32s(b, p + 4, 3 * n)
    return [(vals[3 * i], vals[3 * i + 1]) for i in range(n)]


def _parse_stco(b: bytes, s: int, e: int, large: bool) -> list[int]:
    _, p = _fullbox(b, s)
    (n,) = _u32s(b, p, 1)
    if n > _MAX_SAMPLES:
        raise ValueError("implausible chunk-offset count")
    if not large:
        return _u32s(b, p + 4, n)
    if p + 4 + 8 * n > len(b):
        raise ValueError("truncated co64")
    return list(struct.unpack_from(f">{n}Q", b, p + 4))


def _sample_offsets(
    sizes: list[int], stsc: list[tuple[int, int]], chunks: list[int]
) -> list[int]:
    """File offset per sample: stsc runs assign samples to chunks;
    samples are contiguous within a chunk starting at its stco offset."""
    if not stsc or not chunks:
        raise ValueError("MP4 stbl without stsc/stco")
    offsets: list[int] = []
    si = 0
    for run, (first, per) in enumerate(stsc):
        last = stsc[run + 1][0] - 1 if run + 1 < len(stsc) else len(chunks)
        if per <= 0 or first < 1:
            raise ValueError("corrupt stsc run")
        for ci in range(first - 1, last):
            if ci >= len(chunks) or si >= len(sizes):
                break
            pos = chunks[ci]
            for _ in range(per):
                if si >= len(sizes):
                    break
                offsets.append(pos)
                pos += sizes[si]
                si += 1
    if si < len(sizes):
        raise ValueError("MP4 stsc runs cover fewer samples than stsz")
    return offsets


def _video_sample_table(b: bytes) -> dict:
    """Locate the first video trak whose stsd names an MJPEG codec and
    return its decode plan: sample offsets/sizes, per-sample start_ms,
    dims.  NotImplementedError for other codecs (honest refusal),
    ValueError for malformed structure."""
    budget = [4096]
    moov = None
    for t, s, e in _mp4_boxes(b, 0, len(b), budget):
        if t == b"moov":
            moov = (s, e)
            break
    if moov is None:
        raise ValueError("MP4 without moov")
    seen_codecs: list[str] = []
    for t, s, e in _mp4_boxes(b, moov[0], moov[1], budget):
        if t != b"trak":
            continue
        mdia = _find(b, s, e, b"mdia", budget)
        if not mdia:
            continue
        hdlr = _find(b, mdia[0], mdia[1], b"hdlr", budget)
        if not hdlr or b[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        mdhd = _find(b, mdia[0], mdia[1], b"mdhd", budget)
        if not mdhd:
            raise ValueError("video trak without mdhd")
        v, p = _fullbox(b, mdhd[0])
        timescale = struct.unpack_from(
            ">I", b, p + (16 if v == 1 else 8)
        )[0]
        if timescale == 0:
            raise ValueError("mdhd timescale 0")
        minf = _find(b, mdia[0], mdia[1], b"minf", budget)
        stbl = minf and _find(b, minf[0], minf[1], b"stbl", budget)
        if not stbl:
            raise ValueError("video trak without stbl")
        stsd = _find(b, stbl[0], stbl[1], b"stsd", budget)
        if not stsd:
            raise ValueError("stbl without stsd")
        _, sp = _fullbox(b, stsd[0])
        codec = b[sp + 8 : sp + 12]
        seen_codecs.append(codec.decode("latin-1").strip())
        if codec not in _MJPEG_CODECS:
            continue
        # VisualSampleEntry: width/height at +24/+26 GLOBAL to entry
        w, h = struct.unpack_from(">HH", b, sp + 4 + 8 + 24)
        stts = _find(b, stbl[0], stbl[1], b"stts", budget)
        stsz = _find(b, stbl[0], stbl[1], b"stsz", budget)
        stsc = _find(b, stbl[0], stbl[1], b"stsc", budget)
        stco = _find(b, stbl[0], stbl[1], b"stco", budget)
        co64 = _find(b, stbl[0], stbl[1], b"co64", budget)
        if not (stts and stsz and stsc and (stco or co64)):
            raise ValueError("MJPEG trak with incomplete sample tables")
        sizes = _parse_stsz(b, *stsz)
        chunks = _parse_stco(b, *(stco or co64), large=stco is None)
        offsets = _sample_offsets(sizes, _parse_stsc(b, *stsc), chunks)
        starts_ms: list[int] = []
        t_units = 0
        for count, delta in _parse_stts(b, *stts):
            for _ in range(min(count, len(sizes) - len(starts_ms))):
                starts_ms.append(t_units * 1000 // timescale)
                t_units += delta
        if len(starts_ms) < len(sizes):
            raise ValueError("stts covers fewer samples than stsz")
        end_ms = t_units * 1000 // timescale
        for off, sz in zip(offsets, sizes):
            if off + sz > len(b):
                raise ValueError("MP4 sample outside the blob")
        if w and h:
            _check_canvas(w, h, "MP4")
        return {
            "offsets": offsets, "sizes": sizes, "starts_ms": starts_ms,
            "end_ms": end_ms, "width": w, "height": h,
        }
    if seen_codecs:
        raise NotImplementedError(
            f"MP4 video codec {'/'.join(seen_codecs)} not supported "
            "(MJPEG 'jpeg'/'mjpa' only)"
        )
    raise ValueError("MP4 without a video trak")


def _decode_sample(b: bytes, off: int, sz: int) -> np.ndarray:
    from streamsum_spark.operators.avi import _with_default_dht
    from streamsum_spark.operators.multimodal import decode_image

    payload = b[off : off + sz]
    if payload[:2] != b"\xff\xd8":
        raise ValueError("MP4 MJPEG sample without JPEG SOI")
    return decode_image(_with_default_dht(payload))


def decode_mp4_frames(content: bytes) -> list[tuple[int, int, np.ndarray]]:
    """All frames of an MJPEG MP4/MOV as [(start_ms, duration_ms,
    (h, w, 3) uint8 RGB)] — the decode_frames contract."""
    b = bytes(content)
    st = _video_sample_table(b)
    n = len(st["sizes"])
    if st["width"] and st["height"]:
        if st["width"] * st["height"] * 3 * n > _MAX_FRAMES_BYTES:
            raise ValueError("MP4 decoded output exceeds the frame cap")
    out: list[tuple[int, int, np.ndarray]] = []
    budget_bytes = 0
    for i in range(n):
        px = _decode_sample(b, st["offsets"][i], st["sizes"][i])
        budget_bytes += px.nbytes
        if budget_bytes > _MAX_FRAMES_BYTES:
            raise ValueError("MP4 decoded output exceeds the frame cap")
        nxt = st["starts_ms"][i + 1] if i + 1 < n else st["end_ms"]
        out.append((st["starts_ms"][i], nxt - st["starts_ms"][i], px))
    return out


def iter_mp4_frames_at(
    content: bytes, ts_list: list[int]
) -> Iterator[tuple[int, np.ndarray]]:
    """Lazily yield (frame_idx, pixels) per timestamp, decoding ONLY
    the selected samples with a one-frame cache — iter_avi_frames_at's
    contract on the MP4 sample table (stts gives the analytic clock,
    every MJPEG sample is independent)."""
    import bisect

    b = bytes(content)
    st = _video_sample_table(b)
    starts = st["starts_ms"]
    cached: tuple[int, np.ndarray] | None = None
    for t in ts_list:
        j = max(0, bisect.bisect_right(starts, int(t)) - 1)
        if cached is None or cached[0] != j:
            cached = (j, _decode_sample(b, st["offsets"][j], st["sizes"][j]))
        yield j, cached[1]


def decode_mp4_audio(content: bytes) -> tuple[np.ndarray, int]:
    """The first PCM audio track as ((n, ch) int16, rate) — the
    decode_audio contract, mirroring avi.decode_avi_audio.

    QuickTime/MOV PCM sample entries decode for real: 'sowt'
    (little-endian 16-bit), 'twos' (big-endian 16-bit).  Compressed
    audio ('mp4a' AAC, ...) refuses by codec name — no decoder exists
    in this container.  Sample data is located by the same
    stsc/stsz/stco walk as video; for PCM, one "sample" is one FRAME
    (stsz is typically uniform at the frame size), so the chunks'
    byte runs concatenate into the stream."""
    b = bytes(content)
    budget = [4096]
    moov = None
    for t, s, e in _mp4_boxes(b, 0, len(b), budget):
        if t == b"moov":
            moov = (s, e)
            break
    if moov is None:
        raise ValueError("MP4 without moov")
    seen: list[str] = []
    for t, s, e in _mp4_boxes(b, moov[0], moov[1], budget):
        if t != b"trak":
            continue
        mdia = _find(b, s, e, b"mdia", budget)
        if not mdia:
            continue
        hdlr = _find(b, mdia[0], mdia[1], b"hdlr", budget)
        if not hdlr or b[hdlr[0] + 8 : hdlr[0] + 12] != b"soun":
            continue
        minf = _find(b, mdia[0], mdia[1], b"minf", budget)
        stbl = minf and _find(b, minf[0], minf[1], b"stbl", budget)
        if not stbl:
            raise ValueError("audio trak without stbl")
        stsd = _find(b, stbl[0], stbl[1], b"stsd", budget)
        if not stsd:
            raise ValueError("stbl without stsd")
        _, sp = _fullbox(b, stsd[0])
        codec = b[sp + 8 : sp + 12]
        seen.append(codec.decode("latin-1").strip())
        if codec not in (b"sowt", b"twos"):
            continue
        # SoundSampleDescription v0: after the 8-byte entry header,
        # 6 reserved + 2 dref + 2 version + 2 revision + 4 vendor,
        # then channels(2) samplesize(2) at entry+24..27 and the
        # 16.16 samplerate at entry+32
        ch, bits = struct.unpack_from(">HH", b, sp + 4 + 24)
        rate = struct.unpack_from(">I", b, sp + 4 + 32)[0] >> 16
        if ch < 1 or rate == 0:
            raise ValueError("corrupt audio sample entry")
        if bits != 16:
            raise NotImplementedError(
                f"MP4 PCM with {bits}-bit samples not supported"
            )
        stsz = _find(b, stbl[0], stbl[1], b"stsz", budget)
        stsc = _find(b, stbl[0], stbl[1], b"stsc", budget)
        stco = _find(b, stbl[0], stbl[1], b"stco", budget)
        co64 = _find(b, stbl[0], stbl[1], b"co64", budget)
        if not (stsz and stsc and (stco or co64)):
            raise ValueError("PCM trak with incomplete sample tables")
        sizes = _parse_stsz(b, *stsz)
        chunks = _parse_stco(b, *(stco or co64), large=stco is None)
        offsets = _sample_offsets(sizes, _parse_stsc(b, *stsc), chunks)
        for off, sz in zip(offsets, sizes):
            if off + sz > len(b):
                raise ValueError("MP4 sample outside the blob")
        data = b"".join(b[off : off + sz] for off, sz in zip(offsets, sizes))
        dt = "<i2" if codec == b"sowt" else ">i2"
        n = len(data) // (2 * ch)
        samples = (
            np.frombuffer(data[: n * 2 * ch], dtype=dt)
            .reshape(n, ch)
            .astype(np.int16)
        )
        return samples, rate
    if seen:
        raise NotImplementedError(
            f"MP4 audio codec {'/'.join(seen)} not supported "
            "(PCM 'sowt'/'twos' only)"
        )
    raise ValueError("MP4 without an audio trak")


# ---------------------------------------------------------------------------
# fixture encoder (also the proof the table parsers read real layouts)
# ---------------------------------------------------------------------------


def encode_mp4_mjpeg(
    frames: list[np.ndarray],
    timescale: int = 1000,
    delta: int = 100,
    quality: int = 90,
) -> bytes:
    """Minimal ISO-BMFF Photo-JPEG movie: ftyp + mdat (concatenated
    JPEG samples) + moov with real stts/stsc/stsz/stco tables (two
    chunks to exercise stsc runs)."""
    from streamsum_spark.operators.jpeg import encode_jpeg

    def box(t: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + t + payload

    def full(t: bytes, payload: bytes, version: int = 0) -> bytes:
        return box(t, bytes([version, 0, 0, 0]) + payload)

    h, w = frames[0].shape[:2]
    samples = [encode_jpeg(f, quality=quality) for f in frames]
    n = len(samples)
    ftyp = box(b"ftyp", b"qt  " + struct.pack(">I", 0) + b"qt  ")
    # split samples into two chunks: first ceil(n/2), rest
    k = (n + 1) // 2
    chunk1 = b"".join(samples[:k])
    chunk2 = b"".join(samples[k:])
    mdat_payload = chunk1 + chunk2
    # mdat follows ftyp; moov follows mdat — offsets are absolute
    c1_off = len(ftyp) + 8
    c2_off = c1_off + len(chunk1)
    mdat = box(b"mdat", mdat_payload)

    dur = n * delta
    mvhd = full(b"mvhd", struct.pack(">II", 0, 0)
                + struct.pack(">II", timescale, dur) + b"\x00" * 80)
    tkhd = full(b"tkhd", struct.pack(">III", 0, 0, 1) + b"\x00" * 4
                + struct.pack(">I", dur) + b"\x00" * 52
                + struct.pack(">II", w << 16, h << 16))
    mdhd = full(b"mdhd", struct.pack(">II", 0, 0)
                + struct.pack(">II", timescale, dur)
                + struct.pack(">HH", 0x55C4, 0))
    hdlr = full(b"hdlr", b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"\x00")
    entry = (
        struct.pack(">I", 86) + b"jpeg" + b"\x00" * 6 + struct.pack(">H", 1)
        + b"\x00" * 16 + struct.pack(">HH", w, h) + b"\x00" * 50
    )
    stsd = full(b"stsd", struct.pack(">I", 1) + entry)
    stts = full(b"stts", struct.pack(">III", 1, n, delta))
    stsc = full(
        b"stsc",
        struct.pack(">I", 2 if chunk2 else 1)
        + struct.pack(">III", 1, k, 1)
        + (struct.pack(">III", 2, n - k, 1) if chunk2 else b""),
    )
    stsz = full(b"stsz", struct.pack(">II", 0, n)
                + b"".join(struct.pack(">I", len(s)) for s in samples))
    stco = full(
        b"stco",
        struct.pack(">I", 2 if chunk2 else 1)
        + struct.pack(">I", c1_off)
        + (struct.pack(">I", c2_off) if chunk2 else b""),
    )
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = box(b"minf", box(b"vmhd", b"\x00" * 12) + stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def encode_mov_pcm(
    samples: np.ndarray, rate: int, codec: bytes = b"sowt"
) -> bytes:
    """Minimal audio-only MOV: PCM16 ('sowt' LE / 'twos' BE) in two
    chunks, uniform frame-sized stsz."""

    def box(t: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + t + payload

    def full(t: bytes, payload: bytes) -> bytes:
        return box(t, b"\x00\x00\x00\x00" + payload)

    n, ch = samples.shape
    dt = "<i2" if codec == b"sowt" else ">i2"
    pcm = np.ascontiguousarray(samples.astype(dt)).tobytes()
    ftyp = box(b"ftyp", b"qt  " + struct.pack(">I", 0) + b"qt  ")
    k = (n + 1) // 2  # frames in chunk 1
    c1 = pcm[: k * 2 * ch]
    c2 = pcm[k * 2 * ch :]
    c1_off = len(ftyp) + 8
    c2_off = c1_off + len(c1)
    mdat = box(b"mdat", c1 + c2)
    mvhd = full(b"mvhd", struct.pack(">II", 0, 0)
                + struct.pack(">II", rate, n) + b"\x00" * 80)
    mdhd = full(b"mdhd", struct.pack(">II", 0, 0)
                + struct.pack(">II", rate, n) + struct.pack(">HH", 0x55C4, 0))
    hdlr = full(b"hdlr", b"\x00" * 4 + b"soun" + b"\x00" * 12 + b"\x00")
    entry = (
        struct.pack(">I", 36) + codec + b"\x00" * 6 + struct.pack(">H", 1)
        + struct.pack(">HH", 0, 0) + b"\x00" * 4
        + struct.pack(">HHHH", ch, 16, 0, 0) + struct.pack(">I", rate << 16)
    )
    stsd = full(b"stsd", struct.pack(">I", 1) + entry)
    stts = full(b"stts", struct.pack(">III", 1, n, 1))
    stsc = full(
        b"stsc",
        struct.pack(">I", 2 if c2 else 1) + struct.pack(">III", 1, k, 1)
        + (struct.pack(">III", 2, n - k, 1) if c2 else b""),
    )
    stsz = full(b"stsz", struct.pack(">II", 2 * ch, n))
    stco = full(
        b"stco",
        struct.pack(">I", 2 if c2 else 1) + struct.pack(">I", c1_off)
        + (struct.pack(">I", c2_off) if c2 else b""),
    )
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = box(b"minf", box(b"smhd", b"\x00" * 8) + stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", full(b"tkhd", b"\x00" * 80) + mdia)
    return ftyp + mdat + box(b"moov", mvhd + trak)
