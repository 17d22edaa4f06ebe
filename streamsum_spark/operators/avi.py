"""AVI (RIFF) container probe + frame decode — the first video class
with REAL sample-data decode.

Reference parity note: the reference (streamsum) has no multimodal
surface at all; this module extends SURVEY §2's LLM-pipeline posture
("video sample data stays opaque unless honestly decodable") the same
way video_probe.py did for MP4/WebM metadata.  The difference: an
MJPEG AVI's frames are plain baseline JPEGs, and a BI_RGB ('DIB') AVI's
frames are raw bottom-up BGR rows — both decodable with machinery this
repo already trusts (operators/jpeg.py incl. the JVM sidecar fast path
+ sampled verification, and the BMP row logic).  Every other AVI codec
(xvid, h264-in-avi, ...) stays an honest NotImplementedError.

Container layout (public: Microsoft "AVI RIFF File Reference" / the
OpenDML AVI spec): RIFF('AVI ') > LIST('hdrl') holding 'avih'
(MainAVIHeader: µs/frame, total frames, dims) and one LIST('strl') per
stream ('strh' AVIStreamHeader: fccType/fccHandler/scale/rate/length;
'strf' BITMAPINFOHEADER for video), then LIST('movi') holding '##dc'
(compressed) / '##db' (uncompressed DIB) frame chunks — '##' is the
zero-based stream number — optionally nested in LIST('rec ') groups.
All sizes little-endian; chunks pad to even offsets.

MJPEG quirk handled here: frames conventionally OMIT their Huffman
tables (the "AVI1" convention — players supply ITU-T T.81 Annex K.3
defaults).  _with_default_dht splices exactly those tables in front of
SOS when no DHT is present, so table-less frames decode identically to
self-contained ones (pinned in tests/test_avi.py against encode_jpeg,
which emits the same Annex K tables).

Hostile-input bounds mirror video_probe/gif: chunk budget, strict
forward progress, bounded rec-list depth, canvas + cumulative output
caps from _compositing (checked BEFORE decoding any frame).
"""

from __future__ import annotations

import struct

import numpy as np

from streamsum_spark.operators._compositing import (
    MAX_FRAMES_BYTES as _MAX_FRAMES_BYTES,
    check_canvas as _check_canvas,
)

_MAX_CHUNKS = 65536
_MAX_REC_DEPTH = 4
_MAX_STREAMS = 64

_AVIH_FMT = "<IIIIIIIIII"   # through dwHeight (reserved tail ignored)
_STRH_FMT = "<4s4sIHHIIIII"  # through dwLength


def _riff_chunks(
    b: bytes, pos: int, end: int, budget: list[int],
    tolerate_tail: bool = False,
):
    """Yield (fourcc, payload_start, payload_end) with strict forward
    progress; chunk payloads pad to even file offsets (RIFF rule).

    ``tolerate_tail`` (probe walks over HEAD-BOUNDED reads — the
    sources/blobs.py feed): a chunk extending past ``end`` stops the
    walk instead of raising — a head read legitimately cuts inside
    movi, and hdrl precedes it.  Decode paths stay strict."""
    while pos + 8 <= end:
        if budget[0] <= 0:
            raise ValueError("AVI chunk budget exceeded")
        budget[0] -= 1
        fourcc = b[pos : pos + 4]
        size = struct.unpack_from("<I", b, pos + 4)[0]
        s = pos + 8
        if s + size > end:
            if tolerate_tail:
                return
            raise ValueError("AVI chunk size out of bounds")
        yield fourcc, s, s + size
        pos = s + size + (size & 1)


def _list_payload(b: bytes, s: int, e: int, want: bytes) -> tuple[int, int] | None:
    """(payload_start, payload_end) past the 4-byte list type, if the
    LIST chunk at [s, e) is of type ``want``."""
    if e - s >= 4 and b[s : s + 4] == want:
        return s + 4, e
    return None


def _parse_hdrl(b: bytes, s: int, e: int, budget: list[int]) -> dict:
    """MainAVIHeader fields + one dict per stream (strh/strf)."""
    out: dict = {"us_per_frame": None, "total_frames": None,
                 "total_frames_dml": None, "width": None, "height": None,
                 "streams": []}
    for cc, cs, ce in _riff_chunks(b, s, e, budget):
        if cc == b"avih":
            if ce - cs < struct.calcsize(_AVIH_FMT):
                raise ValueError("truncated avih")
            (uspf, _rate, _pad, _flags, total, _init, _nstr, _buf,
             w, h) = struct.unpack_from(_AVIH_FMT, b, cs)
            out.update(us_per_frame=uspf or None, total_frames=total,
                       width=w or None, height=h or None)
        elif cc == b"LIST":
            odml = _list_payload(b, cs, ce, b"odml")
            if odml is not None:
                # OpenDML extended header: dmlh's first u32 is the
                # GRAND total frame count across all AVIX segments
                # (avih's dwTotalFrames covers only the first segment)
                for oc, os_, oe in _riff_chunks(b, odml[0], odml[1], budget):
                    if oc == b"dmlh" and oe - os_ >= 4:
                        out["total_frames_dml"] = struct.unpack_from(
                            "<I", b, os_
                        )[0]
                continue
            strl = _list_payload(b, cs, ce, b"strl")
            if strl is None or len(out["streams"]) >= _MAX_STREAMS:
                continue
            st: dict = {"fcc_type": None, "handler": None, "scale": None,
                        "rate": None, "length": None, "width": None,
                        "height": None, "bit_count": None,
                        "compression": None}
            for sc, ss, se in _riff_chunks(b, strl[0], strl[1], budget):
                if sc == b"strh":
                    if se - ss < struct.calcsize(_STRH_FMT):
                        raise ValueError("truncated strh")
                    (ftype, fhand, _fl, _pri, _lang, _init, scale, rate,
                     _start, length) = struct.unpack_from(_STRH_FMT, b, ss)
                    st.update(
                        fcc_type=ftype.decode("latin-1"),
                        handler=fhand.decode("latin-1").strip("\x00 ") or None,
                        scale=scale, rate=rate, length=length,
                    )
                elif sc == b"strf" and st["fcc_type"] == "vids":
                    if se - ss < 20:
                        raise ValueError("truncated video strf")
                    _bisz, bw, bh = struct.unpack_from("<Iii", b, ss)
                    planes, bits = struct.unpack_from("<HH", b, ss + 12)
                    comp = b[ss + 16 : ss + 20]
                    st.update(width=abs(bw) or None, height=abs(bh) or None,
                              bit_count=bits, compression=comp,
                              top_down=bh < 0)
                elif sc == b"strf" and st["fcc_type"] == "auds":
                    # WAVEFORMATEX — kept raw; decode_avi_audio reuses
                    # it verbatim as a WAV fmt chunk
                    if se - ss < 16:
                        raise ValueError("truncated audio strf")
                    st["wave_fmt"] = b[ss : ss + 16]
            out["streams"].append(st)
    if out["us_per_frame"] is None and not out["streams"]:
        raise ValueError("AVI without avih or streams")
    return out


_MAX_RIFF_SEGMENTS = 1024  # OpenDML AVIX continuation segments


def _walk_avi(
    b: bytes, tolerate_tail: bool = False
) -> tuple[dict, list[tuple[int, int]], list[int]]:
    """(hdrl dict, movi payload spans, shared budget) for a RIFF-AVI
    blob — including OpenDML AVIX continuation segments (standard AVI
    caps at ~1-2 GB, so every long recording is 'RIFF AVI ' followed by
    'RIFF AVIX' segments, each holding another movi list; the header
    lives only in the first).  ValueError on malformation."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF) file")
    # scale the chunk budget with blob size: forward progress already
    # bounds the walk to O(len(b)) (every chunk consumes >= 8 header
    # bytes), so len//8 is the true ceiling — a fixed 65k budget would
    # reject exactly the long OpenDML recordings AVIX support targets
    # (1 h @ 25 fps = 90k frame chunks, ~180k with interleaved audio)
    budget = [max(_MAX_CHUNKS, len(b) // 8 + 16)]
    hdrl = None
    movi_spans: list[tuple[int, int]] = []
    seg_start, segs = 0, 0
    while seg_start + 12 <= len(b) and segs < _MAX_RIFF_SEGMENTS:
        if b[seg_start : seg_start + 4] != b"RIFF":
            break
        form = b[seg_start + 8 : seg_start + 12]
        if form != (b"AVI " if segs == 0 else b"AVIX"):
            break
        riff_size = struct.unpack_from("<I", b, seg_start + 4)[0]
        end = min(len(b), seg_start + 8 + riff_size)
        if end <= seg_start + 12:
            raise ValueError("empty RIFF segment")
        for cc, cs, ce in _riff_chunks(
            b, seg_start + 12, end, budget, tolerate_tail=tolerate_tail
        ):
            if cc != b"LIST":
                continue
            if hdrl is None:
                p = _list_payload(b, cs, ce, b"hdrl")
                if p:
                    hdrl = _parse_hdrl(b, p[0], p[1], budget)
                    continue
            p = _list_payload(b, cs, ce, b"movi")
            if p:
                movi_spans.append(p)
        segs += 1
        seg_start = end + (riff_size & 1)
    if hdrl is None:
        raise ValueError("AVI without hdrl header list")
    return hdrl, movi_spans, budget


def probe_avi(b: bytes) -> dict:
    """Container metadata in video_probe's PROBE_SCHEMA dict shape —
    container 'avi', movie duration from avih (frames x µs/frame),
    per-stream tracks with mp4's handler vocabulary ('vide'/'soun') so
    downstream filters need one predicate."""
    # tolerate_tail: the probe accepts head-bounded reads — hdrl
    # precedes movi, so the walk stops where the head cut the file
    hdrl, _movi, _budget = _walk_avi(bytes(b), tolerate_tail=True)
    dur = None
    total = hdrl["total_frames_dml"] or hdrl["total_frames"]
    if hdrl["us_per_frame"] and total:
        dur = total * hdrl["us_per_frame"] // 1000
    handler_map = {"vids": "vide", "auds": "soun", "txts": "text"}
    tracks = []
    for i, st in enumerate(hdrl["streams"]):
        tdur = None
        if st["rate"] and st["length"] is not None and st["scale"]:
            tdur = st["length"] * st["scale"] * 1000 // st["rate"]
        codec = st["handler"]
        if codec is None and st.get("compression"):
            comp = st["compression"].decode("latin-1").strip("\x00 ")
            codec = comp or ("DIB" if st.get("bit_count") else None)
        if codec is None and st.get("wave_fmt"):
            tag = struct.unpack_from("<H", st["wave_fmt"], 0)[0]
            codec = {1: "pcm", 6: "alaw", 7: "mulaw", 0x11: "adpcm_ima"}.get(
                tag, f"wave_0x{tag:04x}"
            )
        tracks.append(
            {"track_id": i,
             "handler": handler_map.get(st["fcc_type"], st["fcc_type"]),
             "codec": codec,
             "width": st["width"], "height": st["height"],
             "duration_ms": tdur, "lang": None}
        )
        if dur is None and tdur is not None and st["fcc_type"] == "vids":
            dur = tdur
    return {"container": "avi", "brand": None, "duration_ms": dur,
            "tracks": tracks}


# --- MJPEG default-table splice ---------------------------------------------


def _annex_k_dht() -> bytes:
    """The four ITU-T T.81 Annex K.3 'typical' Huffman tables as one
    DHT-segment byte run — exactly the tables encode_jpeg emits."""
    from streamsum_spark.operators.jpeg import (
        _AC_CHROM, _AC_LUM, _DC_CHROM, _DC_LUM,
    )

    out = bytearray()
    for tc, th, (bits, vals) in (
        (0, 0, _DC_LUM), (1, 0, _AC_LUM), (0, 1, _DC_CHROM), (1, 1, _AC_CHROM)
    ):
        payload = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    return bytes(out)


def _with_default_dht(frame: bytes) -> bytes:
    """A self-contained JPEG for an MJPEG frame: if the frame carries no
    DHT segment before SOS (the AVI1 convention), splice the Annex K.3
    defaults immediately before SOS; frames with their own tables pass
    through untouched."""
    if frame[:2] != b"\xff\xd8":
        raise ValueError("MJPEG frame without JPEG SOI")
    pos = 2
    n = len(frame)
    while pos + 4 <= n:
        if frame[pos] != 0xFF:
            raise ValueError("corrupt MJPEG frame marker stream")
        marker = frame[pos + 1]
        if marker == 0xFF:            # fill byte (T.81 §B.1.1.2)
            pos += 1
            continue
        if marker == 0xC4:            # DHT present — self-contained
            return frame
        if marker == 0xDA:            # SOS with no DHT seen
            return frame[:pos] + _annex_k_dht() + frame[pos:]
        if marker in (0x01, *range(0xD0, 0xD8)):  # standalone markers
            pos += 2
            continue
        seg = struct.unpack_from(">H", frame, pos + 2)[0]
        if seg < 2:
            raise ValueError("corrupt MJPEG segment length")
        pos += 2 + seg
    raise ValueError("MJPEG frame without SOS")


# --- frame decode ------------------------------------------------------------


def _decode_dib_frame(payload: bytes, st: dict) -> np.ndarray:
    """One '##db' BI_RGB frame: raw DIB rows (no file header) at the
    strf geometry — 24bpp BGR, 4-byte row padding, bottom-up unless
    biHeight was negative."""
    if st.get("bit_count") != 24:
        raise NotImplementedError(
            f"AVI DIB frames with biBitCount={st.get('bit_count')} "
            "not supported (only 24-bit BI_RGB)"
        )
    w, h = st["width"], st["height"]
    stride = (w * 3 + 3) & ~3
    if len(payload) < stride * h:
        raise ValueError("truncated AVI DIB frame")
    rows = np.frombuffer(payload[: stride * h], np.uint8).reshape(h, stride)
    px = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    if not st.get("top_down"):
        px = px[::-1]
    return np.ascontiguousarray(px)


def _video_stream_payloads(b: bytes):
    """Shared front half of full and selective decode: validate the
    first video stream's codec, collect its frame-chunk payloads (in
    movi order, rec-lists flattened), and build the analytic frame
    clock.  Returns (vid stream dict + ``is_mjpeg``/``is_dib`` flags,
    payloads, start_ms callable)."""
    hdrl, movi_spans, budget = _walk_avi(b)
    if not movi_spans:
        raise ValueError("AVI without movi data list")
    vid_idx, vid = next(
        ((i, s) for i, s in enumerate(hdrl["streams"])
         if s["fcc_type"] == "vids"),
        (None, None),
    )
    if vid is None:
        raise ValueError("AVI without a video stream")
    handler = (vid["handler"] or "").upper()
    comp = (vid.get("compression") or b"").decode("latin-1").strip("\x00 ").upper()
    is_mjpeg = handler in ("MJPG", "DMB1") or comp in ("MJPG", "DMB1")
    is_dib = (not is_mjpeg) and (comp == "" and (vid.get("bit_count") or 0) > 0
                                 or handler == "DIB")
    if not (is_mjpeg or is_dib):
        raise NotImplementedError(
            f"AVI video codec {handler or comp or '?'} not supported "
            "(MJPEG and 24-bit DIB only)"
        )
    if vid["width"] and vid["height"]:
        _check_canvas(vid["width"], vid["height"], "AVI")

    if vid_idx >= 100:
        raise ValueError("AVI video stream index out of range")
    prefix = b"%02d" % vid_idx
    want = {prefix + b"dc", prefix + b"db"}

    payloads: list[bytes] = []

    def collect(s: int, e: int, depth: int) -> None:
        if depth > _MAX_REC_DEPTH:
            raise ValueError("AVI rec-list nesting too deep")
        for cc, cs, ce in _riff_chunks(b, s, e, budget):
            if cc == b"LIST":
                p = _list_payload(b, cs, ce, b"rec ")
                if p:
                    collect(p[0], p[1], depth + 1)
            elif cc in want:
                payloads.append((cc[2:4], b[cs:ce]))

    for span in movi_spans:
        collect(span[0], span[1], 0)
    if not payloads:
        raise ValueError("AVI with no frame chunks for the video stream")

    def start_ms(i: int) -> int:
        if vid["rate"] and vid["scale"]:
            return i * vid["scale"] * 1000 // vid["rate"]
        if hdrl["us_per_frame"]:
            return i * hdrl["us_per_frame"] // 1000
        return i * 1000  # no timing info: 1 fps convention

    vid = dict(vid, is_dib=is_dib, is_mjpeg=is_mjpeg)
    return vid, payloads, start_ms


def _decode_payload(kind: bytes, payload: bytes, vid: dict) -> np.ndarray:
    """One non-empty frame chunk → (h, w, 3) uint8 RGB.  Dispatch on
    the stream codec + chunk fourcc suffix, NOT byte sniffing: an
    MJPEG stream's frames are JPEG whichever suffix the muxer used,
    while a DIB stream's '##db' frames are raw rows even when the
    bottom-left pixel happens to spell the JPEG SOI bytes
    (B=0xFF, G=0xD8)."""
    from streamsum_spark.operators.multimodal import decode_image

    if vid["is_mjpeg"]:
        if payload[:2] != b"\xff\xd8":
            raise ValueError("AVI MJPEG frame without JPEG SOI")
        return decode_image(_with_default_dht(payload))
    if kind == b"db":
        return _decode_dib_frame(payload, vid)
    raise ValueError("AVI 'dc' (compressed) chunk in an uncompressed DIB stream")


def decode_avi_frames(content: bytes) -> list[tuple[int, int, np.ndarray]]:
    """All frames of the FIRST video stream as [(start_ms, duration_ms,
    (h, w, 3) uint8 RGB)] — the decode_frames contract.

    MJPEG streams (fccHandler MJPG/dmb1) decode every frame chunk as
    JPEG through multimodal.decode_image, so they get the JVM-sidecar
    fast path AND the sampled spec cross-check for free.  DIB streams
    decode '##db' chunks as 24-bit BI_RGB rows (dispatch is by stream
    codec + chunk fourcc, never payload sniffing).  Zero-length chunks
    repeat the previous frame (the dropped-frame convention).  Any
    other codec raises NotImplementedError — a fake decode would
    misreport content.

    Frame timing: start(i) = i*scale*1000/rate from strh (the exact
    rational, floored per frame — no drift), avih µs/frame fallback.
    """
    b = bytes(content)
    vid, payloads, start_ms = _video_stream_payloads(b)
    if vid["width"] and vid["height"]:
        if vid["width"] * vid["height"] * 3 * len(payloads) > _MAX_FRAMES_BYTES:
            raise ValueError("AVI decoded output exceeds the frame cap")
    frames: list[tuple[int, int, np.ndarray]] = []
    prev: np.ndarray | None = None
    budget_bytes = 0
    for i, (kind, payload) in enumerate(payloads):
        if len(payload) == 0:
            if prev is None:
                raise ValueError("AVI starts with a dropped frame")
            px = prev
        else:
            px = _decode_payload(kind, payload, vid)
        budget_bytes += px.nbytes
        if budget_bytes > _MAX_FRAMES_BYTES:
            raise ValueError("AVI decoded output exceeds the frame cap")
        frames.append((start_ms(i), start_ms(i + 1) - start_ms(i), px))
        prev = px
    return frames


def iter_avi_frames_at(
    content: bytes, ts_list: list[int]
) -> "Iterator[tuple[int, np.ndarray]]":
    """Lazily yield (frame_idx, pixels) per requested timestamp,
    decoding ONLY the selected frames — the scale path for sampled
    video decode.

    MJPEG/DIB frames are independent (no inter-frame prediction) and
    the frame clock is analytic from strh rate/scale, so mapping a
    timestamp to its covering frame needs no decoding at all: a 1-hour
    25 fps clip sampled every second decodes 3.6k of its 90k frames —
    and because this is a GENERATOR holding a one-frame cache, the
    consumer that folds each frame into a feature row keeps exactly one
    decoded frame in memory, not duration/every_ms of them.  Sorted
    timestamps (what extract_sampled_frames sends) hit the cache for
    repeats; dropped (zero-length) frames resolve backward to the
    nearest real chunk.  Same timestamp → frame mapping as
    decode_frames + bisect: the frame whose [start, next_start) span
    covers the timestamp, timestamps past the end hold the last
    frame."""
    import bisect

    b = bytes(content)
    vid, payloads, start_ms = _video_stream_payloads(b)
    starts = [start_ms(i) for i in range(len(payloads))]
    cached: tuple[int, np.ndarray] | None = None
    for t in ts_list:
        j = max(0, bisect.bisect_right(starts, int(t)) - 1)
        k = j
        while k >= 0 and len(payloads[k][1]) == 0:
            k -= 1
        if k < 0:
            raise ValueError("AVI starts with a dropped frame")
        if cached is None or cached[0] != k:
            cached = (k, _decode_payload(payloads[k][0], payloads[k][1], vid))
        yield j, cached[1]


def decode_avi_frames_at(
    content: bytes, ts_list: list[int]
) -> list[tuple[int, np.ndarray]]:
    """Materialized form of iter_avi_frames_at, with the cumulative
    output cap the full decoder applies (a long sampled clip should be
    CONSUMED lazily — this list form is for point lookups and tests)."""
    out: list[tuple[int, np.ndarray]] = []
    budget_bytes = 0
    seen: set[int] = set()
    for j, px in iter_avi_frames_at(content, ts_list):
        if j not in seen:
            seen.add(j)
            budget_bytes += px.nbytes
            if budget_bytes > _MAX_FRAMES_BYTES:
                raise ValueError("AVI decoded output exceeds the frame cap")
        out.append((j, px))
    return out


def decode_avi_audio(content: bytes) -> tuple["np.ndarray", int]:
    """The FIRST audio stream's samples as ((n, ch) int16, rate) — the
    decode_audio contract, so a video's soundtrack feeds the same prep
    chain (downmix → resample → log-mel) as a standalone audio blob.

    Zero format duplication: the stream's strf IS a WAVEFORMATEX, and
    its '##wb' chunks ARE the WAV data stream, so extraction rebuilds a
    RIFF/WAVE blob and hands it to multimodal.decode_audio — PCM16,
    G.711 A-law/µ-law, and IMA ADPCM all work, and unsupported tags
    raise the same honest NotImplementedError a bare WAV would."""
    from streamsum_spark.operators.multimodal import decode_audio

    b = bytes(content)
    hdrl, movi_spans, budget = _walk_avi(b)
    if not movi_spans:
        raise ValueError("AVI without movi data list")
    aud_idx, aud = next(
        ((i, s) for i, s in enumerate(hdrl["streams"])
         if s["fcc_type"] == "auds"),
        (None, None),
    )
    if aud is None:
        raise ValueError("AVI without an audio stream")
    if aud.get("wave_fmt") is None:
        raise ValueError("AVI audio stream without a WAVEFORMATEX strf")
    if aud_idx >= 100:
        raise ValueError("AVI audio stream index out of range")
    want = (b"%02d" % aud_idx) + b"wb"

    parts: list[bytes] = []

    def collect(s: int, e: int, depth: int) -> None:
        if depth > _MAX_REC_DEPTH:
            raise ValueError("AVI rec-list nesting too deep")
        for cc, cs, ce in _riff_chunks(b, s, e, budget):
            if cc == b"LIST":
                p = _list_payload(b, cs, ce, b"rec ")
                if p:
                    collect(p[0], p[1], depth + 1)
            elif cc == want:
                parts.append(b[cs:ce])

    for span in movi_spans:
        collect(span[0], span[1], 0)
    if not parts:
        raise ValueError("AVI with no audio chunks for the audio stream")
    data = b"".join(parts)
    wav = (
        b"WAVE"
        + _chunk(b"fmt ", aud["wave_fmt"])
        + _chunk(b"data", data)
    )
    return decode_audio(b"RIFF" + struct.pack("<I", len(wav)) + wav)


# ---------------------------------------------------------------------------
# encoders (test fixtures; also the proof the walkers parse real layouts)
# ---------------------------------------------------------------------------


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    return fourcc + struct.pack("<I", len(payload)) + payload + (
        b"\x00" if len(payload) & 1 else b""
    )


def _list(ltype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", ltype + payload)


def _avi_container(
    frame_payloads: list[bytes],
    w: int,
    h: int,
    rate: int,
    scale: int,
    handler: bytes,
    compression: bytes,
    bit_count: int,
    chunk_cc: bytes,
    strip_dht: bool = False,
) -> bytes:
    n = len(frame_payloads)
    uspf = scale * 1_000_000 // rate if rate else 0
    avih = struct.pack(
        _AVIH_FMT, uspf, 0, 0, 0, n, 0, 1, 0, w, h
    ) + b"\x00" * 16
    strh = struct.pack(
        _STRH_FMT, b"vids", handler, 0, 0, 0, 0, scale, rate, 0, n
    ) + struct.pack("<IIII", 0, 0, 0, 0) + struct.pack("<4H", 0, 0, w, h)
    strf = struct.pack(
        "<Iii", 40, w, h
    ) + struct.pack("<HH", 1, bit_count) + compression + struct.pack(
        "<IiiII", 0, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = b"".join(_chunk(chunk_cc, p) for p in frame_payloads)
    movi = _list(b"movi", movi_payload)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _strip_dht(jpeg: bytes) -> bytes:
    """Remove every DHT segment (the AVI1 table-less convention)."""
    out = bytearray(jpeg[:2])
    pos = 2
    while pos + 4 <= len(jpeg):
        marker = jpeg[pos + 1]
        if marker == 0xDA:
            out += jpeg[pos:]
            return bytes(out)
        seg = struct.unpack_from(">H", jpeg, pos + 2)[0]
        if marker != 0xC4:
            out += jpeg[pos : pos + 2 + seg]
        pos += 2 + seg
    raise ValueError("no SOS")


def encode_avi_mjpeg(
    frames: list[np.ndarray],
    rate: int = 25,
    scale: int = 1,
    quality: int = 90,
    table_less: bool = False,
) -> bytes:
    """MJPEG AVI of (h, w, 3) uint8 frames; ``table_less=True`` strips
    the DHT segments (the AVI1 convention _with_default_dht restores)."""
    from streamsum_spark.operators.jpeg import encode_jpeg

    h, w = frames[0].shape[:2]
    payloads = []
    for f in frames:
        j = encode_jpeg(f, quality=quality)
        payloads.append(_strip_dht(j) if table_less else j)
    return _avi_container(
        payloads, w, h, rate, scale, b"MJPG", b"MJPG", 24, b"00dc"
    )


def encode_avi_av(
    frames: list[np.ndarray],
    samples: np.ndarray,
    sample_rate: int,
    rate: int = 25,
    scale: int = 1,
    quality: int = 90,
) -> bytes:
    """Two-stream AVI: MJPEG video (stream 0) + PCM16 audio (stream 1,
    ``samples`` is (n, ch) int16), movi interleaved per frame like a
    real muxer writes it."""
    from streamsum_spark.operators.jpeg import encode_jpeg

    h, w = frames[0].shape[:2]
    n = len(frames)
    ch = samples.shape[1]
    uspf = scale * 1_000_000 // rate if rate else 0
    avih = struct.pack(_AVIH_FMT, uspf, 0, 0, 0, n, 0, 2, 0, w, h) + b"\x00" * 16
    strh_v = struct.pack(
        _STRH_FMT, b"vids", b"MJPG", 0, 0, 0, 0, scale, rate, 0, n
    ) + struct.pack("<IIII", 0, 0, 0, 0) + struct.pack("<4H", 0, 0, w, h)
    strf_v = struct.pack("<Iii", 40, w, h) + struct.pack("<HH", 1, 24) + \
        b"MJPG" + struct.pack("<IiiII", 0, 0, 0, 0, 0)
    strh_a = struct.pack(
        _STRH_FMT, b"auds", b"\x00" * 4, 0, 0, 0, 0, 1, sample_rate, 0,
        len(samples),
    ) + struct.pack("<IIII", 0, 0, 0, 0) + struct.pack("<4H", 0, 0, 0, 0)
    strf_a = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * 2 * ch, 2 * ch, 16
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh_v) + _chunk(b"strf", strf_v))
        + _list(b"strl", _chunk(b"strh", strh_a) + _chunk(b"strf", strf_a)),
    )
    pcm = np.ascontiguousarray(samples.astype("<i2")).tobytes()
    step = (len(pcm) // (2 * ch * n) + 1) * 2 * ch  # sample-aligned slices
    movi_payload = b""
    for i, f in enumerate(frames):
        movi_payload += _chunk(b"00dc", encode_jpeg(f, quality=quality))
        movi_payload += _chunk(b"01wb", pcm[i * step : (i + 1) * step])
    body = b"AVI " + hdrl + _list(b"movi", movi_payload)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_avix_mjpeg(
    segments: list[list[np.ndarray]],
    rate: int = 25,
    scale: int = 1,
    quality: int = 90,
) -> bytes:
    """OpenDML multi-segment MJPEG AVI: segment 0 is a standard
    'RIFF AVI ' (hdrl carries avih with the FIRST segment's frame count
    plus an odml/dmlh grand total, then that segment's movi); each
    further segment is a 'RIFF AVIX' holding only a movi list — the
    layout every >1 GB recording uses."""
    from streamsum_spark.operators.jpeg import encode_jpeg

    h, w = segments[0][0].shape[:2]
    n0 = len(segments[0])
    total = sum(len(s) for s in segments)
    uspf = scale * 1_000_000 // rate if rate else 0
    avih = struct.pack(_AVIH_FMT, uspf, 0, 0, 0, n0, 0, 1, 0, w, h) + b"\x00" * 16
    strh = struct.pack(
        _STRH_FMT, b"vids", b"MJPG", 0, 0, 0, 0, scale, rate, 0, total
    ) + struct.pack("<IIII", 0, 0, 0, 0) + struct.pack("<4H", 0, 0, w, h)
    strf = struct.pack("<Iii", 40, w, h) + struct.pack("<HH", 1, 24) + \
        b"MJPG" + struct.pack("<IiiII", 0, 0, 0, 0, 0)
    dmlh = _chunk(b"dmlh", struct.pack("<I", total) + b"\x00" * 244)
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
        + _list(b"odml", dmlh),
    )

    def movi_of(frames):
        return _list(
            b"movi",
            b"".join(_chunk(b"00dc", encode_jpeg(f, quality=quality))
                     for f in frames),
        )

    body0 = b"AVI " + hdrl + movi_of(segments[0])
    out = b"RIFF" + struct.pack("<I", len(body0)) + body0
    for seg in segments[1:]:
        bodyx = b"AVIX" + movi_of(seg)
        out += b"RIFF" + struct.pack("<I", len(bodyx)) + bodyx
    return out


def encode_avi_dib(
    frames: list[np.ndarray], rate: int = 25, scale: int = 1
) -> bytes:
    """Uncompressed 24-bit BI_RGB AVI (bottom-up BGR DIB rows)."""
    h, w = frames[0].shape[:2]
    stride = (w * 3 + 3) & ~3
    payloads = []
    for f in frames:
        rows = np.zeros((h, stride), np.uint8)
        rows[:, : w * 3] = f[:, :, ::-1].reshape(h, w * 3)
        payloads.append(rows[::-1].tobytes())
    return _avi_container(
        payloads, w, h, rate, scale, b"DIB ", b"\x00\x00\x00\x00", 24, b"00db"
    )
