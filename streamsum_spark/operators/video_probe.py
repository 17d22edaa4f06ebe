"""Video container metadata probe — typed metadata for opaque video
blobs (ISO BMFF / MP4 family and EBML / WebM-Matroska), no decoding.

The multimodal posture for video (SURVEY §2): video SAMPLE DATA stays
an opaque binary column — no codec exists in this container and a fake
decode would misreport content — but the CONTAINER metadata a pipeline
routes, filters, and samples on (duration, track layout, codecs,
display dimensions) is fully parseable from public specs:

- MP4/MOV (ISO/IEC 14496-12 box structure): ftyp brand, mvhd
  movie-level timescale/duration, per-trak tkhd (track id, 16.16
  fixed-point display width/height), mdhd (media timescale/duration,
  packed ISO-639 language), hdlr (vide/soun handler), stsd sample-entry
  fourccs (avc1/hev1/mp4a/...).
- WebM/Matroska (EBML, RFC 8794 + the public Matroska element
  registry): DocType, Segment > Info TimestampScale/Duration, Tracks >
  TrackEntry TrackType/CodecID/Video PixelWidth/PixelHeight.

Both walkers are hostile-input bounded (box/element counts, recursion
depth, strict size monotonicity — a crafted size field cannot loop or
over-read) and raise ValueError on malformation past the magic bytes,
mirroring the image/audio decoders' refusal contract.  probe_media is
the Arrow-batched operator with extract_features' per-row isolation.

frame_sample_plan + extract_sampled_frames (multimodal.py) consume the
``duration_ms`` this probe emits when the metadata column is absent —
together they are the decode-free half of the video story; sample-data
decode remains an honest refusal.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd

_MAX_BOXES = 4096     # total boxes walked per blob
_MAX_DEPTH = 8        # container nesting
_MAX_TRACKS = 64
_MAX_EBML_ELEMS = 8192

_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"mvex"}


def _mp4_boxes(
    b: bytes, start: int, end: int, budget: list[int],
    tolerate_tail: bool = False,
):
    """Yield (type, payload_start, payload_end) for the boxes in
    b[start:end); strict forward progress and bounds.

    ``tolerate_tail`` (probe walks over HEAD-BOUNDED reads — the
    sources/blobs.py feed): a box extending past ``end`` stops the
    walk instead of raising, because a head read legitimately cuts the
    file inside mdat/moov.  Decode paths stay strict."""
    pos = start
    while pos + 8 <= end:
        if budget[0] <= 0:
            raise ValueError("MP4 box budget exceeded")
        budget[0] -= 1
        size, btype = struct.unpack_from(">I4s", b, pos)
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                if tolerate_tail:
                    return
                raise ValueError("truncated MP4 largesize")
            size = struct.unpack_from(">Q", b, pos + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            if tolerate_tail and size >= hdr:
                return
            raise ValueError("MP4 box size out of bounds")
        yield btype, pos + hdr, pos + size
        pos += size


def _find(b: bytes, start: int, end: int, btype: bytes, budget: list[int]):
    for t, s, e in _mp4_boxes(b, start, end, budget):
        if t == btype:
            return s, e
    return None


def _fullbox(b: bytes, s: int) -> tuple[int, int]:
    """(version, payload offset past version+flags)."""
    return b[s], s + 4


def _known_dur(duration: int, version: int) -> int | None:
    """All-ones duration means 'unknown' (ISO/IEC 14496-12 §8.2.2.3)."""
    if duration == (0xFFFFFFFFFFFFFFFF if version == 1 else 0xFFFFFFFF):
        return None
    return duration


def _parse_mvhd(b: bytes, s: int, e: int) -> tuple[int, int | None]:
    v, p = _fullbox(b, s)
    if v == 1:
        if p + 28 > e:
            raise ValueError("truncated mvhd")
        timescale, duration = struct.unpack_from(">IQ", b, p + 16)
    else:
        if p + 16 > e:
            raise ValueError("truncated mvhd")
        timescale, duration = struct.unpack_from(">II", b, p + 8)
    if timescale == 0:
        raise ValueError("mvhd timescale 0")
    return timescale, _known_dur(duration, v)


def _parse_tkhd(b: bytes, s: int, e: int) -> tuple[int, int, int]:
    """(track_id, width, height) — width/height are 16.16 fixed, the
    last 8 payload bytes."""
    v, p = _fullbox(b, s)
    tid_off = p + (16 if v == 1 else 8)
    if tid_off + 4 > e or e - 8 < s:
        raise ValueError("truncated tkhd")
    track_id = struct.unpack_from(">I", b, tid_off)[0]
    w16, h16 = struct.unpack_from(">II", b, e - 8)
    return track_id, w16 >> 16, h16 >> 16


def _parse_mdhd(b: bytes, s: int, e: int) -> tuple[int, int | None, str]:
    v, p = _fullbox(b, s)
    if v == 1:
        if p + 30 > e:
            raise ValueError("truncated mdhd")
        timescale, duration = struct.unpack_from(">IQ", b, p + 16)
        lang_off = p + 28
    else:
        if p + 18 > e:
            raise ValueError("truncated mdhd")
        timescale, duration = struct.unpack_from(">II", b, p + 8)
        lang_off = p + 16
    packed = struct.unpack_from(">H", b, lang_off)[0]
    lang = "".join(chr(((packed >> sh) & 0x1F) + 0x60) for sh in (10, 5, 0))
    if timescale == 0:
        raise ValueError("mdhd timescale 0")
    return timescale, _known_dur(duration, v), lang


def _parse_stsd_codecs(b: bytes, s: int, e: int) -> list[str]:
    _, p = _fullbox(b, s)
    if p + 4 > e:
        raise ValueError("truncated stsd")
    n = struct.unpack_from(">I", b, p)[0]
    codecs, pos = [], p + 4
    for _ in range(min(n, 16)):
        if pos + 8 > e:
            break
        size, fourcc = struct.unpack_from(">I4s", b, pos)
        if size < 8 or pos + size > e:
            break
        codecs.append(fourcc.decode("latin-1").strip())
        pos += size
    return codecs


def probe_mp4(b: bytes) -> dict:
    """Container metadata of an ISO BMFF blob (cited box layouts:
    ISO/IEC 14496-12 §4.2, 8.2.2, 8.3.2, 8.4.2-3, 8.5.2)."""
    budget = [_MAX_BOXES]
    brand = None
    moov = None
    # tolerate_tail: the probe accepts head-bounded reads — the walk
    # stops at a box the head cut off (moov-first files keep their
    # whole header; moov-after-mdat needs the full blob for tracks)
    for t, s, e in _mp4_boxes(b, 0, len(b), budget, tolerate_tail=True):
        if t == b"ftyp" and brand is None:
            if e - s < 8:
                raise ValueError("truncated ftyp")
            brand = b[s : s + 4].decode("latin-1").strip()
        elif t == b"moov" and moov is None:
            moov = (s, e)
    if brand is None:
        raise ValueError("no ftyp box")
    out: dict = {"container": "mp4", "brand": brand, "duration_ms": None,
                 "tracks": []}
    if moov is None:
        return out
    mvhd = _find(b, moov[0], moov[1], b"mvhd", budget)
    if mvhd:
        ts, dur = _parse_mvhd(b, *mvhd)
        out["duration_ms"] = None if dur is None else dur * 1000 // ts
    for t, s, e in _mp4_boxes(b, moov[0], moov[1], budget):
        if t != b"trak" or len(out["tracks"]) >= _MAX_TRACKS:
            continue
        tr: dict = {"track_id": None, "handler": None, "codec": None,
                    "width": None, "height": None, "duration_ms": None,
                    "lang": None}
        tkhd = _find(b, s, e, b"tkhd", budget)
        if tkhd:
            tid, w, h = _parse_tkhd(b, *tkhd)
            tr.update(track_id=tid, width=w or None, height=h or None)
        mdia = _find(b, s, e, b"mdia", budget)
        if mdia:
            mdhd = _find(b, mdia[0], mdia[1], b"mdhd", budget)
            if mdhd:
                ts, dur, lang = _parse_mdhd(b, *mdhd)
                tr.update(
                    duration_ms=None if dur is None else dur * 1000 // ts,
                    lang=lang,
                )
            hdlr = _find(b, mdia[0], mdia[1], b"hdlr", budget)
            if hdlr and hdlr[1] - hdlr[0] >= 12:
                tr["handler"] = b[hdlr[0] + 8 : hdlr[0] + 12].decode("latin-1")
            minf = _find(b, mdia[0], mdia[1], b"minf", budget)
            if minf:
                stbl = _find(b, minf[0], minf[1], b"stbl", budget)
                if stbl:
                    stsd = _find(b, stbl[0], stbl[1], b"stsd", budget)
                    if stsd:
                        codecs = _parse_stsd_codecs(b, *stsd)
                        tr["codec"] = codecs[0] if codecs else None
        out["tracks"].append(tr)
    return out


# --- EBML / Matroska-WebM ---------------------------------------------------

_EBML_MAGIC = b"\x1a\x45\xdf\xa3"


def _ebml_vint(b: bytes, pos: int, end: int, keep_marker: bool) -> tuple[int, int]:
    """(value, next_pos).  Element IDs keep the length-marker bit
    (matching the registry's ID constants); sizes strip it."""
    if pos >= end:
        raise ValueError("truncated EBML vint")
    first = b[pos]
    if first == 0:
        raise ValueError("invalid EBML vint")
    n = 9 - first.bit_length()  # leading-zero count + 1 = total bytes
    if pos + n > end:
        raise ValueError("truncated EBML vint")
    val = first if keep_marker else first & (0xFF >> n)
    for i in range(1, n):
        val = (val << 8) | b[pos + i]
    return val, pos + n


def _ebml_elems(
    b: bytes, pos: int, end: int, budget: list[int],
    tolerate_tail: bool = False,
):
    """``tolerate_tail`` (probe walks over HEAD-BOUNDED reads): an
    element extending past ``end`` is CLAMPED to it — the Segment
    spans the whole file, so a head probe must descend into its
    leading children (Info/Tracks) and stop where the cut lands; a
    vint the cut bisected ends the walk.  Mid-stream malformations
    (zero vints with plenty of bytes left) still raise."""
    while pos < end:
        if budget[0] <= 0:
            raise ValueError("EBML element budget exceeded")
        budget[0] -= 1
        try:
            eid, p = _ebml_vint(b, pos, end, keep_marker=True)
            size_start = p
            size, p = _ebml_vint(b, p, end, keep_marker=False)
        except ValueError:
            # a cut can bisect a vint only within one max-width id+size
            # pair of the end; anything further in is a malformation
            if tolerate_tail and end - pos < 12:
                return
            raise
        # all-ones size payload = "unknown size" (RFC 8794 §6.2, common
        # for live-muxed Segments): the element extends to the parent's
        # end
        if size == (1 << (7 * (p - size_start))) - 1:
            size = end - p
        if p + size > end:
            if tolerate_tail:
                size = end - p  # clamp: walk what the head holds
            else:
                raise ValueError("EBML size out of bounds")
        yield eid, p, p + size
        pos = p + size


def _ebml_uint(b: bytes, s: int, e: int) -> int:
    v = 0
    for i in range(s, e):
        v = (v << 8) | b[i]
    return v


def _ebml_float(b: bytes, s: int, e: int) -> float:
    if e - s == 4:
        return struct.unpack(">f", b[s:e])[0]
    if e - s == 8:
        return struct.unpack(">d", b[s:e])[0]
    raise ValueError("bad EBML float size")


def probe_ebml(b: bytes) -> dict:
    """Metadata of an EBML blob (WebM/Matroska): DocType, duration from
    Segment>Info (Duration * TimestampScale ns, scale default 10^6),
    tracks from Segment>Tracks>TrackEntry."""
    budget = [_MAX_EBML_ELEMS]
    out: dict = {"container": "ebml", "brand": None, "duration_ms": None,
                 "tracks": []}
    # tolerate_tail on the file-level and Segment-child walks: a
    # head-bounded read cuts inside the Segment (it spans the file);
    # the leading Info/Tracks still probe.  Inner element walks stay
    # strict — they are header-sized and must fit the head whole.
    for eid, s, e in _ebml_elems(b, 0, len(b), budget, tolerate_tail=True):
        if eid == 0x1A45DFA3:  # EBML header
            for hid, hs, he in _ebml_elems(b, s, e, budget):
                if hid == 0x4282:  # DocType
                    out["brand"] = b[hs:he].decode("latin-1").rstrip("\x00")
                    out["container"] = out["brand"] or "ebml"
        elif eid == 0x18538067:  # Segment
            scale_ns, dur_scaled = 1_000_000, None
            for sid, ss, se in _ebml_elems(b, s, e, budget, tolerate_tail=True):
                if sid == 0x1549A966:  # Info
                    for iid, is_, ie in _ebml_elems(b, ss, se, budget):
                        if iid == 0x2AD7B1:
                            scale_ns = _ebml_uint(b, is_, ie) or scale_ns
                        elif iid == 0x4489:
                            dur_scaled = _ebml_float(b, is_, ie)
                elif sid == 0x1654AE6B:  # Tracks
                    for tid_, ts, te in _ebml_elems(b, ss, se, budget):
                        if tid_ != 0xAE or len(out["tracks"]) >= _MAX_TRACKS:
                            continue
                        tr = {"track_id": None, "handler": None, "codec": None,
                              "width": None, "height": None,
                              "duration_ms": None, "lang": None}
                        for fid, fs, fe in _ebml_elems(b, ts, te, budget):
                            if fid == 0xD7:
                                tr["track_id"] = _ebml_uint(b, fs, fe)
                            elif fid == 0x83:
                                tr["handler"] = {1: "vide", 2: "soun",
                                                 17: "text"}.get(
                                    _ebml_uint(b, fs, fe), "othr")
                            elif fid == 0x86:
                                tr["codec"] = b[fs:fe].decode("latin-1")
                            elif fid == 0x22B59C:
                                tr["lang"] = b[fs:fe].decode("latin-1")[:3]
                            elif fid == 0xE0:  # Video
                                for vid, vs, ve in _ebml_elems(b, fs, fe, budget):
                                    if vid == 0xB0:
                                        tr["width"] = _ebml_uint(b, vs, ve)
                                    elif vid == 0xBA:
                                        tr["height"] = _ebml_uint(b, vs, ve)
                        out["tracks"].append(tr)
            if dur_scaled is not None:
                import math

                ms = dur_scaled * scale_ns / 1e6
                # a hostile inf/NaN Duration float must refuse like any
                # other malformation, not escape as OverflowError past
                # the callers' (ValueError, struct.error) isolation
                if not math.isfinite(ms) or not (0 <= ms < 2**62):
                    raise ValueError("EBML duration out of range")
                out["duration_ms"] = int(ms)
    if out["brand"] is None and not out["tracks"] and out["duration_ms"] is None:
        raise ValueError("no recognizable EBML structure")
    return out


def probe_video(content: bytes) -> dict:
    """Route a blob to its container parser by magic: MP4-family (ftyp
    within the first boxes), EBML, or RIFF-AVI (operators/avi.py —
    whose MJPEG/DIB streams also DECODE, via decode_frames).
    ValueError for anything else — the caller's isolation contract
    handles it."""
    b = bytes(content)
    if len(b) >= 12 and b[4:8] == b"ftyp":
        return probe_mp4(b)
    if b[:4] == _EBML_MAGIC:
        return probe_ebml(b)
    if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        from streamsum_spark.operators.avi import probe_avi

        return probe_avi(b)
    raise ValueError("not a recognized video container")


TRACK_T = T.StructType(
    [
        T.StructField("track_id", T.LongType(), True),
        T.StructField("handler", T.StringType(), True),
        T.StructField("codec", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

PROBE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("probed", T.BooleanType(), False),
        T.StructField("container", T.StringType(), True),
        T.StructField("brand", T.StringType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("n_tracks", T.IntegerType(), True),
        T.StructField("tracks", T.ArrayType(TRACK_T), True),
    ]
)


def probe_media(
    media: DataFrame, batch_hint: int = 1024, byte_budget: int = 64 << 20
) -> DataFrame:
    """Arrow-batched container probe over (media_id, content): one row
    per blob with typed container metadata; unparseable blobs emit
    probed=false (extract_features' isolation posture).  Container
    metadata lives in the first KBs of a well-formed file, so at 100 TB
    the right feed is a range-read of heads, not whole blobs — the
    operator itself only walks what it is given."""
    import pandas as pd

    from streamsum_spark.operators.multimodal import _byte_budget_chunks

    def one(content):
        if content is None:
            return False, None, None, None, None, None
        try:
            d = probe_video(bytes(content))
        except (ValueError, struct.error):
            return False, None, None, None, None, None
        tracks = [
            (
                t["track_id"], t["handler"], t["codec"], t["width"],
                t["height"], t["duration_ms"], t["lang"],
            )
            for t in d["tracks"]
        ]
        return (True, d["container"], d["brand"], d["duration_ms"],
                len(tracks), tracks)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in _byte_budget_chunks(batches, byte_budget, batch_hint):
            res = pdf["content"].map(one)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "probed": res.map(lambda t: t[0]),
                    "container": res.map(lambda t: t[1]),
                    "brand": res.map(lambda t: t[2]),
                    "duration_ms": res.map(lambda t: t[3]).astype("Int64"),
                    "n_tracks": res.map(lambda t: t[4]).astype("Int32"),
                    "tracks": res.map(lambda t: t[5]),
                }
            )

    return media.select("media_id", "content").mapInPandas(run, PROBE_SCHEMA)


def with_probed_duration(media: DataFrame) -> DataFrame:
    """Fill null ``duration_ms`` from the container probe — the bridge
    between opaque video blobs and frame_sample_plan /
    extract_sampled_frames (multimodal.py), which drive off that
    column.  Rows whose metadata already carries a duration keep it
    (the probe never overrides); unprobeable rows stay null.  One
    left join on media_id; the probe relation carries no broadcast
    hint (it is one row per media — O(corpus))."""
    from pyspark.sql import functions as F

    probed = probe_media(media).select(
        "media_id", F.col("duration_ms").alias("_probed_ms")
    )
    return (
        media.join(probed, "media_id", "left")
        .withColumn("duration_ms", F.coalesce("duration_ms", "_probed_ms"))
        .drop("_probed_ms")
    )
