"""Universal decode-free media header probe — typed facts (format,
dimensions, depth, frame/page count, sample rate, channels, duration)
from the first KBs of a blob, across every format this engine decodes
plus MP3.

Why it exists (SURVEY §2 multimodal posture): at 100 TB, corpus
curation filters on dimensions/format/duration BEFORE paying any
decode — "keep images ≥ 256x256", "drop clips > 10 min", "partition by
format" are header questions, and a probe that decodes pixels to
answer them wastes the cluster.  This probe reads headers only: no
entropy-coded data is DECODED for any format.  Two honesty notes on
"first KBs": frame/page COUNTS (GIF, animated WebP/APNG, multi-page
TIFF) walk the container's block/chunk/IFD structure skipping every
compressed payload by its declared length, and DURATIONS of unindexed
stream formats walk the whole blob's frame/page chain without decoding
(MP3 frame headers, Ogg's last granule position) — those two fields
genuinely cost O(blob bytes) of structure walking, everything else
lives in the head.

Parsers are written from the same public specs as the decoders and
share their hostile-input posture: bounded walks, strict forward
progress, ValueError on malformation (probe_media_headers isolates
per row).  Video containers delegate to video_probe (MP4/WebM/AVI).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd

_MAX_WALK = 65536  # blocks/chunks/pages walked per blob

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_MODES = {0: "gray", 2: "rgb", 3: "palette", 4: "gray_alpha", 6: "rgba"}
# SOF markers that carry frame dimensions (T.81 §B.2.2): C0-CF minus
# DHT (C4), JPG (C8), DAC (CC)
_SOF_MARKERS = set(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


# --- image headers -----------------------------------------------------------


def _probe_bmp(b: bytes) -> dict:
    if len(b) < 26:
        raise ValueError("truncated BMP header")
    bisz, w, h = struct.unpack_from("<Iii", b, 14)
    if bisz < 12:
        raise ValueError("corrupt BMP header size")
    bpp = struct.unpack_from("<H", b, 28)[0] if len(b) >= 30 else None
    return {
        "format": "bmp", "width": abs(w), "height": abs(h),
        "bit_depth": bpp,
        "color_mode": "palette" if bpp and bpp <= 8 else "rgb",
    }


def _probe_pnm(b: bytes) -> dict:
    kind = b[:2].decode("latin-1")
    toks: list[int] = []
    i = 2
    while len(toks) < 3 and i < min(len(b), 4096):
        c = b[i : i + 1]
        if c == b"#":
            while i < len(b) and b[i] not in (10, 13):
                i += 1
        elif c.isspace():
            i += 1
        elif c.isdigit():
            j = i
            while j < len(b) and b[j : j + 1].isdigit():
                j += 1
            toks.append(int(b[i:j]))
            i = j
        else:
            raise ValueError("corrupt PNM header")
    if len(toks) < 3:
        raise ValueError("truncated PNM header")
    w, h, maxval = toks
    return {
        "format": "pnm", "width": w, "height": h,
        "bit_depth": max(maxval.bit_length(), 1),
        "color_mode": "gray" if kind in ("P2", "P5") else "rgb",
    }


def _probe_png(b: bytes) -> dict:
    if len(b) < 33 or b[12:16] != b"IHDR":
        raise ValueError("truncated PNG IHDR")
    w, h = struct.unpack_from(">II", b, 16)
    depth, ctype = b[24], b[25]
    if ctype not in _PNG_MODES:
        raise ValueError("corrupt PNG color type")
    out = {
        "format": "png", "width": w, "height": h, "bit_depth": depth,
        "color_mode": _PNG_MODES[ctype], "n_frames": 1,
    }
    # acTL (before IDAT by spec) declares the animation frame count
    i, walked = 8, 0
    while i + 8 <= len(b) and walked < _MAX_WALK:
        walked += 1
        ln = int.from_bytes(b[i : i + 4], "big")
        typ = b[i + 4 : i + 8]
        if typ == b"acTL" and ln >= 8:
            out["n_frames"] = struct.unpack_from(">I", b, i + 8)[0]
            break
        if typ in (b"IDAT", b"IEND"):
            break
        i += 12 + ln
    return out


def _exif_orientation(app1: bytes) -> int | None:
    """Tag 274 from the Exif APP1 payload's embedded TIFF structure
    (reusing the TIFF IFD reader); None when absent or malformed —
    orientation is advisory, a bad EXIF must not fail the probe."""
    if app1[:6] != b"Exif\x00\x00":
        return None
    t = app1[6:]
    bo = {b"II": "<", b"MM": ">"}.get(t[:2])
    if bo is None:
        return None
    try:
        from streamsum_spark.operators.tiff import _read_ifd

        off = struct.unpack_from(bo + "I", t, 4)[0]
        val = _read_ifd(t, bo, off).get(274, [None])[0]
    except (ValueError, struct.error, IndexError):
        return None
    return val if val in range(1, 9) else None


_QUALITY_TABLES = None


def _jpeg_quality_estimate(dqt_luma: bytes) -> int | None:
    """The libjpeg-convention quality behind a luminance DQT — the
    standard recompression-detection signal.  Rather than inverting the
    rounded q = clip((base*s+50)/100) scaling per coefficient (noisy:
    rounding loss compounds), compare against all 100 candidate tables:
    EXACT for Annex-K encoders (ours round-trips every quality 1-100,
    pinned), nearest-L1 for custom tables — "how aggressively was this
    quantized" is the signal that matters."""
    import numpy as np

    from streamsum_spark.operators.jpeg import _Q_LUM, _ZIGZAG, _scale_q

    q = np.frombuffer(dqt_luma[:64], np.uint8).astype(np.int64)
    if len(q) < 64 or (q == 0).any():
        return None
    global _QUALITY_TABLES
    if _QUALITY_TABLES is None:
        _QUALITY_TABLES = np.stack(
            [_scale_q(_Q_LUM, k)[_ZIGZAG] for k in range(1, 101)]
        )
    dist = np.abs(_QUALITY_TABLES - q).sum(axis=1)
    return int(dist.argmin()) + 1


def _probe_jpeg(b: bytes) -> dict:
    pos = 2
    n = len(b)
    orient = None
    quality = None
    while pos + 4 <= n:
        if b[pos] != 0xFF:
            raise ValueError("corrupt JPEG marker stream")
        marker = b[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker in _SOF_MARKERS:
            prec, h, w, ncomp = struct.unpack_from(">BHHB", b, pos + 4)
            return {
                "format": "jpeg", "width": w, "height": h, "bit_depth": prec,
                "color_mode": "gray" if ncomp == 1 else "ycbcr",
                "orientation": orient, "quality": quality,
            }
        if marker in (0x01, 0xD8, *range(0xD0, 0xD8)):
            pos += 2
            continue
        if marker == 0xD9 or marker == 0xDA:
            break  # EOI / scan data before any SOF
        seg = struct.unpack_from(">H", b, pos + 2)[0]
        if seg < 2:
            raise ValueError("corrupt JPEG segment length")
        if marker == 0xE1 and orient is None:
            orient = _exif_orientation(b[pos + 4 : pos + 2 + seg])
        elif marker == 0xDB and quality is None:
            # first DQT with table id 0 (luma), 8-bit precision
            p, end = pos + 4, pos + 2 + seg
            while p < end and p + 65 <= n:
                if b[p] == 0x00:
                    quality = _jpeg_quality_estimate(b[p + 1 : p + 65])
                    break
                p += 65 if (b[p] >> 4) == 0 else 129
        pos += 2 + seg
    raise ValueError("JPEG without a frame header")


def _probe_gif(b: bytes) -> dict:
    if len(b) < 13:
        raise ValueError("truncated GIF header")
    w, h = struct.unpack_from("<HH", b, 6)
    flags = b[10]
    out = {
        "format": "gif", "width": w, "height": h,
        "bit_depth": (flags & 7) + 1, "color_mode": "palette",
    }
    i = 13 + (3 * (2 << (flags & 7)) if flags & 0x80 else 0)

    def skip_subblocks(j: int) -> int:
        walked = 0
        while j < len(b) and b[j] != 0 and walked < _MAX_WALK:
            j += 1 + b[j]
            walked += 1
        return j + 1

    frames, walked = 0, 0
    while i < len(b) and walked < _MAX_WALK:
        walked += 1
        tag = b[i]
        if tag == 0x3B:  # trailer
            break
        if tag == 0x21:  # extension: label + sub-blocks
            i = skip_subblocks(i + 2)
        elif tag == 0x2C:  # image descriptor
            if i + 10 > len(b):
                break
            frames += 1
            lflags = b[i + 9]
            i += 10 + (3 * (2 << (lflags & 7)) if lflags & 0x80 else 0)
            i = skip_subblocks(i + 1)  # LZW min-code byte, then data
        else:
            raise ValueError("corrupt GIF block tag")
    out["n_frames"] = max(frames, 1)
    return out


def _probe_webp(b: bytes) -> dict:
    out = {"format": "webp", "bit_depth": 8, "color_mode": "rgb",
           "n_frames": 1}
    i, walked = 12, 0
    while i + 8 <= len(b) and walked < _MAX_WALK:
        walked += 1
        cc = b[i : i + 4]
        ln = struct.unpack_from("<I", b, i + 4)[0]
        s = i + 8
        if cc == b"VP8X" and ln >= 10:
            flags = b[s]
            out["color_mode"] = "rgba" if flags & 0x10 else "rgb"
            out["width"] = (int.from_bytes(b[s + 4 : s + 7], "little")) + 1
            out["height"] = (int.from_bytes(b[s + 7 : s + 10], "little")) + 1
            if flags & 0x02:  # animated: count ANMF chunks
                out["n_frames"] = 0
        elif cc == b"ANMF":
            out["n_frames"] += 1
        elif cc == b"VP8 " and "width" not in out:
            if ln < 10 or b[s + 3 : s + 6] != b"\x9d\x01\x2a":
                raise ValueError("corrupt VP8 key frame header")
            w, h = struct.unpack_from("<HH", b, s + 6)
            out["width"], out["height"] = w & 0x3FFF, h & 0x3FFF
        elif cc == b"VP8L" and "width" not in out:
            if ln < 5 or b[s] != 0x2F:
                raise ValueError("corrupt VP8L signature")
            bits = int.from_bytes(b[s + 1 : s + 5], "little")
            out["width"] = (bits & 0x3FFF) + 1
            out["height"] = ((bits >> 14) & 0x3FFF) + 1
            if (bits >> 28) & 1:
                out["color_mode"] = "rgba"
        i = s + ln + (ln & 1)
    if "width" not in out:
        raise ValueError("WebP without a dimension-bearing chunk")
    return out


def _probe_tiff(b: bytes) -> dict:
    from streamsum_spark.operators.tiff import _read_ifd

    bo = {b"II": "<", b"MM": ">"}.get(b[:2])
    if bo is None or struct.unpack_from(bo + "H", b, 2)[0] != 42:
        raise ValueError("not a TIFF")
    off = struct.unpack_from(bo + "I", b, 4)[0]
    tags = _read_ifd(b, bo, off)
    if 256 not in tags or 257 not in tags:
        raise ValueError("TIFF IFD without dimensions")
    photo = tags.get(262, [None])[0]
    mode = {0: "gray", 1: "gray", 2: "rgb", 3: "palette"}.get(photo, "other")
    orient = tags.get(274, [None])[0]
    # page count: follow the next-IFD chain (offsets only, bounded)
    pages = 1
    seen = {off}
    while pages < _MAX_WALK:
        n = struct.unpack_from(bo + "H", b, off)[0]
        nxt_at = off + 2 + 12 * n
        if nxt_at + 4 > len(b):
            break
        nxt = struct.unpack_from(bo + "I", b, nxt_at)[0]
        if nxt == 0 or nxt in seen or nxt + 2 > len(b):
            break
        seen.add(nxt)
        off = nxt
        pages += 1
    return {
        "format": "tiff", "width": tags[256][0], "height": tags[257][0],
        "bit_depth": max(tags.get(258, [1])), "color_mode": mode,
        "n_frames": pages,
        "orientation": orient if orient in range(1, 9) else None,
    }


def _probe_ico(b: bytes) -> dict:
    kind = struct.unpack_from("<H", b, 2)[0]
    n = struct.unpack_from("<H", b, 4)[0]
    if n < 1:
        raise ValueError("empty ICO directory")
    best = None
    for i in range(min(n, 64)):
        e = 6 + 16 * i
        if e + 16 > len(b):
            raise ValueError("truncated ICO directory")
        w, h = b[e] or 256, b[e + 1] or 256
        bpp = struct.unpack_from("<H", b, e + 6)[0]
        if best is None or w * h > best[0] * best[1]:
            best = (w, h, bpp)
    return {
        "format": "ico" if kind == 1 else "cur",
        "width": best[0], "height": best[1],
        "bit_depth": best[2] or None, "color_mode": "rgb", "n_frames": n,
    }


def probe_image_header(content: bytes) -> dict:
    """format/width/height/bit_depth/color_mode (+ n_frames for
    animated/paged formats) without decoding any pixel data."""
    b = bytes(content)
    if b[:2] == b"BM":
        return _probe_bmp(b)
    if b[:2] in (b"P2", b"P3", b"P5", b"P6"):
        return _probe_pnm(b)
    if b[:8] == _PNG_SIG:
        return _probe_png(b)
    if b[:2] == b"\xff\xd8":
        return _probe_jpeg(b)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return _probe_gif(b)
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        return _probe_webp(b)
    if b[:2] in (b"II", b"MM"):
        return _probe_tiff(b)
    if b[:4] in (b"\x00\x00\x01\x00", b"\x00\x00\x02\x00"):
        return _probe_ico(b)
    raise ValueError("not a recognized image format")


# --- audio headers -----------------------------------------------------------


def _probe_wav(b: bytes) -> dict:
    fmt = None
    data_len = None
    i = 12
    walked = 0
    while i + 8 <= len(b) and walked < _MAX_WALK:
        walked += 1
        cid, sz = b[i : i + 4], struct.unpack_from("<I", b, i + 4)[0]
        if cid == b"fmt " and sz >= 16:
            fmt = struct.unpack_from("<HHIIHH", b, i + 8)
        elif cid == b"data":
            data_len = sz
        i += 8 + sz + (sz & 1)
    if fmt is None:
        raise ValueError("WAV without fmt chunk")
    tag, ch, rate, byte_rate, _block, bits = fmt
    dur = None
    if data_len is not None and byte_rate > 0:
        dur = data_len * 1000 // byte_rate
    return {
        "format": "wav", "sample_rate": rate, "channels": ch,
        "bits": bits, "duration_ms": dur,
        "codec": {1: "pcm", 6: "alaw", 7: "mulaw", 0x11: "adpcm_ima"}.get(
            tag, f"wave_0x{tag:04x}"
        ),
    }


def _probe_flac(b: bytes) -> dict:
    """STREAMINFO is the mandatory first metadata block (RFC 9639
    §8.2): 34 bytes, fixed bit layout."""
    if len(b) < 8 + 34 or (b[4] & 0x7F) != 0:
        raise ValueError("FLAC without leading STREAMINFO")
    s = 8  # 4 magic + 1 header byte + 3 length
    rate = (b[s + 10] << 12) | (b[s + 11] << 4) | (b[s + 12] >> 4)
    ch = ((b[s + 12] >> 1) & 0x7) + 1
    bps = (((b[s + 12] & 1) << 4) | (b[s + 13] >> 4)) + 1
    total = ((b[s + 13] & 0xF) << 32) | int.from_bytes(b[s + 14 : s + 18], "big")
    if rate == 0:
        raise ValueError("corrupt FLAC STREAMINFO")
    return {
        "format": "flac", "sample_rate": rate, "channels": ch, "bits": bps,
        "duration_ms": total * 1000 // rate if total else None, "codec": "flac",
    }


def _probe_aiff(b: bytes) -> dict:
    from streamsum_spark.operators.multimodal import _parse_f80

    i, walked = 12, 0
    while i + 8 <= len(b) and walked < _MAX_WALK:
        walked += 1
        cid = b[i : i + 4]
        sz = struct.unpack_from(">I", b, i + 4)[0]
        if cid == b"COMM" and sz >= 18:
            ch, nframes, bits = struct.unpack_from(">HIH", b, i + 8)
            rate = int(round(_parse_f80(b[i + 16 : i + 26])))
            if rate <= 0:
                raise ValueError("corrupt AIFF rate")
            return {
                "format": "aiff", "sample_rate": rate, "channels": ch,
                "bits": bits, "duration_ms": nframes * 1000 // rate,
                "codec": "pcm",
            }
        i += 8 + sz + (sz & 1)
    raise ValueError("AIFF without COMM chunk")


_AU_BITS = {1: 8, 2: 8, 3: 16, 4: 24, 5: 32, 6: 32, 7: 64, 27: 8}
_AU_CODEC = {1: "mulaw", 2: "pcm", 3: "pcm", 4: "pcm", 5: "pcm",
             6: "float", 7: "float", 27: "alaw"}


def _probe_au(b: bytes) -> dict:
    if len(b) < 24:
        raise ValueError("truncated AU header")
    _, data_off, data_sz, enc, rate, ch = struct.unpack_from(">6I", b, 0)
    if rate == 0 or ch == 0:
        raise ValueError("corrupt AU header")
    bits = _AU_BITS.get(enc)
    dur = None
    if bits and data_sz not in (0, 0xFFFFFFFF):
        dur = data_sz * 8000 // (bits * ch * rate)
    return {
        "format": "au", "sample_rate": rate, "channels": ch, "bits": bits,
        "duration_ms": dur, "codec": _AU_CODEC.get(enc, f"au_{enc}"),
    }


def _probe_ogg(b: bytes) -> dict:
    """Ogg container (RFC 3533 page layout) with Vorbis-I or Opus
    (RFC 7845 OpusHead) identification headers.  Decode of either
    codec honestly refuses elsewhere — this is the mp3.py posture:
    the metadata half is parseable, the spectral half is not.
    Duration comes from the stream's last granule position (PCM
    samples at the codec rate; Opus granules are at 48 kHz minus
    pre-skip).  Page CRCs are not verified: this extracts routing
    metadata, it does not certify stream integrity."""
    codec = rate = ch = serial = last_gran = None
    preskip = 0
    pos, walked = 0, 0
    while pos + 27 <= len(b) and b[pos : pos + 4] == b"OggS" and walked < _MAX_WALK:
        walked += 1
        nseg = b[pos + 26]
        segs = b[pos + 27 : pos + 27 + nseg]
        if len(segs) < nseg:
            break
        body = pos + 27 + nseg
        size = sum(segs)
        if body + size > len(b):
            break  # truncated final page: keep what we have
        gran = int.from_bytes(b[pos + 6 : pos + 14], "little", signed=True)
        ser = int.from_bytes(b[pos + 14 : pos + 18], "little")
        if codec is None:
            pkt = b[body : body + size]
            if pkt[:7] == b"\x01vorbis" and size >= 16:
                codec, serial = "vorbis", ser
                ch = pkt[11]
                rate = int.from_bytes(pkt[12:16], "little")
            elif pkt[:8] == b"OpusHead" and size >= 12:
                codec, serial = "opus", ser
                ch = pkt[9]
                preskip = int.from_bytes(pkt[10:12], "little")
                rate = 48000
        if ser == serial and gran >= 0:
            last_gran = gran
        pos = body + size
    if walked == 0:
        raise ValueError("not an Ogg stream")
    if codec is None:
        # structurally valid Ogg of a codec we don't identify
        return {"format": "ogg", "sample_rate": None, "channels": None,
                "bits": None, "duration_ms": None, "codec": None}
    if not rate:
        raise ValueError("corrupt Ogg identification header")
    dur = None
    if last_gran is not None:
        samples = max(last_gran - (preskip if codec == "opus" else 0), 0)
        dur = samples * 1000 // rate
    return {"format": "ogg", "sample_rate": rate, "channels": ch,
            "bits": None, "duration_ms": dur, "codec": codec}


def probe_audio_header(content: bytes) -> dict:
    """format/sample_rate/channels/bits/duration_ms/codec without
    decoding any samples (MP3 walks frame headers: mp3_stream_info)."""
    b = bytes(content)
    if b[:4] == b"fLaC":
        return _probe_flac(b)
    if b[:4] == b"FORM" and b[8:12] in (b"AIFF", b"AIFC"):
        return _probe_aiff(b)
    if b[:4] == b".snd":
        return _probe_au(b)
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return _probe_wav(b)
    if b[:4] == b"OggS":
        return _probe_ogg(b)
    if b[:3] == b"ID3" or (len(b) > 1 and b[0] == 0xFF and b[1] & 0xE0 == 0xE0):
        from streamsum_spark.operators.mp3 import mp3_stream_info

        info = mp3_stream_info(b)
        return {
            "format": "mp3", "sample_rate": info["sample_rate"],
            "channels": info["channels"], "bits": None,
            "duration_ms": info["duration_ms"], "codec": "mp3",
        }
    raise ValueError("not a recognized audio format")


# --- the Spark operator ------------------------------------------------------

HEADER_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("probed", T.BooleanType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("bit_depth", T.IntegerType(), True),
        T.StructField("color_mode", T.StringType(), True),
        T.StructField("orientation", T.IntegerType(), True),
        T.StructField("quality", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("bits", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def probe_header(content: bytes) -> dict:
    """One blob → {kind, ...typed header facts}.  Video containers
    delegate to video_probe and surface the first video track's
    geometry; ValueError for unrecognized bytes."""
    b = bytes(content)
    is_avi = b[:4] == b"RIFF" and b[8:12] == b"AVI "
    is_mp4 = len(b) >= 12 and b[4:8] == b"ftyp"
    is_ebml = b[:4] == b"\x1a\x45\xdf\xa3"
    if is_avi or is_mp4 or is_ebml:
        from streamsum_spark.operators.video_probe import probe_video

        p = probe_video(b)
        vt = next((t for t in p["tracks"] if t["handler"] == "vide"), None)
        st = next((t for t in p["tracks"] if t["handler"] == "soun"), None)
        # an .m4a / audio-only WebM is an audio blob in a movie
        # container — report the kind a curation filter expects
        kind = "video" if vt or st is None else "audio"
        return {
            "kind": kind, "format": p["container"],
            "width": vt["width"] if vt else None,
            "height": vt["height"] if vt else None,
            "duration_ms": p["duration_ms"],
        }
    try:
        return {"kind": "image", **probe_image_header(b)}
    except (ValueError, struct.error):
        # struct.error: a truncated blob of a matched image magic
        # (e.g. a 5-byte ICO) — fall through to the audio attempt
        pass
    return {"kind": "audio", **probe_audio_header(b)}


def probe_media_headers(
    media: DataFrame, batch_hint: int = 256, byte_budget: int = 64 << 20
) -> DataFrame:
    """Arrow-batched header probe over a (media_id, content) relation —
    one typed row per blob, per-row error isolation (probed=false for
    unrecognized/corrupt blobs).  At 100 TB the right feed is a
    head-range read: every field this emits lives in the first KBs
    except MP3/Ogg durations, which walk the blob's frame/page chain
    (structure only, no decode — see the module docstring)."""
    import pandas as pd

    from streamsum_spark.operators.multimodal import _byte_budget_chunks

    cols = [f.name for f in HEADER_SCHEMA][1:]  # after media_id

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in _byte_budget_chunks(batches, byte_budget, batch_hint):
            rows = []
            for content in pdf["content"]:
                try:
                    if content is None:
                        raise ValueError("null content")
                    d = probe_header(bytes(content))
                    d["probed"] = True
                except (ValueError, NotImplementedError, struct.error):
                    d = {"probed": False}
                rows.append([d.get(c) for c in cols])
            out = pd.DataFrame(rows, columns=cols)
            out.insert(0, "media_id", pdf["media_id"].values)
            for c, dt in (
                ("width", "Int32"), ("height", "Int32"), ("bit_depth", "Int32"),
                ("orientation", "Int32"), ("quality", "Int32"),
                ("n_frames", "Int64"),
                ("sample_rate", "Int32"), ("channels", "Int32"),
                ("bits", "Int32"), ("duration_ms", "Int64"),
            ):
                out[c] = out[c].astype(dt)
            yield out

    return media.select("media_id", "content").mapInPandas(run, HEADER_SCHEMA)
