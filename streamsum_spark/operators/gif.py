"""GIF decoder (GIF87a/GIF89a) in pure stdlib + numpy — no codec libs.

Written from the public GIF89a specification the way jpeg.py was written
from T.81 and the PNG decoder from RFC 2083: LZW decompression with
variable code width (LSB-first packing, CLEAR/EOI codes, 12-bit cap),
global and local color tables, interlaced row ordering, and GIF89a
animation: ``decode_gif`` keeps the still-image contract (first frame,
frame-sized), while ``decode_gif_frames`` composites EVERY frame onto
the logical-screen canvas with Graphic Control Extension semantics —
per-frame transparency, placement, delays, and all three disposal
modes.

Hostile-input posture matches the other decoders: the logical-screen /
frame dimensions are capped before allocation (≤ _MAX_DECODED_BYTES
decoded), and LZW output stops at the frame's declared pixel count, so a
looping or over-long code stream cannot balloon memory or CPU — work is
bounded by min(stored bytes × 8 / code_width, declared pixels) dictionary
steps.  Malformed structure raises ValueError.

``encode_gif`` (the test fixture) emits valid LZW the simple way: literal
root codes with a CLEAR every 254 outputs, which keeps the code width
fixed — small and obviously correct over compact, like the other encode_*
fixtures.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_DECODED_BYTES = 16 * 1024 * 1024


from streamsum_spark.operators._compositing import (  # noqa: E402
    MAX_FRAMES_BYTES as _MAX_FRAMES_BYTES,
)


def decode_gif(b: bytes) -> np.ndarray:
    """Decode the first frame of a GIF to an (h, w, 3) uint8 RGB array
    (frame-sized, placement/transparency ignored — the historical
    still-image contract every existing pin targets; animation-aware
    callers use decode_gif_frames)."""
    try:
        for fr in _iter_raw_frames(bytes(b)):
            return fr["px"]
        raise ValueError("corrupt GIF: no image data")
    except (KeyError, IndexError, StopIteration, struct.error) as e:
        raise ValueError(f"corrupt GIF: {type(e).__name__}") from e


def decode_gif_frames(b: bytes) -> list[tuple[int, int, np.ndarray]]:
    """Decode EVERY frame of a (possibly animated) GIF, composited onto
    the logical-screen canvas: returns [(start_ms, duration_ms,
    (sh, sw, 3) uint8 RGB), ...] in presentation order.

    GIF89a animation semantics (Graphic Control Extension per frame):
    transparency (indices equal to the GCE's transparent index leave the
    canvas pixel untouched), frame placement at (left, top) clipped to
    the canvas, and all three disposal modes — 0/1 leave the canvas,
    2 restores the frame rect to the background color, 3 restores it to
    the pre-frame pixels.  The canvas starts as the background color
    (the GCT entry named by the header, else black); output is opaque
    RGB, so "transparent background" renders as that color.  Durations
    are the GCE delay in ms (0 kept as 0 — players' minimum-delay
    clamping is presentation policy, not decode).

    Hostile-input bound: per-frame and canvas dimension caps as
    decode_gif, plus a cumulative cap on composited output
    (_MAX_FRAMES_BYTES) so a 10k-frame bomb cannot balloon memory."""
    try:
        return _decode_gif_frames(bytes(b))
    except (KeyError, IndexError, StopIteration, struct.error) as e:
        raise ValueError(f"corrupt GIF: {type(e).__name__}") from e


def _decode_gif_frames(b: bytes) -> list[tuple[int, int, np.ndarray]]:
    sw, sh, flags, bg, _ar = _screen_descriptor(b)
    # a zero-dimension logical screen would pass the byte cap at 0 and
    # emit (0, 0, 3) frames whose pixel stats are NaN — poisoned
    # features, not an error (r9 review finding); corrupt input instead
    if sw == 0 or sh == 0:
        raise ValueError("corrupt GIF: zero-dimension logical screen")
    if sw * sh * 3 > _MAX_DECODED_BYTES:
        raise ValueError("GIF canvas exceeds the decode cap")
    gct = _global_table(b)
    bg_color = (
        gct[bg] if gct is not None and bg < len(gct) else np.zeros(3, np.uint8)
    )
    canvas = np.broadcast_to(bg_color, (sh, sw, 3)).copy()
    frames: list[tuple[int, int, np.ndarray]] = []
    t = 0
    out_bytes = 0
    for fr in _iter_raw_frames(b):
        # clip the frame rect to the canvas (frames placed fully outside
        # contribute nothing but still consume their duration)
        x0, y0 = min(fr["left"], sw), min(fr["top"], sh)
        x1, y1 = min(fr["left"] + fr["w"], sw), min(fr["top"] + fr["h"], sh)
        px = fr["px"][: y1 - y0, : x1 - x0]
        region = canvas[y0:y1, x0:x1]
        saved = region.copy() if fr["disposal"] == 3 else None
        if fr["transparent"] is not None:
            mask = fr["grid"][: y1 - y0, : x1 - x0] != fr["transparent"]
            region[mask] = px[mask]
        else:
            region[:] = px
        # per-frame floor: a tiny canvas (1x1 = 3 bytes) still costs
        # ~hundreds of bytes of tuple/ndarray overhead per emitted frame,
        # so a million-frame 1x1 GIF must not slide under the byte cap
        out_bytes += max(canvas.nbytes, 4096)
        if out_bytes > _MAX_FRAMES_BYTES:
            raise ValueError("animated GIF exceeds the composited-output cap")
        dur = fr["delay_cs"] * 10
        frames.append((t, dur, canvas.copy()))
        t += dur
        if fr["disposal"] == 2:
            region[:] = bg_color
        elif fr["disposal"] == 3:
            region[:] = saved
    if not frames:
        raise ValueError("corrupt GIF: no image data")
    return frames


def _screen_descriptor(b: bytes):
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    return struct.unpack("<HHBBB", b[6:13])


def _global_table(b: bytes):
    _sw, _sh, flags, _bg, _ar = _screen_descriptor(b)
    if not flags & 0x80:
        return None
    n = 2 << (flags & 0x07)
    gct = np.frombuffer(b[13 : 13 + 3 * n], dtype=np.uint8)
    if len(gct) != 3 * n:
        raise ValueError("truncated GIF color table")
    return gct.reshape(n, 3)


def _iter_raw_frames(b: bytes):
    """Walk the block stream yielding one dict per image descriptor:
    left/top/w/h, the frame-local ``px`` (RGB) and ``grid`` (palette
    indices, interlace already undone), and the preceding Graphic
    Control Extension's disposal / transparent-index / delay_cs (GIF89a:
    a GCE governs exactly the next image, then resets)."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    _sw, _sh, flags, _bg, _ar = _screen_descriptor(b)
    gct = _global_table(b)
    i = 13 + (3 * (2 << (flags & 0x07)) if flags & 0x80 else 0)
    disposal, transparent, delay_cs = 0, None, 0
    while i < len(b):
        block = b[i]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = b[i + 1] if i + 1 < len(b) else 0
            i += 2
            sub0 = i
            while i < len(b) and b[i] != 0:
                i += 1 + b[i]
            i += 1
            if label == 0xF9 and b[sub0] >= 4:  # Graphic Control Extension
                packed, delay_cs, tidx = struct.unpack(
                    "<BHB", b[sub0 + 1 : sub0 + 5]
                )
                disposal = (packed >> 2) & 0x07
                transparent = tidx if packed & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"corrupt GIF: unexpected block 0x{block:02x}")
        # image descriptor
        left, top, w, h, iflags = struct.unpack("<HHHHB", b[i + 1 : i + 10])
        i += 10
        if w == 0 or h == 0:
            raise ValueError("corrupt GIF: zero dimension")
        if w * h * 3 > _MAX_DECODED_BYTES:
            raise ValueError(
                f"GIF dimensions {w}x{h} exceed the "
                f"{_MAX_DECODED_BYTES >> 20} MiB decode cap"
            )
        table = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            table = np.frombuffer(b[i : i + 3 * n], dtype=np.uint8).reshape(n, 3)
            i += 3 * n
        if table is None:
            raise ValueError("corrupt GIF: no color table for frame")
        min_code = b[i]
        i += 1
        if not (2 <= min_code <= 11):
            raise ValueError(f"corrupt GIF: LZW min code size {min_code}")
        # gather the frame's data sub-blocks
        data = bytearray()
        while i < len(b) and b[i] != 0:
            ln = b[i]
            data += b[i + 1 : i + 1 + ln]
            i += 1 + ln
        i += 1
        idx = _lzw_decode(bytes(data), min_code, w * h)
        if len(idx) < w * h:
            raise ValueError("corrupt GIF: LZW stream ended early")
        grid = np.asarray(idx[: w * h], dtype=np.int32).reshape(h, w)
        if int(grid.max()) >= len(table):
            raise ValueError("corrupt GIF: color index out of range")
        px = table[grid]
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            order = np.concatenate(
                [np.arange(0, h, 8), np.arange(4, h, 8),
                 np.arange(2, h, 4), np.arange(1, h, 2)]
            )
            out = np.empty_like(px)
            out[order] = px
            grid2 = np.empty_like(grid)
            grid2[order] = grid
            px, grid = out, grid2
        yield {
            "left": left, "top": top, "w": w, "h": h,
            "px": px, "grid": grid,
            "disposal": disposal, "transparent": transparent,
            "delay_cs": delay_cs,
        }
        disposal, transparent, delay_cs = 0, None, 0


def _lzw_decode(data: bytes, min_code: int, max_pixels: int) -> np.ndarray:
    """GIF-flavor LZW: LSB-first variable-width codes, dictionary grows
    to 12 bits then freezes until CLEAR.  Output stops at ``max_pixels``
    (the frame's declared size), bounding work and memory by the capped
    header dims regardless of the code stream.  Decode is the shared
    vectorized core (_lzw.py): schedule-driven numpy code extraction +
    output-slice emission, pinned against the previous scalar decoder
    by a differential fuzz."""
    from streamsum_spark.operators._lzw import lzw_decode_gif

    return lzw_decode_gif(data, min_code, max_pixels)


def encode_gif(px: np.ndarray, palette: np.ndarray | None = None,
               interlace: bool = False) -> bytes:
    """Test-fixture GIF89a encoder: maps pixels to a palette (built from
    the image's unique colors unless given; ≤256 required) and emits
    8-bit literal LZW codes with a CLEAR every 254 outputs so the code
    width never grows — valid, simple, uncompressed-style LZW."""
    px = np.asarray(px, dtype=np.uint8)
    h, w = px.shape[:2]
    flat = px.reshape(-1, 3)
    if palette is None:
        palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    else:
        lut = {tuple(c): j for j, c in enumerate(palette)}
        inverse = np.array([lut[tuple(c)] for c in flat], dtype=np.int64)
    if len(palette) > 256:
        raise ValueError("encode_gif needs <= 256 unique colors")
    pal = np.zeros((256, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)  # GCT, 256 entries
    out += pal.tobytes()
    iflags = 0x40 if interlace else 0
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflags)
    idx = inverse.reshape(h, w)
    if interlace:
        order = np.concatenate(
            [np.arange(0, h, 8), np.arange(4, h, 8),
             np.arange(2, h, 4), np.arange(1, h, 2)]
        )
        idx = idx[order]
    out += _literal_lzw_blocks(idx.reshape(-1))
    out += b"\x3b"
    return bytes(out)


def _literal_lzw_blocks(seq) -> bytes:
    """min_code byte + sub-blocked literal 8-bit LZW (CLEAR every 254
    outputs so the code width never grows) + the 0 terminator."""
    min_code = 8
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    acc = nbits = 0
    lzw = bytearray()

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            lzw.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    for j, v in enumerate(seq):
        if j and j % 254 == 0:
            emit(clear)  # keep the decoder's dictionary from growing
        emit(int(v))
    emit(eoi)
    if nbits:
        lzw.append(acc & 0xFF)
    out = bytearray([min_code])
    for off in range(0, len(lzw), 255):
        chunk = lzw[off : off + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00"
    return bytes(out)


def encode_gif_animated(
    frames: list,
    delays_cs: list[int],
    disposals: list[int] | None = None,
    offsets: list[tuple[int, int]] | None = None,
    canvas: tuple[int, int] | None = None,
    transparent_color: tuple[int, int, int] | None = None,
    bg_color: tuple[int, int, int] | None = None,
) -> bytes:
    """Test-fixture animated GIF89a: one global palette over all frames,
    a Graphic Control Extension per frame carrying (disposal, delay,
    transparent index), frames placed at ``offsets`` on a ``canvas``
    (defaults: (0,0) and the first frame's size — (h, w)).

    ``transparent_color``: pixels of exactly this RGB encode as the
    transparent index (punching through to the prior canvas contents);
    ``bg_color``: the logical-screen background (what disposal-2 and the
    initial canvas show) — must appear in the palette, defaults to
    palette entry 0."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    disposals = disposals or [0] * len(frames)
    offsets = offsets or [(0, 0)] * len(frames)
    ch, cw = canvas or frames[0].shape[:2]
    allpx = [f.reshape(-1, 3) for f in frames]
    if bg_color is not None:
        allpx.append(np.array([bg_color], np.uint8))
    if transparent_color is not None:
        # reserve a palette slot even when no frame pixel carries the
        # color, else the LUT lookup below raises a bare KeyError
        allpx.append(np.array([transparent_color], np.uint8))
    palette = np.unique(np.concatenate(allpx), axis=0)
    if len(palette) > 256:
        raise ValueError("encode_gif_animated needs <= 256 unique colors")
    lut = {tuple(int(v) for v in c): j for j, c in enumerate(palette)}
    tidx = lut[tuple(transparent_color)] if transparent_color is not None else None
    bidx = lut[tuple(bg_color)] if bg_color is not None else 0
    pal = np.zeros((256, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", cw, ch, 0x80 | 0x07, bidx, 0)
    out += pal.tobytes()
    for f, delay, disp, (left, top) in zip(frames, delays_cs, disposals, offsets):
        h, w = f.shape[:2]
        packed = ((disp & 0x07) << 2) | (0x01 if tidx is not None else 0)
        out += b"\x21\xf9\x04" + struct.pack(
            "<BHB", packed, delay, tidx or 0
        ) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0)
        idx = np.array(
            [lut[tuple(int(v) for v in c)] for c in f.reshape(-1, 3)],
            dtype=np.int64,
        )
        out += _literal_lzw_blocks(idx)
    out += b"\x3b"
    return bytes(out)
