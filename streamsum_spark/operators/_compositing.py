"""Shared animation-compositing primitives for the WebP and APNG frame
decoders (gif.py composites palettized RGB and needs neither).

One definition of the straight-alpha OVER blend and one cap constant:
the two compositors previously duplicated the 8-line integer blend
verbatim, and each module re-declared its own output cap — a fix to
either had to land in three places or the decoders silently diverged
(round-9 review finding).
"""

from __future__ import annotations

import numpy as np

# Cumulative composited-output bound across an animation's emitted
# frames, AND (divided by the canvas element size) the single-canvas
# allocation bound — a hostile file declaring a huge canvas must fail
# BEFORE allocation, not when the counter catches up (the r9 review
# measured a 156-byte WebP driving 4 GB of int64 temporaries through a
# cap that assumed 4 bytes/pixel).
MAX_FRAMES_BYTES = 256 * 1024 * 1024

# Canvas pixel bound: RGBA int32 working canvas + same-sized blend
# temporaries stay within ~4x MAX_FRAMES_BYTES/16 = 64 MiB each.
MAX_CANVAS_PIXELS = MAX_FRAMES_BYTES // 64


def check_canvas(w: int, h: int, what: str) -> None:
    if w <= 0 or h <= 0:
        raise ValueError(f"corrupt {what}: zero-dimension canvas")
    if w * h > MAX_CANVAS_PIXELS:
        raise ValueError(f"{what} canvas exceeds the decode cap")


def over(region: np.ndarray, fr: np.ndarray) -> None:
    """In-place straight-alpha OVER: composite RGBA frame ``fr`` onto
    RGBA canvas slice ``region`` (both integer arrays, values 0..255),
    with round-half-up integer arithmetic.  int32 is sufficient: the
    numerator peaks at 255*255*255 ~ 1.66e7."""
    a_f = fr[:, :, 3:4]
    a_c = region[:, :, 3:4]
    a_out = a_f + (a_c * (255 - a_f) + 127) // 255
    num = fr[:, :, :3] * a_f * 255 + region[:, :, :3] * a_c * (255 - a_f)
    den = a_out * 255
    region[:, :, :3] = np.where(
        a_out > 0, (num + den // 2) // np.maximum(den, 1), 0
    )
    region[:, :, 3:4] = a_out
