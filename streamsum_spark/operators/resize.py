"""Image resize — the remaining member of the multimodal prep family
(decode / feature-extract / RESIZE / frame-sample): the thumbnail /
model-input-normalization step every vision training pipeline runs
between decode and feature extraction.

Reference parity: the reference system (streamsum) has no media
surface; this module extends the 100 TB training-data pipeline family
alongside operators/multimodal.py.

Kernel semantics — antialiased separable resampling with a triangle
filter whose support scales with the downscale factor (the
Pillow-BILINEAR-with-antialias / area-weighted convention, half-pixel
centers; at the borders out-of-range taps are DROPPED and the
remaining weights renormalized — not edge-padding):

- downscale: every output pixel is a weighted average over ~2*scale
  input pixels per axis, so high-frequency content is averaged, not
  aliased (a plain bilinear 8x downscale would sample 1 of every 64
  pixels — exactly the moire/speckle artifact training corpora must
  not bake in);
- upscale: support clamps to 1 and the kernel is classic bilinear;
- identity (same size) is exact, constants are exact at any ratio
  (weights are renormalized to sum 1), and affine ramps are preserved
  in the interior (triangle filters reproduce linear signals).

Determinism contract: the arithmetic is float64 with a FIXED tap
accumulation order (ascending tap index, the same order as the
per-pixel definition), so outputs are byte-identical across runs,
partitionings, and hosts — no BLAS/matmul dispatch whose reduction
order varies with thread count.  tests/test_resize.py pins the
vectorized kernel byte-equal to a per-pixel reference implementation
over a shape grid including edges (1x1, single-row/column, extreme
aspect changes).

Spark surface: ``resize_media`` is the Arrow-batched executor-side
operator (mapInPandas over byte-budgeted chunks, the exact
extract_features posture from multimodal.py): decode via
multimodal.decode_image (which routes the native fast paths and owns
the refusal contract), resample, re-encode PNG — one blob in, one
portable blob out, undecodable inputs isolated per-row with
decoded=false rather than failing the task.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from typing import TYPE_CHECKING

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd


def _resample_taps(in_len: int, out_len: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-output-pixel input taps and normalized weights for one axis:
    (idx, w) of shape (out_len, ksize).  Triangle kernel with support
    max(1, in/out); out-of-range taps get weight 0 (their index is
    clamped only so fancy indexing stays in bounds) and each row is
    renormalized — border pixels average their in-range taps only."""
    scale = in_len / out_len
    support = max(1.0, scale)
    ksize = int(np.ceil(support)) * 2 + 1
    centers = (np.arange(out_len, dtype=np.float64) + 0.5) * scale
    left = np.floor(centers - support + 0.5).astype(np.int64)
    idx = left[:, None] + np.arange(ksize)[None, :]
    x = (idx + 0.5 - centers[:, None]) / support
    w = np.clip(1.0 - np.abs(x), 0.0, None)
    w = np.where((idx >= 0) & (idx < in_len), w, 0.0)
    idx = np.clip(idx, 0, in_len - 1)
    return idx, w / w.sum(axis=1, keepdims=True)


def _resample_axis0(a: np.ndarray, out_len: int) -> np.ndarray:
    """Resample axis 0 of a float64 array by accumulating taps in
    ascending-tap order — each iteration is one vectorized
    gather-multiply-add of (out_len, rest...) so peak extra memory is
    one output-sized temporary, never the (out, ksize, rest) gather an
    einsum formulation would materialize on a deep downscale."""
    idx, w = _resample_taps(a.shape[0], out_len)
    out = np.zeros((out_len,) + a.shape[1:], dtype=np.float64)
    wshape = (-1,) + (1,) * (a.ndim - 1)
    for k in range(idx.shape[1]):
        out += w[:, k].reshape(wshape) * a[idx[:, k]]
    return out


def resize_image(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Resize an (h, w, c) or (h, w) uint8 image to (out_h, out_w[, c])
    with the module's antialiased triangle kernel.  Separable: rows
    then columns (same result either order; triangle is symmetric and
    the axes are independent)."""
    if out_w < 1 or out_h < 1:
        raise ValueError("resize target must be >= 1x1")
    if px.ndim not in (2, 3) or px.shape[0] < 1 or px.shape[1] < 1:
        # an empty source would divide by a zero weight sum and emit
        # NaN garbage — refuse loudly instead
        raise ValueError("resize source must be a non-empty (h, w[, c]) array")
    a = px.astype(np.float64)
    if px.shape[0] != out_h:
        a = _resample_axis0(a, out_h)
    if px.shape[1] != out_w:
        a = np.swapaxes(_resample_axis0(np.swapaxes(a, 0, 1), out_w), 0, 1)
    return np.clip(np.rint(a), 0.0, 255.0).astype(np.uint8)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("decoded", T.BooleanType(), False),
        T.StructField("src_width", T.IntegerType(), True),
        T.StructField("src_height", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("content", T.BinaryType(), True),
    ]
)


def resize_media(
    media: DataFrame,
    out_w: int = 224,
    out_h: int = 224,
    batch_hint: int = 256,
    byte_budget: int = 64 << 20,
) -> DataFrame:
    """Arrow-batched resize over a (media_id, content) binary column:
    decode -> resample -> re-encode PNG (filter 0: the cheap filter —
    resized thumbnails recompress downstream if storage matters, so
    encode speed wins over ratio here).

    Error isolation mirrors extract_features: a blob decode_image
    refuses (or a malformed container past the magic bytes) emits
    decoded=false with null content — one hostile blob never fails the
    task, and a sampled native/spec divergence still raises loudly
    (RuntimeError is deliberately not caught).  Chunks are bounded by
    ``byte_budget`` cumulative blob bytes and ``batch_hint`` rows so
    chunk + decode intermediates fit executor memory at 100 TB blob
    mixes (multimodal._byte_budget_chunks)."""
    import pandas as pd

    from streamsum_spark.operators.multimodal import (
        _byte_budget_chunks,
        decode_image,
        encode_png,
    )

    if out_w < 1 or out_h < 1:
        raise ValueError("resize target must be >= 1x1")

    def one(content) -> tuple[bool, int | None, int | None, bytes | None]:
        if content is None:
            return False, None, None, None
        try:
            px = decode_image(bytes(content))
        except (NotImplementedError, ValueError, struct.error):
            return False, None, None, None
        h, w = px.shape[:2]
        if px.ndim == 2:
            px = np.repeat(px[:, :, None], 3, axis=2)
        return True, int(w), int(h), encode_png(resize_image(px, out_w, out_h))

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in _byte_budget_chunks(batches, byte_budget, batch_hint):
            res = pdf["content"].map(one)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "decoded": res.map(lambda t: t[0]),
                    "src_width": res.map(lambda t: t[1]).astype("Int32"),
                    "src_height": res.map(lambda t: t[2]).astype("Int32"),
                    "width": res.map(lambda t: out_w if t[0] else None).astype("Int32"),
                    "height": res.map(lambda t: out_h if t[0] else None).astype("Int32"),
                    "content": res.map(lambda t: t[3]),
                }
            )

    return media.select("media_id", "content").mapInPandas(run, RESIZED_SCHEMA)


def center_crop(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Central out_h x out_w crop; refuses if the source is smaller
    (compose with resize_image for the resize-then-crop recipe).
    Offsets floor the excess halves — the torchvision/Pillow
    convention, so crops match common training pipelines."""
    if out_w < 1 or out_h < 1:
        raise ValueError("crop target must be >= 1x1")
    h, w = px.shape[:2]
    if out_h > h or out_w > w:
        raise ValueError("crop larger than source; resize first")
    top, left = (h - out_h) // 2, (w - out_w) // 2
    return px[top : top + out_h, left : left + out_w].copy()


def patchify(px: np.ndarray, patch: int) -> np.ndarray:
    """Non-overlapping patch grid (the ViT tokenization): (h, w, c) ->
    (n_patches, patch, patch, c) in row-major patch order.  Requires
    h and w divisible by ``patch`` (the standard pipeline resizes or
    center-crops first; silent edge-dropping would corrupt position
    embeddings downstream)."""
    if patch < 1:
        raise ValueError("patch must be >= 1")
    h, w = px.shape[:2]
    if h % patch or w % patch:
        raise ValueError("dims must be divisible by patch; resize/crop first")
    c = px.shape[2] if px.ndim == 3 else 1
    a = px.reshape(h // patch, patch, w // patch, patch, c)
    return a.transpose(0, 2, 1, 3, 4).reshape(-1, patch, patch, c)
