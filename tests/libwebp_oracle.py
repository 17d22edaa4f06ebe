"""Test-only ctypes harness over the system libwebp (when present).

Used ONLY by tests as an independent golden oracle for the from-scratch
VP8/VP8L decoders in streamsum_spark.operators — the engine itself never
imports this module or any codec library.  VP8 decoding is bit-exact by
construction (RFC 6386 is a normative description of the reference
decoder), so tests may demand byte equality between our decoder and
libwebp's output.

Gated: `HAVE_LIBWEBP` is False when the shared library is missing, and
every test that uses this module must skip in that case (an embedded hex
fixture keeps at least one external pin alive without the library).
"""
from __future__ import annotations

import ctypes

import numpy as np

HAVE_LIBWEBP = False
_lw = None
for _name in ("libwebp.so.7", "libwebp.so"):
    try:
        _lw = ctypes.CDLL(_name)
        HAVE_LIBWEBP = True
        break
    except OSError:
        continue

if HAVE_LIBWEBP:
    _lw.WebPDecodeRGB.restype = ctypes.POINTER(ctypes.c_ubyte)
    _lw.WebPDecodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    _lw.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
    _lw.WebPDecodeRGBA.argtypes = _lw.WebPDecodeRGB.argtypes
    _lw.WebPEncodeRGB.restype = ctypes.c_size_t
    _lw.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ]
    _lw.WebPFree.restype = None
    _lw.WebPFree.argtypes = [ctypes.c_void_p]


if HAVE_LIBWEBP:
    _lw.WebPEncodeRGBA.restype = ctypes.c_size_t
    _lw.WebPEncodeRGBA.argtypes = _lw.WebPEncodeRGB.argtypes
    for _fn in (_lw.WebPEncodeLosslessRGB, _lw.WebPEncodeLosslessRGBA):
        _fn.restype = ctypes.c_size_t
        _fn.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
        ]


def decode_rgba(blob: bytes) -> np.ndarray:
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = _lw.WebPDecodeRGBA(blob, len(blob), ctypes.byref(w), ctypes.byref(h))
    if not p:
        raise ValueError("libwebp decode failed")
    arr = np.ctypeslib.as_array(p, shape=(h.value, w.value, 4)).copy()
    _lw.WebPFree(p)
    return arr


def _encode(fn, px: np.ndarray, *extra) -> bytes:
    h, w, ch = px.shape
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = fn(np.ascontiguousarray(px, dtype=np.uint8).tobytes(),
           w, h, w * ch, *extra, ctypes.byref(out))
    if n == 0:
        raise ValueError("libwebp encode failed")
    blob = bytes(np.ctypeslib.as_array(out, shape=(n,)))
    _lw.WebPFree(ctypes.cast(out, ctypes.c_void_p))
    return blob


def encode_rgba(px: np.ndarray, quality: float = 75.0) -> bytes:
    """Lossy VP8 + (usually) an ALPH chunk."""
    return _encode(_lw.WebPEncodeRGBA, px, ctypes.c_float(quality))


def encode_lossless_rgb(px: np.ndarray) -> bytes:
    """Externally-encoded VP8L — exercises meta prefix codes, color
    cache, and transform combinations our fixture encoder never emits."""
    return _encode(_lw.WebPEncodeLosslessRGB, px)


def encode_lossless_rgba(px: np.ndarray) -> bytes:
    return _encode(_lw.WebPEncodeLosslessRGBA, px)


def decode_rgb(blob: bytes) -> np.ndarray:
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = _lw.WebPDecodeRGB(blob, len(blob), ctypes.byref(w), ctypes.byref(h))
    if not p:
        raise ValueError("libwebp decode failed")
    arr = np.ctypeslib.as_array(p, shape=(h.value, w.value, 3)).copy()
    _lw.WebPFree(p)
    return arr


def encode_rgb(px: np.ndarray, quality: float = 75.0) -> bytes:
    h, w, _ = px.shape
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = _lw.WebPEncodeRGB(
        np.ascontiguousarray(px, dtype=np.uint8).tobytes(),
        w, h, w * 3, quality, ctypes.byref(out))
    if n == 0:
        raise ValueError("libwebp encode failed")
    blob = bytes(np.ctypeslib.as_array(out, shape=(n,)))
    _lw.WebPFree(ctypes.cast(out, ctypes.c_void_p))
    return blob


# ---- advanced decoder API (for bypass_filtering / raw-YUV goldens) ----

class _WebPBitstreamFeatures(ctypes.Structure):
    _fields_ = [
        ("width", ctypes.c_int), ("height", ctypes.c_int),
        ("has_alpha", ctypes.c_int), ("has_animation", ctypes.c_int),
        ("format", ctypes.c_int), ("pad", ctypes.c_uint32 * 5),
    ]


class _WebPDecoderOptions(ctypes.Structure):
    _fields_ = [
        ("bypass_filtering", ctypes.c_int),
        ("no_fancy_upsampling", ctypes.c_int),
        ("use_cropping", ctypes.c_int),
        ("crop_left", ctypes.c_int), ("crop_top", ctypes.c_int),
        ("crop_width", ctypes.c_int), ("crop_height", ctypes.c_int),
        ("use_scaling", ctypes.c_int),
        ("scaled_width", ctypes.c_int), ("scaled_height", ctypes.c_int),
        ("use_threads", ctypes.c_int),
        ("dithering_strength", ctypes.c_int),
        ("flip", ctypes.c_int),
        ("alpha_dithering_strength", ctypes.c_int),
        ("pad", ctypes.c_uint32 * 5),
    ]


class _WebPRGBABuffer(ctypes.Structure):
    _fields_ = [("rgba", ctypes.POINTER(ctypes.c_ubyte)),
                ("stride", ctypes.c_int), ("size", ctypes.c_size_t)]


class _WebPYUVABuffer(ctypes.Structure):
    _fields_ = [
        ("y", ctypes.POINTER(ctypes.c_ubyte)),
        ("u", ctypes.POINTER(ctypes.c_ubyte)),
        ("v", ctypes.POINTER(ctypes.c_ubyte)),
        ("a", ctypes.POINTER(ctypes.c_ubyte)),
        ("y_stride", ctypes.c_int), ("u_stride", ctypes.c_int),
        ("v_stride", ctypes.c_int), ("a_stride", ctypes.c_int),
        ("y_size", ctypes.c_size_t), ("u_size", ctypes.c_size_t),
        ("v_size", ctypes.c_size_t), ("a_size", ctypes.c_size_t),
    ]


class _BufferUnion(ctypes.Union):
    _fields_ = [("RGBA", _WebPRGBABuffer), ("YUVA", _WebPYUVABuffer)]


class _WebPDecBuffer(ctypes.Structure):
    _fields_ = [
        ("colorspace", ctypes.c_int),
        ("width", ctypes.c_int), ("height", ctypes.c_int),
        ("is_external_memory", ctypes.c_int),
        ("u", _BufferUnion),
        ("pad", ctypes.c_uint32 * 4),
        ("private_memory", ctypes.POINTER(ctypes.c_ubyte)),
    ]


class _WebPDecoderConfig(ctypes.Structure):
    _fields_ = [
        ("input", _WebPBitstreamFeatures),
        ("output", _WebPDecBuffer),
        ("options", _WebPDecoderOptions),
    ]


_MODE_YUV = 11


def _init_config() -> "_WebPDecoderConfig":
    cfg = _WebPDecoderConfig()
    for abi in (0x0209, 0x0208, 0x020A, 0x0210, 0x0207):
        if _lw.WebPInitDecoderConfigInternal(ctypes.byref(cfg), abi):
            return cfg
    raise RuntimeError("no compatible WEBP_DECODER_ABI_VERSION")


def decode_yuv(blob: bytes, bypass_filtering: bool = False):
    """Decode to raw (Y, U, V) uint8 planes; optionally skip the in-loop
    filter — the golden for incremental decoder bring-up."""
    cfg = _init_config()
    cfg.options.bypass_filtering = 1 if bypass_filtering else 0
    cfg.output.colorspace = _MODE_YUV
    rc = _lw.WebPDecode(blob, len(blob), ctypes.byref(cfg))
    if rc != 0:
        raise ValueError(f"libwebp WebPDecode failed: {rc}")
    w, h = cfg.output.width, cfg.output.height
    yb = cfg.output.u.YUVA
    cw, ch = (w + 1) // 2, (h + 1) // 2

    def plane(ptr, stride, pw, ph):
        flat = np.ctypeslib.as_array(ptr, shape=(ph * stride,))
        return flat.reshape(ph, stride)[:, :pw].copy()

    y = plane(yb.y, yb.y_stride, w, h)
    u = plane(yb.u, yb.u_stride, cw, ch)
    v = plane(yb.v, yb.v_stride, cw, ch)
    _lw.WebPFreeDecBuffer(ctypes.byref(cfg.output))
    return y, u, v
