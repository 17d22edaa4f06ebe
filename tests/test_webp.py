"""VP8L (lossless WebP) and ALPH (alpha chunk) codec pins — roundtrips
across every transform, crafted bitstreams for paths the fixture
encoder doesn't emit (color cache, 2D/raw backward references, all four
alpha filters), the generated distance map against the spec's listed
table, hostile-input bounds, mutation fuzz, AND externally-encoded
streams: libwebp's lossless encoder (via the ctypes oracle) produces
VP8L with meta prefix codes / color cache / transform combinations, and
its RGBA encoder produces lossy VP8 + ALPH — every decode is pinned
byte-equal to libwebp's own output.  (Lossy VP8 itself is covered by
vp8.py / test_vp8.py.)"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from streamsum_spark.operators import webp


def _rng(seed=7):
    return np.random.default_rng(seed)


@pytest.mark.parametrize("hw", [(1, 1), (1, 7), (5, 1), (8, 8), (13, 21)])
@pytest.mark.parametrize("transform", [None, "subtract_green", "predictor"])
def test_roundtrip_sizes_and_transforms(hw, transform):
    h, w = hw
    px = _rng(h * 100 + w).integers(0, 256, (h, w, 3), dtype=np.uint8)
    blob = webp.encode_webp_lossless(px, transform=transform)
    assert np.array_equal(webp.decode_webp(blob), px)


@pytest.mark.parametrize("mode", list(range(14)))
def test_roundtrip_all_predictor_modes(mode):
    """Each of the 14 predictor modes through encode-side residuals and
    decode-side reconstruction (same edge rules on both sides, so any
    asymmetry in Select / ClampAddSubtract breaks equality)."""
    px = _rng(mode).integers(0, 256, (9, 11, 3), dtype=np.uint8)
    blob = webp.encode_webp_lossless(px, transform="predictor", predictor_mode=mode)
    assert np.array_equal(webp.decode_webp(blob), px)


@pytest.mark.parametrize("ncol", [2, 13, 120])
def test_roundtrip_palette_incl_packed_indices(ncol):
    """Color-indexing transform: <= 2 colors packs 8 indices per green
    byte, <= 16 packs 2, > 16 is unpacked — all three widths, with the
    delta-coded palette."""
    r = _rng(ncol)
    pal = np.unique(r.integers(0, 256, (ncol, 3), dtype=np.uint8), axis=0)
    px = pal[r.integers(0, len(pal), (10, 17))]
    blob = webp.encode_webp_lossless(px, transform="palette")
    assert np.array_equal(webp.decode_webp(blob), px)


def test_distance_map_matches_spec_table():
    """The generated 120-entry map must reproduce the spec's listed
    (dx, dy) table — pinned on the listed prefix plus structural
    invariants (exactly 120 unique in-range offsets, distances
    non-decreasing)."""
    m = webp._DIST_MAP
    assert m[:24] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    ]
    assert m[34] == (0, 5) and m[35] == (3, 4) and m[39] == (5, 0)
    assert m[96] == (8, 0) and m[119] == (8, 7)
    assert len(set(m)) == 120
    d = [dx * dx + dy * dy for dx, dy in m]
    assert d == sorted(d)
    assert all(-7 <= dx <= 8 and 0 <= dy <= 7 for dx, dy in m)


# ---- crafted bitstreams ---------------------------------------------

def _write_lengths(bw, lengths, alphabet):
    """General code-length encoding used by the crafted streams: a flat
    3-bit code-length code over {0,1,2,3,4,5,17,18} (complete: 8 x 2^-3),
    zero runs via 17/18."""
    assert len(lengths) == alphabet
    bw.write(0, 1)  # not simple
    bw.write(8 - 4, 4)  # order prefix [17,18,0,1,2,3,4,5]
    for _ in range(8):
        bw.write(3, 3)
    bw.write(0, 1)  # no max_symbol
    codes = {s: i for i, s in enumerate([0, 1, 2, 3, 4, 5, 17, 18])}
    i = 0
    while i < alphabet:
        if lengths[i] == 0:
            run = 0
            while i + run < alphabet and lengths[i + run] == 0:
                run += 1
            while run >= 11:
                take = min(138, run)
                bw.write_code(codes[18], 3)
                bw.write(take - 11, 7)
                run -= take
                i += take
            while run >= 3:
                take = min(10, run)
                bw.write_code(codes[17], 3)
                bw.write(take - 3, 3)
                run -= take
                i += take
            for _ in range(run):
                bw.write_code(codes[0], 3)
                i += 1
        else:
            assert lengths[i] <= 5
            bw.write_code(codes[lengths[i]], 3)
            i += 1


def _container(payload: bytes) -> bytes:
    out = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(payload) + (len(payload) & 1))
        + b"WEBP" + b"VP8L" + struct.pack("<I", len(payload)) + payload
    )
    return out + (b"\x00" if len(payload) & 1 else b"")


def _header(bw, w, h):
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)  # no transforms


def _canon(lengths):
    """(length, canonical code) per symbol, DEFLATE numbering — the
    crafted streams must emit exactly what the decoder's table expects."""
    nz = sorted((l, s) for s, l in enumerate(lengths) if l)
    out = {}
    code = 0
    prev = 0
    for l, s in nz:
        code <<= l - prev
        out[s] = (l, code)
        code += 1
        prev = l
    return out


def test_crafted_backward_references_2d_and_literal():
    """A 2x4 image coded as A B <len-2 backref dist (2,0)> on row 0 and
    one <len-4 backref dist (0,1)> for row 1: pins the LZ77 length and
    distance prefix decoding and BOTH 2D map entries used."""
    from streamsum_spark.operators.webp import _BitWriter

    A, B = (10, 77, 200), (99, 1, 3)
    bw = _BitWriter()
    _header(bw, 4, 2)
    bw.write(0, 1)  # no color cache (cache info precedes meta-prefix)
    bw.write(0, 1)  # no meta codes
    # green: literals gA gB + length codes 257 (len 2) and 259 (len 4)
    g_len = [0] * 280
    for s in (A[1], B[1], 257, 259):
        g_len[s] = 2
    g = _canon(g_len)
    _write_lengths(bw, g_len, 280)
    # red / blue: two 1-bit symbols each
    r_len = [0] * 256
    r_len[A[0]] = r_len[B[0]] = 1
    r = _canon(r_len)
    _write_lengths(bw, r_len, 256)
    b_len = [0] * 256
    b_len[A[2]] = b_len[B[2]] = 1
    bl = _canon(b_len)
    _write_lengths(bw, b_len, 256)
    # alpha: single symbol 255 (simple form)
    bw.write(1, 1)
    bw.write(0, 1)
    bw.write(1, 1)
    bw.write(255, 8)
    # distance: symbols 0 (-> dist_code 1 = (0,1)) and 4 (+1 extra bit
    # -> dist_code 6 = (2,0))
    d_len = [0] * 40
    d_len[0] = d_len[4] = 1
    d = _canon(d_len)
    _write_lengths(bw, d_len, 40)

    def lit(px):
        bw.write_code(g[px[1]][1], g[px[1]][0])
        bw.write_code(r[px[0]][1], r[px[0]][0])
        bw.write_code(bl[px[2]][1], bl[px[2]][0])

    lit(A)
    lit(B)
    bw.write_code(g[257][1], g[257][0])  # length 2
    bw.write_code(d[4][1], d[4][0])
    bw.write(1, 1)  # extra bit -> lz77 value 6 -> (2, 0) -> dist 2
    bw.write_code(g[259][1], g[259][0])  # length 4
    bw.write_code(d[0][1], d[0][0])  # lz77 value 1 -> (0, 1) -> dist w=4
    out = webp.decode_webp(_container(bw.bytes()))
    want = np.array([[A, B, A, B], [A, B, A, B]], dtype=np.uint8)
    assert np.array_equal(out, want)


def test_crafted_color_cache_hit():
    """1x3 image: literal A, literal B, cache hit for A — pins the
    0x1e35a7bd multiplicative hash and the green-alphabet extension."""
    from streamsum_spark.operators.webp import _BitWriter

    A, B = (10, 77, 200), (99, 1, 3)
    argb_A = (255 << 24) | (A[0] << 16) | (A[1] << 8) | A[2]
    cache_bits = 3
    idx_A = (0x1E35A7BD * argb_A & 0xFFFFFFFF) >> (32 - cache_bits)
    bw = _BitWriter()
    _header(bw, 3, 1)
    bw.write(1, 1)  # color cache (cache info precedes meta-prefix)
    bw.write(cache_bits, 4)
    bw.write(0, 1)  # no meta codes
    alpha_size = 280 + (1 << cache_bits)
    g_len = [0] * alpha_size
    g_len[A[1]] = g_len[B[1]] = g_len[280 + idx_A] = 2
    # a 3-symbol code needs a filler to be complete: 2+2+2+2 bits
    filler = next(s for s in range(256) if s not in (A[1], B[1]))
    g_len[filler] = 2
    g = _canon(g_len)
    _write_lengths(bw, g_len, alpha_size)
    r_len = [0] * 256
    r_len[A[0]] = r_len[B[0]] = 1
    r = _canon(r_len)
    _write_lengths(bw, r_len, 256)
    b_len = [0] * 256
    b_len[A[2]] = b_len[B[2]] = 1
    bl = _canon(b_len)
    _write_lengths(bw, b_len, 256)
    bw.write(1, 1)  # alpha: simple single 255
    bw.write(0, 1)
    bw.write(1, 1)
    bw.write(255, 8)
    bw.write(1, 1)  # distance: simple single 0 (unused)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    for px in (A, B):
        bw.write_code(g[px[1]][1], g[px[1]][0])
        bw.write_code(r[px[0]][1], r[px[0]][0])
        bw.write_code(bl[px[2]][1], bl[px[2]][0])
    bw.write_code(g[280 + idx_A][1], g[280 + idx_A][0])  # cache hit -> A
    out = webp.decode_webp(_container(bw.bytes()))
    assert np.array_equal(out, np.array([[A, B, A]], dtype=np.uint8))


# ---- hostile inputs --------------------------------------------------

def test_garbage_lossy_vp8_chunk_raises_valueerror():
    """A 'VP8 ' chunk now dispatches to the RFC 6386 decoder (vp8.py);
    an all-zero payload fails its start-code check as ValueError."""
    payload = b"\x00" * 20
    blob = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(payload)) + b"WEBP"
        + b"VP8 " + struct.pack("<I", len(payload)) + payload
    )
    with pytest.raises(ValueError, match="start code"):
        webp.decode_webp(blob)


def test_huge_declared_dimensions_refuse_before_allocation():
    from streamsum_spark.operators.webp import _BitWriter

    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write((1 << 14) - 1, 14)  # 16384 x 16384 x 4 > cap
    bw.write((1 << 14) - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    with pytest.raises(ValueError, match="bounds"):
        webp.decode_webp(_container(bw.bytes()))


def test_mutation_fuzz_never_escapes_valueerror():
    """Single-byte corruptions either decode to a bounded image or raise
    ValueError/NotImplementedError — extract_features' fallback
    contract, same as the other codecs."""
    px = _rng(3).integers(0, 256, (9, 13, 3), dtype=np.uint8)
    blobs = [
        webp.encode_webp_lossless(px),
        webp.encode_webp_lossless(px, transform="predictor", predictor_mode=11),
    ]
    rs = np.random.RandomState(11)
    for blob in blobs:
        base = bytearray(blob)
        for _ in range(400):
            mut = bytearray(base)
            i = int(rs.randint(12, len(mut)))
            mut[i] ^= 1 << int(rs.randint(8))
            try:
                out = webp.decode_webp(bytes(mut))
                assert out.dtype == np.uint8 and out.ndim == 3
                assert out.size <= webp._MAX_DECODED_BYTES
            except (ValueError, NotImplementedError):
                pass


def test_webp_through_extract_features(spark):
    """VP8L blobs decode on the default Arrow pipeline with real pixel
    stats; a truncated blob falls back without failing the batch."""
    from streamsum_spark.operators import multimodal as mm

    px0 = _rng(1).integers(0, 256, (12, 16, 3), dtype=np.uint8)
    px1 = _rng(2).integers(0, 256, (7, 9, 3), dtype=np.uint8)
    good0 = webp.encode_webp_lossless(px0, transform="predictor")
    good1 = webp.encode_webp_lossless(px1, transform="subtract_green")
    rows = [
        (0, "image/webp", 16, 12, None, good0),
        (1, "image/webp", 9, 7, None, good1),
        (2, "image/webp", 9, 7, None, good1[: len(good1) // 2]),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    feats = {r.media_id: r for r in mm.extract_features(media).collect()}
    assert feats[0].decoded and feats[1].decoded and not feats[2].decoded
    assert feats[0].feature[0] == pytest.approx(px0[:, :, 0].mean() / 255.0, abs=1e-6)
    assert feats[1].feature[0] == pytest.approx(px1[:, :, 0].mean() / 255.0, abs=1e-6)


# ---- external cross-implementation pins (libwebp encoder) ------------
# libwebp's lossless encoder emits stream features our fixture encoder
# never does (meta prefix codes, color cache, transform combinations,
# degenerate single-symbol code-length codes) — this section is what
# caught the color-cache-info/meta-prefix field-order swap that
# encoder/decoder-symmetric roundtrips can never see.

from libwebp_oracle import HAVE_LIBWEBP  # noqa: E402

_needs_libwebp = pytest.mark.skipif(
    not HAVE_LIBWEBP, reason="system libwebp not available")


def _grad(h, w):
    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    return np.dstack(
        [(gx * 2 + gy) % 256, (gx + 2 * gy) % 256, (gx * 3) % 256]
    ).astype(np.uint8)


@_needs_libwebp
@pytest.mark.parametrize("name", ["gradient", "palette", "noise",
                                  "photo", "repeats"])
def test_external_vp8l_streams_decode_exact(name):
    import libwebp_oracle as lo

    rng = _rng(17)
    px = {
        "gradient": _grad(80, 96),
        "palette": np.take(
            np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255],
                      [10, 10, 10], [200, 200, 0]], np.uint8),
            rng.integers(0, 5, (80, 96)), axis=0),
        "noise": rng.integers(0, 256, (80, 96, 3), dtype=np.uint8),
        "photo": (_grad(80, 96) // 2
                  + rng.integers(0, 128, (80, 96, 3), dtype=np.uint8) // 2),
        "repeats": np.tile(
            rng.integers(0, 256, (8, 12, 3), dtype=np.uint8), (10, 8, 1)),
    }[name]
    blob = lo.encode_lossless_rgb(px)
    assert np.array_equal(webp.decode_webp(blob), px)  # lossless == input


@_needs_libwebp
@pytest.mark.parametrize("q", [40, 85])
def test_lossy_alpha_rgba_byte_exact(q):
    """Lossy VP8 + ALPH chunks (compressed and raw alpha, horizontal
    filter) decode byte-equal to WebPDecodeRGBA."""
    import libwebp_oracle as lo

    rng = _rng(23)
    gx, gy = np.meshgrid(np.arange(96), np.arange(80))
    base = _grad(80, 96)
    for alpha in (
        np.clip(np.tile(np.arange(96) * 3, (80, 1)), 0, 255),  # filt 1
        np.clip(gx + gy, 0, 255),
        rng.integers(0, 256, (80, 96)),                        # raw plane
        np.full((80, 96), 128),
    ):
        px = np.dstack([base, alpha.astype(np.uint8)])
        blob = lo.encode_rgba(px, q)
        assert np.array_equal(webp.decode_webp_rgba(blob),
                              lo.decode_rgba(blob))


@_needs_libwebp
def test_lossless_rgba_alpha_from_argb_stream(tmp_path):
    """VP8L carries alpha natively in the ARGB stream — RGBA output
    must match both libwebp and the original pixels."""
    import libwebp_oracle as lo

    rng = _rng(29)
    px = rng.integers(0, 256, (33, 49, 4), dtype=np.uint8)
    blob = lo.encode_lossless_rgba(px)
    out = webp.decode_webp_rgba(blob)
    assert np.array_equal(out, lo.decode_rgba(blob))
    # the encoder defaults to exact=0 (RGB under low-alpha pixels may
    # be rewritten), so input equality only holds on the alpha channel
    assert np.array_equal(out[:, :, 3], px[:, :, 3])


def _vp8x_container(alph_body: bytes, vp8_payload: bytes) -> bytes:
    def chunk(tag, body):
        pad = b"\x00" if len(body) & 1 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    inner = (chunk(b"VP8X", b"\x10\x00\x00\x00\x0f\x00\x00\x0f\x00\x00")
             + chunk(b"ALPH", alph_body) + chunk(b"VP8 ", vp8_payload))
    return b"RIFF" + struct.pack("<I", 4 + len(inner)) + b"WEBP" + inner


@pytest.mark.parametrize("filt", [0, 1, 2, 3])
def test_alpha_filter_methods_raw_plane(filt):
    """Crafted raw (compression=0) ALPH bodies forward-filtered in the
    test pin all four unfilter methods, incl. gradient's clamp —
    libwebp's encoder rarely emits methods 2 and 3."""
    from test_vp8 import _EXTERNAL_WEBP, _payload

    rng = _rng(100 + filt)
    alpha = rng.integers(0, 256, (16, 16)).astype(np.int32)
    h, w = alpha.shape
    res = np.zeros_like(alpha)
    for r in range(h):
        for c in range(w):
            if filt == 0:
                pred = 0
            elif filt == 1:  # horizontal
                pred = alpha[r, c - 1] if c else (alpha[r - 1, 0] if r else 0)
            elif filt == 2:  # vertical
                pred = alpha[r - 1, c] if r else (alpha[0, c - 1] if c else 0)
            else:  # gradient
                if r == 0:
                    pred = alpha[0, c - 1] if c else 0
                elif c == 0:
                    pred = alpha[r - 1, 0]
                else:
                    pred = int(np.clip(
                        alpha[r, c - 1] + alpha[r - 1, c]
                        - alpha[r - 1, c - 1], 0, 255))
            res[r, c] = (alpha[r, c] - pred) & 0xFF
    body = bytes([filt << 2]) + res.astype(np.uint8).tobytes()
    blob = _vp8x_container(body, _payload(_EXTERNAL_WEBP))
    out = webp.decode_webp_rgba(blob)
    assert np.array_equal(out[:, :, 3], alpha.astype(np.uint8))


def test_alpha_absent_is_opaque():
    from test_vp8 import _EXTERNAL_WEBP, _payload

    def chunk(tag, body):
        pad = b"\x00" if len(body) & 1 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    payload = _payload(_EXTERNAL_WEBP)
    inner = chunk(b"VP8 ", payload)
    blob = b"RIFF" + struct.pack("<I", 4 + len(inner)) + b"WEBP" + inner
    out = webp.decode_webp_rgba(blob)
    assert (out[:, :, 3] == 255).all()
    assert np.array_equal(out[:, :, :3], webp.decode_webp(blob))


def test_hostile_alph_bodies_refuse():
    from test_vp8 import _EXTERNAL_WEBP, _payload

    payload = _payload(_EXTERNAL_WEBP)
    with pytest.raises(ValueError, match="empty ALPH"):
        webp.decode_webp_rgba(_vp8x_container(b"", payload))
    with pytest.raises(ValueError, match="truncated ALPH"):
        webp.decode_webp_rgba(_vp8x_container(b"\x00" + b"\x01" * 10, payload))
    with pytest.raises(ValueError, match="compression"):
        webp.decode_webp_rgba(_vp8x_container(b"\x03" + b"\x00" * 256, payload))


def test_animated_webp_decodes_first_frame():
    """ANIM/ANMF container: the first frame's pixels come back (same
    still-image contract as GIF's first frame), for both VP8L and
    lossy-VP8 frame payloads — incl. an in-frame ALPH subchunk."""
    from streamsum_spark.operators.vp8_encode import encode_vp8

    def chunk(tag, body):
        pad = b"\x00" if len(body) & 1 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    def anmf(frame_chunks, w, h):
        head = (struct.pack("<I", 0)[:3] * 2          # x, y
                + struct.pack("<I", w - 1)[:3] + struct.pack("<I", h - 1)[:3]
                + struct.pack("<I", 40)[:3] + b"\x00")  # duration, flags
        return chunk(b"ANMF", head + frame_chunks)

    def vp8l_chunk(px):
        blob = webp.encode_webp_lossless(px)
        (n,) = struct.unpack("<I", blob[16:20])
        return chunk(b"VP8L", blob[20:20 + n])

    px1 = _rng(61).integers(0, 256, (12, 16, 3), dtype=np.uint8)
    px2 = _rng(62).integers(0, 256, (12, 16, 3), dtype=np.uint8)
    f1 = vp8l_chunk(px1)
    f2 = vp8l_chunk(px2)
    inner = (chunk(b"VP8X", b"\x02\x00\x00\x00\x0f\x00\x00\x0b\x00\x00")
             + chunk(b"ANIM", b"\x00\x00\x00\x00\x00\x00")
             + anmf(f1, 16, 12) + anmf(f2, 16, 12))
    blob = b"RIFF" + struct.pack("<I", 4 + len(inner)) + b"WEBP" + inner
    assert np.array_equal(webp.decode_webp(blob), px1)

    # lossy frame with its own ALPH subchunk
    payload = encode_vp8(np.ascontiguousarray(px1), 85)
    alpha = np.arange(12 * 16, dtype=np.uint8).reshape(12, 16)
    alph = chunk(b"ALPH", b"\x00" + alpha.tobytes())
    inner = (chunk(b"VP8X", b"\x12\x00\x00\x00\x0f\x00\x00\x0b\x00\x00")
             + chunk(b"ANIM", b"\x00\x00\x00\x00\x00\x00")
             + anmf(alph + chunk(b"VP8 ", payload), 16, 12))
    blob = b"RIFF" + struct.pack("<I", 4 + len(inner)) + b"WEBP" + inner
    out = webp.decode_webp_rgba(blob)
    assert out.shape == (12, 16, 4)
    assert np.array_equal(out[:, :, 3], alpha)
