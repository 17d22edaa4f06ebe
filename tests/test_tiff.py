"""TIFF 6.0 decoder pins — an EXTERNALLY-encoded golden (the CPython
test-suite's imghdrdata asset, uncompressed RGBA LE, pinned byte-exact
against its sibling PPM through this repo's independent PNM decoder),
roundtrips across every compression x predictor x byte order x
photometric, crafted LZW bitstreams for MSB-first packing / KwKwK /
the early code-width change, all eight orientations against
numpy-derived transforms, hostile-input bounds, honest refusals, and
mutation fuzz.  LZW is additionally pinned BOTH directions against real
libtiff: vendored libtiff-encoded goldens (width bumps + the 4094
table-full Clear) decode byte-exact here, and live libtiff decodes the
in-repo encoder's output byte-exact."""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np
import pytest

from streamsum_spark.operators import tiff


def _rng(seed=7):
    return np.random.default_rng(seed)


# predictor=2 only where TIFF 6.0 defines it (LZW, extended to Deflate);
# encode_tiff refuses the out-of-spec none/packbits combination that
# libtiff and the JDK ignore on read (round-10 ecosystem-parity fix)
COMP_PRED = [
    (c, p)
    for c in ("none", "lzw", "packbits", "deflate")
    for p in ((1, 2) if c in ("lzw", "deflate") else (1,))
]


def _data(name: str) -> bytes:
    with open(os.path.join(os.path.dirname(__file__), "data", name), "rb") as fh:
        return fh.read()


# ---- externally-encoded golden ---------------------------------------


def test_external_tiff_matches_ppm_golden_byte_exact():
    """ext_uncompressed_rgba.tiff and ext_golden.ppm are the SAME image
    from the CPython test suite, produced by an independent encoder; the
    TIFF's RGB must equal the PPM (decoded by this repo's PNM decoder,
    a disjoint code path) byte-for-byte — TIFF strips are lossless."""
    from streamsum_spark.operators.multimodal import decode_image

    ours = tiff.decode_tiff(_data("ext_uncompressed_rgba.tiff"))
    golden = decode_image(_data("ext_golden.ppm"))
    assert ours.shape == (16, 16, 3)
    assert np.array_equal(ours, golden)


def _xorshift_stream(n: int, low_entropy: bool) -> bytes:
    """Same fixed xorshift32 stream tools/gen_libtiff_lzw_golden.py
    encoded — the tests re-derive the expected pixels instead of
    trusting a second vendored artifact."""
    x = 0x9E3779B9
    out = bytearray()
    for _ in range(n):
        x ^= (x << 13) & 0xFFFFFFFF
        x ^= x >> 17
        x ^= (x << 5) & 0xFFFFFFFF
        out.append((x & 0xF) * 17 if low_entropy else x & 0xFF)
    return bytes(out)


def _xorshift_gray(low_entropy: bool, n: int = 128 * 160) -> np.ndarray:
    return np.frombuffer(_xorshift_stream(n, low_entropy),
                         np.uint8).reshape(160, 128)


@pytest.mark.parametrize("name,low", [("noise", False), ("lowent", True)])
def test_external_libtiff_lzw_golden_byte_exact(name, low):
    """Vendored REAL libtiff-encoded LZW strips (tools/
    gen_libtiff_lzw_golden.py) pin early-change and table-full interop
    against the reference implementation: both streams run the string
    table through every width bump (9->10->11->12) to libtiff's forced
    Clear at CODE_MAX-1 = 4094 entries (arriving when the decoder's
    table holds 4093), multiple times.  This golden caught a real bug
    on first contact: the in-repo early-change point was one entry
    early vs libtiff (widened at (1<<w)-2, not (1<<w)-1), desyncing on
    every real-world LZW TIFF past 253 table entries while the
    symmetric in-repo encoder/decoder roundtrips stayed green."""
    img = tiff.decode_tiff(_data(f"ext_lzw_libtiff_{name}.tif"))
    exp = _xorshift_gray(low)
    assert img.shape == (160, 128, 3)
    assert all(np.array_equal(img[:, :, c], exp) for c in range(3))


def test_libtiff_decodes_inrepo_lzw(tmp_path):
    """Reverse-direction interop: REAL libtiff must decode this repo's
    LZW output byte-exact, over a stream long enough to cross every
    width bump and the in-repo encoder's 4094-entry Clear.  (The
    forward direction — this repo decoding libtiff output — is the
    vendored-golden test above; together they pin the convention from
    both sides.)"""
    import ctypes

    try:
        lib = ctypes.CDLL("libtiff.so.6")
    except OSError:
        pytest.skip("libtiff not available")
    img = _xorshift_gray(True)
    blob = tiff.encode_tiff(img, compression="lzw")
    p = tmp_path / "inrepo.tif"
    p.write_bytes(blob)
    lib.TIFFOpen.restype = ctypes.c_void_p
    lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    t = lib.TIFFOpen(str(p).encode(), b"r")
    assert t, "libtiff refused the in-repo container"
    buf = ctypes.create_string_buffer(img.size)
    lib.TIFFReadEncodedStrip.restype = ctypes.c_ssize_t
    n = lib.TIFFReadEncodedStrip(
        ctypes.c_void_p(t), 0, buf, ctypes.c_ssize_t(img.size)
    )
    lib.TIFFClose(ctypes.c_void_p(t))
    assert n == img.size
    assert buf.raw[:n] == img.tobytes()


# ---- roundtrips -------------------------------------------------------


@pytest.mark.parametrize("comp,pred", COMP_PRED)
@pytest.mark.parametrize("bo", ["<", ">"])
def test_roundtrip_rgb_rgba_gray_gray16(comp, pred, bo):
    rng = _rng(hash((comp, pred, bo)) % 2**31)
    for shape, dtype in [
        ((13, 17, 3), np.uint8),
        ((13, 17, 4), np.uint8),  # RGBA: ExtraSamples alpha dropped
        ((9, 5), np.uint8),
        ((9, 5), np.uint16),  # 16-bit gray, scaled >> 8
    ]:
        hi = 65536 if dtype == np.uint16 else 256
        img = rng.integers(0, hi, shape).astype(dtype)
        blob = tiff.encode_tiff(
            img, compression=comp, predictor=pred, byte_order=bo, rows_per_strip=4
        )
        out = tiff.decode_tiff(blob)
        if dtype == np.uint16:
            want = np.repeat((img >> 8).astype(np.uint8)[:, :, None], 3, axis=2)
        elif img.ndim == 2:
            want = np.repeat(img[:, :, None], 3, axis=2)
        else:
            want = img[:, :, :3]
        assert np.array_equal(out, want), (comp, pred, bo, shape, dtype)


@pytest.mark.parametrize("bps", [1, 2, 4])
def test_subbyte_gray_scales_to_full_range(bps):
    img = _rng(bps).integers(0, 1 << bps, (11, 23)).astype(np.uint8)
    out = tiff.decode_tiff(tiff.encode_tiff(img, bits_per_sample=bps))
    want = (img.astype(np.uint16) * 255 // ((1 << bps) - 1)).astype(np.uint8)
    assert np.array_equal(out, np.repeat(want[:, :, None], 3, axis=2))


def test_whiteiszero_inverts():
    img = _rng(3).integers(0, 256, (8, 8)).astype(np.uint8)
    out = tiff.decode_tiff(tiff.encode_tiff(img, photometric=0))
    assert np.array_equal(out, np.repeat((255 - img)[:, :, None], 3, axis=2))


@pytest.mark.parametrize("bps,ncol", [(4, 16), (8, 200)])
def test_palette_lookup(bps, ncol):
    rng = _rng(bps)
    pal = rng.integers(0, 256, (ncol, 3)).astype(np.uint8)
    idx = rng.integers(0, ncol, (10, 14)).astype(np.uint8)
    out = tiff.decode_tiff(tiff.encode_tiff(idx, colormap=pal, bits_per_sample=bps))
    assert np.array_equal(out, pal[idx])


def test_lzw_width_bumps_and_midstream_clear():
    """Compressible data large enough to push the code table past the
    9->10->11->12 bumps and force the 4094-entry mid-stream Clear."""
    rng = _rng(11)
    row = rng.integers(0, 256, (1, 400, 3)).astype(np.uint8)
    img = np.tile(row, (120, 1, 1))
    blob = tiff.encode_tiff(img, compression="lzw", predictor=2)
    assert np.array_equal(tiff.decode_tiff(blob), img)
    # incompressible data exercises the literal-heavy path
    img2 = rng.integers(0, 256, (80, 90, 3)).astype(np.uint8)
    assert np.array_equal(
        tiff.decode_tiff(tiff.encode_tiff(img2, compression="lzw")), img2
    )


@pytest.mark.parametrize("o", list(range(1, 9)))
def test_all_eight_orientations(o):
    img = _rng(o).integers(0, 256, (6, 4, 3)).astype(np.uint8)
    out = tiff.decode_tiff(tiff.encode_tiff(img, orientation=o))
    want = img
    if o in (5, 6, 7, 8):
        want = want.transpose(1, 0, 2)
    if o in (2, 3, 6, 7):
        want = want[:, ::-1]
    if o in (3, 4, 7, 8):
        want = want[::-1]
    assert np.array_equal(out, want)


# ---- crafted LZW bitstreams (decoder pinned asymmetrically) -----------


def _bits_to_bytes(codes: list[tuple[int, int]]) -> bytes:
    """Pack (code, width) pairs MSB-first, as TIFF spec §13 requires."""
    s = "".join(format(c, f"0{w}b") for c, w in codes)
    s += "0" * (-len(s) % 8)
    return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def _wrap_lzw_strip(payload: bytes, w: int, h: int) -> bytes:
    """Minimal LE TIFF around a raw LZW strip: gray8, one strip."""
    tags = [
        (256, 3, 1, w),
        (257, 3, 1, h),
        (258, 3, 1, 8),
        (259, 3, 1, 5),
        (262, 3, 1, 1),
        (273, 4, 1, 8),
        (277, 3, 1, 1),
        (278, 3, 1, h),
        (279, 4, 1, len(payload)),
    ]
    body = bytearray(b"II*\x00")
    ifd_off = 8 + len(payload) + (len(payload) % 2)
    body += struct.pack("<I", ifd_off)
    body += payload + b"\x00" * (len(payload) % 2)
    body += struct.pack("<H", len(tags))
    for t, ty, c, v in tags:
        body += struct.pack("<HHII", t, ty, c, v)[:8] + struct.pack("<I", v)
    body += b"\x00\x00\x00\x00"
    return bytes(body)


def test_crafted_lzw_basic_and_backreference():
    """Clear, 'A', 'B', code 258 (= 'AB'), EOI — hand-packed MSB-first.
    Pins bit order and table construction independently of the
    encoder."""
    payload = _bits_to_bytes([(256, 9), (65, 9), (66, 9), (258, 9), (257, 9)])
    out = tiff.decode_tiff(_wrap_lzw_strip(payload, 4, 1))
    assert out[:, :, 0].tobytes() == b"ABAB"


def test_crafted_lzw_kwkwk_case():
    """Clear, 'A', 258 — the code-equals-next-entry (KwKwK) case must
    emit prev + prev[0] = 'AA'."""
    payload = _bits_to_bytes([(256, 9), (65, 9), (258, 9), (257, 9)])
    out = tiff.decode_tiff(_wrap_lzw_strip(payload, 3, 1))
    assert out[:, :, 0].tobytes() == b"AAA"


def test_crafted_lzw_early_width_change():
    """254 literals after Clear grow the decoder table to 511 entries —
    the EARLY change point (libtiff convention, pinned byte-exact by the
    vendored ext_lzw_libtiff goldens): the 255th code must already be
    read at 10 bits.  A decoder that widens at 510 (early by two — the
    r8 bug this repo shipped) or at 512 (GIF-style, not early) desyncs
    here."""
    lits = [(i % 251) + 1 for i in range(254)]  # byte values, no adjacent repeats
    codes = [(256, 9)] + [(v, 9) for v in lits]
    # decoder table after k-th literal: 258 + (k-1); hits 511 after
    # literal 254 -> the next code is 10 bits wide
    codes += [(77, 10), (257, 10)]
    payload = _bits_to_bytes(codes)
    out = tiff.decode_tiff(_wrap_lzw_strip(payload, 255, 1))
    want = bytes(lits) + b"\x4d"
    assert out[:, :, 0].tobytes() == want


def test_crafted_lzw_code_out_of_range_refuses():
    payload = _bits_to_bytes([(256, 9), (65, 9), (300, 9), (257, 9)])
    with pytest.raises(ValueError, match="LZW"):
        tiff.decode_tiff(_wrap_lzw_strip(payload, 3, 1))


def test_crafted_lzw_nonliteral_after_clear_refuses():
    payload = _bits_to_bytes([(256, 9), (258, 9), (257, 9)])
    with pytest.raises(ValueError, match="LZW"):
        tiff.decode_tiff(_wrap_lzw_strip(payload, 3, 1))


def test_crafted_packbits_runs_and_literals():
    # 3 literals 'abc', run of 5 'z', no-op (128), 2 literals 'de'
    payload = bytes([2]) + b"abc" + bytes([252]) + b"z" + bytes([128, 1]) + b"de"
    blob = tiff.encode_tiff(np.zeros((1, 10), np.uint8), compression="packbits")
    # splice the crafted strip into the encoder's container
    assert tiff._packbits_decode(payload, 10) == b"abczzzzzde"
    assert len(tiff.decode_tiff(blob)) == 1


# ---- hostile inputs ---------------------------------------------------


def test_huge_dimensions_refuse_before_allocation():
    img = np.zeros((2, 2), np.uint8)
    blob = bytearray(tiff.encode_tiff(img))
    # ImageWidth/ImageLength live in the sorted IFD; patch via re-parse
    w_off = blob.find(struct.pack("<HHI", 256, 3, 1))
    h_off = blob.find(struct.pack("<HHI", 257, 3, 1))
    struct.pack_into("<I", blob, w_off + 8, 60000)
    struct.pack_into("<I", blob, h_off + 8, 60000)
    with pytest.raises(ValueError, match="implausible"):
        tiff.decode_tiff(bytes(blob))


def test_truncated_and_structurally_bad_blobs_refuse():
    blob = tiff.encode_tiff(_rng(1).integers(0, 256, (6, 6, 3)).astype(np.uint8))
    with pytest.raises(ValueError):
        tiff.decode_tiff(blob[:20])
    with pytest.raises(ValueError):
        tiff.decode_tiff(b"II*\x00" + struct.pack("<I", 2**31))
    with pytest.raises(ValueError):
        tiff.decode_tiff(b"not a tiff at all")


def test_strip_out_of_range_refuses():
    blob = bytearray(tiff.encode_tiff(np.zeros((4, 4), np.uint8)))
    off = blob.find(struct.pack("<HHI", 273, 4, 1))
    struct.pack_into("<I", blob, off + 8, len(blob) + 100)
    with pytest.raises(ValueError, match="strip out of range"):
        tiff.decode_tiff(bytes(blob))


def test_honest_refusals_for_unsupported_variants():
    base = tiff.encode_tiff(np.zeros((4, 4), np.uint8))

    def patched(tag_id, new_val, tag_type=3):
        b = bytearray(base)
        off = b.find(struct.pack("<HHI", tag_id, tag_type, 1))
        if off < 0:  # tag absent: append is complex — patch compression slot
            raise AssertionError(f"tag {tag_id} not in fixture")
        struct.pack_into("<I", b, off + 8, new_val)
        return bytes(b)

    for comp, msg in [(2, "CCITT"), (3, "CCITT"), (4, "CCITT"), (6, "JPEG"), (7, "JPEG")]:
        with pytest.raises(NotImplementedError, match=msg):
            tiff.decode_tiff(patched(259, comp))
    with pytest.raises(ValueError, match="unknown compression"):
        tiff.decode_tiff(patched(259, 999))
    # planar is SUPPORTED since round 9; for spp=1 it is equivalent to
    # chunky and must decode identically (refusals remain for
    # planar+tiled — test_planar_hostile_refuses)
    assert np.array_equal(tiff.decode_tiff(patched(284, 2)),
                          tiff.decode_tiff(base))
    with pytest.raises(NotImplementedError, match="photometric"):
        tiff.decode_tiff(patched(262, 6))


def test_mutation_fuzz_never_escapes_valueerror():
    rng = _rng(99)
    img = rng.integers(0, 256, (9, 11, 3)).astype(np.uint8)
    blobs = [
        tiff.encode_tiff(img, compression=c, predictor=p) for c, p in COMP_PRED
    ]
    for trial in range(800):
        blob = bytearray(blobs[trial % len(blobs)])
        for _ in range(rng.integers(1, 4)):
            blob[rng.integers(0, len(blob))] = rng.integers(0, 256)
        try:
            out = tiff.decode_tiff(bytes(blob))
            assert out.dtype == np.uint8 and out.ndim == 3
        except (ValueError, NotImplementedError):
            pass  # the only acceptable escapes


# ---- dispatch + pipeline ----------------------------------------------


def test_decode_image_routes_both_byte_orders():
    from streamsum_spark.operators.multimodal import decode_image

    img = _rng(5).integers(0, 256, (7, 9, 3)).astype(np.uint8)
    for bo in ("<", ">"):
        assert np.array_equal(decode_image(tiff.encode_tiff(img, byte_order=bo)), img)


def test_tiff_through_extract_features(spark):
    from streamsum_spark.operators.multimodal import extract_features, synthetic_media

    media = synthetic_media(spark, n=96)
    tiff_rows = media.filter("mime = 'image/tiff'")
    n_tiff = tiff_rows.count()
    assert n_tiff >= 2  # synthetic_media now emits TIFF slots
    feats = extract_features(tiff_rows).collect()
    assert len(feats) == n_tiff
    assert all(r.decoded for r in feats)
    assert all(r.width is not None and r.channels == 3 for r in feats)


# ---- tiled organization (spec §15) ------------------------------------


def test_external_libtiff_tiled_golden_byte_exact():
    """REAL libtiff-written tiled LZW file (48x32 tiles over 128x160, so
    edge tiles are encoder-padded): the tiled walk, per-tile LZW, and
    edge clipping must reproduce the xorshift pixels byte-exact."""
    img = tiff.decode_tiff(_data("ext_lzw_libtiff_tiled.tif"))
    exp = _xorshift_gray(True)
    assert img.shape == (160, 128, 3)
    assert all(np.array_equal(img[:, :, c], exp) for c in range(3))


@pytest.mark.parametrize("comp,pred", COMP_PRED)
def test_tiled_roundtrip_rgb_gray_gray16(comp, pred):
    """Tiled encode/decode across compressions and the horizontal
    predictor — which must RESET per tile (a decoder running the cumsum
    over assembled image rows leaks deltas across tile seams; pinned by
    non-tile-aligned image sizes)."""
    rng = _rng(13)
    rgb = rng.integers(0, 256, (21, 37, 3)).astype(np.uint8)
    out = tiff.decode_tiff(tiff.encode_tiff(rgb, compression=comp,
                                            predictor=pred, tile=(16, 16)))
    assert np.array_equal(out, rgb)
    g16 = rng.integers(0, 65536, (19, 22)).astype(np.uint16)
    out16 = tiff.decode_tiff(tiff.encode_tiff(g16, compression=comp,
                                              predictor=pred, tile=(16, 16)))
    assert np.array_equal(out16, np.repeat((g16 >> 8).astype(np.uint8)[:, :, None], 3, 2))


def test_tiled_predictor_would_leak_across_seams_without_reset():
    """Constructive proof the per-tile predictor reset matters: a
    constant-color image diff-encodes to zeros after each tile's first
    column, so a decoder cumsumming across seams would double the value
    at x=16.  The decoded image must be exactly constant."""
    img = np.full((8, 32, 3), 200, np.uint8)
    out = tiff.decode_tiff(
        tiff.encode_tiff(img, compression="lzw", predictor=2, tile=(16, 8))
    )
    assert np.array_equal(out, img)


def test_tiled_hostile_refuses():
    img = np.zeros((20, 20), np.uint8)
    blob = bytearray(tiff.encode_tiff(img, tile=(16, 16)))
    # truncate: tile data out of range
    with pytest.raises(ValueError):
        tiff.decode_tiff(tiff.encode_tiff(img, compression="lzw", tile=(16, 16))[:60])
    # sub-byte MULTI-SAMPLE tiled: the one tiled combination still
    # refused (patch an RGB tiled blob's out-of-line BitsPerSample
    # values 8,8,8 down to 4,4,4)
    rgbblob = tiff.encode_tiff(np.zeros((20, 20, 3), np.uint8), tile=(16, 16))
    with pytest.raises(NotImplementedError):
        patched = rgbblob.replace(
            b"\x08\x00\x08\x00\x08\x00", b"\x04\x00\x04\x00\x04\x00")
        assert patched != rgbblob
        tiff.decode_tiff(patched)


def test_libtiff_reads_inrepo_tiled(tmp_path):
    """Reverse direction: real libtiff must read this repo's tiled LZW
    output tile-for-tile."""
    import ctypes

    try:
        lib = ctypes.CDLL("libtiff.so.6")
    except OSError:
        pytest.skip("libtiff not available")
    img = _xorshift_gray(True)[:40, :37]  # non-tile-aligned on purpose
    blob = tiff.encode_tiff(img, compression="lzw", tile=(16, 16))
    p = tmp_path / "tiled.tif"
    p.write_bytes(blob)
    lib.TIFFOpen.restype = ctypes.c_void_p
    lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    t = lib.TIFFOpen(str(p).encode(), b"r")
    assert t, "libtiff refused the in-repo tiled container"
    lib.TIFFReadTile.restype = ctypes.c_ssize_t
    got = np.zeros((48, 48), np.uint8)  # padded tile grid
    for y0 in range(0, 40, 16):
        for x0 in range(0, 37, 16):
            buf = ctypes.create_string_buffer(16 * 16)
            n = lib.TIFFReadTile(ctypes.c_void_p(t), buf, ctypes.c_uint32(x0),
                                 ctypes.c_uint32(y0), 0, 0)
            assert n == 256, (x0, y0, n)
            got[y0:y0 + 16, x0:x0 + 16] = np.frombuffer(
                buf.raw, np.uint8).reshape(16, 16)
    lib.TIFFClose(ctypes.c_void_p(t))
    assert np.array_equal(got[:40, :37], img)


def test_external_libtiff_planar_tiled_golden_byte_exact():
    """REAL libtiff-written planar+TILED RGB (PlanarConfiguration=2,
    48x32 tiles, plane-major via TIFFWriteTile's sample arg): the
    combination refused before round 10 must now reassemble the
    xorshift planes byte-exact."""
    img = tiff.decode_tiff(_data("ext_lzw_libtiff_planar_tiled.tif"))
    exp = np.frombuffer(
        _xorshift_stream(3 * 128 * 160, True), np.uint8
    ).reshape(3, 160, 128)
    assert img.shape == (160, 128, 3)
    assert all(np.array_equal(img[:, :, c], exp[c]) for c in range(3))


def test_external_libtiff_bilevel_tiled_golden_byte_exact():
    """REAL libtiff-written 1-bit tiled LZW (sub-byte tiled, refused
    before round 10): per-tile MSB-first bit rows, byte-aligned at the
    TILE width, thresholded xorshift pixels."""
    img = tiff.decode_tiff(_data("ext_lzw_libtiff_bilevel_tiled.tif"))
    bits = np.frombuffer(
        _xorshift_stream(128 * 160, True), np.uint8
    ).reshape(160, 128) >= 128
    exp = bits.astype(np.uint8) * 255
    assert img.shape == (160, 128, 3)
    assert all(np.array_equal(img[:, :, c], exp) for c in range(3))


@pytest.mark.parametrize("comp,pred", COMP_PRED)
def test_planar_tiled_roundtrip_rgb_and_gray16(comp, pred):
    """Planar + tiled encode/decode: plane-major tile grid, per-tile
    prediction reset within each plane, non-tile-aligned dims."""
    rng = _rng(31)
    rgb = rng.integers(0, 256, (21, 37, 3)).astype(np.uint8)
    out = tiff.decode_tiff(tiff.encode_tiff(
        rgb, compression=comp, predictor=pred, planar=2, tile=(16, 16)))
    assert np.array_equal(out, rgb)
    g16 = rng.integers(0, 65536, (19, 22, 3)).astype(np.uint16)
    out16 = tiff.decode_tiff(tiff.encode_tiff(
        g16, compression=comp, predictor=pred, planar=2, tile=(16, 16)))
    assert np.array_equal(out16, (g16 >> 8).astype(np.uint8))


@pytest.mark.parametrize("bps", [1, 2, 4])
def test_subbyte_tiled_roundtrip(bps):
    """Sub-byte single-channel tiles: rows byte-aligned at the tile
    width, gray rescale 255/(2^bps - 1) exact."""
    rng = _rng(32 + bps)
    gi = rng.integers(0, 1 << bps, (23, 29)).astype(np.uint8)
    for comp in ("none", "lzw", "deflate"):
        out = tiff.decode_tiff(tiff.encode_tiff(
            gi, compression=comp, bits_per_sample=bps, tile=(16, 8)))
        exp = (gi.astype(np.uint16) * 255 // ((1 << bps) - 1)).astype(np.uint8)
        assert np.array_equal(out, np.repeat(exp[:, :, None], 3, 2)), comp


def test_libtiff_reads_inrepo_planar_tiled(tmp_path):
    """Reverse direction: real libtiff must read this repo's
    planar+tiled LZW output tile-for-tile (TIFFReadTile sample arg)."""
    import ctypes

    try:
        lib = ctypes.CDLL("libtiff.so.6")
    except OSError:
        pytest.skip("libtiff not available")
    rng = _rng(33)
    img = rng.integers(0, 256, (40, 37, 3)).astype(np.uint8)
    blob = tiff.encode_tiff(img, compression="lzw", planar=2, tile=(16, 16))
    p = tmp_path / "planar_tiled.tif"
    p.write_bytes(blob)
    lib.TIFFOpen.restype = ctypes.c_void_p
    lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    t = lib.TIFFOpen(str(p).encode(), b"r")
    assert t, "libtiff refused the in-repo planar+tiled container"
    lib.TIFFReadTile.restype = ctypes.c_ssize_t
    got = np.zeros((3, 48, 48), np.uint8)
    for s in range(3):
        for y0 in range(0, 40, 16):
            for x0 in range(0, 37, 16):
                buf = ctypes.create_string_buffer(16 * 16)
                n = lib.TIFFReadTile(ctypes.c_void_p(t), buf,
                                     ctypes.c_uint32(x0), ctypes.c_uint32(y0),
                                     0, ctypes.c_uint16(s))
                assert n == 256, (s, x0, y0, n)
                got[s, y0:y0 + 16, x0:x0 + 16] = np.frombuffer(
                    buf.raw, np.uint8).reshape(16, 16)
    lib.TIFFClose(ctypes.c_void_p(t))
    assert np.array_equal(np.moveaxis(got[:, :40, :37], 0, 2), img)


# ---- planar configuration (spec: PlanarConfiguration = 2) --------------


def test_external_libtiff_planar_golden_byte_exact():
    """REAL libtiff-written PlanarConfiguration=2 RGB (one LZW strip per
    plane): the plane-major strip walk must reassemble the xorshift
    planes byte-exact."""
    img = tiff.decode_tiff(_data("ext_lzw_libtiff_planar.tif"))
    n = 128 * 160
    x = 0x9E3779B9
    raw = bytearray()
    for _ in range(3 * n):
        x ^= (x << 13) & 0xFFFFFFFF
        x ^= x >> 17
        x ^= (x << 5) & 0xFFFFFFFF
        raw.append((x & 0xF) * 17)
    raw = np.frombuffer(bytes(raw), np.uint8)
    exp = np.stack([raw[p * n : (p + 1) * n].reshape(160, 128) for p in range(3)], 2)
    assert np.array_equal(img, exp)


@pytest.mark.parametrize("comp,pred", COMP_PRED)
def test_planar_roundtrip_rgb_and_gray16(comp, pred):
    rng = _rng(23)
    img = rng.integers(0, 256, (11, 17, 3)).astype(np.uint8)
    blob = tiff.encode_tiff(img, compression=comp, predictor=pred,
                            planar=2, rows_per_strip=4)
    assert np.array_equal(tiff.decode_tiff(blob), img)
    img16 = rng.integers(0, 65536, (7, 9, 3)).astype(np.uint16)
    out16 = tiff.decode_tiff(tiff.encode_tiff(img16, compression=comp,
                                              predictor=pred, planar=2))
    assert np.array_equal(out16, (img16 >> 8).astype(np.uint8))


def test_planar_hostile_refuses():
    img = _rng(24).integers(0, 256, (8, 8, 3)).astype(np.uint8)
    blob = tiff.encode_tiff(img, planar=2, rows_per_strip=4)
    # missing plane strips: patch the strip-offsets COUNT down to 2
    with pytest.raises(ValueError):
        patched = blob.replace(
            struct.pack("<HHI", 273, 4, 6), struct.pack("<HHI", 273, 4, 2)
        )
        assert patched != blob
        tiff.decode_tiff(patched)
    # planar value 3 is corrupt, not a refusal
    with pytest.raises(ValueError):
        patched = blob.replace(
            struct.pack("<HHI", 284, 3, 1) + b"\x02\x00\x00\x00",
            struct.pack("<HHI", 284, 3, 1) + b"\x03\x00\x00\x00",
        )
        tiff.decode_tiff(patched)
    # planar + tiled is SUPPORTED since round 10, so patching a chunky
    # tiled file to planar=2 is now a plain corruption: the plane-major
    # grid needs spp x tiles offsets and only tiles are present
    with pytest.raises(ValueError, match="missing tile offsets"):
        tiled = tiff.encode_tiff(img, tile=(8, 8))
        patched = tiled.replace(
            struct.pack("<HHI", 284, 3, 1) + b"\x01\x00\x00\x00",
            struct.pack("<HHI", 284, 3, 1) + b"\x02\x00\x00\x00",
        )
        assert patched != tiled
        tiff.decode_tiff(patched)


def test_packbits_predictor_tag_ignored_like_libtiff(tmp_path):
    """A PackBits file carrying predictor=2 (tag 317) is out-of-spec;
    libtiff reports 'Unknown field with tag 317' and decodes WITHOUT
    undoing differencing, as does the JDK TIFF reader.  Round 10 made
    this decoder match (it previously honored the tag — the ecosystem
    outlier, caught by the JVM fast path's sampled byte-exact check on
    a synthetic_media blob).  The blob is crafted by IFD surgery since
    encode_tiff now refuses the combination."""
    img = _rng(5).integers(0, 256, (10, 27, 3)).astype(np.uint8)
    base = tiff.encode_tiff(img, compression="packbits")
    # rebuild the IFD with an inserted (317, SHORT, 1, 2) entry at EOF
    off = struct.unpack_from("<I", base, 4)[0]
    n = struct.unpack_from("<H", base, off)[0]
    entries = [base[off + 2 + 12 * k : off + 14 + 12 * k] for k in range(n)]
    entries.append(struct.pack("<HHI", 317, 3, 1) + struct.pack("<HH", 2, 0))
    entries.sort(key=lambda e: struct.unpack_from("<H", e)[0])
    blob = bytearray(base)
    new_off = len(blob)
    struct.pack_into("<I", blob, 4, new_off)
    blob += struct.pack("<H", n + 1) + b"".join(entries) + b"\x00\x00\x00\x00"
    blob = bytes(blob)
    # the pixels decode as if the tag were absent — NOT un-differenced
    got = tiff.decode_tiff(blob)
    assert np.array_equal(got, img)
    # parity with real libtiff when present
    import ctypes

    try:
        lib = ctypes.CDLL("libtiff.so.6")
    except OSError:
        lib = None
    if lib is not None:
        p = tmp_path / "pbpred.tif"
        p.write_bytes(blob)
        lib.TIFFOpen.restype = ctypes.c_void_p
        lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        t = lib.TIFFOpen(str(p).encode(), b"r")
        assert t
        buf = (ctypes.c_uint32 * (27 * 10))()
        assert lib.TIFFReadRGBAImageOriented(ctypes.c_void_p(t), 27, 10, buf, 1, 0)
        lib.TIFFClose(ctypes.c_void_p(t))
        arr = np.frombuffer(buf, dtype=np.uint32).reshape(10, 27)
        rgb = np.stack(
            [arr & 0xFF, (arr >> 8) & 0xFF, (arr >> 16) & 0xFF], axis=2
        ).astype(np.uint8)
        assert np.array_equal(rgb, got)
    # and with the JVM fast path when present
    from streamsum_spark.operators import jvm_codecs as jc

    if jc.have_jvm_imageio():
        assert tiff.tiff_native_ok(blob)
        assert np.array_equal(jc.decode_image_jvm(blob), got)
    # the encoder refuses to produce the combination
    with pytest.raises(ValueError, match="predictor"):
        tiff.encode_tiff(img, compression="packbits", predictor=2)
