"""Head-bounded blob source: bounded range reads (proved via
/proc/self/io), probe-over-heads pinned equal to probe-over-full-blobs
on a real encoded corpus, and the curation-funnel integration."""

import os

import numpy as np
import pytest

from streamsum_spark.sources.blobs import (
    _read_head,
    blob_heads_as_media,
    list_blobs,
    read_blob_heads,
)


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def _corpus(tmp_path):
    """Real encoded blobs of every probe family, written as files."""
    from streamsum_spark.operators.avi import encode_avi_mjpeg
    from streamsum_spark.operators.jpeg import encode_jpeg
    from streamsum_spark.operators.multimodal import encode_png, encode_wav

    tone = (np.sin(np.arange(8000) * 0.1) * 8000).astype(np.int16).reshape(-1, 1)
    blobs = {
        "a.png": encode_png(_img(40, 56, 1)),
        "b.jpg": encode_jpeg(_img(64, 48, 2), quality=80),
        "c.wav": encode_wav(tone, 8000),
        "d.avi": encode_avi_mjpeg([_img(32, 32, 3), _img(32, 32, 4)], rate=10),
        "e.bin": b"not a recognized format " * 10,
        # bigger than the head budget used in the tests: the JPEG
        # header lives in the first KBs, the tail is entropy data
        "f.jpg": encode_jpeg(_img(400, 400, 5), quality=95),
    }
    d = tmp_path / "corpus"
    d.mkdir()
    for name, b in blobs.items():
        (d / name).write_bytes(b)
    return d, blobs


def test_read_head_is_a_bounded_read(tmp_path):
    """The bytes-read assertion: reading a 64 KiB head of a 32 MiB
    file must cost ~64 KiB of read syscalls (rchar), not the file."""
    big = tmp_path / "big.bin"
    big.write_bytes(os.urandom(32 << 20))
    head_bytes = 64 << 10

    def rchar():
        with open("/proc/self/io") as f:
            return int(next(l for l in f if l.startswith("rchar:")).split()[1])

    before = rchar()
    h = _read_head(str(big), head_bytes)
    delta = rchar() - before
    assert len(h) == head_bytes
    assert h == big.read_bytes()[:head_bytes]
    assert delta < (1 << 20), f"read {delta} bytes for a {head_bytes}B head"


def test_listing_and_heads(spark, tmp_path):
    d, blobs = _corpus(tmp_path)
    listed = list_blobs(spark, str(d))
    assert [os.path.basename(p) for p, _ in listed] == sorted(blobs)
    assert all(s == len(blobs[os.path.basename(p)]) for p, s in listed)
    heads = read_blob_heads(spark, str(d), head_bytes=4096).collect()
    got = {os.path.basename(r.path): r for r in heads}
    for name, b in blobs.items():
        r = got[name]
        assert r.file_size == len(b)
        assert bytes(r.head) == b[:4096]
        assert len(r.head) == min(4096, len(b))
    # glob filters on base name
    only_jpg = read_blob_heads(spark, str(d), glob="*.jpg").collect()
    assert {os.path.basename(r.path) for r in only_jpg} == {"b.jpg", "f.jpg"}


def test_probe_over_heads_equals_probe_over_full_blobs(spark, tmp_path):
    """The round-12 pin: probe_media_headers over the head feed gives
    the same rows as over the full blobs — every emitted fact lives in
    the head (4 KiB here; f.jpg's tail alone is far larger)."""
    from streamsum_spark.operators.media_probe import probe_media_headers

    d, blobs = _corpus(tmp_path)
    assert len(blobs["f.jpg"]) > 64 << 10  # the head genuinely trims

    media = blob_heads_as_media(read_blob_heads(spark, str(d), head_bytes=4096))
    by_head = {
        os.path.basename(r.path): r.asDict()
        for r in probe_media_headers(media)
        .join(media.select("media_id", "path"), "media_id")
        .collect()
    }
    full = spark.createDataFrame(
        [(i, p, bytearray(b)) for i, (p, b) in enumerate(sorted(blobs.items()))],
        "media_id long, path string, content binary",
    )
    by_full = {
        r.path: r.asDict()
        for r in probe_media_headers(full)
        .join(full.select("media_id", "path"), "media_id")
        .collect()
    }
    assert set(by_head) == set(by_full) == set(blobs)
    for name, row in by_head.items():
        want = by_full[name]
        for k in row:
            if k in ("media_id", "path"):
                continue
            assert row[k] == want[k], (name, k, row[k], want[k])
    # sanity on the content: the unprobeable blob is probed=false,
    # everything else true with the right kind
    kinds = {
        os.path.basename(p): (r["probed"], r["kind"])
        for p, r in by_head.items()
    }
    assert kinds["e.bin"] == (False, None)
    assert kinds["a.png"] == (True, "image")
    assert kinds["c.wav"] == (True, "audio")
    assert kinds["d.avi"] == (True, "video")


def test_media_funnel_over_head_feed(spark, tmp_path):
    from streamsum_spark.operators.curation import media_curation_funnel

    d, blobs = _corpus(tmp_path)
    media = blob_heads_as_media(
        read_blob_heads(spark, str(d), head_bytes=4096)
    ).select("media_id", "content")
    funnel = media_curation_funnel(media).orderBy("stage").collect()
    assert funnel[0].n_in == len(blobs)
    by_rule = {r.rule: r.n_dropped for r in funnel}
    # e.bin unprobed; c.wav + d.avi wrong kind; images all >= 32x32
    assert by_rule["unprobed"] == 1 and by_rule["kind"] == 2
    assert funnel[-1].n_out == 3


def test_short_read_and_bad_args(spark, tmp_path):
    d, _ = _corpus(tmp_path)
    with pytest.raises(ValueError, match="head_bytes"):
        read_blob_heads(spark, str(d), head_bytes=0)
    # explicit paths skip the listing; a size lie surfaces as an error
    # (e.bin is tiny, so the lied-about size stays under head_bytes)
    p = str(d / "e.bin")
    bad = read_blob_heads(
        spark, str(d), head_bytes=4096,
        paths=[(p, os.path.getsize(p) + 999)],
    )
    with pytest.raises(Exception, match="short head read"):
        bad.collect()
