"""Pins for the WebDataset tar-shard source: member extraction order
and naming, gzip shards, per-shard error isolation, sample assembly,
and the end-to-end compose with the decode operators."""

from __future__ import annotations

import io
import tarfile

import numpy as np
import pytest

from streamsum_spark.operators import multimodal as mm
from streamsum_spark.sources.webdataset import (
    iter_tar_members,
    read_webdataset,
    read_webdataset_members,
    split_key_ext,
    webdataset_samples,
)


def make_tar(members: list[tuple[str, bytes]], gz: bool = False) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz" if gz else "w") as tf:
        for name, content in members:
            info = tarfile.TarInfo(name)
            info.size = len(content)
            tf.addfile(info, io.BytesIO(content))
    return buf.getvalue()


def test_split_key_ext():
    assert split_key_ext("000123.jpg") == ("000123", "jpg")
    assert split_key_ext("000123.seg.png") == ("000123", "seg.png")
    assert split_key_ext("a/b/x.txt") == ("a/b/x", "txt")
    assert split_key_ext("noext") == ("noext", "")


def test_iter_tar_members_order_and_kinds():
    blob = make_tar([("b.txt", b"beta"), ("a.txt", b"alpha")])
    assert list(iter_tar_members(blob)) == [(b"b.txt".decode(), b"beta"), ("a.txt", b"alpha")]
    # directories are skipped
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        d = tarfile.TarInfo("dir/")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
        i = tarfile.TarInfo("dir/f.bin")
        i.size = 2
        tf.addfile(i, io.BytesIO(b"zz"))
    assert list(iter_tar_members(buf.getvalue())) == [("dir/f.bin", b"zz")]
    with pytest.raises(tarfile.TarError):
        list(iter_tar_members(b"definitely not a tar" * 40))


@pytest.mark.parametrize("gz", [False, True])
def test_members_and_samples_end_to_end(spark, tmp_path, gz):
    rng = np.random.default_rng(3)
    img1 = rng.integers(0, 256, (8, 10, 3), dtype=np.uint8)
    img2 = rng.integers(0, 256, (6, 6, 3), dtype=np.uint8)
    shard1 = make_tar(
        [
            ("s1k1.png", mm.encode_png(img1)),
            ("s1k1.txt", b"a caption"),
            ("s1k1.json", b'{"w": 10}'),
            ("s1k2.png", mm.encode_png(img2)),
            ("s1k2.txt", b"second"),
        ],
        gz=gz,
    )
    shard2 = make_tar([("s2k1.txt", b"text only")], gz=gz)
    ext = "tar.gz" if gz else "tar"
    (tmp_path / f"sh1.{ext}").write_bytes(shard1)
    (tmp_path / f"sh2.{ext}").write_bytes(shard2)
    (tmp_path / "bad.tar").write_bytes(b"corrupt" * 100)

    members = read_webdataset_members(spark, str(tmp_path), glob="*.tar*")
    rows = members.collect()
    errs = [r for r in rows if r.error is not None]
    assert len(errs) == 1 and errs[0].shard == "bad.tar" and errs[0].key is None
    good = [r for r in rows if r.error is None]
    assert len(good) == 6
    png = next(r for r in good if r.key == "s1k1" and r.ext == "png")
    assert bytes(png.content) == mm.encode_png(img1) and png.n_bytes == len(png.content)

    samples = {r.key: r for r in webdataset_samples(members).collect()}
    assert set(samples) == {"s1k1", "s1k2", "s2k1"}
    s = samples["s1k1"]
    assert s.n_members == 3 and set(s.parts) == {"png", "txt", "json"}
    assert bytes(s.parts["txt"]) == b"a caption"
    # decode composes: the sample's image decodes to the original pixels
    assert np.array_equal(mm.decode_image(bytes(s.parts["png"])), img1)
    assert samples["s2k1"].n_members == 1


def test_read_webdataset_composed(spark, tmp_path):
    img = np.zeros((4, 4, 3), np.uint8)
    (tmp_path / "one.tar").write_bytes(
        make_tar([("k.png", mm.encode_png(img)), ("k.txt", b"t")])
    )
    out = read_webdataset(spark, str(tmp_path)).collect()
    assert len(out) == 1 and out[0].key == "k" and set(out[0].parts) == {"png", "txt"}


def test_duplicate_member_last_wins(spark, tmp_path):
    """Duplicate member names are legal in tar (append overrides); the
    LAST occurrence must win instead of map_from_entries throwing on
    the duplicate key and failing the job."""
    (tmp_path / "dup.tar").write_bytes(
        make_tar(
            [("k.txt", b"first"), ("k.png", b"p"), ("k.txt", b"second")]
        )
    )
    out = read_webdataset(spark, str(tmp_path)).collect()
    assert len(out) == 1
    s = out[0]
    assert s.n_members == 2 and set(s.parts) == {"png", "txt"}
    assert bytes(s.parts["txt"]) == b"second"


def test_write_webdataset_roundtrip_and_rolling(spark, tmp_path):
    """write -> read roundtrip preserves every sample byte-for-byte;
    small shard_max_bytes forces the roll; shard names are
    partition-disjoint and the write is deterministic (two runs produce
    identical bytes)."""
    import hashlib
    import os

    from streamsum_spark.sources.webdataset import write_webdataset

    rng = np.random.default_rng(7)
    rows = []
    for i in range(12):
        parts = {
            "bin": bytes(rng.integers(0, 256, 400, dtype=np.uint8)),
            "txt": f"caption {i}".encode(),
        }
        rows.append((f"k{i:04d}", parts))
    samples = spark.createDataFrame(
        rows, "key string, parts map<string, binary>"
    ).repartition(3)
    out1 = str(tmp_path / "out1")
    man = write_webdataset(samples, out1, shard_max_bytes=1000).collect()
    assert sum(m.n_samples for m in man) == 12
    assert len(man) > 3  # the roll triggered within partitions
    assert all(m.shard.startswith("shard-") for m in man)
    assert len({m.shard for m in man}) == len(man)
    back = read_webdataset(spark, out1).collect()
    got = {r.key: {e: bytes(c) for e, c in r.parts.items()} for r in back}
    want = {k: {e: bytes(c) for e, c in p.items()} for k, p in rows}
    assert got == want
    # determinism: a second run writes byte-identical shards
    out2 = str(tmp_path / "out2")
    write_webdataset(samples, out2, shard_max_bytes=1000).collect()
    h = lambda d: {
        f: hashlib.sha256(open(os.path.join(d, f), "rb").read()).hexdigest()
        for f in sorted(os.listdir(d))
    }
    assert h(out1) == h(out2)


def make_zip(members: list[tuple[str, bytes]], compress: bool = True) -> bytes:
    import zipfile

    buf = io.BytesIO()
    kind = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with zipfile.ZipFile(buf, "w", kind) as zf:
        for name, content in members:
            zf.writestr(name, content)
    return buf.getvalue()


def test_iter_zip_members():
    from streamsum_spark.sources.webdataset import iter_zip_members

    blob = make_zip([("b.txt", b"beta"), ("a.txt", b"alpha"), ("d/", b"")])
    assert list(iter_zip_members(blob)) == [("b.txt", b"beta"), ("a.txt", b"alpha")]


def test_zip_shards_end_to_end(spark, tmp_path):
    from streamsum_spark.sources.webdataset import read_webdataset

    (tmp_path / "s0.zip").write_bytes(
        make_zip([("k0.txt", b"t0"), ("k0.jpg", b"j0"), ("k1.txt", b"t1")])
    )
    (tmp_path / "s1.zip").write_bytes(make_zip([("k2.txt", b"t2")], compress=False))
    (tmp_path / "bad.zip").write_bytes(b"PK\x03\x04 utterly broken")
    samples = read_webdataset(spark, str(tmp_path), glob="*.zip")
    got = {(r.shard, r.key): dict(r.parts) for r in samples.collect()}
    assert got[("s0.zip", "k0")] == {"txt": bytearray(b"t0"), "jpg": bytearray(b"j0")}
    assert got[("s1.zip", "k2")] == {"txt": bytearray(b"t2")}
    assert ("bad.zip", None) not in got  # error row excluded from samples
    from streamsum_spark.sources.webdataset import read_webdataset_members

    errs = read_webdataset_members(spark, str(tmp_path), glob="*.zip").where(
        "error IS NOT NULL"
    )
    assert [r.shard for r in errs.collect()] == ["bad.zip"]


def test_mixed_tar_and_zip_one_scan(spark, tmp_path):
    from streamsum_spark.sources.webdataset import read_webdataset

    (tmp_path / "a.tar").write_bytes(make_tar([("k.txt", b"from tar")]))
    (tmp_path / "b.zip").write_bytes(make_zip([("k.txt", b"from zip")]))
    got = {
        (r.shard, r.key): dict(r.parts)
        for r in read_webdataset(spark, str(tmp_path), glob="*").collect()
    }
    assert got[("a.tar", "k")]["txt"] == bytearray(b"from tar")
    assert got[("b.zip", "k")]["txt"] == bytearray(b"from zip")


def test_zip_extraction_budget(monkeypatch):
    import streamsum_spark.sources.webdataset as wd

    blob = make_zip([("big.bin", b"\x00" * 10_000)])  # compresses tiny
    monkeypatch.setattr(wd, "_MAX_EXTRACT_BYTES", 5_000)
    with pytest.raises(ValueError, match="extraction budget"):
        list(wd.iter_zip_members(blob))
    monkeypatch.setattr(wd, "_MAX_EXTRACT_BYTES", 50_000)
    assert len(list(wd.iter_zip_members(blob))) == 1


def test_pack_stream_never_holds_the_partition(tmp_path):
    """Round-12 order: a partition 8x larger than shard_max_bytes
    packs WITHOUT whole-partition buffering — shards must land on disk
    while rows are still being produced, proving the packer streams."""
    import os

    from streamsum_spark.sources.webdataset import _pack_stream

    out = str(tmp_path / "stream")
    os.makedirs(out)
    shard_max = 64 << 10
    n, sample = 64, (8 << 10)  # 512 KiB total = 8 x shard_max
    shards_seen_mid_stream = []

    def rows():
        for i in range(n):
            if i == n // 2:
                shards_seen_mid_stream.append(len(os.listdir(out)))
            yield f"k{i:04d}", {"bin": bytes([i % 251]) * sample}

    manifest = _pack_stream(rows(), out, 0, shard_max)
    assert sum(m[1] for m in manifest) == n
    assert len(manifest) >= 8
    # half the shards were already written when half the rows had
    # streamed through — the packer held a shard, not the partition
    assert shards_seen_mid_stream[0] >= 3


def test_write_webdataset_partition_larger_than_shards(spark, tmp_path):
    """Spark-level twin: one partition 4x+ the shard budget, small
    Arrow batches, roundtrip byte-exact."""
    from streamsum_spark.sources.webdataset import write_webdataset

    rng = np.random.default_rng(3)
    rows = [
        (f"s{i:04d}", {"bin": bytes(rng.integers(0, 256, 4096, dtype=np.uint8))})
        for i in range(40)  # ~160 KiB in ONE partition
    ]
    samples = spark.createDataFrame(
        rows, "key string, parts map<string, binary>"
    ).coalesce(1)
    out = str(tmp_path / "big")
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "5")
    try:
        man = write_webdataset(samples, out, shard_max_bytes=32 << 10).collect()
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert sum(m.n_samples for m in man) == 40
    assert len(man) >= 5  # 160 KiB / 32 KiB budget
    back = read_webdataset(spark, out).collect()
    got = {r.key: bytes(r.parts["bin"]) for r in back}
    assert got == {k: p["bin"] for k, p in rows}
