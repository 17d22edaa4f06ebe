"""End-to-end composition of the round-11 multimodal prep families:
WebDataset shards -> sample assembly -> image resize + audio
normalization + text stats on the respective parts -> repacked
training shards.  Each family is pinned in its own test file; THIS
file pins that they compose — schemas line up, bytes survive the full
loop, and per-row isolation holds across stages."""

from __future__ import annotations

import io
import tarfile

import numpy as np

from streamsum_spark.operators import multimodal as mm
from streamsum_spark.operators.audio_prep import (
    downmix_mono,
    resample_audio,
    resample_media,
)
from streamsum_spark.operators.resize import resize_image, resize_media
from streamsum_spark.sources.webdataset import read_webdataset, write_webdataset

from pyspark.sql import functions as F


def _shard(members):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, content in members:
            info = tarfile.TarInfo(name)
            info.size = len(content)
            tf.addfile(info, io.BytesIO(content))
    return buf.getvalue()


def test_shards_to_normalized_samples_and_back(spark, tmp_path):
    rng = np.random.default_rng(41)
    imgs = {i: rng.integers(0, 256, (40 + i, 30 + i, 3), dtype=np.uint8) for i in range(4)}
    wavs = {i: rng.integers(-9000, 9000, (4800, 2)).astype(np.int16) for i in range(4)}
    members = []
    for i in range(4):
        members += [
            (f"s{i:03d}.png", mm.encode_png(imgs[i])),
            (f"s{i:03d}.wav", mm.encode_wav(wavs[i], 48000)),
            (f"s{i:03d}.txt", f"caption for sample {i} with several words".encode()),
        ]
    # one corrupt image rides along: isolation must hold through resize
    members.append(("s999.png", b"\x89PNG\r\n\x1a\nbroken"))
    members.append(("s999.txt", b"orphaned caption"))
    (tmp_path / "in0.tar").write_bytes(_shard(members))

    samples = read_webdataset(spark, str(tmp_path), glob="in*.tar")

    # stage 1: image normalization over the png parts
    img_in = samples.select(
        F.monotonically_increasing_id().alias("media_id"),
        "key",
        F.col("parts").getItem("png").alias("content"),
    ).where(F.col("content").isNotNull()).cache()
    resized = resize_media(img_in, out_w=16, out_h=16)
    r = {k: v for k, v in img_in.select("media_id", "key").collect()}
    res_by_key = {r[row.media_id]: row for row in resized.collect()}
    for i in range(4):
        row = res_by_key[f"s{i:03d}"]
        assert row.decoded
        got = mm.decode_image(bytes(row.content))
        assert np.array_equal(got, resize_image(imgs[i], 16, 16))
    assert not res_by_key["s999"].decoded  # isolated, job survived

    # stage 2: audio normalization over the wav parts
    aud_in = samples.select(
        F.monotonically_increasing_id().alias("media_id"),
        "key",
        F.col("parts").getItem("wav").alias("content"),
    ).where(F.col("content").isNotNull()).cache()
    res = resample_media(aud_in, out_rate=16000)
    a = {k: v for k, v in aud_in.select("media_id", "key").collect()}
    aud_by_key = {a[row.media_id]: row for row in res.collect()}
    for i in range(4):
        row = aud_by_key[f"s{i:03d}"]
        got, rate = mm.decode_audio(bytes(row.content))
        assert rate == 16000
        assert np.array_equal(got, resample_audio(downmix_mono(wavs[i]), 48000, 16000))

    # stage 3: repack normalized samples into training shards
    norm = spark.createDataFrame(
        [
            (
                k,
                {
                    "png": bytes(res_by_key[k].content),
                    "wav": bytes(aud_by_key[k].content),
                },
            )
            for k in sorted(res_by_key) if res_by_key[k].decoded
        ],
        "key string, parts map<string, binary>",
    )
    outdir = str(tmp_path / "out")
    man = write_webdataset(norm, outdir, shard_max_bytes=1 << 20).collect()
    assert sum(m.n_samples for m in man) == 4
    back = {r.key: r for r in read_webdataset(spark, outdir).collect()}
    for i in range(4):
        k = f"s{i:03d}"
        assert np.array_equal(
            mm.decode_image(bytes(back[k].parts["png"])),
            resize_image(imgs[i], 16, 16),
        )
        got, rate = mm.decode_audio(bytes(back[k].parts["wav"]))
        assert rate == 16000 and len(got) == len(
            resample_audio(downmix_mono(wavs[i]), 48000, 16000)
        )
