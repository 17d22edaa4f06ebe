"""Multimodal column plumbing (north-star extension): image/audio/video as
opaque BINARY columns with typed metadata, processed by Arrow-batched
pandas functions via mapInPandas.

The container has no image/audio codecs, so the *decode* step is stubbed
(deterministic fake or NotImplementedError), but the Spark-side plumbing —
schema, batch iteration, partition sizing, UDF signatures — is real and
tested: this is the part that has to be right at 100 TB, where media
blobs dominate bytes and per-batch (not per-row) Python is mandatory.

Scale notes:
- media rows are wide: keep `spark.sql.files.maxPartitionBytes` moderate
  and repartition by content hash before heavy decode so stragglers from
  size skew are split;
- metadata-only predicates (mime, width, duration) are ordinary columns —
  they push down to parquet and prune row groups without touching blobs;
- mapInPandas streams Arrow batches, so peak executor memory is one batch
  of blobs, not one partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("content", T.BinaryType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_sha", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def decode_image(content: bytes) -> "object":
    """Real decode requires an image codec (PIL/opencv), absent in this
    container.  STUB — the pipeline around it is the deliverable."""
    raise NotImplementedError("image codecs not available in this environment")


def _fake_feature(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for an embedding extractor: derives `dim`
    floats from the byte content (stable across runs/engines)."""
    if content is None:
        return [0.0] * dim
    acc, out = 2166136261, []
    for i, b in enumerate(content):
        acc = (acc ^ b) * 16777619 % (1 << 32)
        if i % max(1, len(content) // dim) == 0 and len(out) < dim:
            out.append((acc % 2000) / 1000.0 - 1.0)
    while len(out) < dim:
        acc = acc * 16777619 % (1 << 32)
        out.append((acc % 2000) / 1000.0 - 1.0)
    return out


def extract_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction over binary content.

    Arrow streams batches of (media_id, content); Python touches each blob
    once; output is a narrow typed feature table.  Decode itself is the
    deterministic fake (see decode_image for the honest stub)."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["content"].map(lambda c: len(c) if c is not None else 0),
                    "content_sha": pdf["content"].map(
                        lambda c: hashlib.sha256(c).hexdigest() if c is not None else None
                    ),
                    "feature": pdf["content"].map(_fake_feature),
                }
            )
            yield out

    return media.select("media_id", "content").mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms)
    without decoding — pure sequence/explode arithmetic, JVM-side.  A real
    decoder would mapInPandas over this plan joined back to content."""
    return (
        media.where(F.col("duration_ms").isNotNull())
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (no codecs needed)."""
    rows = []
    for i in range(n):
        content = bytes((i * 31 + j * 7) % 256 for j in range(128 + (i % 5) * 64))
        rows.append((i, "image/png" if i % 2 == 0 else "audio/wav", 64 + i % 32, 48, 1000 * (1 + i % 7), content))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
