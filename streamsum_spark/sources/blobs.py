"""Head-bounded blob source — the probe feed that never loads a blob
it will drop.

Why it exists (SURVEY §2 multimodal posture; media_probe module note):
every field probe_media_headers emits lives in the first KBs of a
blob, yet a feed built on whole-file reads (spark.read.format
("binaryFile"), or a parquet media table's content column) pays full
blob IO for rows curation is about to discard.  At 100 TB the correct
feed is a HEAD-RANGE read: object stores serve ranged GETs, so a probe
pass over a billion files costs first-N-KiB x files, not the corpus.

Shape:

- ``read_blob_heads`` lists files driver-side (one bounded metadata
  row per file — the same license as any file listing; at extreme
  file counts feed ``paths`` from an inventory relation instead) and
  range-reads the first ``head_bytes`` of each file EXECUTOR-side via
  pyarrow.fs (``read_at(head_bytes, 0)`` — a positional read, which
  maps to a ranged GET on object-store filesystems and a single
  bounded pread locally; pinned by a /proc/self/io bytes-read test).
- ``blob_heads_as_media`` adapts the head relation to the
  (media_id, content) contract probe_media_headers / the media
  curation funnel consume.  Honest note: a funnel fed with heads
  computes its md5 exact-dup rule over the HEAD bytes only — a
  candidate-level dedup (identical heads, possibly different tails);
  byte-exact dedup needs the full blob and belongs AFTER survival,
  with the other full-read stages.

The probe itself is pinned equal to the full-blob probe on a real
encoded corpus in tests/test_blob_heads.py: every header fact the
probe emits lives inside the default head (MP3/Ogg duration walks
degrade to probed rows with null duration when the chain is cut — the
documented trade of the bounded feed).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd

HEAD_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("file_size", T.LongType(), False),
        T.StructField("head", T.BinaryType(), True),
    ]
)


def list_blobs(spark: SparkSession, root: str, glob: str = "*") -> list:
    """(path, size) for every file under ``root`` matching ``glob``
    (fnmatch on the base name) — driver-side, one bounded metadata row
    per file, recursive."""
    import fnmatch

    from pyarrow import fs as pafs

    filesystem, base = pafs.FileSystem.from_uri(root)
    sel = pafs.FileSelector(base, recursive=True)
    out = []
    for info in filesystem.get_file_info(sel):
        if info.type == pafs.FileType.File and fnmatch.fnmatch(
            info.base_name, glob
        ):
            out.append((info.path, info.size))
    out.sort()
    return out


def _read_head(path: str, head_bytes: int, filesystem=None) -> bytes:
    """First ``head_bytes`` of ``path`` via a positional read — never
    the file.  ``read_at`` maps to a ranged GET on object stores."""
    from pyarrow import fs as pafs

    if filesystem is None:
        filesystem, path = pafs.FileSystem.from_uri(path)
    with filesystem.open_input_file(path) as f:
        return f.read_at(head_bytes, 0)


def read_blob_heads(
    spark: SparkSession,
    root: str,
    glob: str = "*",
    head_bytes: int = 256 << 10,
    paths: list | None = None,
) -> DataFrame:
    """(path, file_size, head) with ``head`` = the first ``head_bytes``
    of each file (the whole file when smaller) — the bounded feed for
    probe_media_headers / the media curation funnel.

    Listing happens once on the driver (or pass ``paths`` as
    [(path, size), ...] from an inventory relation to skip it); reads
    are distributed: each task opens ONLY its files and reads ONLY the
    head range.  len(head) == min(head_bytes, file_size) always —
    asserted at read time so a short read surfaces as an error, not a
    silently truncated probe."""
    if head_bytes <= 0:
        raise ValueError("head_bytes must be positive")
    if paths is None:
        paths = list_blobs(spark, root, glob)
    import pandas as pd  # noqa: F401 (schema side of createDataFrame)

    listing = spark.createDataFrame(
        paths, "path string, file_size long"
    ).repartition(max(1, min(len(paths), spark.sparkContext.defaultParallelism)))

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import pandas as pd

        from pyarrow import fs as pafs

        filesystem, _ = pafs.FileSystem.from_uri(root)
        for pdf in batches:
            heads = []
            for path, size in zip(pdf["path"], pdf["file_size"]):
                h = _read_head(str(path), head_bytes, filesystem)
                if len(h) != min(head_bytes, int(size)):
                    raise IOError(
                        f"short head read: {path} gave {len(h)} of "
                        f"{min(head_bytes, int(size))} bytes"
                    )
                heads.append(h)
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "file_size": pdf["file_size"],
                    "head": heads,
                }
            )

    return listing.mapInPandas(run, HEAD_SCHEMA)


def blob_heads_as_media(heads: DataFrame) -> DataFrame:
    """(media_id, path, content) from a head relation — the adapter
    into probe_media_headers / media_curation_funnel.  media_id is
    xxhash64(path): deterministic, collision-negligible at file-count
    cardinalities, and stable across runs so funnel output joins back
    to paths."""
    return heads.select(
        F.xxhash64("path").alias("media_id"),
        "path",
        F.col("head").alias("content"),
    )
