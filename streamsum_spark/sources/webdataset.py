"""WebDataset-style tar-shard source — the standard packaging for
multimodal training corpora: a corpus is a set of .tar shards, each
member named ``<key>.<ext>`` (e.g. ``000123.jpg`` + ``000123.txt`` +
``000123.json``), and one SAMPLE is the group of members sharing a key
within a shard.

Reference parity: the reference system (streamsum) reads queues of
clojure maps; this source extends the ingest surface for the 100 TB
multimodal goal (SURVEY §2 sources row) the way production image-text
pipelines actually ship data.

Scale shape: one shard = one ``binaryFile`` row = one task's unit of
work — shards are sized by the PACKER (the convention is 100 MB-1 GB)
so a task holds one shard plus its members, never the corpus.  Member
extraction is a mapInPandas pass over stdlib ``tarfile`` on an
in-memory buffer: sequential scan, no seeks, no temp files; gzip
shards (.tar.gz) stream-decompress through the same call.  Sample
assembly is one groupBy(shard, key) with ``map_from_entries`` — a
single shuffle keyed well below corpus cardinality, and because
members of a key are adjacent in a well-packed shard, AQE-coalesced
partition-local grouping does most of it map-side.

Hostile-input posture: a malformed tar raises inside ``tarfile`` —
caught per SHARD (one bad shard emits an error row, the scan
continues), mirroring the per-blob isolation of the decode operators;
member counts and name lengths are bounded."""

from __future__ import annotations

import io
import os
import posixpath
import tarfile
import zipfile
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd

_MAX_MEMBERS = 100_000  # per shard
_MAX_NAME = 512
# decompressed-output bound per shard: a .zip or .tar.gz shard is
# stream-decompressed in one task, and a crafted bomb (tiny shard
# declaring/expanding to TBs) must fail the SHARD, not the executor
_MAX_EXTRACT_BYTES = 4 << 30

MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType(), False),
        T.StructField("ordinal", T.IntegerType(), True),
        T.StructField("key", T.StringType(), True),
        T.StructField("ext", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def iter_tar_members(blob: bytes) -> Iterator[tuple[str, bytes]]:
    """(member_name, content) for every regular file in a (possibly
    gzip/bzip2-compressed) tar blob, in archive order."""
    with tarfile.open(fileobj=io.BytesIO(blob), mode="r:*") as tf:
        n = out_bytes = 0
        for m in tf:
            if not m.isfile():
                continue
            n += 1
            if n > _MAX_MEMBERS:
                raise ValueError("tar member budget exceeded")
            if len(m.name) > _MAX_NAME:
                raise ValueError("tar member name too long")
            f = tf.extractfile(m)
            if f is None:
                continue
            content = f.read()
            out_bytes += len(content)
            if out_bytes > _MAX_EXTRACT_BYTES:
                raise ValueError("tar shard exceeds the extraction budget")
            yield m.name, content


def iter_zip_members(blob: bytes) -> Iterator[tuple[str, bytes]]:
    """(member_name, content) for every file entry in a zip shard, in
    central-directory order — datasets ship as .zip about as often as
    .tar, and the sample-naming convention is the same."""
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        n = out_bytes = 0
        for info in zf.infolist():
            if info.is_dir():
                continue
            n += 1
            if n > _MAX_MEMBERS:
                raise ValueError("zip member budget exceeded")
            if len(info.filename) > _MAX_NAME:
                raise ValueError("zip member name too long")
            # file_size is the DECLARED size; check before AND meter
            # after — a lying header must not expand past the budget
            out_bytes += info.file_size
            if out_bytes > _MAX_EXTRACT_BYTES:
                raise ValueError("zip shard exceeds the extraction budget")
            yield info.filename, zf.read(info)


def iter_shard_members(blob: bytes) -> Iterator[tuple[str, bytes]]:
    """Magic-dispatched member walk: zip shards by the PK signature,
    everything else through tarfile's own sniffing."""
    if blob[:2] == b"PK":
        yield from iter_zip_members(blob)
    else:
        yield from iter_tar_members(blob)


def split_key_ext(name: str) -> tuple[str, str]:
    """WebDataset naming: the key is everything up to the FIRST dot of
    the basename (so ``x.seg.png`` groups with ``x.jpg`` under key
    ``x`` with ext ``seg.png``) — directories inside the shard join the
    key path."""
    d, base = posixpath.split(name)
    stem, _, ext = base.partition(".")
    return posixpath.join(d, stem) if d else stem, ext


def read_webdataset_members(
    spark: SparkSession, path: str, glob: str = "*.tar"
) -> DataFrame:
    """One row per shard member across all shards matching ``glob``
    under ``path``: (shard, key, ext, n_bytes, content, error).  Shards
    may be tar (incl. .tar.gz) or zip — dispatched per blob by magic,
    so pass ``glob="*.zip"`` (or a mixed ``"*"``) for zip-packed
    corpora.  A shard that fails to parse contributes a single error
    row (key/ext/content null) instead of failing the scan."""
    import pandas as pd

    shards = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for path_, blob in zip(pdf["path"], pdf["content"]):
                shard = os.path.basename(path_)
                rows: dict[str, list] = {k.name: [] for k in MEMBER_SCHEMA}
                try:
                    for i, (name, content) in enumerate(iter_shard_members(bytes(blob))):
                        key, ext = split_key_ext(name)
                        rows["shard"].append(shard)
                        rows["ordinal"].append(i)
                        rows["key"].append(key)
                        rows["ext"].append(ext)
                        rows["n_bytes"].append(len(content))
                        rows["content"].append(content)
                        rows["error"].append(None)
                except (tarfile.TarError, zipfile.BadZipFile, ValueError,
                        EOFError, OSError, NotImplementedError) as exc:
                    # NotImplementedError: zipfile raises it for
                    # unsupported compression methods (e.g. type 9)
                    rows = {k.name: [] for k in MEMBER_SCHEMA}
                    rows["shard"].append(shard)
                    for c in ("key", "ext", "content"):
                        rows[c].append(None)
                    rows["ordinal"].append(None)
                    rows["n_bytes"].append(None)
                    rows["error"].append(f"{type(exc).__name__}: {exc}"[:200])
                yield pd.DataFrame(
                    {
                        "shard": rows["shard"],
                        "ordinal": pd.Series(rows["ordinal"], dtype="Int32"),
                        "key": rows["key"],
                        "ext": rows["ext"],
                        "n_bytes": pd.Series(rows["n_bytes"], dtype="Int64"),
                        "content": rows["content"],
                        "error": rows["error"],
                    }
                )

    return shards.mapInPandas(run, MEMBER_SCHEMA)


def webdataset_samples(members: DataFrame) -> DataFrame:
    """Assemble member rows into one row per SAMPLE: (shard, key,
    n_members, parts map<ext, binary>).  One shuffle on (shard, key);
    error rows and malformed members (null key) are excluded — filter
    ``error IS NOT NULL`` on the member relation to audit them.

    Duplicate member names are legal in tar (an appended archive
    overrides earlier entries) and the LAST occurrence wins — resolved
    expression-side after a SINGLE shuffle (content is the heavy
    column; a groupBy-per-ext pre-pass would shuffle the blobs twice),
    because map_from_entries throws on duplicate keys under Spark's
    default EXCEPTION dedup policy: one sloppy shard must not fail the
    job.  Entries sort by (ext, ordinal); the index-aware filter keeps
    each ext's last occurrence."""
    entries = (
        "filter(es, (x, i) -> i = size(es) - 1 OR es[i + 1].ext != x.ext)"
    )
    return (
        members.where(F.col("key").isNotNull())
        .groupBy("shard", "key")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("ext"), F.col("ordinal"), F.col("content")))
            ).alias("es")
        )
        .select(
            "shard",
            "key",
            F.expr(f"CAST(size({entries}) AS INT)").alias("n_members"),
            F.expr(
                f"map_from_entries(transform({entries}, x -> struct(x.ext, x.content)))"
            ).alias("parts"),
        )
    )


def read_webdataset(
    spark: SparkSession, path: str, glob: str = "*.tar"
) -> DataFrame:
    """The composed source: tar shards under ``path`` -> one row per
    sample with its members as a map<ext, binary>.  Feed ``parts['jpg']``
    to decode_image / resize_media, ``parts['txt']`` to the text
    operators."""
    return webdataset_samples(read_webdataset_members(spark, path, glob))


MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)


def _pack_stream(
    rows: Iterator[tuple], out_dir: str, pid: int, shard_max_bytes: int
) -> list[tuple[str, int, int]]:
    """Streaming shard packer: consume (key, parts) rows one at a
    time, rolling to a new tar when the accumulated member payload
    would exceed ``shard_max_bytes``.  Peak memory is the CURRENT
    shard's members (~shard_max_bytes plus one sample) — never the
    whole input (pinned by a test that watches shards land while rows
    are still being produced).  Rows must arrive already ordered if
    reproducible shards are wanted; write_webdataset sorts Spark-side."""
    manifest: list[tuple[str, int, int]] = []
    seq = 0
    cur: list[tuple[str, dict]] = []
    cur_bytes = 0

    def flush():
        nonlocal seq, cur, cur_bytes
        if not cur:
            return
        name = f"shard-{pid:05d}-{seq:04d}.tar"
        path = os.path.join(out_dir, name)
        with tarfile.open(path, "w") as tf:
            for key, parts in cur:
                for ext in sorted(parts):
                    content = bytes(parts[ext])
                    info = tarfile.TarInfo(f"{key}.{ext}" if ext else key)
                    info.size = len(content)
                    tf.addfile(info, io.BytesIO(content))
        manifest.append((name, len(cur), os.path.getsize(path)))
        seq += 1
        cur, cur_bytes = [], 0

    for key, parts in rows:
        size = sum(len(bytes(v)) for v in parts.values())
        if cur and cur_bytes + size > shard_max_bytes:
            flush()
        cur.append((key, parts))
        cur_bytes += size
    flush()
    return manifest


def write_webdataset(
    samples: DataFrame,
    out_dir: str,
    shard_max_bytes: int = 256 << 20,
) -> DataFrame:
    """The reverse direction: pack a sample relation (key, parts
    map<ext, binary>) into .tar shards under ``out_dir`` — the delivery
    format a training job consumes.  Returns the shard MANIFEST
    (shard, n_samples, n_bytes); the write executes when the manifest
    is materialized (collect/count/save — the mapInPandas pattern for
    executor-side IO with a result relation, same as the state sinks).

    Memory contract: a task holds at most the CURRENT shard
    (~``shard_max_bytes`` plus one sample plus one Arrow batch) — a
    partition may be arbitrarily larger than a shard.  The by-key
    ordering that makes shards reproducible runs SPARK-side
    (sortWithinPartitions — Tungsten external sort, spills to disk),
    and the Python packer streams batches through, rolling shards as
    the payload budget fills (one oversized sample still gets a shard:
    the bound is a roll trigger, not a hard cap).

    Determinism: a given (partitioning, data) produces byte-identical
    shards — keys are expected unique per sample (duplicate keys sort
    together but their relative order is not pinned).  Shard names are
    ``shard-{partition:05d}-{seq:04d}.tar``: partition-disjoint, so
    concurrent tasks never collide and a re-run overwrites its own
    files idempotently.  ``out_dir`` must be visible to executors (a
    shared mount or object-store path at cluster scale; a local dir on
    local[*])."""
    import pandas as pd

    def pack(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from pyspark import TaskContext

        # created task-side, not driver-side: at cluster scale the
        # executor host is the one that needs the directory to exist
        os.makedirs(out_dir, exist_ok=True)
        pid = TaskContext.get().partitionId()

        def rows() -> Iterator[tuple]:
            for pdf in batches:
                yield from zip(pdf["key"], pdf["parts"])

        manifest = _pack_stream(rows(), out_dir, pid, shard_max_bytes)
        yield pd.DataFrame(
            {
                "shard": [m[0] for m in manifest],
                "n_samples": pd.Series([m[1] for m in manifest], dtype="int32"),
                "n_bytes": pd.Series([m[2] for m in manifest], dtype="int64"),
            }
        )

    return (
        samples.select("key", "parts")
        .sortWithinPartitions("key")
        .mapInPandas(pack, MANIFEST_SCHEMA)
    )
