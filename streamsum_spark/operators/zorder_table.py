"""Manifest-backed Z-ordered TABLES: file-level data skipping on top of
the zorder.py layouts (r13 verdict order #2).

Plain Spark prunes a parquet scan at row-group/page granularity only —
it still opens every file's footer, because file-level min/max pruning
is a table-format feature (the Delta/Iceberg data-skipping stats), not
a parquet one.  The repo's zorder read-path pin documents that honestly
(tests/test_zorder.py: numFiles equal across layouts).  This module
adds the missing half the production formats provide:

- ``write_zordered_table`` writes the clustered layout into an
  IMMUTABLE per-commit data directory, reads every written file's
  parquet FOOTER (metadata-only IO, one task per file — the same
  distributed stats collection Delta's OPTIMIZE runs) to record per-file
  min/max of the clustered columns, and commits a manifest naming the
  file list + stats.
- ``read_zordered`` resolves the manifest and prunes the FILE LIST
  against a range predicate before ``spark.read.parquet(files)`` — at
  100 TB this is the difference between listing/footer-probing every
  file of the table and touching only the files whose stats intersect
  the box.  The residual predicate still applies, so results are exact
  regardless of stats granularity.

- ``append_zordered`` commits new rows WITHOUT rewriting the table
  (a production table takes appends between optimizes): new data files
  into their own immutable commit directory, footer stats collected,
  and a manifest that unions the base version's file list — file
  entries carry their own ``dir``/``clustered`` fields, so one version
  can span many commit directories.  Appended files are marked
  unclustered; reads stay exact (stats still prune, just with wider
  boxes).
- ``optimize_zordered`` restores clustering INCREMENTALLY: it rewrites
  only the unclustered (appended) files plus the clustered files whose
  stat boxes overlap them — disjoint clustered files survive by
  reference, never re-read or re-written (Delta's OPTIMIZE ZORDER
  applied to the affected key range, not the whole table).  On an
  already-optimized table it is a metadata-only no-op.

Crash-consistency posture is inherited from snapshots.py, scaled to
this table shape (manifests are always FULL file lists — no delta
chain needed; append/optimize derive from an explicit base version and
claim base+1, so a concurrent commit fails the put-if-absent claim
instead of silently dropping the other writer's files):

- data files are immutable and live under ``data-<commit>/``; nothing
  references them until the manifest commit, so a crashed write leaves
  an invisible orphan directory, never a torn table;
- the manifest claims its version with the commit backend's atomic
  put-if-absent (commitio.py: POSIX hard link / conditional PUT) —
  two racing writers serialize there with exactly one winner
  (SnapshotConflictError for the loser, same contract as snapshots);
- the ``_latest`` pointer replace is THE commit; readers resolve the
  pointer once and then read an immutable file set, so any retained
  version stays readable (time travel) until ``vacuum_zordered``.

Reference provenance: the reference engine has no storage layout layer
at all (in-process caches, caches.clj:27-101); this extends the
north-star curation surface the way the production lakehouse formats
do, from published semantics only.
"""

from __future__ import annotations

import datetime
import json
import os
import uuid
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from streamsum_spark import commitio
from streamsum_spark.operators.zorder import hilbert_code, morton_code

_ZDIR = "_zsnap"
_LATEST = "_latest"


def _zdir(path: str) -> str:
    return os.path.join(path, _ZDIR)


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(_zdir(path), f"v{version:08d}.json")


def _latest_version(path: str) -> int | None:
    ptr = os.path.join(_zdir(path), _LATEST)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as fh:
        return int(fh.read().strip())


def _norm(v):
    """Manifest-storable stat value: numbers as float, timestamps as
    epoch seconds, anything else (unexpected for validated numeric
    layouts) as None = 'unknown, keep the file'."""
    if v is None:
        return None
    if isinstance(v, bool):
        return float(v)
    if isinstance(v, (int, float, Decimal)):
        v = float(v)
        return v if v == v else None  # NaN stats cannot prune
    if isinstance(v, datetime.datetime):
        if v.tzinfo is None:
            # PySpark interprets tz-NAIVE datetimes through the driver's
            # LOCAL timezone (time.mktime — see TimestampType.toInternal
            # and DatetimeConverter in pyspark.sql.types), both for the
            # F.lit() bounds in read_zordered's residual filter and for
            # row values at write.  The manifest bounds must use the
            # SAME rule or, on any non-UTC host, file pruning disagrees
            # with the residual filter by the UTC offset and silently
            # drops files containing matching rows.
            import time as _time

            return _time.mktime(v.timetuple()) + v.microsecond / 1e6
        return v.timestamp()
    if isinstance(v, datetime.date):
        return float(v.toordinal())
    return None


def _file_stats(spark: SparkSession, files: list[str], cols: list[str]):
    """Per-file [min, max] of ``cols`` from parquet footers — one task
    per file (metadata-only IO; the data pages are never read), results
    collected to the driver bounded at one tiny row per file, exactly
    the cardinality the manifest records anyway."""
    import pandas as pd

    col_list = list(cols)

    def footers(batches):
        import pyarrow.parquet as pq

        for pdf in batches:
            out_f, out_s = [], []
            for f in pdf["file"]:
                md = pq.ParquetFile(f).metadata
                # column name -> [min, max] across the file's row
                # groups; ONE statless/NaN row group makes the whole
                # file's span unknown (keep-the-file, never misprune)
                agg: dict[str, list] = {}
                bad: set[str] = set()
                for rg in range(md.num_row_groups):
                    row = md.row_group(rg)
                    for ci in range(row.num_columns):
                        col = row.column(ci)
                        name = col.path_in_schema
                        if name not in col_list or name in bad:
                            continue
                        st = col.statistics
                        mn = _norm(st.min) if st is not None else None
                        mx = _norm(st.max) if st is not None else None
                        if mn is None or mx is None:
                            bad.add(name)
                            agg[name] = [None, None]
                            continue
                        cur = agg.get(name)
                        agg[name] = (
                            [mn, mx]
                            if cur is None
                            else [min(cur[0], mn), max(cur[1], mx)]
                        )
                out_f.append(f)
                out_s.append(json.dumps(agg))
            yield pd.DataFrame({"file": out_f, "stats": out_s})

    fdf = spark.createDataFrame([(f,) for f in files], "file string")
    rows = (
        fdf.repartition(min(max(len(files), 1), 64))
        .mapInPandas(footers, "file string, stats string")
        .collect()
    )
    return {os.path.basename(r.file): json.loads(r.stats) for r in rows}


def _clustered_write(
    df: DataFrame,
    data_dir: str,
    cols: list[str],
    layout: str,
    n_files: int,
    bits: int | None,
    rank: str,
) -> None:
    """The clustered data-file write shared by the full rewrite and the
    incremental optimize: one range exchange on the space-filling-curve
    code, sorted within files, written errorifexists into an immutable
    commit directory."""
    if layout == "morton":
        code = morton_code(df, cols, bits, rank)
    elif layout == "hilbert":
        code = hilbert_code(df, cols, 8 if bits is None else bits, rank)
    else:
        raise ValueError(f"unknown layout {layout!r} (morton|hilbert)")
    _ts_micros_write(
        df.withColumn("_z", code)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z"),
        data_dir,
    )


def _ts_micros_write(df: DataFrame, data_dir: str) -> None:
    # Spark's default INT96 timestamps carry NO parquet statistics (the
    # encoding predates stats), which would silently disable file
    # skipping on a timestamp-clustered column — write TIMESTAMP_MICROS
    # for the duration (what Delta/Iceberg write), restoring the
    # session's setting after
    spark = df.sparkSession
    ts_key = "spark.sql.parquet.outputTimestampType"
    prev_ts = spark.conf.get(ts_key, None)
    spark.conf.set(ts_key, "TIMESTAMP_MICROS")
    try:
        df.write.mode("errorifexists").parquet(data_dir)
    finally:
        if prev_ts is None:
            spark.conf.unset(ts_key)
        else:
            spark.conf.set(ts_key, prev_ts)


def _new_entries(
    spark: SparkSession,
    path: str,
    data_rel: str,
    cols: list[str],
    clustered: bool,
) -> list[dict]:
    """Manifest entries (footer stats included) for every data file a
    commit just wrote under ``data_rel``."""
    import glob as g

    files = sorted(
        g.glob(os.path.join(path, data_rel, "part-*.parquet"))
    )
    stats = _file_stats(spark, files, cols)
    return [
        {
            "name": os.path.basename(f),
            "dir": data_rel,
            "clustered": clustered,
            "stats": stats[os.path.basename(f)],
        }
        for f in files
    ]


def _commit_manifest(
    path: str, manifest: dict, commit_id: str, version: int
) -> int:
    """Claim ``version`` with put-if-absent, then pointer-swap — exactly
    one winner per version; the loser's data directory is an invisible
    orphan for vacuum_zordered."""
    from streamsum_spark.snapshots import SnapshotConflictError

    manifest = dict(manifest, version=version)
    os.makedirs(_zdir(path), exist_ok=True)
    mtmp = os.path.join(_zdir(path), f"._v-{commit_id}.json")
    with open(mtmp, "w") as fh:
        json.dump(manifest, fh)
    if not commitio.get_backend().put_if_absent(
        mtmp, _manifest_path(path, version)
    ):
        os.unlink(mtmp)
        raise SnapshotConflictError(
            f"{_manifest_path(path, version)} already claimed: a "
            "concurrent writer committed this version (retry from the "
            "new head) or a crashed writer left an orphan "
            "(vacuum_zordered removes manifests above the pointer)"
        )
    ptmp = os.path.join(_zdir(path), f"._ptr-{commit_id}")
    with open(ptmp, "w") as fh:
        fh.write(str(version))
    commitio.get_backend().replace(
        ptmp, os.path.join(_zdir(path), _LATEST)
    )  # THE commit
    return version


def write_zordered_table(
    df: DataFrame,
    path: str,
    cols: list[str],
    layout: str = "morton",
    n_files: int = 16,
    bits: int | None = None,
    rank: str = "quantile",
) -> int:
    """Write ``df`` as a Z-ordered TABLE version: clustered data files
    (same single range exchange as write_zordered/write_hilbert) into
    an immutable ``data-<commit>/`` directory, per-file min/max of the
    clustered columns from the written footers, one manifest commit.
    Returns the committed version.  ``layout``: 'morton' (any arity) or
    'hilbert' (2-D)."""
    spark = df.sparkSession
    commit_id = uuid.uuid4().hex[:12]
    data_rel = f"data-{commit_id}"
    _clustered_write(
        df, os.path.join(path, data_rel), cols, layout, n_files, bits, rank
    )
    head = _latest_version(path)
    manifest = {
        "layout": layout,
        "cols": list(cols),
        "data_dir": data_rel,
        "schema": df.schema.json(),
        "files": _new_entries(spark, path, data_rel, cols, clustered=True),
    }
    return _commit_manifest(
        path, manifest, commit_id, 1 if head is None else head + 1
    )


def append_zordered(
    df: DataFrame,
    path: str,
    n_files: int = 1,
) -> int:
    """Commit ``df`` as NEW rows of the z-ordered table WITHOUT
    rewriting it: new data files into their own immutable commit
    directory (sorted within files by the clustered columns so footer
    stats stay as tight as one unclustered commit allows), footer stats
    collected, and a manifest unioning the base version's file list.
    Appended entries are marked unclustered — reads stay exact
    immediately (their stats still prune, with wider boxes), and the
    next ``optimize_zordered`` folds them back into the clustered
    layout.  Derives from the CURRENT head and claims head+1, so a
    concurrent commit raises SnapshotConflictError instead of silently
    dropping the other writer's files."""
    spark = df.sparkSession
    base = _latest_version(path)
    if base is None:
        raise ValueError(
            f"{path} has no committed z-ordered versions — create the "
            "table with write_zordered_table first"
        )
    m = _load_manifest(path, base)
    want = [f["name"] for f in json.loads(m["schema"])["fields"]]
    if sorted(df.columns) != sorted(want):
        raise ValueError(
            f"append schema columns {sorted(df.columns)} != table "
            f"columns {sorted(want)}"
        )
    cols = m["cols"]
    commit_id = uuid.uuid4().hex[:12]
    data_rel = f"data-{commit_id}"
    _ts_micros_write(
        df.select(*want)
        .repartition(n_files)
        .sortWithinPartitions(*cols),
        os.path.join(path, data_rel),
    )
    old_entries = [
        dict(
            e,
            dir=e.get("dir", m["data_dir"]),
            clustered=e.get("clustered", True),
        )
        for e in m["files"]
    ]
    manifest = {
        "layout": m["layout"],
        "cols": list(cols),
        "data_dir": data_rel,
        "schema": m["schema"],
        "files": old_entries
        + _new_entries(spark, path, data_rel, cols, clustered=False),
    }
    return _commit_manifest(path, manifest, commit_id, base + 1)


def _boxes_overlap(a: dict, b: dict, cols: list[str]) -> bool:
    """Whether two files' stat boxes can intersect on the clustered
    columns — unknown stats on either side of a dimension count as
    overlapping (conservative: rewrite rather than strand)."""
    for c in cols:
        sa, sb = a.get(c), b.get(c)
        if (
            not sa
            or not sb
            or sa[0] is None
            or sa[1] is None
            or sb[0] is None
            or sb[1] is None
        ):
            continue
        if sa[1] < sb[0] or sb[1] < sa[0]:
            return False
    return True


def optimize_zordered(
    spark: SparkSession,
    path: str,
    n_files: int | None = None,
    bits: int | None = None,
    rank: str = "quantile",
) -> dict:
    """Fold appended files back into the clustered layout, rewriting
    ONLY what clustering actually touched: every unclustered (appended)
    file, plus the clustered files whose stat boxes overlap one of them
    — a clustered file disjoint from all appends keeps its place in the
    new manifest by reference, never re-read.  On a table with no
    unclustered files this is a metadata no-op (no new version).
    Returns ``{"version", "rewritten", "kept"}``.  ``n_files`` defaults
    to scaling the base layout's file count by the rewritten fraction
    (at least 1)."""
    base = _latest_version(path)
    if base is None:
        raise ValueError(f"{path} has no committed z-ordered versions")
    m = _load_manifest(path, base)
    cols = m["cols"]
    entries = [
        dict(
            e,
            dir=e.get("dir", m["data_dir"]),
            clustered=e.get("clustered", True),
        )
        for e in m["files"]
    ]
    loose = [e for e in entries if not e["clustered"]]
    if not loose:
        return {"version": base, "rewritten": 0, "kept": len(entries)}
    rewrite = list(loose)
    for e in entries:
        if e["clustered"] and any(
            _boxes_overlap(e["stats"], x["stats"], cols) for x in loose
        ):
            rewrite.append(e)
    rewrite_keys = {(e["dir"], e["name"]) for e in rewrite}
    kept = [
        e for e in entries if (e["dir"], e["name"]) not in rewrite_keys
    ]
    files = [os.path.join(path, e["dir"], e["name"]) for e in rewrite]
    schema = T.StructType.fromJson(json.loads(m["schema"]))
    df = spark.read.schema(schema).parquet(*files)
    if n_files is None:
        n_clustered = sum(1 for e in entries if e["clustered"]) or 1
        n_files = max(
            1, round(n_clustered * len(rewrite) / max(len(entries), 1))
        )
    commit_id = uuid.uuid4().hex[:12]
    data_rel = f"data-{commit_id}"
    _clustered_write(
        df,
        os.path.join(path, data_rel),
        cols,
        m["layout"],
        n_files,
        bits,
        rank,
    )
    manifest = {
        "layout": m["layout"],
        "cols": list(cols),
        "data_dir": data_rel,
        "schema": m["schema"],
        "files": kept
        + _new_entries(spark, path, data_rel, cols, clustered=True),
    }
    version = _commit_manifest(path, manifest, commit_id, base + 1)
    return {
        "version": version,
        "rewritten": len(rewrite),
        "kept": len(kept),
    }


def _load_manifest(path: str, version: int) -> dict:
    mp = _manifest_path(path, version)
    if not os.path.exists(mp):
        raise ValueError(f"z-ordered table {path} has no version {version}")
    with open(mp) as fh:
        return json.load(fh)


def _pred_overlaps(stats: dict, pred: dict) -> bool:
    """Keep the file unless SOME predicate column's known [min, max]
    is disjoint from its range — unknown stats keep the file (exactness
    comes from the residual filter, pruning is an optimization)."""
    for c, (lo, hi) in pred.items():
        st = stats.get(c)
        if not st or st[0] is None or st[1] is None:
            continue
        mn, mx = st
        if lo is not None and mx < _norm(lo):
            return False
        if hi is not None and mn > _norm(hi):
            return False
    return True


def read_zordered(
    spark: SparkSession,
    path: str,
    pred: dict[str, tuple] | None = None,
    version: int | None = None,
) -> DataFrame:
    """Read a z-ordered table version with FILE-level skipping:
    ``pred`` maps column -> (lo, hi) inclusive bounds (either side
    None for open); files whose manifest stats cannot intersect the box
    are never handed to the reader at all — Spark neither lists nor
    footer-probes them.  The residual range filter still applies, so
    the result is exactly the full scan's filter.  The file set comes
    from the manifest, never a directory listing, so a read is
    immutable under concurrent rewrites (same posture as
    read_snapshot)."""
    if version is None:
        version = _latest_version(path)
        if version is None:
            raise ValueError(f"{path} has no committed z-ordered versions")
    m = _load_manifest(path, version)
    entries = m["files"]
    if pred:
        unknown = set(pred) - set(m["cols"])
        if unknown:
            raise ValueError(
                f"pred columns {sorted(unknown)} are not clustered columns "
                f"{m['cols']} — file stats exist only for the latter"
            )
        entries = [e for e in entries if _pred_overlaps(e["stats"], pred)]
    files = [
        os.path.join(path, e.get("dir", m["data_dir"]), e["name"])
        for e in entries
    ]
    if not files:
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        df = spark.createDataFrame([], schema)
    else:
        df = spark.read.parquet(*files)
    if pred:
        for c, (lo, hi) in pred.items():
            if lo is not None:
                df = df.where(F.col(c) >= F.lit(lo))
            if hi is not None:
                df = df.where(F.col(c) <= F.lit(hi))
    return df


def _manifest_dirs(m: dict) -> set[str]:
    """Every data directory a manifest references — its own commit dir
    plus any directory an append/optimize carried forward by entry."""
    return {m["data_dir"]} | {
        e["dir"] for e in m["files"] if "dir" in e
    }


def zordered_versions(path: str) -> list[int]:
    """Committed versions (manifest on disk AND at/below the pointer —
    an orphan claim above the pointer is not a committed version)."""
    zd = _zdir(path)
    latest = _latest_version(path)
    if latest is None or not os.path.isdir(zd):
        return []
    vs = sorted(
        int(f[1:-5])
        for f in os.listdir(zd)
        if f.startswith("v") and f.endswith(".json") and not f.startswith("v_")
    )
    return [v for v in vs if v <= latest]


def vacuum_zordered(
    path: str, keep_last: int = 2, orphan_grace_s: float = 3600.0
) -> dict:
    """Delete data directories unreachable from the newest ``keep_last``
    versions, manifests below them, and orphan manifests above the
    pointer (a crashed writer's unswapped claim).  Returns counts.

    An above-pointer manifest is indistinguishable from an IN-FLIGHT
    writer between its put-if-absent claim and its pointer swap, so
    those (and their data directories) are only reclaimed once older
    than ``orphan_grace_s`` (mtime) — the same age-gated orphan rule
    Delta's VACUUM applies to unreferenced files.  A crashed claim is
    reclaimed on the first vacuum after the grace window; a live writer
    inside the window is never broken.  Pass ``orphan_grace_s=0`` only
    when the caller guarantees no writer is running."""
    import shutil
    import time as _time

    latest = _latest_version(path)
    if latest is None:
        return {"data_dirs": 0, "manifests": 0}
    now = _time.time()
    zd = _zdir(path)
    # above-pointer manifests young enough to be an in-flight writer's
    # claim: keep them AND their data dirs untouched this pass
    inflight_dirs: set[str] = set()
    inflight_vs: set[int] = set()
    for f in os.listdir(zd):
        if not (f.startswith("v") and f.endswith(".json")):
            continue
        v = int(f[1:-5])
        if v > latest:
            mp = os.path.join(zd, f)
            if now - os.path.getmtime(mp) < orphan_grace_s:
                inflight_vs.add(v)
                try:
                    inflight_dirs |= _manifest_dirs(_load_manifest(path, v))
                except (ValueError, json.JSONDecodeError):
                    pass  # torn claim: dir stays only if age-protected below
    committed = zordered_versions(path)
    keep = [v for v in committed if v > latest - keep_last]
    live: set[str] = set()
    for v in keep:
        live |= _manifest_dirs(_load_manifest(path, v))
    # dirs referenced by ANY committed (below-pointer) manifest are
    # definitely not an in-flight writer's — their commit completed —
    # so retention reclaims them immediately; only UNREFERENCED dirs
    # (writer mid-write, before its claim) share the orphan age gate
    committed_refs: set[str] = set()
    for v in committed:
        committed_refs |= _manifest_dirs(_load_manifest(path, v))
    n_dirs = n_manifests = 0
    for d in os.listdir(path):
        if d.startswith("data-") and d not in live and d not in inflight_dirs:
            full = os.path.join(path, d)
            if d not in committed_refs and (
                now - os.path.getmtime(full) < orphan_grace_s
            ):
                continue
            shutil.rmtree(full, ignore_errors=True)
            n_dirs += 1
    for f in os.listdir(zd):
        if not (f.startswith("v") and f.endswith(".json")):
            continue
        v = int(f[1:-5])
        if (v > latest and v not in inflight_vs) or (
            v <= latest and v not in keep
        ):
            os.unlink(os.path.join(zd, f))
            n_manifests += 1
    return {"data_dirs": n_dirs, "manifests": n_manifests}
