"""Snapshot-manifest state tables: MVCC keyed state with atomic
multi-bucket commits (SURVEY.md §2.C "Sinks" — the transactional-format
answer the rename-swap layer in sinks.py only emulates per bucket).

The rename-aside protocol (sinks.upsert_batch) makes each BUCKET's swap
atomic, but a merge touching several buckets swaps them one rename at a
time: a reader listing the table mid-merge can see bucket 3 already new
while bucket 7 is still old (torn across buckets), and each swap has a
two-rename window where the bucket directory is briefly missing.  Crash
consistency is proven there; reader/writer ISOLATION is not.

This module is the other shape — the one Delta Lake / Apache Iceberg
standardized (reference semantics only; the code is original):

- **Immutable generation files.** A merge never renames data into place;
  it writes each touched bucket's full merged content as a NEW
  ``kb=<b>/gen-<commit>.parquet`` file and leaves every existing file
  untouched.
- **Manifests.** A commit writes ``_snap/v<N>.json`` mapping bucket ->
  current file list.  Commits record only their TOUCHED buckets plus a
  parent pointer (a delta manifest — commit cost O(touched), not
  O(n_buckets)); every ``checkpoint_interval``-th commit writes the full
  map so readers reconstruct by walking at most ``checkpoint_interval``
  manifests (the Delta-log checkpoint recipe).
- **Atomic pointer swap.** ``_snap/_latest`` names the current version
  and is the ONLY mutable file; an atomic replace of a one-line file
  commits every touched bucket at once.  The replace — and the
  put-if-absent manifest claim below — go through a pluggable
  CommitBackend (commitio.py): POSIX link/rename by default, a
  conditional-PUT contract for object stores; those two primitives are
  the layer's ENTIRE storage requirement.  Readers resolve the pointer once, then
  read an immutable file set: no torn state, no missing-directory window,
  and a snapshot stays collectable even while later merges land
  (pinned: tests/test_snapshots.py::test_reader_isolated_from_later_commits).
- **Exactly-once by construction.** The (run_id, epoch) applied markers
  live INSIDE the manifest, so marker and data commit in the same
  pointer swap — there is no crash point between them at all (the
  rename-swap layer needs per-bucket manifest files to approximate this).
- **Time travel + vacuum.** Any retained version is readable
  (``read_snapshot(version=...)``); ``vacuum_snapshots`` deletes
  generation files unreachable from the newest ``keep_last`` versions.

Scale notes: a delta manifest is O(touched buckets); the full checkpoint
is O(n_buckets) JSON (~50 B/bucket — a 10^5-bucket table checkpoints
~5 MB every ``checkpoint_interval`` commits, amortized away exactly as in
the production formats).  Many concurrent readers; concurrent WRITERS are
protected by optimistic concurrency (put-if-absent manifest claims via
SnapshotConflictError + retry-from-new-head — the same recipe Delta's
LogStore uses), so two independent jobs can never silently drop each
other's commits.  Reference provenance: the reference keeps caches as
in-process mutable maps (caches.clj:27-101) with no persistence story at
all; both sink layers are the engine's scale-out replacement.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamsum_spark import commitio

from streamsum_spark.sinks import (
    _MANIFEST_CAP,
    DELETED_COL,
    SALT_COL,
    _align_tombstones,
    _check_state_columns,
    _cheap_to_reevaluate,
    _distinct_kbs,
    _drop_deleted,
    _merge_salt_partials,
    _newest_wins,
    _resolve_bucket_cols,
    _with_kb,
)
from streamsum_spark.util import unpersist_checkpoint


def _ckpt_once(upd: DataFrame) -> tuple[DataFrame, DataFrame | None]:
    """Same single-evaluation trade as sinks.upsert_batch: the touched
    probe and the generation write would each evaluate the batch chain;
    a lazy checkpoint makes the probe's scan double as the
    materialization.  Returns (relation, handle-to-unpersist-or-None)."""
    if _cheap_to_reevaluate(upd):
        return upd, None
    ck = upd.localCheckpoint(eager=False)
    return ck, ck

_SNAP_DIR = "_snap"
_LATEST = "_latest"


class SnapshotConflictError(RuntimeError):
    """Another writer claimed the version this commit targeted.

    Raised from the atomic put-if-absent on the manifest file — the
    optimistic-concurrency check (the Delta/Iceberg recipe: a version
    number can be claimed exactly once).  The public merge entry points
    catch it and retry from a fresh head, so two interleaved writers
    both land (at consecutive versions) or the loser fails LOUDLY after
    its retries — a commit can never be silently dropped by a racing
    ``_latest`` replace."""


def _snap_dir(path: str) -> str:
    return os.path.join(path, _SNAP_DIR)


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(_snap_dir(path), f"v{version:08d}.json")


def _latest_version(path: str) -> int | None:
    """Resolve the pointer; None for a table with no commits yet."""
    ptr = os.path.join(_snap_dir(path), _LATEST)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as fh:
        return int(fh.read().strip())


def _min_version(path: str) -> int:
    """Oldest still-READABLE version: vacuum raises this watermark when
    it deletes generation files.  A manifest below it may remain on disk
    (a delta chain reconstructs through it) but its data files are gone —
    reads below the watermark refuse cleanly instead of surfacing a
    missing-file scan error."""
    p = os.path.join(_snap_dir(path), "_min_version")
    if not os.path.exists(p):
        return 1
    with open(p) as fh:
        return int(fh.read().strip())


def _load_manifest(path: str, version: int) -> dict:
    mpath = _manifest_path(path, version)
    if not os.path.exists(mpath):
        avail = snapshot_versions(path)
        raise ValueError(
            f"snapshot v{version} of {path} does not exist or was vacuumed; "
            f"retained versions: {avail}"
        )
    with open(mpath) as fh:
        return json.load(fh)


def _resolve_buckets(path: str, version: int) -> tuple[dict, dict[str, list[str]]]:
    """Walk the delta chain back to the nearest full manifest and return
    (head manifest, bucket -> file-name list).  Bounded by
    checkpoint_interval manifests per the commit protocol."""
    head = _load_manifest(path, version)
    chain = [head]
    m = head
    while not m["full"]:
        m = _load_manifest(path, m["parent"])
        chain.append(m)
    buckets: dict[str, list[str]] = {}
    for m in reversed(chain):  # oldest (full) first; later deltas override
        buckets.update(m["buckets"])
    return head, buckets


def snapshot_versions(path: str) -> list[int]:
    """Versions whose manifest file is still on disk (newest last).  An
    orphan manifest from a crashed commit (written but never pointed at)
    is excluded — it is not a committed version."""
    sdir = _snap_dir(path)
    if not os.path.isdir(sdir):
        return []
    latest = _latest_version(path)
    if latest is None:
        return []
    lo = _min_version(path)
    vs = sorted(
        int(f[1:-5])
        for f in os.listdir(sdir)
        if f.startswith("v") and f.endswith(".json") and not f.startswith("v_")
    )
    return [v for v in vs if lo <= v <= latest]


def _check_readable(path: str, version: int) -> None:
    lo = _min_version(path)
    if version < lo:
        raise ValueError(
            f"snapshot v{version} of {path} was vacuumed; retained "
            f"versions: {snapshot_versions(path)}"
        )


def read_snapshot(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a snapshot table at ``version`` (default: latest).  The file
    set is resolved from the manifest — never from directory listing — so
    the result is immutable: later commits cannot tear or change it, and
    an old version stays readable until vacuumed (time travel)."""
    if version is None:
        version = _latest_version(path)
        if version is None:
            raise ValueError(f"{path} has no committed snapshots")
    _check_readable(path, version)
    head, buckets = _resolve_buckets(path, version)
    files = [
        os.path.join(path, f"kb={b}", name)
        for b, names in buckets.items()
        for name in names
    ]
    if not files:
        # every key tombstoned: a typed empty relation via the manifest
        # schema (older manifests may predate the field — then refuse)
        if head.get("schema"):
            import json as _json

            from pyspark.sql import types as T

            schema = T.StructType.fromJson(_json.loads(head["schema"]))
            df = spark.createDataFrame([], schema).drop("kb")
        else:
            raise ValueError(f"snapshot v{version} of {path} is empty")
    else:
        df = spark.read.option("basePath", path).parquet(*files).drop("kb")
    if SALT_COL in df.columns:
        if not (head.get("n_salt") and head.get("sum_cols")):
            raise ValueError(
                f"snapshot v{version} of {path} has a {SALT_COL} column "
                "but its manifest lacks the salted-layout fields "
                "(n_salt/sum_cols) — cannot merge the partials"
            )
        df = _merge_salt_partials(df, head)
    return df


def _route_keys(
    spark: SparkSession,
    path: str,
    version: int,
    keys_df: DataFrame,
    resolved: tuple[dict, dict] | None = None,
) -> tuple[dict, dict, DataFrame | None, list]:
    """Shared routed-read body: resolve the manifest (or reuse a caller's
    ``resolved`` (head, buckets) to avoid re-reading the chain), cast the
    key DataFrame to the stored column types (Murmur3 hashes int and long
    differently), and return (head, buckets, keys_df_cast, files) where
    ``files`` is the routed buckets' generation-file list — or
    keys_df_cast None when the table holds no data files."""
    head, buckets = resolved if resolved is not None else _resolve_buckets(path, version)
    n_buckets, bcols = head["n_buckets"], head["bucket_cols"]
    missing = [c for c in bcols if c not in keys_df.columns]
    if missing:
        raise ValueError(
            f"keys are missing the table's bucket columns {missing} "
            f"(bucket_cols={bcols}); routing needs every bucket column"
        )
    first_b, first = next(
        ((b, names[0]) for b, names in buckets.items() if names), (None, None)
    )
    if first is None:
        return head, buckets, None, []
    stored_types = {
        f.name: f.dataType
        for f in spark.read.parquet(
            os.path.join(path, f"kb={first_b}", first)
        ).schema
    }
    keys_df = keys_df.select(
        *[
            F.col(c).cast(stored_types[c]).alias(c) if c in stored_types else F.col(c)
            for c in keys_df.columns
        ]
    )
    want = _with_kb(keys_df, bcols, n_buckets)
    touched = sorted({r.kb for r in want.select("kb").distinct().collect()})
    files = [
        os.path.join(path, f"kb={b}", name)
        for b in touched
        for name in buckets.get(str(b), [])
    ]
    return head, buckets, keys_df, files


def lookup_snapshot_keys(
    spark: SparkSession,
    path: str,
    key_cols: list[str],
    key_values: list[tuple],
    version: int | None = None,
) -> DataFrame:
    """Bucket-pruned point lookup against a snapshot: only the generation
    files of the buckets the requested keys hash into are opened (the
    manifest supplies the exact file list — no directory listing at all),
    with per-column key IN-filters pushed into the scan for row-group
    pruning inside a bucket, then the exact semi-join."""
    if version is None:
        version = _latest_version(path)
        if version is None:
            raise ValueError(f"{path} has no committed snapshots")
    _check_readable(path, version)
    keys_df = spark.createDataFrame(
        [tuple(v) if isinstance(v, (tuple, list)) else (v,) for v in key_values],
        key_cols,
    )
    head, buckets = _resolve_buckets(path, version)
    n_salt = head.get("n_salt")
    if n_salt:
        # salted additive table: route each key to ALL its n_salt
        # candidate buckets (bounded expansion), merge partials below
        salts = spark.createDataFrame([(s,) for s in range(n_salt)], f"{SALT_COL} int")
        keys_df = keys_df.crossJoin(salts)
    _, _, keys_cast, files = _route_keys(
        spark, path, version, keys_df, resolved=(head, buckets)
    )
    if keys_cast is None or not files:
        return read_snapshot(spark, path, version).limit(0)
    pruned = spark.read.option("basePath", path).parquet(*files).drop("kb")
    if 0 < len(key_values) <= 1000:
        # one parsed SQL IN per column — isin() costs a py4j round trip
        # per literal (see sinks.lookup_state_keys)
        from streamsum_spark.util import _in_set_pred

        rows = keys_cast.collect()
        for c in key_cols:
            vals = {r[c] for r in rows}
            vals.discard(None)
            if not vals:
                continue
            pred = _in_set_pred(c, vals)
            pruned = pruned.where(
                pred if pred is not None else F.col(c).isin(list(vals))
            )
    out = pruned.join(
        F.broadcast(keys_cast.drop(SALT_COL) if n_salt else keys_cast),
        on=key_cols,
        how="left_semi",
    )
    if n_salt:
        out = _merge_salt_partials(out, head)
    return out


def read_touched_snapshot_buckets(
    spark: SparkSession, path: str, keys_df: DataFrame, version: int | None = None
) -> DataFrame:
    """Distributed routed read — the snapshot sibling of
    sinks.read_touched_buckets: open ONLY the generation files of the
    buckets ``keys_df``'s rows hash into (per the manifest: no directory
    listing, no torn state while a writer commits).  Only bucket IDs are
    collected (bounded by n_buckets); the key rows never leave the
    cluster.  ``keys_df`` must carry the table's bucket columns."""
    if version is None:
        version = _latest_version(path)
        if version is None:
            raise ValueError(f"{path} has no committed snapshots")
    _check_readable(path, version)
    _, _, keys_cast, files = _route_keys(spark, path, version, keys_df)
    if keys_cast is None or not files:
        return read_snapshot(spark, path, version).limit(0)
    return spark.read.option("basePath", path).parquet(*files).drop("kb")


def _commit(
    spark: SparkSession,
    path: str,
    merged_writer,
    touched: list[int],
    head: dict | None,
    buckets: dict[str, list[str]],
    n_buckets: int,
    bcols: list[str],
    marker: str | None,
    checkpoint_interval: int,
    changes: DataFrame | None = None,
    schema_json: str | None = None,
    force_full: bool = False,
    extra_fields: dict | None = None,
) -> None:
    """Shared commit body: materialize touched buckets' new generation
    files (plus the optional change-feed file), then commit them all in
    ONE pointer swap."""
    commit_id = uuid.uuid4().hex[:12]
    tmp = os.path.join(path, f"._commit-{commit_id}")
    merged_writer(tmp)
    changes_name = None
    if changes is not None:
        ctmp = os.path.join(path, f"._changes-{commit_id}")
        changes.coalesce(1).write.mode("overwrite").parquet(ctmp)
        part = next(f for f in os.listdir(ctmp) if f.endswith(".parquet"))
        os.makedirs(os.path.join(path, "_changes"), exist_ok=True)
        changes_name = f"ch-{commit_id}.parquet"
        os.rename(
            os.path.join(ctmp, part), os.path.join(path, "_changes", changes_name)
        )
        shutil.rmtree(ctmp, ignore_errors=True)
    new_entries: dict[str, list[str]] = {}
    for b in touched:
        src = os.path.join(tmp, f"kb={b}")
        names = (
            sorted(f for f in os.listdir(src) if f.endswith(".parquet"))
            if os.path.isdir(src)
            else []
        )
        bdir = os.path.join(path, f"kb={b}")
        os.makedirs(bdir, exist_ok=True)
        gen_names = []
        for i, name in enumerate(names):
            gen = f"gen-{commit_id}-{i:04d}.parquet"
            os.rename(os.path.join(src, name), os.path.join(bdir, gen))
            gen_names.append(gen)
        new_entries[str(b)] = gen_names
    shutil.rmtree(tmp, ignore_errors=True)

    version = (head["version"] + 1) if head is not None else 1
    applied = list(head["applied"]) if head is not None else []
    if marker is not None:
        applied = (applied + [marker])[-_MANIFEST_CAP:]
    full = force_full or head is None or (version % checkpoint_interval == 0)
    # cdc_offsets (sync_from_changes' contiguous consumer offsets) and
    # the salted-layout fields must survive UNRELATED commits (rebucket,
    # other writers), so the head's values carry forward unless this
    # commit overrides them
    carried = {
        k: head[k]
        for k in ("cdc_offsets", "n_salt", "sum_cols", "combine")
        if head is not None and k in head
    }
    if extra_fields and "cdc_offsets" in extra_fields:
        # offsets only ever ADVANCE, so merge per-consumer with max:
        # a sync holding a stale snapshot of the map (loaded before a
        # concurrent sync from another source advanced, or re-run after
        # a conflict retry) must never regress that consumer's offset
        merged = {**carried.get("cdc_offsets", {})}
        for rid, v in extra_fields["cdc_offsets"].items():
            merged[rid] = max(int(v), int(merged.get(rid, 0)))
        extra_fields = {**extra_fields, "cdc_offsets": merged}
    manifest = {
        "version": version,
        "parent": head["version"] if head is not None else None,
        "full": full,
        "n_buckets": n_buckets,
        "bucket_cols": bcols,
        "applied": applied,
        "changes": changes_name,
        "schema": schema_json,
        **carried,
        **(extra_fields or {}),
        "buckets": ({**buckets, **new_entries} if full else new_entries),
    }
    os.makedirs(_snap_dir(path), exist_ok=True)
    mtmp = os.path.join(_snap_dir(path), f"._v-{commit_id}.json")
    with open(mtmp, "w") as fh:
        json.dump(manifest, fh)
    _claim_manifest(mtmp, _manifest_path(path, version), marker)
    ptmp = os.path.join(_snap_dir(path), f"._ptr-{commit_id}")
    with open(ptmp, "w") as fh:
        fh.write(str(version))
    commitio.get_backend().replace(
        ptmp, os.path.join(_snap_dir(path), _LATEST)
    )  # THE commit


def _claim_manifest(mtmp: str, final: str, marker: str | None) -> None:
    """Atomically claim manifest version ``final`` (put-if-absent via
    the commit backend — POSIX hard link by default, a conditional PUT
    on object stores; see commitio.py for the exact storage contract).
    A manifest already at that version means one of two things:

    - our OWN crashed attempt's orphan (same exactly-once marker: the
      commit was staged but the pointer swap never ran) — replaying the
      epoch over it is idempotent, so overwrite is safe;
    - ANY other writer (different marker, or no marker to compare) —
      refuse with SnapshotConflictError so the caller re-reads the head
      and retries at the next version, instead of two writers silently
      racing the ``_latest`` replace."""
    if commitio.get_backend().put_if_absent(mtmp, final):
        return
    try:
        with open(final) as fh:
            orphan = json.load(fh)
        orphan_marker = (orphan.get("applied") or [None])[-1]
    except (json.JSONDecodeError, OSError):
        orphan_marker = None
    if marker is not None and orphan_marker == marker:
        # own crashed replay: safe overwrite
        commitio.get_backend().replace(mtmp, final)
        return
    os.unlink(mtmp)
    # distinguish the two refusal cases for the operator: a manifest at
    # a version the _latest pointer already covers means a concurrent
    # writer COMMITTED (pointer swapped) — retry-from-head self-heals;
    # a manifest ABOVE the pointer is claimed-but-unswapped: either an
    # in-flight writer about to swap (retry succeeds once it does) or a
    # crashed markerless writer's orphan that wedges every retry.  The
    # two are indistinguishable without a lease (a "stale" claim may
    # just be a slow writer whose swap would be silently lost if we
    # reclaimed), so recovery from the crashed case is explicit:
    # stop writers, run vacuum_snapshots(path) (it deletes manifests
    # above the pointer), resume.  Marker-bearing writers self-heal by
    # overwriting their OWN orphan above.
    sdir = os.path.dirname(final)
    try:
        with open(os.path.join(sdir, _LATEST)) as fh:
            ptr = int(fh.read().strip())
    except (OSError, ValueError):
        ptr = 0
    claimed_v = int(os.path.basename(final)[1:-5])
    if claimed_v > ptr:
        raise SnapshotConflictError(
            f"{final} is claimed but not committed (_latest={ptr}): a "
            "concurrent writer is mid-commit (retrying from the head "
            "succeeds once it swaps the pointer), or a crashed "
            "markerless writer left an orphan that wedges every retry "
            "at this version. If conflicts persist with no writer "
            "running: stop all writers, run vacuum_snapshots(path) to "
            "delete the orphan, then resume."
        )
    raise SnapshotConflictError(
        f"{final} already exists: another writer committed this version "
        "concurrently — retrying from the new head"
    )


def _begin(
    spark: SparkSession,
    path: str,
    key_cols: list[str],
    n_buckets: int,
    bucket_cols: list[str] | None,
    marker: str | None,
    n_salt: int | None = None,
):
    """Open a commit: load the head manifest, enforce layout invariants,
    and short-circuit a replayed epoch.  Returns (head, buckets, bcols)
    or None when the marker is already applied."""
    bcols = _resolve_bucket_cols(key_cols, bucket_cols)
    latest = _latest_version(path)
    if latest is None:
        return None, {}, bcols
    head, buckets = _resolve_buckets(path, latest)
    if head["n_buckets"] != n_buckets:
        raise ValueError(
            f"{path} was created with n_buckets={head['n_buckets']}; "
            f"committing with n_buckets={n_buckets} would scatter keys "
            "across mismatched buckets"
        )
    if head.get("n_salt") != n_salt:
        # diagnosed BEFORE bucket_cols: a salt mismatch also perturbs
        # bucket_cols (the salt is one of them) and the root cause is
        # the salt — this also refuses newest-wins upserts into a
        # salted additive table (they do not compose with partials)
        raise ValueError(
            f"{path} was created with n_salt={head.get('n_salt')}; "
            f"committing with n_salt={n_salt} would route a key's salted "
            "partials to different buckets (accumulate with the table's "
            "n_salt, or rewrite the table to change it)"
        )
    if head["bucket_cols"] != bcols:
        raise ValueError(
            f"{path} was created with bucket_cols={head['bucket_cols']}; "
            f"committing with bucket_cols={bcols} would route keys to "
            "different buckets"
        )
    if marker is not None and marker in head["applied"]:
        return "replay", buckets, bcols
    return head, buckets, bcols


def _peek_columns(
    spark: SparkSession, path: str, buckets: dict, head: dict | None = None
) -> list | None:
    """Table columns for the drift guard (against the TABLE, even when
    the batch routes only to untouched or new buckets): from the head
    manifest's recorded schema when present (zero Spark jobs), else one
    generation-file footer read; None for an empty table."""
    if head is not None and head.get("schema"):
        schema = json.loads(head["schema"])
        return [f["name"] for f in schema["fields"]]
    first_b, first = next(
        ((b, names[0]) for b, names in buckets.items() if names), (None, None)
    )
    if first is None:
        return None
    return spark.read.parquet(os.path.join(path, f"kb={first_b}", first)).columns


def _touched_stored(
    spark: SparkSession,
    path: str,
    upd: DataFrame,
    buckets: dict[str, list[str]],
) -> tuple[list[int], DataFrame | None]:
    touched = _distinct_kbs(upd)
    files = [
        os.path.join(path, f"kb={b}", name)
        for b in touched
        for name in buckets.get(str(b), [])
    ]
    stored = (
        spark.read.option("basePath", path).parquet(*files) if files else None
    )
    return touched, stored


def _bucket_writer(reduced: DataFrame, key_cols: list[str]):
    """One key-sorted file per touched bucket (row-group stats pruning +
    bounded file count, same layout contract as sinks._merge_buckets)."""

    def write(tmp: str) -> None:
        (
            reduced.repartition("kb")
            .sortWithinPartitions("kb", *key_cols)
            .write.mode("overwrite")
            .partitionBy("kb")
            .parquet(tmp)
        )

    return write


def _retry_conflicts(fn, retries: int):
    """Run a commit attempt up to ``1 + retries`` times: every
    SnapshotConflictError re-reads the head inside ``fn`` (via _begin),
    so the retry merges against the RACING WRITER'S committed state and
    lands at the next version — optimistic concurrency, Delta-style.
    The final conflict propagates loudly."""
    for attempt in range(retries + 1):
        try:
            return fn()
        except SnapshotConflictError:
            if attempt == retries:
                raise


def snapshot_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    order_col: str | list[str],
    n_buckets: int = 16,
    bucket_cols: list[str] | None = None,
    epoch_id: int | None = None,
    run_id: str | None = None,
    checkpoint_interval: int = 10,
    change_feed: bool = False,
    retries: int = 2,
    extra_fields: dict | None = None,
) -> None:
    """Newest-wins MERGE into a snapshot table: read ONLY the touched
    buckets' current generation files, reduce per key (same semantics as
    sinks.upsert_batch — max_by on the order key with deterministic value
    tie-breaks), write new generation files, commit all touched buckets
    in one pointer swap.  Per-commit cost is O(|batch| + touched-bucket
    rows) — identical to the bucketed rename-swap merge — but the commit
    is atomic ACROSS buckets and never disturbs a running reader.
    Version claims are put-if-absent (optimistic concurrency): a racing
    writer costs a retry from the new head, never a lost commit.

    ``change_feed=True`` additionally records this commit's POST-image
    (the winning row for every key the batch touched) in a per-version
    ``_changes/`` file referenced by the manifest — a change-data feed
    at O(batch) extra cost, so downstream incremental consumers read
    per-version deltas (snapshot_changes) instead of diffing snapshots."""
    _retry_conflicts(
        lambda: _snapshot_upsert_once(
            spark, path, updates, key_cols, order_col, n_buckets,
            bucket_cols, epoch_id, run_id, checkpoint_interval,
            change_feed, extra_fields,
        ),
        retries,
    )


def _snapshot_upsert_once(
    spark, path, updates, key_cols, order_col, n_buckets, bucket_cols,
    epoch_id, run_id, checkpoint_interval, change_feed, extra_fields,
) -> None:
    marker = None if epoch_id is None else f"{run_id or ''}:{epoch_id}"
    head, buckets, bcols = _begin(
        spark, path, key_cols, n_buckets, bucket_cols, marker
    )
    if head == "replay":
        return
    upd = _with_kb(updates, bcols, n_buckets)
    tbl_cols = _peek_columns(spark, path, buckets, head if head != "replay" else None)
    if tbl_cols is not None:
        _check_state_columns(tbl_cols, upd.columns, path)
    upd, ck = _ckpt_once(upd)
    try:
        touched, stored = _touched_stored(spark, path, upd, buckets)
        if not touched:
            return
        stored, has_del = _align_tombstones(stored, upd)
        merged = stored.unionByName(upd) if stored is not None else upd
        reduced = _newest_wins(merged, key_cols, order_col)
        changes = None
        if change_feed:
            reduced = reduced.localCheckpoint()  # reuse one materialization
            # the feed records winners for every batch key INCLUDING
            # deletes (with the tombstone marker), so a consumer can
            # apply removals
            changes = reduced.drop("kb").join(
                upd.select(*key_cols).distinct(), key_cols, "left_semi"
            )
            if not has_del:
                changes = changes.withColumn(DELETED_COL, F.lit(False))
        reduced = _drop_deleted(reduced, has_del)
        _commit(
            spark, path, _bucket_writer(reduced, key_cols), touched, head,
            buckets, n_buckets, bcols, marker, checkpoint_interval,
            changes=changes, schema_json=reduced.schema.json(),
            extra_fields=extra_fields,
        )
    finally:
        if ck is not None:
            unpersist_checkpoint(ck)


def snapshot_accumulate(
    spark: SparkSession,
    path: str,
    deltas: DataFrame,
    key_cols: list[str],
    sum_cols: list[str],
    combine: str = "sum",
    n_buckets: int = 16,
    bucket_cols: list[str] | None = None,
    epoch_id: int | None = None,
    run_id: str | None = None,
    checkpoint_interval: int = 10,
    change_feed: bool = False,
    retries: int = 2,
    n_salt: int | None = None,
) -> None:
    """Additive MERGE into a snapshot table (sum/min/max/bit_or per key,
    like sinks.accumulate_batch).  SUM-merge is not idempotent, so the
    (run_id, epoch) marker matters most here — and the snapshot layout
    makes it airtight: the marker is part of the manifest the pointer
    swap commits, so there is NO crash point between data and marker
    (the rename-swap layer approximates this with per-bucket manifest
    files; here it holds by construction).  Version claims are
    put-if-absent, as in snapshot_upsert.

    ``n_salt`` is the same hot-key skew treatment as
    sinks.accumulate_batch: the key widens with a partition-derived
    salt so a celebrity key's additive partials spread across up to
    n_salt buckets; the manifest records (n_salt, sum_cols, combine)
    and the salt-aware reads (read_snapshot, lookup_snapshot_keys)
    merge the partials back — the logical table is unchanged.

    ``change_feed`` composes with ``n_salt``: the feed records each
    batch key's MERGED post-image (partials combined across every salt
    variant, including those in buckets this commit didn't touch),
    never per-salt partials — a downstream consumer sees exactly the
    rows an unsalted twin would emit, pinned in tests/test_snapshots.py."""
    _retry_conflicts(
        lambda: _snapshot_accumulate_once(
            spark, path, deltas, key_cols, sum_cols, combine, n_buckets,
            bucket_cols, epoch_id, run_id, checkpoint_interval, change_feed,
            n_salt,
        ),
        retries,
    )


def _snapshot_accumulate_once(
    spark, path, deltas, key_cols, sum_cols, combine, n_buckets,
    bucket_cols, epoch_id, run_id, checkpoint_interval, change_feed,
    n_salt=None,
) -> None:
    agg_fn = {"sum": F.sum, "min": F.min, "max": F.max, "bit_or": F.bit_or}[combine]
    marker = None if epoch_id is None else f"{run_id or ''}:{epoch_id}"
    okeys = list(key_cols)
    if n_salt is not None:
        # deterministic per-row salt (content + epoch marker), same
        # contract as sinks.accumulate_batch: replays and the
        # touched-collect/write double evaluation must route identically
        deltas = deltas.withColumn(
            SALT_COL,
            F.pmod(
                F.xxhash64(F.lit(marker or ""), *deltas.columns), F.lit(n_salt)
            ).cast("int"),
        )
        key_cols = list(key_cols) + [SALT_COL]
        if bucket_cols is not None:
            bucket_cols = list(bucket_cols) + [SALT_COL]
    head, buckets, bcols = _begin(
        spark, path, key_cols, n_buckets, bucket_cols, marker, n_salt=n_salt
    )
    if head == "replay":
        return
    upd = _with_kb(deltas, bcols, n_buckets)
    tbl_cols = _peek_columns(spark, path, buckets, head if head != "replay" else None)
    if tbl_cols is not None:
        _check_state_columns(tbl_cols, upd.columns, path)
    upd, _up_ck = _ckpt_once(upd)
    touched, stored = _touched_stored(spark, path, upd, buckets)
    if not touched:
        if _up_ck is not None:
            unpersist_checkpoint(_up_ck)
        return
    merged = stored.unionByName(upd) if stored is not None else upd
    reduced = merged.groupBy("kb", *key_cols).agg(
        *[agg_fn(c).cast("long").alias(c) for c in sum_cols]
    )
    changes = None
    if change_feed:
        reduced = reduced.localCheckpoint()
        if n_salt is None:
            changes = reduced.drop("kb").join(
                upd.select(*key_cols).distinct(), key_cols, "left_semi"
            )
        else:
            # a salted table's feed must record the key's MERGED value,
            # never per-salt partials (a non-salt-aware consumer would
            # keep one arbitrary partial as the post-image).  The commit
            # already holds the new partials for the TOUCHED buckets in
            # ``reduced``; a batch key's other partials (earlier epochs'
            # salts routed elsewhere) sit in UNtouched buckets of the
            # still-current head — enumerate each batch key's n_salt
            # variants, route them, read only those extra buckets, and
            # combine.  Cost: O(batch keys x n_salt) routing rows plus
            # at most n_salt extra bucket reads — the same bound as a
            # salt-aware lookup, and the driver sees only bucket IDs.
            bkeys = upd.select(*okeys).distinct()
            variants = bkeys.crossJoin(
                spark.range(n_salt).select(F.col("id").cast("int").alias(SALT_COL))
            )
            t_set = set(touched)
            other_ids = sorted(
                r.kb
                for r in _with_kb(variants, bcols, n_buckets)
                .select("kb").distinct().collect()
                if r.kb not in t_set
            )
            files = [
                os.path.join(path, f"kb={b}", name)
                for b in other_ids
                for name in buckets.get(str(b), [])
            ]
            allp = reduced.drop("kb").join(bkeys, okeys, "left_semi").select(
                *okeys, *sum_cols
            )
            if files:
                old_part = (
                    spark.read.option("basePath", path).parquet(*files)
                    .join(bkeys, okeys, "left_semi")
                    .select(*okeys, *sum_cols)
                )
                allp = allp.unionByName(old_part)
            changes = allp.groupBy(*okeys).agg(
                *[agg_fn(c).cast("long").alias(c) for c in sum_cols]
            )
    try:
        _commit(
            spark, path, _bucket_writer(reduced, key_cols), touched, head,
            buckets, n_buckets, bcols, marker, checkpoint_interval,
            changes=changes,
            extra_fields=(
                {"n_salt": n_salt, "sum_cols": list(sum_cols),
                 "combine": combine}
                if n_salt is not None
                else None
            ),
        )
    finally:
        if _up_ck is not None:
            unpersist_checkpoint(_up_ck)


def snapshot_changes(
    spark: SparkSession, path: str, from_version: int, to_version: int | None = None
) -> DataFrame:
    """Change-data feed: the per-commit POST-image rows for every version
    in (from_version, to_version] — what a downstream incremental
    consumer reads instead of diffing whole snapshots.  Requires the
    writer to have committed with ``change_feed=True``; a version in
    range without a recorded change file (feed off, or vacuumed) refuses
    loudly rather than silently skipping a delta.  Each row carries its
    ``_version``."""
    latest = _latest_version(path)
    if latest is None:
        raise ValueError(f"{path} has no committed snapshots")
    if to_version is None:
        to_version = latest
    lo = _min_version(path)
    frames = []
    for v in range(from_version + 1, to_version + 1):
        if v < lo:
            raise ValueError(
                f"changes for v{v} of {path} were vacuumed (min readable "
                f"version is {lo}); re-seed the consumer from a full "
                "snapshot read"
            )
        m = _load_manifest(path, v)
        if m.get("no_data_change"):
            continue  # layout-only commit (rebucket): no delta to emit
        name = m.get("changes")
        if name is None:
            raise ValueError(
                f"snapshot v{v} of {path} has no change file (commit ran "
                "without change_feed=True, or it was vacuumed)"
            )
        f = os.path.join(path, "_changes", name)
        if not os.path.exists(f):
            raise ValueError(
                f"change file for v{v} of {path} was vacuumed; re-seed the "
                "consumer from a full snapshot read"
            )
        frames.append(
            spark.read.parquet(f).withColumn("_version", F.lit(v))
        )
    if not frames:
        return read_snapshot(spark, path, latest).limit(0).withColumn(
            "_version", F.lit(0)
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out


def vacuum_snapshots(path: str, keep_last: int = 2) -> dict:
    """Delete generation files unreachable from the newest ``keep_last``
    versions, plus manifests no retained version's delta chain needs, plus
    crash litter (orphan manifests/pointers/commit tmps never committed).
    Single-writer context: run from the writer (between commits), never
    concurrently with one — a commit in flight has generation files on
    disk that no manifest references yet.

    Returns counts for observability: {"files": n, "manifests": n}."""
    latest = _latest_version(path)
    if latest is None:
        return {"files": 0, "manifests": 0}
    versions = snapshot_versions(path)
    retained = versions[-keep_last:]
    # raise the readability watermark FIRST (os.replace-atomic): a crash
    # between watermark and deletions leaves some versions refusing
    # early, never a version whose scan hits missing files
    if retained and retained[0] > _min_version(path):
        wtmp = os.path.join(_snap_dir(path), f"._minv-{uuid.uuid4().hex[:8]}")
        with open(wtmp, "w") as fh:
            fh.write(str(retained[0]))
        commitio.get_backend().replace(
            wtmp, os.path.join(_snap_dir(path), "_min_version")
        )
    needed_files: set[str] = set()
    needed_manifests: set[int] = set()
    for v in retained:
        m = _load_manifest(path, v)
        needed_manifests.add(v)
        while not m["full"]:
            m = _load_manifest(path, m["parent"])
            needed_manifests.add(m["version"])
        _, buckets = _resolve_buckets(path, v)
        for b, names in buckets.items():
            for name in names:
                needed_files.add(os.path.join(f"kb={b}", name))
    # change files below the readability watermark are reclaimed even
    # when their manifest survives for delta-chain reconstruction — the
    # feed refuses below the watermark, so nothing can still read them
    needed_changes = set()
    watermark = retained[0] if retained else 0
    for v in needed_manifests:
        if v < watermark:
            continue
        name = _load_manifest(path, v).get("changes")
        if name:
            needed_changes.add(name)
    n_files = 0
    for d in os.listdir(path):
        full_d = os.path.join(path, d)
        if d.startswith("._commit-") or d.startswith("._changes-"):
            shutil.rmtree(full_d, ignore_errors=True)
            continue
        if d == "_changes":
            for f in os.listdir(full_d):
                if f not in needed_changes:
                    os.remove(os.path.join(full_d, f))
                    n_files += 1
            continue
        if not d.startswith("kb="):
            continue
        for f in os.listdir(full_d):
            if os.path.join(d, f) not in needed_files:
                os.remove(os.path.join(full_d, f))
                n_files += 1
    n_manifests = 0
    sdir = _snap_dir(path)
    for f in os.listdir(sdir):
        if f.startswith("._"):  # crashed commit's tmp manifest/pointer
            os.remove(os.path.join(sdir, f))
            continue
        if f.startswith("v") and f.endswith(".json"):
            v = int(f[1:-5])
            # v > latest is an orphan from a crashed commit (manifest
            # written, pointer swap never ran) — litter, not a version
            if v not in needed_manifests:
                os.remove(os.path.join(sdir, f))
                n_manifests += 1
    return {"files": n_files, "manifests": n_manifests}


def stream_upsert_snapshot(
    df: DataFrame,
    path: str,
    key_cols: list[str],
    order_col: str | list[str],
    n_buckets: int = 16,
    bucket_cols: list[str] | None = None,
) -> None:
    """Run an append stream into a snapshot table via foreachBatch —
    the streaming face of snapshot_upsert, exactly-once through the
    in-manifest (run_id, epoch) markers."""
    import tempfile

    spark = df.sparkSession
    ckpt = os.path.join(
        tempfile.gettempdir(), f"streamsum_snap_ckpt_{uuid.uuid4().hex[:10]}"
    )
    run_id = uuid.uuid4().hex

    def merge(batch_df: DataFrame, epoch_id: int) -> None:
        snapshot_upsert(
            spark, path, batch_df, key_cols, order_col,
            n_buckets=n_buckets, bucket_cols=bucket_cols,
            epoch_id=epoch_id, run_id=run_id,
        )

    q = (
        df.writeStream.foreachBatch(merge)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def rebucket_snapshot_table(
    spark: SparkSession, path: str, new_n_buckets: int,
    checkpoint_interval: int = 10,
) -> None:
    """Change a snapshot table's bucket count — and here the rewrite is
    just another COMMIT: every bucket's rows re-hash into new generation
    files and a full manifest lands in one pointer swap.  Unlike the
    rename-swap layer's whole-table swap, readers pinned on any prior
    version keep working (their generation files are untouched until
    vacuum), there is no quiesced-crash-litter precondition to enforce —
    the applied-markers ride inside the manifest, so an interrupted
    rebucket simply never commits — and a crash at any point leaves the
    old version intact."""
    latest = _latest_version(path)
    if latest is None:
        raise ValueError(f"{path} has no committed snapshots")
    head, buckets_map = _resolve_buckets(path, latest)
    bcols = head["bucket_cols"]
    # RAW rows, not read_snapshot: a salted table's read merges the salt
    # partials away, but the rewrite must re-route the partials
    # themselves (the salt is one of the bucket columns)
    files = [
        os.path.join(path, f"kb={b}", name)
        for b, names in buckets_map.items()
        for name in names
    ]
    if not files:
        raise ValueError(
            f"cannot rebucket {path}: snapshot v{latest} has no data files "
            "(every key tombstoned) — write into a fresh table instead"
        )
    raw = spark.read.option("basePath", path).parquet(*files).drop("kb")
    rekeyed = _with_kb(raw, bcols, new_n_buckets)
    touched = sorted(r.kb for r in rekeyed.select("kb").distinct().collect())
    _commit(
        spark, path, _bucket_writer(rekeyed, bcols), touched, head,
        {},  # the bucket map changes wholesale: only new entries survive
        new_n_buckets, bcols, marker=None, checkpoint_interval=1,
        schema_json=rekeyed.schema.json(), force_full=True,
        extra_fields={"no_data_change": True},  # layout-only commit: the
        # change feed skips this version instead of refusing
    )


def sync_from_changes(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    key_cols: list[str],
    n_buckets: int = 16,
    bucket_cols: list[str] | None = None,
) -> int:
    """Incremental downstream materialization — the consumer side of the
    change feed: apply every unapplied source version's post-image rows
    (including tombstones) to ``dst_path``, one snapshot commit per
    source version, ordered by the feed's ``_version`` column.

    The consumer offset is PERSISTED in the destination's manifest
    (``cdc_offsets``: run_id -> max contiguously-applied source
    version) and the walk starts there — never from v1.  The capped
    ``applied`` marker list alone cannot carry this: past
    _MANIFEST_CAP synced versions, evicted markers would make old
    versions look unapplied, re-walk O(all versions) per sync,
    resurrect keys a later tombstone deleted (the re-applied old
    post-image wins newest-wins against a row that no longer exists),
    and wedge permanently once an old source manifest is vacuumed.
    Markers still back up the offset within the cap window, and each
    applied version commits under ``cdc:<src>:<v>`` so a crashed or
    re-run sync replays into no-ops; snapshot_changes refuses vacuumed
    gaps with the re-seed message.  Returns the number of versions
    applied this call.

    At scale this is how a derived table (a serving copy, a filtered
    projection, an aggregate) follows a 100 TB state table for O(delta)
    per sync instead of O(table) recomputes."""
    latest = _latest_version(src_path)
    if latest is None:
        return 0
    run_id = f"cdc:{os.path.abspath(src_path)}"
    applied: set[str] = set()
    offsets: dict[str, int] = {}
    dst_latest = _latest_version(dst_path)
    if dst_latest is not None:
        dst_head = _load_manifest(dst_path, dst_latest)
        applied = set(dst_head["applied"])
        offsets = dict(dst_head.get("cdc_offsets") or {})
    start = int(offsets.get(run_id, 0))
    # legacy seed: a destination synced BEFORE cdc_offsets existed
    # carries only markers, and past _MANIFEST_CAP applied versions the
    # evicted ones would look unapplied and be RE-applied (resurrecting
    # keys a later tombstone deleted).  The walk is ordered, so the
    # HIGHEST applied marker for this source proves every lower version
    # was applied or skipped in an earlier sync — seed the offset there.
    prefix = f"{run_id}:"
    marker_vs = [
        int(m[len(prefix):])
        for m in applied
        if m.startswith(prefix) and m[len(prefix):].isdigit()
    ]
    if marker_vs:
        start = max(start, max(marker_vs))
    persisted = int(offsets.get(run_id, 0))
    n = 0
    for v in range(start + 1, latest + 1):
        # the walk is in order, so by the time v commits every version
        # below it was applied (now or earlier) or carried no data —
        # v IS the new contiguous offset
        if (
            f"{run_id}:{v}" in applied
            or _load_manifest(src_path, v).get("no_data_change")
        ):
            continue
        delta = snapshot_changes(spark, src_path, from_version=v - 1, to_version=v)
        snapshot_upsert(
            spark, dst_path, delta, key_cols, "_version",
            n_buckets=n_buckets, bucket_cols=bucket_cols,
            epoch_id=v, run_id=run_id,
            extra_fields={"cdc_offsets": {**offsets, run_id: v}},
        )
        persisted = v
        n += 1
    if latest > persisted and _latest_version(dst_path) is not None:
        # every version in (persisted, latest] was SKIPPED (layout-only
        # no_data_change commits, marker-applied versions, or the legacy
        # seed above) — no upsert carried the offset forward, so without
        # this a caught-up sync re-reads every source manifest above the
        # stored offset on each call (and a legacy destination re-seeds
        # from the marker scan forever).  Persist offset=latest with a
        # data-free commit.
        try:
            _retry_conflicts(
                lambda: _advance_cdc_offsets_once(
                    spark, dst_path, {run_id: latest}
                ),
                2,
            )
        except SnapshotConflictError:
            pass  # pure optimization: the next sync re-derives and retries
    return n


def _advance_cdc_offsets_once(
    spark: SparkSession, dst_path: str, offsets: dict[str, int]
) -> None:
    """Persist advanced consumer offsets with a DATA-FREE commit: no
    generation files move (touched=[]), the head's layout and offsets
    carry forward (_commit merges cdc_offsets per-consumer with max, so
    a concurrent sync from another source never regresses), and the
    commit is marked ``no_data_change`` so this destination's own change
    feed and downstream syncs skip the version.

    The commit CARRIES A MARKER — deterministic in the offsets it
    persists — even though it moves no data: this runs automatically on
    every caught-up sync, and a markerless commit that crashes between
    the manifest claim and the pointer swap leaves an orphan no retry
    can overwrite, wedging EVERY writer on the destination until a
    manual stop-writers/vacuum.  With the marker, the retry (and any
    later sync re-deriving the same advance) recognizes its own orphan
    and overwrites it — the same self-heal path every data-bearing
    writer uses.  The marker encodes the TARGET offsets (not a version),
    so a later advance to a higher offset is a NEW marker (the
    already-applied skip must not swallow it), while a replay of the
    same advance is skipped or safely overwritten.  The legacy
    offset-seed scan only parses ``run:<digits>`` markers, so
    ``:adv:``-markers never masquerade as applied source versions."""
    latest = _latest_version(dst_path)
    if latest is None:
        return
    head, buckets = _resolve_buckets(dst_path, latest)
    marker = "adv:" + ",".join(
        f"{rid}:adv:{off}" for rid, off in sorted(offsets.items())
    )
    _commit(
        spark, dst_path, lambda tmp: os.makedirs(tmp, exist_ok=True), [],
        head, buckets, head["n_buckets"], head["bucket_cols"],
        marker=marker, checkpoint_interval=10,
        schema_json=head.get("schema"),
        extra_fields={"cdc_offsets": offsets, "no_data_change": True},
    )


def stream_accumulate_snapshot(
    df: DataFrame,
    path: str,
    key_cols: list[str],
    sum_cols: list[str],
    pre_agg,
    combine: str = "sum",
    n_buckets: int = 16,
    bucket_cols: list[str] | None = None,
) -> None:
    """Additive streaming sink on the snapshot layer — the MVCC twin of
    sinks.stream_accumulate_counts: ``pre_agg`` turns each micro-batch
    into per-key deltas, snapshot_accumulate folds them in with the
    in-manifest exactly-once markers, and concurrent readers of the
    accumulating table are never torn mid-merge."""
    import tempfile

    spark = df.sparkSession
    ckpt = os.path.join(
        tempfile.gettempdir(), f"streamsum_snapacc_ckpt_{uuid.uuid4().hex[:10]}"
    )
    run_id = uuid.uuid4().hex

    def merge(batch_df: DataFrame, epoch_id: int) -> None:
        snapshot_accumulate(
            spark, path, pre_agg(batch_df), key_cols, sum_cols, combine,
            n_buckets=n_buckets, bucket_cols=bucket_cols,
            epoch_id=epoch_id, run_id=run_id,
        )

    q = (
        df.writeStream.foreachBatch(merge)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
