"""Snapshot-manifest state tables (snapshots.py): atomic multi-bucket
commits, reader isolation, time travel, vacuum, exactly-once replay, and
fault injection at every rename/replace syscall of the commit protocol.

The crash enumeration mirrors tests/test_crash_consistency.py: the
Python-side commit performs only os.rename (generation-file moves) and
os.replace (manifest write, pointer swap) — Spark's parquet writes commit
JVM-side into the private ._commit-* staging dir, which no manifest ever
references until the pointer swap.  Counting both syscalls therefore
enumerates every crash point."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from streamsum_spark import sinks, snapshots


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k long, v long, o long")


def _rows(df):
    return {(r.k, r.v, r.o) for r in df.collect()}


B1 = [(1, 10, 1), (2, 20, 1), (3, 30, 1)]
B2 = [(2, 21, 2), (4, 40, 2)]
B3 = [(1, 12, 3), (5, 50, 3)]
AFTER_B1 = {(1, 10, 1), (2, 20, 1), (3, 30, 1)}
AFTER_B2 = {(1, 10, 1), (2, 21, 2), (3, 30, 1), (4, 40, 2)}
AFTER_B3 = {(1, 12, 3), (2, 21, 2), (3, 30, 1), (4, 40, 2), (5, 50, 3)}


def test_snapshot_upsert_matches_rename_swap_layer(spark, tmp_path):
    """Same merge semantics as the bucketed rename-swap upsert: three
    batches through both layers land identical state."""
    snap, swap = str(tmp_path / "snap"), str(tmp_path / "swap")
    for b in (B1, B2, B3):
        snapshots.snapshot_upsert(spark, snap, _mk(spark, b), ["k"], "o", n_buckets=8)
        sinks.upsert_batch(spark, swap, _mk(spark, b), ["k"], "o", n_buckets=8)
    got = _rows(snapshots.read_snapshot(spark, snap))
    assert got == AFTER_B3
    assert got == _rows(sinks.read_state_table(spark, swap))


def test_reader_isolated_from_later_commits(spark, tmp_path):
    """THE property the rename-swap layer cannot give: a DataFrame built
    from a snapshot stays collectable — and yields the SAME rows — while
    later merges commit, because its file set is immutable (the swap
    layer deletes replaced files, tearing a concurrent reader)."""
    path = str(tmp_path / "t")
    snapshots.snapshot_upsert(spark, path, _mk(spark, B1), ["k"], "o", n_buckets=8)
    pinned = snapshots.read_snapshot(spark, path)  # resolves v1's file set
    assert _rows(pinned) == AFTER_B1
    snapshots.snapshot_upsert(spark, path, _mk(spark, B2), ["k"], "o", n_buckets=8)
    snapshots.snapshot_upsert(spark, path, _mk(spark, B3), ["k"], "o", n_buckets=8)
    # the pinned reader re-collects identical rows mid-history
    assert _rows(pinned) == AFTER_B1
    assert _rows(snapshots.read_snapshot(spark, path)) == AFTER_B3


def test_time_travel_versions(spark, tmp_path):
    path = str(tmp_path / "t")
    for b in (B1, B2, B3):
        snapshots.snapshot_upsert(spark, path, _mk(spark, b), ["k"], "o", n_buckets=8)
    assert snapshots.snapshot_versions(path) == [1, 2, 3]
    assert _rows(snapshots.read_snapshot(spark, path, version=1)) == AFTER_B1
    assert _rows(snapshots.read_snapshot(spark, path, version=2)) == AFTER_B2
    assert _rows(snapshots.read_snapshot(spark, path, version=3)) == AFTER_B3


def test_delta_manifests_are_o_touched_with_periodic_checkpoints(spark, tmp_path):
    """Commit cost is O(touched buckets): a one-key batch's manifest
    records exactly one bucket; every checkpoint_interval-th commit is a
    full map so readers walk a bounded chain."""
    path = str(tmp_path / "t")
    # seed all 8 buckets
    seed = [(k, k, 0) for k in range(64)]
    snapshots.snapshot_upsert(
        spark, path, _mk(spark, seed), ["k"], "o", n_buckets=8, checkpoint_interval=3
    )
    v1 = snapshots._load_manifest(path, 1)
    assert v1["full"] and len(v1["buckets"]) == 8
    # single-key commits -> delta manifests with exactly one bucket
    for i, k in enumerate([1, 2], start=2):
        snapshots.snapshot_upsert(
            spark, path, _mk(spark, [(k, 99, 9)]), ["k"], "o",
            n_buckets=8, checkpoint_interval=3,
        )
        m = snapshots._load_manifest(path, i)
        if m["full"]:
            continue  # v3 lands on the checkpoint cadence
        assert len(m["buckets"]) == 1
    v3 = snapshots._load_manifest(path, 3)
    assert v3["full"] and len(v3["buckets"]) == 8  # checkpoint cadence
    got = {r.k: r.v for r in snapshots.read_snapshot(spark, path).collect()}
    assert got[1] == 99 and got[2] == 99 and got[0] == 0 and len(got) == 64


def test_vacuum_reclaims_unreferenced_generations(spark, tmp_path):
    path = str(tmp_path / "t")
    for b in (B1, B2, B3):
        snapshots.snapshot_upsert(spark, path, _mk(spark, b), ["k"], "o", n_buckets=4)
    stats = snapshots.vacuum_snapshots(path, keep_last=1)
    assert stats["files"] > 0
    # latest still reads; vacuumed versions refuse with the retained list
    assert _rows(snapshots.read_snapshot(spark, path)) == AFTER_B3
    with pytest.raises(ValueError, match="vacuumed"):
        snapshots.read_snapshot(spark, path, version=1)
    # every remaining data file is referenced by the retained manifest
    _, buckets = snapshots._resolve_buckets(path, 3)
    referenced = {
        os.path.join(f"kb={b}", n) for b, names in buckets.items() for n in names
    }
    on_disk = {
        os.path.join(d, f)
        for d in os.listdir(path)
        if d.startswith("kb=")
        for f in os.listdir(os.path.join(path, d))
    }
    assert on_disk == referenced


def test_accumulate_exactly_once_and_combine_modes(spark, tmp_path):
    path = str(tmp_path / "a")
    d = spark.createDataFrame([(1, 5), (2, 7)], "k long, c long")
    snapshots.snapshot_accumulate(
        spark, path, d, ["k"], ["c"], epoch_id=0, run_id="r", n_buckets=4
    )
    # replay of the SAME (run, epoch): no-op (marker is in the manifest)
    snapshots.snapshot_accumulate(
        spark, path, d, ["k"], ["c"], epoch_id=0, run_id="r", n_buckets=4
    )
    got = {r.k: r.c for r in snapshots.read_snapshot(spark, path).collect()}
    assert got == {1: 5, 2: 7}
    # a NEW run's epoch 0 folds in
    snapshots.snapshot_accumulate(
        spark, path, d, ["k"], ["c"], epoch_id=0, run_id="r2", n_buckets=4
    )
    got = {r.k: r.c for r in snapshots.read_snapshot(spark, path).collect()}
    assert got == {1: 10, 2: 14}
    # bit_or mode (mergeable bitmap state)
    bp = str(tmp_path / "b")
    w1 = spark.createDataFrame([(0, 0b0011)], "w long, bits long")
    w2 = spark.createDataFrame([(0, 0b0101)], "w long, bits long")
    snapshots.snapshot_accumulate(spark, bp, w1, ["w"], ["bits"], combine="bit_or", n_buckets=2)
    snapshots.snapshot_accumulate(spark, bp, w2, ["w"], ["bits"], combine="bit_or", n_buckets=2)
    assert snapshots.read_snapshot(spark, bp).collect()[0].bits == 0b0111


@pytest.fixture(params=["posix", "condput"])
def commit_backend(request):
    """Run commit-protocol tests against BOTH storage primitive sets:
    the POSIX default (hard-link claim + rename replace) and the
    object-store-shaped conditional-PUT emulation (O_EXCL create, no
    hard links) — proving the protocol relies only on the CommitBackend
    contract in commitio.py, not on POSIX specifics."""
    from streamsum_spark import commitio

    backend = (
        commitio.PosixCommitBackend()
        if request.param == "posix"
        else commitio.CondPutCommitBackend()
    )
    saved = commitio.get_backend()
    commitio.set_backend(backend)
    yield backend
    commitio.set_backend(saved)


def _install_crash(monkeypatch, crash_at: int):
    """Count os.rename (gen-file moves), the manifest claim
    (_claim_manifest — the put-if-absent link), and os.replace (pointer)
    and crash at the crash_at-th call."""
    real_rename, real_replace = os.rename, os.replace
    real_claim = snapshots._claim_manifest
    state = {"n": 0}

    def tick():
        state["n"] += 1
        if state["n"] == crash_at:
            raise OSError("injected crash")

    def counting(real):
        def fn(a, b):
            tick()
            return real(a, b)

        return fn

    def claim(mtmp, final, marker):
        tick()
        return real_claim(mtmp, final, marker)

    monkeypatch.setattr(os, "rename", counting(real_rename))
    monkeypatch.setattr(os, "replace", counting(real_replace))
    monkeypatch.setattr(snapshots, "_claim_manifest", claim)
    return state


@pytest.mark.parametrize("crash_at", [1, 2, 3, 4])
def test_commit_crash_atomic_across_buckets_then_replay(
    spark, tmp_path, monkeypatch, crash_at, commit_backend
):
    """Crash at every syscall of a commit touching TWO buckets: the
    reader must see exactly the old snapshot (never one bucket new and
    one old — the torn state the per-bucket swap protocol permits), and
    the replayed epoch must land exactly once.  B2 = keys {2, 4} routes
    to buckets {0, 4} of 8 -> 2 gen moves + manifest replace + pointer
    replace = 4 crash points."""
    path = str(tmp_path / "t")
    snapshots.snapshot_upsert(
        spark, path, _mk(spark, B1), ["k"], "o", n_buckets=8,
        epoch_id=0, run_id="r",
    )
    state = _install_crash(monkeypatch, crash_at)
    with pytest.raises(OSError, match="injected"):
        snapshots.snapshot_upsert(
            spark, path, _mk(spark, B2), ["k"], "o", n_buckets=8,
            epoch_id=1, run_id="r",
        )
    assert state["n"] == crash_at  # the parametrized point was exercised
    monkeypatch.undo()
    # reader sees the OLD snapshot, whole — atomicity across buckets
    assert _rows(snapshots.read_snapshot(spark, path)) == AFTER_B1
    # replay converges exactly once
    snapshots.snapshot_upsert(
        spark, path, _mk(spark, B2), ["k"], "o", n_buckets=8,
        epoch_id=1, run_id="r",
    )
    assert _rows(snapshots.read_snapshot(spark, path)) == AFTER_B2
    # vacuum clears the crashed attempt's orphan generations/manifests
    snapshots.vacuum_snapshots(path, keep_last=2)
    _, buckets = snapshots._resolve_buckets(path, snapshots._latest_version(path))
    referenced = {
        os.path.join(f"kb={b}", n) for b, names in buckets.items() for n in names
    }
    _, buckets1 = snapshots._resolve_buckets(path, 1)
    referenced |= {
        os.path.join(f"kb={b}", n) for b, names in buckets1.items() for n in names
    }
    on_disk = {
        os.path.join(d, f)
        for d in os.listdir(path)
        if d.startswith("kb=")
        for f in os.listdir(os.path.join(path, d))
    }
    assert on_disk == referenced


@pytest.mark.parametrize("crash_at", [2, 3, 4])
def test_accumulate_crash_never_double_counts(
    spark, tmp_path, monkeypatch, crash_at, commit_backend
):
    """SUM-merge: crash mid-commit (after a gen move / after the manifest
    replace, or AT the pointer swap itself), then replay the SAME epoch — the
    delta must fold in exactly once because marker and data share the
    pointer swap (there is no between-them crash point by construction)."""
    path = str(tmp_path / "a")
    d0 = spark.createDataFrame([(1, 1), (2, 1)], "k long, c long")
    d1 = spark.createDataFrame([(1, 10), (2, 10)], "k long, c long")
    snapshots.snapshot_accumulate(
        spark, path, d0, ["k"], ["c"], epoch_id=0, run_id="r", n_buckets=4
    )
    _install_crash(monkeypatch, crash_at)
    with pytest.raises(OSError, match="injected"):
        snapshots.snapshot_accumulate(
            spark, path, d1, ["k"], ["c"], epoch_id=1, run_id="r", n_buckets=4
        )
    monkeypatch.undo()
    assert {r.k: r.c for r in snapshots.read_snapshot(spark, path).collect()} == {
        1: 1, 2: 1,
    }
    snapshots.snapshot_accumulate(
        spark, path, d1, ["k"], ["c"], epoch_id=1, run_id="r", n_buckets=4
    )
    snapshots.snapshot_accumulate(  # second replay: still exactly once
        spark, path, d1, ["k"], ["c"], epoch_id=1, run_id="r", n_buckets=4
    )
    assert {r.k: r.c for r in snapshots.read_snapshot(spark, path).collect()} == {
        1: 11, 2: 11,
    }


def test_lookup_snapshot_keys_prunes_to_routed_buckets(spark, tmp_path):
    """The point lookup opens ONLY the routed buckets' generation files
    (inputFiles ⊆ the manifest's entries for those buckets, strictly
    fewer than the full file set) and returns exactly the stored rows."""
    path = str(tmp_path / "t")
    seed = [(k, k * 10, 1) for k in range(64)]
    snapshots.snapshot_upsert(spark, path, _mk(spark, seed), ["k"], "o", n_buckets=16)
    got = snapshots.lookup_snapshot_keys(spark, path, ["k"], [(7,), (13,)])
    rows = {(r.k, r.v) for r in got.collect()}
    assert rows == {(7, 70), (13, 130)}
    head, buckets = snapshots._resolve_buckets(path, 1)
    all_files = sum(len(n) for n in buckets.values())
    want = snapshots._with_kb(
        spark.createDataFrame([(7,), (13,)], "k long"), ["k"], 16
    )
    routed = {r.kb for r in want.collect()}
    allowed = {
        os.path.join(path, f"kb={b}", n)
        for b in routed
        for n in buckets.get(str(b), [])
    }
    opened = {os.path.abspath(f.replace("file:", "")) for f in got.inputFiles()}
    assert opened <= {os.path.abspath(p) for p in allowed}
    assert len(opened) < all_files


def test_mismatched_layout_refused(spark, tmp_path):
    path = str(tmp_path / "t")
    snapshots.snapshot_upsert(spark, path, _mk(spark, B1), ["k"], "o", n_buckets=8)
    with pytest.raises(ValueError, match="n_buckets=8"):
        snapshots.snapshot_upsert(spark, path, _mk(spark, B2), ["k"], "o", n_buckets=16)


def test_stream_upsert_snapshot_matches_batch(spark, tmp_path):
    """availableNow file-stream in 3 micro-batches through foreachBatch
    snapshot commits == one-shot batch upsert; versions accrete 1/batch."""
    src = str(tmp_path / "src")
    for i, b in enumerate((B1, B2, B3)):
        _mk(spark, b).coalesce(1).write.parquet(os.path.join(src, f"f{i}"))
    stream = (
        spark.readStream.schema("k long, v long, o long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/f*")
    )
    path = str(tmp_path / "t")
    snapshots.stream_upsert_snapshot(stream, path, ["k"], "o", n_buckets=8)
    assert _rows(snapshots.read_snapshot(spark, path)) == AFTER_B3
    assert len(snapshots.snapshot_versions(path)) == 3


def test_rebucket_snapshot_is_just_a_commit(spark, tmp_path):
    """Rebucketing = one more commit: new bucket count, full manifest,
    same rows — and a reader pinned on the PRE-rebucket version keeps
    collecting its old layout (no quiesce precondition, no whole-table
    swap window)."""
    path = str(tmp_path / "t")
    seed = [(k, k * 10, 1) for k in range(64)]
    snapshots.snapshot_upsert(spark, path, _mk(spark, seed), ["k"], "o", n_buckets=4)
    pinned = snapshots.read_snapshot(spark, path)
    snapshots.rebucket_snapshot_table(spark, path, 16)
    head, buckets = snapshots._resolve_buckets(path, 2)
    assert head["n_buckets"] == 16 and head["full"]
    assert len(buckets) > 4  # rows really spread over the new bucket count
    got = {(r.k, r.v) for r in snapshots.read_snapshot(spark, path).collect()}
    assert got == {(k, k * 10) for k in range(64)}
    assert len(set(pinned.collect())) == 64  # pre-rebucket reader intact
    # merges continue against the new count; the old count refuses
    snapshots.snapshot_upsert(spark, path, _mk(spark, [(1, 99, 9)]), ["k"], "o", n_buckets=16)
    with pytest.raises(ValueError, match="n_buckets=16"):
        snapshots.snapshot_upsert(spark, path, _mk(spark, [(2, 5, 9)]), ["k"], "o", n_buckets=4)
    # bucket-pruned lookup routes correctly on the new layout
    rows = {(r.k, r.v) for r in snapshots.lookup_snapshot_keys(spark, path, ["k"], [(1,), (7,)]).collect()}
    assert rows == {(1, 99), (7, 70)}


def test_change_feed_post_images_per_version(spark, tmp_path):
    """change_feed=True records each commit's post-image: winners only
    (a stale update whose stored row wins records the STORED value, not
    the batch's), one file per version, readable as a range."""
    path = str(tmp_path / "t")
    snapshots.snapshot_upsert(
        spark, path, _mk(spark, B1), ["k"], "o", n_buckets=4, change_feed=True
    )
    # v2: k=2 updated (o=2 wins), k=4 new
    snapshots.snapshot_upsert(
        spark, path, _mk(spark, B2), ["k"], "o", n_buckets=4, change_feed=True
    )
    # v3: stale update for k=2 (o=1 < stored o=2): post-image keeps stored
    stale = [(2, 77, 1), (6, 60, 1)]
    snapshots.snapshot_upsert(
        spark, path, _mk(spark, stale), ["k"], "o", n_buckets=4, change_feed=True
    )
    ch = snapshots.snapshot_changes(spark, path, from_version=1)
    got = {(r._version, r.k, r.v, r.o) for r in ch.collect()}
    assert got == {
        (2, 2, 21, 2), (2, 4, 40, 2),
        (3, 2, 21, 2),  # stored row won over the stale update
        (3, 6, 60, 1),
    }
    # replaying the accumulated feed reproduces the latest snapshot for
    # the touched keys (newest _version wins per key)
    latest = {r.k: (r.v, r.o) for r in snapshots.read_snapshot(spark, path).collect()}
    feed_latest = {}
    for v, k, val, o in sorted(got):
        feed_latest[k] = (val, o)
    for k, vo in feed_latest.items():
        assert latest[k] == vo
    # a range over a feed-less version refuses
    snapshots.snapshot_upsert(spark, path, _mk(spark, [(9, 9, 9)]), ["k"], "o", n_buckets=4)
    with pytest.raises(ValueError, match="change_feed"):
        snapshots.snapshot_changes(spark, path, from_version=1).collect()
    # vacuum drops old change files; the range read then refuses loudly
    snapshots.vacuum_snapshots(path, keep_last=1)
    with pytest.raises(ValueError, match="vacuumed|change"):
        snapshots.snapshot_changes(spark, path, from_version=1, to_version=3)


def test_snapshot_tombstones_with_time_travel_and_feed(spark, tmp_path):
    """Deletes on the snapshot layer: the key disappears from the live
    version, the PRE-delete snapshot still shows it (time travel), and
    the change feed records the removal with its tombstone marker."""
    path = str(tmp_path / "t")
    snapshots.snapshot_upsert(
        spark, path, _mk(spark, B1), ["k"], "o", n_buckets=4, change_feed=True
    )
    dels = spark.createDataFrame(
        [(2, 0, 9, True)], "k long, v long, o long, _deleted boolean"
    )
    snapshots.snapshot_upsert(
        spark, path, dels, ["k"], "o", n_buckets=4, change_feed=True,
        epoch_id=1, run_id="r",
    )
    live = {r.k for r in snapshots.read_snapshot(spark, path).collect()}
    assert live == {1, 3}
    v1 = {r.k for r in snapshots.read_snapshot(spark, path, version=1).collect()}
    assert v1 == {1, 2, 3}  # time travel shows the pre-delete state
    ch = snapshots.snapshot_changes(spark, path, from_version=1)
    marks = {(r.k, r._deleted) for r in ch.collect()}
    assert (2, True) in marks
    # replay of the delete epoch: no new version, state unchanged
    snapshots.snapshot_upsert(
        spark, path, dels, ["k"], "o", n_buckets=4, change_feed=True,
        epoch_id=1, run_id="r",
    )
    assert snapshots._latest_version(path) == 2
    assert {r.k for r in snapshots.read_snapshot(spark, path).collect()} == {1, 3}


def test_change_feed_skips_rebucket_versions(spark, tmp_path):
    """A rebucket is a layout-only commit: the change feed skips it
    rather than refusing, and deltas before/after it still read."""
    path = str(tmp_path / "t")
    snapshots.snapshot_upsert(
        spark, path, _mk(spark, B1), ["k"], "o", n_buckets=4, change_feed=True
    )
    snapshots.rebucket_snapshot_table(spark, path, 8)
    snapshots.snapshot_upsert(
        spark, path, _mk(spark, B2), ["k"], "o", n_buckets=8, change_feed=True
    )
    ch = snapshots.snapshot_changes(spark, path, from_version=1)
    got = {(r._version, r.k) for r in ch.collect()}
    assert got == {(3, 2), (3, 4)}  # v2 (rebucket) silently skipped


def test_sync_from_changes_materializes_downstream(spark, tmp_path):
    """The CDC loop end-to-end: a downstream snapshot table follows the
    source through upserts AND deletes via the change feed, exactly once
    (re-running the sync applies nothing), and keeps converging as the
    source moves on."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    for b in (B1, B2):
        snapshots.snapshot_upsert(
            spark, src, _mk(spark, b), ["k"], "o", n_buckets=4, change_feed=True
        )
    assert snapshots.sync_from_changes(spark, src, dst, ["k"]) == 2
    live = lambda p: {
        (r.k, r.v, r.o)
        for r in snapshots.read_snapshot(spark, p).select("k", "v", "o").collect()
    }
    assert live(dst) == AFTER_B2
    # exactly once: nothing new to apply
    assert snapshots.sync_from_changes(spark, src, dst, ["k"]) == 0
    # a delete + an upsert flow through on the next sync
    dels = spark.createDataFrame(
        [(2, 0, 9, True)], "k long, v long, o long, _deleted boolean"
    )
    snapshots.snapshot_upsert(
        spark, src, dels, ["k"], "o", n_buckets=4, change_feed=True
    )
    snapshots.snapshot_upsert(
        spark, src, _mk(spark, B3), ["k"], "o", n_buckets=4, change_feed=True
    )
    assert snapshots.sync_from_changes(spark, src, dst, ["k"]) == 2
    assert live(dst) == live(src)
    assert 2 not in {r.k for r in snapshots.read_snapshot(spark, dst).collect()}


def test_stream_accumulate_snapshot_matches_batch_histogram(spark, tmp_path):
    """The additive streaming sink on the snapshot layer reproduces the
    one-shot batch log-histogram exactly (linear sketch + exactly-once
    markers), with one readable version per micro-batch."""
    import os

    from streamsum_spark.operators.sketches import log_histogram_sketch
    from tests.conftest import SF_SMOKE

    batch = {
        (r.event_type, r.bin): r.n
        for r in log_histogram_sketch(spark, SF_SMOKE).collect()
    }
    # the raw parquet read needs the nanos conf regardless of whether an
    # earlier test's table() call already set it (test-order robustness)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = (
        spark.readStream.schema(
            spark.read.option("pathGlobFilter", "events.parquet")
            .parquet(SF_SMOKE)
            .schema
        )
        .option("pathGlobFilter", "events.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(SF_SMOKE)
    )
    path = str(tmp_path / "hist")

    def pre_agg(b):
        return (
            b.select(
                "event_type",
                F.expr("length(bin(CAST(value * 1000 AS BIGINT)))").alias("bin"),
            )
            .groupBy("event_type", "bin")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )

    snapshots.stream_accumulate_snapshot(
        stream, path, ["event_type", "bin"], ["n"], pre_agg, n_buckets=8
    )
    got = {
        (r.event_type, r.bin): r.n
        for r in snapshots.read_snapshot(spark, path).collect()
    }
    assert got == batch


def test_concurrent_writers_both_land(spark, tmp_path, monkeypatch, commit_backend):
    """Optimistic concurrency: writer B commits BETWEEN writer A's head
    read and A's manifest claim.  A's put-if-absent hits B's manifest,
    raises SnapshotConflictError internally, and the retry re-merges
    against B's committed state — both commits land, at consecutive
    versions, with no silent loss through the pointer swap."""
    path = str(tmp_path / "t")
    snapshots.snapshot_upsert(spark, path, _mk(spark, B1), ["k"], "o", n_buckets=8)
    real = snapshots._bucket_writer
    state = {"fired": False}

    def wrapping(reduced, key_cols):
        w = real(reduced, key_cols)

        def write(tmp):
            if not state["fired"]:
                state["fired"] = True  # fire B exactly once, mid-A
                snapshots.snapshot_upsert(
                    spark, path, _mk(spark, [(9, 90, 2)]), ["k"], "o", n_buckets=8
                )
            w(tmp)

        return write

    monkeypatch.setattr(snapshots, "_bucket_writer", wrapping)
    snapshots.snapshot_upsert(spark, path, _mk(spark, B2), ["k"], "o", n_buckets=8)
    monkeypatch.undo()
    assert snapshots._latest_version(path) == 3  # B at v2, A retried at v3
    assert _rows(snapshots.read_snapshot(spark, path)) == AFTER_B2 | {(9, 90, 2)}


def test_conflict_without_retry_raises_loudly(spark, tmp_path, commit_backend):
    """A markerless orphan manifest at the target version (a crashed
    OTHER writer — indistinguishable from a live one) must refuse the
    commit rather than overwrite; vacuum reclaims the orphan and the
    commit then proceeds."""
    import json
    import shutil

    path = str(tmp_path / "t")
    snapshots.snapshot_upsert(spark, path, _mk(spark, B1), ["k"], "o", n_buckets=8)
    m1 = snapshots._load_manifest(path, 1)
    orphan = {**m1, "version": 2, "parent": 1, "full": False, "applied": []}
    with open(snapshots._manifest_path(path, 2), "w") as fh:
        json.dump(orphan, fh)
    # the orphan sits ABOVE the _latest pointer: the error must name the
    # claimed-but-unswapped case and its recovery (stop writers, vacuum)
    with pytest.raises(
        snapshots.SnapshotConflictError, match="claimed but not committed"
    ):
        snapshots.snapshot_upsert(
            spark, path, _mk(spark, B2), ["k"], "o", n_buckets=8, retries=0
        )
    # the refused attempt left the table readable at v1, untouched
    assert _rows(snapshots.read_snapshot(spark, path)) == AFTER_B1
    snapshots.vacuum_snapshots(path, keep_last=2)  # reclaims the orphan
    snapshots.snapshot_upsert(
        spark, path, _mk(spark, B2), ["k"], "o", n_buckets=8, retries=0
    )
    assert _rows(snapshots.read_snapshot(spark, path)) == AFTER_B2


def test_sync_offset_survives_marker_cap(spark, tmp_path, monkeypatch):
    """The persisted cdc_offsets consumer offset — NOT the capped marker
    list — bounds the sync walk: with _MANIFEST_CAP shrunk to 3, six
    synced versions evict the early markers, yet a re-sync applies
    nothing (no O(all versions) re-walk, no tombstoned key resurrected
    by a re-applied old post-image), and an unrelated commit to the
    destination carries the offset forward."""
    monkeypatch.setattr(snapshots, "_MANIFEST_CAP", 3)
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    batches = [
        [(1, 10, 1), (2, 20, 1)],
        [(3, 30, 2)],
        [(4, 40, 3)],
        [(5, 50, 4)],
        [(6, 60, 5)],
    ]
    for b in batches:
        snapshots.snapshot_upsert(
            spark, src, _mk(spark, b), ["k"], "o", n_buckets=4, change_feed=True
        )
    # v6 deletes key 2: a naive marker-window re-walk would later
    # re-apply v1's (2, 20) post-image and resurrect it
    dels = spark.createDataFrame(
        [(2, 0, 6, True)], "k long, v long, o long, _deleted boolean"
    )
    snapshots.snapshot_upsert(
        spark, src, dels, ["k"], "o", n_buckets=4, change_feed=True
    )
    assert snapshots.sync_from_changes(spark, src, dst, ["k"]) == 6
    head = snapshots._load_manifest(dst, snapshots._latest_version(dst))
    run_id = f"cdc:{os.path.abspath(src)}"
    assert head["cdc_offsets"] == {run_id: 6}
    assert len(head["applied"]) == 3  # the cap really evicted markers
    live = {r.k for r in snapshots.read_snapshot(spark, dst).collect()}
    assert live == {1, 3, 4, 5, 6}  # key 2 deleted
    # re-sync: offset says everything is applied — zero work, no
    # resurrection of key 2
    assert snapshots.sync_from_changes(spark, src, dst, ["k"]) == 0
    assert {r.k for r in snapshots.read_snapshot(spark, dst).collect()} == live
    # an unrelated writer commits to dst; the offset must carry forward
    extra = spark.createDataFrame(
        [(99, 990, 9, 0)], "k long, v long, o long, _version long"
    )
    snapshots.snapshot_upsert(spark, dst, extra, ["k"], "o", n_buckets=16)
    assert snapshots.sync_from_changes(spark, src, dst, ["k"]) == 0


def test_salted_snapshot_accumulate_parity_with_sinks_layer(spark, tmp_path):
    """n_salt on the MVCC layer (round-7 parity with
    sinks.accumulate_batch): deterministic content+marker salt, hot key
    spreads across >1 bucket as partials accrue over epochs,
    read_snapshot and lookup_snapshot_keys return the logical table,
    replay exactly-once, rebucket carries the salted-layout fields
    forward, and upserts / change_feed / salt mismatches refuse."""
    import pyspark.sql.functions as F

    salted, plain = str(tmp_path / "s"), str(tmp_path / "p")

    def epoch_rows(e):
        return [(1, e + 1)] * 1000 + [(k, e + 1) for k in range(2, 102) for _ in range(5)]

    for e in range(4):
        deltas = spark.createDataFrame(epoch_rows(e), "k long, c long").repartition(8)
        snapshots.snapshot_accumulate(
            spark, salted, deltas, ["k"], ["c"], n_buckets=16, n_salt=4,
            epoch_id=e, run_id="r",
        )
        snapshots.snapshot_accumulate(
            spark, plain, deltas, ["k"], ["c"], n_buckets=16,
            epoch_id=e, run_id="r",
        )
    head, buckets = snapshots._resolve_buckets(salted, snapshots._latest_version(salted))
    assert head["n_salt"] == 4 and head["sum_cols"] == ["c"]
    files = [
        os.path.join(salted, f"kb={b}", n) for b, names in buckets.items() for n in names
    ]
    phys = spark.read.option("basePath", salted).parquet(*files).where(F.col("k") == 1)
    assert phys.select("kb").distinct().count() > 1
    assert phys.count() > 1
    want = {(r.k, r.c) for r in snapshots.read_snapshot(spark, plain).collect()}
    got = {(r.k, r.c) for r in snapshots.read_snapshot(spark, salted).collect()}
    assert got == want and "_salt" not in snapshots.read_snapshot(spark, salted).columns
    lk = snapshots.lookup_snapshot_keys(spark, salted, ["k"], [(1,), (2,)]).collect()
    assert {(r.k, r.c) for r in lk} == {(1, 1000 * 10), (2, 5 * 10)}
    # replay no-ops (deterministic salt re-routes identically)
    deltas = spark.createDataFrame(epoch_rows(3), "k long, c long").repartition(8)
    snapshots.snapshot_accumulate(
        spark, salted, deltas, ["k"], ["c"], n_buckets=16, n_salt=4,
        epoch_id=3, run_id="r",
    )
    assert {(r.k, r.c) for r in snapshots.read_snapshot(spark, salted).collect()} == want
    # layout contract: salt mismatch and upsert-into-salted refuse
    with pytest.raises(ValueError, match="n_salt"):
        snapshots.snapshot_accumulate(spark, salted, deltas, ["k"], ["c"], n_buckets=16)
    with pytest.raises(ValueError, match="n_salt"):
        snapshots.snapshot_upsert(
            spark, salted,
            spark.createDataFrame([(1, 5, 0)], "k long, c long, _salt int"),
            ["k", "_salt"], "c", n_buckets=16,
        )
    # change_feed composes with n_salt (round 8): the feed version
    # records MERGED post-images — since this batch touches every key,
    # the feed equals the whole post-commit logical table
    pre = snapshots._latest_version(salted)
    snapshots.snapshot_accumulate(
        spark, salted, deltas, ["k"], ["c"], n_buckets=16, n_salt=4,
        epoch_id=4, run_id="r", change_feed=True,
    )
    ch = snapshots.snapshot_changes(spark, salted, from_version=pre)
    assert "_salt" not in ch.columns
    after4 = {(r.k, r.c) for r in snapshots.read_snapshot(spark, salted).collect()}
    assert {(r.k, r.c) for r in ch.collect()} == after4
    assert (1, 1000 * 10 + 1000 * 4) in after4  # hot key merged, not a partial
    # rebucket is a layout commit: salted fields carry forward, reads
    # still merge partials
    snapshots.rebucket_snapshot_table(spark, salted, 8)
    head2 = snapshots._load_manifest(salted, snapshots._latest_version(salted))
    assert head2["n_salt"] == 4 and head2["combine"] == "sum"
    assert {(r.k, r.c) for r in snapshots.read_snapshot(spark, salted).collect()} == after4


def test_sync_offset_advances_past_trailing_skipped_versions(spark, tmp_path):
    """A caught-up sync whose newest source versions were all SKIPPED
    (layout-only no_data_change commits) persists offset=latest with a
    data-free commit instead of stalling below them — so the next sync
    loads ZERO source manifests rather than re-reading every version
    above the stalled offset on each call."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    for b in (B1, B2):
        snapshots.snapshot_upsert(
            spark, src, _mk(spark, b), ["k"], "o", n_buckets=4, change_feed=True
        )
    assert snapshots.sync_from_changes(spark, src, dst, ["k"]) == 2
    run_id = f"cdc:{os.path.abspath(src)}"
    # two trailing layout-only versions (v3, v4): nothing to apply
    snapshots.rebucket_snapshot_table(spark, src, 8)
    snapshots.rebucket_snapshot_table(spark, src, 16)
    assert snapshots.sync_from_changes(spark, src, dst, ["k"]) == 0
    head = snapshots._load_manifest(dst, snapshots._latest_version(dst))
    assert head["cdc_offsets"] == {run_id: 4}  # advanced past the skips
    assert head.get("no_data_change")  # the advance commit moved no data
    # dst data unchanged by the advance commit
    assert {
        (r.k, r.v, r.o)
        for r in snapshots.read_snapshot(spark, dst).select("k", "v", "o").collect()
    } == AFTER_B2
    # caught up: the walk now starts AT latest — no src manifest loads
    loads = []
    orig = snapshots._load_manifest

    def counting(path, v):
        if os.path.abspath(path) == os.path.abspath(src):
            loads.append(v)
        return orig(path, v)

    snapshots._load_manifest, _ld = counting, snapshots._load_manifest
    try:
        assert snapshots.sync_from_changes(spark, src, dst, ["k"]) == 0
    finally:
        snapshots._load_manifest = _ld
    assert loads == []  # offset == latest: zero source manifests re-read


def test_sync_legacy_destination_seeds_offset_from_markers(spark, tmp_path, monkeypatch):
    """A destination synced before cdc_offsets existed (markers only,
    early ones already evicted by the cap) must NOT re-apply evicted
    versions on first run after upgrade — the resurrection case the
    offset exists to prevent.  The highest surviving marker seeds the
    offset, and the sync then persists it."""
    monkeypatch.setattr(snapshots, "_MANIFEST_CAP", 3)
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    batches = [
        [(1, 10, 1), (2, 20, 1)],
        [(3, 30, 2)],
        [(4, 40, 3)],
        [(5, 50, 4)],
    ]
    for b in batches:
        snapshots.snapshot_upsert(
            spark, src, _mk(spark, b), ["k"], "o", n_buckets=4, change_feed=True
        )
    # v5 deletes key 2: re-applying evicted v1 would resurrect it
    dels = spark.createDataFrame(
        [(2, 0, 5, True)], "k long, v long, o long, _deleted boolean"
    )
    snapshots.snapshot_upsert(
        spark, src, dels, ["k"], "o", n_buckets=4, change_feed=True
    )
    assert snapshots.sync_from_changes(spark, src, dst, ["k"]) == 5
    # surgically de-upgrade the destination: strip cdc_offsets from the
    # head manifest, leaving only the capped marker list (3 of 5 left)
    import json

    head_v = snapshots._latest_version(dst)
    mpath = snapshots._manifest_path(dst, head_v)
    with open(mpath) as fh:
        m = json.load(fh)
    assert m.pop("cdc_offsets") and len(m["applied"]) == 3
    with open(mpath, "w") as fh:
        json.dump(m, fh)
    # first post-upgrade sync: nothing re-applied, key 2 stays deleted
    assert snapshots.sync_from_changes(spark, src, dst, ["k"]) == 0
    live = {r.k for r in snapshots.read_snapshot(spark, dst).collect()}
    assert live == {1, 3, 4, 5}
    head = snapshots._load_manifest(dst, snapshots._latest_version(dst))
    run_id = f"cdc:{os.path.abspath(src)}"
    assert head["cdc_offsets"] == {run_id: 5}  # seeded AND persisted


def test_salted_change_feed_emits_merged_post_images(spark, tmp_path):
    """change_feed now composes with n_salt (it used to refuse): every
    feed version must carry the key's MERGED value — identical rows to
    an unsalted twin fed the same epochs — even though the salted
    table's physical rows are per-salt partials spread across buckets
    this commit didn't touch.  A downstream sync from the salted feed
    then lands the same table as one from the unsalted feed."""
    salted, plain = str(tmp_path / "s"), str(tmp_path / "p")

    def epoch_rows(e):
        # hot key 1 (spreads over salts) + a cold key per epoch
        return [(1, 10)] * 400 + [(100 + e, 7)]

    for e in range(3):
        deltas = spark.createDataFrame(epoch_rows(e), "k long, c long").repartition(8)
        snapshots.snapshot_accumulate(
            spark, salted, deltas, ["k"], ["c"], n_buckets=16, n_salt=4,
            epoch_id=e, run_id="r", change_feed=True,
        )
        snapshots.snapshot_accumulate(
            spark, plain, deltas, ["k"], ["c"], n_buckets=16,
            epoch_id=e, run_id="r", change_feed=True,
        )
    # precondition: the hot key really is salted across >1 physical row
    _, buckets = snapshots._resolve_buckets(salted, snapshots._latest_version(salted))
    files = [
        os.path.join(salted, f"kb={b}", n) for b, names in buckets.items() for n in names
    ]
    phys = spark.read.option("basePath", salted).parquet(*files).where(F.col("k") == 1)
    assert phys.count() > 1
    # per-version feed parity with the unsalted twin: merged post-images
    for v in (1, 2, 3):
        got = {
            (r.k, r.c)
            for r in snapshots.snapshot_changes(
                spark, salted, from_version=v - 1, to_version=v
            ).collect()
        }
        want = {
            (r.k, r.c)
            for r in snapshots.snapshot_changes(
                spark, plain, from_version=v - 1, to_version=v
            ).collect()
        }
        assert got == want, (v, got, want)
        assert (1, 400 * 10 * v) in got  # the hot key's FULL merged value
    # no _salt column ever reaches a consumer
    feed = snapshots.snapshot_changes(spark, salted, from_version=0)
    assert "_salt" not in feed.columns
    # downstream materialization from the salted feed == from the plain
    d1, d2 = str(tmp_path / "d1"), str(tmp_path / "d2")
    assert snapshots.sync_from_changes(spark, salted, d1, ["k"]) == 3
    snapshots.sync_from_changes(spark, plain, d2, ["k"])
    got = {(r.k, r.c) for r in snapshots.read_snapshot(spark, d1).select("k", "c").collect()}
    want = {(r.k, r.c) for r in snapshots.read_snapshot(spark, d2).select("k", "c").collect()}
    assert got == want


def test_condput_partial_claim_orphan_recovers_via_vacuum(spark, tmp_path, monkeypatch):
    """Emulation-only crash window of the conditional-PUT backend: a
    writer that dies between the O_EXCL create and the body write leaves
    a claimed-but-EMPTY manifest (a real store's conditional PUT is
    atomic with its body, so this window exists only locally).  Every
    subsequent writer — even the owner replaying its marker, since the
    orphan is unparseable — must refuse with the claimed-but-unswapped
    diagnosis, the table must stay readable at the old head, and the
    documented recovery (stop writers -> vacuum -> retry) must work."""
    from streamsum_spark import commitio

    path = str(tmp_path / "t")
    saved = commitio.get_backend()
    commitio.set_backend(commitio.CondPutCommitBackend())
    try:
        snapshots.snapshot_upsert(
            spark, path, _mk(spark, B1), ["k"], "o", n_buckets=8,
            epoch_id=0, run_id="r",
        )
        real_open = os.open
        state = {"arm": False}

        def crashing_open(p, flags, *a):
            # only the manifest claim, not unrelated O_EXCL opens
            # (tempfile etc.) elsewhere in the commit
            if (
                state["arm"]
                and (flags & os.O_EXCL)
                and os.path.basename(str(p)).startswith("v0")
                and str(p).endswith(".json")
            ):
                fd = real_open(p, flags, *a)
                os.close(fd)  # claim landed, body never written
                state["arm"] = False
                raise OSError("injected crash after claim")
            return real_open(p, flags, *a)

        monkeypatch.setattr(os, "open", crashing_open)
        state["arm"] = True
        with pytest.raises(OSError, match="injected"):
            snapshots.snapshot_upsert(
                spark, path, _mk(spark, B2), ["k"], "o", n_buckets=8,
                epoch_id=1, run_id="r",
            )
        monkeypatch.undo()
        # empty orphan at v2: readers unaffected, all writers refuse
        assert _rows(snapshots.read_snapshot(spark, path)) == AFTER_B1
        with pytest.raises(
            snapshots.SnapshotConflictError, match="claimed but not committed"
        ):
            snapshots.snapshot_upsert(
                spark, path, _mk(spark, B2), ["k"], "o", n_buckets=8,
                epoch_id=1, run_id="r", retries=2,
            )
        # documented recovery
        snapshots.vacuum_snapshots(path, keep_last=2)
        snapshots.snapshot_upsert(
            spark, path, _mk(spark, B2), ["k"], "o", n_buckets=8,
            epoch_id=1, run_id="r",
        )
        assert _rows(snapshots.read_snapshot(spark, path)) == AFTER_B2
    finally:
        commitio.set_backend(saved)


def test_advance_commit_crash_between_claim_and_swap_self_heals(
    spark, tmp_path, monkeypatch
):
    """The automatic offset-advance commit runs on EVERY caught-up sync,
    so it must carry a marker: a crash between its manifest claim and
    the pointer swap leaves an orphan above the pointer, and a
    markerless orphan wedges every subsequent writer on the destination
    until a manual stop-writers/vacuum (r8 ADVICE).  With the
    offsets-deterministic marker, the next sync re-derives the same
    advance, recognizes its OWN orphan, overwrites it, and completes."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    for b in (B1, B2):
        snapshots.snapshot_upsert(
            spark, src, _mk(spark, b), ["k"], "o", n_buckets=4, change_feed=True
        )
    assert snapshots.sync_from_changes(spark, src, dst, ["k"]) == 2
    run_id = f"cdc:{os.path.abspath(src)}"
    snapshots.rebucket_snapshot_table(spark, src, 8)  # trailing skip on src

    from streamsum_spark import commitio

    real = commitio.get_backend()
    dst_latest = os.path.join(dst, "_snap", "_latest")
    state = {"armed": True}

    class CrashOnDstSwap:
        def put_if_absent(self, a, b):
            return real.put_if_absent(a, b)

        def replace(self, a, b):
            if state["armed"] and os.path.abspath(b) == os.path.abspath(
                dst_latest
            ):
                state["armed"] = False
                raise OSError("injected crash before pointer swap")
            return real.replace(a, b)

    monkeypatch.setattr(snapshots.commitio, "get_backend", CrashOnDstSwap)
    with pytest.raises(OSError, match="injected"):
        snapshots.sync_from_changes(spark, src, dst, ["k"])
    monkeypatch.undo()

    # orphan manifest now sits ABOVE dst's pointer; pre-fix (markerless
    # advance) this next sync raised SnapshotConflictError forever
    assert snapshots.sync_from_changes(spark, src, dst, ["k"]) == 0
    head = snapshots._load_manifest(dst, snapshots._latest_version(dst))
    assert head["cdc_offsets"] == {run_id: 3}
    assert head.get("no_data_change")
    assert {
        (r.k, r.v, r.o)
        for r in snapshots.read_snapshot(spark, dst).select("k", "v", "o").collect()
    } == AFTER_B2
