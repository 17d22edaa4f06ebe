"""Fault injection for the rename-aside swap protocol (VERDICT r4 item 6):
kill the writer at every rename syscall of a merge and assert a reader can
only ever see OLD or NEW complete state (never partial data), and that a
replayed micro-batch repairs the crash and lands exactly-once.

os.rename is the only syscall the Python-side swap performs (Spark's own
parquet commits happen JVM-side), so counting renames enumerates every
crash point of the protocol: crash before the first rename leaves the
target untouched; between the two renames leaves the target missing with
its complete old-aside on disk (repaired by _recover on the next merge);
after the second leaves the new table with a stale aside (dropped)."""

from __future__ import annotations

import glob as g
import os

import pytest

from streamsum_spark import sinks


def _install_crash(monkeypatch, crash_at: int):
    real = os.rename
    state = {"n": 0}

    def fake(a, b):
        state["n"] += 1
        if state["n"] == crash_at:
            raise OSError("injected crash")
        return real(a, b)

    monkeypatch.setattr(os, "rename", fake)
    return state


def _rows(spark, path):
    return {(r.k, r.o) for r in spark.read.parquet(path).select("k", "o").collect()}


@pytest.mark.parametrize("crash_at", [1, 2])
def test_flat_upsert_crash_old_or_new_then_replay(spark, tmp_path, monkeypatch, crash_at):
    target = str(tmp_path / "t")
    df1 = spark.createDataFrame([(1, 1), (2, 1)], "k long, o long")
    df2 = spark.createDataFrame([(2, 2), (3, 2)], "k long, o long")
    sinks.upsert_batch(spark, target, df1, ["k"], "o")
    old = {(1, 1), (2, 1)}
    new = {(1, 1), (2, 2), (3, 2)}

    _install_crash(monkeypatch, crash_at)
    with pytest.raises(OSError, match="injected"):
        sinks.upsert_batch(spark, target, df2, ["k"], "o")

    if os.path.exists(target):
        assert _rows(spark, target) in (old, new)  # never partial
    else:
        # two-rename window: the complete old table sits in the aside
        asides = g.glob(str(tmp_path / "._old-t-*"))
        assert len(asides) == 1
        assert _rows(spark, asides[0]) == old

    # replay repairs (restore aside / drop stale tmp) and converges
    sinks.upsert_batch(spark, target, df2, ["k"], "o")
    assert _rows(spark, target) == new
    assert not g.glob(str(tmp_path / "._old-t-*"))  # no litter


@pytest.mark.parametrize("crash_at", [1, 2])
def test_flat_accumulate_crash_exactly_once(spark, tmp_path, monkeypatch, crash_at):
    """SUM-merge + epoch manifest: any crash point, then a replay of the
    SAME epoch, must land the delta exactly once (the manifest swaps
    atomically with the data, so old state carries the old manifest)."""
    target = str(tmp_path / "a")
    d0 = spark.createDataFrame([(1, 1), (2, 1)], "k long, c long")
    d1 = spark.createDataFrame([(1, 10), (3, 10)], "k long, c long")
    sinks.accumulate_batch(spark, target, d0, ["k"], ["c"], epoch_id=0, run_id="r")

    _install_crash(monkeypatch, crash_at)
    with pytest.raises(OSError, match="injected"):
        sinks.accumulate_batch(spark, target, d1, ["k"], ["c"], epoch_id=1, run_id="r")
    monkeypatch.undo()

    for _ in range(2):  # replay twice: second must be a manifest no-op
        sinks.accumulate_batch(spark, target, d1, ["k"], ["c"], epoch_id=1, run_id="r")
    got = {r.k: r.c for r in spark.read.parquet(target).collect()}
    assert got == {1: 11, 2: 1, 3: 10}, got


@pytest.mark.parametrize("crash_at", [1, 2, 5, 8])
def test_bucketed_accumulate_crash_per_bucket_exactly_once(
    spark, tmp_path, monkeypatch, crash_at
):
    """Bucketed additive merge: swaps run per bucket (2 renames each), so
    a crash can commit SOME buckets of a micro-batch. Each on-disk bucket
    must still be complete-old or complete-new, and a replay must fold
    the uncommitted buckets in exactly once (per-bucket manifests)."""
    from pyspark.sql import functions as F

    n_buckets = 8
    target = str(tmp_path / "b")
    base = spark.range(64).selectExpr("id AS k", "1L AS c")
    sinks.accumulate_batch(
        spark, target, base, ["k"], ["c"], epoch_id=0, run_id="r", n_buckets=n_buckets
    )
    # deltas touching every bucket: 8 buckets x 2 renames = 8+ crash points
    deltas = spark.range(64).selectExpr("id AS k", "10L AS c")
    kb_of = {
        r.k: r.kb
        for r in spark.range(64)
        .select(
            F.col("id").alias("k"),
            F.pmod(F.hash(F.col("id")), F.lit(n_buckets)).cast("int").alias("kb"),
        )
        .collect()
    }

    _install_crash(monkeypatch, crash_at)
    with pytest.raises(OSError, match="injected"):
        sinks.accumulate_batch(
            spark, target, deltas, ["k"], ["c"], epoch_id=1, run_id="r",
            n_buckets=n_buckets,
        )
    monkeypatch.undo()

    # invariant: every present bucket dir is complete-old or complete-new
    for b in range(n_buckets):
        bdir = os.path.join(target, f"kb={b}")
        if not os.path.exists(bdir) or not any(
            f.startswith("part-") for f in os.listdir(bdir)
        ):
            continue  # mid-swap bucket: covered by the aside + replay below
        got = {r.k: r.c for r in spark.read.parquet(bdir).select("k", "c").collect()}
        keys = {k for k, kb in kb_of.items() if kb == b}
        old_b = {k: 1 for k in keys}
        new_b = {k: 11 for k in keys}
        assert got in (old_b, new_b), (b, got)

    # replay: committed buckets skip via their manifests, the rest fold in
    sinks.accumulate_batch(
        spark, target, deltas, ["k"], ["c"], epoch_id=1, run_id="r",
        n_buckets=n_buckets,
    )
    got = {r.k: r.c for r in sinks.read_state_table(spark, target).collect()}
    assert got == {k: 11 for k in range(64)}, got
    assert not g.glob(os.path.join(target, "._old-*"))  # recovery left no litter
    assert not g.glob(target + ".tmp-*")


@pytest.mark.parametrize("crash_at", [1, 2])
def test_rebucket_crash_recovered_by_next_merge(spark, tmp_path, monkeypatch, crash_at):
    """A rebucket killed at either rename of its whole-table swap must not
    lose state: the next bucketed merge repairs the crash at entry
    (table-level _recover) instead of creating a fresh empty table and
    stranding the pre-rebucket data in the aside dir."""
    target = str(tmp_path / "rb")
    base = spark.range(100).selectExpr("id AS k", "id * 2 AS o")
    sinks.upsert_batch(spark, target, base, ["k"], "o", n_buckets=4)
    expect = {(i, 2 * i) for i in range(100)}

    _install_crash(monkeypatch, crash_at)
    with pytest.raises(OSError, match="injected"):
        sinks.rebucket_state_table(spark, target, ["k"], 16)
    monkeypatch.undo()

    # next merge repairs the swap, refuses nothing, loses nothing
    upd = spark.createDataFrame([(5, 999)], "k long, o long")
    sinks.upsert_batch(spark, target, upd, ["k"], "o", n_buckets=4)
    got = {(r.k, r.o) for r in sinks.read_state_table(spark, target).collect()}
    assert got == (expect - {(5, 10)}) | {(5, 999)}
    import glob as gg

    assert not gg.glob(str(tmp_path / "._old-rb-*")) and not gg.glob(target + ".tmp-*")


@pytest.mark.parametrize("crash_at", [2])
def test_lookup_refuses_crashed_whole_table_swap(spark, tmp_path, monkeypatch, crash_at):
    """A rebucket/compaction killed between its two renames leaves the
    TARGET missing with the complete table in the parent-level aside.
    lookup_state_keys must raise the crashed-swap refusal (pointing at
    recover_state_table), not the misleading 'no _table_meta.json'
    ValueError — and after recovery the lookup answers correctly."""
    target = str(tmp_path / "ws")
    base = spark.range(100).selectExpr("id AS k", "id * 2 AS o")
    sinks.upsert_batch(spark, target, base, ["k"], "o", n_buckets=4)

    _install_crash(monkeypatch, crash_at)
    with pytest.raises(OSError, match="injected"):
        sinks.rebucket_state_table(spark, target, ["k"], 8)
    monkeypatch.undo()
    assert not os.path.exists(target)  # mid-swap: data lives in the aside

    with pytest.raises(RuntimeError, match="recover_state_table"):
        sinks.lookup_state_keys(spark, target, ["k"], [7])

    sinks.recover_state_table(target)
    got = sinks.lookup_state_keys(spark, target, ["k"], [7]).collect()
    assert {(r.k, r.o) for r in got} == {(7, 14)}


@pytest.mark.parametrize("crash_at", [1, 2, 5])
def test_rebucket_refuses_interrupted_merge_litter(
    spark, tmp_path, monkeypatch, crash_at
):
    """A merge crash can commit an epoch's marker in SOME touched buckets
    only; rebucketing before the replay folds in would union manifests
    into every new bucket and permanently mark the epoch applied in
    buckets that never received its deltas (silent partial loss).
    Rebucket must refuse while crash litter is present, and proceed once
    the replayed merge has repaired the table."""
    n_buckets = 8
    target = str(tmp_path / "rl")
    base = spark.range(64).selectExpr("id AS k", "1L AS c")
    sinks.accumulate_batch(
        spark, target, base, ["k"], ["c"], epoch_id=0, run_id="r", n_buckets=n_buckets
    )
    deltas = spark.range(64).selectExpr("id AS k", "10L AS c")

    _install_crash(monkeypatch, crash_at)
    with pytest.raises(OSError, match="injected"):
        sinks.accumulate_batch(
            spark, target, deltas, ["k"], ["c"], epoch_id=1, run_id="r",
            n_buckets=n_buckets,
        )
    monkeypatch.undo()

    with pytest.raises(RuntimeError, match="[Rr]estart the stream"):
        sinks.rebucket_state_table(spark, target, ["k"], 16)

    # the replayed micro-batch repairs + folds in; rebucket then proceeds
    sinks.accumulate_batch(
        spark, target, deltas, ["k"], ["c"], epoch_id=1, run_id="r",
        n_buckets=n_buckets,
    )
    sinks.rebucket_state_table(spark, target, ["k"], 16)
    got = {r.k: r.c for r in sinks.read_state_table(spark, target).collect()}
    assert got == {k: 11 for k in range(64)}, got


def test_lookup_refuses_crashed_bucket_then_recovers(spark, tmp_path):
    """A reader must not silently answer 'key absent' for a bucket whose
    swap crashed (data sitting in the aside dir): lookup refuses with a
    pointer to recovery, and recover_state_table restores the bucket."""
    target = str(tmp_path / "rd")
    base = spark.range(200).selectExpr("id AS k", "id AS o")
    sinks.upsert_batch(spark, target, base, ["k"], "o", n_buckets=4)
    # find key 7's bucket and simulate a mid-swap crash for it
    from pyspark.sql import functions as F

    kb = spark.range(1).select(
        F.pmod(F.hash(F.lit(7).cast("long")), F.lit(4)).cast("int").alias("kb")
    ).collect()[0].kb
    bdir = os.path.join(target, f"kb={kb}")
    os.rename(bdir, os.path.join(target, f"._old-kb={kb}-deadbeef"))

    with pytest.raises(RuntimeError, match="crashed swap"):
        sinks.lookup_state_keys(spark, target, ["k"], [7])

    sinks.recover_state_table(target)
    got = sinks.lookup_state_keys(spark, target, ["k"], [7]).collect()
    assert {(r.k, r.o) for r in got} == {(7, 7)}
    assert not [d for d in os.listdir(target) if d.startswith("._old-")]
