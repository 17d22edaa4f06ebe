"""Sinks: batch parquet round-trip and streaming foreachBatch upsert."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from streamsum_spark import pipeline, sinks
from tests.conftest import SF_ORACLE
from streamsum_spark.config import DEFAULT_CONFIG
from streamsum_spark.operators.caches import count_cache
from streamsum_spark.streaming.pipeline import stream_events
from streamsum_spark.operators.extract import extract_events
from streamsum_spark.operators.transform import transform_fanout
from tests.conftest import SF_SMOKE, canon_rows


def test_batch_parquet_roundtrip(spark):
    cache = pipeline.count_cache_view(spark, SF_SMOKE)
    path = os.path.join(tempfile.mkdtemp(), "cache_counts")
    sinks.write_cache_parquet(cache, path, partition_cols=["action"])
    back = spark.read.parquet(path)
    a = canon_rows(cache.toPandas())
    b = canon_rows(back.toPandas())
    assert a == b


def test_streaming_foreachbatch_upsert_matches_batch(spark):
    fanned = transform_fanout(extract_events(stream_events(spark, SF_SMOKE)), DEFAULT_CONFIG)
    name = DEFAULT_CONFIG.cache_names("count")[0]
    agg = count_cache(fanned.where(F.col("cache_key") == name))
    path = os.path.join(tempfile.mkdtemp(), "cache_upsert")
    sinks.stream_to_cache_table(
        agg, path, key_cols=["subject", "action", "obj"], order_col="latest_ts"
    )
    stored = spark.read.parquet(path).select("subject", "action", "obj", "cnt", "latest_ts")
    batch = pipeline.count_cache_view(spark, SF_SMOKE)
    assert canon_rows(stored.toPandas()) == canon_rows(batch.toPandas())


def test_upsert_is_idempotent_and_merges(spark):
    path = os.path.join(tempfile.mkdtemp(), "t")
    df1 = spark.createDataFrame([("a", 1, 10), ("b", 2, 10)], "k string, v long, o long")
    sinks.upsert_batch(spark, path, df1, ["k"], "o")
    # newer value for a, new key c
    df2 = spark.createDataFrame([("a", 9, 20), ("c", 3, 5)], "k string, v long, o long")
    sinks.upsert_batch(spark, path, df2, ["k"], "o")
    got = {r.k: (r.v, r.o) for r in spark.read.parquet(path).collect()}
    assert got == {"a": (9, 20), "b": (2, 10), "c": (3, 5)}
    # replay of df2 (idempotence under micro-batch retry)
    sinks.upsert_batch(spark, path, df2, ["k"], "o")
    got2 = {r.k: (r.v, r.o) for r in spark.read.parquet(path).collect()}
    assert got2 == got


def test_partitioned_cache_read_prunes_partitions(spark):
    """A cache table written partitionBy(action) must serve an
    action-filtered read by PRUNING to that partition's directory — the
    filter appears as a PartitionFilter on the scan, not a post-scan
    Filter over all partitions.  At 100 TB this is the difference between
    reading one action's files and reading everything."""
    from streamsum_spark.plans import explain_str

    cache = pipeline.count_cache_view(spark, SF_SMOKE)
    path = os.path.join(tempfile.mkdtemp(), "part_cache")
    sinks.write_cache_parquet(cache, path, partition_cols=["action"])
    got = spark.read.parquet(path).where(F.col("action") == "click")
    plan = explain_str(got)
    assert "PartitionFilters" in plan, plan
    scan_section = plan[plan.find("PartitionFilters") :].split("]", 1)[0]
    assert "click" in scan_section, plan
    # and the values are right
    expected = {
        (r.subject, r.obj, r.cnt)
        for r in cache.where(F.col("action") == "click").collect()
    }
    assert {(r.subject, r.obj, r.cnt) for r in got.collect()} == expected


def test_bucketed_cache_join_has_no_shuffle(spark):
    """Two cache views bucketed the same way on the join key co-locate:
    the B-API join over them must contain NO Exchange — at 100 TB the
    shuffle is paid once at write time, never per read-side query."""
    from streamsum_spark.plans import explain_str

    base = os.path.join(tempfile.mkdtemp(), "bucketed")
    counts = pipeline.count_cache_view(spark, SF_SMOKE)
    keycounts = pipeline.keycount_view(spark, SF_SMOKE).withColumnRenamed("k", "subject")
    sinks.write_cache_bucketed(
        counts, "cache_counts_b", os.path.join(base, "counts"), ["subject"], 8
    )
    sinks.write_cache_bucketed(
        keycounts, "cache_keycounts_b", os.path.join(base, "keycounts"), ["subject"], 8
    )
    # hint("merge"): at real cache-table scale neither side broadcasts, so
    # sort-merge IS the production join — at test scale Spark would pick a
    # broadcast join and skip the bucketed path entirely
    joined = (
        spark.table("cache_counts_b")
        .hint("merge")
        .join(
            spark.table("cache_keycounts_b")
            .hint("merge")
            .withColumnRenamed("cnt", "subj_updates"),
            "subject",
        )
    )
    plan = explain_str(joined)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan
    # and the join is still correct vs the unbucketed form
    expected = counts.join(
        keycounts.withColumnRenamed("cnt", "subj_updates"), "subject"
    )
    assert canon_rows(joined.toPandas()) == canon_rows(expected.toPandas())


def test_checkpoint_recovery_is_exactly_once(spark):
    """Re-running the same stream against the same checkpoint must process
    nothing new (no double-counting) — the exactly-once guarantee the
    reference lacks (its error path is at-most-once, system.clj:89-95)."""
    import tempfile
    import uuid

    from streamsum_spark.streaming.pipeline import stream_events

    ckpt = os.path.join(tempfile.gettempdir(), f"ckpt_recov_{uuid.uuid4().hex[:8]}")
    path = os.path.join(tempfile.mkdtemp(), "recov_table")

    def run_once():
        ev = stream_events(spark, SF_SMOKE)
        agg = ev.groupBy("event_type").count()

        def merge(batch_df, epoch_id):
            batch_df.write.mode("overwrite").parquet(path + f"/epoch={epoch_id}")

        q = (
            agg.writeStream.foreachBatch(merge)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    first = sorted(os.listdir(path))
    run_once()  # same checkpoint: no new files -> no new epochs
    second = sorted(os.listdir(path))
    assert first == second


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    """Compaction: a fragmented table (64 tiny files) rewrites to the
    bounded file count, values untouched, no .tmp/.old residue."""
    import glob as g

    from pyspark.sql import functions as F

    from streamsum_spark import sinks
    from streamsum_spark.tables import table

    target = str(tmp_path / "frag")
    ev = table(spark, SF_ORACLE, "events").select("event_id", "user_id", "event_type")
    ev.repartition(64).write.parquet(target)
    assert len(g.glob(target + "/part-*.parquet")) >= 32
    before = ev.agg(F.sum("event_id")).collect()[0][0]
    sinks.compact_parquet(spark, target, max_records_per_file=100_000)
    files = g.glob(target + "/part-*.parquet")
    assert len(files) == 1, files
    after_df = spark.read.parquet(target)
    assert after_df.count() == ev.count()
    assert after_df.agg(F.sum("event_id")).collect()[0][0] == before
    assert not g.glob(target + ".tmp-*") and not g.glob(target + ".old-*")


def test_compact_parquet_keeps_partitioning(spark, tmp_path):
    """Partitioned layouts stay partitioned through compaction and a
    partition filter still prunes at the scan."""
    import glob as g

    from streamsum_spark import sinks
    from streamsum_spark.plans import inspect as plans
    from streamsum_spark.tables import table

    target = str(tmp_path / "part")
    ev = table(spark, SF_ORACLE, "events").select("event_id", "user_id", "event_type")
    ev.repartition(16).write.partitionBy("event_type").parquet(target)
    n0 = spark.read.parquet(target).count()
    sinks.compact_parquet(
        spark, target, max_records_per_file=100_000, partition_cols=["event_type"]
    )
    assert spark.read.parquet(target).count() == n0
    assert g.glob(target + "/event_type=*"), "partition dirs preserved"
    df = spark.read.parquet(target).where("event_type = 'click'")
    plan = plans.explain_str(df)
    scan = plan[plan.find("PartitionFilters") :].split("]", 1)[0]
    assert "event_type" in scan


def test_additive_sink_replayed_epoch_is_noop(spark, tmp_path):
    """SUM-merge is not idempotent, so the additive sink must dedupe
    redelivered micro-batches by epoch id (manifest swaps atomically with
    the data): replaying an applied epoch changes nothing; a new epoch
    still folds in."""
    from pyspark.sql import functions as F

    from streamsum_spark.sinks import accumulate_batch

    target = str(tmp_path / "acc_tbl")
    deltas = spark.createDataFrame([("a", 1), ("b", 2)], "k string, c long")

    accumulate_batch(spark, target, deltas, ["k"], ["c"], epoch_id=0)
    accumulate_batch(spark, target, deltas, ["k"], ["c"], epoch_id=0)  # replay
    got = {r.k: r.c for r in spark.read.parquet(target).collect()}
    assert got == {"a": 1, "b": 2}, got  # NOT doubled

    accumulate_batch(spark, target, deltas, ["k"], ["c"], epoch_id=1)  # new epoch
    got = {r.k: r.c for r in spark.read.parquet(target).collect()}
    assert got == {"a": 2, "b": 4}, got

    # min-merge path honors the same guard
    target2 = str(tmp_path / "acc_min")
    mins = spark.createDataFrame([("a", 7)], "k string, c long")
    accumulate_batch(spark, target2, mins, ["k"], ["c"], combine="min", epoch_id=0)
    accumulate_batch(
        spark,
        target2,
        spark.createDataFrame([("a", 3)], "k string, c long"),
        ["k"],
        ["c"],
        combine="min",
        epoch_id=0,  # replay with DIFFERENT data must still be ignored
    )
    assert spark.read.parquet(target2).collect()[0].c == 7


def test_additive_sink_fresh_run_epoch0_is_not_a_replay(spark, tmp_path):
    """Spark epoch ids restart at 0 per checkpoint: a NEW stream run
    (new run_id) feeding an existing table must fold its epoch 0 in,
    while a replay within the SAME run stays a no-op (ADVICE r4)."""
    from streamsum_spark.sinks import accumulate_batch

    target = str(tmp_path / "acc_runs")
    deltas = spark.createDataFrame([("a", 1)], "k string, c long")

    accumulate_batch(spark, target, deltas, ["k"], ["c"], epoch_id=0, run_id="run-A")
    accumulate_batch(spark, target, deltas, ["k"], ["c"], epoch_id=0, run_id="run-A")  # replay
    assert spark.read.parquet(target).collect()[0].c == 1

    accumulate_batch(spark, target, deltas, ["k"], ["c"], epoch_id=0, run_id="run-B")  # fresh run
    assert spark.read.parquet(target).collect()[0].c == 2

    accumulate_batch(spark, target, deltas, ["k"], ["c"], epoch_id=1, run_id="run-B")
    accumulate_batch(spark, target, deltas, ["k"], ["c"], epoch_id=1, run_id="run-B")  # replay
    assert spark.read.parquet(target).collect()[0].c == 3


def _bucket_listing(target):
    import glob as g

    return {
        os.path.basename(d): sorted(os.listdir(d))
        for d in g.glob(os.path.join(target, "kb=*"))
    }


def test_bucketed_upsert_rewrites_only_touched_buckets(spark, tmp_path):
    """The VERDICT r4 weak item: incremental state maintenance must NOT be
    O(total state) per micro-batch.  A small batch against a large
    accumulated store rewrites only the bucket directories its keys hash
    into; every other bucket's files are untouched (same filenames)."""
    target = str(tmp_path / "bucketed_state")
    base = spark.range(2000).selectExpr("id AS k", "0L AS o")
    sinks.upsert_batch(spark, target, base, ["k"], "o", n_buckets=16)
    before = _bucket_listing(target)
    assert len(before) == 16
    assert sinks.read_state_table(spark, target).count() == 2000

    upd = spark.createDataFrame([(5, 7)], "k long, o long")
    sinks.upsert_batch(spark, target, upd, ["k"], "o", n_buckets=16)
    after = _bucket_listing(target)
    changed = [b for b in after if after[b] != before.get(b)]
    assert len(changed) == 1, changed
    got = sinks.read_state_table(spark, target)
    assert got.count() == 2000
    assert got.where("k = 5").collect()[0].o == 7


def test_bucketed_upsert_equals_flat_upsert(spark, tmp_path):
    """Same merge semantics in both layouts: newest-wins per key."""
    flat, buck = str(tmp_path / "flat"), str(tmp_path / "buck")
    df1 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "c", 10)], "k long, v string, o long"
    )
    df2 = spark.createDataFrame(
        [(2, "B", 20), (4, "d", 5)], "k long, v string, o long"
    )
    for d in (df1, df2):
        sinks.upsert_batch(spark, flat, d, ["k"], "o")
        sinks.upsert_batch(spark, buck, d, ["k"], "o", n_buckets=4)
    a = canon_rows(spark.read.parquet(flat).toPandas())
    b = canon_rows(sinks.read_state_table(spark, buck).toPandas())
    assert a == b


def test_bucketed_merge_refuses_flat_table(spark, tmp_path):
    import pytest

    target = str(tmp_path / "flat_tbl")
    df = spark.createDataFrame([(1, 1)], "k long, o long")
    sinks.upsert_batch(spark, target, df, ["k"], "o")  # flat layout
    with pytest.raises(ValueError, match="flat layout"):
        sinks.upsert_batch(spark, target, df, ["k"], "o", n_buckets=4)


def test_bucketed_accumulate_per_bucket_replay(spark, tmp_path):
    """Per-bucket manifests: a replayed epoch is a no-op for buckets that
    committed, and a crash that committed only SOME buckets is repaired
    by replay — uncommitted buckets fold in exactly once."""
    import json

    target = str(tmp_path / "acc_buck")
    # two keys in different buckets (hash-dependent: find two such keys)
    from pyspark.sql import functions as F

    probe = spark.range(100).select(
        "id", F.pmod(F.hash("id"), F.lit(8)).cast("int").alias("kb")
    ).collect()
    by_kb = {}
    for r in probe:
        by_kb.setdefault(r.kb, r.id)
        if len(by_kb) >= 2:
            break
    (kb1, k1), (kb2, k2) = list(by_kb.items())[:2]

    deltas = spark.createDataFrame([(k1, 1), (k2, 1)], "k long, c long")
    sinks.accumulate_batch(
        spark, target, deltas, ["k"], ["c"], epoch_id=0, run_id="r", n_buckets=8
    )
    # full replay: no-op
    sinks.accumulate_batch(
        spark, target, deltas, ["k"], ["c"], epoch_id=0, run_id="r", n_buckets=8
    )
    got = {r.k: r.c for r in sinks.read_state_table(spark, target).collect()}
    assert got == {k1: 1, k2: 1}, got

    # simulate a crash that never committed bucket kb2 for epoch 1:
    # apply epoch 1, then strip its marker + value from bucket kb2 only
    deltas2 = spark.createDataFrame([(k1, 10), (k2, 10)], "k long, c long")
    sinks.accumulate_batch(
        spark, target, deltas2, ["k"], ["c"], epoch_id=1, run_id="r", n_buckets=8
    )
    mpath = os.path.join(target, f"kb={kb2}", "_applied_epochs.json")
    with open(mpath) as fh:
        marks = json.load(fh)
    marks.remove("r:1")
    with open(mpath, "w") as fh:
        json.dump(marks, fh)
    import shutil as sh

    # roll bucket kb2's DATA back too (as a crash before its swap would)
    rollback = spark.createDataFrame([(k2, 1)], "k long, c long")
    sh.rmtree(os.path.join(target, f"kb={kb2}"))
    # re-create bucket kb2 at its pre-epoch-1 state via a fresh epoch-less merge
    sinks.accumulate_batch(spark, target, rollback, ["k"], ["c"], n_buckets=8)
    with open(mpath, "w") as fh:
        json.dump(marks, fh)

    # replay epoch 1: bucket kb1 skips (marker present), kb2 folds in once
    sinks.accumulate_batch(
        spark, target, deltas2, ["k"], ["c"], epoch_id=1, run_id="r", n_buckets=8
    )
    got = {r.k: r.c for r in sinks.read_state_table(spark, target).collect()}
    assert got == {k1: 11, k2: 11}, got


def test_bucketed_accumulate_rewrites_only_touched_buckets(spark, tmp_path):
    target = str(tmp_path / "acc_bounded")
    base = spark.range(1000).selectExpr("id AS k", "1L AS c")
    sinks.accumulate_batch(spark, target, base, ["k"], ["c"], n_buckets=16)
    before = _bucket_listing(target)
    one = spark.createDataFrame([(3, 5)], "k long, c long")
    sinks.accumulate_batch(spark, target, one, ["k"], ["c"], n_buckets=16)
    after = _bucket_listing(target)
    changed = [b for b in after if after[b] != before.get(b)]
    assert len(changed) == 1, changed
    got = sinks.read_state_table(spark, target)
    assert got.count() == 1000 and got.where("k = 3").collect()[0].c == 6


def test_bucketed_merge_refuses_changed_n_buckets(spark, tmp_path):
    """kb = hash(key) % n_buckets, so a different count on an existing
    table would scatter keys across mismatched buckets (silent duplicate
    keys).  The count is recorded at creation and a mismatch refuses."""
    import pytest

    target = str(tmp_path / "meta_tbl")
    df = spark.range(200).selectExpr("id AS k", "0L AS o")
    sinks.upsert_batch(spark, target, df, ["k"], "o", n_buckets=16)
    assert os.path.exists(os.path.join(target, "_table_meta.json"))
    with pytest.raises(ValueError, match="n_buckets=16"):
        sinks.upsert_batch(spark, target, df, ["k"], "o", n_buckets=32)
    with pytest.raises(ValueError, match="n_buckets=16"):
        sinks.accumulate_batch(spark, target, df, ["k"], ["o"], n_buckets=8)
    # pre-meta tables are adopted only after the stored kb values verify
    # against hash(key) % n_buckets — a wrong count (smaller OR larger)
    # refuses with a pointer at rebucket_state_table
    os.remove(os.path.join(target, "_table_meta.json"))
    big_kb = max(
        int(d[3:]) for d in os.listdir(target) if d.startswith("kb=")
    )
    with pytest.raises(ValueError, match="rebucket_state_table"):
        sinks.upsert_batch(spark, target, df, ["k"], "o", n_buckets=big_kb)
    # same count: adopted (meta backfilled) and the merge proceeds
    sinks.upsert_batch(spark, target, df, ["k"], "o", n_buckets=16)
    assert os.path.exists(os.path.join(target, "_table_meta.json"))


def test_premeta_adoption_refuses_larger_n_buckets(spark, tmp_path):
    """The one-sided structural check (max on-disk kb < n_buckets) is not
    enough: a legacy 8-bucket table's kb indices all pass a 16-bucket
    scan, and adopting it at 16 would bake the wrong modulus into the
    meta — merges then scatter/duplicate keys across mismatched buckets
    and lookups answer 'key absent' for present keys.  Adoption must
    VERIFY stored kb against hash(key) % n_buckets and refuse."""
    import pytest

    target = str(tmp_path / "legacy8")
    df = spark.range(400).selectExpr("id AS k", "0L AS o")
    sinks.upsert_batch(spark, target, df, ["k"], "o", n_buckets=8)
    os.remove(os.path.join(target, "_table_meta.json"))  # legacy table
    with pytest.raises(ValueError, match="rebucket_state_table"):
        sinks.upsert_batch(spark, target, df, ["k"], "o", n_buckets=16)
    with pytest.raises(ValueError, match="rebucket_state_table"):
        sinks.accumulate_batch(spark, target, df, ["k"], ["o"], n_buckets=16)
    # the true count still verifies and re-adopts
    sinks.upsert_batch(spark, target, df, ["k"], "o", n_buckets=8)
    assert os.path.exists(os.path.join(target, "_table_meta.json"))
    assert sinks.read_state_table(spark, target).count() == 400


def test_epochless_merge_preserves_replay_manifests(spark, tmp_path):
    """An epoch-less accumulate on a manifest-bearing table must carry the
    replay history into its rewrite — dropping it would let a later
    redelivery of an already-committed epoch double-count."""
    for layout in ({"n_buckets": 8}, {}):
        target = str(tmp_path / f"manifest_keep_{bool(layout)}")
        d = spark.createDataFrame([(1, 5)], "k long, c long")
        sinks.accumulate_batch(
            spark, target, d, ["k"], ["c"], epoch_id=0, run_id="r", **layout
        )
        # epoch-less maintenance merge touching the same key's bucket
        sinks.accumulate_batch(spark, target, d, ["k"], ["c"], **layout)
        # redelivery of epoch 0 must still no-op
        sinks.accumulate_batch(
            spark, target, d, ["k"], ["c"], epoch_id=0, run_id="r", **layout
        )
        got = {r.k: r.c for r in sinks.read_state_table(spark, target).collect()}
        assert got == {1: 10}, (layout, got)


def test_manifest_growth_is_bounded(spark, tmp_path):
    """Replay manifests keep a bounded marker tail (foreachBatch replays
    at most the epochs past the last committed checkpoint), so the file
    stays O(1) over a long-running stream."""
    import json
    from unittest import mock

    target = str(tmp_path / "capped")
    d = spark.createDataFrame([(1, 1)], "k long, c long")
    with mock.patch.object(sinks, "_MANIFEST_CAP", 3):
        for epoch in range(6):
            sinks.accumulate_batch(
                spark, target, d, ["k"], ["c"], epoch_id=epoch, run_id="r"
            )
    with open(os.path.join(target, "_applied_epochs.json")) as fh:
        marks = json.load(fh)
    assert marks == ["r:3", "r:4", "r:5"]
    got = sinks.read_state_table(spark, target).collect()
    assert got[0].c == 6


def test_compact_bucketed_state_table_keeps_sidecars(spark, tmp_path):
    """Compaction of a bucketed state table preserves the kb layout, the
    per-bucket replay manifests, and the n_buckets meta — replaying an
    applied epoch after compaction is still a no-op."""
    import pytest

    target = str(tmp_path / "compact_buck")
    base = spark.range(200).selectExpr("id AS k", "1L AS c")
    sinks.accumulate_batch(
        spark, target, base, ["k"], ["c"], epoch_id=0, run_id="r", n_buckets=8
    )
    with pytest.raises(ValueError, match="bucketed state table"):
        sinks.compact_parquet(spark, target)  # flat rewrite refused
    sinks.compact_parquet(spark, target, partition_cols=["kb"])
    assert os.path.exists(os.path.join(target, "_table_meta.json"))
    # replaying the applied epoch after compaction: still a no-op
    sinks.accumulate_batch(
        spark, target, base, ["k"], ["c"], epoch_id=0, run_id="r", n_buckets=8
    )
    got = sinks.read_state_table(spark, target)
    assert got.count() == 200
    assert got.agg(F.sum("c")).collect()[0][0] == 200


def test_lookup_state_keys_scans_only_hashed_buckets(spark, tmp_path):
    """The read-side payoff of the kb layout: a point/multi-key lookup
    reads ONLY the bucket directories the keys hash into (pinned via
    inputFiles), returns exactly the full-scan filter's rows, and routes
    correctly even when the caller's Python ints would infer a different
    Spark type than the stored key column (cast-before-hash)."""
    target = str(tmp_path / "lookup_tbl")
    base = spark.range(2000).selectExpr(
        "CAST(id AS int) AS k", "CAST(id * 3 AS long) AS o"
    )
    sinks.upsert_batch(spark, target, base, ["k"], "o", n_buckets=16)

    got = sinks.lookup_state_keys(spark, target, ["k"], [5, 700, 1999])
    rows = {r.k: r.o for r in got.collect()}
    assert rows == {5: 15, 700: 2100, 1999: 5997}
    # at most 3 of 16 bucket dirs touched (fewer if keys share a bucket)
    touched_dirs = {f.split("/kb=")[1].split("/")[0] for f in got.inputFiles()}
    assert len(touched_dirs) <= 3, touched_dirs

    # missing keys: empty result, not an error
    assert sinks.lookup_state_keys(spark, target, ["k"], [999999]).count() == 0

    # a flat table refuses with a pointer to the full-scan path
    import pytest

    flat = str(tmp_path / "lookup_flat")
    sinks.upsert_batch(spark, flat, base, ["k"], "o")
    with pytest.raises(ValueError, match="read_state_table"):
        sinks.lookup_state_keys(spark, flat, ["k"], [5])

    # composite keys route and filter on the full key tuple
    comp = str(tmp_path / "lookup_comp")
    base2 = spark.range(300).selectExpr(
        "CAST(id % 10 AS int) AS k1", "CAST(id AS string) AS k2", "id AS o"
    )
    sinks.upsert_batch(spark, comp, base2, ["k1", "k2"], "o", n_buckets=8)
    got2 = sinks.lookup_state_keys(spark, comp, ["k1", "k2"], [(7, "7"), (3, "123")])
    assert {(r.k1, r.k2, r.o) for r in got2.collect()} == {(7, "7", 7), (3, "123", 123)}


def test_rebucket_state_table_scale_up(spark, tmp_path):
    """Rebucketing: same rows under a new bucket count, meta updated so
    merges with the new count proceed (old count refused), replay
    manifests survive (an applied epoch still no-ops), wrong key_cols
    are detected before anything is written, and pruned lookups route
    correctly against the new layout."""
    import pytest

    target = str(tmp_path / "rebucket_tbl")
    base = spark.range(500).selectExpr("id AS k", "1L AS c")
    sinks.accumulate_batch(
        spark, target, base, ["k"], ["c"], epoch_id=0, run_id="r", n_buckets=4
    )
    before = canon_rows(sinks.read_state_table(spark, target).toPandas())

    with pytest.raises(ValueError, match="wrong key_cols"):
        sinks.rebucket_state_table(spark, target, ["c"], 16)

    sinks.rebucket_state_table(spark, target, ["k"], 16)
    assert canon_rows(sinks.read_state_table(spark, target).toPandas()) == before
    kbs = {d for d in os.listdir(target) if d.startswith("kb=")}
    assert len(kbs) > 4 and all(int(d[3:]) < 16 for d in kbs)

    # old count refused, new count merges; applied epoch still a no-op
    with pytest.raises(ValueError, match="n_buckets=16"):
        sinks.accumulate_batch(spark, target, base, ["k"], ["c"], n_buckets=4)
    sinks.accumulate_batch(
        spark, target, base, ["k"], ["c"], epoch_id=0, run_id="r", n_buckets=16
    )
    assert canon_rows(sinks.read_state_table(spark, target).toPandas()) == before
    got = sinks.lookup_state_keys(spark, target, ["k"], [3, 499])
    assert {r.k: r.c for r in got.collect()} == {3: 1, 499: 1}


def test_read_touched_buckets_prunes_io(spark, tmp_path):
    """The distributed pruned read: given a batch-sized key DataFrame,
    only the bucket directories those keys hash into are opened —
    per-batch read IO is O(touched buckets), not O(accumulated state).
    This is the read-side contract the streaming near-dup verifier
    depends on."""
    target = str(tmp_path / "rtb")
    base = spark.range(2000).selectExpr("id AS k", "id * 3 AS o")
    sinks.upsert_batch(spark, target, base, ["k"], "o", n_buckets=16)

    keys = spark.createDataFrame([(5,)], "k long")
    kb = spark.range(1).select(
        F.pmod(F.hash(F.lit(5).cast("long")), F.lit(16)).cast("int").alias("kb")
    ).collect()[0].kb
    got = sinks.read_touched_buckets(spark, target, keys)
    files = got.inputFiles()
    assert files and all(f"kb={kb}/" in f for f in files), files
    # the pruned rows are the touched bucket's contents; the caller joins
    assert {r.k for r in got.join(keys, "k", "left_semi").collect()} == {5}


def test_bucket_cols_subset_layout_and_pruned_join(spark, tmp_path):
    """A table keyed (band, mh, doc_id) but bucketed on (band, mh) — the
    LSH signature-store shape: rows co-locate by collision key, so a
    batch's (band, mh) pairs prune the join read to colliding buckets;
    redelivered rows upsert onto themselves (all-key table)."""
    import pytest

    target = str(tmp_path / "sigstore")
    sig = spark.createDataFrame(
        [(b, m, d) for d in range(50) for b, m in [(d % 4, (d * 7) % 10)]],
        "band int, mh long, doc_id long",
    )
    for _ in range(2):  # redelivery: idempotent
        sinks.upsert_batch(
            spark, target, sig, ["band", "mh", "doc_id"], "doc_id",
            n_buckets=8, bucket_cols=["band", "mh"],
        )
    assert sinks.read_state_table(spark, target).count() == 50

    # pruned read by collision key: only the (band, mh)'s bucket is opened
    probe = spark.createDataFrame([(1, 7)], "band int, mh long")
    kb = spark.range(1).select(
        F.pmod(F.hash(F.lit(1).cast("int"), F.lit(7).cast("long")), F.lit(8))
        .cast("int").alias("kb")
    ).collect()[0].kb
    got = sinks.read_touched_buckets(spark, target, probe)
    assert got.inputFiles() and all(f"kb={kb}/" in f for f in got.inputFiles())
    hits = got.join(probe, ["band", "mh"]).select("doc_id").collect()
    expect = {d for d in range(50) if d % 4 == 1 and (d * 7) % 10 == 7}
    assert {r.doc_id for r in hits} == expect

    # lifetime guards: different bucket_cols refused; non-key bucket col refused
    with pytest.raises(ValueError, match="bucket_cols"):
        sinks.upsert_batch(
            spark, target, sig, ["band", "mh", "doc_id"], "doc_id", n_buckets=8
        )
    with pytest.raises(ValueError, match="subset of key_cols"):
        sinks.upsert_batch(
            spark, str(tmp_path / "bad"), sig, ["band", "doc_id"], "doc_id",
            n_buckets=8, bucket_cols=["mh"],
        )


def test_rebucket_preserves_bucket_cols(spark, tmp_path):
    """Rebucketing a bucket_cols table must keep routing on the recorded
    subset (and record it in the new meta), so pruned reads stay correct
    after a scale-up."""
    target = str(tmp_path / "sigstore_rb")
    sig = spark.createDataFrame(
        [(d % 4, (d * 7) % 10, d) for d in range(50)],
        "band int, mh long, doc_id long",
    )
    sinks.upsert_batch(
        spark, target, sig, ["band", "mh", "doc_id"], "doc_id",
        n_buckets=4, bucket_cols=["band", "mh"],
    )
    sinks.rebucket_state_table(spark, target, ["band", "mh", "doc_id"], 16)
    import json as js

    with open(os.path.join(target, "_table_meta.json")) as fh:
        meta = js.load(fh)
    assert meta == {"n_buckets": 16, "bucket_cols": ["band", "mh"]}
    probe = spark.createDataFrame([(1, 7)], "band int, mh long")
    got = sinks.read_touched_buckets(spark, target, probe).join(
        probe, ["band", "mh"]
    )
    expect = {d for d in range(50) if d % 4 == 1 and (d * 7) % 10 == 7}
    assert {r.doc_id for r in got.collect()} == expect


def test_bucketed_merge_correct_under_hot_key_skew(spark, tmp_path):
    """hash(key) % n_buckets concentrates a hot key in ONE bucket: with
    one key owning 50% of the rows, merge/lookup/read must all stay
    correct — the skew costs bucket SIZE (the known, documented cost),
    never correctness.  Additive table: many delta rows per key collapse
    to one stored row per key, so even the hot bucket stays one-row-ish."""
    target = str(tmp_path / "skewed")
    # 2000 deltas: 1000 for hot key 7, 1000 across keys 1000..1999
    hot = spark.range(1000).selectExpr("7L AS k", "1L AS c")
    cold = spark.range(1000, 2000).selectExpr("id AS k", "1L AS c")
    sinks.accumulate_batch(
        spark, target, hot.unionByName(cold), ["k"], ["c"],
        epoch_id=0, run_id="r", n_buckets=16,
    )
    got = {r.k: r.c for r in sinks.read_state_table(spark, target).collect()}
    assert got[7] == 1000 and len(got) == 1001
    assert all(got[k] == 1 for k in range(1000, 2000))

    # a second skewed batch folds into the SAME hot bucket, still correct
    sinks.accumulate_batch(
        spark, target, hot, ["k"], ["c"], epoch_id=1, run_id="r", n_buckets=16
    )
    hit = sinks.lookup_state_keys(spark, target, ["k"], [7, 1500]).collect()
    assert {r.k: r.c for r in hit} == {7: 2000, 1500: 1}

    # the hot key lives in exactly one bucket directory
    kb = spark.range(1).select(
        F.pmod(F.hash(F.lit(7).cast("long")), F.lit(16)).cast("int").alias("kb")
    ).collect()[0].kb
    rows_in = {
        d: spark.read.parquet(os.path.join(target, d)).where("k = 7").count()
        for d in os.listdir(target) if d.startswith("kb=")
    }
    assert rows_in[f"kb={kb}"] == 1 and sum(rows_in.values()) == 1


def test_bucket_files_sorted_and_lookup_pushes_filters(spark, tmp_path):
    """Each merge rewrites a touched bucket as ONE key-sorted file
    (bounded file count, ordered min/max stats), and lookup_state_keys
    pushes key IN-filters into the parquet scan so row groups inside a
    bucket are skippable before the exact semi-join."""
    import glob as g

    import pyarrow.parquet as pq

    from streamsum_spark.plans import explain_str

    target = str(tmp_path / "sorted_buckets")
    base = spark.range(4000).selectExpr("id AS k", "id * 2 AS o")
    sinks.upsert_batch(spark, target, base, ["k"], "o", n_buckets=4)
    for b in range(4):
        files = g.glob(os.path.join(target, f"kb={b}", "*.parquet"))
        assert len(files) == 1, files  # one writer task per bucket
        md = pq.ParquetFile(files[0]).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}["k"]
        stats = [
            (md.row_group(gi).column(idx).statistics.min,
             md.row_group(gi).column(idx).statistics.max)
            for gi in range(md.num_row_groups)
        ]
        assert stats == sorted(stats)  # key-sorted within the file

    got = sinks.lookup_state_keys(spark, target, ["k"], [7, 3999])
    plan = explain_str(got)
    pushed = plan[plan.find("PushedFilters") :].split("]", 1)[0]
    assert "In(k" in pushed or "EqualTo(k" in pushed, plan
    assert {(r.k, r.o) for r in got.collect()} == {(7, 14), (3999, 7998)}


def test_state_merge_refuses_schema_drift_loudly(spark, tmp_path):
    """A batch whose schema differs from the stored state refuses with
    the actual column difference (both layers, both directions) — never
    Spark's unresolved-column union error, never silent evolution."""
    import pytest

    from streamsum_spark import snapshots

    d1 = spark.createDataFrame([(1, 10, 1)], "k long, v long, o long")
    extra = spark.createDataFrame([(2, 20, 2, "x")], "k long, v long, o long, tag string")
    missing = spark.createDataFrame([(2, 2)], "k long, o long")
    swap, snap = str(tmp_path / "s1"), str(tmp_path / "s2")
    sinks.upsert_batch(spark, swap, d1, ["k"], "o", n_buckets=4)
    snapshots.snapshot_upsert(spark, snap, d1, ["k"], "o", n_buckets=4)
    for bad, frag in ((extra, "new in updates: \\['tag'\\]"), (missing, "missing from updates: \\['v'\\]")):
        with pytest.raises(ValueError, match=frag):
            sinks.upsert_batch(spark, swap, bad, ["k"], "o", n_buckets=4)
        with pytest.raises(ValueError, match=frag):
            snapshots.snapshot_upsert(spark, snap, bad, ["k"], "o", n_buckets=4)
    # flat layer too
    flat = str(tmp_path / "s3")
    sinks.upsert_batch(spark, flat, d1, ["k"], "o")
    with pytest.raises(ValueError, match="auto-evolve"):
        sinks.upsert_batch(spark, flat, extra, ["k"], "o")


def test_tombstone_deletes_newest_wins_and_replay(spark, tmp_path):
    """MERGE deletes: a batch row with _deleted=true removes its key iff
    it is the newest write for that key (a stale delete loses like a
    stale update); replays are idempotent; the stored table never
    carries the tombstone column."""
    flat, bk = str(tmp_path / "f"), str(tmp_path / "b")
    d1 = spark.createDataFrame([(1, 10, 1), (2, 20, 1), (3, 30, 1)], "k long, v long, o long")
    dels = spark.createDataFrame(
        [(2, 0, 5, True), (3, 0, 0, True), (4, 40, 5, False)],
        "k long, v long, o long, _deleted boolean",
    )  # k=2 deleted (newest), k=3 delete is STALE (o=0 < 1), k=4 upserted
    for path, kw in ((flat, {}), (bk, {"n_buckets": 4})):
        sinks.upsert_batch(spark, path, d1, ["k"], "o", **kw)
        sinks.upsert_batch(spark, path, dels, ["k"], "o", **kw)
        got = spark.read.parquet(path)
        assert "_deleted" not in got.columns
        rows = {r.k: r.v for r in got.collect()}
        assert rows == {1: 10, 3: 30, 4: 40}, (path, rows)
        # replay of the delete batch: same end state
        sinks.upsert_batch(spark, path, dels, ["k"], "o", **kw)
        assert {r.k: r.v for r in spark.read.parquet(path).collect()} == rows


def test_tombstone_can_empty_a_bucket(spark, tmp_path):
    path = str(tmp_path / "b")
    import pyspark.sql.functions as F

    seed = spark.createDataFrame([(k, k, 1) for k in range(32)], "k long, v long, o long")
    sinks.upsert_batch(spark, path, seed, ["k"], "o", n_buckets=4)
    dels = seed.select("k", "v", (F.col("o") + 1).alias("o"), F.lit(True).alias("_deleted"))
    sinks.upsert_batch(spark, path, dels, ["k"], "o", n_buckets=4)
    assert sinks.read_state_table(spark, path).count() == 0


def test_empty_stream_yields_typed_empty_table(spark, tmp_path):
    """An all-empty merge stream (zero-row batches) still leaves a
    READABLE typed empty table — the schema sidecar is written even when
    no bucket is touched (previously: unable-to-infer-schema on read)."""
    path = str(tmp_path / "t")
    empty = spark.createDataFrame([], "k long, v long, o long")
    sinks.upsert_batch(spark, path, empty, ["k"], "o", n_buckets=4)
    got = sinks.read_state_table(spark, path)
    assert got.count() == 0 and set(got.columns) == {"k", "v", "o"}


def test_corrupt_data_file_raises_not_empty(spark, tmp_path):
    """A read failure on a table that HAS data files must raise — not
    silently degrade to the typed-empty fallback (which exists only for
    the genuinely emptied, all-tombstoned case).  Silent 'no state' on a
    corrupt footer would poison every downstream merge."""
    import pytest

    path = str(tmp_path / "t")
    seed = spark.createDataFrame([(k, k, 1) for k in range(8)], "k long, v long, o long")
    sinks.upsert_batch(spark, path, seed, ["k"], "o", n_buckets=2)
    # corrupt every data file's footer in place
    for root, dirs, fs in __import__("os").walk(path):
        for f in fs:
            if f.endswith(".parquet"):
                p = __import__("os").path.join(root, f)
                with open(p, "r+b") as fh:
                    fh.seek(-8, 2)
                    fh.write(b"XXXXXXXX")
    with pytest.raises(Exception):
        sinks.read_state_table(spark, path).collect()


def test_salted_accumulate_spreads_hot_key_and_preserves_semantics(spark, tmp_path):
    """Opt-in n_salt (round-7): a celebrity key carrying 50% of the rows
    must spread across >1 bucket as salted partials, while the LOGICAL
    table (read_state_table, lookup_state_keys) and exactly-once replay
    stay byte-identical to the unsalted layout.  The salt is
    deterministic (content + epoch marker — NOT partition id), so a
    redelivered epoch re-routes identically; spread accrues across
    epochs (within one epoch a key's identical delta rows collapse to
    one partial anyway)."""
    import os

    import pyspark.sql.functions as F
    import pytest

    salted, plain = str(tmp_path / "s"), str(tmp_path / "p")

    def epoch_rows(e):
        return [(1, e + 1)] * 2000 + [(k, e + 1) for k in range(2, 202) for _ in range(5)]

    for e in range(4):
        deltas = spark.createDataFrame(epoch_rows(e), "k long, c long").repartition(8)
        sinks.accumulate_batch(
            spark, salted, deltas, ["k"], ["c"], n_buckets=16, n_salt=4,
            epoch_id=e, run_id="r",
        )
        sinks.accumulate_batch(
            spark, plain, deltas, ["k"], ["c"], n_buckets=16,
            epoch_id=e, run_id="r",
        )
    # the hot key's PHYSICAL partials sit in more than one bucket
    phys = spark.read.parquet(salted).where(F.col("k") == 1)
    hot_buckets = {r.kb for r in phys.select("kb").distinct().collect()}
    assert len(hot_buckets) > 1, hot_buckets
    assert phys.count() > 1  # genuinely split into partials
    # logical reads identical to the unsalted table
    want = {(r.k, r.c) for r in sinks.read_state_table(spark, plain).collect()}
    got = {(r.k, r.c) for r in sinks.read_state_table(spark, salted).collect()}
    assert got == want
    assert "_salt" not in sinks.read_state_table(spark, salted).columns
    # point lookup merges the partials: one row, the full sum
    lk = sinks.lookup_state_keys(spark, salted, ["k"], [(1,), (2,)]).collect()
    assert {(r.k, r.c) for r in lk} == {(1, 2000 * 10), (2, 5 * 10)}
    # replay of an already-applied epoch is still exactly once: the
    # deterministic salt re-routes the redelivered rows to the SAME
    # buckets, whose markers no-op them
    deltas = spark.createDataFrame(epoch_rows(3), "k long, c long").repartition(8)
    sinks.accumulate_batch(
        spark, salted, deltas, ["k"], ["c"], n_buckets=16, n_salt=4,
        epoch_id=3, run_id="r",
    )
    assert {(r.k, r.c) for r in sinks.read_state_table(spark, salted).collect()} == want
    # layout contract: mixing salted and unsalted merges is refused
    with pytest.raises(ValueError, match="n_salt"):
        sinks.accumulate_batch(spark, salted, deltas, ["k"], ["c"], n_buckets=16)


def test_upsert_invalidates_persisted_reader_caches(spark, tmp_path):
    """A persisted relation over a state table must not serve pre-merge
    rows after a later upsert in the same session.  Spark's CacheManager
    matches plan fragments structurally, and directory-path reads with a
    sidecar schema make repeated read_state_table plans byte-identical —
    a post-merge read would silently hit the pre-merge cache entry.  The
    reads therefore pin the CURRENT file list into the plan (snapshot
    semantics, _list_data_files): uuid part names make every swap a
    different plan, so stale entries can never match, while an unchanged
    table keeps its legitimate cache hits.  Covers flat and bucketed
    layouts plus a derived (aggregated) cached plan, the shape
    cycle-over-cycle incremental pipelines actually persist."""
    for label, kw in (("flat", {}), ("bucketed", {"n_buckets": 8})):
        t = str(tmp_path / f"t_{label}")
        up1 = spark.createDataFrame(
            [(1, 10, 1), (2, 20, 1)], "k long, v long, ts long"
        )
        sinks.upsert_batch(spark, t, up1, ["k"], "ts", **kw)
        base = sinks.read_state_table(spark, t)
        derived = base.groupBy().sum("v")
        base.persist()
        derived.persist()
        assert derived.collect()[0][0] == 30
        up2 = spark.createDataFrame(
            [(2, 200, 2), (3, 300, 2)], "k long, v long, ts long"
        )
        sinks.upsert_batch(spark, t, up2, ["k"], "ts", **kw)
        fresh = sinks.read_state_table(spark, t)
        assert {(r.k, r.v) for r in fresh.collect()} == {
            (1, 10), (2, 200), (3, 300),
        }, label
        assert fresh.groupBy().sum("v").collect()[0][0] == 510, label
        base.unpersist()
        derived.unpersist()


def test_append_batch_appends_without_rewriting(spark, tmp_path):
    """Add-only append path: per-batch cost is O(|batch|) — existing
    bucket files are never read or rewritten (same filenames survive),
    new rows land as epoch-named files, and every read path (full scan,
    touched-bucket pruning, point lookups) serves the union."""
    target = str(tmp_path / "append_state")
    b0 = spark.range(1000).selectExpr("id AS k", "id * 2 AS v")
    sinks.append_batch(spark, target, b0, ["k"], epoch_id=0, n_buckets=8)
    before = _bucket_listing(target)
    assert sinks.read_state_table(spark, target).count() == 1000

    b1 = spark.range(1000, 1400).selectExpr("id AS k", "id * 2 AS v")
    sinks.append_batch(spark, target, b1, ["k"], epoch_id=1, n_buckets=8)
    after = _bucket_listing(target)
    # every pre-existing file survives untouched; only ep-1 files appear
    for bucket, files in before.items():
        assert set(files) <= set(after[bucket]), bucket
        assert all(
            f.startswith("ep-1") for f in set(after[bucket]) - set(files)
        ), bucket
    got = sinks.read_state_table(spark, target)
    assert got.count() == 1400
    assert got.where("k = 1200").collect()[0].v == 2400
    # touched-bucket pruning still works over multi-file buckets
    keys = spark.createDataFrame([(3,), (1200,)], "k long")
    pruned = sinks.read_touched_buckets(spark, target, keys)
    assert {r.k for r in pruned.join(keys, "k", "left_semi").collect()} == {3, 1200}


def test_append_batch_replay_is_idempotent(spark, tmp_path):
    """A replayed micro-batch (same epoch, same rows — the file-source
    checkpoint contract) overwrites its own epoch files instead of
    duplicating rows."""
    target = str(tmp_path / "append_replay")
    b0 = spark.range(500).selectExpr("id AS k", "id AS v")
    sinks.append_batch(spark, target, b0, ["k"], epoch_id=0, n_buckets=4)
    b1 = spark.createDataFrame([(500, 500), (501, 501)], "k long, v long")
    sinks.append_batch(spark, target, b1, ["k"], epoch_id=1, n_buckets=4)
    sinks.append_batch(spark, target, b1, ["k"], epoch_id=1, n_buckets=4)  # replay
    got = sinks.read_state_table(spark, target)
    assert got.count() == 502
    assert got.select("k").distinct().count() == 502


def test_append_batch_refuses_layout_drift(spark, tmp_path):
    import pytest

    target = str(tmp_path / "append_meta")
    df = spark.createDataFrame([(1, 1)], "k long, v long")
    sinks.append_batch(spark, target, df, ["k"], epoch_id=0, n_buckets=4)
    with pytest.raises(ValueError, match="n_buckets"):
        sinks.append_batch(spark, target, df, ["k"], epoch_id=1, n_buckets=8)
    # and interoperates with the keyed upsert on the same layout:
    # a corrective upsert over an appended table merges per key
    sinks.upsert_batch(
        spark, target,
        spark.createDataFrame([(1, 99)], "k long, v long"),
        ["k"], "v", n_buckets=4,
    )
    assert sinks.read_state_table(spark, target).collect()[0].v == 99
