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
