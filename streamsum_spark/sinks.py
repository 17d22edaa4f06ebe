"""Sinks (SURVEY.md §2.C "Sinks"): batch parquet writes and a streaming
foreachBatch MERGE-style upsert.

The reference's "sink" is the out-BlockingQueue plus the live mutable maps
the host app reads (README.md:97, 131).  The engine's equivalents:

- batch: ``write.parquet`` of any cache view (partitioned for pruning);
- streaming: ``foreachBatch`` maintaining a keyed cache table — the
  update-mode stream of new cache rows merged into the stored table by
  key.  Without a transactional table format in this container the merge
  is emulated as read+union+dedupe+atomic-rename; on a real deployment the
  body becomes a Delta/Iceberg MERGE INTO with the same keys (the
  foreachBatch wiring — checkpointing, per-epoch idempotence — is
  identical).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_cache_parquet(df: DataFrame, path: str, partition_cols: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)


def write_cache_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
) -> None:
    """Persist a cache view as a BUCKETED parquet table: rows are
    hash-distributed into ``num_buckets`` files per partition on
    ``bucket_cols`` and each bucket is sorted on them.

    This is the co-location lever for the read-side API at scale: two
    cache views bucketed the same way (same columns, same count) join
    WITHOUT a shuffle — the scan itself satisfies the join's
    distribution requirement, so repeated B-API queries against 100 TB
    cache tables pay the shuffle once at write time, never per query
    (pinned in tests/test_sinks.py::test_bucketed_cache_join_has_no_shuffle).
    """
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table_name)
    )


def upsert_batch(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: list[str],
    order_col: str | list[str],
) -> None:
    """MERGE-emulation: newest row per key wins (by ``order_col`` — a
    single column or an ordered list forming a composite order key; ties
    beyond it are broken by the remaining value columns so replays are
    deterministic — two updates for a key sharing an order value always
    resolve the same way, preserving the exactly-once-observable
    property).

    The order key must be strictly monotone per key across upserts for
    newest-wins to mean arrival-order-newest: a non-decreasing-but-tying
    column (e.g. an event timestamp with duplicate ts) needs a
    monotone tie-breaker appended (e.g. ``["latest_ts", "latest_seq"]``)
    or the value-column tie-break can resurrect a stale value.

    Swap protocol: write to tmp, rename target aside, rename tmp into
    place, delete the old copy — readers see either the old or the new
    complete table, never partial data, and the target-missing window is
    two rename syscalls (not a full recursive delete).  A transactional
    table format (Delta/Iceberg MERGE INTO) replaces this body with a
    genuinely atomic commit; the foreachBatch wiring is identical."""
    if os.path.exists(target_path):
        existing = spark.read.parquet(target_path)
        merged = existing.unionByName(updates)
    else:
        merged = updates
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    value_cols = [c for c in merged.columns if c not in key_cols]
    tie_break = order_cols + [c for c in value_cols if c not in order_cols]
    deduped = merged.groupBy(*key_cols).agg(
        F.expr(
            f"max_by(struct({', '.join(value_cols)}), struct({', '.join(tie_break)}))"
        ).alias("_v")
    ).select(*key_cols, "_v.*")
    tmp = target_path + f".tmp-{uuid.uuid4().hex[:8]}"
    deduped.write.mode("overwrite").parquet(tmp)
    _atomic_swap(target_path, tmp)


def _atomic_swap(target_path: str, tmp: str) -> None:
    """Rename-aside swap: readers see either the old or the new complete
    table; the target-missing window is two rename syscalls."""
    old = target_path + f".old-{uuid.uuid4().hex[:8]}"
    had_old = os.path.exists(target_path)
    if had_old:
        os.rename(target_path, old)
    os.rename(tmp, target_path)
    if had_old:
        shutil.rmtree(old)


def compact_parquet(
    spark: SparkSession,
    target_path: str,
    max_records_per_file: int = 1_000_000,
    partition_cols: list[str] | None = None,
) -> None:
    """Small-file compaction for a parquet table: rewrite with bounded
    records per file and swap atomically.

    Incremental pipelines (the foreachBatch MERGE sink, per-micro-batch
    appends, the IVF layout writer) accrete files over time; scan cost at
    100 TB is dominated by file/footer count long before byte count.
    ``maxRecordsPerFile`` bounds file sizes from above while the
    pre-write repartition bounds the file COUNT from below (without it,
    every input split re-emits its own file and compaction is a no-op).
    Partitioned layouts keep their partitioning: pass ``partition_cols``
    and each partition directory is compacted in the same pass."""
    df = spark.read.parquet(target_path)
    n_rows = df.count()
    n_files = max(1, -(-n_rows // max_records_per_file))
    tmp = target_path + f".tmp-{uuid.uuid4().hex[:8]}"
    writer = (
        df.repartition(n_files, *partition_cols)
        if partition_cols
        else df.repartition(n_files)
    ).write.mode("overwrite").option("maxRecordsPerFile", str(max_records_per_file))
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(tmp)
    _atomic_swap(target_path, tmp)


def accumulate_batch(
    spark: SparkSession,
    target_path: str,
    deltas: DataFrame,
    key_cols: list[str],
    sum_cols: list[str],
    combine: str = "sum",
    epoch_id: int | None = None,
    run_id: str | None = None,
) -> None:
    """MERGE-emulation for ADDITIVE state: per-key counters summed with
    the stored table (vs upsert_batch's newest-wins for replacement
    state).  The additive form is what incremental index maintenance
    needs — term/gram counts are associative, so each micro-batch ships
    only its delta counts and the table stays one row per key.  On a
    transactional format this is MERGE INTO ... UPDATE SET c = t.c + s.c;
    the swap protocol is the same as upsert_batch.

    Replay safety: SUM-merge is NOT idempotent (newest-wins is), so a
    foreachBatch redelivery after a partial failure would double-count.
    ``epoch_id`` (when given) is recorded in an ``_applied_epochs.json``
    manifest INSIDE the table directory — underscore files are invisible
    to parquet readers, and the manifest swaps atomically WITH the data,
    so a replayed epoch is a no-op and a crash between merge and marker
    cannot happen (they are one rename).  This is the standard
    foreachBatch exactly-once recipe, with the transactional commit
    emulated by the directory swap.

    Spark epoch ids restart at 0 for every NEW checkpoint, so a table fed
    by more than one stream lifetime must distinguish runs: pass
    ``run_id`` (any stable per-stream-start token — stream_accumulate_counts
    generates one per .start()) and the manifest records (run_id, epoch_id)
    pairs; epoch 0 of a fresh run is then folded in, not mistaken for a
    replay of the previous run's epoch 0."""
    import json

    manifest = os.path.join(target_path, "_applied_epochs.json")
    marker = None if epoch_id is None else f"{run_id or ''}:{epoch_id}"
    applied: list = []
    if os.path.exists(manifest):
        with open(manifest) as fh:
            applied = json.load(fh)
        if marker is not None and marker in applied:
            return  # replayed micro-batch of the SAME run: already folded in
    if os.path.exists(target_path):
        merged = spark.read.parquet(target_path).unionByName(deltas)
    else:
        merged = deltas
    agg_fn = {"sum": F.sum, "min": F.min, "max": F.max}[combine]
    acc = merged.groupBy(*key_cols).agg(
        *[agg_fn(c).cast("long").alias(c) for c in sum_cols]
    )
    tmp = target_path + f".tmp-{uuid.uuid4().hex[:8]}"
    acc.write.mode("overwrite").parquet(tmp)
    if marker is not None:
        with open(os.path.join(tmp, "_applied_epochs.json"), "w") as fh:
            json.dump(applied + [marker], fh)
    _atomic_swap(target_path, tmp)


def stream_accumulate_counts(
    df: DataFrame,
    target_path: str,
    key_cols: list[str],
    sum_cols: list[str],
    pre_agg,
    combine: str = "sum",
) -> None:
    """Run an append-mode availableNow stream into an ADDITIVE cache table:
    ``pre_agg`` (static DataFrame -> per-key delta counts) runs inside
    foreachBatch on each micro-batch, and the deltas sum-merge into the
    stored table.

    This is the bounded-state alternative to a streaming groupBy over an
    unbounded key space (per-(doc, term) counts would otherwise grow
    state forever): per-batch work is O(batch), cross-batch state lives
    in the keyed table, and no aggregation state store is needed at all —
    the stream itself stays stateless."""
    spark = df.sparkSession
    ckpt = os.path.join(tempfile.gettempdir(), f"streamsum_acc_ckpt_{uuid.uuid4().hex[:10]}")
    run_id = uuid.uuid4().hex  # per-stream-start token: epoch 0 of a later
    # run against the same table must not look like a replay of this one's

    def merge(batch_df: DataFrame, epoch_id: int) -> None:
        accumulate_batch(
            spark, target_path, pre_agg(batch_df), key_cols, sum_cols, combine, epoch_id,
            run_id=run_id,
        )

    q = (
        df.writeStream.foreachBatch(merge)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_to_cache_table(
    df: DataFrame, target_path: str, key_cols: list[str], order_col: str | list[str]
) -> None:
    """Run an availableNow update-mode stream into a keyed parquet cache
    table via foreachBatch upsert."""
    spark = df.sparkSession
    ckpt = os.path.join(tempfile.gettempdir(), f"streamsum_sink_ckpt_{uuid.uuid4().hex[:10]}")

    def merge(batch_df: DataFrame, epoch_id: int) -> None:
        upsert_batch(spark, target_path, batch_df, key_cols, order_col)

    q = (
        df.writeStream.foreachBatch(merge)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
