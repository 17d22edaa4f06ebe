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


def upsert_batch(
    spark: SparkSession, target_path: str, updates: DataFrame, key_cols: list[str], order_col: str
) -> None:
    """MERGE-emulation: newest row per key wins (by ``order_col``).

    Atomic swap via rename so concurrent readers never see a half-written
    table.  Delta/Iceberg replaces this body with MERGE INTO."""
    if os.path.exists(target_path):
        existing = spark.read.parquet(target_path)
        merged = existing.unionByName(updates)
    else:
        merged = updates
    value_cols = [c for c in merged.columns if c not in key_cols]
    deduped = merged.groupBy(*key_cols).agg(
        F.expr(f"max_by(struct({', '.join(value_cols)}), {order_col})").alias("_v")
    ).select(*key_cols, "_v.*")
    tmp = target_path + f".tmp-{uuid.uuid4().hex[:8]}"
    deduped.write.mode("overwrite").parquet(tmp)
    if os.path.exists(target_path):
        shutil.rmtree(target_path)
    os.rename(tmp, target_path)


def stream_to_cache_table(
    df: DataFrame, target_path: str, key_cols: list[str], order_col: str
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
