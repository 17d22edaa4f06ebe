"""Incrementally-maintained IVF ANN index on the snapshot state layer.

The batch IVF layouts (similarity.write_embeddings_ivf / _ivfpq) are
one-shot rewrites: adding vectors means rebuilding the whole partitioned
directory.  A continuously-ingesting corpus needs the INDEX to accept
appends with the same guarantees as any other incremental state — and
that is exactly what the snapshot-manifest tables (snapshots.py) provide,
so this module stores the posting lists AS a snapshot table:

- key ``(list_id, vec_id)``, bucketed on ``list_id`` (the probe routing
  key — the same widened-key recipe as the LSH signature store, legal
  because a vector's list assignment is immutable once the coarse
  quantizer is frozen);
- appends assign new vectors to their nearest frozen centroid (one
  broadcast join + per-vector argmax, no Python loop) and commit through
  ``snapshot_upsert`` — atomic across every touched posting list, replay
  idempotent, and a query running mid-append reads a consistent pinned
  version (MVCC), never a half-committed index;
- probes route to nprobe lists and read ONLY those lists' buckets via
  the manifest (``read_touched_snapshot_buckets``) — the partition
  pruning of the directory layout, kept under incremental maintenance.

The coarse quantizer is trained ONCE on the base corpus and frozen
(standard IVF practice — FAISS's add() does the same); drift after
massive appends is handled by retraining + rebuilding INTO A FRESH PATH
(build_ivf_snapshot refuses a live index path — new centroids over old
posting lists would strand stale rows) while the old index keeps
serving, then readers repoint.

Pinned in tests/test_similarity_incremental.py: append-then-query equals
rebuild-with-same-centroids; nprobe=n_lists is EXACT over base+appended;
probe reads open only the routed buckets' generation files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streamsum_spark.functions.expressions import cosine_expr as _cos_expr
from streamsum_spark.operators.similarity import kmeans_ivf_index
from streamsum_spark.snapshots import (
    read_touched_snapshot_buckets,
    snapshot_upsert,
)
from streamsum_spark.tables import table


def _assign_to_lists(new_emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment for a batch of vectors: broadcast the
    (tiny) centroid table, score every (vector, centroid) pair with the
    JVM cosine expression, keep the argmax per vector.  Ties break on
    list_id for determinism."""
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cc").desc(), F.col("list_id")
    )
    return (
        new_emb.join(F.broadcast(centroids))
        .select(
            "vec_id",
            "embedding",
            "list_id",
            F.expr(_cos_expr("embedding", "centroid")).alias("cc"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("list_id", "vec_id", "embedding")
    )


def build_ivf_snapshot(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    n_lists: int | None = None,
    n_buckets: int = 32,
    seed: int = 7,
    base: DataFrame | None = None,
) -> None:
    """Train the coarse quantizer on the base corpus (bounded k-means fit,
    see kmeans_ivf_index), freeze the centroid table at
    ``<out_path>_centroids``, and commit the base posting lists as
    snapshot version 1.  ``base`` narrows the indexed subset (defaults to
    the whole embeddings table) — the quantizer still trains on the full
    table's geometry.

    Refuses an ``out_path`` that already holds an index: re-training
    changes the centroids, and upserting new (list, vec) keys would
    leave each moved vector's STALE row under its old list (duplicate
    ids in probes, wrong-list postings forever).  Retrain into a NEW
    path — the old index stays readable while the new one builds, then
    repoint readers."""
    from streamsum_spark.snapshots import _latest_version

    if _latest_version(out_path) is not None:
        raise ValueError(
            f"{out_path} already holds an IVF snapshot index; retraining "
            "must build into a fresh path (stale old-centroid postings "
            "would survive a merge) — build new, then repoint readers"
        )
    _, centroids = kmeans_ivf_index(spark, sf_dir, n_lists, seed)
    centroids.write.mode("overwrite").parquet(out_path + "_centroids")
    emb = base if base is not None else table(spark, sf_dir, "embeddings")
    rows = _assign_to_lists(
        emb.select("vec_id", "embedding"),
        spark.read.parquet(out_path + "_centroids"),
    )
    snapshot_upsert(
        spark, out_path, rows, ["list_id", "vec_id"], "vec_id",
        n_buckets=n_buckets, bucket_cols=["list_id"],
    )


def ivf_snapshot_append(
    spark: SparkSession,
    out_path: str,
    new_emb: DataFrame,
    n_buckets: int = 32,
    epoch_id: int | None = None,
    run_id: str | None = None,
) -> None:
    """Add vectors to the live index: assign against the FROZEN centroids
    and upsert into the posting-list snapshot — one atomic commit across
    every touched list, idempotent on replay (same vec -> same list ->
    same key), readers never see a torn index."""
    centroids = spark.read.parquet(out_path + "_centroids")
    rows = _assign_to_lists(new_emb.select("vec_id", "embedding"), centroids)
    snapshot_upsert(
        spark, out_path, rows, ["list_id", "vec_id"], "vec_id",
        n_buckets=n_buckets, bucket_cols=["list_id"],
        epoch_id=epoch_id, run_id=run_id,
    )


def ivf_snapshot_topk(
    spark: SparkSession,
    out_path: str,
    probe: list[float],
    k: int = 10,
    nprobe: int = 2,
    version: int | None = None,
) -> DataFrame:
    """ANN query against the snapshot index: route the probe to its
    ``nprobe`` nearest centroids, fetch ONLY those lists' buckets through
    the manifest (no directory listing, no other lists' files), exact
    cosine within them.  ``version`` pins a historical index state —
    time-travel ANN, e.g. reproducing yesterday's retrieval results
    after today's appends."""
    centroids = spark.read.parquet(out_path + "_centroids")
    probe_df = spark.createDataFrame(
        [([float(x) for x in probe],)], "q array<float>"
    )
    nearest = (
        centroids.join(F.broadcast(probe_df))
        .select("list_id", F.expr(_cos_expr("centroid", "q")).alias("cc"))
        .orderBy(F.col("cc").desc(), F.col("list_id"))
        .limit(nprobe)
    )
    pruned = read_touched_snapshot_buckets(
        spark, out_path, nearest.select("list_id"), version=version
    )
    return (
        pruned.join(F.broadcast(nearest.select("list_id")), "list_id")
        .join(F.broadcast(probe_df))
        .select("vec_id", F.expr(_cos_expr("embedding", "q")).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col("vec_id"))
        .limit(k)
    )
