"""Incremental IVF index on the snapshot layer
(operators/similarity_incremental.py): build-then-append equals
rebuild-with-the-same-centroids, nprobe=n_lists is exact over the
accumulated corpus, and probe reads stay manifest-pruned to the routed
lists' buckets."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from streamsum_spark import snapshots
from streamsum_spark.operators import similarity_incremental as si
from streamsum_spark.tables import table
from tests.conftest import SF_SMOKE

N_LISTS = 8
N_BUCKETS = 16


def _build_with_appends(spark, tmp_path):
    """Base = vec_id < 400, then two append batches (400..449, 450..499)."""
    emb = table(spark, SF_SMOKE, "embeddings")
    path = str(tmp_path / "ivf")
    si.build_ivf_snapshot(
        spark, SF_SMOKE, path, n_lists=N_LISTS, n_buckets=N_BUCKETS,
        base=emb.where(F.col("vec_id") < 400),
    )
    for lo, hi, ep in ((400, 450, 0), (450, 500, 1)):
        si.ivf_snapshot_append(
            spark, path,
            emb.where((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)),
            n_buckets=N_BUCKETS, epoch_id=ep, run_id="t",
        )
    return emb, path


def test_append_equals_rebuild_with_same_centroids(spark, tmp_path):
    emb, path = _build_with_appends(spark, tmp_path)
    # a full one-shot assignment with the SAME frozen centroids
    centroids = spark.read.parquet(path + "_centroids")
    want = {
        (r.list_id, r.vec_id)
        for r in si._assign_to_lists(
            emb.select("vec_id", "embedding"), centroids
        ).collect()
    }
    got = {
        (r.list_id, r.vec_id)
        for r in snapshots.read_snapshot(spark, path).collect()
    }
    assert got == want and len(got) == 500
    # replaying an append epoch is a no-op (same run, same epoch)
    si.ivf_snapshot_append(
        spark, path, emb.where(F.col("vec_id") >= 450),
        n_buckets=N_BUCKETS, epoch_id=1, run_id="t",
    )
    assert snapshots._latest_version(path) == 3  # no 4th version


def test_full_probe_is_exact_and_small_nprobe_recalls(spark, tmp_path):
    emb, path = _build_with_appends(spark, tmp_path)
    from streamsum_spark.functions.expressions import cosine_expr

    probe_rows = emb.where(F.col("vec_id").isin([0, 450])).collect()
    for pr in probe_rows:
        q = [float(x) for x in pr.embedding]
        exact = (
            emb.join(F.broadcast(spark.createDataFrame([(q,)], "q array<float>")))
            .select("vec_id", F.expr(cosine_expr("embedding", "q")).alias("cos"))
            .orderBy(F.col("cos").desc(), F.col("vec_id"))
            .limit(11)
        )
        exact_ids = [r.vec_id for r in exact.collect()]
        # nprobe = n_lists degenerates to exact k-NN over base+appended
        got = [
            r.vec_id
            for r in si.ivf_snapshot_topk(
                spark, path, q, k=11, nprobe=N_LISTS
            ).collect()
        ]
        assert got == exact_ids
        # small nprobe keeps useful recall (geometric lists)
        approx = {
            r.vec_id
            for r in si.ivf_snapshot_topk(spark, path, q, k=11, nprobe=2).collect()
        }
        assert len(approx & set(exact_ids)) / 11 >= 0.5


def test_probe_reads_only_routed_buckets(spark, tmp_path):
    emb, path = _build_with_appends(spark, tmp_path)
    q = [float(x) for x in emb.where(F.col("vec_id") == 3).collect()[0].embedding]
    got = si.ivf_snapshot_topk(spark, path, q, k=5, nprobe=2)
    got.collect()
    head, buckets = snapshots._resolve_buckets(
        path, snapshots._latest_version(path)
    )
    all_gens = {
        (b, n) for b, names in buckets.items() for n in names
    }
    # inputFiles also lists the centroid/probe side; keep the index files
    opened = {
        (f.rsplit("/", 2)[-2].split("=")[1], os.path.basename(f))
        for f in got.inputFiles()
        if "/kb=" in f and os.path.basename(f).startswith("gen-")
    }
    assert 0 < len(opened) < len(all_gens)  # strictly pruned
    # recompute the probe's 2 routed lists -> their buckets' files are
    # the only legal reads
    from streamsum_spark.functions.expressions import cosine_expr
    from streamsum_spark.sinks import _with_kb

    centroids = spark.read.parquet(path + "_centroids")
    probe_df = spark.createDataFrame([(q,)], "q array<float>")
    nearest = (
        centroids.join(F.broadcast(probe_df))
        .select("list_id", F.expr(cosine_expr("centroid", "q")).alias("cc"))
        .orderBy(F.col("cc").desc(), F.col("list_id"))
        .limit(2)
    )
    kbs = {
        r.kb
        for r in _with_kb(nearest.select("list_id"), ["list_id"], N_BUCKETS)
        .select("kb")
        .collect()
    }
    allowed = {
        (str(b), n) for b in kbs for n in buckets.get(str(b), [])
    }
    assert opened <= allowed


def test_time_travel_probe_reproduces_pre_append_results(spark, tmp_path):
    """version=1 queries the BASE index even after appends — yesterday's
    retrieval, bit-for-bit, while the live index has moved on."""
    emb, path = _build_with_appends(spark, tmp_path)
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).collect()[0].embedding]
    v1 = {
        r.vec_id
        for r in si.ivf_snapshot_topk(
            spark, path, q, k=10, nprobe=N_LISTS, version=1
        ).collect()
    }
    assert all(v < 400 for v in v1)  # appended vectors are invisible at v1
    live = {
        r.vec_id
        for r in si.ivf_snapshot_topk(spark, path, q, k=10, nprobe=N_LISTS).collect()
    }
    assert v1 != live or all(v < 400 for v in live)


def test_rebuild_over_live_index_refuses(spark, tmp_path):
    """Retraining writes NEW centroids; merging their postings onto the
    old index would strand stale rows under old lists — refused."""
    import pytest

    emb, path = _build_with_appends(spark, tmp_path)
    with pytest.raises(ValueError, match="fresh path"):
        si.build_ivf_snapshot(
            spark, SF_SMOKE, path, n_lists=N_LISTS, n_buckets=N_BUCKETS
        )
