"""The IVF index as a STORAGE LAYOUT: corpus partitioned by k-means list,
query scans only the probed lists (physical partition pruning), and the
pruned result matches the in-memory IVF query over the same quantizer."""

from __future__ import annotations

import pytest

from streamsum_spark.operators import similarity as sim
from streamsum_spark.plans import inspect as plans
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def ivf_path(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ivf") / "embeddings_ivf")
    sim.write_embeddings_ivf(spark, SF_ORACLE, out)
    return out


def test_partitioned_scan_prunes_lists(spark, ivf_path):
    df = sim.ann_ivf_partitioned_topk(spark, ivf_path, SF_ORACLE, nprobe=2)
    plan = plans.explain_str(df)
    scan = plan[plan.find("PartitionFilters") :].split("]", 1)[0]
    assert "list_id" in scan, plan  # pruning happens at the scan, pre-read


def test_partitioned_result_matches_in_memory_ivf(spark, ivf_path):
    """Same quantizer (seed-pinned k-means), same nprobe => identical
    top-k whether the lists are physical partitions or an in-memory
    join."""
    on_disk = [
        (r.vec_id, r.cos)
        for r in sim.ann_ivf_partitioned_topk(spark, ivf_path, SF_ORACLE, nprobe=2).collect()
    ]
    in_mem = [
        (r.vec_id, r.cos)
        for r in sim.ann_ivf_kmeans_topk(spark, SF_ORACLE, nprobe=2).collect()
    ]
    assert on_disk == in_mem


def test_quantized_layout_smaller_and_recall_holds(spark, tmp_path_factory, ivf_path):
    """The int8 layout is materially smaller on disk than the float32
    one, the same pruned query runs over it unchanged, and its top-10
    keeps >= 0.8 overlap with the float layout's (quantization error
    budget)."""
    import os

    qout = str(tmp_path_factory.mktemp("ivfq") / "embeddings_ivf")
    sim.write_embeddings_ivf(spark, SF_ORACLE, qout, quantize=True)

    def du(path):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(path)
            for f in fs
        )

    assert du(qout) < 0.6 * du(ivf_path), (du(qout), du(ivf_path))
    fl = [r.vec_id for r in sim.ann_ivf_partitioned_topk(spark, ivf_path, SF_ORACLE, k=10).collect()]
    qz = [r.vec_id for r in sim.ann_ivf_partitioned_topk(spark, qout, SF_ORACLE, k=10).collect()]
    assert len(set(fl) & set(qz)) >= 8, (fl, qz)


def test_layout_covers_whole_corpus(spark, ivf_path):
    from streamsum_spark.tables import table

    n_src = table(spark, SF_ORACLE, "embeddings").count()
    n_out = spark.read.parquet(ivf_path).count()
    assert n_out == n_src


def _rg_stats(path, col="loc_angle"):
    """(min, max) per row group for every parquet file under a path."""
    import os

    import pyarrow.parquet as pq

    out = []
    for r, _, fs in os.walk(path):
        for f in fs:
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(r, f)).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx).statistics
                out.append((st.min, st.max))
    return out


def test_within_list_rows_clustered_by_loc_angle(spark, ivf_path):
    """The locality sort must be visible in the FILE STATISTICS: row
    groups inside each list partition carry tight, ordered loc_angle
    min/max ranges (this is what makes band predicates skip row groups
    without reading them)."""
    import os

    lists = [d for d in os.listdir(ivf_path) if d.startswith("list_id=")]
    assert len(lists) >= 4
    multi = 0
    for d in lists:
        stats = _rg_stats(os.path.join(ivf_path, d))
        assert stats  # statistics present on the sort column
        # within a file, groups are written in sorted order
        assert stats == sorted(stats)
        # and ranges are genuinely sub-list: each group covers a fraction
        lo, hi = min(s[0] for s in stats), max(s[1] for s in stats)
        if len(stats) > 1:
            multi += 1
            widest = max(s[1] - s[0] for s in stats)
            assert widest < 0.8 * (hi - lo) + 1e-9, (d, stats)
    assert multi >= 2  # the 16 KB row groups give sub-list granularity


@pytest.fixture(scope="module")
def clustered_ivf(spark, tmp_path_factory):
    """A corpus with real cluster structure (8 planted centroids, 2/3
    tight core + 1/3 wide halo per cluster) — the geometry where
    intra-list locality actually has something to prune.  (The sf0.01
    random vectors are near-orthogonal: every angle concentrates around
    pi/2 and no band can exclude anything — that corpus pins layout
    correctness above; this one pins the pruning payoff.)"""
    import os

    import numpy as np

    rng = np.random.default_rng(13)
    dim, k, per = 64, 8, 250
    cents = rng.normal(size=(k, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    rows, vid = [], 0
    for c in range(k):
        for j in range(per):
            sigma = 0.05 if j % 3 else 0.18
            v = cents[c] + rng.normal(scale=sigma, size=dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    sfdir = str(tmp_path_factory.mktemp("clustered_sf"))
    # single file/partition: the k-means fit then traverses identical
    # data in identical order no matter what earlier tests did to the
    # shared session — without this the fitted centroid geometry shifts
    # under full-suite session shapes and the row-group-skip pins flip
    # (same flake class as the OPQ pin, fixed the same way)
    spark.createDataFrame(rows, "vec_id long, embedding array<float>").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(sfdir, "embeddings.parquet"))
    out = str(tmp_path_factory.mktemp("clustered_ivf") / "embeddings_ivf")
    sim.write_embeddings_ivf(spark, sfdir, out)
    return sfdir, out


def test_band_predicate_skips_row_groups(spark, clustered_ivf):
    """A min-cosine band query must intersect strictly fewer row groups
    than the probed lists contain — the min/max stats make the skip
    decidable before any read — while still returning real results."""
    import math
    import os

    sfdir, out = clustered_ivf
    min_cos = 0.6
    got = sim.ann_ivf_partitioned_topk(
        spark, out, sfdir, k=500, nprobe=2, min_cos=min_cos
    ).collect()
    assert len(got) > 20  # the band keeps the probe's true neighborhood
    assert all(r.cos >= min_cos for r in got)
    # recompute the band the query used and count intersecting row groups
    cents = spark.read.parquet(out + "_centroids")
    q = (
        spark.read.parquet(os.path.join(sfdir, "embeddings.parquet"))
        .where(sim.F.col("vec_id") == 0)
        .select(sim.F.col("embedding").alias("q"))
    )
    routed = (
        cents.join(sim.F.broadcast(q))
        .select("list_id", sim.F.expr(sim._cos_expr("centroid", "q")).alias("cc"))
        .orderBy(sim.F.col("cc").desc(), sim.F.col("list_id"))
        .limit(2)
        .collect()
    )
    radius = math.acos(min_cos)
    total = hit = 0
    for r in routed:
        theta = math.acos(max(-1.0, min(1.0, r.cc)))
        for lo, hi in _rg_stats(os.path.join(out, f"list_id={r.list_id}")):
            total += 1
            if not (hi < theta - radius or lo > theta + radius):
                hit += 1
    assert total > hit, (total, hit)  # at least one row group is skipped


def test_min_cos_query_matches_unbanded(spark, clustered_ivf):
    """The angular band is a pure PRUNE: with the same nprobe lists, the
    banded query returns exactly the unbanded results at/above the
    threshold (triangle-inequality soundness on real data)."""
    sfdir, out = clustered_ivf
    plain = [
        (r.vec_id, r.cos)
        for r in sim.ann_ivf_partitioned_topk(spark, out, sfdir, k=500, nprobe=2).collect()
        if r.cos >= 0.6
    ]
    banded = [
        (r.vec_id, r.cos)
        for r in sim.ann_ivf_partitioned_topk(
            spark, out, sfdir, k=500, nprobe=2, min_cos=0.6
        ).collect()
    ]
    assert banded == plain and plain


def test_ivfpq_layout_matches_in_memory_and_prunes(spark, tmp_path_factory):
    """The stored IVFADC layout (codes partitioned by list + centroids +
    codebooks sidecar) must answer identically to the in-memory IVFPQ
    query, scan only the probed list partitions (PartitionFilters), and
    be materially smaller than the float corpus."""
    import os

    out = str(tmp_path_factory.mktemp("ivfpq") / "codes_ivfpq")
    sim.write_embeddings_ivfpq(spark, SF_ORACLE, out)

    on_disk_df = sim.ann_ivfpq_partitioned_topk(spark, out, SF_ORACLE, nprobe=2)
    plan = plans.explain_str(on_disk_df)
    scan = plan[plan.find("PartitionFilters") :].split("]", 1)[0]
    assert "list_id" in scan, plan

    on_disk = [(r.vec_id, r.l2) for r in on_disk_df.collect()]
    in_mem = [(r.vec_id, r.l2) for r in sim.ivfpq_topk(spark, SF_ORACLE, nprobe=2).collect()]
    assert on_disk == in_mem and on_disk

    def du(path):
        if os.path.isfile(path):
            return os.path.getsize(path)
        return sum(
            os.path.getsize(os.path.join(r, f)) for r, _, fs in os.walk(path) for f in fs
        )

    emb_bytes = du(os.path.join(SF_ORACLE, "embeddings.parquet"))
    assert du(out) < 0.5 * emb_bytes, (du(out), emb_bytes)


@pytest.fixture(scope="module")
def clustered_ivfpq(spark, clustered_ivf, tmp_path_factory):
    """The IVFADC layout over the clustered corpus, written with a small
    row-group knob (code rows are ~20 bytes, so sub-list stats
    granularity at test scale needs a lower byte bound than the float
    layout's 16 KB)."""
    sfdir, _ = clustered_ivf
    out = str(tmp_path_factory.mktemp("clustered_ivfpq") / "codes_ivfpq")
    sim.write_embeddings_ivfpq(spark, sfdir, out, block_size=2048)
    return sfdir, out


def test_ivfpq_rows_clustered_by_loc_angle(spark, clustered_ivfpq):
    """Same ordered min/max stats pin as the float layout
    (test_within_list_rows_clustered_by_loc_angle): the loc_angle sort
    must be visible in the CODE files' row-group statistics."""
    import os

    _, out = clustered_ivfpq
    lists = [d for d in os.listdir(out) if d.startswith("list_id=")]
    assert len(lists) >= 4
    multi = 0
    for d in lists:
        stats = _rg_stats(os.path.join(out, d))
        assert stats  # statistics present on the sort column
        assert stats == sorted(stats)  # groups written in sorted order
        lo, hi = min(s[0] for s in stats), max(s[1] for s in stats)
        if len(stats) > 1:
            multi += 1
            widest = max(s[1] - s[0] for s in stats)
            assert widest < 0.8 * (hi - lo) + 1e-9, (d, stats)
    assert multi >= 2


def _ivfpq_routed(spark, sfdir, out, nprobe=2):
    """Re-derive the query's routing (L2-nearest centroids) and each
    routed list's probe-centroid angle, exactly as the query computes
    them."""
    import math
    import os

    q = [
        float(x)
        for x in spark.read.parquet(os.path.join(sfdir, "embeddings.parquet"))
        .where(sim.F.col("vec_id") == 0)
        .select("embedding")
        .collect()[0][0]
    ]
    qn = math.sqrt(sum(x * x for x in q))

    def d2(c):
        return sum((a - b) * (a - b) for a, b in zip(q, c))

    cents = spark.read.parquet(out + "_centroids").collect()
    routed = sorted(cents, key=lambda r: (d2(r.centroid), r.list_id))[:nprobe]
    thetas = {}
    for r in routed:
        cn = math.sqrt(sum(x * x for x in r.centroid))
        cosqc = round(sum(a * b for a, b in zip(q, r.centroid)) / (qn * cn), 6)
        thetas[r.list_id] = math.acos(max(-1.0, min(1.0, cosqc)))
    return thetas


def test_ivfpq_band_predicate_skips_row_groups(spark, clustered_ivfpq):
    """A min-cosine band over the CODE layout must intersect strictly
    fewer row groups than the probed lists contain — decidable from the
    stats before any read — while still returning real results."""
    import math
    import os

    sfdir, out = clustered_ivfpq
    min_cos = 0.6
    got = sim.ann_ivfpq_partitioned_topk(
        spark, out, sfdir, k=500, nprobe=2, shortlist=2000, min_cos=min_cos
    ).collect()
    assert len(got) > 20

    thetas = _ivfpq_routed(spark, sfdir, out, nprobe=2)
    radius = math.acos(min_cos)
    total = hit = 0
    for list_id, theta in thetas.items():
        for lo, hi in _rg_stats(os.path.join(out, f"list_id={list_id}")):
            total += 1
            if not (hi < theta - radius or lo > theta + radius):
                hit += 1
    assert total > hit, (total, hit)  # at least one row group is skipped


def test_ivfpq_min_cos_matches_unbanded(spark, clustered_ivfpq):
    """The angular band on the code layout is a pure PRUNE: with the
    same nprobe lists and an untruncated shortlist, the banded query
    returns exactly the unbanded results whose exact cosine clears the
    threshold."""
    import os

    sfdir, out = clustered_ivfpq
    plain = [
        (r.vec_id, r.l2)
        for r in sim.ann_ivfpq_partitioned_topk(
            spark, out, sfdir, k=500, nprobe=2, shortlist=2000
        ).collect()
    ]
    emb = spark.read.parquet(os.path.join(sfdir, "embeddings.parquet"))
    probe = emb.where(sim.F.col("vec_id") == 0).select(
        sim.F.col("embedding").alias("q")
    )
    cos_of = {
        r.vec_id: r.cos
        for r in emb.join(sim.F.broadcast(probe))
        .select("vec_id", sim.F.expr(sim._cos_expr("embedding", "q")).alias("cos"))
        .collect()
    }
    expected = [(v, l2) for v, l2 in plain if cos_of[v] >= 0.6]
    banded = [
        (r.vec_id, r.l2)
        for r in sim.ann_ivfpq_partitioned_topk(
            spark, out, sfdir, k=500, nprobe=2, shortlist=2000, min_cos=0.6
        ).collect()
    ]
    assert banded == expected and expected


def test_vectorized_routing_fold_bit_identical_to_sequential():
    """ann_ivfpq_partitioned_topk routes on np.add.accumulate(...)[:, -1]
    — sequential by definition (each prefix needs the previous), so it
    must reproduce the driver's former per-centroid Python fold BIT FOR
    BIT on adversarial magnitudes (where np.sum's pairwise tree would
    differ in the last ulp and could flip a routing tie)."""
    import numpy as np

    rng = np.random.default_rng(3)
    # mix tiny and huge magnitudes so accumulation order matters
    q = (rng.standard_normal(64) * np.logspace(-8, 8, 64)).astype(np.float64)
    cents = (rng.standard_normal((37, 64)) * np.logspace(8, -8, 64)).astype(
        np.float64
    )
    vec = np.add.accumulate((q[None, :] - cents) ** 2, axis=1)[:, -1]
    for i in range(cents.shape[0]):
        acc = 0.0
        for a, b in zip(q.tolist(), cents[i].tolist()):
            acc += (a - b) * (a - b)
        assert float(vec[i]) == acc, i


def test_ivfpq_empty_centroid_table_returns_empty(spark, tmp_path_factory):
    """An empty centroid table routes nowhere: the query must return an
    empty (vec_id, l2) frame, not raise a numpy broadcast error from a
    (0, dim) routing matrix (r9 ADVICE)."""
    import json

    out = str(tmp_path_factory.mktemp("ivfpq_empty") / "layout")
    spark.createDataFrame(
        [], "list_id INT, centroid ARRAY<DOUBLE>"
    ).write.parquet(out + "_centroids")
    with open(out + "_books.json", "w") as fh:
        json.dump({}, fh)
    df = sim.ann_ivfpq_partitioned_topk(spark, out, SF_ORACLE, nprobe=2)
    assert df.columns == ["vec_id", "l2"] and df.count() == 0
