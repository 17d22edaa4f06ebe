"""SemDeDup-style semantic dedup (similarity.semantic_dedup): keep-set
pinned against a pure-Python reference over the SAME cluster
assignments (within-cluster sequential-fold cosine, half-up round(6),
union-find groups, farthest-from-centroid exemplar), plus structural
invariants and the max_list cap."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from streamsum_spark.operators import similarity as sim

SF_SMOKE = "/root/testdata/sf0.001"
# the synthetic embeddings are near-orthogonal (max pairwise cosine
# ~0.48), so the non-vacuous pin threshold sits below a production 0.9+
THRESHOLD = 0.42


def _round6(x: float) -> float:
    """Spark's round(): HALF_UP on the 1e-6 grid (python round is
    banker's — not the same function)."""
    return math.floor(x * 1e6 + 0.5) / 1e6 if x >= 0 else -math.floor(-x * 1e6 + 0.5) / 1e6


def _cos(a, b) -> float:
    """The exact sequential double fold cosine_expr evaluates."""
    dot = na = nb = 0.0
    for x, y in zip(a, b):
        dot += float(x) * float(y)
    for x in a:
        na += float(x) * float(x)
    for y in b:
        nb += float(y) * float(y)
    return _round6(dot / (math.sqrt(na) * math.sqrt(nb)))


class _UF:
    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


@pytest.fixture(scope="module")
def fixture(spark):
    index = sim.kmeans_ivf_index(spark, SF_SMOKE, n_lists=8)
    out = {
        r.vec_id: r
        for r in sim.semantic_dedup(
            spark, SF_SMOKE, threshold=THRESHOLD, index=index
        ).collect()
    }
    assignments = {r.vec_id: r.list_id for r in index[0].collect()}
    centroids = {r.list_id: list(r.centroid) for r in index[1].collect()}
    from streamsum_spark.tables import table

    emb = {
        r.vec_id: list(r.embedding)
        for r in table(spark, SF_SMOKE, "embeddings").collect()
    }
    return out, assignments, centroids, emb


def test_keep_set_matches_python_reference(fixture):
    out, assignments, centroids, emb = fixture
    assert set(out) == set(emb)  # one row per corpus vector
    by_list: dict[int, list[int]] = {}
    for v, l in assignments.items():
        by_list.setdefault(l, []).append(v)
    uf = _UF()
    paired = set()
    for l, vs in by_list.items():
        vs.sort()
        for i, va in enumerate(vs):
            for vb in vs[i + 1 :]:
                if _cos(emb[va], emb[vb]) >= THRESHOLD:
                    uf.union(va, vb)
                    paired |= {va, vb}
    groups: dict[int, list[int]] = {}
    for v in paired:
        groups.setdefault(uf.find(v), []).append(v)
    expect_drop = set()
    for root, vs in groups.items():
        cent = lambda v: _cos(emb[v], centroids[assignments[v]])
        keeper = min(vs, key=lambda v: (cent(v), v))
        expect_drop |= set(vs) - {keeper}
    assert len(groups) > 0, "fixture corpus produced no semantic dups"
    got_drop = {v for v, r in out.items() if not r.kept}
    assert got_drop == expect_drop
    # component ids match the union-find roots (smallest member)
    for root, vs in groups.items():
        for v in vs:
            assert out[v].component == min(uf.find(x) for x in vs)
    for v in set(emb) - paired:
        assert out[v].component is None and out[v].kept


def test_cent_cos_matches_reference(fixture):
    out, assignments, centroids, emb = fixture
    for v in list(emb)[:50]:
        assert out[v].cent_cos == pytest.approx(
            _cos(emb[v], centroids[assignments[v]]), abs=2e-6
        )


def test_max_list_cap_bypasses_fat_clusters(spark):
    """Vectors in clusters over the cap stay in the OUTPUT (one row per
    corpus vector is the contract) but bypass the pair join: they come
    back capped=true, kept=true, component=null."""
    index = sim.kmeans_ivf_index(spark, SF_SMOKE, n_lists=4)
    sizes = {
        r.list_id: r.n
        for r in index[0].groupBy("list_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    cap = sorted(sizes.values())[len(sizes) // 2]
    out = sim.semantic_dedup(
        spark, SF_SMOKE, threshold=THRESHOLD, index=index, max_list=cap
    ).collect()
    assert len(out) == sum(sizes.values())  # nothing silently dropped
    capped = [r for r in out if r.capped]
    assert {r.list_id for r in capped} == {l for l, n in sizes.items() if n > cap}
    assert all(r.kept and r.component is None for r in capped)


def test_default_cap_bounds_degenerate_cluster(spark):
    """r12 verdict item 2: a degenerate fit with one cluster holding 50%
    of the vectors must not run that cluster's quadratic pair join under
    the DERIVED default cap; the healthy clusters still dedup and the
    keep-set on them matches the per-cluster reference."""
    import numpy as np

    rng = np.random.default_rng(11)
    n, dim = 400, 8
    # one fat "cluster" of 200 near-identical vectors + 200 spread ones
    fat = rng.normal(0, 0.01, (n // 2, dim)) + np.ones(dim)
    rest = rng.normal(0, 1.0, (n // 2, dim))
    vecs = np.vstack([fat, rest])
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    # many lists -> derived cap = max(64, ceil(8 * 400 / 40)) = 80 < 200
    out = sim.semantic_dedup(
        spark, "", threshold=0.9, emb=emb, n_lists=40,
        cache_token="degenerate-test",
    ).collect()
    assert len(out) == n
    capped = [r for r in out if r.capped]
    # the fat cluster (>=200 members in one list under any fit that
    # groups the near-identical block) is over the 80-row derived cap
    assert len(capped) >= n // 2
    assert all(r.kept and r.component is None for r in capped)
    # un-capped vectors went through the pair join normally
    assert all(not r.capped or r.component is None for r in out)


def test_no_pairs_keeps_everything(spark):
    """A threshold above the corpus max cosine produces an empty pair
    relation — CC over zero edges, every vector kept, null components."""
    index = sim.kmeans_ivf_index(spark, SF_SMOKE, n_lists=8)
    out = sim.semantic_dedup(
        spark, SF_SMOKE, threshold=0.99, index=index
    ).collect()
    assert len(out) == 500
    assert all(r.kept and r.component is None for r in out)
