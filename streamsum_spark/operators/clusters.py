"""Duplicate-cluster resolution: connected components over a near-dup
pair graph, and the keep-list (one representative per cluster) a dedup
run actually deletes against.

The pair generators (dedup.py, similarity.py) emit EDGES; transitive
identity needs components: if A~B and B~C, one of {A,B,C} survives even
though (A,C) was never emitted.

Spark-first design: iterative min-label propagation — each round every
vertex adopts the smallest component id among itself and its neighbors,
expressed as join + groupBy-min (both shuffle on vertex id, so AQE/
bucketing co-locate them).  Rounds needed = graph diameter (near-dup
clusters are shallow: dup groups are quasi-cliques, diameter 2-4); each
round ``localCheckpoint``s to truncate lineage — THE mandatory move for
iterative DataFrame algorithms (without it the plan doubles per round
and planning cost explodes by round ~10).  A 100 TB run swaps
localCheckpoint for a reliable checkpoint dir; the per-round dataflow is
unchanged.  Equivalence to union-find is pinned in
tests/test_dedup_clusters.py, including a worst-case path graph whose
diameter forces many rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# edge count at or below which component resolution runs as ONE
# bounded collect + driver union-find instead of iterative star rounds.
# Each star round costs ~4 shuffles + 2 actions regardless of size —
# on the small pair graphs a steady-state incremental cycle actually
# sees (dozens of verified duplicates), the rounds are pure scheduling
# overhead, ~5 s per resolution.  100k edges is ~1.6 MB collected —
# the same bounded-driver class as centroid/label collects; a 100 TB
# pair graph exceeds the cut and takes the distributed star path.
SMALL_CC_EDGES = 100_000


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 50,
    small_cut: int = SMALL_CC_EDGES,
) -> DataFrame:
    """(id, component) for every vertex appearing in ``pairs``; component
    = the smallest vertex id reachable from it.

    Default algorithm: alternating large-star/small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond") — O(log^2 n) rounds
    for ANY graph shape, vs the O(diameter) of naive label propagation
    (a 100 TB pair graph can hide million-hop chains).  Each half-round
    is one groupBy-min plus one join — no per-node neighbor lists are
    ever materialized, so a celebrity node with 10^9 neighbors costs a
    shuffle, not an OOM.  The min-label variant is kept as
    ``connected_components_minlabel`` and pinned equal in tests; the
    star form's round count is pinned LOGARITHMIC on a worst-case path
    graph (7 rounds for diameter 24).

    Graphs of at most ``small_cut`` edges resolve on the driver instead
    (union-find — value-identical, pinned): ONE bounded
    ``limit(small_cut+1)`` collect both decides the dispatch and feeds
    the fast path, so a small resolution costs a single Spark job.
    Pass ``small_cut=0`` to force the distributed path."""
    return _cc_star(pairs, src, dst, max_iter, small_cut)


def union_find_components(edges: list) -> list:
    """Pure driver-side union-find with min-id roots over an iterable of
    (small, big) edge tuples — returns [(vertex, component_min)].
    Attaching the larger root under the smaller keeps every root the
    true component minimum, matching the star algorithm's labels
    exactly (pinned in tests/test_dedup_clusters.py)."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for s, b in edges:
        parent.setdefault(s, s)
        parent.setdefault(b, b)
        rs, rb = find(s), find(b)
        if rs != rb:
            lo, hi = (rs, rb) if rs < rb else (rb, rs)
            parent[hi] = lo
    return [(v, find(v)) for v in parent]


def _cc_driver_union_find(spark, rows: list, edge_schema) -> DataFrame:
    """Union-find over an already-COLLECTED edge list — the small-graph
    fast path."""
    out = union_find_components([(row.s, row.b) for row in rows])
    id_type = edge_schema["s"].dataType
    from pyspark.sql import types as T

    from streamsum_spark.util import local_relation

    schema = T.StructType(
        [T.StructField("id", id_type), T.StructField("component", id_type)]
    )
    # LocalRelation: downstream filters/projections constant-fold and
    # their collects launch no job; the raw pairs ride along so callers
    # that keep working driver-side (drop-set derivation) skip Spark
    # entirely
    df = local_relation(spark, out, schema)
    df._streamsum_cc_pairs = out
    return df


def _cc_star(
    pairs: DataFrame,
    src: str,
    dst: str,
    max_iter: int,
    small_cut: int = 0,
) -> DataFrame:
    edges = (
        pairs.select(
            F.least(F.col(src), F.col(dst)).alias("s"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("s") != F.col("b"))
        .distinct()
    )
    spark = pairs.sparkSession
    global _last_cc_rounds
    _last_cc_rounds = 0

    if small_cut:
        # one bounded probe decides the dispatch AND feeds the fast
        # path: collect at most small_cut+1 edges — on the small graphs
        # a steady-state incremental cycle sees, this is the ONLY job
        # the whole resolution runs (no separate count, no star rounds;
        # one_shot_take scans all partitions in round one, where
        # executeTake's default escalation spends ~log4(partitions)
        # separate jobs discovering a small graph).  The LAZY checkpoint
        # BELOW the probe makes the probe's scan double as the star
        # path's materialization: a big graph pays ONE evaluation of
        # the edge-producing chain (probing first and eagerly
        # checkpointing after re-evaluated the whole chain — measured
        # 4-7x the first evaluation's cost on the uncapped verified-
        # pair chain at 10x scale, the sweep's superlinear flag), while
        # the small-graph dispatch still costs a single job.  Partition
        # coverage is guaranteed either way: round one spans the
        # session's parallelism, and LocalRDDCheckpointData completes
        # any partitions a satisfied limit skipped.
        from streamsum_spark.util import one_shot_take

        edges = edges.localCheckpoint(eager=False)
        probe = one_shot_take(edges, small_cut + 1)
        if len(probe) <= small_cut:
            # the probe materialized the checkpoint (MEMORY_AND_DISK
            # blocks) but the fast path never reads it again: release
            # the blocks now instead of waiting for driver GC +
            # ContextCleaner — a steady-state incremental loop calls
            # this every cycle (r15 ADVICE).
            from streamsum_spark.util import unpersist_checkpoint

            unpersist_checkpoint(edges)
            return _cc_driver_union_find(spark, probe, edges.schema)
    else:
        edges = edges.localCheckpoint()

    def checksum(e):
        r = e.agg(
            F.expr("bit_xor(xxhash64(s, b))").alias("x"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        return (r.x, r.n)

    prev = checksum(edges)
    for _ in range(max_iter):
        _last_cc_rounds += 1
        # LARGE-STAR: symmetrize; every strictly-larger neighbor of u
        # attaches to m(u) = min(neighbors(u) + u)
        sym = edges.select("s", "b").union(
            edges.select(F.col("b").alias("s"), F.col("s").alias("b"))
        )
        m = sym.groupBy("s").agg(F.least(F.first("s"), F.min("b")).alias("m"))
        ls = (
            sym.join(m, "s")
            .where(F.col("b") > F.col("s"))
            .select(F.least("b", "m").alias("s"), F.greatest("b", "m").alias("b"))
            .where(F.col("s") != F.col("b"))
            .distinct()
        )
        # SMALL-STAR: orient (big -> smaller neighbors); all of them plus
        # big itself attach to the minimum of that neighborhood
        m2 = ls.select(F.col("b").alias("u"), F.col("s").alias("v"))
        mm = m2.groupBy("u").agg(F.min("v").alias("m"))
        ss = (
            m2.join(mm, "u")
            .select(
                F.least("v", "m").alias("s"), F.greatest("v", "m").alias("b")
            )
            .union(
                mm.select(F.least("u", "m").alias("s"), F.greatest("u", "m").alias("b"))
            )
            .where(F.col("s") != F.col("b"))
            .distinct()
            .localCheckpoint()
        )
        cur = checksum(ss)
        edges = ss
        if cur == prev:
            break
        prev = cur
    # at the fixpoint every edge points directly at its component min
    verts = edges.select(F.col("b").alias("id"), F.col("s").alias("component"))
    roots = edges.select(F.col("s").alias("id")).distinct().withColumn(
        "component", F.col("id")
    )
    return (
        verts.union(roots)
        .groupBy("id")
        .agg(F.min("component").alias("component"))
    )


_last_cc_rounds = 0


def connected_components_minlabel(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """O(diameter) min-label propagation — kept as the semantic
    cross-check for the star algorithm (each round is simpler to reason
    about); both are pinned equal to union-find in tests.

    Convergence is checked with one tiny aggregation per round (count of
    vertices whose label shrank) — the loop is driver-side CONTROL FLOW
    only; all data stays distributed."""
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    comp = (
        edges.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # every vertex hears the component of each neighbor
        msgs = edges.join(
            comp.withColumnRenamed("id", "u"), "u"
        ).select(F.col("v").alias("id"), "component")
        new_comp = (
            comp.union(msgs)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        changed = (
            new_comp.alias("n")
            .join(comp.alias("o"), "id")
            .where(F.col("n.component") < F.col("o.component"))
            .count()
        )
        comp = new_comp
        if changed == 0:
            break
    return comp


def dedup_keep_list(pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b") -> DataFrame:
    """One row per duplicate cluster: (component, keep_id, cluster_size).
    ``keep_id`` is the smallest member — the deterministic survivor; every
    other member of the component is deletable."""
    comp = connected_components(pairs, src, dst)
    return comp.groupBy("component").agg(
        F.min("id").alias("keep_id"),
        F.count(F.lit(1)).cast("long").alias("cluster_size"),
    )


def dedup_corpus(spark, sf_dir: str, threshold: float = 0.2) -> DataFrame:
    """The full near-dup removal pipeline a 100 TB training-data run
    executes, end to end: MinHash signatures -> LSH candidate pairs ->
    exact Jaccard verify (near_dup_verified) -> connected components ->
    drop every clustered doc except its smallest member.

    Returns the SURVIVING documents (doc_id, lang, source).  The deletion
    join is a plain anti-join against the drop-list with NO broadcast
    hint: the drop-list is one row per deleted doc, which is O(corpus)
    by construction (a 90%-duplicate crawl makes it 90% of doc_ids), so
    forcing a broadcast would push billions of ids through the driver at
    100 TB.  Both sides hash-partition on doc_id; AQE picks broadcast
    only when the list really is small.  The corpus scan itself is
    touched exactly twice across the whole pipeline (once for
    signatures/verification, once for the final filter)."""
    from streamsum_spark.operators.dedup import near_dup_verified
    from streamsum_spark.tables import table

    pairs = near_dup_verified(spark, sf_dir, threshold=threshold)
    comp = connected_components(pairs)
    drops = comp.where(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id")
    )
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return docs.join(drops, "doc_id", "left_anti")


def corpus_prep(spark, sf_dir: str, budget: int = 2048) -> DataFrame:
    """The whole training-data preparation pipeline, composed end to end:

      quality filter (text_quality_score.keep)
      -> near-dup cluster removal (dedup_corpus survivors)
      -> language rebalance (stratified_sample membership)
      -> sequence packing over the survivors (pack_into_chunks)

    Returns (doc_id, n_tokens, part, chunk) for every surviving document.
    Each stage contributes only a doc_id keep-set.  Keep-sets are
    O(corpus) by construction (a quality keep-set is MOST of the corpus),
    so the joins carry no broadcast hint — every side hash-partitions on
    doc_id and AQE downgrades to broadcast only when a set really is
    small.  The text column is read exactly where it is needed
    (signature/verify inside dedup, token counts inside packing) and
    never shuffled between stages."""
    from streamsum_spark.operators.sampling import pack_into_chunks, stratified_sample
    from streamsum_spark.operators.text import text_quality_score

    quality_keep = text_quality_score(spark, sf_dir).where(F.col("keep")).select("doc_id")
    dedup_keep = dedup_corpus(spark, sf_dir).select("doc_id")
    sample_keep = stratified_sample(spark, sf_dir).select("doc_id")
    docs = table_docs(spark, sf_dir)
    survivors = (
        docs.join(quality_keep, "doc_id")
        .join(dedup_keep, "doc_id")
        .join(sample_keep, "doc_id")
    )
    return pack_into_chunks(spark, sf_dir, budget=budget, docs=survivors)


def table_docs(spark, sf_dir: str):
    from streamsum_spark.tables import table

    return table(spark, sf_dir, "documents").select("doc_id", "text")
