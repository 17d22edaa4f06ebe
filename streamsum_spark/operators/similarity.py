"""Similarity search over embedding columns (north-star extension).

Baseline: brute-force cosine top-k with array expressions — JVM-side
zip_with/aggregate folds, no Python, no explode.  Scale path: sign-LSH
bucketing (deterministic integer-arithmetic hyperplanes) so the candidate
set per query is a bucket, not the corpus; at 100 TB the bucket id is a
shuffle key and probes broadcast.

Cross-engine FP policy: embeddings are float32; both sides cast to DOUBLE
before the fold (DuckDB's list_cosine_similarity on FLOAT[] accumulates in
float32 and diverges ~1e-7 — casting to DOUBLE[] makes both engines run
the same sequential double fold), then round(6) pins the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streamsum_spark.tables import table

from streamsum_spark.functions.expressions import cosine_expr as _cos_expr  # noqa: E402
from streamsum_spark.functions.expressions import cosine_safe_expr as _cos_safe  # noqa: E402
from streamsum_spark.functions.expressions import dot_expr  # noqa: E402


class _Dot:
    """Back-compat .format shim over functions.expressions.dot_expr."""

    @staticmethod
    def format(a: str, b: str) -> str:
        return dot_expr(a, b)


_DOT = _Dot()


def similarity_topk(spark: SparkSession, sf_dir: str, probe_vec_id: int = 0, k: int = 20) -> DataFrame:
    """Exact cosine top-k against one probe vector (vec_id=0), deterministic
    tie-break on vec_id.  The probe joins in as a broadcast single row —
    the corpus scan never shuffles."""
    emb = table(spark, sf_dir, "embeddings")
    probe = emb.where(F.col("vec_id") == probe_vec_id).select(
        F.col("embedding").alias("q")
    )
    return (
        emb.join(F.broadcast(probe))
        .select("vec_id", F.expr(_cos_expr("embedding", "q")).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col("vec_id"))
        .limit(k)
    )


SIMILARITY_TOPK_SQL = """
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS q FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       round(list_dot_product(CAST(embedding AS DOUBLE[]), q)
             / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
                * sqrt(list_dot_product(q, q))), 6) AS cos
FROM embeddings, q
ORDER BY cos DESC, vec_id
LIMIT 20
"""


def knn_per_probe(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Batch k-NN: for each probe (vec_id % 25 == 0), top-k neighbors by
    cosine within the same label block.  Label blocking is the partition
    key — the quadratic term is per-block, and WindowGroupLimit keeps only
    k rows per probe through the sort.

    Join strategy: the probe set is a fixed FRACTION of the corpus (not a
    bounded table), so it must never broadcast — at 100 TB that side is
    itself terabytes.  The SHUFFLE_HASH hint forces a shuffled hash join
    keyed on the label block: both sides repartition by ``label``, each
    block joins locally, nothing is collected to the driver or replicated
    to every executor.  (Exact single-probe top-k with a genuinely tiny
    broadcast side stays available as ``similarity_topk``.)"""
    emb = table(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("probe_id"), F.col("label").alias("p_label"),
        F.col("embedding").alias("q"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        emb.join(
            probes.hint("shuffle_hash"),
            (F.col("label") == F.col("p_label")) & (F.col("vec_id") != F.col("probe_id")),
        )
        .select("probe_id", "vec_id", F.expr(_cos_expr("embedding", "q")).alias("cos"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("probe_id", "vec_id", "cos", F.col("rn").cast("long").alias("rn"))
    )


KNN_PER_PROBE_SQL = """
WITH probes AS (
    SELECT vec_id AS probe_id, label AS p_label, CAST(embedding AS DOUBLE[]) AS q
    FROM embeddings WHERE vec_id % 25 = 0
), scored AS (
    SELECT probe_id, e.vec_id,
           round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q)
                 / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
                    * sqrt(list_dot_product(q, q))), 6) AS cos
    FROM embeddings e JOIN probes ON e.label = p_label AND e.vec_id != probe_id
)
SELECT probe_id, vec_id, cos, CAST(rn AS BIGINT) AS rn FROM (
    SELECT probe_id, vec_id, cos,
           row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS rn
    FROM scored
) WHERE rn <= 3
"""


# --- sign-LSH scale path ----------------------------------------------------

# 4 planes -> 16 buckets: the FLOOR of the auto-scaling rule below, sized so
# buckets hold enough candidates at the test SFs.  Callers that pass
# n_planes=None get auto_n_planes(corpus) instead of this constant.
N_PLANES = 4
_DIM = 64

# expected bucket size the auto rule targets: small enough that the
# per-bucket quadratic term (bucket² cosine verifies) stays cheap, large
# enough that near neighbors still collide.
TARGET_BUCKET = 256


def auto_n_planes(corpus_rows: int, target_bucket: int = TARGET_BUCKET) -> int:
    """Plane count scaled to the corpus: 2^planes buckets sized so the
    EXPECTED bucket is ``target_bucket`` vectors —
    ``max(N_PLANES, ceil(log2(corpus/target_bucket)))``.

    This is the knob the per-bucket quadratic depends on: candidate work
    is Σ bucket² ≈ corpus·E[bucket], so holding E[bucket] constant keeps
    candidate generation LINEAR in the corpus instead of quadratic — a
    100 TB corpus (~10¹⁰ vectors) lands at ~25 planes rather than the
    toy floor of 4.  Pure arithmetic so it is testable without a corpus."""
    import math

    if corpus_rows <= target_bucket:
        return N_PLANES
    return max(N_PLANES, math.ceil(math.log2(corpus_rows / target_bucket)))


def _plane_expr(j: int) -> str:
    """Deterministic pseudo-random hyperplane j: integer arithmetic only
    (exact in both engines; no libm calls whose last ulp could differ).
    plane[i] = ((j*73856093 + i*19349663 + 83492791) % 2000) / 1000 - 1."""
    return (
        f"transform(sequence(0, {_DIM - 1}), "
        f"i -> CAST((({j} * 73856093 + i * 19349663 + 83492791) % 2000) AS DOUBLE) / 1000.0 - 1.0)"
    )


def lsh_bucket_df(
    emb: DataFrame,
    n_planes: int | None = N_PLANES,
    target_bucket: int = TARGET_BUCKET,
) -> DataFrame:
    """Sign-LSH bucket ids over an arbitrary embeddings relation (must have
    ``vec_id``, ``embedding`` and optionally ``label``).  ``n_planes=None``
    resolves via auto_n_planes(count) — one metadata-cheap count job,
    amortized over the whole candidate-generation pass it configures."""
    if n_planes is None:
        n_planes = auto_n_planes(emb.count(), target_bucket)
    bits = " + ".join(
        f"(CASE WHEN {_DOT.format(a='embedding', b=_plane_expr(j))} > 0 "
        f"THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for j in range(n_planes)
    )
    cols = ["vec_id"] + (
        [F.col("label").cast("long").alias("label")] if "label" in emb.columns else []
    )
    return emb.select(*cols, F.expr(f"CAST({bits} AS BIGINT)").alias("bucket"))


def lsh_bucket(
    spark: SparkSession,
    sf_dir: str,
    n_planes: int | None = N_PLANES,
    target_bucket: int = TARGET_BUCKET,
) -> DataFrame:
    """Sign-LSH bucket id per vector: bit j = sign(embedding . plane_j).
    Bucketing is a pure projection; similar vectors land in equal buckets,
    turning ANN into an equi-join/groupBy on bucket.

    ``n_planes`` is the scale knob: buckets = 2^planes, so the expected
    bucket size |corpus|/2^planes.  Pass ``None`` to size it from the
    corpus via auto_n_planes (the production default — keeps expected
    bucket size at ``target_bucket`` at any scale; a 100 TB corpus wants
    20+ planes, where the explicit default 4 is sized for the test SFs).
    More planes narrow candidates monotonically (each added plane splits
    existing buckets), pinned in tests/test_similarity_quality.py."""
    return lsh_bucket_df(table(spark, sf_dir, "embeddings"), n_planes, target_bucket)


def ann_lsh_topk(spark: SparkSession, sf_dir: str, probe_vec_id: int = 0, k: int = 10) -> DataFrame:
    """ANN top-k: exact cosine only within the probe's LSH bucket."""
    emb = table(spark, sf_dir, "embeddings")
    buckets = lsh_bucket(spark, sf_dir).select("vec_id", "bucket")
    with_b = emb.join(buckets, "vec_id")
    probe = with_b.where(F.col("vec_id") == probe_vec_id).select(
        F.col("embedding").alias("q"), F.col("bucket").alias("p_bucket")
    )
    return (
        with_b.join(F.broadcast(probe), F.col("bucket") == F.col("p_bucket"))
        .where(F.col("vec_id") != probe_vec_id)
        .select("vec_id", F.expr(_cos_expr("embedding", "q")).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col("vec_id"))
        .limit(k)
    )


def ann_lsh_multiprobe_topk(
    spark: SparkSession,
    sf_dir: str,
    probe_vec_id: int = 0,
    k: int = 10,
    flip_bits: int = 1,
) -> DataFrame:
    """Multi-probe sign-LSH: probe the query's own bucket PLUS every
    bucket within Hamming distance ``flip_bits`` of it (standard
    multi-probe LSH: a vector near a hyperplane falls on the wrong side
    of that one bit, so its bucket differs from the query's in exactly
    that bit).

    The probed bucket ids are a tiny generated relation (1 + planes
    buckets for flip_bits=1) — explode + equi-join on bucket, so the
    corpus-side plan is identical to single-probe: bucket stays the
    shuffle/partition key and the scan prunes to the probed buckets.
    Recall vs single-probe is pinned in tests/test_similarity_quality.py."""
    assert flip_bits in (0, 1), "flip_bits > 1 not needed at these plane counts"
    emb = table(spark, sf_dir, "embeddings")
    buckets = lsh_bucket(spark, sf_dir).select("vec_id", "bucket")
    with_b = emb.join(buckets, "vec_id")
    flips = [0] + ([1 << j for j in range(N_PLANES)] if flip_bits else [])
    probe = with_b.where(F.col("vec_id") == probe_vec_id).select(
        F.col("embedding").alias("q"),
        F.explode(
            F.array(*[F.expr(f"CAST(bucket ^ {m} AS BIGINT)") for m in flips])
        ).alias("p_bucket"),
    )
    return (
        with_b.join(F.broadcast(probe), F.col("bucket") == F.col("p_bucket"))
        .where(F.col("vec_id") != probe_vec_id)
        .select("vec_id", F.expr(_cos_expr("embedding", "q")).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col("vec_id"))
        .limit(k)
    )


def embedding_near_dupes(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.9,
    flip_bits: int = 1,
    n_planes: int | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS (the vector-space member of
    the dedup family, alongside MinHash/SimHash/Jaccard): candidates are
    vectors sharing a sign-LSH bucket — one side expanded to its
    Hamming-``flip_bits`` buckets so near-hyperplane pairs split across
    adjacent buckets are still candidates — then exact cosine verifies
    and ``threshold`` filters.  Output: (vec_a, vec_b, cos), vec_a < vec_b.

    Scale shape: the join key is the bucket id (equi-join, shuffle on
    bucket — a plan guard pins the absence of nested-loop/cartesian
    joins), so the quadratic term is per-bucket, never corpus-wide —
    the same candidates-then-verify architecture as near_dup_verified.
    ``n_planes=None`` (the default) sizes the plane count from the
    corpus via auto_n_planes, holding expected bucket size at
    TARGET_BUCKET so candidate work stays LINEAR in the corpus (the
    per-bucket quadratic is |corpus|²/2^planes; a fixed plane count
    would silently go quadratic at scale).  The
    lsh_candidate_pairs-style frequency cap handles residual hot
    buckets.
    The bucketed corpus feeds both sides of the self-join, so it is
    persisted once (Catalyst does not reuse exchanges across aliased
    self-join subtrees).  Precision is 1.0 by construction (every
    emitted pair is exactly verified); recall vs brute force is pinned
    in tests/test_similarity_quality.py."""
    from pyspark import StorageLevel

    assert flip_bits in (0, 1)
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    if n_planes is None:
        n_planes = auto_n_planes(emb.count())
    with_b = emb.join(
        lsh_bucket(spark, sf_dir, n_planes).select("vec_id", "bucket"), "vec_id"
    )
    if max_bucket is not None:
        # hot-bucket frequency cap (sign-LSH buckets skew on real data:
        # measured max bucket = 7% of a 20k-vector corpus at 8 planes)
        w = Window.partitionBy("bucket")
        with_b = (
            with_b.withColumn("_f", F.count(F.lit(1)).over(w))
            .where(F.col("_f") <= max_bucket)
            .drop("_f")
        )
    with_b = with_b.persist(StorageLevel.MEMORY_AND_DISK)
    flips = [0] + ([1 << j for j in range(n_planes)] if flip_bits else [])
    expanded = with_b.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.explode(
            F.array(*[F.expr(f"CAST(bucket ^ {m} AS BIGINT)") for m in flips])
        ).alias("bucket_b"),
    )
    return (
        with_b.join(
            expanded,
            (F.col("bucket") == F.col("bucket_b")) & (F.col("vec_id") < F.col("vec_b")),
        )
        .select(
            F.col("vec_id").alias("vec_a"),
            "vec_b",
            F.expr(_cos_expr("embedding", "emb_b")).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
        .dropDuplicates(["vec_a", "vec_b"])
    )


def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid, element-wise mean — the IVF coarse quantizer
    building block.  Row form (label, idx, c) for stable oracle hashing;
    posexplode + hash agg (partial combine: the shuffle carries dim-sized
    partials, not vectors)."""
    emb = table(spark, sf_dir, "embeddings")
    return (
        emb.select(
            F.col("label").cast("long").alias("label"),
            F.posexplode("embedding").alias("pos", "val"),
        )
        .groupBy("label", (F.col("pos") + 1).cast("long").alias("idx"))
        .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("c"))
    )


EMBEDDING_CENTROIDS_SQL = """
SELECT CAST(label AS BIGINT) AS label, CAST(idx AS BIGINT) AS idx,
       round(avg(CAST(embedding[idx] AS DOUBLE)), 6) AS c
FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS idx)
GROUP BY label, idx
"""


# default cap on quantizer-training input: cluster geometry saturates long
# before this many points, and it bounds each Lloyd iteration to a constant
# amount of work regardless of corpus size.
FIT_SAMPLE_CAP = 100_000


def _bounded_fit_sample(df: DataFrame, cap: int | None, seed: int) -> DataFrame:
    """Deterministic bounded sample for quantizer training: order by a
    seeded hash of vec_id and take the first ``cap`` rows.

    TakeOrdered shape — each partition keeps its local top-``cap`` by
    hash, one merge produces the sample — so the pass over the corpus is
    a single projection+top-k, no full sort and no Bernoulli-sampling
    dependence on partition layout (same rows regardless of file split).
    At 100 TB this is the difference between Lloyd's iterations being
    dozens of full-corpus treeAggregate scans and being jobs over a
    bounded 100k-row relation that gives the same cluster geometry.

    Strict no-op when the corpus already fits under the cap: the
    reorder would otherwise perturb k-means|| initialization (init
    samples depend on row/partition order) and jitter the learned
    codebooks for zero benefit — the count that decides this is one
    cheap aggregate, amortized over the multi-iteration fit."""
    if cap is None or df.count() <= cap:
        return df
    return df.orderBy(F.xxhash64(F.col("vec_id") + F.lit(seed))).limit(cap)


# IVF list-count floor, and the expected list size past which the list
# count grows instead: below N_LISTS*TARGET_LIST rows the floor of 8 holds
# (so test-SF corpora keep the round-2 geometry and pins), above it the
# standard IVF rule n_lists ~= sqrt(corpus) applies — each probe then scans
# ~nprobe*sqrt(N) codes instead of nprobe*N/8.
N_LISTS = 8
TARGET_LIST = 1024


def auto_n_lists(corpus_rows: int, target_list: int = TARGET_LIST) -> int:
    """IVF coarse-list count scaled to the corpus (the twin of
    auto_n_planes for the k-means family): the floor of 8 until lists
    would exceed ``target_list`` expected rows, then ``isqrt(corpus)`` —
    at 10^10 vectors that is ~10^5 lists of ~10^5 codes, vs 8 lists of
    1.25*10^9 a fixed default would scan per probe.  Pure arithmetic so
    it is testable without a corpus."""
    import math

    if corpus_rows <= N_LISTS * target_list:
        return N_LISTS
    return math.isqrt(corpus_rows)


def _resolve_n_lists(spark: SparkSession, sf_dir: str, n_lists: int | None) -> int:
    """``n_lists=None`` -> auto_n_lists(corpus) from one metadata-cheap
    parquet count, amortized over the index build it configures."""
    if n_lists is not None:
        return n_lists
    return auto_n_lists(table(spark, sf_dir, "embeddings").count())


def kmeans_ivf_index(
    spark: SparkSession,
    sf_dir: str,
    n_lists: int | None = None,
    seed: int = 7,
    fit_sample_cap: int | None = FIT_SAMPLE_CAP,
    emb: DataFrame | None = None,
    max_iter: int = 20,
    return_model: bool = False,
) -> tuple[DataFrame, DataFrame] | tuple[DataFrame, DataFrame, object]:
    """Learned IVF coarse quantizer: k-means over the embedding space via
    pyspark.ml (the idiomatic Spark path — Lloyd's iterations are
    treeAggregate jobs, no driver-side loops over rows).

    Returns ``(assignments, centroids)``: (vec_id, list_id) and
    (list_id, centroid ARRAY<DOUBLE>).  Unlike the label-list quantizer
    (embedding_centroids), the lists are GEOMETRIC Voronoi cells, so a
    probe's true neighbors concentrate in its own + adjacent cells and
    small-nprobe recall is high (pinned in
    tests/test_similarity_quality.py::test_kmeans_ivf_beats_label_lists).

    100 TB posture: the fit runs on a seeded bounded sample
    (``fit_sample_cap``, default 100k — the quantizer needs only cluster
    geometry, and the cap bounds every Lloyd iteration regardless of
    corpus size); the centroid table is n_lists x dim — tiny by
    construction — and assignments are computed for the FULL corpus as a
    map-side projection; the corpus is then written partitioned by
    list_id so an nprobe-list query prunes to nprobe partitions.
    Pass ``emb`` (vec_id, embedding) to index a relation other than
    the sf_dir embeddings table — composite pipelines hand in derived
    embeddings directly.  ``return_model=True`` adds the fitted
    pyspark.ml KMeansModel as a third element — the handle a FREEZING
    caller persists (model.write().save) so later delta batches assign
    through the exact transform() the fit produced (the frozen-
    quantizer contract of similarity_incremental / FAISS add()).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if emb is None:
        n_lists = _resolve_n_lists(spark, sf_dir, n_lists)
        emb = table(spark, sf_dir, "embeddings")
    elif n_lists is None:
        n_lists = auto_n_lists(emb.count())
    feats = emb.select(
        "vec_id",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    )
    # max_iter bounds the Lloyd JOB COUNT (each iteration is a
    # treeAggregate job): consumers that need cluster GEOMETRY, not
    # convergence — SemDeDup's bucketing, a coarse IVF quantizer —
    # pass a small value and save most of the fit's wall-clock
    sample = _bounded_fit_sample(feats, fit_sample_cap, seed).persist()
    try:
        # clamp k to the sample: more centers than points crashes the
        # JVM aggregator with a bare AIOOBE, and a composed pipeline's
        # gated corpus can legitimately be tiny (the count is over the
        # BOUNDED sample, never the corpus)
        n_sample = sample.count()
        if n_sample == 0:
            raise ValueError(
                "cannot fit a k-means quantizer on an empty relation"
            )
        model = KMeans(
            k=min(n_lists, n_sample), seed=seed, maxIter=max_iter,
            featuresCol="features", predictionCol="list_id",
        ).fit(sample)
    finally:
        sample.unpersist(blocking=False)
    assignments = model.transform(feats).select(
        "vec_id", F.col("list_id").cast("long").alias("list_id")
    )
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "list_id long, centroid array<double>",
    )
    if return_model:
        return assignments, centroids, model
    return assignments, centroids


def ann_ivf_kmeans_topk(
    spark: SparkSession,
    sf_dir: str,
    probe_vec_id: int = 0,
    k: int = 10,
    nprobe: int = 2,
    n_lists: int | None = None,
    seed: int = 7,
) -> DataFrame:
    """IVF ANN over k-means lists: route the probe to its ``nprobe``
    nearest centroids, exact cosine only within those lists.  Same plan
    shape as ann_ivf_topk (broadcast centroid route -> pruned corpus scan
    -> top-k), with the learned quantizer in place of label lists."""
    emb = table(spark, sf_dir, "embeddings")
    assignments, centroids = kmeans_ivf_index(spark, sf_dir, n_lists, seed)
    probe = emb.where(F.col("vec_id") == probe_vec_id).select(
        F.col("embedding").alias("q")
    )
    nearest = (
        centroids.join(F.broadcast(probe))
        .select("list_id", F.expr(_cos_expr("centroid", "q")).alias("cc"))
        .orderBy(F.col("cc").desc(), F.col("list_id"))
        .limit(nprobe)
    )
    return (
        emb.join(assignments, "vec_id")
        .join(F.broadcast(nearest.select("list_id")), "list_id")
        .join(F.broadcast(probe))
        .where(F.col("vec_id") != probe_vec_id)
        .select("vec_id", F.expr(_cos_expr("embedding", "q")).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col("vec_id"))
        .limit(k)
    )


def write_embeddings_ivf(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    n_lists: int | None = None,
    seed: int = 7,
    quantize: bool = False,
) -> None:
    """Materialize the IVF storage layout: the corpus written
    ``partitionBy(list_id)`` (one directory per k-means cell) plus the
    centroid table at ``<out_path>_centroids``.

    This is the other half of IVF at 100 TB — the index is a LAYOUT, not
    just a plan: with lists as physical partitions, an nprobe-list query
    never opens the other lists' files at all (verified as a scan
    PartitionFilter in tests/test_ivf_layout.py), instead of filtering
    rows after reading everything.

    ``quantize=True`` stores int8 vectors (quantize_embeddings) instead
    of float32 — the production pairing: 4x smaller list partitions, and
    since cosine is scale-invariant the shared scale never needs to be
    read back at query time (the query's dot folds cast per-element to
    DOUBLE, so ARRAY<TINYINT> plugs straight into the same plan).

    Rows inside each list are CLUSTERED by ``loc_angle`` — the angle to
    the list's own centroid (sortWithinPartitions before write, bounded
    row-group size).  Angular distance is a metric on the sphere, so a
    min-cosine query can prune ROW GROUPS inside a probed list with the
    sound band |loc_angle - angle(probe, centroid)| <= arccos(min_cos):
    parquet min/max statistics on the sorted column skip every row group
    outside the band (pinned on the written files in
    tests/test_ivf_layout.py).  This is the z-order idea specialized to
    one dimension — for a single probe geometry the angle to the cell
    centroid IS the locality key; nothing higher-dimensional survives
    the sort."""
    assignments, centroids = kmeans_ivf_index(spark, sf_dir, n_lists, seed)
    if quantize:
        emb = quantize_embeddings(spark, sf_dir).select(
            "vec_id", F.col("q8").alias("embedding")
        )
    else:
        emb = table(spark, sf_dir, "embeddings")
    clustered = (
        emb.join(assignments, "vec_id")
        .join(F.broadcast(centroids), "list_id")
        .withColumn(
            "loc_angle",
            F.expr(
                "acos(greatest(-1.0d, least(1.0d, "
                + _cos_expr("embedding", "centroid")
                + ")))"
            ),
        )
        .drop("centroid")
        .repartition("list_id")
        .sortWithinPartitions("list_id", "loc_angle")
    )
    (
        clustered.write.mode("overwrite")
        # small row groups so min/max stats give sub-list granularity at
        # test scale; production tunes this toward the HDFS-block default
        .option("parquet.block.size", 16 * 1024)
        .partitionBy("list_id")
        .parquet(out_path)
    )
    centroids.write.mode("overwrite").parquet(out_path + "_centroids")


def ann_ivf_partitioned_topk(
    spark: SparkSession,
    corpus_path: str,
    sf_dir: str,
    probe_vec_id: int = 0,
    k: int = 10,
    nprobe: int = 2,
    min_cos: float | None = None,
) -> DataFrame:
    """ANN over the materialized IVF layout: route the probe to its
    ``nprobe`` nearest centroids, then scan ONLY those list partitions.

    The nearest-list ids are collected to the driver — deliberately: they
    are ``nprobe`` integers from the broadcast-sized centroid table, and a
    literal IN-list is what turns the list filter into a static partition
    filter the scan can prune on (the one place a collect is the
    scalable choice, exactly like a warehouse query pinning partition
    keys).

    ``min_cos``: only return results with cosine >= min_cos, AND use the
    bound to prune row groups inside each probed list: candidates above
    the threshold must lie within |loc_angle - angle(q, centroid)| <=
    arccos(min_cos) (triangle inequality for angular distance), and the
    layout's within-list loc_angle sort turns that band into parquet
    min/max row-group skips."""
    import math

    cents = spark.read.parquet(corpus_path + "_centroids")
    probe = table(spark, sf_dir, "embeddings").where(
        F.col("vec_id") == probe_vec_id
    ).select(F.col("embedding").alias("q"))
    routed = (
        cents.join(F.broadcast(probe))
        .select("list_id", F.expr(_cos_expr("centroid", "q")).alias("cc"))
        .orderBy(F.col("cc").desc(), F.col("list_id"))
        .limit(nprobe)
        .collect()
    )
    nearest = [r.list_id for r in routed]
    corpus = spark.read.parquet(corpus_path).where(F.col("list_id").isin(nearest))
    if min_cos is not None and "loc_angle" in corpus.columns:
        radius = math.acos(max(-1.0, min(1.0, min_cos)))
        band = None
        for r in routed:
            theta_pc = math.acos(max(-1.0, min(1.0, r.cc)))
            cond = (F.col("list_id") == r.list_id) & F.col("loc_angle").between(
                theta_pc - radius, theta_pc + radius
            )
            band = cond if band is None else (band | cond)
        corpus = corpus.where(band)
    scored = (
        corpus.join(F.broadcast(probe))
        .where(F.col("vec_id") != probe_vec_id)
        .select("vec_id", F.expr(_cos_expr("embedding", "q")).alias("cos"))
    )
    if min_cos is not None:
        scored = scored.where(F.col("cos") >= min_cos)
    return scored.orderBy(F.col("cos").desc(), F.col("vec_id")).limit(k)


def ann_ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    probe_vec_id: int = 0,
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """IVF-style ANN: route the probe to its ``nprobe`` nearest centroids
    (coarse quantization), then exact cosine only within those lists.  At
    scale the lists are partitions and the centroid table broadcasts — the
    corpus scan prunes to nprobe lists instead of ranking everything.

    Multi-probe (nprobe > 1) is the standard recall lever: a probe near a
    Voronoi boundary finds neighbors that fell into the adjacent list, at
    the cost of scanning nprobe/|lists| of the corpus.  Recall vs exact
    k-NN is pinned in tests/test_similarity_quality.py.  Centroid
    assignment is engine-internal => rows-only."""
    emb = table(spark, sf_dir, "embeddings")
    cents = (
        embedding_centroids(spark, sf_dir)
        .groupBy("label")
        .agg(F.expr("array_agg(struct(idx, c))").alias("_ic"))
        .select(
            "label",
            F.expr("transform(array_sort(_ic, (a, b) -> CAST(a.idx - b.idx AS INT)), x -> x.c)").alias(
                "centroid"
            ),
        )
    )
    probe = emb.where(F.col("vec_id") == probe_vec_id).select(
        F.col("embedding").alias("q")
    )
    nearest = (
        cents.join(F.broadcast(probe))
        .select("label", F.expr(_cos_expr("centroid", "q")).alias("cc"))
        .orderBy(F.col("cc").desc(), F.col("label"))
        .limit(nprobe)
    )
    return (
        emb.join(F.broadcast(nearest.select("label")), "label")
        .join(F.broadcast(probe))
        .where(F.col("vec_id") != probe_vec_id)
        .select("vec_id", F.expr(_cos_expr("embedding", "q")).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col("vec_id"))
        .limit(k)
    )


def ann_ivf_topk_exact_cover(
    spark: SparkSession,
    sf_dir: str,
    probe_vec_id: int = 0,
    k: int = 10,
) -> DataFrame:
    """The driver-declared form of ``ann_ivf_topk``: probed at
    ``nprobe = n_lists`` (every label list), where IVF degenerates to
    EXACT k-NN — so the full routing plan (centroid scoring, nearest-list
    ranking, list-pruned scan, top-k) runs end-to-end AND the result is
    hash-checkable against a brute-force DuckDB oracle
    (ANN_IVF_EXACT_COVER_SQL).  This closes the one driver slot that had
    no check at all: approximation quality at small nprobe stays
    separately recall-pinned in tests/test_similarity_quality.py; what
    this checks is that the IVF plumbing itself loses nothing.

    The list count is the corpus' distinct label count — one
    metadata-cheap aggregation, exactly the cardinality the coarse
    quantizer (embedding_centroids) produces."""
    n_lists = (
        table(spark, sf_dir, "embeddings").select("label").distinct().count()
    )
    return ann_ivf_topk(spark, sf_dir, probe_vec_id, k, nprobe=n_lists)


ANN_IVF_EXACT_COVER_SQL = """
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS q FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       round(list_dot_product(CAST(embedding AS DOUBLE[]), q)
             / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
                * sqrt(list_dot_product(q, q))), 6) AS cos
FROM embeddings, q
WHERE vec_id != 0
ORDER BY cos DESC, vec_id
LIMIT 10
"""


# --- scalar quantization (storage-side ANN lever) ---------------------------


def quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization: q[i] = round(x[i] * 127 / s)
    with s = the corpus-wide max |x[i]| (one tiny broadcast scalar).

    This is the storage half of ANN at scale — a 100 TB float32 corpus
    becomes 25 TB of int8 with ~1% cosine error, and the quantized column
    is what the IVF/LSH partitions actually persist.  Both passes are
    pure expressions: the scale is one max-aggregation (broadcast back as
    a 1-row join), the quantization a transform() projection.  Recall of
    brute-force top-k over DEquantized vectors vs float vectors is pinned
    in tests/test_similarity_quality.py."""
    emb = table(spark, sf_dir, "embeddings")
    scale = emb.agg(
        F.expr(
            "max(aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) -> greatest(a, abs(CAST(x AS DOUBLE)))))"
        ).alias("s")
    )
    return emb.join(F.broadcast(scale)).select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / s) AS TINYINT))"
        ).alias("q8"),
        "s",
    )


def similarity_topk_quantized(
    spark: SparkSession, sf_dir: str, probe_vec_id: int = 0, k: int = 20
) -> DataFrame:
    """Exact cosine top-k computed over the DEquantized int8 vectors —
    the fidelity check for quantize_embeddings (cosine is scale-invariant,
    so the shared scale cancels and only the rounding error remains)."""
    q = quantize_embeddings(spark, sf_dir)
    deq = q.select(
        "vec_id",
        F.expr("transform(q8, v -> CAST(v AS DOUBLE))").alias("embedding"),
    )
    probe = deq.where(F.col("vec_id") == probe_vec_id).select(
        F.col("embedding").alias("qv")
    )
    return (
        deq.join(F.broadcast(probe))
        .select("vec_id", F.expr(_cos_expr("embedding", "qv")).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col("vec_id"))
        .limit(k)
    )


# --- product quantization (the compact-code ANN path) -----------------------

PQ_SUBS = 8  # 64-dim -> 8 subvectors of 8 dims
PQ_CENTS = 16  # 4-bit codes per subvector -> 8 codes = 4 bytes/vector


def pq_train(
    spark: SparkSession,
    sf_dir: str,
    n_subs: int = PQ_SUBS,
    n_cents: int = PQ_CENTS,
    seed: int = 7,
    fit_sample_cap: int | None = FIT_SAMPLE_CAP,
    emb: DataFrame | None = None,
    cache_tag: str = "",
):
    """Train per-subvector k-means codebooks (one small pyspark.ml fit per
    subvector) and encode the corpus: returns ``(codes, codebooks)`` with
    codes = (vec_id, codes ARRAY<INT>) and codebooks = list of
    ``n_subs`` lists of ``n_cents`` centroid arrays.

    100 TB posture: codebooks train on ONE seeded bounded sample
    (``fit_sample_cap``, default 100k) shared by all ``n_subs`` fits —
    the sample is persisted so the corpus is scanned once for training,
    not once per subvector — and are tiny (subs x cents x subdim
    doubles); ENCODING runs over the full corpus as a map-side argmin
    projection; the encoded corpus is n_subs small ints per vector — a
    64x compression of float32x64 — and is what the partitioned/
    bucketed ANN layouts persist."""
    from pyspark import StorageLevel
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if emb is not None and not cache_tag:
        # the memo key cannot see a DataFrame's identity — an explicit emb
        # with the default tag would alias the default-corpus cache entry
        # and return stale codes for the wrong embedding set
        raise ValueError("pq_train: pass a non-empty cache_tag with an explicit emb")
    key = (spark.sparkContext.applicationId, sf_dir, n_subs, n_cents, seed, fit_sample_cap, cache_tag)
    if key in _PQ_CACHE:
        return _PQ_CACHE[key]
    if emb is None:
        emb = table(spark, sf_dir, "embeddings")
    fit_emb = _bounded_fit_sample(emb.select("vec_id", "embedding"), fit_sample_cap, seed)
    if fit_sample_cap is not None:
        fit_emb = fit_emb.persist(StorageLevel.MEMORY_AND_DISK)
    sub_dim = _DIM // n_subs

    def _sub_feats(src: DataFrame, j: int) -> DataFrame:
        return src.select(
            "vec_id",
            array_to_vector(
                F.expr(f"CAST(slice(embedding, {j * sub_dim + 1}, {sub_dim}) AS ARRAY<DOUBLE>)")
            ).alias("features"),
        )

    assigns = []
    books = []
    for j in range(n_subs):
        model = KMeans(
            k=n_cents, seed=seed + j, featuresCol="features", predictionCol="code"
        ).fit(_sub_feats(fit_emb, j))
        books.append([[float(x) for x in c] for c in model.clusterCenters()])
        assigns.append(
            model.transform(_sub_feats(emb, j)).select(
                "vec_id", F.lit(j).alias("sub"), F.col("code").cast("int").alias("code")
            )
        )
    if fit_sample_cap is not None:
        fit_emb.unpersist()
    allc = assigns[0]
    for a in assigns[1:]:
        allc = allc.unionByName(a)
    codes = (
        allc.groupBy("vec_id")
        .agg(F.expr("array_agg(struct(sub, code))").alias("_sc"))
        .select(
            "vec_id",
            F.expr(
                "transform(array_sort(_sc, (a, b) -> a.sub - b.sub), x -> x.code)"
            ).alias("codes"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # index building is OFFLINE at scale (train once, encode once, store);
    # memoizing per (session, corpus, params) mirrors that — repeated
    # queries must not refit 8 KMeans models
    _PQ_CACHE[key] = (codes, books)
    return codes, books


_PQ_CACHE: dict = {}


def _adc_score_expr(q, books) -> str:
    """The probe's per-subvector distance-to-centroid tables as LITERAL
    nested arrays, folded into one asymmetric-distance expression over a
    ``codes`` column: score = sum_j LUT[j][codes[j]].  Shared by the
    flat-PQ and IVFPQ query paths."""
    n_subs = len(books)
    sub_dim = len(q) // n_subs
    lut_rows = []
    for j in range(n_subs):
        qj = [float(x) for x in q[j * sub_dim : (j + 1) * sub_dim]]
        lut_rows.append(
            "array("
            + ", ".join(
                f"CAST({sum((a - b) ** 2 for a, b in zip(qj, c))!r} AS DOUBLE)"
                for c in books[j]
            )
            + ")"
        )
    lut = "array(" + ", ".join(lut_rows) + ")"
    return (
        f"aggregate(sequence(0, {n_subs - 1}), CAST(0.0 AS DOUBLE), "
        f"(acc, j) -> acc + element_at(element_at({lut}, j + 1), codes[j] + 1))"
    )


def pq_topk(
    spark: SparkSession,
    sf_dir: str,
    probe_vec_id: int = 0,
    k: int = 10,
    n_subs: int = PQ_SUBS,
    n_cents: int = PQ_CENTS,
    seed: int = 7,
    emb: DataFrame | None = None,
    cache_tag: str = "",
) -> DataFrame:
    """PQ ANN via asymmetric distance computation: the probe's per-sub
    distance-to-centroid tables become LITERAL nested arrays in the plan,
    so scoring the encoded corpus is a pure projection (one array lookup
    + add per subvector) — no join, no shuffle, and at scale it runs
    inside the scan over the stored codes column.  Returns approximate
    L2 top-k; recall vs exact L2 is pinned in
    tests/test_similarity_quality.py."""
    codes, books = pq_train(
        spark, sf_dir, n_subs, n_cents, seed, emb=emb, cache_tag=cache_tag
    )
    if emb is None:
        emb = table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == probe_vec_id).select("embedding").collect()[0][0]
    score = _adc_score_expr(q, books)
    return (
        codes.where(F.col("vec_id") != probe_vec_id)
        .select("vec_id", F.expr(score).alias("adist"))
        .orderBy(F.col("adist").asc(), F.col("vec_id"))
        .limit(k)
    )


def pq_topk_rerank(
    spark: SparkSession,
    sf_dir: str,
    probe_vec_id: int = 0,
    k: int = 10,
    shortlist: int = 50,
    emb: DataFrame | None = None,
    cache_tag: str = "",
) -> DataFrame:
    """PQ as deployed: the compact-code scan produces a ``shortlist`` of
    candidates (cheap, projection-only), then exact L2 re-ranks ONLY the
    shortlist against the float vectors (a broadcast semi-join of
    ``shortlist`` ids — the expensive vectors are touched for 50 rows,
    not the corpus).  Recall@10 is pinned >= the raw PQ ranking's in
    tests/test_similarity_quality.py (measured 0.4 -> 0.8 at
    shortlist=50 on the synthetic corpus).

    ``emb``/``cache_tag`` select an alternative (e.g. OPQ-rotated)
    encoding for the shortlist; the exact re-rank always runs on the
    ORIGINAL vectors — L2 is rotation-invariant, so the final ranking is
    comparable either way."""
    short = pq_topk(
        spark, sf_dir, probe_vec_id, k=shortlist, emb=emb, cache_tag=cache_tag
    ).select("vec_id")
    emb = table(spark, sf_dir, "embeddings")
    probe = emb.where(F.col("vec_id") == probe_vec_id).select(
        F.col("embedding").alias("q")
    )
    dist = (
        "aggregate(zip_with(CAST(embedding AS ARRAY<DOUBLE>), CAST(q AS ARRAY<DOUBLE>), "
        "(a, b) -> (a - b) * (a - b)), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    return (
        emb.join(F.broadcast(short), "vec_id")
        .join(F.broadcast(probe))
        .select("vec_id", F.expr(dist).alias("l2"))
        .orderBy(F.col("l2").asc(), F.col("vec_id"))
        .limit(k)
    )


# --- OPQ: optimized rotation before product quantization --------------------


def opq_rotation(
    spark: SparkSession,
    sf_dir: str,
    n_subs: int = PQ_SUBS,
    seed: int = 7,
    fit_sample_cap: int | None = FIT_SAMPLE_CAP,
    emb: DataFrame | None = None,
):
    """Eigenvalue-allocation rotation — the non-parametric OPQ
    initialization of Ge et al., "Optimized Product Quantization"
    (CVPR 2013): PCA the data, then deal principal directions to
    subspaces so each subquantizer sees a balanced variance PRODUCT
    (greedy: next-largest eigenvalue goes to the open subspace with the
    smallest running product).  PQ distortion is dominated by the
    highest-variance subspace, so balancing is most of full OPQ's win
    without the alternating codebook/rotation refinement.

    Returns a (dim x dim) numpy orthogonal matrix (rows = reordered
    eigenvectors).  Covariance comes from the SAME bounded fit sample
    the codebooks train on, collected to the driver — <= cap x dim
    floats (25 MB at the 100k default), a deliberate driver-side numpy
    computation, same posture as collecting nprobe centroid ids."""
    import numpy as np

    if emb is None:
        emb = table(spark, sf_dir, "embeddings")
    sample = _bounded_fit_sample(emb.select("embedding"), fit_sample_cap, seed)
    m = np.array([r.embedding for r in sample.collect()], dtype=np.float64)
    m -= m.mean(axis=0)
    evals, evecs = np.linalg.eigh(np.cov(m, rowvar=False))
    order = np.argsort(evals)[::-1]  # descending variance
    evals, evecs = evals[order], evecs[:, order]
    dim = m.shape[1]
    sub_dim = dim // n_subs
    log_prod = [0.0] * n_subs
    slots = [[] for _ in range(n_subs)]
    for i in range(dim):
        open_subs = [j for j in range(n_subs) if len(slots[j]) < sub_dim]
        j = min(open_subs, key=lambda s: log_prod[s])
        slots[j].append(i)
        log_prod[j] += float(np.log(max(evals[i], 1e-12)))
    perm = [i for sub in slots for i in sub]
    return evecs[:, perm].T  # rows: subspace 0's dims first, then 1's, ...


def rotate_embeddings(emb: DataFrame, rotation) -> DataFrame:
    """Apply a (dim x dim) rotation to the embedding column — one Arrow
    batch matmul per partition chunk (pandas_udf), the vectorized path
    for a dense linear map that per-element SQL expressions can't match."""
    import numpy as np
    import pandas
    from pyspark.sql.functions import pandas_udf

    rt = np.asarray(rotation, dtype=np.float64).T

    # explicit eval type: with `from __future__ import annotations` the
    # hint strings can't name function-local imports, so skip inference
    def _rot_fn(s):
        mat = np.array(s.tolist(), dtype=np.float64) @ rt
        return pandas.Series(mat.astype(np.float32).tolist())

    _rot_fn.__annotations__ = {"s": pandas.Series, "return": pandas.Series}
    _rot = pandas_udf(_rot_fn, "array<float>")
    return emb.withColumn("embedding", _rot(F.col("embedding")))


def opq_topk_rerank(
    spark: SparkSession,
    sf_dir: str,
    probe_vec_id: int = 0,
    k: int = 10,
    shortlist: int = 50,
    seed: int = 7,
) -> DataFrame:
    """pq_topk_rerank over the OPQ-rotated space: rotation is trained
    once from the bounded sample, the corpus is rotated (Arrow batch
    matmul) and PQ-encoded in the rotated space, the shortlist comes
    from rotated codes, and the exact re-rank runs on the ORIGINAL
    vectors (L2 is rotation-invariant).  Recall >= plain PQ is pinned on
    a correlated-covariance corpus in tests/test_similarity_quality.py —
    on isotropic data the rotation is a no-op by construction."""
    rot = opq_rotation(spark, sf_dir, seed=seed)
    rotated = rotate_embeddings(table(spark, sf_dir, "embeddings"), rot)
    return pq_topk_rerank(
        spark,
        sf_dir,
        probe_vec_id,
        k=k,
        shortlist=shortlist,
        emb=rotated,
        cache_tag=f"opq-{seed}",
    )


# --- IVFPQ: coarse routing + residual product quantization ------------------


def ivfpq_index(
    spark: SparkSession,
    sf_dir: str,
    n_lists: int | None = None,
    n_subs: int = PQ_SUBS,
    n_cents: int = PQ_CENTS,
    seed: int = 7,
):
    """The combined index (the IVFADC layout of Jégou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011): coarse
    k-means lists + PQ codebooks trained on RESIDUALS (x - centroid of
    x's list).  Residual encoding is what makes the combination work —
    residual magnitudes are a fraction of vector magnitudes, so the same
    code budget quantizes much finer near each centroid.

    Returns (assignments, centroids, codes, books).  All training obeys
    the bounded-sample posture (both fits go through pq_train /
    kmeans_ivf_index); encoding is a full-corpus map-side projection;
    at scale codes+list_id are what the partitioned layout stores."""
    n_lists = _resolve_n_lists(spark, sf_dir, n_lists)
    assignments, centroids = kmeans_ivf_index(spark, sf_dir, n_lists, seed)
    emb = table(spark, sf_dir, "embeddings")
    residuals = (
        emb.join(assignments, "vec_id")
        .join(F.broadcast(centroids), "list_id")
        .select(
            "vec_id",
            F.expr(
                "zip_with(CAST(embedding AS ARRAY<DOUBLE>), centroid, (a, b) -> a - b)"
            ).alias("embedding"),
        )
    )
    codes, books = pq_train(
        spark,
        sf_dir,
        n_subs,
        n_cents,
        seed,
        emb=residuals,
        cache_tag=f"ivfpq-{n_lists}-{seed}",
    )
    return assignments, centroids, codes, books


def ivfpq_topk(
    spark: SparkSession,
    sf_dir: str,
    probe_vec_id: int = 0,
    k: int = 10,
    nprobe: int = 2,
    shortlist: int = 50,
    n_lists: int | None = None,
    seed: int = 7,
) -> DataFrame:
    """IVFPQ query: route the probe to its ``nprobe`` nearest coarse
    centroids, ADC-score ONLY those lists' residual codes — each probed
    list gets its own literal LUT built from the probe's residual
    against THAT centroid — then exact-rerank the shortlist on the
    original float vectors.

    Plan shape: candidate scoring is a filtered projection over the
    codes relation (list filter + per-list CASE of literal LUTs, no
    join); the only joins are the two broadcast singletons (probe row,
    shortlist ids).  At 100 TB this runs over the IVF-partitioned code
    layout and opens nprobe partitions of 4-byte codes instead of the
    float corpus — the full IVFADC read path."""
    assignments, centroids, codes, books = ivfpq_index(
        spark, sf_dir, n_lists=n_lists, seed=seed
    )
    emb = table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == probe_vec_id).select("embedding").collect()[0][0]
    routed = (
        centroids.withColumn(
            "d2",
            F.expr(
                "aggregate(zip_with(centroid, "
                + "array(" + ", ".join(f"CAST({float(x)!r} AS DOUBLE)" for x in q) + "), "
                + "(a, b) -> (a - b) * (a - b)), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
            ),
        )
        .orderBy(F.col("d2").asc(), F.col("list_id"))
        .limit(nprobe)
        .collect()
    )
    # per-list ADC: LUT from the probe's residual against each probed centroid
    branches = " ".join(
        f"WHEN list_id = {r.list_id} THEN "
        + _adc_score_expr([a - b for a, b in zip([float(x) for x in q], r.centroid)], books)
        for r in routed
    )
    cand = (
        codes.join(assignments, "vec_id")
        .where(F.col("list_id").isin([r.list_id for r in routed]))
        .where(F.col("vec_id") != probe_vec_id)
        .select("vec_id", F.expr(f"CASE {branches} END").alias("adist"))
        .orderBy(F.col("adist").asc(), F.col("vec_id"))
        .limit(shortlist)
        .select("vec_id")
    )
    probe = emb.where(F.col("vec_id") == probe_vec_id).select(
        F.col("embedding").alias("q")
    )
    dist = (
        "aggregate(zip_with(CAST(embedding AS ARRAY<DOUBLE>), CAST(q AS ARRAY<DOUBLE>), "
        "(a, b) -> (a - b) * (a - b)), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    return (
        emb.join(F.broadcast(cand), "vec_id")
        .join(F.broadcast(probe))
        .select("vec_id", F.expr(dist).alias("l2"))
        .orderBy(F.col("l2").asc(), F.col("vec_id"))
        .limit(k)
    )


def write_embeddings_ivfpq(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    n_lists: int | None = None,
    n_subs: int = PQ_SUBS,
    n_cents: int = PQ_CENTS,
    seed: int = 7,
    block_size: int = 16 * 1024,
) -> None:
    """Materialize the full IVFADC storage layout: PQ residual codes
    partitioned by coarse list (``partitionBy(list_id)``), the centroid
    table at ``<out>_centroids``, and the codebooks at ``<out>_books.json``
    (subs x cents x subdim doubles — kilobytes, a driver-side artifact
    like the centroids).

    This is what an ANN serving layer stores at 100 TB: ~4 bytes of
    codes per vector inside list partitions (float vectors stay in the
    source table, touched only by the final rerank), so an nprobe query
    opens nprobe partitions of codes and reads the float corpus for
    ``shortlist`` rows.

    Codes are CLUSTERED by ``loc_angle`` inside each list — the original
    vector's angle to its list centroid, sorted within the partition with
    bounded row groups, exactly like the float layout
    (write_embeddings_ivf): a min-cosine query then prunes ROW GROUPS of
    codes with the sound band |loc_angle - angle(q, c)| <= arccos(min_cos)
    before reading them (ordered stats + prune pinned in
    tests/test_ivf_layout.py, same pins as the float path)."""
    import json

    assignments, centroids, codes, books = ivfpq_index(
        spark, sf_dir, n_lists=n_lists, n_subs=n_subs, n_cents=n_cents, seed=seed
    )
    emb = table(spark, sf_dir, "embeddings")
    loc = (
        emb.join(assignments, "vec_id")
        .join(F.broadcast(centroids), "list_id")
        .withColumn(
            "loc_angle",
            F.expr(
                "acos(greatest(-1.0d, least(1.0d, "
                + _cos_expr("embedding", "centroid")
                + ")))"
            ),
        )
        .select("vec_id", "loc_angle")
    )
    (
        codes.join(assignments, "vec_id")
        .join(loc, "vec_id")
        # one writer task per list: without this every input split emits a
        # file per partition dir and footer overhead swamps the 4-byte
        # codes (at scale, also the knob that bounds file count)
        .repartition("list_id")
        .sortWithinPartitions("list_id", "loc_angle")
        .write.mode("overwrite")
        # small row groups so min/max stats give sub-list granularity —
        # code rows are ~20 bytes, so the byte knob sits far lower than
        # the float layout's; production tunes toward the HDFS default
        .option("parquet.block.size", block_size)
        .partitionBy("list_id")
        .parquet(out_path)
    )
    centroids.write.mode("overwrite").parquet(out_path + "_centroids")
    with open(out_path + "_books.json", "w") as fh:
        json.dump(books, fh)


def ann_ivfpq_partitioned_topk(
    spark: SparkSession,
    corpus_path: str,
    sf_dir: str,
    probe_vec_id: int = 0,
    k: int = 10,
    nprobe: int = 2,
    shortlist: int = 50,
    min_cos: float | None = None,
) -> DataFrame:
    """IVFPQ over the materialized layout: route via the stored centroid
    table, scan ONLY the probed list partitions of 4-byte codes
    (PartitionFilters prune, pinned), ADC-score with per-list residual
    LUTs, exact-rerank the shortlist against the float source table.

    ``min_cos``: only return results with exact cosine >= min_cos, AND
    use the bound to prune ROW GROUPS of codes inside each probed list
    before reading them: a qualifying vector must lie within
    |loc_angle - angle(q, centroid)| <= arccos(min_cos) (angular triangle
    inequality), and the layout's within-list loc_angle sort turns that
    band into parquet min/max row-group skips — the float layout's prune
    (ann_ivf_partitioned_topk), carried to the compact-code path."""
    import json
    import math

    import numpy as np

    with open(corpus_path + "_books.json") as fh:
        books = json.load(fh)
    cents = spark.read.parquet(corpus_path + "_centroids")
    emb = table(spark, sf_dir, "embeddings")
    q = [
        float(x)
        for x in emb.where(F.col("vec_id") == probe_vec_id)
        .select("embedding")
        .collect()[0][0]
    ]
    # Routing distance: left-to-right double fold, bit-identical to the
    # Spark aggregate() the in-memory router uses — np.add.accumulate is
    # sequential BY DEFINITION (each prefix needs the previous, unlike
    # np.sum's pairwise tree), so the fold order matches exactly while
    # the per-centroid Python loop (O(n_lists x dim) driver float math,
    # r8 ADVICE) vectorizes across all centroids at once.
    cent_rows = cents.collect()
    if not cent_rows:
        # an empty centroid table routes nowhere; np broadcasting on a
        # (0,)-shaped matrix would raise instead of returning empty
        return (
            emb.select("vec_id", F.lit(0.0).alias("l2")).where(F.lit(False))
        )
    qv = np.asarray(q, dtype=np.float64)
    cmat = np.asarray([r.centroid for r in cent_rows], dtype=np.float64)
    # accumulate in place on the squared-diff buffer: same bit-identical
    # sequential fold, without materializing a second (n_lists x dim)
    # prefix matrix just to keep its last column
    sq = (qv[None, :] - cmat) ** 2
    np.add.accumulate(sq, axis=1, out=sq)
    d2 = sq[:, -1]
    routed = [
        r
        for _, _, r in sorted(
            (float(d2[i]), r.list_id, r) for i, r in enumerate(cent_rows)
        )
    ][:nprobe]
    branches = " ".join(
        f"WHEN list_id = {r.list_id} THEN "
        + _adc_score_expr([a - b for a, b in zip(q, r.centroid)], books)
        for r in routed
    )
    corpus = spark.read.parquet(corpus_path).where(
        F.col("list_id").isin([r.list_id for r in routed])
    )
    if min_cos is not None and "loc_angle" in corpus.columns:
        # the stored loc_angle is acos of the UNROUNDED JVM cosine; the
        # query-side cosine here uses the same float32 operands in the
        # same sequential order, so the two angles differ only by float
        # epsilon — 1e-6 rad slack covers it with orders of margin.
        # (A round(6) grid on either side would NOT be sound: d(acos) =
        # eps/sin(theta) blows a 5e-7 cosine rounding up to ~1e-3 rad
        # near the poles, enough to drop a qualifying row group.)
        radius = math.acos(max(-1.0, min(1.0, min_cos))) + 1e-6
        qn = math.sqrt(sum(x * x for x in q))
        band = None
        for r in routed:
            cn = math.sqrt(sum(x * x for x in r.centroid))
            cosqc = sum(a * b for a, b in zip(q, r.centroid)) / (qn * cn)
            theta = math.acos(max(-1.0, min(1.0, cosqc)))
            cond = (F.col("list_id") == r.list_id) & F.col("loc_angle").between(
                theta - radius, theta + radius
            )
            band = cond if band is None else (band | cond)
        corpus = corpus.where(band)
    cand = (
        corpus.where(F.col("vec_id") != probe_vec_id)
        .select("vec_id", F.expr(f"CASE {branches} END").alias("adist"))
        .orderBy(F.col("adist").asc(), F.col("vec_id"))
        .limit(shortlist)
        .select("vec_id")
    )
    probe = emb.where(F.col("vec_id") == probe_vec_id).select(
        F.col("embedding").alias("q")
    )
    dist = (
        "aggregate(zip_with(CAST(embedding AS ARRAY<DOUBLE>), CAST(q AS ARRAY<DOUBLE>), "
        "(a, b) -> (a - b) * (a - b)), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    reranked = (
        emb.join(F.broadcast(cand), "vec_id")
        .join(F.broadcast(probe))
        .select(
            "vec_id",
            F.expr(dist).alias("l2"),
            F.expr(_cos_expr("embedding", "q")).alias("cos"),
        )
    )
    if min_cos is not None:
        reranked = reranked.where(F.col("cos") >= min_cos)
    return (
        reranked.select("vec_id", "l2")
        .orderBy(F.col("l2").asc(), F.col("vec_id"))
        .limit(k)
    )


def ivfpq_knn_batch(
    spark: SparkSession,
    sf_dir: str,
    k: int = 10,
    nprobe: int = 2,
    shortlist: int = 50,
    n_lists: int | None = None,
    seed: int = 7,
    probe_modulus: int = 25,
) -> DataFrame:
    """Batched IVFPQ kNN: approximate top-k for a whole PROBE TABLE
    (vec_id % probe_modulus == 0) in one distributed pass — the bulk
    serving/offline-eval shape, vs the single-probe literal-LUT query.

    Plan: probes route against the broadcast centroid table (top-nprobe
    lists per probe through WindowGroupLimit); routed probes join the
    coded corpus on list_id — a SHUFFLE-HASH join like knn_per_probe,
    since the probe side is a fixed fraction of the corpus and must
    never broadcast; per-probe scoring is ONE applyInPandas group per
    probe: numpy builds the residual LUT once per (probe, list) and
    scores every candidate with a vectorized gather-sum (Arrow batches,
    no per-row Python); the per-probe ``shortlist`` then exact-reranks
    against the float vectors (per-pair L2, WindowGroupLimit top-k).
    Returns (probe_id, vec_id, l2, rn).  Recall vs exact L2 is pinned in
    tests/test_similarity_quality.py."""
    import numpy as np
    import pandas

    assignments, centroids, codes, books = ivfpq_index(
        spark, sf_dir, n_lists=n_lists, seed=seed
    )
    emb = table(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") % probe_modulus == 0).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("q")
    )
    d2 = (
        "aggregate(zip_with(centroid, CAST(q AS ARRAY<DOUBLE>), "
        "(a, b) -> (a - b) * (a - b)), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("d2").asc(), F.col("list_id"))
    routed = (
        probes.join(F.broadcast(centroids))
        .withColumn("d2", F.expr(d2))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= nprobe)
        .select("probe_id", "q", "list_id", "centroid")
    )
    coded = codes.join(assignments, "vec_id")
    cand = routed.join(coded.hint("shuffle_hash"), "list_id").where(
        F.col("vec_id") != F.col("probe_id")
    )

    bk = np.array(books, dtype=np.float64)  # (subs, cents, subdim)
    n_subs, n_cents, sub_dim = bk.shape

    # Chunked ADC scoring: mapInPandas streams Arrow batches, so task
    # memory is one batch of codes + the LUT, NOT a probe's whole
    # candidate set (nprobe x corpus/n_lists rows — unbounded as the
    # corpus grows).  Each chunk keeps only its local top-``shortlist``
    # per probe; top-k is monotone, so the global top-k is contained in
    # the union of chunk tops, and the window below re-reduces exactly.
    def score_chunks(batches) -> "pandas.DataFrame":
        for pdf in batches:
            if pdf.empty:
                continue
            outs = []
            for (_pid, cent), grp in pdf.groupby(
                ["probe_id", pdf["centroid"].map(tuple)], sort=False
            ):
                q = np.array(grp["q"].iloc[0], dtype=np.float64)
                res = (q - np.array(cent, dtype=np.float64)).reshape(n_subs, sub_dim)
                lut = ((bk - res[:, None, :]) ** 2).sum(axis=2)  # (subs, cents)
                cds = np.array(grp["codes"].tolist(), dtype=np.int64)  # (n, subs)
                adist = lut[np.arange(n_subs)[None, :], cds].sum(axis=1)
                outs.append(
                    pandas.DataFrame(
                        {"probe_id": grp["probe_id"], "vec_id": grp["vec_id"], "adist": adist}
                    )
                )
            allc = pandas.concat(outs, ignore_index=True)
            yield (
                allc.sort_values(["adist", "vec_id"], kind="mergesort")
                .groupby("probe_id", sort=False)
                .head(shortlist)
            )

    partial = cand.select("probe_id", "q", "centroid", "vec_id", "codes").mapInPandas(
        score_chunks, "probe_id long, vec_id long, adist double"
    )
    ws = Window.partitionBy("probe_id").orderBy(F.col("adist").asc(), F.col("vec_id"))
    short = (
        partial.withColumn("srn", F.row_number().over(ws))
        .where(F.col("srn") <= shortlist)
        .select("probe_id", "vec_id", "adist")
    )
    l2 = (
        "aggregate(zip_with(CAST(embedding AS ARRAY<DOUBLE>), CAST(q AS ARRAY<DOUBLE>), "
        "(a, b) -> (a - b) * (a - b)), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    wk = Window.partitionBy("probe_id").orderBy(F.col("l2").asc(), F.col("vec_id"))
    return (
        short.join(emb.select("vec_id", "embedding"), "vec_id")
        .join(probes, "probe_id")
        .select("probe_id", "vec_id", F.expr(l2).alias("l2"))
        .withColumn("rn", F.row_number().over(wk).cast("long"))
        .where(F.col("rn") <= k)
    )


def hashed_text_embeddings(
    docs: DataFrame,
    dim: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Deterministic feature-hashing embeddings (the hashing trick,
    Weinberger et al. 2009): each token lands in ``xxhash64(token) mod
    dim`` with a ±1 sign from an independent hash bit, summed and
    L2-normalized — a dense bag-of-words vector with no vocabulary, no
    model, and no shuffle (the fold is a pure per-row expression chain
    inside codegen; cost O(dim) per token, so keep ``dim`` modest).

    Output: (vec_id, embedding ARRAY<DOUBLE>) — the shape
    semantic_dedup / kmeans_ivf_index consume, which is exactly the
    role this plays in corpus_prep_e2e: giving a text-only corpus a
    semantic-dedup stage without an external encoder.  A production
    run swaps in real model embeddings through the same ``emb=``
    parameter; nothing downstream changes."""
    if dim < 2 or dim > 256:
        raise ValueError("dim must be in [2, 256]")
    # split('') yields [''] — drop empty tokens so blank text maps to
    # the zero vector, not a hashed empty-string bucket
    toks = f"filter(split(trim({text_col}), '\\\\s+'), t -> t != '')"
    signed = (
        f"aggregate({toks}, array_repeat(0.0D, {dim}), (acc, t) -> "
        f"transform(acc, (v, i) -> v + IF(pmod(xxhash64(t), {dim}) = i, "
        f"IF(pmod(xxhash64(concat(t, '#')), 2) = 0, 1.0D, -1.0D), 0.0D)))"
    )
    # ``carry`` columns ride through the fold projections so a composed
    # pipeline keeps the embedding NEXT TO its row instead of paying a
    # join-back on the id (everything here is one codegen'd projection
    # chain either way)
    raw = docs.select(
        F.col(id_col).alias("vec_id"),
        *[F.col(c) for c in carry],
        F.expr(signed).alias("_v"),
    ).withColumn(
        "_n", F.expr("sqrt(aggregate(_v, 0.0D, (s, x) -> s + x * x))")
    )
    return raw.select(
        "vec_id",
        *[F.col(c) for c in carry],
        F.expr(
            "CASE WHEN _n = 0.0D THEN _v ELSE transform(_v, x -> x / _n) END"
        ).alias("embedding"),
    )


def semantic_dedup(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.95,
    n_lists: int | None = None,
    max_list: int | None = None,
    index: tuple[DataFrame, DataFrame] | None = None,
    seed: int = 7,
    emb: DataFrame | None = None,
    cache_token: str | None = None,
    kmeans_max_iter: int = 20,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): k-means
    the embedding space, call vectors semantic duplicates when their
    cosine inside a shared cluster reaches ``threshold``, and keep ONE
    exemplar per duplicate group — the member FARTHEST from its cluster
    centroid (lowest centroid cosine; the paper's choice, keeping the
    least-prototypical example), ties to the smallest vec_id.

    Output: one row per corpus vector — (vec_id, list_id, cent_cos,
    component, kept).  ``component`` is the duplicate-group id (null for
    vectors with no semantic duplicate); exactly one row per component
    has kept=true, and every unpaired vector is kept.

    Scale shape: the pair join is an EQUI-join on list_id (per-cluster
    quadratic, never corpus-wide — the same candidates-then-verify
    architecture as every dedup operator here), with cluster count
    sized ~sqrt(N) by default so expected per-cluster work stays
    bounded.  ``max_list`` caps degenerate clusters exactly like the
    LSH hot-bucket caps, and it is ON BY DEFAULT (r12 verdict item 2):
    ``None`` derives 8x the mean list size (floored at 64), so a
    degenerate k-means fit (one giant cluster) cannot turn the
    within-cluster join quadratic in that cluster.  Unlike the LSH
    caps — which only narrow a PAIR relation — capped clusters'
    vectors stay in the output (one row per corpus vector is the
    contract): they bypass the pair join and come back kept=true,
    component=null, ``capped``=true, so a caller can count/log exactly
    which rows skipped semantic comparison.  Group resolution is the
    O(log^2 n) star CC, and exemplar selection is one window over the
    (small) duplicate set.  Pass ``index=(assignments, centroids)`` to
    reuse a prebuilt kmeans_ivf_index (composite pipelines build the
    quantizer once) and ``emb`` to dedup a relation other than the
    sf_dir embeddings table (with ``cache_token`` keying the persisted
    intermediate); the cosine fold and round(6) match the cross-engine
    FP policy, and the keep-set is pinned against a pure-Python
    reference over the same assignments in
    tests/test_semantic_dedup.py."""
    from streamsum_spark.operators.clusters import connected_components

    if index is None:
        index = kmeans_ivf_index(
            spark, sf_dir, n_lists=n_lists, seed=seed, emb=emb,
            max_iter=kmeans_max_iter,
        )
    assignments, centroids = index
    if emb is None:
        emb = table(spark, sf_dir, "embeddings")
    emb = emb.select("vec_id", "embedding")
    base = (
        emb.join(assignments, "vec_id")
        .join(F.broadcast(centroids), "list_id")
        .select(
            "vec_id",
            "list_id",
            "embedding",
            # zero-safe: a zero vector (e.g. a blank doc's hashed
            # embedding) has undefined cosine — it pairs with nothing
            # instead of throwing DIVIDE_BY_ZERO under ANSI mode
            F.expr(_cos_safe("embedding", "centroid")).alias("cent_cos"),
        )
        .withColumn(
            "_list_n", F.count(F.lit(1)).over(Window.partitionBy("list_id"))
        )
    )
    from streamsum_spark.cached import shared_persist

    base = shared_persist(("semdedup_lists", cache_token or sf_dir), base)
    if max_list is None:
        # 8x the mean list size: generous headroom for a healthy fit,
        # hard bound for a degenerate one.  Derived from the PERSISTED
        # relation: this count is the action that materializes the pin
        # every downstream consumer needs anyway — it does NOT re-run
        # the k-means transform as a separate pass (the centroid count
        # is a driver-built n_lists-row relation, trivial by
        # construction)
        n_vec = base.count()
        n_cl = max(centroids.count(), 1)
        max_list = max(64, -(-8 * n_vec // n_cl))
    # the cap column is a lazy comparison on top of the persisted base,
    # so an explicit max_list= pays no counting action at all
    full = base.withColumn("capped", F.col("_list_n") > F.lit(max_list)).drop(
        "_list_n"
    )
    with_l = full.where(~F.col("capped"))
    a, b = with_l.alias("a"), with_l.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.list_id") == F.col("b.list_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.expr(_cos_safe("a.embedding", "b.embedding")).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )
    comp = connected_components(pairs, "vec_a", "vec_b")
    wr = Window.partitionBy("component").orderBy(
        F.col("cent_cos").asc(), F.col("vec_id").asc()
    )
    ranked = (
        with_l.select("vec_id", "list_id", "cent_cos")
        .join(comp.withColumnRenamed("id", "vec_id"), "vec_id")
        .withColumn("kept", F.row_number().over(wr) == 1)
    )
    # the base is FULL — capped vectors surface as unpaired rows
    return (
        full.select("vec_id", "list_id", "cent_cos", "capped")
        .join(ranked.select("vec_id", "component", "kept"), "vec_id", "left")
        .select(
            "vec_id",
            "list_id",
            "cent_cos",
            "component",
            F.coalesce("kept", F.lit(True)).alias("kept"),
            "capped",
        )
    )
