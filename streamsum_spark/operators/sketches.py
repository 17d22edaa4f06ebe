"""Sketch / heavy-hitter operators (north-star extension for the
training-data pipeline family).

Three scale postures, one per operator:

- ``heavy_hitters_exact``: the one-shuffle declarative form — groupBy with
  map-side partial combine, threshold against the grand total.  Right
  whenever the distinct-key relation fits a shuffle (it usually does:
  |keys| << |rows|).
- ``heavy_hitters_mg``: the bounded-memory two-pass form for when the key
  space itself is too large to aggregate exactly — phase 1 runs a
  Misra–Gries summary per partition inside Arrow batches (at most ``k``
  counters live at once, output <= partitions x k candidate rows), phase 2
  exact-counts ONLY the broadcast candidate set.  The per-partition
  guarantee composes by pigeonhole: a key with global count >= phi*N is
  phi-heavy in at least one partition, and Misra–Gries with
  k >= ceil(1/phi) counters never evicts a local phi-heavy key (total
  decrement <= N_p/(k+1) < phi*N_p), so the candidate set is a superset
  of the true heavy set and the exact pass makes precision 1.0.
- ``hll_user_counts``: mergeable distinct-count sketches
  (Apache DataSketches HLL via ``hll_sketch_agg``) — per-group sketches
  union into the global estimate WITHOUT re-touching rows.  This is the
  100 TB rollup pattern: persist per-day/per-shard sketch tables, answer
  any distinct-count rollup by merging kilobyte sketches.

Reference parity: the reference has no sketch surface (its caches are
exact); this family extends SURVEY.md §2.D.  Accuracy and algorithmic
guarantees are pytest-pinned in tests/test_sketches.py; the exact form is
DuckDB-oracle-checked in tests/test_demoted_oracles.py.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamsum_spark.functions.expressions import TOKENS_EXPR as _TOKS
from streamsum_spark.tables import table
from streamsum_spark.util import rebalance_for_cpu


def token_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per token occurrence over the documents corpus."""
    docs = rebalance_for_cpu(table(spark, sf_dir, "documents"))
    return docs.select(F.explode(F.expr(_TOKS)).alias("t"))


def heavy_hitters_exact(spark: SparkSession, sf_dir: str, phi: float = 0.02) -> DataFrame:
    """phi-heavy hitters, exact: tokens whose count >= phi * total.

    One shuffle (the groupBy; partial combine makes the shuffle carry
    per-map-task partials, not occurrences).  The grouped relation is
    persisted because both the grand total and the threshold filter read
    it — vocab-sized, so the pin is cheap at any corpus scale.  The
    threshold multiply is a single IEEE op, identical in both engines.
    """
    from streamsum_spark.cached import shared_persist

    counts = shared_persist(
        ("heavy_hitters_exact", sf_dir),
        token_stream(spark, sf_dir)
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt")),
    )
    total = counts.agg(F.sum("cnt").cast("long").alias("total"))
    return (
        counts.join(F.broadcast(total))
        .where(F.col("cnt") >= F.lit(phi) * F.col("total"))
        .select("t", "cnt")
    )


HEAVY_HITTERS_SQL = r"""
WITH tok AS (
    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS t FROM documents
), counts AS (
    SELECT t, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY t
), tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM counts)
SELECT t, cnt FROM counts, tot WHERE cnt >= 0.02 * total
"""


def _mg_reduce(counters: dict, add: dict, k: int) -> dict:
    """Mergeable Misra–Gries reduce (Agarwal et al., 'Mergeable
    Summaries'): pointwise-add, then if more than k counters survive,
    subtract the (k+1)-th largest count from all and drop the
    non-positive.  Each subtraction of m is witnessed by >= (k+1)*m
    stream weight, so total undercount <= N/(k+1)."""
    for key, c in add.items():
        counters[key] = counters.get(key, 0) + int(c)
    if len(counters) > k:
        m = sorted(counters.values(), reverse=True)[k]
        counters = {key: c - m for key, c in counters.items() if c - m > 0}
    return counters


def heavy_hitters_mg(
    spark: SparkSession, sf_dir: str, phi: float = 0.02, k: int | None = None
) -> DataFrame:
    """phi-heavy hitters via per-partition Misra–Gries candidates + an
    exact verification pass over ONLY the candidates.

    Output is identical to ``heavy_hitters_exact`` for every input
    distribution (pinned in tests/test_sketches.py): the sketch pass can
    only over-generate candidates, and the exact pass filters on true
    counts.  Python appears only in the bounded-state sketch (the
    SURVEY §4.2 license: per-partition algorithmic state no expression
    can hold); counting within each Arrow batch is vectorized
    ``value_counts``, the MG reduce touches <= k+batch-distinct counters.
    """
    import pandas as pd

    from streamsum_spark.entry_queries import _ensure_package_shipped

    _ensure_package_shipped(spark)  # mapInPandas pickles _mg_reduce by reference
    if k is None:
        k = int(math.ceil(1.0 / phi))
    stream = token_stream(spark, sf_dir)

    def sketch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        counters: dict = {}
        n = 0
        for pdf in batches:
            n += len(pdf)
            counters = _mg_reduce(counters, pdf["t"].value_counts().to_dict(), k)
        # one summary row per surviving counter + a NULL-keyed row carrying
        # the partition's total weight (so the grand total needs no second
        # corpus scan)
        yield pd.DataFrame(
            {"t": list(counters.keys()) + [None], "w": list(counters.values()) + [n]}
        )

    from streamsum_spark.cached import shared_persist

    sk = shared_persist(
        ("heavy_hitters_mg", sf_dir, k), stream.mapInPandas(sketch, "t string, w long")
    )
    total = sk.where(F.col("t").isNull()).agg(F.sum("w").cast("long").alias("total"))
    cands = sk.where(F.col("t").isNotNull()).select("t").distinct()
    exact = (
        stream.join(F.broadcast(cands), "t")
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return (
        exact.join(F.broadcast(total))
        .where(F.col("cnt") >= F.lit(phi) * F.col("total"))
        .select("t", "cnt")
    )


def mg_candidates(
    spark: SparkSession, sf_dir: str, phi: float = 0.02, k: int | None = None
) -> DataFrame:
    """The phase-1 candidate relation alone (t, w lower-bound weight),
    exposed for the bound pins: <= partitions * k rows."""
    import pandas as pd

    from streamsum_spark.entry_queries import _ensure_package_shipped

    _ensure_package_shipped(spark)
    if k is None:
        k = int(math.ceil(1.0 / phi))
    stream = token_stream(spark, sf_dir)

    def sketch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        counters: dict = {}
        for pdf in batches:
            counters = _mg_reduce(counters, pdf["t"].value_counts().to_dict(), k)
        yield pd.DataFrame({"t": list(counters.keys()), "w": list(counters.values())})

    return stream.mapInPandas(sketch, "t string, w long")


def hll_user_counts(spark: SparkSession, sf_dir: str, lg_k: int = 12) -> DataFrame:
    """Distinct users per event_type AND overall, via mergeable HLL
    sketches: one sketch per group, the overall row is the UNION of the
    group sketches — no second pass over events.

    (event_type, approx_users) rows plus an ('__all__', merged estimate)
    row.  Estimates are engine-internal (DataSketches), so the pin is a
    pytest tolerance vs exact countDistinct, not a DuckDB hash oracle.
    """
    ev = table(spark, sf_dir, "events")
    from streamsum_spark.cached import shared_persist

    per_group = shared_persist(
        ("hll_user_counts", sf_dir, lg_k),
        ev.groupBy("event_type").agg(F.hll_sketch_agg("user_id", F.lit(lg_k)).alias("sk")),
    )
    ests = per_group.select(
        "event_type", F.hll_sketch_estimate("sk").alias("approx_users")
    )
    merged = per_group.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.lit("__all__").alias("event_type"),
        F.hll_sketch_estimate("sk").alias("approx_users"),
    )
    return ests.unionByName(merged)


# --- Count-Min sketch -------------------------------------------------------

CM_DEPTH = 4
CM_WIDTH = 1024
# Kirsch–Mitzenmacher again: one md5 per token, row d uses (h1 + d*h2).
# Same 48-bit halves as MinHash so both engines parse identically.
_CM_P = 4294967291


def _cm_cell_exprs(depth: int, width: int) -> list[str]:
    return [
        f"CAST((h1 + {d} * h2) % {_CM_P} % {width} AS BIGINT)"
        for d in range(1, depth + 1)
    ]


def cm_sketch(
    spark: SparkSession,
    sf_dir: str,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
    tokens: DataFrame | None = None,
) -> DataFrame:
    """Count-Min sketch of the corpus token frequencies as a RELATION:
    (d, bucket, cnt), at most depth x width rows regardless of
    vocabulary or corpus size.

    This is the linear-sketch posture that complements Misra–Gries
    (candidates) and HLL (distinct counts): Count-Min answers point
    frequency queries with a one-sided error (estimate >= truth,
    overshoot <= eps*N with eps = e/width at high probability), and two
    sketches MERGE BY CELL-WISE SUM — so per-shard/per-day sketch tables
    roll up without re-touching rows, and the streaming twin below is
    just the additive cache-table sink.

    Plan: one explode + one md5 per token + depth stacked (cell, 1)
    rows -> groupBy(d, bucket) count with map-side combine.  The shuffle
    carries at most depth x width partials per map task."""
    if tokens is None:
        tokens = token_stream(spark, sf_dir)
    cells = _cm_cell_exprs(depth, width)
    stack = ", ".join(f"CAST({d + 1} AS BIGINT), {c}" for d, c in enumerate(cells))
    return (
        tokens.select(
            F.expr("CAST(conv(substring(md5(t), 1, 12), 16, 10) AS BIGINT)").alias("h1"),
            F.expr("CAST(conv(substring(md5(t), 13, 12), 16, 10) AS BIGINT)").alias("h2"),
        )
        .select(F.expr(f"stack({depth}, {stack}) AS (d, bucket)"))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cm_estimate(
    spark: SparkSession,
    sketch: DataFrame,
    terms: DataFrame,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Point-frequency estimates for ``terms`` (a relation with column
    ``t``) against a Count-Min sketch relation: est(t) = min over rows d
    of cell(d, h_d(t)).  The sketch is depth x width rows — broadcast —
    so estimation is a map-side join over the terms relation, whatever
    its size."""
    cells = _cm_cell_exprs(depth, width)
    stack = ", ".join(f"CAST({d + 1} AS BIGINT), {c}" for d, c in enumerate(cells))
    probes = (
        terms.select(
            "t",
            F.expr("CAST(conv(substring(md5(t), 1, 12), 16, 10) AS BIGINT)").alias("h1"),
            F.expr("CAST(conv(substring(md5(t), 13, 12), 16, 10) AS BIGINT)").alias("h2"),
        )
        .select("t", F.expr(f"stack({depth}, {stack}) AS (d, bucket)"))
    )
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy("t")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est"))
    )


CM_SKETCH_SQL = f"""
SELECT d, bucket, CAST(count(*) AS BIGINT) AS cnt
FROM (
    SELECT d, (h1 + d * h2) % {_CM_P} % {{width}} AS bucket
    FROM (
        SELECT ('0x' || substr(md5(t), 1, 12))::BIGINT AS h1,
               ('0x' || substr(md5(t), 13, 12))::BIGINT AS h2
        FROM (SELECT unnest({{toks}}) AS t FROM documents)
    ), (SELECT unnest(range(1, {{depth_excl}})) AS d)
)
GROUP BY d, bucket
"""


def cm_sketch_oracle_sql(depth: int = CM_DEPTH, width: int = CM_WIDTH) -> str:
    from streamsum_spark.functions.expressions import TOKENS_SQL

    return CM_SKETCH_SQL.format(toks=TOKENS_SQL, width=width, depth_excl=depth + 1)


def heavy_hitters_native(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """Spark 4's built-in approx_top_k (JVM-side frequent-items sketch
    with map-side partial merge) — the zero-custom-code top-k path.
    Returned counts are the sketch's estimates; for clearly-heavy items
    at default maxItemsTracked they equal exact counts (pinned vs the
    exact aggregation in tests)."""
    toks = token_stream(spark, sf_dir)
    return (
        toks.select(F.expr(f"approx_top_k(t, {k})").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(F.col("e.item").alias("t"), F.col("e.count").cast("long").alias("cnt"))
    )


def heavy_hitters_cm(
    spark: SparkSession,
    sf_dir: str,
    phi: float = 0.02,
    sketch: DataFrame | None = None,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Heavy hitters WITHOUT a second corpus pass: Misra–Gries candidates
    (bounded, superset-guaranteed) get their counts from the Count-Min
    sketch instead of an exact recount.

    With an incrementally-maintained CM table (stream_cm_sketch) this
    answers phi-heavy queries from two SKETCH relations only — the
    corpus is never rescanned at query time.  Guarantee shape flips
    accordingly: CM estimates are >= truth, so the result is a SUPERSET
    of the true phi-heavy set with estimated counts (one-sided); the
    exact-verify path (heavy_hitters_mg) remains the precision-1.0
    option when a rescan is affordable."""
    if sketch is None:
        sketch = cm_sketch(spark, sf_dir)
    if candidates is None:
        candidates = mg_candidates(spark, sf_dir, phi=phi)
    total = sketch.where(F.col("d") == 1).agg(F.sum("cnt").cast("long").alias("total"))
    est = cm_estimate(spark, sketch, candidates.select("t").distinct())
    return (
        est.join(F.broadcast(total))
        .where(F.col("est") >= F.lit(phi) * F.col("total"))
        .select("t", F.col("est").alias("cnt"))
    )


# --- Bloom filter (set membership / decontamination by key) -----------------

# Default filter geometry for the test corpora; production sizes m at
# ~10-15 bits per excluded key (1e10 keys -> ~17 GB of words as a
# RELATION, never a driver-side object).
BLOOM_M = 1 << 16
BLOOM_K = 5


def _bloom_pos_exprs(m_bits: int, k: int) -> str:
    """k bit positions via Kirsch–Mitzenstein double hashing off one md5
    (the CM sketch's recipe): pos_j = (h1 + j*h2) % P % m."""
    return ", ".join(f"(h1 + {j} * h2) % {_CM_P} % {m_bits}" for j in range(1, k + 1))


def _hash_pair(df: DataFrame, col: str) -> DataFrame:
    return df.select(
        *df.columns,
        F.expr(f"CAST(conv(substring(md5({col}), 1, 12), 16, 10) AS BIGINT)").alias("h1"),
        F.expr(f"CAST(conv(substring(md5({col}), 13, 12), 16, 10) AS BIGINT)").alias("h2"),
    )


def doc_content_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct content fingerprints of the documents table — the key set
    a corpus-exclusion filter is built from (e.g. the previously-trained
    corpus, a benchmark's documents)."""
    return (
        table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select(F.md5("text").alias("key"))
        .distinct()
    )


def bloom_build(
    spark: SparkSession,
    sf_dir: str,
    keys: DataFrame | None = None,
    m_bits: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """Bloom filter of a key set as a RELATION ``(word, bits)``: m_bits
    packed into 32-bit words (m/32 rows at most), built with one md5 per
    key + a k-way stack + one bit_or hash aggregation (map-side partial
    combine ships at most m/32 words per task).

    This completes the sketch family's membership member (MG candidates,
    HLL distincts, CM frequencies, Bloom membership): no false
    negatives ever, false positives at the standard (1 - e^{-kn/m})^k
    rate, and two filters over the same geometry MERGE by per-word
    bit_or — per-shard/per-day filters roll up without re-touching keys.
    32-bit words keep every mask positive in a BIGINT so Spark and
    DuckDB agree bit-for-bit (BLOOM_BUILD_SQL value-hash oracle in
    tests/test_demoted_oracles.py)."""
    if keys is None:
        keys = doc_content_keys(spark, sf_dir)
    return (
        _hash_pair(keys, "key")
        .select(F.expr(f"stack({k}, {_bloom_pos_exprs(m_bits, k)}) AS (pos)"))
        .select(
            F.expr("CAST(pos DIV 32 AS BIGINT)").alias("word"),
            F.expr("CAST(shiftleft(1L, CAST(pos % 32 AS INT)) AS BIGINT)").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").cast("long").alias("bits"))
    )


BLOOM_BUILD_SQL = f"""
SELECT CAST(pos // 32 AS BIGINT) AS word,
       CAST(bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER)) AS BIGINT) AS bits
FROM (
    SELECT (h1 + j * h2) % {_CM_P} % {BLOOM_M} AS pos
    FROM (
        SELECT ('0x' || substr(md5(key), 1, 12))::BIGINT AS h1,
               ('0x' || substr(md5(key), 13, 12))::BIGINT AS h2
        FROM (SELECT DISTINCT md5(text) AS key FROM documents WHERE text IS NOT NULL)
    ), (SELECT unnest(range(1, {BLOOM_K + 1})) AS j)
)
GROUP BY word
"""


def bloom_might_contain(
    spark: SparkSession,
    bloom: DataFrame,
    probes: DataFrame,
    m_bits: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """Membership test for ``probes`` (a relation with a ``key`` column)
    against a Bloom relation: (key, might_contain) — true iff ALL k bit
    positions are set; an absent word is all-zeros.

    The filter relation carries NO broadcast hint: AQE broadcasts it
    while m/32 rows measure small (the default is 2 KB) and degrades to
    a shuffle join on ``word`` for a production-sized filter — Spark's
    8 GiB broadcast hard limit means a forced hint would turn a 10-GB
    filter into a job failure, so the plan choice is left to the
    runtime (shuffle degradation pinned at threshold -1 in
    tests/test_text_plans.py).  Membership stays one join either way,
    never a driver-side structure."""
    pr = (
        _hash_pair(probes.select("key"), "key")
        .select("key", F.expr(f"stack({k}, {_bloom_pos_exprs(m_bits, k)}) AS (pos)"))
        .select(
            "key",
            F.expr("CAST(pos DIV 32 AS BIGINT)").alias("word"),
            F.expr("CAST(shiftleft(1L, CAST(pos % 32 AS INT)) AS BIGINT)").alias("mask"),
        )
    )
    return (
        pr.join(bloom, "word", "left")
        .groupBy("key")
        .agg(
            F.min(
                (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask")) != 0)
                .cast("int")
            ).alias("_all")
        )
        .select("key", (F.col("_all") == 1).alias("might_contain"))
    )


def decontaminate_by_bloom(
    spark: SparkSession,
    sf_dir: str,
    exclusion_keys: DataFrame,
    m_bits: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """Drop corpus documents whose content fingerprint might be in the
    exclusion set — the Bloom-shaped twin of ``decontaminate`` (n-gram
    overlap vs a bounded benchmark): this one handles an exclusion set
    too large to broadcast as raw keys (a previously-trained corpus of
    10^10 documents), compressing it to an m-bit relation.

    Guarantee shape: no false negatives means every truly-excluded
    document IS dropped; the cost is over-dropping a ~(1 - e^{-kn/m})^k
    fraction of clean documents — the right trade for training-data
    hygiene, where a missed contaminant costs more than a lost clean
    doc.  Returns the surviving documents."""
    bloom = bloom_build(spark, sf_dir, keys=exclusion_keys, m_bits=m_bits, k=k)
    docs = (
        table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .withColumn("key", F.md5("text"))
    )
    verdict = bloom_might_contain(
        spark, bloom, docs.select("key").distinct(), m_bits=m_bits, k=k
    )
    return (
        docs.join(verdict.where(F.col("might_contain")), "key", "left_anti")
        .select("doc_id", "lang", "source")
    )


def log_histogram_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable QUANTILE summary — the remaining classic of the sketch
    family (MG candidates, HLL distincts, CM frequencies, Bloom
    membership, and now quantiles): per-event-type log2-binned value
    histograms as a (event_type, bin, n) RELATION, mergeable by plain
    per-bin SUM (shard rollups, stream accumulation through the additive
    sink, cross-corpus unions all compose).

    The bin is the BIT LENGTH of the value scaled to an integer
    (length(bin(CAST(value*1000 AS BIGINT)))) — pure integer arithmetic,
    so both engines bin identically and the relation is value-hash
    oracle-checkable, unlike floor(log2(x)) whose last-ulp differences
    straddle bin edges.  Bin b covers [2^(b-1), 2^b)/1000, so a quantile
    read from the histogram (histogram_quantile) carries a one-sided
    relative error bounded by 2x — pinned against exact percentiles in
    tests/test_sketches.py.  Spark's own approx_percentile(GK) serves
    single-pass queries; THIS shape is for state you must persist small
    and merge across time/shards — the same persist-sketches-not-rows
    posture as the CM/HLL rows (SURVEY §2).

    Input contract, ENFORCED: values must be non-negative (a negative's
    two's-complement bin string is 64 chars — every negative would
    silently collapse into a top bin sorted above all positives, so the
    guard raises instead); NULL values are skipped like any aggregate
    skips nulls (mirrored in LOG_HISTOGRAM_SQL)."""
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    # the guard lives INSIDE the binning expression so column pruning
    # can never drop it
    guarded = F.when(
        F.col("value") < 0,
        F.raise_error(
            F.lit(
                "log_histogram_sketch requires non-negative values: "
                "log2-binning a negative collapses it into the sign bit"
            )
        ),
    ).otherwise(F.col("value"))
    return (
        ev.select(
            "event_type",
            F.length(F.bin((guarded * 1000).cast("bigint"))).alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


LOG_HISTOGRAM_SQL = """
SELECT event_type,
       CAST(length(bin(CAST(value * 1000 AS BIGINT))) AS INT) AS bin,
       CAST(count(*) AS BIGINT) AS n
FROM events
WHERE value IS NOT NULL
GROUP BY event_type, bin
"""


def histogram_quantile(hist: DataFrame, q: float) -> DataFrame:
    """Quantile estimate per key from a log-histogram relation: walk the
    cumulative counts to the bin where q*N falls and report the bin's
    upper edge / 1000 — within 2x of the true quantile by construction.
    One window over the (tiny) histogram relation, never the raw rows."""
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("bin")
    tot = Window.partitionBy("event_type")
    return (
        hist.withColumn("cum", F.sum("n").over(w))
        .withColumn("total", F.sum("n").over(tot))
        .where(F.col("cum") >= F.lit(q) * F.col("total"))
        .groupBy("event_type")
        .agg(F.min("bin").alias("qbin"))
        .select(
            "event_type",
            (F.pow(F.lit(2.0), F.col("qbin")) / F.lit(1000.0)).alias("q_upper"),
        )
    )
