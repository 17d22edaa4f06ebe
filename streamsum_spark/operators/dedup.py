"""Deduplication operators for training-data pipelines (north-star
extension): exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design: everything is expression-level (no Python in the hot path).
- Exact dedup: hash-groupBy — one shuffle on the fingerprint.
- MinHash: per-doc signature via array expressions (transform/array_min) —
  ONE pass, no token-level explode; only the 16-row-per-doc signature
  explodes into the LSH band shuffle.  At 100 TB the band join shuffles
  |docs| x bands small rows instead of token streams.
- Jaccard verification joins only LSH-candidate pairs, not all pairs.
- md5 is the cross-engine hash (bit-identical in Spark and DuckDB), which
  is what makes the signatures oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamsum_spark.tables import table
from streamsum_spark.util import rebalance_for_cpu

NUM_HASHES = 16
SHINGLE = 3  # 3-word shingles

from streamsum_spark.functions.expressions import (  # noqa: E402
    TOKENS_EXPR as _TOKS,
    TOKENS_SQL as _TOKS_SQL,
    shingles_expr,
    shingles_sql,
)

_SHINGLES = shingles_expr(SHINGLE)
_SHINGLES_SQL = shingles_sql(SHINGLE)
# Shingle expression over a MATERIALIZED token-array column: the transform
# lambda is interpreted (no CSE), so the inline form re-splits the text per
# shingle position — hot paths project "_toks" first (same lesson as
# winnow_from_grams).
_SHINGLES_T = shingles_expr(SHINGLE, "_toks")


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on the bag-of-words fingerprint: keep the smallest
    doc_id per group, report group size.  (Fingerprint granularity makes
    this non-vacuous on the synthetic corpus, which has no byte-identical
    texts; for byte dedup swap the key for md5(text).)"""
    docs = table(spark, sf_dir, "documents")
    fp = f"md5(array_join(array_sort(array_distinct({_TOKS})), ' '))"
    return (
        docs.select(F.col("doc_id"), F.expr(fp).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).cast("long").alias("group_size"),
        )
    )


DEDUP_EXACT_SQL = r"""
SELECT md5(array_to_string(list_sort(list_distinct(regexp_split_to_array(trim(text), '\s+'))), ' ')) AS fingerprint,
       min(doc_id) AS keep_doc_id,
       CAST(count(*) AS BIGINT) AS group_size
FROM documents
GROUP BY 1
"""


# Universal double-hashing (Kirsch–Mitzenmacher): ONE md5 per shingle,
# then hash_j = (h1 + j*h2) mod P.  16x fewer digest calls than salting
# the md5 per band; the permutations are integer ops inside codegen.
# h1/h2 are the two 48-bit halves of the md5 hex, parsed identically by
# Spark's conv(x,16,10) and DuckDB's '0x..'::BIGINT (verified).
_MINHASH_P = 4294967291  # largest prime < 2^32; j*h2 <= 16*2^48 < 2^63


def shingle_sets(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """(doc_id, sh) with sh = the distinct 3-word shingle set — the shared
    input of MinHash signature generation AND exact Jaccard verification.
    Composite pipelines compute this ONCE (and persist it) instead of
    re-tokenizing the corpus per consumer.  ``docs`` (doc_id, text)
    overrides the sf_dir documents table — a mid-pipeline relation keeps
    its own partitioning."""
    if docs is None:
        docs = rebalance_for_cpu(table(spark, sf_dir, "documents"))
    return docs.withColumn("_toks", F.expr(_TOKS)).select(
        "doc_id", F.expr(f"array_distinct({_SHINGLES_T})").alias("sh")
    )


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature rows (doc_id, band, mh): 16 permuted min-hashes
    over 3-word shingles.

    Plan shape: shingle explode -> one md5 per shingle -> 16 min()
    aggregates in a single hash aggregation (map-side partial combine, so
    the shuffle carries 16 longs per doc per map task) -> stack to rows.
    """
    return _signatures_from(shingle_sets(spark, sf_dir))


def _signatures_from(sh: DataFrame) -> DataFrame:
    """Signature rows from a (doc_id, sh) shingle-set relation."""
    ex = (
        sh.select("doc_id", F.explode("sh").alias("s"))
        .select(
            "doc_id",
            F.expr("CAST(conv(substring(md5(s), 1, 12), 16, 10) AS BIGINT)").alias("h1"),
            F.expr("CAST(conv(substring(md5(s), 13, 12), 16, 10) AS BIGINT)").alias("h2"),
        )
    )
    mins = ex.groupBy("doc_id").agg(
        *[
            F.min((F.col("h1") + F.lit(j) * F.col("h2")) % F.lit(_MINHASH_P)).alias(f"mh{j}")
            for j in range(1, NUM_HASHES + 1)
        ]
    )
    stack_args = ", ".join(f"CAST({j} AS BIGINT), mh{j}" for j in range(1, NUM_HASHES + 1))
    return mins.select(
        "doc_id", F.expr(f"stack({NUM_HASHES}, {stack_args}) AS (band, mh)")
    )


MINHASH_SIG_SQL = f"""
SELECT doc_id, CAST(j AS BIGINT) AS band,
       min((h1 + j * h2) % {_MINHASH_P}) AS mh
FROM (
    SELECT doc_id,
           ('0x' || substr(md5(s), 1, 12))::BIGINT AS h1,
           ('0x' || substr(md5(s), 13, 12))::BIGINT AS h2
    FROM (
        SELECT doc_id, unnest(list_distinct(shingles)) AS s
        FROM (SELECT doc_id, {_SHINGLES_SQL} AS shingles
              FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents))
    )
) CROSS JOIN (SELECT unnest(generate_series(1, {NUM_HASHES})) AS j)
GROUP BY doc_id, j
"""


def lsh_candidate_pairs(
    spark: SparkSession,
    sf_dir: str,
    max_bucket: int | None = None,
    sig: DataFrame | None = None,
    cache_key: str | None = None,
) -> DataFrame:
    """LSH banding (r=1): docs sharing any (band, minhash) bucket are
    candidate near-dup pairs.  The join is on the tiny signature relation;
    a self-join of the raw corpus never happens.

    ``max_bucket`` is the hot-bucket frequency cap for 100 TB runs: a
    bucket shared by f docs contributes f^2/2 pairs, so a stop-shingle-like
    bucket hit by 1% of a huge corpus is quadratic death.  With the cap,
    buckets larger than ``max_bucket`` are dropped BEFORE the self-join
    (one extra count-aggregation over the signature relation; the pairs
    lost are overwhelmingly non-duplicates since a bucket that common
    carries almost no similarity signal — standard LSH practice).  The
    declared query keeps cap=None so the oracle stays the pure banding
    semantics; the capped form is pinned by pytest as a subset.

    ``sig`` lets a composite pipeline pass a persisted signature relation
    so the self-join's two sides share one computation (Catalyst does not
    reuse the exchange across these aliased subtrees).  ``cache_key``
    (with ``max_bucket``) persists the CAP-FILTERED signature relation
    too: the frequency window otherwise evaluates once per self-join
    side — a second exchange + sort of the whole signature relation for
    the identical result (plan evidence: 2x [Exchange->Sort->Window]
    subtrees without it, one shared InMemoryTableScan with it).
    """
    if sig is None:
        sig = minhash_signatures(spark, sf_dir)
    if max_bucket is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("band", "mh")
        sig = (
            sig.withColumn("_f", F.count(F.lit(1)).over(w))
            .where(F.col("_f") <= max_bucket)
            .drop("_f")
        )
        if cache_key is not None:
            from streamsum_spark.cached import shared_persist

            sig = shared_persist(
                ("lsh_sig_capped", cache_key, max_bucket), sig
            )
    a = sig.alias("a")
    b = sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.mh") == F.col("b.mh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


LSH_PAIRS_SQL = f"""
WITH sig AS ({MINHASH_SIG_SQL})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM sig a JOIN sig b
  ON a.band = b.band AND a.mh = b.mh AND a.doc_id < b.doc_id
"""


# ngram_jaccard_dupes is the EXACT small-scale oracle: its shingle
# self-join generates candidates from every shared shingle, a shape that
# is quadratic in hot-shingle frequency.  The guard keeps it from being
# silently pointed at a production corpus — near_dup_verified (banded
# LSH candidates -> exact verify, collision-capped) is the scale path.
NGRAM_JACCARD_MAX_ROWS = 100_000


def ngram_jaccard_dupes(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.2,
    max_rows: int | None = NGRAM_JACCARD_MAX_ROWS,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs: distinct-shingle intersection /
    union >= threshold.  Jaccard is one integer division — exactly rounded
    IEEE, so the value hashes identically across engines.

    THIS IS THE SMALL-SCALE EXACT ORACLE, not a production path: the
    shingle join doubles as candidate generation because docs sharing
    zero shingles can't pass any threshold, but that join is quadratic
    in shingle frequency.  A corpus above ``max_rows`` raises with a
    pointer to near_dup_verified (LSH candidates -> exact verify), which
    computes the same verified pairs with capped bucket joins.  The
    shingle-set relation feeds four subtrees (ex x2, sizes x2), so it is
    persisted once rather than re-tokenized per consumer (keyed via
    shared_persist, so repeat invocations replace the cached relation,
    never leak)."""
    from streamsum_spark.cached import shared_persist

    if max_rows is not None:
        n = table(spark, sf_dir, "documents").count()
        if n > max_rows:
            raise ValueError(
                f"ngram_jaccard_dupes is the exact small-scale oracle "
                f"(corpus {n} > cap {max_rows}); use near_dup_verified "
                f"for large corpora — same verified pairs, bounded "
                f"candidate generation"
            )
    sh = shared_persist(("shingle_sets", sf_dir), shingle_sets(spark, sf_dir))
    ex = sh.select("doc_id", F.explode("sh").alias("s"))
    sizes = sh.select("doc_id", F.expr("size(sh)").alias("n"))
    inter = (
        ex.alias("a")
        .join(ex.alias("b"), (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (F.col("inter") / (F.col("sa.n") + F.col("sb.n") - F.col("inter"))).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


NGRAM_JACCARD_SQL = f"""
WITH sh AS (
    SELECT doc_id, list_distinct({_SHINGLES_SQL}) AS shingles
    FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
), ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
    FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b, inter * 1.0 / (sa.n + sb.n - inter) AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.2
"""


def near_dup_verified(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.2,
    max_bucket: int | None = None,
    docs: DataFrame | None = None,
    cache_token: str | None = None,
) -> DataFrame:
    """Production near-dup pipeline: LSH candidate pairs -> exact n-gram
    Jaccard verification -> threshold filter.

    This is the operator a real 100 TB dedup run executes: candidate
    generation is the bucketed band join (never all-pairs), and the
    expensive shingle-set comparison runs ONLY on candidates — two keyed
    joins of the candidate relation against per-doc shingle sets, so the
    quadratic term of the naive shingle self-join (ngram_jaccard_dupes,
    kept as the small-scale exact oracle) never materializes.

    Jaccard here is one integer division (exactly rounded IEEE), so values
    hash identically across engines.

    The shingle-set relation is the shared input of BOTH stages (signatures
    derive from it; verification intersects it), and each stage consumes it
    twice (self-join / sa-sb join) — Catalyst does not reuse exchanges
    across those aliased subtrees, so without materialization the corpus
    would be re-tokenized four times.  ``persist()`` pins the computed
    relation once (at 100 TB the same role is played by writing the
    signature/shingle tables out and bucketing them by doc_id); measured
    8.8 s -> ~4 s at sf0.1.  Both pins are keyed via shared_persist:
    re-running the operator replaces its cached relations instead of
    accumulating blocks per call.  ``docs`` (doc_id, text) overrides the
    sf_dir documents table for composite pipelines, with ``cache_token``
    keying the persisted intermediates (same contract as
    near_dup_tuned); ``docs`` REQUIRES a cache_token — falling back to
    sf_dir (often '') would let two composite pipelines sharing the
    default key silently evict each other's persisted shingle/band
    relations (cache thrash, not wrong results — refused loudly
    instead).
    """
    from streamsum_spark.cached import shared_persist

    if docs is not None and cache_token is None:
        raise ValueError(
            "near_dup_verified(docs=...) needs an explicit cache_token: "
            "the persisted shingle/signature relations are keyed by it, "
            "and the sf_dir fallback key would collide across pipelines"
        )
    key = cache_token or sf_dir
    sh = shared_persist(
        ("shingle_sets", key), shingle_sets(spark, sf_dir, docs=docs)
    )
    sig = shared_persist(("minhash_sig", key), _signatures_from(sh))
    cand = lsh_candidate_pairs(
        spark, sf_dir, max_bucket=max_bucket, sig=sig, cache_key=key
    )
    scored = (
        cand.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sh.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.expr("size(array_intersect(sa.sh, sb.sh))").alias("_i"),
            F.expr("size(sa.sh) + size(sb.sh)").alias("_n"),
        )
        .select(
            "doc_a",
            "doc_b",
            (F.col("_i").cast("double") / (F.col("_n") - F.col("_i"))).alias("jaccard"),
        )
    )
    return scored.where(F.col("jaccard") >= threshold)


NEAR_DUP_VERIFIED_SQL = f"""
WITH sig AS ({MINHASH_SIG_SQL}),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM sig a JOIN sig b
      ON a.band = b.band AND a.mh = b.mh AND a.doc_id < b.doc_id
),
sh AS (
    SELECT doc_id, list_distinct({_SHINGLES_SQL}) AS sh
    FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
)
SELECT doc_a, doc_b, jaccard FROM (
    SELECT doc_a, doc_b,
           CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
               / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) AS jaccard
    FROM cand
    JOIN sh sa ON doc_a = sa.doc_id
    JOIN sh sb ON doc_b = sb.doc_id
)
WHERE jaccard >= 0.2
"""


def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash over tokens: bit b of the signature is the sign of
    sum over tokens of (+1/-1 by bit b of md5(token)).

    The md5 hex nibble trick (strpos on '0123456789abcdef') gives identical
    integer bit values in both engines without hex-parsing builtins.
    Expression-only: per-doc work is tokens x 32 bit tests inside one
    projection, aggregated with an element-wise array sum — no shuffle, no
    explode."""
    docs = rebalance_for_cpu(table(spark, sf_dir, "documents"))
    return docs.select("doc_id", F.expr(simhash_expr()).alias("simhash"))


def simhash_expr(offset_nibbles: int = 0) -> str:
    """32-bit SimHash as a single Catalyst expression over ``text``.

    The token digests are materialized by an inner ``transform(toks,
    x -> md5(x))`` and the per-bit tests reference the lambda VARIABLE
    ``m`` — interpreted HOF lambdas get no subexpression elimination, so
    inlining ``md5(x)`` into the bit lambda would hash every token 32
    times (once per bit) instead of once.

    ``offset_nibbles`` selects which 8 hex nibbles of the md5 digest feed
    the 32 bits (0 = nibbles 1-8, 8 = nibbles 9-16) — two calls give the
    two independent words of the 64-bit wide SimHash."""
    # per token digest m: 32-element array of +1/-1; fold element-wise
    bit = (
        "transform(sequence(0, 31), b -> "
        f"CASE WHEN (CAST(instr('0123456789abcdef', substring(m, 1 + {offset_nibbles} + CAST(b / 4 AS INT), 1)) - 1 AS INT) "
        "          >> (b % 4)) & 1 = 1 THEN 1 ELSE -1 END)"
    )
    folded = (
        f"aggregate(transform({_TOKS}, x -> md5(x)), "
        f"transform(sequence(0, 31), b -> 0), "
        f"(acc, m) -> zip_with(acc, {bit}, (a, x) -> a + x))"
    )
    return (
        f"aggregate(zip_with({folded}, sequence(0, 31), "
        f"(s, b) -> CASE WHEN s > 0 THEN CAST(shiftleft(CAST(1 AS BIGINT), b) AS BIGINT) ELSE CAST(0 AS BIGINT) END), "
        f"CAST(0 AS BIGINT), (a, x) -> a + x)"
    )


SIMHASH_SQL = rf"""
WITH tok AS (
    SELECT doc_id, unnest({_TOKS_SQL}) AS x FROM documents
), bits AS (
    SELECT doc_id, b,
           sum(CASE WHEN ((strpos('0123456789abcdef', substr(md5(x), 1 + b // 4, 1)) - 1) >> (b % 4)) & 1 = 1
                    THEN 1 ELSE -1 END) AS s
    FROM tok CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS b)
    GROUP BY doc_id, b
)
SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN 1::BIGINT << b ELSE 0 END) AS BIGINT) AS simhash
FROM bits GROUP BY doc_id
"""


# --- winnowing (rolling-hash document fingerprints) -------------------------

WINNOW_K = 8  # character k-grams
WINNOW_W = 4  # winnowing window


def winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken): hash every
    k-char gram, then keep the minimum hash of each sliding window of W
    grams — guarantees shared fingerprints for sufficiently long shared
    substrings while sampling ~2/(W+1) of positions.

    Expression-only: gram hashing reuses the md5-prefix integer trick
    (cross-engine identical), window minima are an array transform — one
    projection, no explode until the final distinct-fingerprint rows.

    The gram array is materialized in its own projection column FIRST:
    higher-order-function lambdas are interpreted (no codegen, no common
    subexpression elimination), so inlining the gram expression into the
    window lambda would recompute the whole md5 array per window position
    — O(len²) digests per document (measured 40x slower at sf0.1).
    """
    docs = rebalance_for_cpu(table(spark, sf_dir, "documents"))
    return (
        docs.withColumn("_g", F.expr(grams_expr("text")))
        .select("doc_id", F.explode(F.expr(winnow_from_grams("_g"))).alias("fp"))
    )


def grams_expr(text_col: str) -> str:
    """Array of k-char-gram hashes over ``text_col`` (one md5 per
    position), guarded for short inputs (see shingles_expr: Spark's
    sequence() descends for stop < start, which would crash slice())."""
    return (
        f"CASE WHEN length({text_col}) >= {WINNOW_K} THEN "
        f"transform(sequence(1, length({text_col}) - {WINNOW_K - 1}), "
        f"i -> CAST(conv(substring(md5(substring({text_col}, i, {WINNOW_K})), 1, 12), 16, 10) AS BIGINT)) "
        f"ELSE array() END"
    )


def winnow_from_grams(grams_col: str) -> str:
    """Winnowed fingerprint set over a MATERIALIZED gram-array column:
    sliding-window minima + distinct.  Must not be fed the gram
    expression inline (see winnow_fingerprints)."""
    return (
        f"CASE WHEN size({grams_col}) >= {WINNOW_W} THEN "
        f"array_distinct(transform(sequence(1, size({grams_col}) - {WINNOW_W - 1}), "
        f"i -> array_min(slice({grams_col}, i, {WINNOW_W})))) "
        f"ELSE array() END"
    )


def winnow_expr(text_col: str) -> str:
    """Self-contained winnow expression (gram expr inlined into the window
    lambda).  Kept for fixture-scale tests ONLY — quadratic in document
    length under interpreted HOF evaluation; hot paths use
    grams_expr + winnow_from_grams over a materialized column."""
    return winnow_from_grams(grams_expr(text_col))


WINNOW_SQL = f"""
SELECT doc_id, unnest(list_distinct([list_min(grams[i:i+{WINNOW_W - 1}])
                                     FOR i IN range(1, len(grams) - {WINNOW_W - 2})])) AS fp
FROM (
    SELECT doc_id,
           [('0x' || substr(md5(substr(text, i, {WINNOW_K})), 1, 12))::BIGINT
            FOR i IN range(1, length(text) - {WINNOW_K - 2})] AS grams
    FROM documents
)
"""

# DuckDB twin of winnow_expr as a per-doc LIST (not unnested) — reused by
# the doc_signatures digest.
_WINNOW_LIST_SQL = f"""list_distinct([list_min(grams[i:i+{WINNOW_W - 1}])
    FOR i IN range(1, len(grams) - {WINNOW_W - 2})])"""
_GRAMS_SQL = f"""[('0x' || substr(md5(substr(text, i, {WINNOW_K})), 1, 12))::BIGINT
    FOR i IN range(1, length(text) - {WINNOW_K - 2})]"""


def doc_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document signature suite in ONE projection: bag-of-words md5
    fingerprint (exact-dedup key), 32-bit SimHash, and an md5 digest of the
    sorted winnowing fingerprint set (Schleimer/Wilkerson/Aiken) — the
    merged declared form of doc_fingerprint / simhash_signatures /
    winnow_fingerprints.

    All three are codegen'd expressions over the same scan; no shuffle.
    The winnow digest sorts numerically BEFORE casting to string (both
    engines), so the digest is order-canonical and cross-engine stable;
    md5 of '' covers docs too short to produce fingerprints.
    """
    from streamsum_spark.functions.expressions import TOKENS_EXPR

    docs = rebalance_for_cpu(table(spark, sf_dir, "documents"))
    fp = f"md5(array_join(array_sort(array_distinct({TOKENS_EXPR})), ' '))"
    winnow_digest = (
        f"md5(array_join(transform(array_sort({winnow_from_grams('_g')}), "
        f"x -> CAST(x AS STRING)), ','))"
    )
    return docs.withColumn("_g", F.expr(grams_expr("text"))).select(
        "doc_id",
        F.expr(fp).alias("fingerprint"),
        F.expr(simhash_expr()).alias("simhash"),
        F.expr(winnow_digest).alias("winnow_digest"),
    )


DOC_SIGNATURES_SQL = rf"""
WITH sim AS ({SIMHASH_SQL}),
win AS (
    SELECT doc_id,
           md5(array_to_string(list_transform(list_sort({_WINNOW_LIST_SQL}), x -> CAST(x AS VARCHAR)), ',')) AS winnow_digest
    FROM (SELECT doc_id, {_GRAMS_SQL} AS grams FROM documents)
)
SELECT d.doc_id,
       md5(array_to_string(list_sort(list_distinct(regexp_split_to_array(trim(d.text), '\s+'))), ' ')) AS fingerprint,
       sim.simhash,
       win.winnow_digest
FROM documents d
JOIN sim ON d.doc_id = sim.doc_id
JOIN win ON d.doc_id = win.doc_id
"""


def simhash_near_dupes(
    spark: SparkSession,
    sf_dir: str,
    max_hamming: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """SimHash near-dup pairs: documents whose 32-bit signatures differ in
    at most ``max_hamming`` bits, found by BANDED blocking — the signature
    splits into 4 disjoint 8-bit bands, candidates share at least one
    exact band, and the exact Hamming distance verifies.

    Recall is 1.0 by pigeonhole: <= 3 flipped bits cannot touch all 4
    bands, so every qualifying pair shares some band (pinned against the
    brute-force pair set in tests/test_dedup_families.py).  Scale shape
    matches lsh_candidate_pairs: the self-join key is (band, value) over
    the tiny signature relation — 4 rows per doc — never the corpus, and
    the signature relation is persisted across the self-join's two sides.

    100 TB posture: an 8-bit band has 256 values, so a band bucket holds
    ~|corpus|/256 docs and the per-bucket quadratic needs BOTH wider
    bands (a 64-bit simhash split into 4x16-bit bands keeps the
    pigeonhole guarantee while giving 65k buckets) AND the
    ``max_bucket`` frequency cap for residual hot buckets (a near-empty
    band value in skewed sign distributions).  The cap trades the recall
    guarantee for boundedness exactly like lsh_candidate_pairs'; the
    declared oracle keeps cap=None for the pure pigeonhole semantics.
    """
    from streamsum_spark.cached import shared_persist

    sig = simhash_signatures(spark, sf_dir)
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.expr(
                "transform(sequence(0, 3), b -> "
                "struct(b AS band, CAST(shiftright(simhash, b * 8) & 255 AS BIGINT) AS bv))"
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.bv")
    if max_bucket is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("band", "bv")
        bands = (
            bands.withColumn("_f", F.count(F.lit(1)).over(w))
            .where(F.col("_f") <= max_bucket)
            .drop("_f")
        )
    bands = shared_persist(("simhash_bands", sf_dir, max_bucket), bands)
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("CAST(bit_count(a.simhash ^ b.simhash) AS BIGINT)").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


SIMHASH_NEAR_DUPES_SQL = f"""
WITH sig AS ({SIMHASH_SQL}),
bands AS (
    SELECT doc_id, simhash, b AS band, (simhash >> (b * 8)) & 255 AS bv
    FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM bands a JOIN bands b
  ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


def winnow_shared_fingerprints(
    spark: SparkSession,
    sf_dir: str,
    min_shared: int = 2,
    max_bucket: int | None = 20,
) -> DataFrame:
    """Winnowing overlap pairs (the plagiarism-detection join of
    Schleimer/Wilkerson/Aiken): documents sharing at least ``min_shared``
    winnowed fingerprints, with the shared count as the match strength.

    The join key is the fingerprint, so the quadratic term is
    per-fingerprint-bucket — and ``max_bucket`` (on by default, unlike
    lsh_candidate_pairs, because natural-language corpora ALWAYS contain
    boilerplate) drops fingerprints shared by more than that many
    documents before the self-join.  A fingerprint that common is
    boilerplate, not evidence of copying: on the uniform synthetic corpus
    the uncapped join is quadratic (10.7M pairs at sf0.1 vs ~1k meaningful
    capped ones), which is precisely the stop-fingerprint blowup the cap
    exists for.  The cap filter is one windowed count over the sampled
    fingerprint relation — same shape both engines, so the capped form is
    still a full value-hash oracle."""
    from pyspark.sql import Window

    from streamsum_spark.cached import shared_persist

    fps = winnow_fingerprints(spark, sf_dir)
    if max_bucket is not None:
        w = Window.partitionBy("fp")
        fps = (
            fps.withColumn("_f", F.count(F.lit(1)).over(w))
            .where(F.col("_f") <= max_bucket)
            .drop("_f")
        )
    fps = shared_persist(("winnow_fps", sf_dir, max_bucket), fps)
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
        .where(F.col("shared") >= min_shared)
    )


WINNOW_SHARED_SQL = f"""
WITH fps_all AS ({WINNOW_SQL}),
fps AS (
    SELECT doc_id, fp FROM (
        SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS _f FROM fps_all
    ) WHERE _f <= 20
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS shared
FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= 2
"""


# --- 64-bit wide SimHash (the documented scale configuration) ---------------


def simhash_wide_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash as TWO independent 32-bit words (doc_id, sim_hi,
    sim_lo) — sim_lo from md5 nibbles 1-8, sim_hi from nibbles 9-16.

    Two words instead of one 64-bit value keeps every intermediate
    below 2^32: bit 63 of a packed BIGINT is the sign bit, where Spark's
    wrapping sum and DuckDB's HUGEINT-promoting sum diverge — split
    words make the signature fully value-hash-oracle-checkable."""
    docs = rebalance_for_cpu(table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.expr(simhash_expr(8)).alias("sim_hi"),
        F.expr(simhash_expr(0)).alias("sim_lo"),
    )


SIMHASH_WIDE_SQL = r"""
WITH tok AS (
    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS x FROM documents
), bits AS (
    SELECT doc_id, w, b,
           sum(CASE WHEN ((strpos('0123456789abcdef', substr(md5(x), 1 + w * 8 + b // 4, 1)) - 1) >> (b % 4)) & 1 = 1
                    THEN 1 ELSE -1 END) AS s
    FROM tok
    CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS b)
    CROSS JOIN (SELECT unnest([0, 1]) AS w)
    GROUP BY doc_id, w, b
)
SELECT doc_id,
       CAST(sum(CASE WHEN s > 0 AND w = 1 THEN 1::BIGINT << b ELSE 0 END) AS BIGINT) AS sim_hi,
       CAST(sum(CASE WHEN s > 0 AND w = 0 THEN 1::BIGINT << b ELSE 0 END) AS BIGINT) AS sim_lo
FROM bits GROUP BY doc_id
"""


def simhash_wide_near_dupes(
    spark: SparkSession,
    sf_dir: str,
    max_hamming: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """64-bit SimHash near-dup pairs via 4 x 16-bit banded blocking — the
    production-scale configuration the 32-bit operator's docstring
    prescribes: 65k values per band keep bucket sizes ~|corpus|/65k, and
    the pigeonhole recall guarantee is unchanged (<= 3 flipped bits
    cannot touch all 4 bands).  Hamming distance = popcount over both
    words; ``max_bucket`` is the residual hot-bucket cap."""
    from streamsum_spark.cached import shared_persist

    sig = simhash_wide_signatures(spark, sf_dir)
    bands = sig.select(
        "doc_id",
        "sim_hi",
        "sim_lo",
        F.explode(
            F.expr(
                "array(struct(CAST(0 AS INT) AS band, CAST(sim_lo & 65535 AS BIGINT) AS bv), "
                "      struct(CAST(1 AS INT) AS band, CAST(shiftright(sim_lo, 16) & 65535 AS BIGINT) AS bv), "
                "      struct(CAST(2 AS INT) AS band, CAST(sim_hi & 65535 AS BIGINT) AS bv), "
                "      struct(CAST(3 AS INT) AS band, CAST(shiftright(sim_hi, 16) & 65535 AS BIGINT) AS bv))"
            )
        ).alias("bb"),
    ).select("doc_id", "sim_hi", "sim_lo", "bb.band", "bb.bv")
    if max_bucket is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("band", "bv")
        bands = (
            bands.withColumn("_f", F.count(F.lit(1)).over(w))
            .where(F.col("_f") <= max_bucket)
            .drop("_f")
        )
    bands = shared_persist(("simhash_wide_bands", sf_dir, max_bucket), bands)
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr(
                "CAST(bit_count(a.sim_lo ^ b.sim_lo) + bit_count(a.sim_hi ^ b.sim_hi) AS BIGINT)"
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


SIMHASH_WIDE_NEAR_DUPES_SQL = f"""
WITH sig AS ({SIMHASH_WIDE_SQL}),
bands AS (
    SELECT doc_id, sim_hi, sim_lo, band,
           CASE band WHEN 0 THEN sim_lo & 65535
                     WHEN 1 THEN (sim_lo >> 16) & 65535
                     WHEN 2 THEN sim_hi & 65535
                     ELSE (sim_hi >> 16) & 65535 END AS bv
    FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.sim_lo, b.sim_lo)) + bit_count(xor(a.sim_hi, b.sim_hi)) AS BIGINT) AS hamming
FROM bands a JOIN bands b
  ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.sim_lo, b.sim_lo)) + bit_count(xor(a.sim_hi, b.sim_hi)) <= 3
"""


# --- benchmark decontamination ----------------------------------------------

DECON_N = 8  # 8-token grams: the standard test-set-overlap unit


def decontaminate(
    spark: SparkSession,
    sf_dir: str,
    benchmark: DataFrame | None = None,
    n: int = DECON_N,
    min_hits: int = 1,
) -> DataFrame:
    """Test-set decontamination report: for every training document, how
    many distinct ``n``-token grams it shares with the benchmark corpus,
    and whether that crosses ``min_hits`` (the flag a pipeline drops on).

    The shape that scales: benchmark suites are bounded (thousands of
    documents, not terabytes), so the benchmark gram set is a BROADCAST
    relation and the corpus side is one gram explode + broadcast
    semi-join + per-doc count with map-side combine — the 100 TB corpus
    is scanned once, never shuffled on grams, and the only shuffle
    carries one (doc_id, count) row per contaminated doc.

    ``benchmark`` defaults to docs with doc_id % 97 == 0 — a stand-in
    eval set drawn from the corpus so the operator is runnable and
    oracle-checkable on the test tables; real use passes the actual
    benchmark table.  Returns (doc_id, n_overlap, contaminated) for
    every corpus document (benchmark members trivially flag themselves —
    a real run excludes them via the report itself)."""
    docs = rebalance_for_cpu(table(spark, sf_dir, "documents"))
    if benchmark is None:
        benchmark = docs.where(F.col("doc_id") % 97 == 0)
    grams = shingles_expr(n, "_toks")
    bench_grams = (
        benchmark.withColumn("_toks", F.expr(_TOKS))
        .select(F.explode(F.expr(f"array_distinct({grams})")).alias("g"))
        .distinct()
    )
    corp_grams = (
        docs.withColumn("_toks", F.expr(_TOKS))
        .select("doc_id", F.explode(F.expr(f"array_distinct({grams})")).alias("g"))
    )
    hits = (
        corp_grams.join(F.broadcast(bench_grams), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))
    )
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long").alias("n_overlap"),
            (F.coalesce(F.col("n_overlap"), F.lit(0)) >= min_hits).alias("contaminated"),
        )
    )


DECONTAMINATE_SQL = f"""
WITH toked AS (
    SELECT doc_id, {{toks}} AS toks FROM documents
), grams AS (
    SELECT doc_id, unnest(list_distinct({{grams}})) AS g FROM toked
), bench AS (
    SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0
), hits AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_overlap
    FROM grams JOIN bench USING (g)
    GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(n_overlap, 0) AS n_overlap,
       COALESCE(n_overlap, 0) >= 1 AS contaminated
FROM (SELECT doc_id FROM documents) d LEFT JOIN hits USING (doc_id)
"""


def decontaminate_oracle_sql(n: int = DECON_N) -> str:
    from streamsum_spark.functions.expressions import TOKENS_SQL, shingles_sql

    return DECONTAMINATE_SQL.format(toks=TOKENS_SQL, grams=shingles_sql(n))


# --- exact substring dedup (duplicated n-gram spans) ------------------------

SPAN_N = 15  # window width in whitespace tokens


def duplicate_ngram_spans(
    spark: SparkSession, sf_dir: str, n: int = SPAN_N, docs: DataFrame | None = None
) -> DataFrame:
    """Every occurrence of an exact n-token window whose text appears
    more than once in the corpus, EXCEPT the globally-first occurrence
    (smallest (doc_id, start)): (doc_id, start 1-based, gram_md5) — the
    removal list of exact-substring deduplication (the within/across-
    document repeated-passage complement of the doc-level near-dup
    family; the remove-all-but-one posture of Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better",
    realized at n-gram-window granularity instead of suffix arrays,
    which don't distribute as one relation).

    Plan shape: one corpus scan (tokens projected once, windows via the
    guarded shingle transform), one shuffle on the window fingerprint
    (md5 text — exact-match semantics with constant-width shuffle
    keys), a window rank inside each fingerprint group.  No driver
    structures; output cardinality = duplicated occurrences only."""
    from pyspark.sql import Window

    if docs is None:
        docs = rebalance_for_cpu(table(spark, sf_dir, "documents"))
    grams = shingles_expr(n, "_toks")
    wins = (
        docs.select("doc_id", F.expr(_TOKS).alias("_toks"))
        .select(
            "doc_id",
            F.expr(
                f"explode(transform({grams}, (g, i) -> struct(i + 1 AS start, md5(g) AS g)))"
            ).alias("w"),
        )
        .select("doc_id", F.col("w.start").alias("start"), F.col("w.g").alias("g"))
    )
    byg = Window.partitionBy("g").orderBy("doc_id", "start")
    return (
        wins.withColumn("rn", F.row_number().over(byg))
        .withColumn("cnt", F.count(F.lit(1)).over(Window.partitionBy("g")))
        .where((F.col("cnt") > 1) & (F.col("rn") > 1))
        .select("doc_id", F.col("start").cast("long").alias("start"),
                F.col("g").alias("gram_md5"))
    )


def duplicate_ngram_spans_sql(n: int = SPAN_N) -> str:
    return rf"""
WITH toked AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
), wins AS (
  SELECT doc_id, i AS start, md5(array_to_string(toks[i:i+{n - 1}], ' ')) AS g
  FROM toked, UNNEST(range(1, len(toks) - {n - 2})) AS t(i)
  WHERE len(toks) >= {n}
)
SELECT doc_id, CAST(start AS BIGINT) AS start, g AS gram_md5
FROM (
  SELECT doc_id, start, g,
         row_number() OVER (PARTITION BY g ORDER BY doc_id, start) AS rn,
         count(*) OVER (PARTITION BY g) AS cnt
  FROM wins
) WHERE cnt > 1 AND rn > 1
"""


def strip_duplicate_spans(
    spark: SparkSession, sf_dir: str, n: int = SPAN_N
) -> DataFrame:
    """The corpus with duplicated spans REMOVED: every token covered by
    a flagged window (any start s with s <= pos < s + n) is dropped;
    the first occurrence of each window survives untouched.  Returns
    (doc_id, n_tokens, n_kept, text_clean).

    One extra shuffle beyond the span relation (starts collect per
    doc_id) + an expression-level positional filter.  The starts
    relation is one row per FLAGGED doc — O(corpus) on a duplicate-
    heavy crawl — so it carries NO broadcast hint: AQE broadcasts it
    while it measures small (the corpus token arrays then never
    shuffle) and degrades to a doc_id shuffle join otherwise, the same
    posture as dedup_corpus's drop-list."""
    docs = rebalance_for_cpu(table(spark, sf_dir, "documents"))
    starts = (
        duplicate_ngram_spans(spark, sf_dir, n)
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("start")).alias("starts"))
    )
    kept = (
        f"filter(_toks, (x, i) -> NOT exists(starts, s -> i + 1 >= s AND i + 1 < s + {n}))"
    )
    return (
        docs.select("doc_id", F.expr(_TOKS).alias("_toks"))
        .join(starts, "doc_id", "left")
        .withColumn("starts", F.coalesce("starts", F.expr("array()")))
        .select(
            "doc_id",
            F.expr("CAST(size(_toks) AS BIGINT)").alias("n_tokens"),
            F.expr(f"CAST(size({kept}) AS BIGINT)").alias("n_kept"),
            F.expr(f"array_join({kept}, ' ')").alias("text_clean"),
        )
    )


# ---------------------------------------------------------------------------
# Threshold-tuned LSH banding: generalized (b bands x r rows) over the
# minhash signature, with (b, r) chosen from the target Jaccard
# threshold by minimizing the S-curve error integral (the standard
# Mining-of-Massive-Datasets construction).  The r=1 banding above is
# the high-recall special case; production dedup at tight thresholds
# (0.7-0.9) wants r > 1 so that candidate volume — the term that
# explodes at 100 TB — collapses for sub-threshold pairs.


def lsh_collision_prob(s: float, b: int, r: int) -> float:
    """P(some band collides) for a pair with Jaccard similarity s under
    b bands of r minhashes: 1 - (1 - s^r)^b."""
    return 1.0 - (1.0 - s**r) ** b


def lsh_error(b: int, r: int, threshold: float, steps: int = 2000) -> float:
    """S-curve error mass for (b, r) at ``threshold``: the false-positive
    area below it plus the false-negative area above it, midpoint-
    integrated over a uniform similarity prior.  Deterministic pure
    arithmetic — safe to call at plan time on any driver."""
    fp = fn = 0.0
    for i in range(steps):
        s = (i + 0.5) / steps
        p = lsh_collision_prob(s, b, r)
        if s < threshold:
            fp += p
        else:
            fn += 1.0 - p
    return (fp + fn) / steps


def choose_lsh_params(threshold: float, n_hashes: int = NUM_HASHES) -> tuple[int, int]:
    """(b, r) with b*r <= n_hashes minimizing the S-curve error at the
    target threshold.  Ties break toward more bands (recall) — at dedup
    scale a false positive costs one verification join row, a false
    negative is a duplicate shipped to training."""
    if not 0.0 < threshold < 1.0:
        raise ValueError("threshold must be in (0, 1)")
    best = None
    for r in range(1, n_hashes + 1):
        for b in range(1, n_hashes // r + 1):
            cand = (lsh_error(b, r, threshold), -b, r)
            if best is None or cand < best:
                best = cand
    return (-best[1], best[2])


def banded_keys(sig: DataFrame, b: int, r: int, n_hashes: int = NUM_HASHES) -> DataFrame:
    """(doc_id, band_id, bkey) from signature ROWS (doc_id, band, mh):
    band_id i in [0, b) covers minhashes i*r+1 .. i*r+r and bkey is the
    md5 of their comma-joined decimal forms — one constant-width string
    key per band regardless of r, so the candidate self-join shuffles
    |docs| x b small rows for ANY r (same scale shape as the r=1 path).
    Pure expressions: one groupBy to re-widen the signature, then a
    transform/explode; md5 keeps the key cross-engine hashable for the
    DuckDB oracle."""
    if b < 1 or r < 1 or b * r > n_hashes:
        raise ValueError(f"need 1 <= b*r <= {n_hashes}, got b={b} r={r}")
    wide = sig.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("band", "mh"))).alias("a")
    )
    return wide.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {b - 1}), i -> struct(i AS band_id, "
                f"md5(array_join(transform(slice(a, i * {r} + 1, {r}), "
                f"x -> CAST(x.mh AS STRING)), ',')) AS bkey))"
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band_id", "bb.bkey")


def near_dup_tuned(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.5,
    max_bucket: int | None = None,
    docs: DataFrame | None = None,
    cache_token: str | None = None,
) -> DataFrame:
    """near_dup_verified with threshold-TUNED banding: (b, r) from
    choose_lsh_params, banded candidate join, exact Jaccard verify at
    the same threshold.  Identical 100 TB posture to near_dup_verified
    (bucketed band join, optional hot-bucket cap, persisted shared
    shingle relation) — but at tight thresholds the r>1 band key
    suppresses sub-threshold candidates BEFORE the verification join
    instead of after it, which is where the cost lives at scale.
    ``docs`` (doc_id, text) overrides the sf_dir documents table for
    composite pipelines, with ``cache_token`` keying the persisted
    intermediates in place of sf_dir (required together — see
    near_dup_verified)."""
    from pyspark.sql import Window

    from streamsum_spark.cached import shared_persist

    b, r = choose_lsh_params(threshold)
    if docs is not None and cache_token is None:
        raise ValueError(
            "near_dup_tuned(docs=...) needs an explicit cache_token: "
            "the persisted shingle/band relations are keyed by it, and "
            "the sf_dir fallback key would collide across pipelines"
        )
    key = cache_token or sf_dir
    sh = shared_persist(
        ("shingle_sets", key), shingle_sets(spark, sf_dir, docs=docs)
    )
    bands = shared_persist(
        ("minhash_banded", key, b, r), banded_keys(_signatures_from(sh), b, r)
    )
    if max_bucket is not None:
        w = Window.partitionBy("band_id", "bkey")
        bands = (
            bands.withColumn("_f", F.count(F.lit(1)).over(w))
            .where(F.col("_f") <= max_bucket)
            .drop("_f")
        )
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    scored = (
        cand.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sh.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.expr("size(array_intersect(sa.sh, sb.sh))").alias("_i"),
            F.expr("size(sa.sh) + size(sb.sh)").alias("_n"),
        )
        .select(
            "doc_a",
            "doc_b",
            (F.col("_i").cast("double") / (F.col("_n") - F.col("_i"))).alias("jaccard"),
        )
    )
    return scored.where(F.col("jaccard") >= threshold)


def near_dup_pairs_from_bands(
    spark: SparkSession,
    bands: DataFrame,
    docs: DataFrame,
    threshold: float = 0.5,
    max_bucket: int | None = None,
    cache_token: str | None = None,
) -> DataFrame:
    """near_dup_tuned's pair stage over PRECOMPUTED banded keys: the
    candidate join runs on ``bands`` (doc_id, band_id, bkey) and the
    exact-Jaccard verification shingles ONLY the candidate docs from
    ``docs`` (doc_id, text) — so a caller that caches bands keyed by a
    content hash (the streaming funnel's finalize) pays band
    DERIVATION only for new/changed docs and text-proportional
    shingling only for the candidate set, never the corpus.  Pair
    values are identical to near_dup_tuned over the same texts: the
    band keys are the same deterministic function of the text, and the
    verify formula is shared."""
    from streamsum_spark.cached import shared_persist

    if cache_token is None:
        raise ValueError(
            "near_dup_pairs_from_bands needs a cache_token keying its "
            "persisted candidate/shingle relations"
        )
    if max_bucket is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("band_id", "bkey")
        bands = (
            bands.withColumn("_f", F.count(F.lit(1)).over(w))
            .where(F.col("_f") <= max_bucket)
            .drop("_f")
        )
    # both sides of the candidate self-join consume bands (Catalyst
    # does not reuse exchanges across the aliased subtrees)
    bands = shared_persist(("nd_bands_in", cache_token), bands)
    cand = shared_persist(
        ("nd_band_cand", cache_token),
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct(),
    )
    need = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh = shared_persist(
        ("nd_cand_sh", cache_token),
        shingle_sets(
            spark, "", docs=docs.join(need, "doc_id", "left_semi")
        ),
    )
    scored = (
        cand.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sh.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.expr("size(array_intersect(sa.sh, sb.sh))").alias("_i"),
            F.expr("size(sa.sh) + size(sb.sh)").alias("_n"),
        )
        .select(
            "doc_a",
            "doc_b",
            (F.col("_i").cast("double") / (F.col("_n") - F.col("_i"))).alias("jaccard"),
        )
    )
    return scored.where(F.col("jaccard") >= threshold)


def near_dup_tuned_oracle_sql(threshold: float = 0.5) -> str:
    """DuckDB twin of near_dup_tuned — same (b, r) selection, same md5
    band keys, same verification — for the value-hash oracle."""
    b, r = choose_lsh_params(threshold)
    return f"""
WITH sig AS ({MINHASH_SIG_SQL}),
wide AS (SELECT doc_id, list(mh ORDER BY band) AS mhs FROM sig GROUP BY doc_id),
bands AS (
    SELECT doc_id, i AS band_id,
           md5(array_to_string(mhs[i * {r} + 1 : i * {r} + {r}], ',')) AS bkey
    FROM wide, (SELECT unnest(range({b})) AS i)
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.bkey = b.bkey AND a.doc_id < b.doc_id
),
sh AS (
    SELECT doc_id, list_distinct({_SHINGLES_SQL}) AS sh
    FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
)
SELECT doc_a, doc_b, jaccard FROM (
    SELECT doc_a, doc_b,
           CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
               / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) AS jaccard
    FROM cand
    JOIN sh sa ON doc_a = sa.doc_id
    JOIN sh sb ON doc_b = sb.doc_id
)
WHERE jaccard >= {threshold}
"""


def dedup_paragraphs(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Paragraph-level exact dedup (the RefinedWeb/Dolma stage between
    document near-dup and n-gram span dedup): split each document on
    newlines, drop every paragraph whose exact text already occurred
    earlier in the corpus (globally-first occurrence by (doc_id, idx)
    survives — the remove-all-but-one posture of duplicate_ngram_spans
    at paragraph granularity, where boilerplate like cookie banners and
    nav footers actually repeats), and rebuild the documents.

    Output: (doc_id, text_clean, n_paras, n_dropped) for every doc.

    Plan shape: one corpus scan (posexplode of the newline split), one
    shuffle on the paragraph md5 (constant-width keys — paragraph TEXT
    never shuffles twice), one doc-keyed rebuild aggregation.  Blank /
    whitespace-only paragraphs are structure, not content: they pass
    through unexamined and unstripped, so surviving text keeps its
    paragraph boundaries."""
    from pyspark.sql import Window

    if docs is None:
        docs = rebalance_for_cpu(table(spark, sf_dir, "documents"))
    paras = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), "\n")).alias("idx", "para"),
    )
    content = F.trim(F.col("para")) != ""
    byp = Window.partitionBy("p_md5").orderBy("doc_id", "idx")
    # blanks get UNIQUE window keys: a shared null/blank key would put
    # every blank line in the corpus into ONE window partition — a skew
    # key that grows with the corpus (they are exempt from dedup anyway)
    flagged = paras.withColumn(
        "p_md5",
        F.when(content, F.md5(F.col("para"))).otherwise(
            F.concat_ws("-", F.lit("blank"), F.col("doc_id"), F.col("idx"))
        ),
    ).withColumn(
        "dup",
        F.when(content, F.row_number().over(byp) > 1).otherwise(F.lit(False)),
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.concat_ws(
                "\n",
                F.expr(
                    "transform(filter(sort_array(collect_list(struct(idx, para, dup))),"
                    " x -> NOT x.dup), x -> x.para)"
                ),
            ).alias("text_clean"),
            F.count(F.lit(1)).cast("long").alias("n_paras"),
            F.sum(F.when(F.col("dup"), 1).otherwise(0)).cast("long").alias("n_dropped"),
        )
    )


DEDUP_PARAGRAPHS_SQL = r"""
WITH paras AS (
  SELECT doc_id, i - 1 AS idx, parts[i] AS para
  FROM (SELECT doc_id, string_split(text, chr(10)) AS parts FROM documents),
       UNNEST(range(1, len(parts) + 1)) AS t(i)
), flagged AS (
  SELECT doc_id, idx, para,
         CASE WHEN trim(para) != '' THEN
           row_number() OVER (PARTITION BY md5(para) ORDER BY doc_id, idx) > 1
         ELSE FALSE END AS dup
  FROM paras
)
SELECT doc_id,
       array_to_string(list(para ORDER BY idx) FILTER (WHERE NOT dup), chr(10)) AS text_clean,
       CAST(count(*) AS BIGINT) AS n_paras,
       CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM flagged
GROUP BY doc_id
"""


def strip_flagged_paragraphs(docs: DataFrame, flags: DataFrame) -> DataFrame:
    """Rebuild documents with a (doc_id, idx) paragraph drop-set removed
    — the read side shared by dedup_paragraphs' streaming twin and any
    persisted drop-list workflow.  One left join on doc_id (the flag
    relation is dropped-paragraphs-sized) + an index-aware array
    ``filter`` PROJECTION over the split text: no paragraph explode and
    no rebuild groupBy — the rebuild costs zero shuffles beyond the
    drop-set aggregation, where the old explode-and-regroup form paid a
    corpus-paragraph-wide exchange twice."""
    drops = flags.groupBy("doc_id").agg(
        F.collect_set("idx").alias("_drop_idx")
    )
    return (
        # null-text docs produce no row, matching the explode form
        docs.where(F.col("text").isNotNull())
        .join(drops, "doc_id", "left")
        .select(
            "doc_id",
            F.concat_ws(
                "\n",
                F.expr(
                    "filter(split(text, '\\n'), (x, i) -> _drop_idx IS NULL"
                    " OR NOT array_contains(_drop_idx, CAST(i AS BIGINT)))"
                ),
            ).alias("text_clean"),
            F.size(F.split(F.col("text"), "\n")).cast("long").alias("n_paras"),
            F.coalesce(
                F.size(
                    F.expr(
                        "filter(_drop_idx, x -> x >= 0"
                        " AND x < size(split(text, '\\n')))"
                    )
                ),
                F.lit(0),
            ).cast("long").alias("n_dropped"),
        )
    )
