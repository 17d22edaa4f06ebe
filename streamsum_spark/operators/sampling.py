"""Dataset-preparation operators for training pipelines: deterministic
splits, shuffles, and sequence packing.

Randomness is hash-based, never rand(): md5 of the stable id gives the
same assignment on every engine and every run — reproducible splits are a
correctness property for training data (and what makes these
oracle-checkable).  All expression-level; shuffle cost is one window or
one hash aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streamsum_spark.tables import table

# percentage buckets from the first 8 md5 hex chars (uniform over 2^32)
_BUCKET = "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100"


def train_val_split(spark: SparkSession, sf_dir: str, val_pct: int = 10) -> DataFrame:
    """Deterministic 90/10 split by id-hash bucket.  Adding docs never
    reassigns existing ones (stable under corpus growth), unlike
    randomSplit."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr(_BUCKET).alias("bucket"),
        F.expr(f"CASE WHEN {_BUCKET} < {val_pct} THEN 'val' ELSE 'train' END").alias("split"),
    )


TRAIN_VAL_SPLIT_SQL = f"""
SELECT doc_id,
       ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bucket,
       CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 10
            THEN 'val' ELSE 'train' END AS split
FROM documents
"""


def pack_into_chunks(
    spark: SparkSession,
    sf_dir: str,
    budget: int = 2048,
    docs: DataFrame | None = None,
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Sequence packing: deterministically shuffle docs (order by id-hash),
    then assign each to a training chunk so cumulative token count per
    chunk stays under ``budget`` — the greedy-in-fixed-order packing used
    to build context windows.

    Scale design: the shuffle space is PARTITIONED by the first hex char of
    the id-hash (16 independent pack streams), and each partition packs
    independently with its own window — ``Window.partitionBy(part)``, so no
    single task ever sorts or prefix-sums the whole corpus (the
    unpartitioned form is a 100 TB scale-killer: one task, one global
    sort).  The chunk identity is the pair (part, chunk): deterministic,
    stable under corpus growth within a partition, and each partition's
    chunks are independently consumable by a data loader.  At larger
    corpora widen ``part`` to 2+ hex chars (256+ streams).

    ``docs`` lets a composite (corpus_prep) pack an already-filtered
    corpus instead of the raw table; it must carry (doc_id, text) — or
    (doc_id, <n_tokens_col>) with ``n_tokens_col`` naming a PRECOMPUTED
    token-count column, in which case the text is never touched: the
    packing math is a pure function of (doc_id, n_tokens), so a caller
    holding counts in compact state (the frozen streaming funnel) packs
    from metadata alone and the assignment is bit-identical to the
    text-fed form."""
    if docs is None:
        docs = table(spark, sf_dir, "documents")
    toks = "CAST(size(split(trim(text), '\\\\s+')) AS BIGINT)"
    part = "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 1), 16, 10) AS BIGINT)"
    n_tok = (
        F.col(n_tokens_col).cast("long")
        if n_tokens_col is not None
        else F.expr(toks)
    )
    shuffled = docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.expr(part).alias("part"),
        F.md5(F.col("doc_id").cast("string")).alias("_ord"),
    )
    w = (
        Window.partitionBy("part")
        .orderBy("_ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        shuffled.withColumn("running", F.sum("n_tokens").over(w))
        .select(
            "doc_id",
            "n_tokens",
            "part",
            F.expr(f"CAST((running - n_tokens) / {budget} AS BIGINT)").alias("chunk"),
        )
    )


def split_token_windows(
    spark: SparkSession,
    sf_dir: str,
    window: int = 64,
    stride: int = 48,
    docs: DataFrame | None = None,
) -> DataFrame:
    """Sliding token windows: split each document into fixed-size
    overlapping windows of ``window`` tokens every ``stride`` tokens —
    the complement of pack_into_chunks (that packs SHORT docs up to a
    budget; this cuts LONG docs down to one), and the standard prep step
    before embedding or context-window training when documents exceed
    the model's window.

    Window starts are 0, stride, 2*stride, ... while start < n_tokens,
    so consecutive windows overlap by ``window - stride`` tokens and the
    tail window may be shorter; expansion factor is ~window/stride.

    Scale design: one corpus scan, split + sequence + explode + slice —
    all JVM built-ins inside whole-stage codegen, NO shuffle and no
    Python anywhere: each task windows its own partition's documents
    independently, which is as 100 TB-friendly as an operator gets.
    DuckDB oracle: SPLIT_TOKEN_WINDOWS_SQL (generate_series + list
    slicing), pinned in tests/test_demoted_oracles.py."""
    if docs is None:
        docs = table(spark, sf_dir, "documents")
    # empty/whitespace-only docs must be dropped BEFORE tokenizing:
    # split(trim(''), '\s+') yields [''] (size 1), which would emit a
    # bogus (n_tokens=1, chunk_text='') window — and DuckDB's
    # regexp_split_to_array shares the quirk, so the oracle alone cannot
    # catch it (the SQL mirrors this predicate).  rlike '\S', not
    # trim() != '': trim strips only spaces, so a tab-only doc would
    # slip through a trim-based check in BOTH engines.
    docs = docs.where(F.col("text").rlike(r"\S"))
    toks = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("toks")
    )
    return toks.withColumn(
        "st", F.explode(F.expr(f"sequence(0, size(toks) - 1, {stride})"))
    ).select(
        "doc_id",
        F.expr(f"CAST(st DIV {stride} AS BIGINT)").alias("win_id"),
        F.expr(f"CAST(size(slice(toks, st + 1, {window})) AS BIGINT)").alias("n_tokens"),
        F.expr(f"array_join(slice(toks, st + 1, {window}), ' ')").alias("chunk_text"),
    )


SPLIT_TOKEN_WINDOWS_SQL = r"""
SELECT doc_id,
       CAST(st // 48 AS BIGINT) AS win_id,
       CAST(len(toks[st + 1 : st + 64]) AS BIGINT) AS n_tokens,
       array_to_string(toks[st + 1 : st + 64], ' ') AS chunk_text
FROM (
    SELECT doc_id, toks, unnest(range(0, len(toks), 48)) AS st
    FROM (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents
        WHERE regexp_matches(text, '\S')
    )
)
"""


def stratified_sample(
    spark: SparkSession,
    sf_dir: str,
    rates_permille: dict[str, int] | None = None,
    default_permille: int = 900,
    salt: str = "strat1",
) -> DataFrame:
    """Per-language stratified downsampling: keep a document iff
    md5(salt || doc_id) % 1000 < its language's keep-rate (permille).

    This is the corpus-rebalancing move of a training-data pipeline
    (e.g. downweight the over-represented language) done RIGHT for scale:
    the keep decision is a pure projection + filter on the scan — no
    shuffle, no rand() (reruns and engines agree, and adding documents
    never flips existing decisions).  The salt gives independent draws
    for independent sampling stages over the same corpus."""
    rates = {"en": 300, **(rates_permille or {})}
    bucket = f"CAST(conv(substring(md5(CONCAT('{salt}', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT) % 1000"
    branches = " ".join(
        f"WHEN lang = '{k}' THEN {v}" for k, v in sorted(rates.items())
    )
    rate = f"CASE {branches} ELSE {default_permille} END"
    docs = table(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", "source").where(
        F.expr(f"{bucket} < {rate}")
    )


STRATIFIED_SAMPLE_SQL = """
SELECT doc_id, lang, source
FROM documents
WHERE ('0x' || substr(md5('strat1' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000
      < CASE WHEN lang = 'en' THEN 300 ELSE 900 END
"""


def reservoir_per_key(
    spark: SparkSession, sf_dir: str, n: int = 20, key: str = "source"
) -> DataFrame:
    """Deterministic uniform cap of ``n`` documents per ``key`` (the
    per-source contribution cap of corpus mixing): rank by id-hash within
    the key and keep the first n — an order-by-hash reservoir whose
    membership is a uniform sample yet reproducible across engines/runs.

    Plan: one shuffle on the key; WindowGroupLimit keeps only n rows per
    key through the sort, so the window never materializes a full
    per-key ordering at scale."""
    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy(key).orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (
        docs.select("doc_id", key)
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= n)
    )


RESERVOIR_PER_KEY_SQL = """
SELECT doc_id, source, rn FROM (
    SELECT doc_id, source,
           CAST(row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ) AS BIGINT) AS rn
    FROM documents
) WHERE rn <= 20
"""


PACK_INTO_CHUNKS_SQL = r"""
SELECT doc_id, n_tokens, part,
       CAST(floor((running - n_tokens) / 2048) AS BIGINT) AS chunk
FROM (
    SELECT doc_id, n_tokens, part,
           sum(n_tokens) OVER (PARTITION BY part ORDER BY _ord ROWS UNBOUNDED PRECEDING) AS running
    FROM (
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 1))::BIGINT AS part,
               md5(CAST(doc_id AS VARCHAR)) AS _ord
        FROM documents
    )
)
"""


def temperature_mix_sample(
    spark: SparkSession, sf_dir: str, alpha: float = 0.3
) -> DataFrame:
    """Temperature-based language mixing — the corpus-weighting step for
    multilingual LLM training mixes (the multilingual-T5 recipe: target
    shares p(L) ∝ n_L^alpha with alpha < 1 flattening toward uniform).
    Realized as downsampling-only keep rates — no doc is duplicated:
    rate_L = (n_min / n_L)^(1 - alpha), so every lower-resource language
    keeps ALL its docs (rate 1.0) and larger languages are sampled down
    toward the flattened share; alpha=1 keeps natural proportions,
    alpha=0 equalizes counts.  The synthetic corpus is en-heavy (~2-3x
    the others), so the rates genuinely discriminate.

    Selection is deterministic id-hash thresholding (md5 bucket <
    rate * 2^32), never rand(): the same doc keeps/drops on every run and
    on every engine, which is what makes a mixing decision auditable —
    and DuckDB-oracle-checkable (tests/test_demoted_oracles
    'temperature_mix_sample').

    Scale shape: one hash-agg over source (tiny relation) broadcast back
    onto the scan; the filter is a pure per-row expression — no shuffle
    of the corpus at all."""
    docs = table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_lang"))
    # rate_L = (n_min / n_L)^(1-alpha): computed on the tiny per-language
    # relation, then broadcast-joined onto the corpus scan
    n_min = counts.agg(F.min("n_lang").alias("m"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        "lang",
        F.col("n_lang").cast("long").alias("n_lang"),
        F.pow(F.col("m") / F.col("n_lang"), F.lit(1.0 - alpha)).alias("rate"),
    )
    hash64 = "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)"
    return (
        docs.join(F.broadcast(rates), "lang")
        .where(F.expr(hash64) < F.col("rate") * F.lit(float(1 << 32)))
        .select("doc_id", "lang", "n_lang", F.round("rate", 9).alias("rate"))
    )


_TEMPERATURE_MIX_SQL_TEMPLATE = """
WITH counts AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_lang FROM documents GROUP BY lang
), rates AS (
  SELECT lang, n_lang,
         pow(CAST((SELECT min(n_lang) FROM counts) AS DOUBLE) / n_lang, {exponent}) AS rate
  FROM counts
)
SELECT doc_id, d.lang AS lang, n_lang, round(rate, 9) AS rate
FROM documents d JOIN rates r ON d.lang = r.lang
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT < rate * 4294967296.0
"""


def temperature_mix_sql(alpha: float = 0.3) -> str:
    """DuckDB oracle for temperature_mix_sample AT THE SAME alpha: the
    exponent is derived from the parameter (repr of the identical
    Python double the Spark side folds into its plan), so the pair
    cannot silently drift for non-default alphas."""
    return _TEMPERATURE_MIX_SQL_TEMPLATE.format(exponent=repr(1.0 - alpha))


TEMPERATURE_MIX_SQL = temperature_mix_sql()
