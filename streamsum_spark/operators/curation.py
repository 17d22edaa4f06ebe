"""Auditable corpus-curation funnel — per-rule drop accounting over the
full filter battery.

corpus_prep (operators/sampling.py path) already composes quality →
near-dup → rebalance → packing; what a production run additionally
needs is the AUDIT: "how many documents did each rule remove, in
order" — the funnel every dataset paper publishes and every pipeline
regression watches (a rule whose drop count doubles between crawls is
a bug or a drift alarm).  This module computes it in one pass:

1. every rule contributes a per-doc boolean DROP flag into a single
   relation — the Gopher quality rules are expression columns from one
   projection (text.gopher_quality_flags thresholds, same literals);
   exact-dup (md5 non-first, the dedup_exact rank), near-dup
   (dedup_corpus's cluster non-survivors), and decontamination
   (benchmark n-gram hits) are keep/drop-set joins with NO broadcast
   hints (drop-sets are O(corpus) by construction — AQE downgrades);
2. stage attribution is first-rule-wins: a doc dropped by rule k
   counts there only if it survived rules 1..k-1 (conditional sums,
   map-side combined);
3. the funnel aggregates to ONE row of k counters — the only collect
   is that bounded row.

curate_documents returns the survivors (the relation the next pipeline
stage consumes); curation_funnel returns (stage, rule, n_in,
n_dropped, n_out) as a relation for dashboards/regression pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamsum_spark.tables import table


def _rule_flags(
    spark: SparkSession, sf_dir: str, extra: DataFrame | None = None
) -> DataFrame:
    """One row per document with an ordered boolean DROP column per
    rule.  Quality rules are one projection over the scan; the
    relational rules join doc_id drop-sets.

    ``extra`` appends caller-supplied rules: a (doc_id, drop_* ...)
    relation — e.g. classifier.classifier_drop_flags' margin gate —
    left-joined and coalesced false, attributed AFTER the built-in
    battery (funnels stay comparable across runs that add rules)."""
    from streamsum_spark.operators.clusters import dedup_corpus
    from streamsum_spark.operators.dedup import decontaminate
    from streamsum_spark.operators.text import gopher_quality_flags

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")

    g = gopher_quality_flags(spark, sf_dir).select(
        "doc_id",
        (~F.col("n_words").between(50, 100000)).alias("drop_word_count"),
        (~F.col("mean_word_len").between(3, 10)).alias("drop_word_len"),
        (F.col("symbol_ratio") > 0.1).alias("drop_symbol_ratio"),
        (
            (F.col("bullet_line_frac") >= 0.9)
            | (F.col("ellipsis_line_frac") >= 0.3)
        ).alias("drop_line_style"),
        (F.col("alpha_word_frac") < 0.8).alias("drop_non_alpha"),
        (F.col("n_distinct_stopwords") < 2).alias("drop_stopwords"),
    )

    # exact duplicates: every doc whose md5(text) already appeared at a
    # smaller doc_id (rank > 1 over the fingerprint — dedup_exact's
    # keep-first discipline)
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    exact_drop = (
        docs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") > 1)
        .select("doc_id", F.lit(True).alias("drop_exact_dup"))
    )

    # near-duplicates: the cluster members dedup_corpus removes
    survivors = dedup_corpus(spark, sf_dir).select(
        "doc_id", F.lit(True).alias("near_keep")
    )

    contaminated = (
        decontaminate(spark, sf_dir)
        .where(F.col("contaminated"))
        .select("doc_id", F.lit(True).alias("drop_contaminated"))
    )

    out = (
        docs.select("doc_id")
        .join(g, "doc_id", "left")
        .join(exact_drop, "doc_id", "left")
        .join(survivors, "doc_id", "left")
        .join(contaminated, "doc_id", "left")
        .select(
            "doc_id",
            *[F.coalesce(F.col(c), F.lit(False)).alias(c) for c in (
                "drop_word_count", "drop_word_len", "drop_symbol_ratio",
                "drop_line_style", "drop_non_alpha", "drop_stopwords",
                "drop_exact_dup",
            )],
            (~F.coalesce(F.col("near_keep"), F.lit(False))).alias("drop_near_dup"),
            F.coalesce(F.col("drop_contaminated"), F.lit(False)).alias(
                "drop_contaminated"
            ),
        )
    )
    if extra is not None:
        extra_cols = [c for c in extra.columns if c != "doc_id"]
        out = out.join(extra, "doc_id", "left").select(
            *[out[c] for c in out.columns if c not in extra_cols],
            *[
                F.coalesce(F.col(c), F.lit(False)).alias(c)
                for c in extra_cols
            ],
        )
    return out


RULES = [
    "drop_word_count", "drop_word_len", "drop_symbol_ratio",
    "drop_line_style", "drop_non_alpha", "drop_stopwords",
    "drop_exact_dup", "drop_near_dup", "drop_contaminated",
]


def curation_funnel(
    spark: SparkSession, sf_dir: str, extra: DataFrame | None = None
) -> DataFrame:
    """(stage, rule, n_in, n_dropped, n_out) per rule, first-rule-wins
    attribution.  One aggregation row crosses to the driver.  ``extra``
    rules (see _rule_flags) audit as additional trailing stages."""
    flags = _rule_flags(spark, sf_dir, extra)
    rules = RULES + (
        [c for c in extra.columns if c != "doc_id"] if extra is not None else []
    )
    aggs = [F.count(F.lit(1)).alias("n_total")]
    prior = F.lit(False)
    for r in rules:
        # coalesce: sum over ZERO rows is null, and the funnel math
        # below must see 0, not None, on an empty input relation
        aggs.append(
            F.coalesce(
                F.sum((F.col(r) & ~prior).cast("long")), F.lit(0)
            ).alias(f"d_{r}")
        )
        prior = prior | F.col(r)
    row = flags.agg(*aggs).collect()[0]  # ONE bounded row
    out_rows = []
    n = row["n_total"]
    for i, r in enumerate(rules):
        d = row[f"d_{r}"]
        out_rows.append((i + 1, r.removeprefix("drop_"), n, d, n - d))
        n -= d
    return spark.createDataFrame(
        out_rows, "stage int, rule string, n_in long, n_dropped long, n_out long"
    )


def curate_documents(
    spark: SparkSession, sf_dir: str, extra: DataFrame | None = None
) -> DataFrame:
    """The survivors of the full battery (plus any ``extra`` rules) —
    the relation the packing / tokenization stage consumes."""
    flags = _rule_flags(spark, sf_dir, extra)
    rules = RULES + (
        [c for c in extra.columns if c != "doc_id"] if extra is not None else []
    )
    cond = None
    for r in rules:
        cond = F.col(r) if cond is None else (cond | F.col(r))
    keep = flags.where(~cond).select("doc_id")
    docs = table(spark, sf_dir, "documents")
    return docs.join(keep, "doc_id", "left_semi").select(
        "doc_id", "lang", "source", "n_chars"
    )


# --- the media twin -----------------------------------------------------------

MEDIA_RULES = [
    "drop_unprobed", "drop_kind", "drop_small", "drop_low_quality",
    "drop_exact_dup",
]


def _media_rule_flags(
    media: DataFrame,
    kinds: tuple[str, ...] = ("image",),
    min_w: int = 32,
    min_h: int = 32,
    min_jpeg_quality: int = 30,
) -> DataFrame:
    """One row per blob with ordered boolean DROP columns, built from
    the DECODE-FREE header probe plus a content-hash dedup — no rule
    here pays a pixel decode, which is the entire point at 100 TB:
    the expensive decode runs only on curate_media's survivors.

    Rules: unprobed (unrecognized/corrupt header), wrong kind, below
    minimum dimensions (images and videos; audio passes), JPEG quality
    below threshold (the recompression signal; null quality passes),
    exact byte-duplicate (md5 keep-first — crawls re-fetch the same
    asset under many URLs)."""
    from pyspark.sql import Window

    from streamsum_spark.operators.media_probe import probe_media_headers

    p = probe_media_headers(media)
    w = Window.partitionBy(F.md5(F.col("content"))).orderBy("media_id")
    dup = (
        media.select("media_id", "content")
        .withColumn("rn", F.row_number().over(w))
        .select("media_id", (F.col("rn") > 1).alias("drop_exact_dup"))
    )
    kind_ok = F.col("kind").isin(*kinds)
    size_ok = (
        (F.col("kind") == "audio")
        | ((F.coalesce(F.col("width"), F.lit(0)) >= min_w)
           & (F.coalesce(F.col("height"), F.lit(0)) >= min_h))
    )
    q_ok = F.col("quality").isNull() | (F.col("quality") >= min_jpeg_quality)
    return (
        p.select(
            "media_id",
            (~F.col("probed")).alias("drop_unprobed"),
            (F.col("probed") & ~kind_ok).alias("drop_kind"),
            (F.col("probed") & kind_ok & ~size_ok).alias("drop_small"),
            (F.col("probed") & kind_ok & size_ok & ~q_ok).alias(
                "drop_low_quality"
            ),
        )
        .join(dup, "media_id")
    )


def media_curation_funnel(media: DataFrame, **rule_kw) -> DataFrame:
    """(stage, rule, n_in, n_dropped, n_out) over the media rule
    battery — same first-rule-wins accounting as the document funnel,
    same single bounded aggregate row."""
    flags = _media_rule_flags(media, **rule_kw)
    spark = media.sparkSession
    aggs = [F.count(F.lit(1)).alias("n_total")]
    prior = F.lit(False)
    for r in MEDIA_RULES:
        # coalesce: null sums over an empty relation would TypeError
        # in the n - d funnel arithmetic below
        aggs.append(
            F.coalesce(
                F.sum((F.col(r) & ~prior).cast("long")), F.lit(0)
            ).alias(f"d_{r}")
        )
        prior = prior | F.col(r)
    row = flags.agg(*aggs).collect()[0]
    out_rows = []
    n = row["n_total"]
    for i, r in enumerate(MEDIA_RULES):
        d = row[f"d_{r}"]
        out_rows.append((i + 1, r.removeprefix("drop_"), n, d, n - d))
        n -= d
    return spark.createDataFrame(
        out_rows, "stage int, rule string, n_in long, n_dropped long, n_out long"
    )


def curate_media(media: DataFrame, **rule_kw) -> DataFrame:
    """The surviving blobs — what the (expensive) decode/resize/feature
    stages should run on."""
    flags = _media_rule_flags(media, **rule_kw)
    cond = None
    for r in MEDIA_RULES:
        cond = F.col(r) if cond is None else (cond | F.col(r))
    keep = flags.where(~cond).select("media_id")
    return media.join(keep, "media_id", "left_semi")
