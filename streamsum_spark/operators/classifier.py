"""Hashed-feature text classifier — the quality/language filter stage
of a web-scale training pipeline (north-star extension, not in the
reference).  CCNet/DCLM-style pipelines gate documents with a linear
classifier over hashed token n-grams (fastText's representation); this
module implements the closed-form member of that family — multinomial
Naive Bayes over the SAME feature pipeline — because it trains in ONE
aggregation pass: no per-iteration Spark job, which is the difference
between a bounded-job training run and the O(steps) scheduling wall an
SGD loop pays at any cluster size (the same trap train_bpe's
per-merge-round loop had before round 12).

Feature pipeline (the fastText hashing trick): whitespace tokens plus
adjacent-pair bigrams, each mapped to ``pmod(xxhash64(feature),
n_buckets)`` — vocabulary-independent state, so the MODEL is at most
``n_buckets`` rows by construction.  That bound is the scale contract:
at the default 2^18 buckets a pivoted model is ~10 MB — broadcastable
regardless of corpus size.

Plan shapes (everything JVM-side — explode / xxhash64 / log / sum; no
Python anywhere):

- train: one exploded scan → groupBy(label, bucket) partial-combined
  count (the ONLY corpus-sized shuffle; output ≤ labels × n_buckets
  rows) pivoted label-wide, plus one tiny agg over the docs scan for
  priors.  Constant job count, independent of corpus and vocabulary.
- apply: exploded scan → BROADCAST left join against the pivoted model
  (narrow) → one groupBy(doc) shuffle summing log-likelihood terms.
  Docs with zero tokens survive via explode_outer and score on priors
  alone.

Scoring is textbook multinomial NB with Lidstone smoothing:
``score(d, l) = log P(l) + Σ_t log(cnt(l, b_t) + α) − n_d·log(total_l
+ α·B)`` — argmax over labels via array_max on (score, label) structs,
so ties break to the lexicographically largest label,
deterministically.  The math is pinned exactly against a pure-Python
reference in tests/test_classifier.py, and holdout accuracy is pinned
on a synthetic labeled corpus with known class distributions."""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 1 << 18

_TOKS = "filter(split(lower(trim({col})), '\\\\s+'), x -> x != '')"


def _features_expr(col: str, bigrams: bool) -> str:
    toks = _TOKS.format(col=col)
    if not bigrams:
        return toks
    pairs = (
        f"zip_with(slice({toks}, 1, greatest(size({toks}) - 1, 0)), "
        f"slice({toks}, 2, greatest(size({toks}) - 1, 0)), "
        f"(a, b) -> concat(a, ' ', b))"
    )
    return f"concat({toks}, {pairs})"


def hashed_token_features(
    df: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
    n_buckets: int = N_BUCKETS,
    bigrams: bool = True,
) -> DataFrame:
    """One row per (document, feature occurrence): the id columns plus
    ``bucket`` = pmod(xxhash64(feature), n_buckets).  Documents with no
    tokens keep ONE row with a null bucket (explode_outer), so joins
    back to the corpus never drop them."""
    feats = _features_expr(text_col, bigrams)
    return df.select(
        *id_cols, F.explode_outer(F.expr(feats)).alias("feat")
    ).select(
        *id_cols,
        F.when(
            F.col("feat").isNotNull(),
            F.pmod(F.xxhash64("feat"), F.lit(n_buckets)),
        ).alias("bucket"),
    )


@dataclass
class NBModel:
    """A trained classifier: the pivoted count relation (bucket,
    cnt_<label>...; ≤ n_buckets rows — broadcastable by construction)
    plus the driver-side scalars (one float per label)."""

    labels: list[str]
    log_prior: dict[str, float]
    total: dict[str, int]  # feature occurrences per label
    counts: DataFrame  # bucket long, cnt_<label> long ...
    alpha: float
    n_buckets: int
    bigrams: bool

    def norm(self, label: str) -> float:
        """log(total_l + α·B) — the per-token normalizer."""
        return math.log(self.total[label] + self.alpha * self.n_buckets)


def batch_count_rows(
    docs: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
    bigrams: bool = True,
) -> DataFrame:
    """The sufficient statistics of NB training as ONE sum-mergeable
    relation (label, bucket, cnt): feature-occurrence counts per
    (label, bucket ≥ 0) plus per-label DOCUMENT counts under the
    sentinel bucket −1 (pmod never yields it).  Additivity is the point
    — counts from disjoint corpus slices sum to the full-corpus counts,
    which is what makes the streaming twin a keyed sum-merge."""
    feats = hashed_token_features(
        docs.select(F.col(label_col).alias("label"), text_col),
        text_col,
        id_cols=("label",),
        n_buckets=n_buckets,
        bigrams=bigrams,
    ).where(F.col("bucket").isNotNull())
    counts = feats.groupBy("label", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    doc_counts = docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("cnt")
    ).select("label", F.lit(-1).cast("long").alias("bucket"), "cnt")
    return counts.unionByName(doc_counts)


def model_from_count_rows(
    count_rows: DataFrame,
    n_buckets: int = N_BUCKETS,
    alpha: float = 1.0,
    bigrams: bool = True,
) -> NBModel:
    """NBModel from a (label, bucket, cnt) sufficient-statistics
    relation (batch_count_rows' shape, or the same rows sum-merged from
    a stream's state table).  Bounded work only: the relation is at
    most labels × (n_buckets + 1) rows."""
    count_rows = count_rows.localCheckpoint(eager=True)
    per_label = {
        r["label"]: (int(r["n_docs"]), int(r["n_feats"]))
        for r in count_rows.groupBy("label")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("bucket") == -1, F.col("cnt"))), F.lit(0)
            ).alias("n_docs"),
            # a label whose every document is blank contributes doc
            # counts but zero feature rows — its likelihood is pure
            # smoothing, not a crash
            F.coalesce(
                F.sum(F.when(F.col("bucket") >= 0, F.col("cnt"))), F.lit(0)
            ).alias("n_feats"),
        )
        .collect()
    }
    labels = sorted(per_label)
    # label values become cnt_<label> column references in the apply
    # plan — reject separators the unquoted column parser would eat
    bad = [l for l in labels if any(ch in l for ch in ".`\n")]
    if bad:
        raise ValueError(
            f"labels must not contain '.', backticks or newlines: {bad}"
        )
    n_total = sum(n for n, _ in per_label.values())
    wide = (
        count_rows.where(F.col("bucket") >= 0)
        .groupBy("bucket")
        .pivot("label", labels)
        .sum("cnt")
    )
    wide = wide.select(
        "bucket", *[F.col(f"`{l}`").alias(f"cnt_{l}") for l in labels]
    )
    return NBModel(
        labels=labels,
        log_prior={l: math.log(per_label[l][0] / n_total) for l in labels},
        total={l: per_label[l][1] for l in labels},
        counts=wide,
        alpha=alpha,
        n_buckets=n_buckets,
        bigrams=bigrams,
    )


def train_nb(
    docs: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
    alpha: float = 1.0,
    bigrams: bool = True,
) -> NBModel:
    """One-pass training: feature counts per (label, bucket) in a
    single partial-combined shuffle, priors from one tiny agg.  The
    driver holds one row per label (priors/totals) and the label list
    — label cardinality is assumed filter-sized (quality tiers,
    languages), never corpus-sized."""
    return model_from_count_rows(
        batch_count_rows(docs, label_col, text_col, n_buckets, bigrams),
        n_buckets=n_buckets,
        alpha=alpha,
        bigrams=bigrams,
    )


def nb_scores(
    docs: DataFrame,
    model: NBModel,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_feats, score_<label>..., predicted) for every input row.
    Narrow broadcast join feature→model, then ONE doc-keyed shuffle;
    a zero-token document scores on priors alone."""
    feats = hashed_token_features(
        docs.select(id_col, text_col),
        text_col,
        id_cols=(id_col,),
        n_buckets=model.n_buckets,
        bigrams=model.bigrams,
    )
    joined = feats.join(F.broadcast(model.counts), "bucket", "left")
    a = model.alpha
    aggs = [F.count("bucket").alias("n_feats")] + [
        F.sum(
            F.when(
                F.col("bucket").isNotNull(),
                F.log(F.coalesce(F.col(f"cnt_{l}"), F.lit(0)) + F.lit(a)),
            )
        ).alias(f"_ll_{l}")
        for l in model.labels
    ]
    scored = joined.groupBy(id_col).agg(*aggs)
    score_cols = [
        (
            F.lit(model.log_prior[l])
            + F.coalesce(F.col(f"_ll_{l}"), F.lit(0.0))
            - F.col("n_feats") * F.lit(model.norm(l))
        ).alias(f"score_{l}")
        for l in model.labels
    ]
    scored = scored.select(id_col, "n_feats", *score_cols)
    best = F.array_max(
        F.array(
            *[
                F.struct(F.col(f"score_{l}").alias("s"), F.lit(l).alias("l"))
                for l in model.labels
            ]
        )
    )
    return scored.withColumn("predicted", best["l"])


def quality_filter_nb(
    docs: DataFrame,
    model: NBModel,
    keep_label: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_margin: float = 0.0,
) -> DataFrame:
    """The funnel-stage form: keep rows the classifier assigns
    ``keep_label`` with at least ``min_margin`` log-odds over the best
    other label — the standard CCNet-style gate (margin 0 = plain
    argmax; raise it to trade recall for precision)."""
    scored = nb_scores(docs, model, text_col=text_col, id_col=id_col)
    others = [F.col(f"score_{l}") for l in model.labels if l != keep_label]
    if not others:
        raise ValueError("keep_label must leave at least one other label")
    best_other = F.greatest(*others) if len(others) > 1 else others[0]
    margin = F.col(f"score_{keep_label}") - best_other
    keep_ids = scored.where(margin >= F.lit(min_margin)).select(
        id_col, margin.alias("margin")
    )
    return docs.join(keep_ids, id_col)


def classifier_drop_flags(
    docs: DataFrame,
    model: NBModel,
    keep_label: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_margin: float = 0.0,
    rule_name: str = "drop_classifier",
) -> DataFrame:
    """The margin gate as a curation-funnel rule: (doc_id, <rule_name>)
    with True where the classifier does NOT assign ``keep_label`` with
    at least ``min_margin`` log-odds — plug into
    curation.curation_funnel / curate_documents via their ``extra``
    parameter so classifier drops get audited stages like every other
    rule."""
    scored = nb_scores(docs, model, text_col=text_col, id_col=id_col)
    others = [F.col(f"score_{l}") for l in model.labels if l != keep_label]
    if not others:
        raise ValueError("keep_label must leave at least one other label")
    best_other = F.greatest(*others) if len(others) > 1 else others[0]
    margin = F.col(f"score_{keep_label}") - best_other
    return scored.select(
        id_col, (margin < F.lit(min_margin)).alias(rule_name)
    )
