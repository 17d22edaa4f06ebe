"""Hashed-feature NB classifier (operators/classifier.py): the feature
pipeline against a pure-Python tokenizer, the NB math pinned exactly
against a pure-Python reference (synthetic corpus AND the real
documents table), holdout accuracy on a separable corpus, zero-token
documents, the margin gate, and the broadcast/no-Python plan shape.

The reference shares ONE primitive with the system under test — the
xxhash64 bucket mapping, evaluated in a single batched Spark job over
the distinct feature strings — and reimplements everything else
(tokenization, bigrams, counts, priors, smoothing, scoring, argmax)
in pure Python."""

from __future__ import annotations

import math
import random
import re

import pytest
from pyspark.sql import functions as F

from streamsum_spark.operators import classifier as C

GOOD_WORDS = ["clear", "prose", "sentence", "paragraph", "reads", "well", "argument"]
SPAM_WORDS = ["buy", "click", "free", "winner", "casino", "pills", "offer"]
SHARED = ["the", "a", "of", "and", "to", "in", "it"]


def synth_corpus(n: int, seed: int):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        label = "good" if i % 2 == 0 else "spam"
        vocab = (GOOD_WORDS if label == "good" else SPAM_WORDS) + SHARED
        words = [vocab[rng.randrange(len(vocab))] for _ in range(rng.randrange(8, 40))]
        rows.append((i, label, " ".join(words)))
    return rows


def py_features(text: str, bigrams: bool = True) -> list[str]:
    toks = [t for t in re.split(r"\s+", text.strip().lower()) if t]
    feats = list(toks)
    if bigrams:
        feats += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return feats


def bucket_map(spark, rows, n_buckets: int) -> dict[str, int]:
    """feature string -> bucket for every feature in ``rows``, via ONE
    batched Spark job (the hash is the shared primitive)."""
    feats = sorted({f for _, _, text in rows for f in py_features(text)})
    if not feats:
        return {}
    df = spark.createDataFrame([(f,) for f in feats], "feat string")
    return {
        r.feat: r.b
        for r in df.select(
            "feat", F.pmod(F.xxhash64("feat"), F.lit(n_buckets)).alias("b")
        ).collect()
    }


@pytest.fixture(scope="module")
def corpus(spark):
    rows = synth_corpus(240, seed=7)
    train, test = rows[:160], rows[160:]
    to_df = lambda rs: spark.createDataFrame(rs, "doc_id long, label string, text string")
    return to_df(train), to_df(test), train, test


@pytest.fixture(scope="module")
def model(corpus):
    train_df, _, _, _ = corpus
    return C.train_nb(train_df, n_buckets=1 << 12)


def test_feature_pipeline_matches_python_tokenizer(spark):
    rows = [(0, "x", "The  quick brown\tfox"), (1, "x", "  "), (2, "x", "one")]
    df = spark.createDataFrame(rows, "doc_id long, label string, text string")
    got = C.hashed_token_features(df, n_buckets=1 << 12).collect()
    by_doc: dict[int, list] = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r.bucket)
    # zero-token doc keeps one null-bucket row
    assert by_doc[1] == [None]
    bm = bucket_map(df.sparkSession, rows, 1 << 12)
    for doc_id, _, text in rows:
        if doc_id == 1:
            continue
        expect = sorted(bm[f] for f in py_features(text))
        assert sorted(by_doc[doc_id]) == expect


def _py_model(train_rows, bm, n_buckets, alpha=1.0):
    counts: dict[str, dict[int, int]] = {}
    n_docs: dict[str, int] = {}
    for _, label, text in train_rows:
        n_docs[label] = n_docs.get(label, 0) + 1
        for f in py_features(text):
            b = bm[f]
            counts.setdefault(label, {})[b] = counts.get(label, {}).get(b, 0) + 1
    total_docs = sum(n_docs.values())
    return {
        "labels": sorted(n_docs),
        "log_prior": {l: math.log(n_docs[l] / total_docs) for l in n_docs},
        "total": {l: sum(counts[l].values()) for l in counts},
        "counts": counts,
        "alpha": alpha,
        "B": n_buckets,
    }


def _py_scores(pym, bm, text):
    buckets = [bm[f] for f in py_features(text)]
    out = {}
    for l in pym["labels"]:
        ll = sum(
            math.log(pym["counts"][l].get(b, 0) + pym["alpha"]) for b in buckets
        )
        norm = math.log(pym["total"][l] + pym["alpha"] * pym["B"])
        out[l] = pym["log_prior"][l] + ll - len(buckets) * norm
    return out


def test_nb_math_pinned_to_python_reference(spark, corpus, model):
    _, test_df, train_rows, test_rows = corpus
    bm = bucket_map(spark, train_rows + test_rows, 1 << 12)
    pym = _py_model(train_rows, bm, 1 << 12)
    assert model.labels == pym["labels"]
    assert model.total == pym["total"]
    for l in model.labels:
        assert model.log_prior[l] == pytest.approx(pym["log_prior"][l], abs=1e-12)
    got = {r.doc_id: r for r in C.nb_scores(test_df, model).collect()}
    assert len(got) == len(test_rows)
    for doc_id, _, text in test_rows:
        expect = _py_scores(pym, bm, text)
        row = got[doc_id]
        for l in model.labels:
            assert row[f"score_{l}"] == pytest.approx(expect[l], abs=1e-9)
        ranked = sorted(expect.items(), key=lambda kv: (kv[1], kv[0]))
        if ranked[-1][1] - ranked[-2][1] > 1e-6:
            assert row.predicted == ranked[-1][0]


def test_nb_holdout_accuracy(corpus, model):
    _, test_df, _, test_rows = corpus
    pred = {r.doc_id: r.predicted for r in C.nb_scores(test_df, model).collect()}
    acc = sum(pred[i] == label for i, label, _ in test_rows) / len(test_rows)
    assert acc >= 0.95, acc


def test_zero_token_doc_scores_on_priors(spark, model):
    df = spark.createDataFrame([(99, "   ")], "doc_id long, text string")
    (row,) = C.nb_scores(df, model).collect()
    assert row.n_feats == 0
    for l in model.labels:
        assert row[f"score_{l}"] == pytest.approx(model.log_prior[l], abs=1e-12)
    best = max((model.log_prior[l], l) for l in model.labels)
    assert row.predicted == best[1]


def test_quality_filter_margin_gate(corpus, model):
    _, test_df, _, _ = corpus
    scored = {r.doc_id: r for r in C.nb_scores(test_df, model).collect()}
    kept0 = {r.doc_id for r in C.quality_filter_nb(test_df, model, "good").collect()}
    assert kept0 == {i for i, r in scored.items() if r.predicted == "good"}
    margins = sorted(
        r["score_good"] - r["score_spam"] for r in scored.values() if r.doc_id in kept0
    )
    cut = margins[len(margins) // 2]  # median kept margin: must prune ~half
    kept_hi = {
        r.doc_id
        for r in C.quality_filter_nb(test_df, model, "good", min_margin=cut).collect()
    }
    assert kept_hi <= kept0 and 0 < len(kept_hi) < len(kept0)
    assert kept_hi == {
        i
        for i, r in scored.items()
        if i in kept0 and r["score_good"] - r["score_spam"] >= cut
    }


def test_real_documents_math_pin(spark):
    from streamsum_spark.tables import table

    docs = table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", F.col("lang").alias("label"), "text"
    )
    train = docs.where(F.col("doc_id") % 2 == 0)
    test = docs.where(F.col("doc_id") % 2 == 1).limit(12)
    m = C.train_nb(train, n_buckets=1 << 12)
    train_rows = [(r.doc_id, r.label, r.text) for r in train.collect()]
    test_rows = [(r.doc_id, r.label, r.text) for r in test.collect()]
    bm = bucket_map(spark, train_rows + test_rows, 1 << 12)
    pym = _py_model(train_rows, bm, 1 << 12)
    assert m.total == pym["total"]
    got = {r.doc_id: r for r in C.nb_scores(test, m).collect()}
    for doc_id, _, text in test_rows:
        expect = _py_scores(pym, bm, text)
        for l in m.labels:
            assert got[doc_id][f"score_{l}"] == pytest.approx(expect[l], abs=1e-9)


def test_scores_plan_broadcasts_and_stays_jvm(corpus, model):
    _, test_df, _, _ = corpus
    plan = (
        C.nb_scores(test_df, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan
    assert "BroadcastNestedLoopJoin" not in plan  # equi-join on bucket


def test_stream_train_nb_equals_batch(spark, tmp_path):
    """The streaming trainer over a 3-slice split produces the SAME
    model as batch training on the whole corpus: priors, totals,
    pivoted counts, and probe scores — additive sufficient statistics
    make the result slicing-invariant."""
    from streamsum_spark.streaming.pipeline import stream_train_nb

    rows = [
        (i, text, label, "src", len(text))
        for i, label, text in synth_corpus(90, seed=5)
    ]
    full = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    src = tmp_path / "nbdocs"
    src.mkdir()
    import glob as g
    import shutil

    for i in range(3):
        part = full.where(F.col("doc_id") % 3 == i)
        tmp = str(src / f"_s{i}")
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        shutil.copy(
            g.glob(f"{tmp}/part-*.parquet")[0], str(src / f"nbdocs_{i}.parquet")
        )
        shutil.rmtree(tmp)

    streamed = stream_train_nb(
        spark, str(src), glob="nbdocs_*.parquet",
        max_files_per_trigger=1, n_buckets=1 << 12,
    )
    batch = C.train_nb(
        full.select("doc_id", F.col("lang").alias("label"), "text"),
        n_buckets=1 << 12,
    )
    assert streamed.labels == batch.labels
    assert streamed.total == batch.total
    assert streamed.log_prior == batch.log_prior
    sc = sorted(map(tuple, streamed.counts.collect()))
    bc = sorted(map(tuple, batch.counts.collect()))
    assert sc == bc
    probe = full.limit(10).select("doc_id", "text")
    got_s = {r.doc_id: r for r in C.nb_scores(probe, streamed).collect()}
    got_b = {r.doc_id: r for r in C.nb_scores(probe, batch).collect()}
    for d in got_b:
        assert got_s[d].predicted == got_b[d].predicted
        for l in batch.labels:
            assert got_s[d][f"score_{l}"] == pytest.approx(
                got_b[d][f"score_{l}"], abs=1e-9
            )


def test_blank_only_label_trains_on_smoothing(spark):
    """A label whose every document is blank has zero feature rows —
    the model must train (pure-smoothing likelihood), not crash on a
    null feature total."""
    rows = [(0, "good", "solid prose here"), (1, "empty", "   "), (2, "empty", "")]
    df = spark.createDataFrame(rows, "doc_id long, label string, text string")
    m = C.train_nb(df, n_buckets=1 << 8)
    assert m.total["empty"] == 0
    assert m.log_prior["empty"] == pytest.approx(math.log(2 / 3), abs=1e-12)
    (row,) = C.nb_scores(
        spark.createDataFrame([(9, "anything at all")], "doc_id long, text string"), m
    ).collect()
    # finite scores for both labels; 'empty' scores on uniform smoothing
    assert all(math.isfinite(row[f"score_{l}"]) for l in m.labels)


def test_label_with_dot_is_rejected(spark):
    df = spark.createDataFrame(
        [(0, "en.US", "text one"), (1, "de", "text two")],
        "doc_id long, label string, text string",
    )
    with pytest.raises(ValueError, match="labels must not contain"):
        C.train_nb(df, n_buckets=1 << 8)
