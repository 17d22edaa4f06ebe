"""Pins for exact-substring dedup: value-level parity with a DuckDB
oracle on the real corpus (the demoted-oracle posture), remove-all-
but-one semantics on a crafted corpus with a known repeated passage,
and the positional strip filter."""

from __future__ import annotations

import duckdb
import pytest

from streamsum_spark.operators.dedup import (
    SPAN_N,
    duplicate_ngram_spans,
    duplicate_ngram_spans_sql,
    strip_duplicate_spans,
)

SF_DIR = "/root/testdata/sf0.001"


def test_spans_match_duckdb_oracle(spark):
    got = sorted(
        (r.doc_id, r.start, r.gram_md5)
        for r in duplicate_ngram_spans(spark, SF_DIR).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = sorted(map(tuple, con.sql(duplicate_ngram_spans_sql()).fetchall()))
    assert got == want and len(got) > 100  # non-vacuous on the corpus


def test_remove_all_but_one_on_crafted_corpus(spark):
    base = " ".join(f"w{i}" for i in range(SPAN_N))  # one exact window
    rows = [
        (1, f"{base} tail1 tail2"),      # first occurrence: survives
        (2, f"lead1 {base} tail3"),      # repeated: flagged at start 2
        (3, "totally different text " + " ".join(f"u{i}" for i in range(20))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    spans = duplicate_ngram_spans(spark, SF_DIR, docs=docs).collect()
    assert [(r.doc_id, r.start) for r in spans] == [(2, 2)]


def test_strip_counts_and_text(spark):
    out = {r.doc_id: r for r in strip_duplicate_spans(spark, SF_DIR).collect()}
    spans = duplicate_ngram_spans(spark, SF_DIR).collect()
    flagged_docs = {r.doc_id for r in spans}
    assert flagged_docs and flagged_docs <= set(out)
    import pandas as pd

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")[["doc_id", "text"]]
    starts_by_doc: dict[int, list[int]] = {}
    for r in spans:
        starts_by_doc.setdefault(r.doc_id, []).append(r.start)
    for _, row in docs.iterrows():
        toks = row.text.strip().split()
        r = out[row.doc_id]
        assert r.n_tokens == len(toks)
        starts = starts_by_doc.get(row.doc_id, [])
        keep = [
            t
            for i, t in enumerate(toks)
            if not any(s <= i + 1 < s + SPAN_N for s in starts)
        ]
        assert r.n_kept == len(keep)
        assert r.text_clean == " ".join(keep)
    # untouched docs keep their full token stream
    clean = set(out) - flagged_docs
    assert clean and all(out[d].n_kept == out[d].n_tokens for d in clean)
