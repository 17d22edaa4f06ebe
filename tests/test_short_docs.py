"""Short-document edge cases for the shingle/gram/winnow expressions.

Spark's sequence(1, stop) generates a DESCENDING list when stop < 1 (step
defaults to -1), so the unguarded position lists would call slice(arr, 0, n)
and throw 'SQL array indices start at 1' at runtime, while the DuckDB
oracles' range() comprehensions yield empty lists.  These fixtures pin the
guarded behavior: docs shorter than the shingle/gram width produce zero
shingles/fingerprints in BOTH engines (the synthetic corpus has no short
docs, so only a fixture can exercise this).
"""

from __future__ import annotations

import os

import pytest

from streamsum_spark.functions.expressions import shingles_expr
from streamsum_spark.operators import dedup as dd
from tests.conftest import assert_matches_oracle

SHORT_TEXTS = [
    (0, ""),                      # empty
    (1, "a"),                     # 1 token, 1 char (< winnow gram width 8)
    (2, "one two"),               # 2 tokens (< 3-word shingle)
    (3, "one two three"),         # exactly the shingle width -> 1 shingle
    (4, "aaaabbbb"),              # exactly WINNOW_K chars -> 1 gram (< window W)
    (5, "alpha beta gamma delta epsilon zeta eta theta"),  # normal doc
    (6, "alpha beta gamma delta epsilon zeta eta theta"),  # its exact dup
]


@pytest.fixture(scope="module")
def short_sf_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("short_docs")
    tbl = pa.table(
        {
            "doc_id": pa.array([i for i, _ in SHORT_TEXTS], pa.int64()),
            "text": pa.array([t for _, t in SHORT_TEXTS], pa.string()),
            "lang": pa.array(["en"] * len(SHORT_TEXTS), pa.string()),
            "source": pa.array(["fixture"] * len(SHORT_TEXTS), pa.string()),
            "n_chars": pa.array([len(t) for _, t in SHORT_TEXTS], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(str(d), "documents.parquet"))
    return str(d)


def test_shingles_empty_for_short_docs(spark):
    df = spark.createDataFrame([(t,) for _, t in SHORT_TEXTS], "text string")
    out = df.select(F_expr(shingles_expr(3)).alias("sh")).collect()
    sizes = [len(r.sh) for r in out]
    # 0,1,2-token docs -> no shingles; 3 tokens -> exactly 1
    assert sizes[:4] == [0, 0, 0, 1]
    assert sizes[5] > 0


def F_expr(e):
    from pyspark.sql import functions as F

    return F.expr(e)


def test_minhash_signatures_short_docs_match_oracle(spark, short_sf_dir):
    assert_matches_oracle(spark, dd.minhash_signatures, dd.MINHASH_SIG_SQL, short_sf_dir)


def test_lsh_pairs_short_docs_match_oracle(spark, short_sf_dir):
    assert_matches_oracle(spark, dd.lsh_candidate_pairs, dd.LSH_PAIRS_SQL, short_sf_dir)
    # the exact-dup pair must be found
    pairs = dd.lsh_candidate_pairs(spark, short_sf_dir).collect()
    assert any(r.doc_a == 5 and r.doc_b == 6 for r in pairs)


def test_winnow_short_docs_no_crash_and_empty(spark, short_sf_dir):
    rows = dd.winnow_fingerprints(spark, short_sf_dir).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.fp)
    # docs 0-4 are all shorter than K+W-1 chars of gram coverage -> no fps
    for short_id in (0, 1, 4):
        assert short_id not in by_doc
    assert by_doc[5] == by_doc[6]  # identical text -> identical fingerprints


def test_ngram_jaccard_short_docs_match_oracle(spark, short_sf_dir):
    assert_matches_oracle(spark, dd.ngram_jaccard_dupes, dd.NGRAM_JACCARD_SQL, short_sf_dir)
