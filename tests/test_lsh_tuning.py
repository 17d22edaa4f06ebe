"""Threshold-tuned LSH banding (dedup.py): the S-curve formula against
a Monte-Carlo simulation, parameter-selection properties, the r=1
equivalence with the existing banding, band-nesting containment, the
full DuckDB value-hash oracle for near_dup_tuned, and the recall /
precision contract against the exact Jaccard oracle."""

from __future__ import annotations

import random

import pytest

from streamsum_spark.operators import dedup as dd
from tests.conftest import SF_ORACLE, assert_matches_oracle

SF_SMOKE = "/root/testdata/sf0.001"


def test_collision_prob_matches_simulation():
    """1-(1-s^r)^b against direct simulation of per-hash agreement."""
    rng = random.Random(11)
    trials = 20_000
    for s, b, r in [(0.3, 8, 2), (0.7, 4, 4), (0.5, 16, 1)]:
        hits = 0
        for _ in range(trials):
            if any(
                all(rng.random() < s for _ in range(r)) for _ in range(b)
            ):
                hits += 1
        est = hits / trials
        assert est == pytest.approx(dd.lsh_collision_prob(s, b, r), abs=0.015)


def test_choose_lsh_params_properties():
    prev_r = 0
    for t in (0.1, 0.3, 0.5, 0.7, 0.9):
        b, r = dd.choose_lsh_params(t)
        assert 1 <= b * r <= dd.NUM_HASHES
        assert r >= prev_r  # tighter thresholds never want shorter bands
        prev_r = r
        # chosen pair is globally minimal over the searched grid
        err = dd.lsh_error(b, r, t)
        for r2 in range(1, dd.NUM_HASHES + 1):
            for b2 in range(1, dd.NUM_HASHES // r2 + 1):
                assert err <= dd.lsh_error(b2, r2, t) + 1e-12
    assert dd.choose_lsh_params(0.1)[1] == 1  # loose threshold: max recall
    assert dd.choose_lsh_params(0.9)[1] > 1  # tight threshold: longer bands
    with pytest.raises(ValueError):
        dd.choose_lsh_params(0.0)


def test_banded_r1_pairs_equal_legacy_banding(spark):
    """b=16, r=1 banded candidates == the existing r=1 lsh pairs (keys
    differ — md5 of the minhash vs the raw minhash — pairs must not)."""
    sig = dd.minhash_signatures(spark, SF_SMOKE)
    bands = dd.banded_keys(sig, 16, 1)
    from pyspark.sql import functions as F

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
    got = {(r.doc_a, r.doc_b) for r in cand.collect()}
    legacy = {
        (r.doc_a, r.doc_b)
        for r in dd.lsh_candidate_pairs(spark, SF_SMOKE).collect()
    }
    assert got == legacy


def test_band_nesting_containment(spark):
    """(b=8, r=2) candidates are a subset of (b=16, r=1): a full 2-hash
    band match implies both 1-hash band matches."""
    sig = dd.minhash_signatures(spark, SF_SMOKE)
    from pyspark.sql import functions as F

    def pairs(b, r):
        bands = dd.banded_keys(sig, b, r)
        return {
            (row.doc_a, row.doc_b)
            for row in bands.alias("a")
            .join(
                bands.alias("b"),
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.bkey") == F.col("b.bkey"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .distinct()
            .collect()
        }

    p21 = pairs(8, 2)
    p11 = pairs(16, 1)
    assert p21 <= p11
    with pytest.raises(ValueError):
        dd.banded_keys(sig, 9, 2)  # 18 > 16 hashes


@pytest.mark.parametrize("threshold", [0.2, 0.5])
def test_near_dup_tuned_matches_duckdb_oracle(spark, threshold):
    assert_matches_oracle(
        spark,
        lambda s, d: dd.near_dup_tuned(s, d, threshold=threshold),
        dd.near_dup_tuned_oracle_sql(threshold),
    )


def test_near_dup_tuned_recall_and_precision(spark):
    """Against the exact Jaccard oracle at threshold 0.5: precision is
    1.0 by construction (exact verification) and banding recall on the
    oracle corpus stays high."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in dd.ngram_jaccard_dupes(spark, SF_ORACLE, threshold=0.5).collect()
    }
    got = {
        (r.doc_a, r.doc_b)
        for r in dd.near_dup_tuned(spark, SF_ORACLE, threshold=0.5).collect()
    }
    assert got <= exact  # verified: zero false positives
    if exact:
        assert len(got) / len(exact) >= 0.8, (len(got), len(exact))
