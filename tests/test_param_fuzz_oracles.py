"""Randomized-PARAMETER oracle fuzzing: the declared/demoted oracles pin
one parameterization each; these templates re-derive the DuckDB SQL for
seeded random parameters and hash-compare, so parameter plumbing
(thresholds, k's, rates) is checked across its range, not at one point."""

from __future__ import annotations

import random

import pytest

from streamsum_spark.operators import dedup as dd
from streamsum_spark.operators import sampling as sp
from streamsum_spark.operators import sketches as sk
from tests.conftest import SF_ORACLE, assert_matches_oracle

rng = random.Random(20260813)


HH_SQL = r"""
WITH tok AS (
    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS t FROM documents
), counts AS (
    SELECT t, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY t
), tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM counts)
SELECT t, cnt FROM counts, tot WHERE cnt >= {phi} * total
"""

RESERVOIR_SQL = """
SELECT doc_id, source, rn FROM (
    SELECT doc_id, source,
           CAST(row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ) AS BIGINT) AS rn
    FROM documents
) WHERE rn <= {n}
"""

STRAT_SQL = """
SELECT doc_id, lang, source
FROM documents
WHERE ('0x' || substr(md5('{salt}' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000
      < CASE WHEN lang = 'en' THEN {en} ELSE {other} END
"""

JACCARD_SQL_TMPL = dd.NGRAM_JACCARD_SQL.replace(">= 0.2", ">= {thr}")


@pytest.mark.parametrize("phi", [round(rng.uniform(0.005, 0.035), 4) for _ in range(3)])
def test_heavy_hitters_phi_fuzz(spark, phi):
    assert_matches_oracle(
        spark,
        lambda s, d: sk.heavy_hitters_exact(s, d, phi=phi),
        HH_SQL.format(phi=phi),
    )


@pytest.mark.parametrize("n", [rng.randint(1, 30) for _ in range(3)])
def test_reservoir_n_fuzz(spark, n):
    assert_matches_oracle(
        spark,
        lambda s, d: sp.reservoir_per_key(s, d, n=n),
        RESERVOIR_SQL.format(n=n),
    )


@pytest.mark.parametrize(
    "en,other,salt",
    [(rng.randint(0, 1000), rng.randint(0, 1000), f"fz{i}") for i in range(3)],
)
def test_stratified_rates_fuzz(spark, en, other, salt):
    assert_matches_oracle(
        spark,
        lambda s, d: sp.stratified_sample(
            s, d, rates_permille={"en": en}, default_permille=other, salt=salt
        ),
        STRAT_SQL.format(en=en, other=other, salt=salt),
    )


@pytest.mark.parametrize("thr", [round(rng.uniform(0.1, 0.5), 3) for _ in range(2)])
def test_jaccard_threshold_fuzz(spark, thr):
    assert_matches_oracle(
        spark,
        lambda s, d: dd.ngram_jaccard_dupes(s, d, threshold=thr),
        JACCARD_SQL_TMPL.format(thr=thr),
    )
