"""Every operator whose declared twin was merged into one of the 50
registry entries keeps its STANDALONE implementation — and this suite keeps
each one pinned against its original DuckDB value-hash oracle, so the
consolidation (SURVEY.md §2.D "pytest-pinned surface") loses no checking
strength, only driver slots.
"""

from __future__ import annotations

import pytest

from streamsum_spark.operators import dedup as dd
from streamsum_spark.operators import relational as rel
from streamsum_spark.operators import similarity as sim
from streamsum_spark.operators import sketches as sk
from streamsum_spark.operators import text as tx
from tests.conftest import SF_ORACLE, assert_matches_oracle

from streamsum_spark.operators import sampling as sp

DEMOTED = {
    "heavy_hitters_exact": (sk.heavy_hitters_exact, sk.HEAVY_HITTERS_SQL),
    "log_histogram_sketch": (sk.log_histogram_sketch, sk.LOG_HISTOGRAM_SQL),
    "bloom_filter_relation": (sk.bloom_build, sk.BLOOM_BUILD_SQL),
    "split_token_windows": (sp.split_token_windows, sp.SPLIT_TOKEN_WINDOWS_SQL),
    "temperature_mix_sample": (sp.temperature_mix_sample, sp.TEMPERATURE_MIX_SQL),
    "stratified_sample": (sp.stratified_sample, sp.STRATIFIED_SAMPLE_SQL),
    "reservoir_per_key": (sp.reservoir_per_key, sp.RESERVOIR_PER_KEY_SQL),
    "simhash_near_dupes": (dd.simhash_near_dupes, dd.SIMHASH_NEAR_DUPES_SQL),
    "simhash_wide_signatures": (dd.simhash_wide_signatures, dd.SIMHASH_WIDE_SQL),
    "simhash_wide_near_dupes": (dd.simhash_wide_near_dupes, dd.SIMHASH_WIDE_NEAR_DUPES_SQL),
    "text_repetition_signals": (tx.text_repetition_signals, tx.TEXT_REPETITION_SQL),
    "gopher_quality_flags": (tx.gopher_quality_flags, tx.GOPHER_QUALITY_SQL),
    "tfidf_top_terms": (tx.tfidf_top_terms, tx.TFIDF_TOP_TERMS_SQL),
    "redact_pii": (tx.redact_pii, tx.REDACT_PII_SQL),
    "bigram_perplexity": (tx.bigram_perplexity, tx.BIGRAM_PERPLEXITY_SQL),
    "kn_bigram_perplexity": (tx.kn_bigram_perplexity, tx.KN_PERPLEXITY_SQL),
    "winnow_shared_fingerprints": (dd.winnow_shared_fingerprints, dd.WINNOW_SHARED_SQL),
    "decontaminate": (dd.decontaminate, dd.decontaminate_oracle_sql()),
    "profile_events": (rel.profile_events, rel.PROFILE_EVENTS_SQL),
    "batch_join_interval": (
        __import__("streamsum_spark.streaming.pipeline", fromlist=["x"]).batch_join_interval,
        """
SELECT p.user_id AS p_user, p.event_id AS p_event, p.ts AS p_ts,
       p.value AS p_value, c.event_id AS c_event, c.ts AS c_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
""",
    ),
    "window_rownum_lastn": (
        rel.window_rownum_lastn,
        """
SELECT user_id, event_id, event_type, ts, rn FROM (
    SELECT user_id, event_id, event_type, ts,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS INTEGER) AS rn
    FROM events
) WHERE rn <= 5
""",
    ),
    "agg_rollup_nation_region": (
        rel.agg_rollup_nation_region,
        """
SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_cust,
       round(sum(c_acctbal), 2) AS sum_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
    ),
    "agg_cube_region_segment": (
        rel.agg_cube_region_segment,
        """
SELECT r_name, c_mktsegment, CAST(count(*) AS BIGINT) AS n_cust,
       round(sum(c_acctbal), 2) AS sum_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY CUBE (r_name, c_mktsegment)
""",
    ),
    "agg_grouping_sets": (
        rel.agg_grouping_sets,
        """
SELECT event_type, date_trunc('day', ts) AS day,
       CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS sum_value
FROM events
GROUP BY GROUPING SETS ((event_type, date_trunc('day', ts)), (event_type), ())
""",
    ),
    "set_union_except": (
        rel.set_union_except,
        """
SELECT user_id FROM events WHERE event_type = 'click'
UNION
SELECT user_id FROM events WHERE event_type = 'view'
EXCEPT
SELECT user_id FROM events
WHERE event_type = 'error' AND ts < TIMESTAMP '2024-01-03 00:00:00'
""",
    ),
    "set_intersect": (
        rel.set_intersect,
        """
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
""",
    ),
    "batch_tumbling_counts": (
        rel.batch_tumbling_counts,
        """
SELECT date_trunc('hour', ts) AS bucket, event_type,
       CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2
""",
    ),
    "window_sliding_counts": (rel.window_sliding_counts, rel.WINDOW_SLIDING_SQL),
    "scalar_null_safe": (
        rel.scalar_null_safe,
        """
SELECT event_id,
       nullif(event_type, 'error') AS masked_type,
       nullif(event_type, 'error') IS NOT DISTINCT FROM NULL AS is_error,
       nullif(event_type, 'error') IS NOT DISTINCT FROM 'click' AS is_click,
       coalesce(nullif(event_type, 'error'), '(err)') AS type_or_default
FROM events
""",
    ),
    "text_token_counts": (tx.text_token_counts, tx.TEXT_TOKEN_COUNTS_SQL),
    "text_quality_score": (tx.text_quality_score, tx.TEXT_QUALITY_SQL),
    "text_langid": (tx.text_langid, tx.TEXT_LANGID_SQL),
    "doc_fingerprint": (tx.doc_fingerprint, tx.DOC_FINGERPRINT_SQL),
    "term_frequencies": (tx.term_frequencies, tx.TERM_FREQ_SQL),
    "simhash_signatures": (dd.simhash_signatures, dd.SIMHASH_SQL),
    "winnow_fingerprints": (dd.winnow_fingerprints, dd.WINNOW_SQL),
    "ngram_jaccard_dupes": (dd.ngram_jaccard_dupes, dd.NGRAM_JACCARD_SQL),
    "dedup_paragraphs": (dd.dedup_paragraphs, dd.DEDUP_PARAGRAPHS_SQL),
    "similarity_topk": (sim.similarity_topk, sim.SIMILARITY_TOPK_SQL),
    "embedding_centroids": (sim.embedding_centroids, sim.EMBEDDING_CENTROIDS_SQL),
}


@pytest.mark.parametrize("name", sorted(DEMOTED))
def test_demoted_query_still_matches_oracle(spark, name):
    fn, sql = DEMOTED[name]
    assert_matches_oracle(spark, fn, sql)


def test_ann_lsh_topk_smoke(spark):
    """Bucketed ANN (rows-only by nature): returns <=k rows from the
    probe's bucket, cosine-descending."""
    rows = sim.ann_lsh_topk(spark, SF_ORACLE).collect()
    assert 0 < len(rows) <= 10
    assert all(rows[i].cos >= rows[i + 1].cos for i in range(len(rows) - 1))


def test_approx_distinct_within_tolerance(spark):
    """HLL++ sketch (the one-pass 100 TB distinct path) stays within 5% of
    the exact per-group distinct counts."""
    exact = {
        r.event_type: r.n_users
        for r in rel.agg_distinct_users(spark, SF_ORACLE).collect()
    }
    approx = {
        r.event_type: r.approx_users
        for r in rel.agg_approx_distinct(spark, SF_ORACLE).collect()
    }
    assert set(exact) == set(approx)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(1, 0.05 * n), (k, n, approx[k])


def test_profile_events_approx_within_tolerance(spark):
    """The approx profiling variant (the 100 TB substitution the
    docstring names) mirrors agg_approx_distinct's pin: identical rows /
    nulls, every per-column cardinality within 5% of exact, same single
    stack()-relation shape."""
    exact = {r.column: r for r in rel.profile_events(spark, SF_ORACLE).collect()}
    approx = {
        r.column: r
        for r in rel.profile_events(spark, SF_ORACLE, approx=True).collect()
    }
    assert set(exact) == set(approx)
    for c, e in exact.items():
        a = approx[c]
        assert (a.n_rows, a.n_nulls) == (e.n_rows, e.n_nulls), c
        assert abs(a.n_distinct - e.n_distinct) <= max(1, 0.05 * e.n_distinct), (
            c, e.n_distinct, a.n_distinct,
        )
