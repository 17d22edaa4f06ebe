"""Plan pins for the round-8 de-broadcast of the text operators.

Round 7 removed the forced corpus-cardinality broadcasts from the dedup
composites; round 8 removes the same anti-pattern from tfidf_top_terms
(the document-frequency relation is vocabulary-sized — billions of rows
on web text), bigram_perplexity (distinct-bigram cardinality grows
FASTER than the vocabulary), their streaming twins, and
bloom_might_contain (a production filter can exceed Spark's 8 GiB
broadcast hard limit).

Two properties per site, same recipe as tests/test_dedup_clusters.py:
  1. values are byte-unchanged when broadcast is impossible
     (autoBroadcastJoinThreshold = -1 simulates the 100 TB regime);
  2. under that conf the plan contains NO BroadcastHashJoin on the
     unbounded key — the planner degrades to a shuffle join instead of
     forcing a driver collect.
"""

from __future__ import annotations

import re

import pytest

from streamsum_spark import plans
from streamsum_spark.operators import sketches as sk
from streamsum_spark.operators import text as tx

from tests.conftest import SF_ORACLE, SF_SMOKE, canon_rows

_NO_BROADCAST_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


def _with_confs(spark, confs):
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    return saved


def _restore_confs(spark, saved):
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _broadcast_joins_on(plan: str, *keys: str) -> list[str]:
    """BroadcastHashJoin nodes whose FIRST join key is one of ``keys`` —
    the unbounded-relation joins that must not be hint-forced."""
    pat = re.compile(r"BroadcastHashJoin \[(%s)#" % "|".join(keys))
    return [ln for ln in plan.splitlines() if pat.search(ln.strip())]


def _rows(df):
    return canon_rows(df.toPandas())


def test_tfidf_df_join_degrades_to_shuffle_values_unchanged(spark):
    """The tf×df scoring join has no hint: at threshold -1 it must plan
    as a shuffle join on the token, with values identical to default."""
    base = _rows(tx.tfidf_top_terms(spark, SF_ORACLE))
    saved = _with_confs(spark, _NO_BROADCAST_CONFS)
    try:
        df = tx.tfidf_top_terms(spark, SF_ORACLE)
        plan = plans.explain_str(df)
        forced = _rows(df)
    finally:
        _restore_confs(spark, saved)
    assert not _broadcast_joins_on(plan, "t"), _broadcast_joins_on(plan, "t")
    assert forced == base


def test_bigram_lm_join_degrades_to_shuffle_values_unchanged(spark):
    """The grams×LM scoring join (distinct-bigram cardinality — the
    fastest-growing relation in the text family) has no hint."""
    base = _rows(tx.bigram_perplexity(spark, SF_ORACLE))
    saved = _with_confs(spark, _NO_BROADCAST_CONFS)
    try:
        df = tx.bigram_perplexity(spark, SF_ORACLE)
        plan = plans.explain_str(df)
        forced = _rows(df)
    finally:
        _restore_confs(spark, saved)
    assert not _broadcast_joins_on(plan, "w1", "w2"), plan
    assert forced == base


def test_bloom_membership_join_degrades_to_shuffle_values_unchanged(spark):
    """bloom_might_contain's filter join has no hint (the docstring's
    10-GB-filter promise is now real): at threshold -1 the word join
    plans as a shuffle join and verdicts are unchanged."""
    members = (
        spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
        .selectExpr("md5(text) AS key")
        .where("key IS NOT NULL")
        .limit(200)
    )
    bloom = sk.bloom_build(spark, SF_ORACLE, keys=members)
    base = _rows(sk.bloom_might_contain(spark, bloom, members))
    saved = _with_confs(spark, _NO_BROADCAST_CONFS)
    try:
        df = sk.bloom_might_contain(spark, bloom, members)
        plan = plans.explain_str(df)
        forced = _rows(df)
    finally:
        _restore_confs(spark, saved)
    assert not _broadcast_joins_on(plan, "word"), _broadcast_joins_on(plan, "word")
    assert forced == base
    # sanity: every true member reports might_contain = true (no false
    # negatives survive the plan change); cols sorted = [key, might_contain]
    assert all(r[1] == "True" for r in forced[1])


@pytest.mark.parametrize("twin", ["tfidf", "bigram"])
def test_streaming_text_twins_degrade_to_shuffle(spark, twin):
    """The streaming twins' read-time scoring joins carry no hint
    either — same plan property over the accumulated state table."""
    from streamsum_spark.streaming import pipeline as sp

    saved = _with_confs(spark, _NO_BROADCAST_CONFS)
    try:
        if twin == "tfidf":
            df = sp.stream_tfidf_top_terms(spark, SF_SMOKE)
            keys = ("t",)
        else:
            df = sp.stream_bigram_perplexity(spark, SF_SMOKE)
            keys = ("w1", "w2")
        plan = plans.explain_str(df)
        assert df.count() > 0
    finally:
        _restore_confs(spark, saved)
    assert not _broadcast_joins_on(plan, *keys), _broadcast_joins_on(plan, *keys)
