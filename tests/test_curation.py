"""Curation funnel: cascade invariants on the real corpus, first-rule-
wins attribution, per-rule cross-checks against independently-derived
counts, and survivor consistency."""

import pytest

from streamsum_spark.operators.curation import (
    RULES,
    curate_documents,
    curation_funnel,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def funnel(spark):
    return curation_funnel(spark, SF).orderBy("stage").collect()


def test_cascade_invariants(spark, funnel):
    from streamsum_spark.tables import table

    total = table(spark, SF, "documents").count()
    assert funnel[0].n_in == total
    for a, b in zip(funnel, funnel[1:]):
        assert a.n_out == b.n_in
        assert a.n_in - a.n_dropped == a.n_out
    assert [r.rule for r in funnel] == [r.removeprefix("drop_") for r in RULES]
    assert sum(r.n_dropped for r in funnel) + funnel[-1].n_out == total
    assert all(r.n_dropped >= 0 for r in funnel)


def test_survivors_match_funnel_tail(spark, funnel):
    assert curate_documents(spark, SF).count() == funnel[-1].n_out


def test_stage1_matches_direct_filter(spark, funnel):
    # the first rule has no prior stages: its drop count is the plain
    # complement of the word-count window, independently derived
    from streamsum_spark.operators.text import gopher_quality_flags

    direct = (
        gopher_quality_flags(spark, SF)
        .where("n_words < 50 OR n_words > 100000")
        .count()
    )
    assert funnel[0].n_dropped == direct


def test_first_rule_wins(spark, funnel):
    # total attributed drops == docs failing ANY rule (no double count)
    from streamsum_spark.operators.curation import _rule_flags

    flags = _rule_flags(spark, SF)
    any_fail = flags.where(" OR ".join(RULES)).count()
    assert sum(r.n_dropped for r in funnel) == any_fail
    # and per-rule attributed <= per-rule raw failures
    for r, row in zip(RULES, funnel):
        raw = flags.where(r).count()
        assert row.n_dropped <= raw


def test_funnel_actually_drops_something(funnel):
    # the synthetic corpus exercises the battery: near-dup and exact-dup
    # rules must both fire on it (documents.parquet contains dup pairs)
    by_rule = {r.rule: r.n_dropped for r in funnel}
    assert by_rule["near_dup"] > 0
    assert sum(by_rule.values()) > 0


def test_survivors_pass_every_rule(spark):
    from streamsum_spark.operators.curation import _rule_flags

    flags = _rule_flags(spark, SF)
    kept = curate_documents(spark, SF).select("doc_id")
    bad = flags.join(kept, "doc_id", "left_semi").where(" OR ".join(RULES))
    assert bad.count() == 0
