"""Property pins for the deterministic sampling operators: the keep
decisions must be reproducible (hash-based, not rand), per-stratum rates
must land near their targets, and the reservoir cap must be exact and
uniform-ish.  Value-hash oracles live in tests/test_demoted_oracles.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamsum_spark.operators import sampling as sp
from streamsum_spark.tables import table
from tests.conftest import SF_ORACLE


def test_stratified_sample_deterministic_and_rate(spark):
    a = {r.doc_id for r in sp.stratified_sample(spark, SF_ORACLE).collect()}
    b = {r.doc_id for r in sp.stratified_sample(spark, SF_ORACLE).collect()}
    assert a == b  # rerun-stable (no rand anywhere)
    docs = table(spark, SF_ORACLE, "documents")
    per_lang = {
        r.lang: r.n
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    kept = {
        r.lang: r.n
        for r in sp.stratified_sample(spark, SF_ORACLE)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # binomial tolerance: 4 sigma on each stratum
    for lang, n in per_lang.items():
        p = 0.3 if lang == "en" else 0.9
        mean, sd = n * p, (n * p * (1 - p)) ** 0.5
        assert abs(kept.get(lang, 0) - mean) <= 4 * sd + 1, (lang, kept.get(lang), mean)


def test_stratified_sample_salt_gives_independent_draw(spark):
    a = {r.doc_id for r in sp.stratified_sample(spark, SF_ORACLE).collect()}
    b = {r.doc_id for r in sp.stratified_sample(spark, SF_ORACLE, salt="strat2").collect()}
    assert a != b  # different stage, different membership
    # but both hit the same per-stratum rates, so sizes are close
    assert abs(len(a) - len(b)) < 0.2 * max(len(a), len(b))


def test_reservoir_cap_exact_and_stable(spark):
    out = sp.reservoir_per_key(spark, SF_ORACLE, n=20)
    per_key = (
        out.groupBy("source").agg(F.count(F.lit(1)).alias("n"), F.max("rn").alias("mx")).collect()
    )
    docs = table(spark, SF_ORACLE, "documents")
    totals = {r.source: r.n for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    for r in per_key:
        assert r.n == min(20, totals[r.source])
        assert r.mx == r.n
    again = {(r.doc_id, r.rn) for r in sp.reservoir_per_key(spark, SF_ORACLE, n=20).collect()}
    assert again == {(r.doc_id, r.rn) for r in out.collect()}


def test_reservoir_uses_window_group_limit(spark):
    """The per-key cap must prune through the sort (WindowGroupLimit),
    not rank every row and filter after."""
    from streamsum_spark.plans import inspect as plans

    plan = plans.explain_str(sp.reservoir_per_key(spark, SF_ORACLE, n=20))
    assert "WindowGroupLimit" in plan


def test_split_token_windows_skips_empty_docs(spark):
    """split(trim(''), '\\s+') yields [''] (size 1), so an unfiltered
    tokenizer would emit a bogus (n_tokens=1, chunk_text='') window for
    empty/whitespace-only/null documents — and DuckDB's
    regexp_split_to_array shares the quirk, so only a direct pin can
    catch it.  Empty docs must produce NO windows; real docs are
    unaffected."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, ""),
            (3, "   \t  "),
            (4, None),
            (5, "solo"),
        ],
        "doc_id long, text string",
    )
    out = sp.split_token_windows(spark, SF_ORACLE, window=3, stride=2, docs=docs)
    rows = out.collect()
    assert {r.doc_id for r in rows} == {1, 5}
    assert all(r.n_tokens >= 1 and r.chunk_text != "" for r in rows)
    got1 = sorted(
        (r.win_id, r.n_tokens, r.chunk_text) for r in rows if r.doc_id == 1
    )
    assert got1 == [(0, 3, "alpha beta gamma"), (1, 2, "gamma delta")]


def test_temperature_mix_plan_broadcasts_rates(spark):
    """The per-language rate relation must reach the corpus scan as a
    BroadcastHashJoin — a shuffle join of a 5-row relation against the
    corpus would be the 100 TB mistake."""
    from streamsum_spark.operators.sampling import temperature_mix_sample
    from streamsum_spark.plans import explain_str
    from tests.conftest import SF_SMOKE

    plan = explain_str(temperature_mix_sample(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_temperature_mix_oracle_tracks_alpha(spark):
    """The oracle SQL is a template on alpha (round-7): a NON-default
    alpha must still hash-match DuckDB — previously the SQL hardcoded
    exponent 0.7 and silently desynced for any other alpha."""
    import functools

    from tests.conftest import assert_matches_oracle

    for alpha in (0.0, 0.5):
        assert_matches_oracle(
            spark,
            functools.partial(sp.temperature_mix_sample, alpha=alpha),
            sp.temperature_mix_sql(alpha),
        )
