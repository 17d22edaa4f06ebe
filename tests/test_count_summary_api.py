"""CountSummaryTable facade: the reference Java API shape over a
materialized cache table, plus DuckDB pins for the single-subject query
paths (the parameterization the declared all-subjects queries don't
exercise)."""

from __future__ import annotations

import os
import tempfile

import duckdb
import pytest

from streamsum_spark import pipeline, sinks
from streamsum_spark.queries import count_summary as cs
from streamsum_spark.queries.count_summary import CountSummaryTable
from tests.conftest import SF_ORACLE, canon_rows
from tests.test_reference_fixtures import F2_DB, _f2_cache


def test_facade_golden_values(spark):
    """query_api_test.clj:24-146 goldens through the facade."""
    api = CountSummaryTable(_f2_cache(spark))
    assert api.getCount("s0", "a0", "o1") == ("o1", 5, 1001)
    assert api.getCount("s0", "a1", "o0") == ("o0", 0, None)
    assert api.actionsForSubj("s0") == ["a0", "a1"]
    assert api.actionsForSubj("nope") == []
    # merge across actions: o1 = 5@1001 (a0) + 2@1005 (a1) -> (7, 1005)
    assert api.countsForSubjAction("s0", "a0", "a1") == [
        ("o0", 1, 1000),
        ("o1", 7, 1005),
    ]
    assert api.sumCounts("s0") == 8
    assert api.sumCounts("s0", "a1") == 2
    assert api.sumCounts("s0", "a1", "unknown-action") == 2  # unknown ignored
    assert api.sumCounts("nope") == 0
    # comparator ordering: s1 by count desc -> o3(10), o5(7), o1(1)
    got = api.tuplesForSubjAction("s1", comparator="count")
    assert [t[2] for t in got] == ["o3", "o5", "o1"]


def test_facade_over_materialized_table(spark):
    """from_parquet: the facade reads the stored bucketed cache table the
    deployment writes — same answers as the in-memory view."""
    base = os.path.join(tempfile.mkdtemp(), "api_cache")
    cache = _f2_cache(spark)
    sinks.write_cache_bucketed(cache, "api_cache_tbl", base, ["subject"], 4)
    api = CountSummaryTable.from_parquet(spark, base)
    assert api.getCount("s1", "a0", "o3") == ("o3", 10, 1010)
    assert api.sumCounts("s1") == 18


@pytest.fixture(scope="module")
def cache_in_duckdb(spark, tmp_path_factory):
    """The real pipeline's count cache at sf0.01, written to parquet and
    registered in DuckDB, so single-subject paths check against SQL over
    the IDENTICAL relation."""
    path = str(tmp_path_factory.mktemp("cache") / "counts")
    cache = pipeline.count_cache_view(spark, SF_ORACLE)
    cache.write.mode("overwrite").parquet(path)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW cache AS SELECT * FROM '{path}/*.parquet'")
    subj = cache.select("subject").orderBy("subject").limit(1).collect()[0].subject
    return spark.read.parquet(path), con, subj


def _assert_df_matches(df, con, sql):
    got_cols, got = canon_rows(df.toPandas())
    exp_cols, exp = canon_rows(con.sql(sql).df())
    assert got_cols == exp_cols
    assert got == exp


def test_single_subject_actions_oracle(spark, cache_in_duckdb):
    cache, con, s = cache_in_duckdb
    _assert_df_matches(
        cs.actions_for_subj(cache, s),
        con,
        f"SELECT DISTINCT subject, action FROM cache WHERE subject = '{s}'",
    )


def test_single_subject_counts_merge_oracle(spark, cache_in_duckdb):
    cache, con, s = cache_in_duckdb
    _assert_df_matches(
        cs.counts_for_subj_action(cache, s, ["click", "buy"]),
        con,
        f"""SELECT subject, obj, CAST(sum(cnt) AS BIGINT) AS cnt,
                   max(latest_ts) AS latest_ts
            FROM cache WHERE subject = '{s}' AND action IN ('click', 'buy')
            GROUP BY subject, obj""",
    )


def test_single_subject_sum_counts_oracle(spark, cache_in_duckdb):
    cache, con, s = cache_in_duckdb
    _assert_df_matches(
        cs.sum_counts(cache, s),
        con,
        f"""SELECT subject, CAST(sum(cnt) AS BIGINT) AS total
            FROM cache WHERE subject = '{s}' GROUP BY subject""",
    )


def test_single_subject_tuples_scan_oracle(spark, cache_in_duckdb):
    cache, con, s = cache_in_duckdb
    _assert_df_matches(
        cs.tuples_for_subj_action(cache, s, ["click"]),
        con,
        f"""SELECT subject, action, obj, cnt, latest_ts
            FROM cache WHERE subject = '{s}' AND action = 'click'""",
    )
