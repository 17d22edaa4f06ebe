"""Physical-plan regression guards (SURVEY.md §4 / the 100 TB posture).

Each test pins a scale-critical plan property; if a refactor silently turns
a broadcast join into a shuffle join or un-pushes a filter, these fail
before any benchmark notices.
"""

from __future__ import annotations

from streamsum_spark import plans
from streamsum_spark.entry_queries import QUERIES
from tests.conftest import SF_ORACLE


def test_filter_pushdown_reaches_scan(spark):
    df = QUERIES["filter_predicates"](spark, SF_ORACLE)
    assert plans.has_pushed_filters(df, "event_type", "value")


def test_scan_prunes_columns(spark):
    df = QUERIES["scan_events"](spark, SF_ORACLE)
    cols = plans.read_schema_columns(df)
    assert "props" not in cols and "value" not in cols


def test_extract_prunes_to_used_columns(spark):
    df = QUERIES["extract_events"](spark, SF_ORACLE)
    assert "value" not in plans.read_schema_columns(df)


def test_join_inner_broadcasts_dimension(spark):
    assert plans.has_broadcast_join(QUERIES["join_inner"](spark, SF_ORACLE))


def test_rollup_joins_broadcast(spark):
    assert plans.has_broadcast_join(QUERIES["agg_rollup_nation_region"](spark, SF_ORACLE))


def test_lastn_uses_window_group_limit(spark):
    """The rank<=N filter must push into the sort (per-key state O(N))."""
    assert plans.has_window_group_limit(QUERIES["window_rownum_lastn"](spark, SF_ORACLE))
    assert plans.has_window_group_limit(QUERIES["topk_per_group"](spark, SF_ORACLE))


def test_count_cache_has_partial_aggregation(spark):
    """Map-side combine: the count-cache shuffle carries group partials,
    not raw events."""
    assert plans.has_partial_aggregate(QUERIES["count_cache_inc"](spark, SF_ORACLE))


def test_transform_fanout_is_narrow(spark):
    """The explode fan-out must not introduce a shuffle."""
    plan = plans.explain_str(QUERIES["transform_fanout"](spark, SF_ORACLE))
    assert "Exchange" not in plan


def test_similarity_topk_broadcasts_probe(spark):
    assert plans.has_broadcast_join(QUERIES["similarity_topk"](spark, SF_ORACLE))


def test_salted_count_equals_direct(spark):
    """Skew-salting rewrite is exact: two-phase salted counts equal the
    direct groupBy."""
    from pyspark.sql import functions as F

    from streamsum_spark.tables import table
    from streamsum_spark.util import salted_count

    ev = table(spark, SF_ORACLE, "events")
    direct = {
        (r.event_type, r.cnt)
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .collect()
    }
    salted = {(r.event_type, r.cnt) for r in salted_count(ev, ["event_type"]).collect()}
    assert salted == direct


def test_join_asof_single_shuffle(spark):
    """The as-of join must stay a single user_id shuffle (union + window),
    never a nested-loop or per-row range join."""
    plan = plans.explain_str(QUERIES["join_asof"](spark, SF_ORACLE))
    assert "NestedLoop" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # shuffle + AQE read


def test_udtf_surface_available(spark):
    """Spark's Python UDTF surface (the 1->n row shape of the reference's
    deftransform) — demonstrated here; production fan-out uses the native
    explode plan (test_transform_fanout_is_narrow)."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="cache_key: string, k: string, v: string")
    class FanOut:
        def eval(self, pred: str, subj: str, obj: str):
            if pred == "CREATE_CHAT":
                yield ("create-thread-user", obj, subj)
                yield ("post-user-thread", subj, obj)
            elif pred == "REPLY_CHAT":
                yield ("post-user-thread", subj, obj)

    rows = FanOut(lit("CREATE_CHAT"), lit("u1"), lit("th1")).collect()
    assert [(r.cache_key, r.k, r.v) for r in rows] == [
        ("create-thread-user", "th1", "u1"),
        ("post-user-thread", "u1", "th1"),
    ]
