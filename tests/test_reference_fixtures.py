"""Golden-fixture parity with the reference test suite (FIXTURES.md).

F1: the 9-event mixed stream of system_test.clj:23-31 through a config
    mirroring example/streamsum/config.clj:7-21 — exact transform output,
    cache cardinalities.
F2: the 6-leaf count structure of update_test.clj:8-24 — every
    CountSummary/Queries golden answer from query_api_test.clj:64-146.
F3: per-cache unit fixtures of caches_test.clj:91-131 — assoc
    replace/tombstone, lastn evict/undo-removes-all/undo-missing-noop,
    keycount undo clamp.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streamsum_spark.config import CacheSpec, PipelineConfig, TransformPattern, TupleTemplate
from streamsum_spark.operators.caches import (
    assoc_with_undo,
    count_cache,
    count_cache_inc_dec,
    keycount_with_undo,
    lastn_per_key,
    lastn_with_undo,
)
from streamsum_spark.operators.transform import transform_fanout
from streamsum_spark.queries import count_summary as cs

# config.clj:7-21, verbatim structure
REFERENCE_CONFIG = PipelineConfig(
    patterns=(
        TransformPattern(
            "CREATE_CHAT",
            (
                TupleTemplate("create-thread-user", "obj", "subj"),
                TupleTemplate("post-user-thread", "subj", "obj"),
            ),
        ),
        TransformPattern("REPLY_CHAT", (TupleTemplate("post-user-thread", "subj", "obj"),)),
        TransformPattern(
            "CREATE_DOC",
            (
                TupleTemplate("upload-doc-user", "obj", "subj"),
                TupleTemplate("upload-user-doc", "subj", "obj"),
            ),
        ),
        TransformPattern("ANNOTATE_DOC", (TupleTemplate("annotate-user-doc", "subj", "obj"),)),
        TransformPattern(
            "STAR_MESSAGE",
            (TupleTemplate("interactions-user-user", "subj", "obj", action="star-user"),),
        ),
    ),
    caches=(
        CacheSpec("create-thread-user", "assoc"),
        CacheSpec("post-user-thread", "lastn"),
        CacheSpec("upload-doc-user", "assoc"),
        CacheSpec("upload-user-doc", "lastn"),
        CacheSpec("annotate-user-doc", "lastn"),
        CacheSpec("interactions-user-user", "count"),
        CacheSpec("subject-counts", "keycount"),
    ),
)

# system_test.clj:23-31 — extractable events only (the junk scalar 0 and the
# malformed 1-tuple are dropped by Extract/error isolation before transform,
# covered in test_error_isolation.py)
F1_EVENTS = [
    ("CREATE_CHAT", "u1", "th1", 1, 1),
    ("CREATE_CHAT", "u2", "th2", 2, 2),
    ("REPLY_CHAT", "u2", "th1", 3, 3),
    ("CREATE_DOC", "u3", "d1", 3, 4),
    ("STAR_MESSAGE", "u2", "u1", 4, 5),
    ("UNKNOWN", "1", "2", 3, 6),  # no pattern match -> zero output tuples
    ("ANNOTATE_DOC", "u2", "d1", 5, 9),
]

F1_GOLDEN_TUPLES = {  # system_test.clj:37-45; count value flattened per SURVEY §1.1
    ("create-thread-user", "th1", None, "u1", 1),
    ("post-user-thread", "u1", None, "th1", 1),
    ("create-thread-user", "th2", None, "u2", 2),
    ("post-user-thread", "u2", None, "th2", 2),
    ("post-user-thread", "u2", None, "th1", 3),
    ("upload-doc-user", "d1", None, "u3", 3),
    ("upload-user-doc", "u3", None, "d1", 3),
    ("interactions-user-user", "u2", "star-user", "u1", 4),
    ("annotate-user-doc", "u2", None, "d1", 5),
}


def _tuples_df(spark, rows):
    return spark.createDataFrame(rows, "pred string, subj string, obj string, ts long, seq long")


def test_f1_transform_golden(spark):
    out = transform_fanout(_tuples_df(spark, F1_EVENTS), REFERENCE_CONFIG)
    got = {(r.cache_key, r.k, r.action, r.v, r.ts) for r in out.collect()}
    assert got == F1_GOLDEN_TUPLES


def test_f1_cache_cardinalities(spark):
    """system_test.clj:47-59: keys per cache after ingest."""
    fanned = transform_fanout(_tuples_df(spark, F1_EVENTS), REFERENCE_CONFIG)
    expected = {
        "create-thread-user": 2,
        "post-user-thread": 2,
        "upload-doc-user": 1,
        "upload-user-doc": 1,
        "annotate-user-doc": 1,
        "interactions-user-user": 1,
    }
    for name, n_keys in expected.items():
        routed = fanned.where(F.col("cache_key") == name)
        assert routed.select("k").distinct().count() == n_keys, name
    # metrics counts (system_test.clj:61-69): records per cache
    metrics = {
        r.cache_key: r.n
        for r in fanned.groupBy("cache_key").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert metrics == {
        "create-thread-user": 2,
        "post-user-thread": 3,
        "upload-doc-user": 1,
        "upload-user-doc": 1,
        "annotate-user-doc": 1,
        "interactions-user-user": 1,
    }


# F2: update_test.clj:8-24 flat form
F2_DB = [
    ("s0", "a0", "o0", 1, 1000),
    ("s0", "a0", "o1", 5, 1001),
    ("s0", "a1", "o1", 2, 1005),
    ("s1", "a0", "o1", 1, 1002),
    ("s1", "a0", "o3", 10, 1010),
    ("s1", "a0", "o5", 7, 1008),
]


def _f2_cache(spark):
    return spark.createDataFrame(
        F2_DB, "subject string, action string, obj string, cnt long, latest_ts long"
    )


def test_f2_get_count(spark):
    cache = _f2_cache(spark)
    hit = cs.get_count(cache, "s0", "a0", "o1").collect()[0]
    assert (hit.obj, hit.cnt, hit.latest_ts) == ("o1", 5, 1001)
    miss = cs.get_count(cache, "s0", "a1", "o0").collect()[0]
    assert (miss.obj, miss.cnt, miss.latest_ts) == ("o0", 0, None)


def test_f2_actions_for_subj(spark):
    cache = _f2_cache(spark)
    got = {r.action for r in cs.actions_for_subj(cache, "s0").collect()}
    assert got == {"a0", "a1"}
    assert cs.actions_for_subj(cache, "nope").count() == 0


def test_f2_counts_merge_actions(spark):
    """query_api_test.clj:74-83: (o0,1,1000), (o1,7,1005) — sum counts,
    max timestamps across the action set."""
    cache = _f2_cache(spark)
    got = {
        (r.obj, r.cnt, r.latest_ts)
        for r in cs.counts_for_subj_action(cache, "s0", ["a0", "a1"]).collect()
    }
    assert got == {("o0", 1, 1000), ("o1", 7, 1005)}


def test_f2_sum_counts(spark):
    cache = _f2_cache(spark)
    assert cs.sum_counts(cache, "s0").collect()[0].total == 8
    assert cs.sum_counts(cache, "s0", ["a0"]).collect()[0].total == 6
    # unknown action ignored (query_api_test.clj:86-93)
    assert cs.sum_counts(cache, "s0", ["a0", "zz"]).collect()[0].total == 6
    assert cs.sum_counts(cache, "s0", ["zz"]).count() == 0


def test_f2_tuples_filter_scan(spark):
    cache = _f2_cache(spark)
    assert cs.tuples_for_subj_action(cache).count() == 6
    assert cs.tuples_for_subj_action(cache, "s0").count() == 3
    assert cs.tuples_for_subj_action(cache, actions=["a0", "ax", "ay"]).count() == 5
    assert cs.tuples_for_subj_action(cache, "s0", ["a1"]).count() == 1
    assert cs.tuples_for_subj_action(cache, "zz").count() == 0


def test_f2_comparator_sorts(spark):
    """query_api_test.clj:103-146 — all three comparator families."""
    cache = _f2_cache(spark)
    by_count = [r.cnt for r in cs.tuples_sorted(cache, by="count", asc=True).collect()]
    assert by_count == [1, 1, 2, 5, 7, 10]
    by_time = [r.latest_ts for r in cs.tuples_sorted(cache, by="time", asc=True).collect()]
    assert by_time == [1000, 1001, 1002, 1005, 1008, 1010]
    by_ct_desc = [
        r.latest_ts for r in cs.tuples_sorted(cache, by="count_time", asc=False).collect()
    ]
    assert by_ct_desc == [1010, 1008, 1001, 1005, 1002, 1000]


def test_f2_inc_dec_goldens(spark):
    """update_test.clj:26-127 via the batch fold: inc existing/new, dec
    clamp, dec missing no-op, max-timestamp rule."""
    ops = spark.createDataFrame(
        # key o1: 5 incs then 1 dec -> 4, ts stays at inc max
        [("o1", "inc", t, i) for i, t in enumerate([1001, 999, 998, 997, 996])]
        + [("o1", "dec", 1500, 9)]
        # key oX: dec only -> dropped (never created)
        + [("oX", "dec", 1000, 10)]
        # key o2: inc at t1, t3, t2 -> (3, t3)
        + [("o2", "inc", 1, 11), ("o2", "inc", 3, 12), ("o2", "inc", 2, 13)]
        # key o3: inc, dec, dec (clamp at 0), inc -> 1
        + [("o3", "inc", 1, 14), ("o3", "dec", 2, 15), ("o3", "dec", 3, 16), ("o3", "inc", 4, 17)],
        "subject string, op string, ts long, seq long",
    )
    got = {r.subject: (r.cnt, r.latest_ts) for r in count_cache_inc_dec(ops).collect()}
    assert got == {"o1": (4, 1001), "o2": (3, 3), "o3": (1, 4)}


# F3: caches_test.clj:91-131
def test_f3_assoc_replace_and_tombstone(spark):
    rows = [
        ("123", "update", "1000", 1, 1),
        ("123", "update", "2000", 2, 2),  # replace
        ("77", "update", "5", 1, 3),
        ("77", "undo", "5", 2, 4),  # tombstone: key remains, value nil
    ]
    df = spark.createDataFrame(rows, "k string, op string, v string, ts long, seq long")
    got = {r.k: r.v for r in assoc_with_undo(df).collect()}
    assert got == {"123": "2000", "77": None}


def test_f3_lastn_evict_and_undo(spark):
    """lastn N=4: append 1000..1003 -> evict on 1004,1005 ->
    [1002..1005]; undo(1004) removes all equal; undo(9999) no-op."""
    rows = [("123", "update", str(1000 + i), i, i) for i in range(6)]
    rows += [("123", "undo", "1004", 6, 6), ("123", "undo", "9999", 7, 7)]
    df = spark.createDataFrame(rows, "k string, op string, v string, ts long, seq long")
    got = [r.v for r in lastn_with_undo(df, n=4).orderBy("rn").collect()]
    assert got == ["1005", "1003", "1002"]  # newest first
    # plain lastn (no undo path) keeps the newest 4
    upd = df.where(F.col("op") == "update")
    plain = [r.v for r in lastn_per_key(upd, n=4).orderBy("rn").collect()]
    assert plain == ["1005", "1004", "1003", "1002"]


def test_f3_keycount_undo_clamp(spark):
    rows = [
        ("a", "inc", 1, 1),
        ("a", "inc", 2, 2),
        ("a", "dec", 3, 3),
        ("b", "dec", 1, 4),  # undo-first: clamp at 0 but key appears
        ("b", "inc", 2, 5),
    ]
    df = spark.createDataFrame(rows, "k string, op string, ts long, seq long")
    got = {r.k: r.cnt for r in keycount_with_undo(df).collect()}
    assert got == {"a": 1, "b": 1}


def test_f1_count_cache_from_pipeline(spark):
    """End-to-end F1: the star event lands in the count cache as
    (u2, star-user, u1) -> [1, 4]."""
    fanned = transform_fanout(_tuples_df(spark, F1_EVENTS), REFERENCE_CONFIG)
    cc = count_cache(fanned.where(F.col("cache_key") == "interactions-user-user"))
    rows = cc.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.subject, r.action, r.obj, r.cnt, r.latest_ts) == ("u2", "star-user", "u1", 1, 4)
