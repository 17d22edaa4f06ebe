"""Pins for the round-15 scheduling-cut utilities (util.driver_local /
filter_by_ids / one_shot_take): exact join-semantics equivalence —
including NULL keys and empty sets — plus the bound fallbacks, so the
frozen/streaming cycles that ride them cannot drift."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamsum_spark.util import driver_local, filter_by_ids, one_shot_take


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_driver_local_rows_and_schema(spark):
    src = _df(spark, [(1, "a"), (2, None), (3, "c")], "id long, v string")
    loc = driver_local(src, max_rows=10)
    assert loc.schema == src.schema
    assert sorted(r.id for r in loc.collect()) == [1, 2, 3]
    # 1-slice local relation, tagged for the predicate path
    assert loc.rdd.getNumPartitions() == 1
    assert len(loc._streamsum_local_rows) == 3


def test_driver_local_over_bound_returns_input(spark):
    src = _df(spark, [(i,) for i in range(50)], "id long")
    out = driver_local(src, max_rows=10)
    assert out is src  # distributed form untouched
    # known-count shortcut honors the bound too
    assert driver_local(src, max_rows=10, n_rows=50) is src
    assert driver_local(src, max_rows=64, n_rows=50) is not src


def test_driver_local_empty(spark):
    src = _df(spark, [], "id long, v string")
    loc = driver_local(src, max_rows=10)
    assert loc.schema == src.schema and loc.count() == 0


def test_filter_by_ids_matches_joins_incl_nulls(spark):
    left = _df(
        spark,
        [(1, "x"), (2, "y"), (None, "z"), (3, "w")],
        "k long, v string",
    )
    for id_rows in ([(1,), (3,), (9,)], []):
        ids = driver_local(_df(spark, id_rows, "k long"), max_rows=10)
        for anti in (False, True):
            how = "left_anti" if anti else "left_semi"
            want = sorted(
                (
                    (r.k, r.v)
                    for r in left.join(
                        _df(spark, id_rows, "k long"), "k", how
                    ).collect()
                ),
                key=str,
            )
            got = sorted(
                (
                    (r.k, r.v)
                    for r in filter_by_ids(
                        left, "k", ids, anti=anti
                    ).collect()
                ),
                key=str,
            )
            assert got == want, (id_rows, anti, got, want)


def test_filter_by_ids_distributed_fallback(spark):
    left = _df(spark, [(i, i % 3) for i in range(30)], "k long, g long")
    ids = _df(spark, [(i,) for i in range(0, 30, 2)], "k long")  # untagged
    semi = filter_by_ids(left, "k", ids)
    assert sorted(r.k for r in semi.collect()) == list(range(0, 30, 2))
    anti = filter_by_ids(left, "k", ids, anti=True)
    assert sorted(r.k for r in anti.collect()) == list(range(1, 30, 2))


def test_filter_by_ids_id_col_mapping(spark):
    left = _df(spark, [(1,), (2,), (3,)], "doc_id long")
    ids = driver_local(
        _df(spark, [(2, "t2"), (3, "t3")], "doc_id long, tmd5 string"),
        max_rows=10,
    )
    got = sorted(
        r.doc_id
        for r in filter_by_ids(left, "doc_id", ids, id_col="doc_id").collect()
    )
    assert got == [2, 3]


def test_one_shot_take_bounded_and_complete(spark):
    df = _df(spark, [(i,) for i in range(100)], "id long").repartition(16)
    got = one_shot_take(df.where("id < 7"), 50)
    assert sorted(r.id for r in got) == list(range(7))
    assert len(one_shot_take(df, 10)) == 10


def test_in_set_pred_rendering_and_fallback(spark):
    from streamsum_spark.util import _in_set_pred

    df = _df(
        spark,
        [(1, "it's", True), (2, "a\\b", False), (3, "plain", True)],
        "id long, s string, b boolean",
    )
    # ints, escaped strings, booleans render; the predicate is the same
    # Catalyst In as isin would build
    assert sorted(
        r.id for r in df.where(_in_set_pred("id", {1, 3})).collect()
    ) == [1, 3]
    assert sorted(
        r.id for r in df.where(_in_set_pred("s", {"it's", "a\\b"})).collect()
    ) == [1, 2]
    assert sorted(
        r.id for r in df.where(_in_set_pred("b", {True})).collect()
    ) == [1, 3]
    # unrenderable value types and non-identifier columns fall back
    assert _in_set_pred("id", {1.5}) is None
    assert _in_set_pred("a.b", {1}) is None


def test_filter_by_ids_large_set_one_expr(spark):
    # a big id set must not pay a py4j round trip per literal (isin()
    # costs ~3 ms/LITERAL to construct): the rendered form must take
    # the one-parsed-expression path — pinned structurally (the
    # renderer accepts the set) plus a generous wall bound that the
    # per-literal path (~5 s here) cannot meet even on a noisy host
    import time

    from streamsum_spark.util import _in_set_pred

    assert _in_set_pred("k", set(range(0, 3000, 2))) is not None
    left = _df(spark, [(i,) for i in range(3000)], "k long")
    ids = driver_local(
        _df(spark, [(i,) for i in range(0, 3000, 2)], "k long"),
        max_rows=5000,
    )
    t0 = time.perf_counter()
    semi = filter_by_ids(left, "k", ids)
    build = time.perf_counter() - t0
    assert build < 4.0, f"predicate construction took {build:.2f}s"
    assert semi.count() == 1500
