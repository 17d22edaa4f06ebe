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
    # genuine LocalRelation for allowlisted types: broadcast builds over
    # it are job-free (the old pin was a 1-slice RDD — one job per build)
    from streamsum_spark.util import is_local_relation

    assert is_local_relation(loc)
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
    # renderer accepts the set; a wall-clock bound was dropped as
    # CI-flaky and redundant with this pin)
    from streamsum_spark.util import _in_set_pred

    assert _in_set_pred("k", set(range(0, 3000, 2))) is not None
    left = _df(spark, [(i,) for i in range(3000)], "k long")
    ids = driver_local(
        _df(spark, [(i,) for i in range(0, 3000, 2)], "k long"),
        max_rows=5000,
    )
    semi = filter_by_ids(left, "k", ids)
    assert semi.count() == 1500


def test_in_set_pred_raw_literal_mode(spark):
    # spark.sql.parser.escapedStringLiterals=true keeps string text raw
    # (no unescaping) — the renderer must follow the session parser or
    # string keys with quotes/backslashes silently match the wrong rows
    # (r15 ADVICE, medium).  Values a raw-mode literal cannot express
    # (backslashes) must make the renderer bail so filter_by_ids takes
    # the exact isin path.
    from streamsum_spark.util import _in_set_pred

    df = _df(
        spark,
        [(1, "it's"), (2, "a\\b"), (3, "plain"), (4, "q'\\mix")],
        "id long, s string",
    )
    ids = driver_local(
        _df(
            spark,
            [("it's",), ("a\\b",), ("q'\\mix",)],
            "s string",
        ),
        max_rows=100,
    )
    key = "spark.sql.parser.escapedStringLiterals"
    saved = spark.conf.get(key, "false")
    try:
        for mode in ("true", "false"):
            spark.conf.set(key, mode)
            # the public path stays exact in either parser mode,
            # rendering or falling back per value set
            got = sorted(
                r.id for r in filter_by_ids(df, "s", ids).collect()
            )
            assert got == [1, 2, 4], f"mode={mode}: {got}"
            anti = sorted(
                r.id
                for r in filter_by_ids(df, "s", ids, anti=True).collect()
            )
            assert anti == [3], f"mode={mode}: {anti}"
        # raw mode: quotes render via the other delimiter; backslashes
        # have no safe raw rendering -> None (isin fallback)
        spark.conf.set(key, "true")
        pred = _in_set_pred("s", {"it's", "plain"})
        assert pred is not None
        assert sorted(r.id for r in df.where(pred).collect()) == [1, 3]
        assert _in_set_pred("s", {"a\\b"}) is None
        assert _in_set_pred("s", {"q'\\mix"}) is None
    finally:
        spark.conf.set(key, saved)


def test_one_shot_take_restores_session_conf(spark):
    # the initialNumPartitions raise must be scoped to the probe —
    # leaving it session-wide makes every later take(5) scan
    # 4x-parallelism partitions in round one (r15 verdict item 3)
    from streamsum_spark.util import one_shot_take

    key = "spark.sql.limit.initialNumPartitions"
    before = spark.conf.get(key, "1")
    df = _df(spark, [(i,) for i in range(10)], "k long")
    rows = one_shot_take(df, 3)
    assert len(rows) == 3
    assert spark.conf.get(key, "1") == before
