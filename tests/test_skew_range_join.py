"""Skew stress for the bucketed range join (VERDICT round-2 item 6).

A hot user owning 50% of events concentrates one (user, hour_bucket)
join key.  Two production treatments are pinned here:

- AQE skew-join: the range join is a plain equi-join after bucketizing,
  so OptimizeSkewedJoin can split the oversized shuffle partitions at
  runtime — no code change, no replication.  (Thresholds are lowered to
  fixture scale; at 100 TB the 256 MB defaults fire on real skew.)
- Explicit salting (join_range_salted): deterministic n_salt subkeys,
  pinned result-identical to the unsalted join.
"""

from __future__ import annotations

import datetime
import random

import pytest
from pyspark.sql import functions as F

from streamsum_spark.operators import relational as rel

_SKEW_CONFS = {
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # fixture-scale thresholds: the hot partition is ~100 KB, not 256 MB
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2KB",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture(scope="module")
def hot_user_events(spark, tmp_path_factory):
    """8k events: user 1 has 50% of them packed into 4 hours (clicks and
    purchases interleaved), 200 cold users spread over a week."""
    rng = random.Random(7)
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(4000):
        ts = base + datetime.timedelta(seconds=rng.randrange(4 * 3600))
        rows.append((i, ts, 1, "click" if i % 2 else "purchase", 1.0, "{}"))
    for i in range(4000):
        ts = base + datetime.timedelta(seconds=rng.randrange(7 * 24 * 3600))
        rows.append((4000 + i, ts, 2 + rng.randrange(200), "click" if i % 2 else "purchase", 1.0, "{}"))
    path = str(tmp_path_factory.mktemp("skew") / "events.parquet")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    ).write.mode("overwrite").parquet(path)
    return path


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


def test_aqe_splits_hot_user_partition(spark, hot_user_events):
    saved = _with_confs(spark, _SKEW_CONFS)
    try:
        ev = spark.read.parquet(hot_user_events)
        j = rel.join_range_bucketed(spark, "unused", ev=ev)
        n = len(j.collect())  # execute THIS DataFrame so AQE finalizes
        assert n > 500_000  # the hot user's quadratic-per-hour pair count
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan
        assert "AQEShuffleRead skewed" in plan
    finally:
        _restore_confs(spark, saved)


def test_salted_join_equals_unsalted_on_skewed_fixture(spark, hot_user_events):
    ev = spark.read.parquet(hot_user_events)
    plain = set(map(tuple, rel.join_range_bucketed(spark, "unused", ev=ev).collect()))
    salted = set(map(tuple, rel.join_range_salted(spark, "unused", ev=ev, n_salt=8).collect()))
    assert salted == plain and plain
    # the salt really participates in the shuffle key
    splan = rel.join_range_salted(spark, "unused", ev=ev)._jdf.queryExecution().executedPlan().toString()
    assert "salt" in splan.split("SortMergeJoin")[0] or "salt" in splan


def test_salted_join_matches_unsalted_on_real_corpus(spark):
    from tests.conftest import SF_ORACLE

    plain = set(map(tuple, rel.join_range_bucketed(spark, SF_ORACLE).collect()))
    salted = set(map(tuple, rel.join_range_salted(spark, SF_ORACLE, n_salt=4).collect()))
    assert salted == plain


@pytest.fixture(scope="module")
def hot_stream_dir(spark, tmp_path_factory):
    """A smaller hot-user fixture laid out the way the file-source
    streams expect (a single events.parquet FILE in a dir): user 1 owns
    50% of events packed into 2 hours, 50 cold users spread over a
    week."""
    import glob as g
    import shutil

    rng = random.Random(11)
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(400):
        ts = base + datetime.timedelta(seconds=rng.randrange(2 * 3600))
        rows.append((i, ts, 1, "click" if i % 2 else "purchase", 1.0, "{}"))
    for i in range(400):
        ts = base + datetime.timedelta(seconds=rng.randrange(7 * 24 * 3600))
        rows.append((400 + i, ts, 2 + rng.randrange(50), "click" if i % 2 else "purchase", 1.0, "{}"))
    out = tmp_path_factory.mktemp("skewstream")
    tmp = str(out / "_tmp")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.parquet(tmp)
    shutil.move(g.glob(tmp + "/part-*.parquet")[0], str(out / "events.parquet"))
    shutil.rmtree(tmp)
    return str(out)


def test_streaming_salted_interval_join_parity_on_hot_user(spark, hot_stream_dir):
    """The streaming port of the salt treatment (round-7): a stateful
    stream-stream join cannot use AQE skew-split (state is keyed per
    micro-batch), so the hot user concentrates one state partition —
    n_salt spreads it.  Pinned: salted == unsalted == batch oracle on
    the 50%-hot-user fixture, and the salt really participates in the
    streaming join keys."""
    from streamsum_spark.plans import inspect as plans
    from streamsum_spark.streaming import pipeline as sp

    want = {
        (r.p_event, r.c_event)
        for r in sp.batch_join_interval(spark, hot_stream_dir).collect()
    }
    plain = {
        (r.p_event, r.c_event)
        for r in sp.stream_join_interval(spark, hot_stream_dir, how="inner").collect()
    }
    salted = {
        (r.p_event, r.c_event)
        for r in sp.stream_join_interval(
            spark, hot_stream_dir, how="inner", n_salt=8
        ).collect()
    }
    assert want and salted == want == plain
    plan = plans.explain_str(
        sp._join_interval_plan(spark, hot_stream_dir, "inner", n_salt=8)
    )
    assert "p_salt" in plan and "c_salt" in plan
    # outer flavors that would emit spurious nulls are refused
    with pytest.raises(ValueError, match="n_salt"):
        sp._join_interval_plan(spark, hot_stream_dir, "full_outer", n_salt=8)
