"""Pins for the sketch / heavy-hitter family (operators/sketches.py).

The corpus pins are structural (exact == sketch-then-verify for ANY
distribution; candidate bound <= partitions * k), because the synthetic
corpus is near-uniform.  The skewed-fixture test is the algorithmic
stress: k far below the distinct-key count forces real Misra–Gries
evictions, and the two-pass result must STILL equal exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streamsum_spark.operators import sketches as sk
from tests.conftest import SF_ORACLE


def test_mg_equals_exact_on_corpus(spark):
    exact = {(r.t, r.cnt) for r in sk.heavy_hitters_exact(spark, SF_ORACLE).collect()}
    mg = {(r.t, r.cnt) for r in sk.heavy_hitters_mg(spark, SF_ORACLE).collect()}
    assert exact  # phi=0.02 is below the uniform corpus frequency (~3%)
    assert mg == exact


def test_mg_candidate_bound(spark):
    k = 8
    cands = sk.mg_candidates(spark, SF_ORACLE, k=k)
    n_parts = cands.rdd.getNumPartitions()
    rows = cands.collect()
    assert len(rows) <= n_parts * k
    assert all(r.w > 0 for r in rows)


def test_mg_equals_exact_on_skewed_fixture(spark):
    """Zipf-ish fixture with 211 distinct keys but only k=16 counters:
    MG must evict constantly, yet sketch-then-verify == exact."""
    rows = (
        [("hot",)] * 1000
        + [(f"warm{i}",) for i in range(10) for _ in range(100)]
        + [(f"cold{i}",) for i in range(200) for _ in range(i % 5 + 1)]
    )
    df = spark.createDataFrame(rows, "t string").repartition(8)
    total = len(rows)
    phi, k = 0.03, 16

    def exact_set(phi):
        counts = df.groupBy("t").agg(F.count(F.lit(1)).alias("cnt"))
        return {
            (r.t, r.cnt) for r in counts.where(F.col("cnt") >= phi * total).collect()
        }

    import pandas as pd

    def sketch(batches):
        counters = {}
        n = 0
        for pdf in batches:
            n += len(pdf)
            counters = sk._mg_reduce(counters, pdf["t"].value_counts().to_dict(), k)
        yield pd.DataFrame(
            {"t": list(counters.keys()) + [None], "w": list(counters.values()) + [n]}
        )

    sketch_df = df.mapInPandas(sketch, "t string, w long").persist()
    cands = sketch_df.where(F.col("t").isNotNull()).select("t").distinct()
    got_n = sketch_df.where(F.col("t").isNull()).agg(F.sum("w")).collect()[0][0]
    assert got_n == total
    verified = {
        (r.t, r.cnt)
        for r in df.join(F.broadcast(cands), "t")
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .where(F.col("cnt") >= phi * total)
        .collect()
    }
    want = exact_set(phi)
    assert ("hot", 1000) in want
    assert verified == want
    # the candidate relation really is bounded, and far below distinct keys
    n_cands = cands.count()
    assert n_cands <= 8 * k < 211


def test_mg_reduce_properties():
    """Unit pins on the mergeable reduce: bounded size, undercount
    never exceeds N/(k+1), counts never overcount."""
    counters = {}
    truth = {}
    k = 4
    stream = ["a"] * 50 + ["b"] * 30 + [f"x{i}" for i in range(40)] + ["a"] * 20
    for batch in [stream[i : i + 10] for i in range(0, len(stream), 10)]:
        add = {}
        for t in batch:
            add[t] = add.get(t, 0) + 1
            truth[t] = truth.get(t, 0) + 1
        counters = sk._mg_reduce(counters, add, k)
        assert len(counters) <= k
    n = len(stream)
    for t, w in counters.items():
        assert w <= truth[t]  # never overcounts
        assert truth[t] - w <= n / (k + 1)
    # heavy key guaranteed present: count(a)=70 > 140/5=28
    assert "a" in counters


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        stream=st.lists(st.integers(min_value=0, max_value=30), max_size=400),
        k=st.integers(min_value=2, max_value=12),
        batch=st.integers(min_value=1, max_value=50),
    )
    def test_mg_reduce_hypothesis(stream, k, batch):
        """For ANY stream, batch split, and k: counters stay bounded by k,
        never overcount, undercount by at most N/(k+1), and every key with
        true count > N/(k+1) survives."""
        counters: dict = {}
        truth: dict = {}
        for i in range(0, len(stream), batch):
            add: dict = {}
            for t in stream[i : i + batch]:
                add[t] = add.get(t, 0) + 1
                truth[t] = truth.get(t, 0) + 1
            counters = sk._mg_reduce(counters, add, k)
            assert len(counters) <= k
        n = len(stream)
        for t, w in counters.items():
            assert 0 < w <= truth[t]
            assert truth[t] - w <= n / (k + 1)
        for t, c in truth.items():
            if c > n / (k + 1):
                assert t in counters, (t, c, n, k)

except ImportError:  # pragma: no cover - hypothesis is in the container
    pass


def test_hll_sketch_accuracy_and_merge(spark):
    got = {r.event_type: r.approx_users for r in sk.hll_user_counts(spark, SF_ORACLE).collect()}
    from streamsum_spark.tables import table

    ev = table(spark, SF_ORACLE, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    exact["__all__"] = ev.agg(F.countDistinct("user_id")).collect()[0][0]
    assert set(got) == set(exact)
    for key, n in exact.items():
        assert abs(got[key] - n) / n <= 0.05, (key, got[key], n)


def test_cm_sketch_overestimates_and_is_tight_for_heavy_tokens(spark):
    """Count-Min guarantees: est(t) >= true count for EVERY token (min of
    overcounting cells), and the overshoot is bounded by colliding mass
    (~N/width per cell in expectation)."""
    from pyspark.sql import functions as F

    from streamsum_spark.operators import sketches as sk

    sketch = sk.cm_sketch(spark, SF_ORACLE)
    exact = (
        sk.token_stream(spark, SF_ORACLE)
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    est = sk.cm_estimate(spark, sketch, exact.select("t"))
    joined = {r.t: (r.cnt, r.est) for r in exact.join(est, "t").collect()}
    assert joined
    n_total = sum(c for c, _ in joined.values())
    assert all(e >= c for c, e in joined.values())  # one-sided error, always
    # expected collision mass per cell is N/width; allow 8x slack
    slack = 8 * n_total / sk.CM_WIDTH
    assert all(e - c <= slack for c, e in joined.values()), max(
        e - c for c, e in joined.values()
    )


def test_cm_sketch_merges_cellwise(spark):
    """Linear-sketch mergeability: the cell-wise SUM of per-slice sketches
    equals the whole-corpus sketch exactly."""
    from pyspark.sql import functions as F

    from streamsum_spark.operators import sketches as sk
    from streamsum_spark.tables import table

    docs = table(spark, SF_ORACLE, "documents")
    whole = {
        (r.d, r.bucket): r.cnt for r in sk.cm_sketch(spark, SF_ORACLE).collect()
    }
    merged: dict = {}
    for i in range(3):
        part = docs.where(F.pmod(F.col("doc_id"), F.lit(3)) == i)
        toks = part.select(F.explode(F.expr(sk._TOKS)).alias("t"))
        for r in sk.cm_sketch(spark, SF_ORACLE, tokens=toks).collect():
            merged[(r.d, r.bucket)] = merged.get((r.d, r.bucket), 0) + r.cnt
    assert merged == whole


def test_cm_sketch_matches_duckdb_oracle(spark):
    from streamsum_spark.operators import sketches as sk
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(
        spark, lambda s, d: sk.cm_sketch(s, d), sk.cm_sketch_oracle_sql()
    )


def test_stream_cm_sketch_multibatch_equals_batch(spark, tmp_path):
    from streamsum_spark.operators import sketches as sk
    from streamsum_spark.streaming import pipeline as sp
    from tests.test_streaming import _sliced_docs_src

    src = _sliced_docs_src(spark, tmp_path)
    batch = {(r.d, r.bucket, r.cnt) for r in sk.cm_sketch(spark, src).collect()}
    stream = {
        (r.d, r.bucket, r.cnt)
        for r in sp.stream_cm_sketch(
            spark, src, glob="documents_*.parquet", max_files_per_trigger=1
        ).collect()
    }
    assert batch and stream == batch


def test_heavy_hitters_native_matches_exact_for_clear_heavies(spark):
    """approx_top_k (Spark 4 built-in sketch): the top items and counts
    must agree with the exact aggregation at this corpus size."""
    from streamsum_spark.operators import sketches as sk

    native = {r.t: r.cnt for r in sk.heavy_hitters_native(spark, SF_ORACLE, k=10).collect()}
    exact = {
        r.t: r.cnt
        for r in sk.token_stream(spark, SF_ORACLE)
        .groupBy("t")
        .agg(sk.F.count(sk.F.lit(1)).cast("long").alias("cnt"))
        .collect()
    }
    assert len(native) == 10
    # every reported count is the exact count (sketch tracked them fully)
    assert all(exact[t] == c for t, c in native.items())
    # items STRICTLY above the rank-10 count must appear (ties at the
    # boundary may resolve either way)
    kth = sorted(native.values())[0]
    must_have = {t for t, c in exact.items() if c > kth}
    assert must_have <= set(native)


def test_heavy_hitters_cm_superset_with_one_sided_counts(spark):
    """The rescan-free CM path returns a SUPERSET of the exact phi-heavy
    set, every estimated count >= the exact count, and precision stays
    reasonable (CM overshoot rarely promotes a non-heavy candidate)."""
    from streamsum_spark.operators import sketches as sk

    exact = {r.t: r.cnt for r in sk.heavy_hitters_exact(spark, SF_ORACLE).collect()}
    got = {r.t: r.cnt for r in sk.heavy_hitters_cm(spark, SF_ORACLE).collect()}
    assert set(exact) <= set(got)  # superset guarantee
    for t, cnt in exact.items():
        assert got[t] >= cnt  # one-sided estimates
    assert len(got) <= 2 * max(1, len(exact))  # overshoot stays bounded here


def test_bloom_no_false_negatives_and_low_fp(spark):
    """Membership guarantees: every inserted key tests True (structural —
    its bits were set), and non-members false-positive at no more than a
    loose multiple of the theoretical (1 - e^{-kn/m})^k rate."""
    from pyspark.sql import functions as F

    members = spark.range(300).selectExpr("md5(CAST(id AS STRING)) AS key")
    others = spark.range(300, 1300).selectExpr("md5(CAST(id AS STRING)) AS key")
    bloom = sk.bloom_build(spark, SF_ORACLE, keys=members)

    got_m = sk.bloom_might_contain(spark, bloom, members)
    assert got_m.where(~F.col("might_contain")).count() == 0  # no false negatives
    n_fp = sk.bloom_might_contain(spark, bloom, others).where(
        F.col("might_contain")
    ).count()
    # theory: (1 - e^(-5*300/65536))^5 ~ 4e-8 per probe -> expect 0 of 1000
    assert n_fp <= 3, n_fp


def test_bloom_merges_by_word_bit_or(spark):
    """Two filters over the same geometry merge by per-word bit_or into
    exactly the filter of the union — the per-shard rollup property."""
    from pyspark.sql import functions as F

    a = spark.range(200).selectExpr("md5(CAST(id AS STRING)) AS key")
    b = spark.range(150, 400).selectExpr("md5(CAST(id AS STRING)) AS key")
    fa = sk.bloom_build(spark, SF_ORACLE, keys=a)
    fb = sk.bloom_build(spark, SF_ORACLE, keys=b)
    merged = (
        fa.unionByName(fb).groupBy("word").agg(F.bit_or("bits").cast("long").alias("bits"))
    )
    union = sk.bloom_build(spark, SF_ORACLE, keys=a.unionByName(b).distinct())
    got = {(r.word, r.bits) for r in merged.collect()}
    want = {(r.word, r.bits) for r in union.collect()}
    assert got == want and want


def test_decontaminate_by_bloom_drops_all_excluded(spark):
    """Every document whose content is in the exclusion set is dropped
    (no false negatives); over-drop of clean docs stays at the FP rate
    (~0 at this geometry)."""
    from pyspark.sql import functions as F

    from streamsum_spark.tables import table

    docs = table(spark, SF_ORACLE, "documents").where(F.col("text").isNotNull())
    excluded = docs.orderBy("doc_id").limit(50)
    ex_keys = excluded.select(F.md5("text").alias("key")).distinct()
    kept = sk.decontaminate_by_bloom(spark, SF_ORACLE, ex_keys)
    kept_ids = {r.doc_id for r in kept.collect()}
    # exact-dup families: dropping by CONTENT removes every doc sharing
    # an excluded doc's text, not only the 50 ids
    ex_texts = excluded.select("text").distinct()
    truly_excluded = {
        r.doc_id for r in docs.join(ex_texts, "text", "left_semi").collect()
    }
    assert kept_ids.isdisjoint(truly_excluded)  # no false negatives
    clean = {r.doc_id for r in docs.collect()} - truly_excluded
    over_dropped = clean - kept_ids
    assert len(over_dropped) <= 3, len(over_dropped)  # FP-rate over-drop only


def test_stream_bloom_filter_multibatch_equals_batch(spark, tmp_path):
    """The incremental filter (per-batch Bloom words bit_or-merged
    through the additive sink) must equal the one-shot filter of the
    whole corpus — the monotone-bitmap merge property end-to-end."""
    from streamsum_spark.operators import sketches as sk
    from streamsum_spark.streaming import pipeline as sp
    from tests.test_streaming import _sliced_docs_src

    src = _sliced_docs_src(spark, tmp_path)
    batch = {(r.word, r.bits) for r in sk.bloom_build(spark, src).collect()}
    stream = {
        (r.word, r.bits)
        for r in sp.stream_bloom_filter(
            spark, src, glob="documents_*.parquet", max_files_per_trigger=1
        ).collect()
    }
    assert batch and stream == batch


def test_log_histogram_merges_by_sum_and_bounds_quantiles(spark):
    """The quantile summary of the sketch family: (a) shard sketches
    merged by per-bin SUM equal the whole-corpus sketch (mergeability —
    the property that lets it persist through the additive sink); (b)
    the histogram quantile's upper-edge estimate brackets the exact
    percentile within its 2x design bound."""
    from pyspark.sql import functions as F

    from streamsum_spark.operators.sketches import (
        histogram_quantile,
        log_histogram_sketch,
    )
    from streamsum_spark.tables import table
    from tests.conftest import SF_SMOKE

    whole = log_histogram_sketch(spark, SF_SMOKE)
    ev = table(spark, SF_SMOKE, "events")
    bin_expr = F.expr("length(bin(CAST(value * 1000 AS BIGINT)))").alias("bin")
    shards = [
        ev.where(F.pmod("event_id", F.lit(2)) == i)
        .select("event_type", bin_expr)
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        for i in (0, 1)
    ]
    merged = (
        shards[0].unionByName(shards[1])
        .groupBy("event_type", "bin")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    key = lambda df: {(r.event_type, r.bin): r.n for r in df.collect()}
    assert key(merged) == key(whole)

    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("value")
    tot = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type", "value",
        F.row_number().over(w).alias("r"),
        F.count(F.lit(1)).over(tot).alias("n"),
    )
    for q in (0.5, 0.9, 0.99):
        est = {r.event_type: r.q_upper for r in histogram_quantile(whole, q).collect()}
        # the DISCRETE quantile under the same rank convention the
        # histogram walk uses (first value with cum >= q*N): the bound
        # est/disc in (1, 2] is exact by construction, while Spark's
        # interpolated percentile() can sit below the bin's lower edge
        disc = {
            r.event_type: r.p
            for r in ranked.where(F.col("r") >= F.lit(q) * F.col("n"))
            .groupBy("event_type")
            .agg(F.min("value").alias("p"))
            .collect()
        }
        for k, p in disc.items():
            assert 1.0 < est[k] / p <= 2.001, (q, k, est[k], p)


def test_stream_log_histogram_equals_batch(spark):
    """The additive sink maintains the quantile summary incrementally:
    the streamed histogram equals the one-shot batch relation."""
    from streamsum_spark.operators.sketches import log_histogram_sketch
    from streamsum_spark.streaming.pipeline import stream_log_histogram
    from tests.conftest import SF_SMOKE

    batch = {
        (r.event_type, r.bin): r.n
        for r in log_histogram_sketch(spark, SF_SMOKE).collect()
    }
    stream = {
        (r.event_type, r.bin): r.n
        for r in stream_log_histogram(spark, SF_SMOKE).collect()
    }
    assert stream == batch


def test_log_histogram_rejects_negatives_skips_nulls(spark, tmp_path):
    """Input-contract guard (round-7): a negative value would bin into
    the 64-char two's-complement top bin and silently poison every
    quantile — the sketch must RAISE instead; NULL values are skipped
    exactly as the oracle SQL's WHERE clause skips them."""
    import os

    import pytest

    from streamsum_spark.tables import table
    from tests.conftest import SF_SMOKE

    base = table(spark, SF_SMOKE, "events").limit(20)
    sf_neg = str(tmp_path / "neg")
    base.withColumn("value", -F.abs(F.col("value")) - F.lit(1.0)).write.parquet(
        os.path.join(sf_neg, "events.parquet")
    )
    with pytest.raises(Exception, match="non-negative"):
        sk.log_histogram_sketch(spark, sf_neg).collect()

    sf_null = str(tmp_path / "null")
    mixed = base.withColumn(
        "value", F.when(F.col("event_id") % 2 == 0, F.col("value"))
    )
    n_nonnull = mixed.where(F.col("value").isNotNull()).count()
    mixed.write.parquet(os.path.join(sf_null, "events.parquet"))
    hist = sk.log_histogram_sketch(spark, sf_null)
    assert hist.agg(F.sum("n")).collect()[0][0] == n_nonnull
    assert not [r for r in hist.collect() if r.bin is None]
