"""Batch ≡ streaming equivalence (SURVEY.md §5): the same input through the
streaming pipeline must agree with the one-shot batch result."""

from __future__ import annotations

from streamsum_spark import pipeline
from streamsum_spark.operators.caches import lastn_per_key
from streamsum_spark.streaming import pipeline as sp
from tests.conftest import SF_SMOKE, canon_rows


def _assert_same(batch_df, stream_df):
    b_cols, b_rows = canon_rows(batch_df.toPandas())
    s_cols, s_rows = canon_rows(stream_df.toPandas())
    assert b_cols == s_cols
    assert b_rows == s_rows


def test_stream_count_cache_equals_batch(spark):
    batch = pipeline.count_cache_view(spark, SF_SMOKE)
    stream = sp.stream_count_cache(spark, SF_SMOKE)
    _assert_same(batch, stream)


def test_stream_clamp_dec_equals_batch(spark):
    from streamsum_spark.entry_queries import QUERIES

    batch = QUERIES["count_cache_inc_dec"](spark, SF_SMOKE)
    stream = sp.stream_clamp_dec(spark, SF_SMOKE)
    _assert_same(batch, stream)


def test_stream_lastn_equals_batch(spark):
    from pyspark.sql import functions as F

    tuples = pipeline.cache_tuples(spark, SF_SMOKE)
    batch = lastn_per_key(tuples.where(F.col("cache_key") == "act-user-obj"), n=20)
    stream = sp.stream_lastn(spark, SF_SMOKE)
    _assert_same(batch, stream)


def test_stream_dedup_and_late_data_emit(spark):
    dd = sp.stream_dedup_watermark(spark, SF_SMOKE)
    assert dd.count() > 0
    late = sp.stream_tumbling_late_data(spark, SF_SMOKE)
    # watermark withholds the trailing windows but emits the bulk
    assert 0 < late.count()
