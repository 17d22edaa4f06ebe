"""A10 encode, A11 metrics, A12 error isolation."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from streamsum_spark import pipeline
from streamsum_spark.operators import output as out
from streamsum_spark.operators.extract import extract_events
from streamsum_spark.operators.transform import transform_fanout
from tests.conftest import SF_SMOKE


def test_encode_output_roundtrips(spark):
    tuples = pipeline.cache_tuples(spark, SF_SMOKE).limit(50)
    enc = out.encode_output(tuples).collect()
    assert len(enc) == 50
    for r in enc:
        d = json.loads(r.encoded)
        assert d["cache_key"] == r.cache_key and d["k"] == r.k
        assert "." in d["ts"]  # microsecond-formatted


def test_pipeline_metrics_match_reference_counters(spark):
    m = out.pipeline_metrics(spark, SF_SMOKE)
    assert set(m) == {"events-received", "tuples-extracted", "tuples-transformed"}
    assert m["events-received"] >= m["tuples-extracted"] > 0
    # fan-out: clicks/purchases emit 3 tuples, views/signups 1, errors 1
    assert m["tuples-transformed"] > m["tuples-extracted"]


def test_error_isolation_quarantine(spark):
    """Junk events (reference system_test.clj:23-31: scalar junk, malformed
    tuples) are quarantined; the pipeline output ignores them entirely."""
    rows = [
        (1, "2024-01-01 00:00:01", 7, "click", 1.0, '{"k": 5}'),
        (2, "2024-01-01 00:00:02", 8, "view", 1.0, "not json at all"),  # corrupt props
        (3, "2024-01-01 00:00:03", None, "click", 1.0, '{"k": 6}'),  # null subject
        (4, "2024-01-01 00:00:04", 9, None, 1.0, '{"k": 7}'),  # null predicate
        (5, "2024-01-01 00:00:05", 10, "purchase", 1.0, '{"wrong": 1}'),  # missing field
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    good, quarantine = out.parse_events_permissive(ev)
    assert {r.event_id for r in good.collect()} == {1}
    assert {r.event_id for r in quarantine.collect()} == {2, 3, 4, 5}
    # the downstream pipeline sees only well-formed rows and keeps running
    fanned = transform_fanout(extract_events(ev))
    assert {r.seq for r in fanned.collect()} == {1}


def test_unknown_cache_key_dropped(spark):
    """record! drops tuples routed to unknown caches (caches.clj:166-170):
    per-cache filters never see them."""
    caches = pipeline.build_caches(spark, SF_SMOKE)
    total_routed = sum(df.count() for name, df in caches.items() if name != "subject-counts")
    assert total_routed > 0
