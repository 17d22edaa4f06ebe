"""Source-format parity (A1): CSV / JSON / Kafka-shaped inputs feed the
same pipeline as parquet, with A12 quarantine for malformed rows."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from streamsum_spark.operators.extract import extract_events
from streamsum_spark.sources import formats as fmt
from streamsum_spark.tables import table
from tests.conftest import SF_SMOKE


def _tuple_set(df):
    return {
        (r.pred, r.subj, r.obj, r.ts, r.seq) for r in extract_events(df).collect()
    }


@pytest.fixture(scope="module")
def parquet_tuples(spark):
    return _tuple_set(table(spark, SF_SMOKE, "events"))


def test_csv_roundtrip_matches_parquet(spark, tmp_path_factory, parquet_tuples):
    path = str(tmp_path_factory.mktemp("ev") / "csv")
    fmt.write_events_csv(table(spark, SF_SMOKE, "events"), path)
    good, bad = fmt.split_quarantine(fmt.read_events_csv(spark, path))
    assert _tuple_set(good) == parquet_tuples
    assert bad.count() == 0


def test_json_roundtrip_matches_parquet(spark, tmp_path_factory, parquet_tuples):
    path = str(tmp_path_factory.mktemp("ev") / "json")
    fmt.write_events_json(table(spark, SF_SMOKE, "events"), path)
    good, bad = fmt.split_quarantine(fmt.read_events_json(spark, path))
    assert _tuple_set(good) == parquet_tuples
    assert bad.count() == 0


def test_csv_quarantine_isolates_corrupt_rows(spark, tmp_path):
    """A12: a malformed line lands in quarantine; good rows still parse."""
    p = tmp_path / "mixed.csv"
    p.write_text(
        "event_id,ts,user_id,event_type,value,props\n"
        "1,2024-01-01T00:00:00.000001,7,click,1.5,\"{\"\"k\"\":\"\"a\"\"}\"\n"
        "not-a-long,garbage,x,y,z,w\n"
        "2,2024-01-01T00:00:00.000002,8,view,2.5,\"{\"\"k\"\":\"\"b\"\"}\"\n"
    )
    good, bad = fmt.split_quarantine(fmt.read_events_csv(spark, str(p)))
    assert {r.event_id for r in good.collect()} == {1, 2}
    assert bad.count() == 1
    assert "not-a-long" in bad.collect()[0].raw


def test_streaming_csv_equals_batch(spark, tmp_path_factory):
    """The streaming CSV reader yields the same extracted tuples as batch
    (stateless stages are the same functions — parity by construction)."""
    from streamsum_spark.streaming.pipeline import _run_to_memory

    path = str(tmp_path_factory.mktemp("ev") / "csv")
    fmt.write_events_csv(table(spark, SF_SMOKE, "events"), path)
    good, _ = fmt.split_quarantine(fmt.read_events_csv(spark, path, streaming=True))
    streamed = _run_to_memory(extract_events(good), "append")
    batch_good, _ = fmt.split_quarantine(fmt.read_events_csv(spark, path))
    assert {tuple(r) for r in streamed.collect()} == {
        tuple(r) for r in extract_events(batch_good).collect()
    }


def test_kafka_value_projection(spark):
    """Kafka wire rows (binary JSON values) decode to canonical events;
    undecodable payloads are silently dropped (system.clj:75)."""
    payloads = [
        json.dumps(
            {
                "event_id": i,
                "ts": f"2024-01-01T00:00:00.00000{i}",
                "user_id": 10 + i,
                "event_type": "click",
                "value": 1.0 * i,
                "props": json.dumps({"k": f"v{i}"}),
            }
        ).encode()
        for i in (1, 2)
    ] + [b"\xff not json"]
    rows = [
        (None, p, "events", 0, i, None, 0) for i, p in enumerate(payloads)
    ]
    raw = spark.createDataFrame(rows, fmt.KAFKA_WIRE_SCHEMA)
    out = fmt.kafka_value_projection(raw)
    got = {(r.event_id, r.user_id, r.offset) for r in out.collect()}
    assert got == {(1, 11, 0), (2, 12, 1)}
    # the decoded ts carries microseconds (arrival-order determinism)
    ts = {r.event_id: r.ts for r in out.collect()}
    assert ts[1].microsecond == 1 and ts[2].microsecond == 2


def test_kafka_wiring_raises_without_connector(spark):
    with pytest.raises(RuntimeError, match="Kafka data source unavailable"):
        fmt.kafka_events(spark, "localhost:9092", "events")


def test_orc_roundtrip_batch_and_stream(spark, tmp_path):
    """ORC source parity: canonical events written to ORC read back
    identically (batch and streaming), and a predicate reaches the ORC
    scan as a pushed filter — the same scan posture as parquet."""
    from streamsum_spark.plans import explain_str
    from streamsum_spark.sources.formats import read_events_orc, write_events_orc
    from streamsum_spark.tables import table
    from tests.conftest import SF_SMOKE

    ev = table(spark, SF_SMOKE, "events")
    path = str(tmp_path / "ev_orc")
    write_events_orc(ev, path)
    back = read_events_orc(spark, path)
    assert back.count() == ev.count()
    a = {(r.event_id, r.user_id, r.event_type) for r in back.collect()}
    b = {(r.event_id, r.user_id, r.event_type) for r in ev.collect()}
    assert a == b
    plan = explain_str(back.where(F.col("event_type") == "click").select("event_id"))
    assert "PushedFilters: [" in plan and "event_type" in plan
    # streaming face: availableNow over the same files == batch
    stream = read_events_orc(spark, path, streaming=True)
    name = f"orc_{abs(hash(path)) % 10**8}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.table(name).count() == ev.count()
