"""A1 sources — the reference's in-queue feed re-expressed.

Reference: a thread loop ``.take``s from a BlockingQueue and pushes into
the processing channel; ``:shutdown`` closes the pipeline
(/root/reference/src-clj/streamsum/system.clj:97-115).  Spark equivalents:

- batch_events: one-shot parquet scan (lifecycle = action execution);
- stream_events: file-source stream; lifecycle = StreamingQuery start/stop,
  no sentinel needed; admission control (maxFilesPerTrigger) plays the
  backpressure role of the unbuffered channel;
- memory_events: createDataFrame feed for unit tests — the moral
  equivalent of the tests' hand-built queues (system_test.clj:18-21).

A Kafka source would slot in here identically (readStream.format("kafka")
+ from_json projection); it isn't wired because the container has no
broker to test against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from streamsum_spark.tables import table


def batch_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "events")


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamsum_spark.streaming.pipeline import stream_events as _se

    return _se(spark, sf_dir)


def memory_events(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    """Typed in-memory feed: rows of (event_id, ts_str, user_id,
    event_type, value, props_json)."""
    from pyspark.sql import functions as F

    return spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
