"""A1 source-format breadth: canonical-schema readers beyond parquet.

The reference consumes opaque objects from a BlockingQueue — any producer
that can put an event on the queue is a source
(/root/reference/src-clj/streamsum/system.clj:97-115).  The Spark
equivalent of that open-endedness: any DataSource that can yield the raw
events schema feeds the same pipeline.  This module provides

- CSV / JSON line readers, batch and streaming, with PERMISSIVE parsing
  and a ``_corrupt`` quarantine column — the reference's error isolation
  (A12: a malformed event is dropped/logged, never poisons the pipeline,
  system.clj:91-95) done as row-level quarantine instead of try/catch;
- Kafka wiring: the readStream plan plus the value->events projection.
  The projection is a pure function over the Kafka wire schema and is
  unit-tested against a Kafka-shaped DataFrame; the broker connection
  itself needs the kafka connector package, absent in this container, so
  ``kafka_events`` raises a clear error when the data source is missing.

Scale notes: CSV/JSON scans split by line across tasks (no row-group
constraint), so no rebalance is needed; schema is always explicit —
inference would scan the data twice and is banned here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical raw events schema (TESTDATA.md), ts as TIMESTAMP_NTZ —
#: matches tables.table()'s post-conversion schema exactly, so every
#: downstream operator is source-format-agnostic.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

#: Microsecond-precision wire format (defaults truncate to millis, which
#: would break (ts, seq) arrival-order determinism, SURVEY.md §4.2.3).
TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"

_CORRUPT = "_corrupt"


def _schema_with_corrupt() -> T.StructType:
    return T.StructType([*EVENTS_SCHEMA.fields, T.StructField(_CORRUPT, T.StringType())])


def read_events_csv(spark: SparkSession, path: str, streaming: bool = False) -> DataFrame:
    """Events from CSV (header, microsecond timestamps).  PERMISSIVE: rows
    that fail the schema land in the ``_corrupt`` column instead of failing
    the scan; route them with :func:`split_quarantine`."""
    reader = (spark.readStream if streaming else spark.read).schema(_schema_with_corrupt())
    return (
        reader.option("header", "true")
        .option("timestampNTZFormat", TS_FORMAT)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .csv(path)
    )


def read_events_json(spark: SparkSession, path: str, streaming: bool = False) -> DataFrame:
    """Events from JSON lines; same quarantine contract as the CSV reader."""
    reader = (spark.readStream if streaming else spark.read).schema(_schema_with_corrupt())
    return (
        reader.option("timestampNTZFormat", TS_FORMAT)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )


def write_events_csv(events: DataFrame, path: str) -> None:
    (
        events.write.mode("overwrite")
        .option("header", "true")
        .option("timestampNTZFormat", TS_FORMAT)
        .csv(path)
    )


def write_events_json(events: DataFrame, path: str) -> None:
    events.write.mode("overwrite").option("timestampNTZFormat", TS_FORMAT).json(path)


def split_quarantine(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good_events, quarantine): A12 error isolation as dataflow.  Good
    rows get the canonical schema; quarantined rows keep the raw line for
    the reference's log-and-continue behavior (system.clj:91-95).

    Batch input is cached before the split: Spark disallows scans that
    reference only the corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_
    COLUMN), and the cache also parses the file once for both branches
    instead of once per branch — at scale the same one-pass split is done
    by a foreachBatch writing good/bad sinks from a single scan."""
    if not raw.isStreaming:
        raw = raw.cache()
    good = raw.where(F.col(_CORRUPT).isNull()).select(*[f.name for f in EVENTS_SCHEMA.fields])
    bad = raw.where(F.col(_CORRUPT).isNotNull()).select(F.col(_CORRUPT).alias("raw"))
    return good, bad


# --- Kafka -------------------------------------------------------------------

#: What Kafka's readStream yields (fixed by the connector contract).
KAFKA_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


def kafka_value_projection(raw: DataFrame) -> DataFrame:
    """Kafka wire rows -> canonical events: JSON-decode the value bytes
    against EVENTS_SCHEMA.  Undecodable payloads yield an all-null struct
    and are dropped (the reference's silent non-extractable filter,
    system.clj:75); (topic, partition, offset) ride along as the
    exactly-once source position."""
    decoded = raw.select(
        F.from_json(
            F.col("value").cast("string"),
            EVENTS_SCHEMA,
            {"timestampNTZFormat": TS_FORMAT},
        ).alias("e"),
        "topic",
        "partition",
        "offset",
    )
    return decoded.where(F.col("e.event_id").isNotNull()).select(
        "e.*", "topic", "partition", "offset"
    )


def kafka_events(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Kafka source wiring (A1): readStream + value projection.

    ``maxOffsetsPerTrigger`` is the admission-control knob — the same
    backpressure role the unbuffered channel plays in the reference
    (system.clj:98-100).  Requires the spark-sql-kafka connector on the
    classpath; without it Spark cannot resolve the "kafka" data source and
    this raises RuntimeError (the container has no broker or connector, so
    only :func:`kafka_value_projection` is exercised by tests)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    try:
        raw = reader.load()
    except Exception as exc:  # connector missing -> actionable error
        raise RuntimeError(
            "Kafka data source unavailable: add the spark-sql-kafka-0-10 "
            "package to the Spark classpath"
        ) from exc
    return kafka_value_projection(raw)


def write_events_orc(events: DataFrame, path: str) -> None:
    events.write.mode("overwrite").orc(path)


def read_events_orc(
    spark: SparkSession, path: str, streaming: bool = False
) -> DataFrame:
    """ORC reader on the canonical events schema — the columnar sibling
    of the parquet source (ORC ships in Spark core, no extra package):
    same predicate pushdown / column pruning / stripe-level min-max
    skipping class as parquet, so the A1 scan posture carries over.
    Binary columnar formats have no row-level corrupt-record concept
    (a malformed stripe fails the file, not the row) — quarantine
    belongs to the text sources; schema is enforced, never inferred."""
    if streaming:
        return spark.readStream.schema(EVENTS_SCHEMA).orc(path)
    return spark.read.schema(EVENTS_SCHEMA).orc(path)
