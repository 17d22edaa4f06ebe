"""A10 Encode, A11 Metrics, A12 Error isolation (SURVEY.md §2.A).

Encode (protocols.clj:11-13, applied system.clj:81-87): optional map of the
post-record output tuple [cache-key key new-val t] before the out-queue.
Spark form: a final projection to the sink encoding — here JSON, with
timestamps pre-formatted so the encoding is engine-portable.

Metrics (protocols.clj:15-17, system.clj:64-79): pluggable per-stage
counters.  Batch uses the Observation API; streaming attaches the same
``observe`` calls and reads them from StreamingQueryProgress (see
streamsum_spark.streaming.pipeline.observed_tuples).  Metric keys mirror
the reference: events-received, tuples-extracted, tuples-transformed.

Error isolation (system.clj:89-95, caches.clj:172-175): an exception
processing one event drops that event only.  Spark form: malformed rows are
filtered/quarantined declaratively *before* stateful stages — extract's
null-guard (A2) plus a PERMISSIVE JSON parse with a corrupt-record column;
the quarantine view is observable rather than a log line.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from streamsum_spark.operators.extract import extract_events
from streamsum_spark.operators.transform import transform_fanout
from streamsum_spark.tables import table

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def encode_output(tuples: DataFrame) -> DataFrame:
    """Encode cache-mapped tuples as JSON output records (A10).

    The timestamp is rendered to a microsecond string before to_json:
    Spark's native JSON timestamp serialization (millis + 'T') differs
    from other engines', and an output encoding should not depend on it.
    """
    return tuples.select(
        "cache_key",
        "k",
        F.to_json(
            F.struct(
                F.col("cache_key"),
                F.col("k"),
                F.col("v"),
                F.date_format("ts", _TS_FMT).alias("ts"),
                F.col("seq"),
            )
        ).alias("encoded"),
    )


def encode_output_updated(
    tuples: DataFrame, cfg=None
) -> DataFrame:
    """A10 with reference out-queue fidelity: encode the POST-update value.

    The reference's record! returns ``[cache-key key val' time]`` where
    ``val'`` is the value AFTER the cache update ("val' may be different
    than the original tuple val", caches.clj:158-164), and Encode applies
    to that (system.clj:81-87) — so the out-queue/backup stream carries,
    e.g., the updated count subtree for a count cache, not the input tuple.
    ``encode_output`` above keeps the pre-record projection; this operator
    reproduces the reference semantics per discipline:

    - assoc: val' = the value just stored (the tuple's v);
    - lastn: val' = the ring buffer after append — the last <=N values in
      arrival order, rendered oldest..newest joined with '|';
    - count: val' = the updated (action, obj) leaf — running count and
      running max timestamp for (k, action, v) up to this tuple;
    - keycount: val' = the key's updated count.

    All four are window expressions over arrival order (ts, seq): one
    shuffle on (cache_key, k) / the count key — no stateful UDF, fully
    SQL-expressible, which is what makes the out-queue stream itself
    oracle-checkable (a replay consumer sees identical bytes).
    """
    from streamsum_spark.config import DEFAULT_CONFIG

    cfg = cfg or DEFAULT_CONFIG
    n = cfg.lastn_buf_size
    assoc_names = cfg.cache_names("assoc")
    lastn_names = cfg.cache_names("lastn")
    count_names = cfg.cache_names("count")
    keycount_names = cfg.cache_names("keycount")

    from pyspark.sql import Window

    w_base = Window.partitionBy("cache_key", "k").orderBy("ts", "seq")
    w_lastn = w_base.rowsBetween(-(n - 1), Window.currentRow)
    w_all = w_base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_cnt = (
        Window.partitionBy("cache_key", "k", "action", "v")
        .orderBy("ts", "seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    val_updated = (
        F.when(F.col("cache_key").isin(assoc_names), F.col("v"))
        .when(
            F.col("cache_key").isin(lastn_names),
            F.array_join(F.collect_list("v").over(w_lastn), "|"),
        )
        .when(
            F.col("cache_key").isin(count_names),
            F.concat(
                F.col("action"),
                F.lit("="),
                F.col("v"),
                F.lit(":"),
                F.count(F.lit(1)).over(w_cnt).cast("string"),
                F.lit("@"),
                F.date_format(F.max("ts").over(w_cnt), _TS_FMT),
            ),
        )
        .when(
            F.col("cache_key").isin(keycount_names),
            F.count(F.lit(1)).over(w_all).cast("string"),
        )
    )
    return tuples.withColumn("val_updated", val_updated).select(
        "cache_key",
        "k",
        "seq",
        F.to_json(
            F.struct(
                F.col("cache_key"),
                F.col("k"),
                F.col("val_updated").alias("v"),
                F.date_format("ts", _TS_FMT).alias("ts"),
                F.col("seq"),
            )
        ).alias("encoded"),
    )


def pipeline_metrics(spark: SparkSession, sf_dir: str) -> dict[str, int]:
    """A11 batch metrics: the reference's stage counters via Observation.

    Returns {"events-received": n, "tuples-extracted": n,
    "tuples-transformed": n} — keys 1:1 with system.clj:74-79."""
    obs_recv = Observation("events-received")
    obs_extr = Observation("tuples-extracted")
    obs_tran = Observation("tuples-transformed")
    ev = table(spark, sf_dir, "events").observe(obs_recv, F.count(F.lit(1)).alias("n"))
    tuples = extract_events(ev).observe(obs_extr, F.count(F.lit(1)).alias("n"))
    fanned = transform_fanout(tuples).observe(obs_tran, F.count(F.lit(1)).alias("n"))
    fanned.write.format("noop").mode("overwrite").save()
    return {
        "events-received": obs_recv.get["n"],
        "tuples-extracted": obs_extr.get["n"],
        "tuples-transformed": obs_tran.get["n"],
    }


_PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType(), True)])


def parse_events_permissive(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """A12: PERMISSIVE JSON parse of props with a corrupt-record column.

    Returns (good, quarantine): rows whose props fail to parse (or whose
    required fields are null) are routed to the quarantine DataFrame
    instead of killing the job — the declarative equivalent of the
    reference's per-event catch-log-continue."""
    parsed = events.withColumn(
        "props_parsed",
        F.from_json("props", _PROPS_SCHEMA, {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"}),
    )
    ok = (
        F.col("props_parsed").isNotNull()
        & F.col("props_parsed.k").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
    )
    good = parsed.where(ok).drop("props_parsed")
    quarantine = parsed.where(~ok | ok.isNull()).drop("props_parsed")
    return good, quarantine
