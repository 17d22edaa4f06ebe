"""Streaming pipeline: the reference's hot path as Structured Streaming.

Reference mapping (system.clj:97-115): the BlockingQueue feeder/drainer
becomes readStream -> transformations -> writeStream; lifecycle is
StreamingQuery start/stop (no :shutdown sentinel); backpressure is
micro-batch admission (maxFilesPerTrigger / maxOffsetsPerTrigger);
exactly-once state via checkpointing — strictly stronger than the
reference's at-most-once drop-on-error (A12).

The stateless stages (extract A2, transform A3) are the *same functions*
as batch — they are plain DataFrame transforms, so batch/streaming parity
is by construction.  The cache layer becomes:
- count cache (A7): streaming groupBy aggregation — complete mode here
  (bounded key space); update mode + foreachBatch MERGE for incremental
  sinks at scale;
- assoc (A5): max_by aggregation, same;
- lastn (A6) and clamped inc/dec (A8): genuinely stateful ->
  applyInPandasWithState folds (SURVEY.md §4.2.1-2);
- metrics (A11): df.observe() + StreamingQueryListener with the
  reference's stage-counter names (system.clj:64-79).

Each helper runs an availableNow query to completion into a memory sink
and returns the resulting static DataFrame, which is what lets the
driver's DuckDB oracle hash-check streaming results against the batch
oracles — batch≡streaming equivalence enforced by the correctness gate
itself.
"""

from __future__ import annotations

import os
import tempfile
import uuid
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from streamsum_spark.sinks import read_state_table
from streamsum_spark.util import driver_local, filter_by_ids

from streamsum_spark.config import DEFAULT_CONFIG
from streamsum_spark.operators.caches import count_cache
from streamsum_spark.operators.extract import extract_events
from streamsum_spark.operators.transform import transform_fanout

# raw schema of events.parquet when the ts column is parquet TIMESTAMP(NANOS)
# (read as long under the nanosAsLong legacy conf — see tables.py).  Kept as
# a named constant because tests build synthetic nanos fixtures from it; the
# live reader infers the actual on-disk schema instead of assuming it.
# Broadcast bound (rows) for the MICRO-BATCH side of the streaming
# near-dup joins.  Batch-derived relations are localCheckpoint'ed, so
# their planner size statistic is the default maximum and Catalyst
# never auto-broadcasts them — every batch-vs-store join would plan as
# a shuffle join, shuffling the store side.  The batch row count is
# driver-known (the checkpointed relations are counted anyway), so at
# or below this bound the batch side is hinted broadcast — the
# stream-static join shape — and a bulk batch keeps the shuffle path.
_NDUP_BC_ROWS = int(os.environ.get("STREAMSUM_NDUP_BC_ROWS", "1000000"))

_EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(
    spark: SparkSession,
    sf_dir: str,
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over the events parquet (A1 source).

    A file-source stream needs an explicit schema, so we take it from a
    batch footer read of the same files — one driver-side metadata read,
    no data scan — which keeps streaming ts semantics identical to the
    batch reader (tables.table) for EITHER generator output: a
    TIMESTAMP(NANOS) column reads as long (nanosAsLong) and truncates to
    microseconds with the same integer arithmetic as batch; a
    TIMESTAMP(MICROS) column reads natively as timestamp_ntz and needs no
    conversion.  Hard-coding the nanos shape here silently produced
    1000x-shrunk timestamps when the generator switched to micros.

    ``max_files_per_trigger`` is the admission-control/backpressure knob
    (the reference's unbuffered-channel blocking hand-off, system.clj:98-100,
    becomes bounded micro-batch sizing)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = (
        spark.read.option("pathGlobFilter", glob).parquet(sf_dir).schema
    )
    reader = spark.readStream.schema(raw_schema).option("pathGlobFilter", glob)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.parquet(sf_dir)
    if dict(raw.dtypes).get("ts") == "bigint":
        raw = raw.withColumn(
            "ts",
            F.expr("timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"),
        )
    return raw


def observed_tuples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract -> transform with the reference's stage counters attached
    (A11: :events-received, :tuples-extracted, :tuples-transformed)."""
    ev = stream_events(spark, sf_dir).observe(
        "events_received", F.count(F.lit(1)).alias("n")
    )
    tuples = extract_events(ev).observe("tuples_extracted", F.count(F.lit(1)).alias("n"))
    fanned = transform_fanout(tuples, DEFAULT_CONFIG).observe(
        "tuples_transformed", F.count(F.lit(1)).alias("n")
    )
    return fanned


def _run_to_memory(df: DataFrame, output_mode: str) -> DataFrame:
    """Run an availableNow streaming query to completion; return the sink
    table as a static DataFrame."""
    name = f"mem_{uuid.uuid4().hex[:12]}"
    ckpt = os.path.join(tempfile.gettempdir(), f"streamsum_ckpt_{name}")
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)


def _run_via_cache_table(
    df: DataFrame, key_cols: list[str], order_col: str | list[str]
) -> DataFrame:
    """Run an UPDATE-mode availableNow stream through the production sink
    path — foreachBatch MERGE into a keyed parquet cache table — and read
    the final table back.

    This is the bounded-state form: each micro-batch emits only UPDATED
    keys (update output mode), and the sink merges them by key
    (sinks.upsert_batch; Delta/Iceberg MERGE INTO on a real deployment).
    Unlike a complete-mode memory sink, nothing ever re-emits the full
    state — per-batch work is O(changed keys), which is what survives an
    unbounded key space at 100 TB."""
    from streamsum_spark.sinks import stream_to_cache_table

    target = os.path.join(
        tempfile.gettempdir(), f"streamsum_cache_tbl_{uuid.uuid4().hex[:12]}"
    )
    stream_to_cache_table(df, target, key_cols=key_cols, order_col=order_col)
    return read_state_table(df.sparkSession, target)


def stream_count_cache(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 as a streaming aggregation through the bounded-state path:
    update-mode aggregation -> foreachBatch MERGE into a keyed cache table
    (complete-mode memory sinks would re-emit full state per micro-batch).
    Result == batch count cache, so it shares the batch oracle (the
    strongest batch≡streaming check).  ``cnt`` is monotone per key, so it
    doubles as the merge's newest-wins order column."""
    fanned = observed_tuples(spark, sf_dir)
    name = DEFAULT_CONFIG.cache_names("count")[0]
    agg = count_cache(fanned.where(F.col("cache_key") == name))
    return _run_via_cache_table(agg, key_cols=["subject", "action", "obj"], order_col="cnt")


def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h windows as a streaming window aggregation (complete mode
    so every window emits and the batch oracle applies; production uses
    append + watermark — see stream_tumbling_late_data)."""
    ev = stream_events(spark, sf_dir)
    agg = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("bucket"), "event_type", "n", "sum_value")
    )
    return _run_to_memory(agg, "complete")


def stream_tumbling_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-mode tumbling windows with a 30-minute watermark: only
    windows the watermark has passed emit; late rows beyond the delay are
    dropped.  Unbounded-state-safe at 100 TB (state evicts with the
    watermark) => rows-only check (the final windows are legitimately
    withheld)."""
    # watermarks require TIMESTAMP (not NTZ): cast for event-time tracking,
    # cast the bucket back to NTZ on the way out
    ev = stream_events(spark, sf_dir).withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).withWatermark("ts", "30 minutes")
    agg = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.col("w.start").cast("timestamp_ntz").alias("bucket"), "event_type", "n")
    )
    return _run_to_memory(agg, "append")


def stream_sessionize(
    spark: SparkSession,
    sf_dir: str,
    gap_minutes: int = 5,
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin of relational.sessionize_events: the same
    session_window expression over the event stream, update mode.

    Spark supports session-window streaming aggregation in append and
    complete modes only (update would re-emit a session whose window is
    still merging).  This harness runs COMPLETE mode so the final snapshot
    is the exact full session set, hash-comparable to the batch oracle;
    the production path is append + a real-lateness watermark, where a
    session emits (and its state evicts) once the watermark passes its
    end — same expression, bounded state.  The watermark here still
    drives session merging in the state store; 30 days just keeps every
    session un-finalized so the snapshot stays complete."""
    ev = stream_events(spark, sf_dir, glob=glob, max_files_per_trigger=max_files_per_trigger)
    ev = ev.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark("ts", "30 days")
    agg = (
        ev.groupBy("user_id", F.session_window("ts", f"{gap_minutes} minutes").alias("w"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            F.col("w.end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
        )
    )
    return _run_to_memory(agg, "complete")


_SESS_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)
# open sessions per user: parallel arrays (start_us, last_event_us, count)
_SESS_STATE = T.StructType(
    [
        T.StructField("starts", T.ArrayType(T.LongType())),
        T.StructField("lasts", T.ArrayType(T.LongType())),
        T.StructField("ns", T.ArrayType(T.LongType())),
    ]
)


def stream_sessionize_stateful(
    spark: SparkSession,
    sf_dir: str,
    gap_minutes: int = 5,
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Per-key UPDATE-mode sessionization on applyInPandasWithState —
    the round-4 stretch item, feasible without transformWithState (which
    stays protobuf-gated): each user's open sessions live in the state
    store as merged intervals; a session EMITS exactly once, when the
    event-time watermark passes its end + gap, and its state evicts.

    This is the bounded-state production shape the complete-mode twin
    (stream_sessionize) emulates: state is open sessions only, output is
    final closed sessions only — no re-emission, no full-snapshot sink.
    Semantics match batch session_window exactly: merge condition is
    ``<=`` on the gap (tests/test_sessionize_boundary.py), session_end =
    last event + gap.  Events later than an emitted session's close are
    dropped by the watermark contract (here the source is replayed files,
    so nothing is late).  EventTimeTimeout closes sessions for keys
    absent from a micro-batch; Spark's trailing no-data batch fires the
    final timeouts before availableNow terminates.

    Pinned in tests/test_streaming.py: emitted sessions are exactly the
    batch sessions whose end + gap the final watermark passed (with a
    0-second watermark delay that is every session except each user's
    last-if-still-open)."""
    gap_us = gap_minutes * 60 * 1_000_000
    gap_ms = gap_minutes * 60 * 1_000

    def fold(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            starts, lasts, ns = (list(x) for x in state.get)
        else:
            starts, lasts, ns = [], [], []
        ivals = list(zip(starts, lasts, ns))
        for pdf in pdf_iter:
            for t in pdf["ts"]:
                us = int(pd.Timestamp(t).value // 1000)
                ivals.append((us, us, 1))
        # re-merge intervals under the gap (an arriving event can bridge
        # two open sessions); sort makes the single pass complete
        ivals.sort()
        merged: list[tuple[int, int, int]] = []
        for s, e, n in ivals:
            if merged and s <= merged[-1][1] + gap_us:
                ps, pe, pn = merged[-1]
                merged[-1] = (ps, max(pe, e), pn + n)
            else:
                merged.append((s, e, n))
        wm_ms = state.getCurrentWatermarkMs()
        closed = [iv for iv in merged if (iv[1] + gap_us) // 1000 <= wm_ms]
        kept = [iv for iv in merged if (iv[1] + gap_us) // 1000 > wm_ms]
        if kept:
            state.update(
                ([s for s, _, _ in kept], [e for _, e, _ in kept], [n for _, _, n in kept])
            )
            # wake this key when the watermark passes its next session end
            state.setTimeoutTimestamp(
                max(wm_ms + 1, min(e for _, e, _ in kept) // 1000 + gap_ms)
            )
        else:
            state.remove()
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(closed),
                    "start_us": [s for s, _, _ in closed],
                    "end_us": [e + gap_us for _, e, _ in closed],
                    "n_events": [n for _, _, n in closed],
                }
            )

    ev = stream_events(spark, sf_dir, glob=glob, max_files_per_trigger=max_files_per_trigger)
    ev = ev.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark("ts", "0 seconds")
    folded = ev.select("user_id", "ts").groupBy("user_id").applyInPandasWithState(
        fold, _SESS_OUT, _SESS_STATE, "update", GroupStateTimeout.EventTimeTimeout
    )
    mem = _run_to_memory(folded, "update")
    epoch = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"
    return mem.select(
        "user_id",
        F.expr(f"timestampadd(MICROSECOND, start_us, {epoch})").alias("session_start"),
        F.expr(f"timestampadd(MICROSECOND, end_us, {epoch})").alias("session_end"),
        "n_events",
    )


def stream_join_interval(
    spark: SparkSession,
    sf_dir: str,
    how: str = "inner",
    max_files_per_trigger: int | None = None,
    n_salt: int | None = None,
) -> DataFrame:
    """Stream-STREAM interval join (the streaming face of the batch join
    family, §2.C "Joins"): each purchase event joins the same user's
    click events from the preceding hour.  Both sides carry a watermark
    and the join condition carries the time interval — exactly what
    Spark needs to bound join state: a buffered click can be evicted
    once the watermark passes its ts + 1h, so state is O(events in the
    watermark horizon), not O(stream history) — the only shape a
    stream-stream join survives at 100 TB/day.

    ``how="left_outer"`` exercises the watermark-gated null emission:
    an unmatched purchase emits (click columns null) only once the
    watermark proves no matching click can still arrive.  Under an
    availableNow run the LAST horizon's unmatched rows legitimately stay
    pending (no later batch advances the watermark past them), so the
    outer pin asserts matched == batch inner + nulls ⊆ batch anti — the
    honest contract, pinned in tests/test_streaming.py.

    ``n_salt`` is the hot-key skew treatment (the streaming port of
    join_range_salted): a stateful stream-stream join shuffles on the
    join key with NO AQE skew-split available (micro-batch symmetric
    hash join state is keyed, not re-plannable), so a celebrity user
    concentrates one state-store partition.  With a salt, each purchase
    carries one deterministic salt (hash of its id mod n_salt) and the
    click side replicates across all n_salt values, so every qualifying
    pair still meets exactly once while the hot user's probe work and
    buffered click state spread over n_salt partitions — the standard
    replication-for-spread trade (state grows n_salt x on the SMALL
    side).  inner and left_outer only: a right/full outer would emit one
    spurious null row per extra replica of an unmatched click.

    Reference provenance: the reference has no stream-stream join at all
    (caches are its only cross-event state, caches.clj:27-101); this is
    part of the beyond-reference relational surface mandated for the
    engine."""
    joined = _join_interval_plan(
        spark, sf_dir, how, glob="events.parquet",
        max_files_per_trigger=max_files_per_trigger, n_salt=n_salt,
    )
    return _run_to_memory(joined, "append")


def _join_interval_plan(
    spark: SparkSession,
    sf_dir: str,
    how: str,
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
    n_salt: int | None = None,
) -> DataFrame:
    """The unstarted streaming plan of stream_join_interval — separated
    so tests can attach their own sink and read the state-store metrics
    off the running query (the bounded-state pin)."""
    if n_salt is not None and how not in ("inner", "left_outer"):
        raise ValueError(
            "n_salt supports inner/left_outer only: replicating the "
            "click side makes an unmatched click emit one spurious null "
            "row per replica under right/full outer"
        )
    left = stream_events(
        spark, sf_dir, glob=glob, max_files_per_trigger=max_files_per_trigger
    ).where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("p_event"),
        # watermarks need TIMESTAMP (with zone), not the source's NTZ
        F.col("ts").cast("timestamp").alias("p_ts"),
        F.col("value").alias("p_value"),
    ).withWatermark("p_ts", "1 hour")
    right = stream_events(
        spark, sf_dir, glob=glob, max_files_per_trigger=max_files_per_trigger
    ).where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("c_event"),
        F.col("ts").cast("timestamp").alias("c_ts"),
    ).withWatermark("c_ts", "1 hour")
    cond = (
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts"))
    )
    if n_salt is not None:
        # one deterministic salt per purchase; clicks replicate across
        # all salts (explode after the watermark: a stateless projection
        # that passes c_ts through, so eviction semantics are unchanged)
        left = left.withColumn(
            "p_salt", F.pmod(F.xxhash64("p_event"), F.lit(n_salt)).cast("int")
        )
        right = right.withColumn(
            "c_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
        )
        cond = cond & (F.col("p_salt") == F.col("c_salt"))
    return left.join(right, cond, how).select(
        "p_user", "p_event", "p_ts", "p_value", "c_event", "c_ts"
    )


def batch_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of stream_join_interval (the equality oracle)."""
    from streamsum_spark.tables import table

    ev = table(spark, sf_dir, "events")
    left = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("p_event"),
        F.col("ts").cast("timestamp").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    right = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("c_event"),
        F.col("ts").cast("timestamp").alias("c_ts"),
    )
    return left.join(
        right,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "inner",
    ).select("p_user", "p_event", "p_ts", "p_value", "c_event", "c_ts")


def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup on (user_id, event_type) within the watermark —
    dropDuplicatesWithinWatermark bounds state, unlike global
    dropDuplicates.  Emission picks the first-arriving row per key, which
    matches batch first-per-key only when arrival order == (ts, seq);
    file-source batches preserve file order, so it does here."""
    ev = stream_events(spark, sf_dir).withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).withWatermark("ts", "1 hour")
    dd = ev.dropDuplicatesWithinWatermark(["user_id", "event_type"]).select(
        "user_id", "event_type", "event_id", F.col("ts").cast("timestamp_ntz").alias("ts")
    )
    return _run_to_memory(dd, "append")


# -- stateful folds (the two non-Catalyst-native semantics, SURVEY.md §4.2) --

_CLAMP_OUT = T.StructType(
    [
        T.StructField("subject", T.StringType()),
        T.StructField("cnt", T.LongType()),
        T.StructField("latest_us", T.LongType()),
        T.StructField("n_seen", T.LongType()),  # monotone: identifies the
        # final emission per key when the memory sink holds one row per
        # micro-batch (update mode appends, it does not replace)
    ]
)
_CLAMP_STATE = T.StructType(
    [
        T.StructField("cnt", T.LongType()),
        T.StructField("latest_us", T.LongType()),
        T.StructField("has_inc", T.BooleanType()),
        T.StructField("n_seen", T.LongType()),
    ]
)


def _clamp_fold(
    key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Reference inc/dec fold (update.clj:44-91): inc -> cnt+1 and
    latest := max(latest, ts); dec -> cnt-1 clamped at 0, ts untouched."""
    if state.exists:
        cnt, latest_us, has_inc, n_seen = state.get
    else:
        cnt, latest_us, has_inc, n_seen = 0, None, False, 0
    # applyInPandasWithState delivers a key's rows as MULTIPLE Arrow chunks
    # with no cross-chunk order guarantee: materialize the whole batch and
    # sort ONCE, or the fold would apply ops out of (ts, seq) order for
    # groups larger than one Arrow batch.
    chunks = [pdf for pdf in pdf_iter if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "seq"])
        for op, ts in zip(pdf["op"], pdf["ts"]):
            us = int(pd.Timestamp(ts).value // 1000)
            n_seen += 1
            if op == "inc":
                cnt += 1
                has_inc = True
                latest_us = us if latest_us is None else max(latest_us, us)
            elif cnt > 0:
                cnt -= 1
    state.update((cnt, latest_us, has_inc, n_seen))
    if has_inc:
        yield pd.DataFrame(
            {"subject": [key[0]], "cnt": [cnt], "latest_us": [latest_us], "n_seen": [n_seen]}
        )


def stream_clamp_dec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 exact streaming form: per-subject applyInPandasWithState fold.
    Shares the batch count_cache_inc_dec oracle."""
    tuples = extract_events(stream_events(spark, sf_dir))
    ops = tuples.select(
        F.col("subj").alias("subject"),
        F.when(F.col("pred") == "error", F.lit("dec")).otherwise(F.lit("inc")).alias("op"),
        "ts",
        "seq",
    )
    folded = ops.groupBy("subject").applyInPandasWithState(
        _clamp_fold, _CLAMP_OUT, _CLAMP_STATE, "update", GroupStateTimeout.NoTimeout
    )
    mem = _run_to_memory(folded, "update")
    # update-mode memory sink keeps one row per key per micro-batch; the
    # final state is the emission with the largest n_seen
    mem = (
        mem.groupBy("subject")
        .agg(F.expr("max_by(struct(cnt, latest_us), n_seen)").alias("_s"))
        .select("subject", "_s.cnt", "_s.latest_us")
    )
    return mem.select(
        "subject",
        "cnt",
        F.expr("timestampadd(MICROSECOND, latest_us, TIMESTAMP_NTZ '1970-01-01 00:00:00')").alias(
            "latest_ts"
        ),
    )


def stream_clamp_dec_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 exact streaming form on the transformWithStateInPandas API —
    Spark 4's successor to applyInPandasWithState (SPARK-49479: arbitrary
    named state, timers, TTL, RocksDB-backed).  Same reference fold as
    _clamp_fold; kept alongside the applyInPandasWithState path so both
    stateful APIs stay covered while the ecosystem migrates.

    transformWithState requires the RocksDB state store provider — itself
    the 100 TB-relevant choice (state spills to disk instead of executor
    heap); the conf is set for this query and restored after.

    Availability gate: the API's driver-side state server speaks protobuf
    over a local socket; this container has no ``protobuf`` package, so
    the call raises a clear RuntimeError here and runs anywhere protobuf
    is installed (the equivalence test importorskips).  The
    applyInPandasWithState path (stream_clamp_dec) covers the same fold
    unconditionally."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError as exc:
        raise RuntimeError(
            "transformWithStateInPandas unavailable: its driver-side state "
            "server requires the 'protobuf' package, which is not installed; "
            "use stream_clamp_dec (applyInPandasWithState) instead"
        ) from exc
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _ClampProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("clamp", _CLAMP_STATE)

        def handleInputRows(self, key, rows, timer_values):  # noqa: ANN001
            st = self._state.get() if self._state.exists() else None
            cnt, latest_us, has_inc, n_seen = st if st else (0, None, False, 0)
            chunks = [pdf for pdf in rows if len(pdf)]
            if chunks:
                pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "seq"])
                for op, ts in zip(pdf["op"], pdf["ts"]):
                    us = int(pd.Timestamp(ts).value // 1000)
                    n_seen += 1
                    if op == "inc":
                        cnt += 1
                        has_inc = True
                        latest_us = us if latest_us is None else max(latest_us, us)
                    elif cnt > 0:
                        cnt -= 1
            self._state.update((cnt, latest_us, has_inc, n_seen))
            if has_inc:
                yield pd.DataFrame(
                    {
                        "subject": [key[0]],
                        "cnt": [cnt],
                        "latest_us": [latest_us],
                        "n_seen": [n_seen],
                    }
                )

        def close(self) -> None:
            pass

    tuples = extract_events(stream_events(spark, sf_dir))
    ops = tuples.select(
        F.col("subj").alias("subject"),
        F.when(F.col("pred") == "error", F.lit("dec")).otherwise(F.lit("inc")).alias("op"),
        "ts",
        "seq",
    )
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        folded = ops.groupBy("subject").transformWithStateInPandas(
            statefulProcessor=_ClampProcessor(),
            outputStructType=_CLAMP_OUT,
            outputMode="Update",
            timeMode="None",
        )
        mem = _run_to_memory(folded, "update")
        mem = (
            mem.groupBy("subject")
            .agg(F.expr("max_by(struct(cnt, latest_us), n_seen)").alias("_s"))
            .select("subject", "_s.cnt", "_s.latest_us")
        ).localCheckpoint()  # materialize before the provider conf reverts
    finally:
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)
    return mem.select(
        "subject",
        "cnt",
        F.expr("timestampadd(MICROSECOND, latest_us, TIMESTAMP_NTZ '1970-01-01 00:00:00')").alias(
            "latest_ts"
        ),
    )


_LASTN_OUT = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("v", T.StringType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("rn", T.IntegerType()),
        T.StructField("n_seen", T.LongType()),
    ]
)
_LASTN_STATE = T.StructType(
    [
        T.StructField("ts_us", T.ArrayType(T.LongType())),
        T.StructField("seqs", T.ArrayType(T.LongType())),
        T.StructField("vals", T.ArrayType(T.StringType())),
        T.StructField("n_seen", T.LongType()),
    ]
)

_LASTN_N = DEFAULT_CONFIG.lastn_buf_size


def _lastn_fold(
    key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """A6 exact ring buffer (caches.clj:51-75): append in arrival order,
    keep the newest N; emit rows (rn=1 newest) like the batch window form."""
    if state.exists:
        st = state.get
        ts_us, seqs, vals = list(st[0]), list(st[1]), list(st[2])
        n_seen = st[3]
    else:
        ts_us, seqs, vals, n_seen = [], [], [], 0
    # materialize + single sort: chunk-local sorts would misorder groups
    # that span Arrow batches (see _clamp_fold)
    chunks = [pdf for pdf in pdf_iter if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "seq"])
        for ts, seq, v in zip(pdf["ts"], pdf["seq"], pdf["v"]):
            ts_us.append(int(pd.Timestamp(ts).value // 1000))
            seqs.append(int(seq))
            vals.append(v)
            n_seen += 1
    # ring-buffer eviction: newest N by arrival order
    ts_us, seqs, vals = ts_us[-_LASTN_N:], seqs[-_LASTN_N:], vals[-_LASTN_N:]
    state.update((ts_us, seqs, vals, n_seen))
    n = len(vals)
    yield pd.DataFrame(
        {
            "k": [key[0]] * n,
            "v": vals,
            "ts_us": ts_us,
            "seq": seqs,
            "rn": list(range(n, 0, -1)),  # newest (last appended) gets rn=1
            "n_seen": [n_seen] * n,
        }
    )


def stream_lastn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 exact streaming form for the 'act-user-obj' cache; shares the
    batch lastn oracle."""
    fanned = transform_fanout(extract_events(stream_events(spark, sf_dir)), DEFAULT_CONFIG)
    routed = fanned.where(F.col("cache_key") == "act-user-obj").select("k", "v", "ts", "seq")
    folded = routed.groupBy("k").applyInPandasWithState(
        _lastn_fold, _LASTN_OUT, _LASTN_STATE, "update", GroupStateTimeout.NoTimeout
    )
    mem = _run_to_memory(folded, "update")
    # keep only each key's final emission (largest n_seen) — window form
    # avoids a self-join on the memory-sink plan
    from pyspark.sql import Window

    w = Window.partitionBy("k")
    mem = mem.withColumn("_max_seen", F.max("n_seen").over(w)).where(
        F.col("n_seen") == F.col("_max_seen")
    )
    return mem.select(
        "k",
        "v",
        F.expr("timestampadd(MICROSECOND, ts_us, TIMESTAMP_NTZ '1970-01-01 00:00:00')").alias("ts"),
        "seq",
        "rn",
    )


def stream_assoc_last_value(
    spark: SparkSession,
    sf_dir: str,
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """A5 as a streaming aggregation through the bounded-state path
    (update mode + foreachBatch MERGE); shares the batch assoc oracle.

    ``latest_ts`` alone is non-decreasing but NOT strictly monotone per
    key — two events for a key can share a ts (which is exactly why seq
    exists, SURVEY.md §4.2.3).  If such a tie spans micro-batches, a
    merge ordered by latest_ts alone falls through to the value-column
    tie-break and can keep the stale (lexically larger) value.  So the
    aggregation carries the winning event's seq and the merge orders by
    the composite (latest_ts, latest_seq), which IS strictly monotone per
    key; the seq is dropped from the returned view."""
    fanned = transform_fanout(
        extract_events(stream_events(spark, sf_dir, glob, max_files_per_trigger)),
        DEFAULT_CONFIG,
    )
    routed = fanned.where(F.col("cache_key") == "click-obj-user")
    agg = routed.groupBy("k").agg(
        F.expr("max_by(v, struct(ts, seq))").alias("v"),
        F.max("ts").alias("latest_ts"),
        F.expr("max_by(seq, struct(ts, seq))").alias("latest_seq"),
    )
    merged = _run_via_cache_table(
        agg, key_cols=["k"], order_col=["latest_ts", "latest_seq"]
    )
    return merged.select("k", "v", "latest_ts")


def stream_keycount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 as a streaming aggregation over its ROUTED tuple subset (the
    subject-counts cache is dispatched by cache_key like every other
    cache), through the bounded-state path; shares the batch keycount
    oracle."""
    from streamsum_spark.operators.caches import keycount

    fanned = transform_fanout(extract_events(stream_events(spark, sf_dir)), DEFAULT_CONFIG)
    agg = keycount(fanned.where(F.col("cache_key") == "subject-counts"))
    return _run_via_cache_table(agg, key_cols=["k"], order_col="cnt")


def stream_cache_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming cache layer in one declared result: assoc (A5),
    keycount (A9) and the exact lastn ring-buffer fold (A6) run as three
    availableNow streaming queries — the aggregations through the
    update-mode foreachBatch MERGE path, the lastn fold through
    applyInPandasWithState — and their final cache tables union-tagged into
    one relation.

    Shares the BATCH oracles of assoc_last_value / keycount_per_subject /
    lastn_per_key (null-padded union), so batch ≡ streaming equivalence for
    all three disciplines is enforced by the driver's hash check itself."""
    null_l = F.lit(None).cast("long")
    a = stream_assoc_last_value(spark, sf_dir).select(
        F.lit("assoc").alias("kind"),
        "k",
        "v",
        null_l.alias("cnt"),
        F.col("latest_ts").alias("ts"),
        null_l.alias("seq"),
        F.lit(None).cast("int").alias("rn"),
    )
    b = stream_keycount(spark, sf_dir).select(
        F.lit("keycount").alias("kind"),
        "k",
        F.lit(None).cast("string").alias("v"),
        "cnt",
        F.lit(None).cast("timestamp_ntz").alias("ts"),
        null_l.alias("seq"),
        F.lit(None).cast("int").alias("rn"),
    )
    c = stream_lastn(spark, sf_dir).select(
        F.lit("lastn").alias("kind"),
        "k",
        "v",
        null_l.alias("cnt"),
        "ts",
        "seq",
        "rn",
    )
    return a.unionByName(b).unionByName(c)


# -- streaming heavy hitters (sketch family's streaming twin) ----------------

_DOCS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def stream_documents(
    spark: SparkSession,
    sf_dir: str,
    glob: str = "documents.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over the documents corpus."""
    reader = spark.readStream.schema(_DOCS_RAW_SCHEMA).option("pathGlobFilter", glob)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(sf_dir)


_HH_OUT = T.StructType(
    [
        T.StructField("shard", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("keys", T.ArrayType(T.StringType())),
        T.StructField("weights", T.ArrayType(T.LongType())),
        T.StructField("batches", T.LongType()),
    ]
)
_HH_STATE = T.StructType(
    [
        T.StructField("keys", T.ArrayType(T.StringType())),
        T.StructField("weights", T.ArrayType(T.LongType())),
        T.StructField("n", T.LongType()),
        T.StructField("batches", T.LongType()),
    ]
)


def stream_heavy_hitters(
    spark: SparkSession,
    sf_dir: str,
    phi: float = 0.02,
    k: int | None = None,
    shards: int = 8,
    glob: str = "documents.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming phi-heavy hitters: the batch Misra–Gries two-pass
    (operators/sketches.py) with the sketch pass as BOUNDED STREAMING
    STATE — tokens shard by hash, each shard keeps <= ``k`` MG counters
    in applyInPandasWithState across micro-batches (state size is
    shards x k counters TOTAL, independent of vocabulary or stream
    length).

    Correctness composes exactly as in batch: a token's whole stream
    lands in one shard (hash routing), MG per shard never evicts a key
    with shard-local count > N_shard/(k+1), and a globally phi-heavy key
    is a fortiori shard-heavy — so the final candidate set is a superset
    of the true heavy set, and the exact verification pass (batch, over
    the static corpus) restores precision 1.0.  Pinned equal to
    heavy_hitters_exact across multi-batch splits in
    tests/test_streaming.py."""
    import math

    from streamsum_spark.entry_queries import _ensure_package_shipped
    from streamsum_spark.functions.expressions import TOKENS_EXPR
    from streamsum_spark.operators.sketches import _mg_reduce

    _ensure_package_shipped(spark)
    kk = k if k is not None else int(math.ceil(1.0 / phi))

    def fold(key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            keys, weights, n, batches = state.get
            counters = dict(zip(keys, weights))
        else:
            counters, n, batches = {}, 0, 0
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            n += len(pdf)
            counters = _mg_reduce(counters, pdf["t"].value_counts().to_dict(), kk)
        batches += 1
        state.update((list(counters.keys()), list(counters.values()), n, batches))
        yield pd.DataFrame(
            {
                "shard": [key[0]],
                "n": [n],
                "keys": [list(counters.keys())],
                "weights": [list(counters.values())],
                "batches": [batches],
            }
        )

    docs = stream_documents(spark, sf_dir, glob, max_files_per_trigger)
    toks = docs.select(F.explode(F.expr(TOKENS_EXPR)).alias("t"))
    sharded = toks.withColumn(
        "shard", F.pmod(F.xxhash64("t"), F.lit(shards)).cast("long")
    )
    folded = sharded.groupBy("shard").applyInPandasWithState(
        fold, _HH_OUT, _HH_STATE, "update", GroupStateTimeout.NoTimeout
    )
    mem = _run_to_memory(folded, "update")
    # final state per shard = the emission from its last micro-batch
    final = mem.groupBy("shard").agg(
        F.expr("max_by(struct(n, keys), batches)").alias("_s")
    )
    cands = final.select(F.explode("_s.keys").alias("t")).distinct()
    total = final.agg(F.sum("_s.n").cast("long").alias("total"))
    # exact verification over the static corpus, candidates only
    from streamsum_spark.operators.sketches import token_stream

    exact = (
        token_stream(spark, sf_dir)
        .join(F.broadcast(cands), "t")
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return (
        exact.join(F.broadcast(total))
        .where(F.col("cnt") >= F.lit(phi) * F.col("total"))
        .select("t", "cnt")
    )


# -- incremental text-index twins (round-2 text family, VERDICT item 5) ------


def stream_tfidf_top_terms(
    spark: SparkSession,
    sf_dir: str,
    k: int = 3,
    glob: str = "documents.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Incremental TF-IDF (streaming twin of text.tfidf_top_terms).

    The expensive per-document work — tokenize + per-(doc, term) counts —
    runs per micro-batch inside foreachBatch and SUM-merges into an
    additive tf cache table (sinks.stream_accumulate_counts), so the
    stream itself is stateless and per-batch cost is O(batch).  The
    corpus-GLOBAL quantities (n_docs, document frequencies, top-k
    scoring) are recomputed from the accumulated vocabulary-sized tf
    relation at read time — idf is inherently corpus-wide, so an
    incremental index maintains counts and derives scores on demand
    (same posture as a search engine's postings + query-time idf).
    Pinned equal to the batch operator across a 3-micro-batch split in
    tests/test_streaming.py."""
    from pyspark.sql import Window

    from streamsum_spark.functions.expressions import TOKENS_EXPR
    from streamsum_spark.sinks import stream_accumulate_counts

    docs = stream_documents(spark, sf_dir, glob, max_files_per_trigger)
    target = os.path.join(
        tempfile.gettempdir(), f"streamsum_tf_tbl_{uuid.uuid4().hex[:12]}"
    )

    def per_batch_tf(batch_df: DataFrame) -> DataFrame:
        return (
            batch_df.select("doc_id", F.explode(F.expr(TOKENS_EXPR)).alias("t"))
            .groupBy("doc_id", "t")
            .agg(F.count(F.lit(1)).alias("tf"))
        )

    stream_accumulate_counts(
        docs.select("doc_id", "text"), target, ["doc_id", "t"], ["tf"], per_batch_tf
    )
    tf = read_state_table(spark, target)
    n_docs = tf.select("doc_id").distinct().count()
    df_rel = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df_rel, "t").select(
        "doc_id",
        "t",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("t"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= k)
        .select("doc_id", "t", "tfidf", "rn")
    )


def stream_bigram_perplexity(
    spark: SparkSession,
    sf_dir: str,
    glob: str = "documents.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Incremental bigram-LM self-perplexity (streaming twin of
    text.bigram_perplexity).

    Per micro-batch: tokenize + per-(doc, w1, w2) gram counts, SUM-merged
    into one additive gram table — the single relation from which BOTH
    the LM (c12, c1, vocabulary) and the per-doc scoring derive, exactly
    as in batch.  LM counts accumulate across micro-batches (c12/c1 are
    sums over the merged table), so the final scores see the whole-corpus
    LM no matter how the stream was sliced; scoring weights each distinct
    gram by its in-doc count (algebraically identical to batch's
    per-instance avg).  Pinned equal to batch across a 3-micro-batch
    split in tests/test_streaming.py."""
    from streamsum_spark.functions.expressions import TOKENS_EXPR
    from streamsum_spark.sinks import stream_accumulate_counts

    docs = stream_documents(spark, sf_dir, glob, max_files_per_trigger)
    target = os.path.join(
        tempfile.gettempdir(), f"streamsum_gram_tbl_{uuid.uuid4().hex[:12]}"
    )

    def per_batch_grams(batch_df: DataFrame) -> DataFrame:
        return (
            batch_df.withColumn("_toks", F.expr(TOKENS_EXPR))
            .select(
                "doc_id",
                F.explode(
                    F.expr(
                        "CASE WHEN size(_toks) >= 2 THEN "
                        "transform(sequence(1, size(_toks) - 1), "
                        "i -> struct(_toks[i - 1] AS w1, _toks[i] AS w2)) "
                        "ELSE array() END"
                    )
                ).alias("g"),
            )
            .select("doc_id", "g.w1", "g.w2")
            .groupBy("doc_id", "w1", "w2")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    stream_accumulate_counts(
        docs.select("doc_id", "text"), target, ["doc_id", "w1", "w2"], ["c"], per_batch_grams
    )
    grams = read_state_table(spark, target)
    vocab = (
        grams.select(F.col("w1").alias("w"))
        .union(grams.select(F.col("w2").alias("w")))
        .distinct()
        .count()
    )
    big_c = grams.groupBy("w1", "w2").agg(F.sum("c").alias("c12"))
    uni_c = grams.groupBy("w1").agg(F.sum("c").alias("c1"))
    lm = big_c.join(uni_c, "w1").select(
        "w1",
        "w2",
        (F.log((F.col("c1") + F.lit(float(vocab))) / (F.col("c12") + 1.0))).alias("nll"),
    )
    return (
        grams.join(lm, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("c") * F.col("nll")) / F.sum("c"), 6).alias("avg_nll"))
    )


def stream_train_nb(
    spark: SparkSession,
    sf_dir: str,
    label_col: str = "lang",
    glob: str = "documents.parquet",
    max_files_per_trigger: int | None = None,
    n_buckets: int = 1 << 18,
    alpha: float = 1.0,
    bigrams: bool = True,
):
    """Incremental classifier training (streaming twin of
    classifier.train_nb) — the online form a production quality filter
    runs as labeled data arrives.

    NB's sufficient statistics are additive counts (feature occurrences
    per (label, bucket), documents per label under the −1 sentinel
    bucket — classifier.batch_count_rows), so training streams through
    the SAME keyed sum-merge path as the tf/gram/minhash twins: per-
    batch work is one hashed-feature explode over the batch, state is
    the ≤ labels × (n_buckets + 1)-row count table, and the model
    materializes on demand from the accumulated relation.  Additivity
    makes the result slicing-invariant — pinned equal (priors, totals,
    pivoted counts, scores) to the batch trainer across a 3-micro-batch
    split in tests/test_classifier.py.  Returns the NBModel."""
    from streamsum_spark.operators.classifier import (
        batch_count_rows,
        model_from_count_rows,
    )
    from streamsum_spark.sinks import stream_accumulate_counts

    docs = stream_documents(spark, sf_dir, glob, max_files_per_trigger)
    target = os.path.join(
        tempfile.gettempdir(), f"streamsum_nb_tbl_{uuid.uuid4().hex[:12]}"
    )

    def per_batch(batch_df: DataFrame) -> DataFrame:
        return batch_count_rows(
            batch_df, label_col=label_col, n_buckets=n_buckets, bigrams=bigrams
        )

    stream_accumulate_counts(
        docs.select(label_col, "text"), target, ["label", "bucket"], ["cnt"], per_batch
    )
    return model_from_count_rows(
        read_state_table(spark, target).select("label", "bucket", "cnt"),
        n_buckets=n_buckets,
        alpha=alpha,
        bigrams=bigrams,
    )


def stream_minhash_signatures(
    spark: SparkSession,
    sf_dir: str,
    glob: str = "documents.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Incremental MinHash signature maintenance (streaming twin of
    dedup.minhash_signatures).

    min() over shingle hashes is commutative, associative and idempotent,
    so signatures merge across micro-batches by keyed MIN — the same
    additive-cache-table path as the tf/gram twins with combine="min".
    This also handles documents ARRIVING IN PIECES (the same doc_id in
    later micro-batches, e.g. an appended page): the merged signature
    equals the batch signature over the union of the pieces' shingle
    sets, pinned in tests/test_streaming.py.  Per-batch work is one
    shingle explode + md5 + 16 min aggregates over the batch only; state
    is the signature table itself (16 longs per doc)."""
    from streamsum_spark.operators.dedup import _SHINGLES_T, _signatures_from, _TOKS
    from streamsum_spark.sinks import stream_accumulate_counts

    docs = stream_documents(spark, sf_dir, glob, max_files_per_trigger)
    target = os.path.join(
        tempfile.gettempdir(), f"streamsum_mh_tbl_{uuid.uuid4().hex[:12]}"
    )

    def per_batch_sigs(batch_df: DataFrame) -> DataFrame:
        sh = batch_df.withColumn("_toks", F.expr(_TOKS)).select(
            "doc_id", F.expr(f"array_distinct({_SHINGLES_T})").alias("sh")
        )
        return _signatures_from(sh)

    stream_accumulate_counts(
        docs.select("doc_id", "text"),
        target,
        ["doc_id", "band"],
        ["mh"],
        per_batch_sigs,
        combine="min",
    )
    return read_state_table(spark, target).select("doc_id", "band", "mh")


def stream_cm_sketch(
    spark: SparkSession,
    sf_dir: str,
    depth: int = 4,
    width: int = 1024,
    glob: str = "documents.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Incremental Count-Min maintenance: per-micro-batch sketches summed
    cell-wise into the cache table — Count-Min is a linear sketch, so
    sketch(A ∪ B) = sketch(A) + sketch(B) exactly, and the additive sink
    IS the merge operator.  Pinned equal to the batch sketch over a
    3-micro-batch split in tests/test_sketches.py."""
    from streamsum_spark.functions.expressions import TOKENS_EXPR
    from streamsum_spark.operators.sketches import cm_sketch
    from streamsum_spark.sinks import stream_accumulate_counts

    docs = stream_documents(spark, sf_dir, glob, max_files_per_trigger)
    target = os.path.join(
        tempfile.gettempdir(), f"streamsum_cm_tbl_{uuid.uuid4().hex[:12]}"
    )

    def per_batch(batch_df: DataFrame) -> DataFrame:
        toks = batch_df.select(F.explode(F.expr(TOKENS_EXPR)).alias("t"))
        return cm_sketch(spark, sf_dir, depth, width, tokens=toks)

    stream_accumulate_counts(
        docs.select("doc_id", "text"), target, ["d", "bucket"], ["cnt"], per_batch
    )
    return read_state_table(spark, target).select("d", "bucket", "cnt")


def stream_log_histogram(
    spark: SparkSession,
    sf_dir: str,
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Incremental quantile-summary maintenance: per-micro-batch
    log-histogram relations sum per (event_type, bin) into the additive
    cache table — the histogram is a linear sketch like Count-Min, so
    the additive sink IS the merge.  Pinned equal to the batch sketch
    over a micro-batched run in tests/test_sketches.py."""
    from streamsum_spark.sinks import stream_accumulate_counts

    ev = stream_events(spark, sf_dir, glob, max_files_per_trigger)
    target = os.path.join(
        tempfile.gettempdir(), f"streamsum_hist_tbl_{uuid.uuid4().hex[:12]}"
    )

    def per_batch(batch_df: DataFrame) -> DataFrame:
        return (
            batch_df.select(
                "event_type",
                F.expr("length(bin(CAST(value * 1000 AS BIGINT)))").alias("bin"),
            )
            .groupBy("event_type", "bin")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )

    stream_accumulate_counts(ev, target, ["event_type", "bin"], ["n"], per_batch)
    return read_state_table(spark, target).select("event_type", "bin", "n")


def stream_bloom_filter(
    spark: SparkSession,
    sf_dir: str,
    glob: str = "documents.parquet",
    max_files_per_trigger: int | None = None,
    m_bits: int | None = None,
    k: int | None = None,
) -> DataFrame:
    """Incremental exclusion-filter maintenance: per-micro-batch Bloom
    words bit_or-merged into the cache table.  Bloom is a monotone
    bitmap sketch — filter(A ∪ B) = bit_or(filter(A), filter(B))
    exactly — so the additive sink with combine='bit_or' IS the merge
    operator (stream_cm_sketch's shape, bitwise).  This keeps a
    corpus-exclusion filter current as the corpus ingests, without
    re-hashing history.  Pinned equal to the one-shot bloom_build over a
    3-micro-batch split in tests/test_sketches.py."""
    from streamsum_spark.operators.sketches import BLOOM_K, BLOOM_M, bloom_build
    from streamsum_spark.sinks import stream_accumulate_counts

    m_bits = BLOOM_M if m_bits is None else m_bits
    k = BLOOM_K if k is None else k
    docs = stream_documents(spark, sf_dir, glob, max_files_per_trigger)
    target = os.path.join(
        tempfile.gettempdir(), f"streamsum_bloom_tbl_{uuid.uuid4().hex[:12]}"
    )

    def per_batch(batch_df: DataFrame) -> DataFrame:
        keys = (
            batch_df.where(F.col("text").isNotNull())
            .select(F.md5("text").alias("key"))
            .distinct()
        )
        return bloom_build(spark, sf_dir, keys=keys, m_bits=m_bits, k=k)

    stream_accumulate_counts(
        docs.select("doc_id", "text"), target, ["word"], ["bits"], per_batch,
        combine="bit_or",
    )
    return read_state_table(spark, target).select("word", "bits")


def stream_near_dup_pairs(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.2,
    glob: str = "documents.parquet",
    max_files_per_trigger: int | None = None,
    n_buckets: int = 16,
    state_layer: str = "swap",
    state_base: str | None = None,
    checkpoint: str | None = None,
) -> DataFrame:
    """Incremental near-duplicate detection — the streaming twin of
    dedup.near_dup_verified, and the shape a continuously-ingesting
    100 TB corpus actually runs:

    per micro-batch, NEW docs' signatures equi-join on (band, mh)
    against the ACCUMULATED signature store (new-vs-old) and themselves
    (new-vs-new); candidates verify with exact Jaccard against the
    accumulated shingle store; verified pairs upsert into the pair
    table.  Old-vs-old pairs are never recomputed, so candidate
    GENERATION is |batch| x (bucket collisions); state MAINTENANCE is
    bounded — the three state tables are hash-bucketed (n_buckets=16
    here; scale with corpus in production), so each merge reads and
    rewrites only the buckets the batch's keys hash into, not the whole
    accumulated store (bounded-rewrite pinned in
    tests/test_sinks.py::test_bucketed_upsert_rewrites_only_touched_buckets).

    The READ side is bucket-pruned too — per-batch IO is O(touched
    buckets), never O(accumulated corpus):

    - the signature store is keyed ``(band, mh, doc_id)`` and bucketed
      on ``(band, mh)`` — the LSH collision key — so the new-vs-old
      candidate join reads only the signature buckets the batch's
      (band, mh) pairs hash into (read_touched_buckets; the
      partitioned-by-band production layout, generalized to hash
      buckets over the full collision key).  Docs are immutable in the
      corpus-ingest model, so the widened key is still idempotent on
      redelivery (the same (band, mh, doc_id) row upserts onto itself).
    - the Jaccard verify fetches ONLY the candidate doc_ids' shingle
      rows from the touched shingle buckets, not the whole store; the
      candidate id set is batch-sized by construction (|batch| x capped
      bucket collisions).

    ``n_buckets`` is the knob that makes "touched buckets" a real bound:
    a read prunes to ~(batch's distinct routed keys / n_buckets) of the
    store, so size n_buckets well above the per-batch key cardinality of
    the table's access path — the shingle fetch routes ~|candidates|
    doc_ids (small), the signature fetch routes ~16x|batch| (band, mh)
    pairs (large).  BULK ingest (batch keys >= n_buckets) touches every
    bucket and the read legitimately scans the store — exactly what an
    LSH join over the full corpus costs; the pruning pays in the
    trickle/point regime (measured in SURVEY §2.F round-6 stress).

    All three state tables maintain themselves through the KEYED upsert
    sink (idempotent by construction, so micro-batch replays are safe
    without the epoch manifest).  Batches are assumed to carry whole
    documents (the standard ingest unit); piece-wise docs belong to
    stream_minhash_signatures' min-merge, which this store could adopt
    wholesale if needed.  Pinned equal to the batch pipeline's pair set
    over a 3-micro-batch split, with the per-batch state reads pinned
    bounded to touched buckets, in tests/test_streaming.py.

    ``state_layer`` selects the state-table implementation: ``"swap"``
    (default) uses the rename-aside bucketed sink (sinks.py);
    ``"snapshot"`` runs the SAME three stores on snapshot-manifest
    tables (snapshots.py) — identical pruned-read/upsert semantics, but
    every multi-bucket merge commits atomically in one pointer swap and
    concurrent readers (e.g. a dashboard tailing the pair table while
    ingest runs) are never torn.  Pinned to produce the identical pair
    set in tests/test_streaming.py.

    ``state_base``/``checkpoint``: explicit state-table prefix and
    checkpoint dir (default: fresh temp dirs).  Passing the SAME pair
    across calls makes the ingest restartable — the file source's
    checkpoint log skips already-seen files, so a second call processes
    only files that appeared since, against the accumulated state: the
    steady-state marginal-batch shape a production ingest runs."""
    from streamsum_spark.operators.dedup import _SHINGLES_T, _TOKS, _signatures_from

    if state_layer == "snapshot":
        from streamsum_spark import snapshots

        def _exists(p):
            return snapshots._latest_version(p) is not None

        def _touched(p, keys_df, exclude_epoch=None):
            # snapshot commits are atomic per store and the upserts are
            # keyed merges, so replays repair without epoch exclusion
            return snapshots.read_touched_snapshot_buckets(spark, p, keys_df)

        def _mark_epoch(p, epoch_id):
            return None

        def _upsert(p, df, key_cols, order_col, bucket_cols=None, epoch_id=0):
            snapshots.snapshot_upsert(
                spark, p, df, key_cols, order_col,
                n_buckets=n_buckets, bucket_cols=bucket_cols,
            )

        def _read_final(p):
            return snapshots.read_snapshot(spark, p)

    elif state_layer == "swap":
        from streamsum_spark.sinks import (
            append_batch,
            mark_epoch_complete,
            read_touched_buckets,
        )

        _exists = os.path.exists

        def _touched(p, keys_df, exclude_epoch=None):
            return read_touched_buckets(
                spark, p, keys_df, exclude_epoch=exclude_epoch
            )

        def _mark_epoch(p, epoch_id):
            mark_epoch_complete(p, epoch_id)

        def _upsert(p, df, key_cols, order_col, bucket_cols=None, epoch_id=0):
            # all three stores are ADD-ONLY under the immutable-document
            # ingest model (a doc's signature/shingle rows are written in
            # its own batch exactly once; a pair needs a NEW endpoint, so
            # it can only be discovered in one batch): append the batch's
            # rows as epoch-named files instead of read-merge-rewriting
            # the accumulated buckets — per-batch write cost becomes
            # O(|batch|) instead of O(touched-bucket rows), which at
            # steady state is the difference between appending a shard
            # and rewriting the store.  Epoch-named files keep replayed
            # micro-batches idempotent (same rows, same file names).
            append_batch(
                spark, p, df, key_cols, epoch_id=epoch_id,
                n_buckets=n_buckets, bucket_cols=bucket_cols,
            )

        def _read_final(p):
            return read_state_table(spark, p)

    else:
        raise ValueError(f"unknown state_layer {state_layer!r} (swap|snapshot)")

    base = state_base or os.path.join(
        tempfile.gettempdir(), f"streamsum_ndup_{uuid.uuid4().hex[:12]}"
    )
    sig_tbl, sh_tbl, pair_tbl = base + "_sig", base + "_sh", base + "_pairs"

    def on_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # within-batch duplicate deliveries collapse here (the append
        # write path is add-only, so the dedup the keyed upsert used to
        # provide moves to the batch side, where it is batch-sized)
        b_sh = (
            batch_df.withColumn("_toks", F.expr(_TOKS))
            .select("doc_id", F.expr(f"array_distinct({_SHINGLES_T})").alias("sh"))
            .dropDuplicates(["doc_id"])
            .localCheckpoint(eager=False)
        )
        b_sig = _signatures_from(b_sh).localCheckpoint(eager=False)
        # ONE materializing scan pins both checkpoints (b_sh computes
        # inside b_sig's lineage) AND buys the join-strategy choice —
        # the two eager checkpoints spent two extra scheduling rounds
        n_b_sig = b_sig.count()

        def _bc(df: DataFrame) -> DataFrame:
            # broadcast hint for a batch-sized relation (_NDUP_BC_ROWS)
            return F.broadcast(df) if n_b_sig <= _NDUP_BC_ROWS else df

        if _exists(sig_tbl):
            # pruned read: only the signature buckets this batch's
            # (band, mh) pairs hash into — not the whole store.  The
            # current epoch's own UNCOMMITTED files are hidden (swap
            # layer) so a replayed batch probes the same pre-epoch
            # state the crashed attempt saw — see mark_epoch_complete
            old_sig = _touched(
                sig_tbl, b_sig.select("band", "mh"), exclude_epoch=epoch_id
            )
            # a doc redelivered in a LATER micro-batch meets its own
            # stored signature rows on (band, mh, doc_id): its rows are
            # already in every store and its pairs were found in its
            # first batch, so drop it from the batch outright — the
            # add-only append stays exactly-once per doc and no stored
            # pair is re-derived.  The probe rides the same pruned
            # bucket files the candidate join reads.
            seen = (
                b_sig.join(old_sig, ["band", "mh", "doc_id"], "left_semi")
                .select("doc_id")
                .distinct()
            )
            # steady state this is EMPTY (no redelivery): a driver-local
            # copy turns every consumer's broadcast anti-join into a
            # literal predicate (empty set: no filter at all) instead
            # of a per-action broadcast rebuild.  driver_local's bounded
            # probe IS the materializing action (the old eager
            # checkpoint + collect paid two); an over-bound redelivery
            # storm recomputes the pruned probe per consumer, still
            # bucket-pruned batch-sized work
            seen = driver_local(seen)
            bc_seen = n_b_sig <= _NDUP_BC_ROWS
            b_sig = filter_by_ids(
                b_sig, "doc_id", seen, anti=True, hint_broadcast=bc_seen
            )
            b_sh = filter_by_ids(
                b_sh, "doc_id", seen, anti=True, hint_broadcast=bc_seen
            )
        new_new = (
            b_sig.alias("a")
            .join(_bc(b_sig).alias("b"), ["band", "mh"])
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        )
        cands = new_new
        if _exists(sig_tbl):
            # the BATCH side is the broadcast side, so the store-wide
            # side never shuffles
            new_old = (
                _bc(b_sig).alias("a")
                .join(old_sig.alias("b"), ["band", "mh"])
                .select(
                    F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
                    F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_b"),
                )
                # self-collisions of a just-dropped redelivered doc are
                # gone with the doc; keep the guard for the degenerate
                # same-id case all the same
                .where(F.col("doc_a") != F.col("doc_b"))
            )
            cands = cands.unionByName(new_old)
        # lazy: the verify action (the pair upsert's probe — a full
        # scan, never a bounded limit) materializes the candidate set
        # once; all later consumers read blocks
        cands = cands.distinct().localCheckpoint(eager=False)
        all_sh = b_sh
        if _exists(sh_tbl):
            # candidate ids not in this batch: their shingles live in the
            # store — fetch only those rows from their touched buckets
            need = (
                cands.select(F.col("doc_a").alias("doc_id"))
                .unionByName(cands.select(F.col("doc_b").alias("doc_id")))
                .distinct()
                .join(_bc(b_sh.select("doc_id")), "doc_id", "left_anti")
            )
            stored_sh = _touched(sh_tbl, need).join(
                _bc(need), "doc_id", "left_semi"
            )
            all_sh = stored_sh.unionByName(b_sh)
        # candidate pairs (two longs per row) broadcast; the
        # shingle-array side — the heavy one — never shuffles
        verified = (
            _bc(cands)
            .join(all_sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
            .join(all_sh.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
            .select(
                "doc_a",
                "doc_b",
                F.expr("size(array_intersect(sa.sh, sb.sh))").alias("_i"),
                F.expr("size(sa.sh) + size(sb.sh)").alias("_n"),
            )
            .select(
                "doc_a",
                "doc_b",
                (F.col("_i").cast("double") / (F.col("_n") - F.col("_i"))).alias("jaccard"),
            )
            .where(F.col("jaccard") >= threshold)
        )
        expl = os.environ.get("STREAMSUM_NDUP_EXPLAIN_TO")
        if expl:
            # evidence tap (plan-capture scripts only): the micro-batch
            # verify plan, where the broadcast-hint work shows up
            with open(expl, "a") as fh:
                fh.write(f"==== epoch {epoch_id} verified ====\n")
                fh.write(
                    verified._sc._jvm.PythonSQLUtils.explainString(
                        verified._jdf.queryExecution(), "formatted"
                    )
                )
        # write order is a commit protocol: the SIG store — the one the
        # seen-probe reads — goes LAST, then its epoch marker.  A crash
        # at any earlier point leaves the marker absent, so the replay
        # probes pre-epoch state, recomputes the identical batch, and
        # overwrites every store's epoch files; once the marker lands,
        # a redelivered epoch reads itself as seen and no-ops.  The
        # pair and shingle writes are mutually unordered (disjoint
        # stores, both pre-marker), so they overlap on driver threads
        # (guide §2.6) — only the sig write + marker must come after.
        from streamsum_spark.corpus_prep import _parallel_jobs

        _parallel_jobs(
            lambda: _upsert(
                pair_tbl, verified, ["doc_a", "doc_b"], "jaccard",
                epoch_id=epoch_id,
            ),
            lambda: _upsert(
                sh_tbl, b_sh.select("doc_id", "sh"), ["doc_id"], "doc_id",
                epoch_id=epoch_id,
            ),
        )
        _upsert(
            sig_tbl, b_sig, ["band", "mh", "doc_id"], "doc_id",
            bucket_cols=["band", "mh"], epoch_id=epoch_id,
        )
        _mark_epoch(sig_tbl, epoch_id)

    docs = stream_documents(spark, sf_dir, glob, max_files_per_trigger)
    ckpt = checkpoint or os.path.join(
        tempfile.gettempdir(), f"streamsum_ndup_ckpt_{uuid.uuid4().hex[:10]}"
    )
    q = (
        docs.select("doc_id", "text")
        .writeStream.foreachBatch(on_batch)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return _read_final(pair_tbl).select("doc_a", "doc_b", "jaccard")


def stream_dedup_corpus(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.2,
    glob: str = "documents.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """End-to-end incremental corpus dedup: the streaming pair detector
    (stream_near_dup_pairs) feeds connected components + keep-list
    resolution at READ time — pairs accrete incrementally; the
    logarithmic-round star CC over the (tiny relative to the corpus)
    pair table is the only recomputed piece, exactly how a production
    run resolves clusters on a schedule over its accumulated pair log.
    Returns the surviving documents, pinned equal to batch dedup_corpus
    over a 3-micro-batch split."""
    from streamsum_spark.operators.clusters import connected_components
    from streamsum_spark.sinks import stream_to_cache_table

    pairs = stream_near_dup_pairs(
        spark,
        sf_dir,
        threshold=threshold,
        glob=glob,
        max_files_per_trigger=max_files_per_trigger,
    )
    comp = connected_components(pairs)
    drops = comp.where(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id")
    )
    docs = stream_documents(spark, sf_dir, glob, max_files_per_trigger)
    # the corpus itself also arrived by stream: land it in a keyed
    # parquet cache table (bucketed upsert, executor-side IO), NOT a
    # memory sink — the memory sink materializes every row on the
    # driver, which at corpus cardinality is a scale-killer even for
    # narrow columns.  At scale this table IS the ingested corpus.
    corpus_tbl = os.path.join(
        tempfile.gettempdir(), f"streamsum_dedup_corpus_{uuid.uuid4().hex[:12]}"
    )
    stream_to_cache_table(
        docs.select("doc_id", "lang", "source"), corpus_tbl, ["doc_id"], "doc_id"
    )
    corpus = read_state_table(spark, corpus_tbl)
    # no broadcast hint on the drop-list: it is O(corpus) on a
    # duplicate-heavy stream (the 10x stress corpus is 90% dups, so the
    # drop-list IS 90% of doc_ids) — let AQE choose the join strategy.
    return corpus.join(drops, "doc_id", "left_anti")


def stream_duplicate_spans(
    spark: SparkSession,
    sf_dir: str,
    n: int | None = None,
    glob: str = "documents.parquet",
    max_files_per_trigger: int | None = None,
    n_buckets: int = 16,
    state_base: str | None = None,
    checkpoint: str | None = None,
) -> DataFrame:
    """Incremental exact-substring dedup — the streaming twin of
    dedup.duplicate_ngram_spans, on the stream_near_dup_pairs state
    recipe: a continuously-ingesting corpus flags repeated n-token
    passages against everything already seen without rescanning it.

    Per micro-batch: the batch's (doc_id, start, md5(window)) relation
    ranks within itself (intra-batch duplicates flag immediately), then
    the batch-first occurrence of each fingerprint probes the
    accumulated FIRST-OCCURRENCE store — a hash-bucketed table keyed by
    fingerprint, so the probe reads only the buckets the batch's
    fingerprints hash into (read_touched_buckets), never the
    accumulated corpus.  A collision with a DIFFERENT document's stored
    occurrence flags the batch occurrence; a collision with the SAME
    (doc_id, start) is a file-source redelivery and is ignored
    (idempotence pinned in tests/test_stream_spans.py).  Flagged spans
    upsert (idempotent key (doc_id, start)); the store min-merges via
    the negated (doc_id, start) order key, so it converges to the
    globally-smallest occurrence even under out-of-order arrival.

    Semantics vs the batch op: identical flag set when slices arrive in
    doc_id order (pinned over a 3-slice ordered split); under
    out-of-order arrival the stream keeps the FIRST-ARRIVED copy where
    batch keeps the smallest (doc_id, start) — exactly what "keep the
    copy we already ingested" means for a production corpus.

    ``state_base``/``checkpoint`` make the ingest restartable, same
    contract as stream_near_dup_pairs."""
    from streamsum_spark.operators.dedup import SPAN_N, _TOKS
    from streamsum_spark.functions.expressions import shingles_expr
    from streamsum_spark.sinks import read_touched_buckets, upsert_batch

    if n is None:
        n = SPAN_N
    base = state_base or os.path.join(
        tempfile.gettempdir(), f"streamsum_spans_{uuid.uuid4().hex[:12]}"
    )
    fp_tbl, span_tbl = base + "_fp", base + "_spans"
    grams = shingles_expr(n, "_toks")

    def on_batch(batch_df: DataFrame, epoch_id: int) -> None:
        from pyspark.sql import Window

        wins = (
            batch_df.select("doc_id", F.expr(_TOKS).alias("_toks"))
            .select(
                "doc_id",
                F.expr(
                    f"explode(transform({grams}, (g, i) -> "
                    "struct(i + 1 AS start, md5(g) AS g)))"
                ).alias("w"),
            )
            .select(
                "doc_id",
                F.col("w.start").cast("long").alias("start"),
                F.col("w.g").alias("g"),
            )
            .localCheckpoint()
        )
        byg = Window.partitionBy("g").orderBy("doc_id", "start")
        ranked = wins.withColumn("rn", F.row_number().over(byg))
        flagged = ranked.where(F.col("rn") > 1).select("doc_id", "start", "g")
        firsts = ranked.where(F.col("rn") == 1).select("doc_id", "start", "g")
        if os.path.exists(fp_tbl):
            stored = read_touched_buckets(spark, fp_tbl, firsts.select("g"))
            joined = (
                firsts.alias("b")
                .join(stored.alias("s"), "g")
                # same (doc_id, start) = redelivery of the stored first:
                # not a duplicate of itself
                .where(
                    (F.col("b.doc_id") != F.col("s.doc_id"))
                    | (F.col("b.start") != F.col("s.start"))
                )
            )
            # flag the LOSER of the (doc_id, start) order: with
            # out-of-order arrival the stored occurrence may sort AFTER
            # the batch copy — then the batch copy is the new global
            # first (the store min-merges toward it below) and the
            # STORED occurrence gets the flag, matching the batch
            # operator's keep-globally-first semantics
            b_first = (F.col("b.doc_id") < F.col("s.doc_id")) | (
                (F.col("b.doc_id") == F.col("s.doc_id"))
                & (F.col("b.start") < F.col("s.start"))
            )
            extra = joined.select(
                F.when(b_first, F.col("s.doc_id"))
                .otherwise(F.col("b.doc_id"))
                .alias("doc_id"),
                F.when(b_first, F.col("s.start"))
                .otherwise(F.col("b.start"))
                .alias("start"),
                "g",
            )
            flagged = flagged.unionByName(extra)
        flagged = flagged.localCheckpoint()
        upsert_batch(
            spark,
            span_tbl,
            flagged.select("doc_id", "start", F.col("g").alias("gram_md5")),
            ["doc_id", "start"],
            "gram_md5",
            n_buckets=n_buckets,
        )
        # store the batch's first occurrences; the negated order key
        # makes newest-wins keep the SMALLEST (doc_id, start) per g
        upsert_batch(
            spark,
            fp_tbl,
            firsts.select(
                "g", "doc_id", "start",
                (-F.col("doc_id")).alias("_nd"), (-F.col("start")).alias("_ns"),
            ),
            ["g"],
            ["_nd", "_ns"],
            n_buckets=n_buckets,
        )

    docs = stream_documents(spark, sf_dir, glob, max_files_per_trigger)
    # derived from the state base so a re-invocation against the same
    # state resumes the file-source position instead of replaying (a
    # replay would re-collide every stored first and double-flag)
    ckpt = checkpoint or base + "_ckpt"
    q = (
        docs.select("doc_id", "text")
        .writeStream.foreachBatch(on_batch)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.exists(span_tbl):
        return spark.createDataFrame(
            [], "doc_id long, start long, gram_md5 string"
        )
    return read_state_table(spark, span_tbl).select("doc_id", "start", "gram_md5")


def stream_dedup_paragraphs(
    spark: SparkSession,
    sf_dir: str,
    glob: str = "documents.parquet",
    max_files_per_trigger: int | None = None,
    n_buckets: int = 16,
    state_base: str | None = None,
    checkpoint: str | None = None,
) -> DataFrame:
    """Incremental paragraph dedup — the streaming twin of
    dedup.dedup_paragraphs, on the stream_duplicate_spans state recipe
    at paragraph granularity: a continuously-ingesting corpus drops
    boilerplate paragraphs already seen in everything ingested so far
    without rescanning it.

    Per micro-batch: the batch's (doc_id, idx, md5(para)) relation
    (blank paragraphs excluded — they are structure, exempt from
    dedup) ranks within itself, the batch-first occurrence of each
    fingerprint probes the accumulated FIRST-OCCURRENCE store with
    bucket-pruned reads, collisions with a different stored occurrence
    flag the batch copy (same (doc_id, idx) = file-source redelivery,
    ignored), flags upsert idempotently, and the store min-merges via
    negated order keys.  Returns the accumulated FLAG relation
    (doc_id, idx, p_md5); compose with
    dedup.strip_flagged_paragraphs(docs, flags) for rebuilt text —
    pinned equal to the batch operator's text_clean across an ordered
    3-slice split in tests/test_dedup_families.py."""
    from streamsum_spark.sinks import read_touched_buckets, upsert_batch

    base = state_base or os.path.join(
        tempfile.gettempdir(), f"streamsum_paras_{uuid.uuid4().hex[:12]}"
    )
    fp_tbl, flag_tbl = base + "_fp", base + "_flags"

    def on_batch(batch_df: DataFrame, epoch_id: int) -> None:
        from pyspark.sql import Window

        paras = (
            batch_df.select(
                "doc_id",
                F.posexplode(F.split(F.col("text"), "\n")).alias("idx", "para"),
            )
            .where(F.trim(F.col("para")) != "")
            .select(
                "doc_id",
                F.col("idx").cast("long").alias("idx"),
                F.md5(F.col("para")).alias("g"),
            )
            .localCheckpoint()
        )
        byg = Window.partitionBy("g").orderBy("doc_id", "idx")
        ranked = paras.withColumn("rn", F.row_number().over(byg))
        flagged = ranked.where(F.col("rn") > 1).select("doc_id", "idx", "g")
        firsts = ranked.where(F.col("rn") == 1).select("doc_id", "idx", "g")
        if os.path.exists(fp_tbl):
            stored = read_touched_buckets(spark, fp_tbl, firsts.select("g"))
            joined = (
                firsts.alias("b")
                .join(stored.alias("s"), "g")
                .where(
                    (F.col("b.doc_id") != F.col("s.doc_id"))
                    | (F.col("b.idx") != F.col("s.idx"))
                )
            )
            # flag the LOSER of the (doc_id, idx) order (see
            # stream_duplicate_spans): a late-arriving globally-first
            # copy flags the STORED occurrence and is kept, so the flag
            # set converges to the batch operator's keep-globally-first
            # under any arrival order
            b_first = (F.col("b.doc_id") < F.col("s.doc_id")) | (
                (F.col("b.doc_id") == F.col("s.doc_id"))
                & (F.col("b.idx") < F.col("s.idx"))
            )
            extra = joined.select(
                F.when(b_first, F.col("s.doc_id"))
                .otherwise(F.col("b.doc_id"))
                .alias("doc_id"),
                F.when(b_first, F.col("s.idx"))
                .otherwise(F.col("b.idx"))
                .alias("idx"),
                "g",
            )
            flagged = flagged.unionByName(extra)
        flagged = flagged.localCheckpoint()
        upsert_batch(
            spark,
            flag_tbl,
            flagged.select("doc_id", "idx", F.col("g").alias("p_md5")),
            ["doc_id", "idx"],
            "p_md5",
            n_buckets=n_buckets,
        )
        upsert_batch(
            spark,
            fp_tbl,
            firsts.select(
                "g", "doc_id", "idx",
                (-F.col("doc_id")).alias("_nd"), (-F.col("idx")).alias("_ni"),
            ),
            ["g"],
            ["_nd", "_ni"],
            n_buckets=n_buckets,
        )

    docs = stream_documents(spark, sf_dir, glob, max_files_per_trigger)
    # same checkpoint derivation as stream_duplicate_spans: resume,
    # don't replay, when re-invoked with the same state_base
    ckpt = checkpoint or base + "_ckpt"
    q = (
        docs.select("doc_id", "text")
        .writeStream.foreachBatch(on_batch)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.exists(flag_tbl):
        return spark.createDataFrame([], "doc_id long, idx long, p_md5 string")
    return read_state_table(spark, flag_tbl).select("doc_id", "idx", "p_md5")


def _url_dedup_batch(
    spark: SparkSession,
    rows: DataFrame,
    fp_tbl: str,
    flag_tbl: str,
    n_buckets: int,
    bc_batch: bool = False,
) -> None:
    """One micro-batch of the canonical-URL first-occurrence recipe,
    shared by stream_dedup_urls and the streaming corpus-prep funnel:
    ``rows`` is the batch's deduplicated (doc_id, g) relation (g = the
    md5'd canonical key, row-unique for unparseable URLs).  Batch rows
    rank within themselves, batch firsts probe the accumulated store
    with bucket-pruned reads, collisions flag the LOSER of the doc_id
    order (so the flag set converges to keep-smallest-doc_id under any
    arrival order), and both stores upsert idempotently."""
    from pyspark.sql import Window

    from streamsum_spark.sinks import read_touched_buckets, upsert_batch

    byg = Window.partitionBy("g").orderBy("doc_id")
    ranked = rows.withColumn("rn", F.row_number().over(byg))
    flagged = ranked.where(F.col("rn") > 1).select("doc_id", "g")
    firsts = ranked.where(F.col("rn") == 1).select("doc_id", "g")
    if os.path.exists(fp_tbl):
        stored = read_touched_buckets(spark, fp_tbl, firsts.select("g"))
        # ``bc_batch`` (caller-measured batch size) broadcasts the
        # batch side so the store side never shuffles
        joined = (
            (F.broadcast(firsts) if bc_batch else firsts).alias("b")
            .join(stored.alias("s"), "g")
            # same doc_id = file-source redelivery, not a duplicate
            .where(F.col("b.doc_id") != F.col("s.doc_id"))
        )
        b_first = F.col("b.doc_id") < F.col("s.doc_id")
        extra = joined.select(
            F.when(b_first, F.col("s.doc_id"))
            .otherwise(F.col("b.doc_id"))
            .alias("doc_id"),
            "g",
        )
        flagged = flagged.unionByName(extra)
    flagged = flagged.localCheckpoint()
    upsert_batch(
        spark,
        flag_tbl,
        flagged.select("doc_id", F.col("g").alias("url_md5")),
        ["doc_id"],
        "url_md5",
        n_buckets=n_buckets,
    )
    upsert_batch(
        spark,
        fp_tbl,
        firsts.select("g", "doc_id", (-F.col("doc_id")).alias("_nd")),
        ["g"],
        ["_nd"],
        n_buckets=n_buckets,
    )


def stream_dedup_urls(
    spark: SparkSession,
    warc_dir: str,
    glob: str = "*.warc.gz",
    max_files_per_trigger: int | None = None,
    n_buckets: int = 16,
    state_base: str | None = None,
    checkpoint: str | None = None,
) -> DataFrame:
    """Incremental canonical-URL dedup over a continuously-growing WARC
    crawl — the streaming twin of crawl.dedup_by_canonical_url on the
    stream_dedup_paragraphs state recipe: new crawl shards arriving
    under ``warc_dir`` dedup against every URL ingested so far without
    rescanning it.

    Per micro-batch: each page gets (doc_id = corpus_prep.doc_id_col —
    xxhash64 of (target_uri, warc_file, ordinal), so every FETCH is a
    distinct document and repeated crawls of one URI dedup at row
    granularity exactly like the batch operator; g = md5(canonical
    URL); unparseable URLs get row-unique keys so they never dedup or
    skew), the batch collapses redelivered copies and ranks within
    itself by doc_id, batch firsts probe the accumulated
    first-occurrence store with bucket-pruned reads, and a collision
    flags the LOSER of the doc_id order (a late-arriving
    globally-first copy flags the stored occurrence and is kept) while
    the store min-merges — so the flag set converges to the batch
    operator's keep-smallest-doc_id under any arrival order.  Returns
    the accumulated FLAG relation (doc_id, url_md5); survivors =
    ingested docs anti-joined on it — pinned equal to
    dedup_by_canonical_url across an out-of-order 2-shard split in
    tests/test_crawl.py."""
    from streamsum_spark.corpus_prep import doc_id_col
    from streamsum_spark.operators.crawl import canonical_url_col
    from streamsum_spark.sources.warc import stream_warc_text

    base = state_base or os.path.join(
        tempfile.gettempdir(), f"streamsum_urls_{uuid.uuid4().hex[:12]}"
    )
    fp_tbl, flag_tbl = base + "_fp", base + "_flags"

    def on_batch(batch_df: DataFrame, epoch_id: int) -> None:
        rows = (
            batch_df.select(
                doc_id_col().alias("doc_id"),
                canonical_url_col(F.col("target_uri")).alias("_canon"),
            )
            .select(
                "doc_id",
                F.md5(
                    F.coalesce(
                        F.col("_canon"),
                        F.concat_ws("-", F.lit("nocanon"), F.col("doc_id")),
                    )
                ).alias("g"),
            )
            # same (uri, file, ordinal) repeated in one batch = a
            # redelivered record, not a duplicate document
            .dropDuplicates(["doc_id"])
            .localCheckpoint()
        )
        _url_dedup_batch(spark, rows, fp_tbl, flag_tbl, n_buckets)

    pages = stream_warc_text(spark, warc_dir, glob, max_files_per_trigger)
    ckpt = checkpoint or base + "_ckpt"
    q = (
        pages.select("target_uri", "warc_file", "ordinal")
        .writeStream.foreachBatch(on_batch)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.exists(flag_tbl):
        return spark.createDataFrame([], "doc_id long, url_md5 string")
    return read_state_table(spark, flag_tbl).select("doc_id", "url_md5")


def stream_kn_bigram_perplexity(
    spark: SparkSession,
    sf_dir: str,
    glob: str = "documents.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Incremental Kneser-Ney self-perplexity (streaming twin of
    text.kn_bigram_perplexity) — the same additive (doc, w1, w2, c)
    gram table stream_bigram_perplexity maintains, with the KN LM
    (discounted bigram + continuation interpolation) derived from the
    accumulated relation at read time.  Every KN ingredient is an
    aggregate of the gram-TYPE projection of that table, so the stream
    stays stateless and per-batch work is O(batch); scoring weights
    each distinct gram by its in-doc count (algebraically identical to
    batch's per-instance avg; round(6) absorbs summation order —
    pinned equal to batch across a 3-micro-batch split in
    tests/test_streaming.py).  Arithmetic association order matches
    the batch operator exactly."""
    from streamsum_spark.functions.expressions import TOKENS_EXPR
    from streamsum_spark.sinks import stream_accumulate_counts

    docs = stream_documents(spark, sf_dir, glob, max_files_per_trigger)
    target = os.path.join(
        tempfile.gettempdir(), f"streamsum_kngram_tbl_{uuid.uuid4().hex[:12]}"
    )

    def per_batch_grams(batch_df: DataFrame) -> DataFrame:
        return (
            batch_df.withColumn("_toks", F.expr(TOKENS_EXPR))
            .select(
                "doc_id",
                F.explode(
                    F.expr(
                        "CASE WHEN size(_toks) >= 2 THEN "
                        "transform(sequence(1, size(_toks) - 1), "
                        "i -> struct(_toks[i - 1] AS w1, _toks[i] AS w2)) "
                        "ELSE array() END"
                    )
                ).alias("g"),
            )
            .select("doc_id", "g.w1", "g.w2")
            .groupBy("doc_id", "w1", "w2")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    stream_accumulate_counts(
        docs.select("doc_id", "text"), target, ["doc_id", "w1", "w2"], ["c"], per_batch_grams
    )
    grams = read_state_table(spark, target)
    big_c = grams.groupBy("w1", "w2").agg(F.sum("c").alias("c12"))
    uni = big_c.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n1p_fwd")
    )
    cont = big_c.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p_bwd"))
    tot = big_c.agg(F.count(F.lit(1)).cast("double").alias("n_types"))
    lm = (
        big_c.join(uni, "w1")
        .join(cont, "w2")
        .join(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            (
                -F.log(
                    (F.col("c12").cast("double") - F.lit(0.75))
                    / F.col("c1").cast("double")
                    + (
                        (F.lit(0.75) * F.col("n1p_fwd").cast("double"))
                        / F.col("c1").cast("double")
                    )
                    * (F.col("n1p_bwd").cast("double") / F.col("n_types"))
                )
            ).alias("nll"),
        )
    )
    return (
        grams.join(lm, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("c") * F.col("nll")) / F.sum("c"), 6).alias("avg_nll"))
    )
