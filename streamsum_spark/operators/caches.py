"""A5-A9 Cache disciplines — the reference's state layer as declarative
aggregations.

The reference folds cache-mapped tuples into mutable java.util.Maps with
three built-in disciplines plus an example extension
(/root/reference/src-clj/streamsum/caches.clj:27-101,
/root/reference/example/streamsum/config.clj:30-47).  Observable semantics
(cache contents after N updates under arrival order) are preserved; the
mutation mechanics are replaced by groupBy/window aggregation, which is what
makes them shuffle-parallel at 100 TB (SURVEY.md §1.3).

Arrival order everywhere is ``(ts, seq)`` — SURVEY.md §4.2.3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assoc_last_value(tuples: DataFrame, key_cols: tuple[str, ...] = ("k",)) -> DataFrame:
    """A5 assoc cache: last-value upsert per key.

    Reference: ``update`` replaces the value (caches.clj:27-44,
    TupleCache.java:17-27).  Batch equivalence: the value of the
    arrival-order-latest tuple per key == ``max_by(v, (ts, seq))``.

    Implemented with ``max_by`` over a struct rather than a window sort:
    a hash aggregation with map-side partial combine — one shuffle of
    pre-aggregated groups, no per-key full sort, which is the plan you want
    when keys are many and rows-per-key large.
    """
    return tuples.groupBy(*key_cols).agg(
        F.expr("max_by(v, struct(ts, seq))").alias("v"),
        F.max("ts").alias("latest_ts"),
    )


def lastn_per_key(
    tuples: DataFrame, n: int = 20, key_cols: tuple[str, ...] = ("k",)
) -> DataFrame:
    """A6 lastn cache: fixed-size ring buffer of the most recent N values.

    Reference: append with eviction of oldest, duplicates allowed
    (caches.clj:51-75; default N=20 caches.clj:98).  Batch form: per-key
    ``row_number() <= N`` over arrival order descending — rn=1 is the
    newest.  Row form (key, v, ts, seq, rn), not an array, for stable
    oracle hashing (SURVEY.md §2 A6).

    Scale note: a window top-N shuffles once on the key and sorts within
    partitions; Spark's WindowGroupLimit pushes the rank filter down so
    per-key state stays O(N).
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col("ts").desc(), F.col("seq").desc())
    return (
        tuples.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= n)
        .select(*key_cols, "v", "ts", "seq", "rn")
    )


def lastn_distinct_per_key(
    tuples: DataFrame, n: int = 20, key_cols: tuple[str, ...] = ("k",)
) -> DataFrame:
    """Distinct last-N cache — the reference's own declared TODO
    (caches.clj:14-15 "distinct-lastn"; the plain lastn allows duplicates,
    caches.clj:46-50).  Semantics: the N most-recently-seen DISTINCT
    values per key; a recurring value moves to the front (its recency is
    its latest occurrence).

    Batch form: collapse (key, value) to its latest arrival
    (groupBy + max struct — map-side combined), then window top-N over the
    collapsed relation.  Two shuffles on the key, both over the
    deduplicated relation (|distinct values|, not |events|) — strictly
    cheaper than the plain lastn window at scale when values repeat.
    """
    latest = tuples.groupBy(*key_cols, "v").agg(
        F.max(F.struct("ts", "seq")).alias("_latest")
    )
    w = Window.partitionBy(*key_cols).orderBy(F.col("_latest").desc())
    return (
        latest.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= n)
        .select(
            *key_cols,
            "v",
            F.col("_latest.ts").alias("ts"),
            F.col("_latest.seq").alias("seq"),
            "rn",
        )
    )


def count_cache(tuples: DataFrame) -> DataFrame:
    """A7 count cache (inc-only): (subj, action, obj) -> [count, latest_ts].

    Reference: ``inc-count!`` — count++ and timestamp := max(old, new); the
    max rule makes it order-independent (update.clj:44-69), so a plain hash
    aggregation is exact:
    ``groupBy(s, a, o).agg(count(*), max(ts))``.  Catalyst gives the
    partial/final split (map-side combine) for free — at 100 TB the shuffle
    carries one row per distinct (s,a,o) per map task, not per event.

    Input: cache-mapped tuples with non-null ``action`` (count-shaped,
    doc/tuple-counts.md:25).  Output column names form the engine's
    canonical count-cache view (SURVEY.md §2.B): (subject, action, obj,
    cnt, latest_ts).
    """
    return (
        tuples.where(F.col("action").isNotNull())
        .groupBy(
            F.col("k").alias("subject"), F.col("action"), F.col("v").alias("obj")
        )
        .agg(F.count(F.lit(1)).alias("cnt"), F.max("ts").alias("latest_ts"))
    )


def count_cache_inc_dec(ops: DataFrame, key_cols: tuple[str, ...] = ("subject",)) -> DataFrame:
    """A7+A8: interleaved inc/dec stream with clamp-at-zero decrement.

    Reference semantics (update.clj:44-91): inc always adds 1 and raises the
    timestamp to max(old, new); dec subtracts 1 **only if count > 0** (clamp
    at 0), never touches the timestamp, and never creates an entry.

    The clamped fold looks order-dependent-and-stateful, but for x_i = +/-1
    the recurrence ``c_i = max(0, c_{i-1} + x_i)`` has the closed form

        c_n = S_n - min(0, min_{k<=n} S_k)      (prefix-sum reflection)

    so the whole thing is two window functions over arrival order — fully
    declarative, shuffle-once-per-key, and expressible in ANSI SQL for the
    DuckDB oracle.  No applyInPandas needed in batch.  (Streaming exact form
    still uses transformWithStateInPandas — streamsum_spark.streaming.)

    Input: DataFrame with key_cols + (op IN ('inc','dec'), ts, seq).
    Output: key_cols + (cnt, latest_ts) with latest_ts = max ts over incs;
    keys with no inc rows are dropped (dec never creates an entry,
    update.clj:83-91).
    """
    w_run = (
        Window.partitionBy(*key_cols)
        .orderBy("ts", "seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    delta = F.when(F.col("op") == "inc", F.lit(1)).otherwise(F.lit(-1))
    with_run = ops.withColumn("s_run", F.sum(delta).over(w_run))
    return (
        with_run.groupBy(*key_cols)
        .agg(
            F.expr("max_by(s_run, struct(ts, seq))").alias("s_final"),
            F.min("s_run").alias("s_min"),
            F.max(F.when(F.col("op") == "inc", F.col("ts"))).alias("latest_ts"),
            F.sum(F.when(F.col("op") == "inc", 1).otherwise(0)).alias("_n_inc"),
        )
        .where(F.col("_n_inc") > 0)
        .select(
            *key_cols,
            (F.col("s_final") - F.least(F.lit(0), F.col("s_min"))).cast("long").alias("cnt"),
            "latest_ts",
        )
    )


def keycount(tuples: DataFrame, key_cols: tuple[str, ...] = ("k",)) -> DataFrame:
    """A9 keycount cache (example TupleCache extension): updates per key.

    Reference: config.clj:30-47 — map[key] := get(key, 0) + 1 on every
    update.  Spark: ``groupBy(key).count()``.
    """
    return tuples.groupBy(*key_cols).agg(F.count(F.lit(1)).cast("long").alias("cnt"))


# ---------------------------------------------------------------------------
# undoUpdate semantics (TupleCache.java:29-33) — batch forms
# ---------------------------------------------------------------------------


def assoc_with_undo(tuples: DataFrame, key_cols: tuple[str, ...] = ("k",)) -> DataFrame:
    """A5 undoUpdate: assoc tombstone — undo stores nil, the key REMAINS
    (caches_test.clj:102-105: value nil, not removed).

    Batch form: last op in arrival order wins; if it was an undo the stored
    value is NULL.  Input needs an ``op`` column ('update'|'undo').
    """
    return tuples.groupBy(*key_cols).agg(
        F.expr(
            "CASE WHEN max_by(op, struct(ts, seq)) = 'undo' THEN NULL "
            "ELSE max_by(v, struct(ts, seq)) END"
        ).alias("v"),
        F.max("ts").alias("latest_ts"),
    )


def lastn_with_undo(
    tuples: DataFrame, n: int = 20, key_cols: tuple[str, ...] = ("k",)
) -> DataFrame:
    """A6 undoUpdate: remove ALL buffer occurrences equal to the undone
    value (caches.clj:69-73); undo of an absent value is a no-op.

    Exact reference semantics are order-dependent (overflow eviction
    interleaves with undo removal), so the batch form is a per-key sorted
    applyInPandas fold — the honest stateful path (SURVEY.md §4.2.2); the
    streaming twin uses the same fold via applyInPandasWithState.

    Input: (key_cols, op 'update'|'undo', v, ts, seq).
    Output: (key_cols, v, ts, seq, rn) with rn=1 newest — same row form as
    lastn_per_key.
    """
    import pandas as pd

    dtypes = dict(tuples.dtypes)
    out_fields = ", ".join(f"{c} {dtypes[c]}" for c in key_cols)
    schema = f"{out_fields}, v {dtypes['v']}, ts {dtypes['ts']}, seq {dtypes['seq']}, rn int"

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "seq"])
        buf: list[tuple] = []  # (v, ts, seq) oldest..newest
        for op, v, ts, seq in zip(pdf["op"], pdf["v"], pdf["ts"], pdf["seq"]):
            if op == "update":
                buf.append((v, ts, seq))
                if len(buf) > n:
                    buf.pop(0)
            else:  # undo: remove all occurrences equal to v
                buf = [e for e in buf if e[0] != v]
        rows = []
        keys = [pdf.iloc[0][c] for c in key_cols]
        for rn, (v, ts, seq) in enumerate(reversed(buf), start=1):
            rows.append((*keys, v, ts, seq, rn))
        return pd.DataFrame(
            rows, columns=[*key_cols, "v", "ts", "seq", "rn"]
        )

    return tuples.groupBy(*key_cols).applyInPandas(fold, schema)


def keycount_with_undo(ops: DataFrame, key_cols: tuple[str, ...] = ("k",)) -> DataFrame:
    """A9 undo: decrement-if-positive per key (config.clj:38-45) — the same
    clamp recurrence as A8, so the reflection-identity fold applies; unlike
    the count cache, undo-only keys still appear (at 0) because KeyCountCache
    ``.put``s on undo too.

    Input: key_cols + (op IN ('inc','dec'), ts, seq)."""
    w_run = (
        Window.partitionBy(*key_cols)
        .orderBy("ts", "seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    delta = F.when(F.col("op") == "inc", F.lit(1)).otherwise(F.lit(-1))
    with_run = ops.withColumn("s_run", F.sum(delta).over(w_run))
    return (
        with_run.groupBy(*key_cols)
        .agg(
            F.expr("max_by(s_run, struct(ts, seq))").alias("s_final"),
            F.min("s_run").alias("s_min"),
        )
        .select(
            *key_cols,
            (F.col("s_final") - F.least(F.lit(0), F.col("s_min"))).cast("long").alias("cnt"),
        )
    )
