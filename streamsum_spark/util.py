"""Small engine utilities."""

from __future__ import annotations

import os
import threading

from pyspark.sql import DataFrame


def rebalance_for_cpu(df: DataFrame, min_ratio: float = 0.5) -> DataFrame:
    """Round-robin repartition when the source yields fewer splits than
    cores — parallelizes CPU-heavy narrow work (digests, folds) that would
    otherwise run on one task.

    Single-row-group parquet files (the test data) scan as ONE split no
    matter the maxPartitionBytes; a 100 TB table provides thousands of
    row groups, making this a no-op (partitions >= cores), so the extra
    exchange only ever happens when it is cheap and necessary.
    """
    spark = df.sparkSession
    cpus = int(
        os.environ.get(
            "SPARK_GRAFT_CPUS",
            spark.sparkContext.defaultParallelism or os.cpu_count() or 8,
        )
    )
    if df.rdd.getNumPartitions() < max(1, int(cpus * min_ratio)):
        return df.repartition(cpus)
    return df


_LOCAL_REL_ROWS = int(os.environ.get("STREAMSUM_LOCAL_REL_ROWS", "20000"))


_TAKE_LOCK = threading.Lock()
_TAKE_DEPTH = 0
_TAKE_SAVED: str | None = None


def one_shot_take(df: DataFrame, n: int) -> list:
    """``limit(n).collect()`` that scans the relation in ONE Spark job.

    executeTake's default strategy probes 1 partition, then 4x more per
    round (``spark.sql.limit.scaleUpFactor``) until the limit fills — on
    a bounded probe of a mostly-EMPTY relation (a dispatch probe, a
    redelivery check) that is ~log4(partitions) scheduling rounds, each
    a separate job, to discover there is nothing there.  Raising
    ``spark.sql.limit.initialNumPartitions`` to cover the session's
    parallelism makes round one scan everything.  The conf is SCOPED to
    the call (saved and restored, depth-counted so overlapped probes
    from parallel branch threads restore exactly once): a raised value
    left session-wide would make every later user ``take(5)`` scan
    4x-parallelism partitions in round one — harmless here, wasteful on
    a real cluster.  Driver results stay bounded at
    n x initialNumPartitions rows in the worst (relation-bigger-than-n)
    case, which the callers' small n keeps in the tens of MB."""
    global _TAKE_DEPTH, _TAKE_SAVED
    spark = df.sparkSession
    want = max(4 * (spark.sparkContext.defaultParallelism or 8), 128)
    key = "spark.sql.limit.initialNumPartitions"
    with _TAKE_LOCK:
        if _TAKE_DEPTH == 0:
            saved = str(spark.conf.get(key, "1") or "1")
            if int(saved) >= want:
                _TAKE_SAVED = None  # already high enough: leave it alone
            else:
                _TAKE_SAVED = saved
                spark.conf.set(key, str(want))
        _TAKE_DEPTH += 1
    try:
        return df.limit(n).collect()
    finally:
        with _TAKE_LOCK:
            _TAKE_DEPTH -= 1
            if _TAKE_DEPTH == 0 and _TAKE_SAVED is not None:
                spark.conf.set(key, _TAKE_SAVED)
                _TAKE_SAVED = None


def _pa_type(dt):
    """Arrow type for a Spark type on the LocalRelation-safe allowlist
    (exact null/NaN round-trip verified) — None for anything else
    (timestamps, decimals, structs, maps take the RDD fallback)."""
    import pyarrow as pa
    from pyspark.sql import types as T

    m = {
        T.LongType: pa.int64,
        T.IntegerType: pa.int32,
        T.ShortType: pa.int16,
        T.ByteType: pa.int8,
        T.DoubleType: pa.float64,
        T.FloatType: pa.float32,
        T.StringType: pa.string,
        T.BooleanType: pa.bool_,
        T.BinaryType: pa.binary,
    }
    fn = m.get(type(dt))
    if fn is not None:
        return fn()
    if isinstance(dt, T.ArrayType):
        inner = _pa_type(dt.elementType)
        return pa.list_(inner) if inner is not None else None
    return None


def local_relation(spark, rows: list, schema) -> DataFrame:
    """DataFrame over a genuine Catalyst ``LocalRelation`` built from
    already-collected rows.  A broadcast-exchange build over a
    LocalRelation launches NO Spark job (LocalTableScan.executeCollect
    is driver-side), where the ``parallelize(rows, 1)`` form pays one
    1-task job per CONSUMING ACTION — an incremental cycle that probes
    the same delta relation from a dozen actions spends a dozen
    scheduling rounds on builds of data the driver already holds.
    Conversion goes through one Arrow batch (one py4j call, None/NaN
    preserved exactly — pinned in tests); types outside the allowlist,
    or any conversion failure, fall back to the RDD-backed form, which
    is value-identical, just not job-free."""
    try:
        import pyarrow as pa

        pa_fields = []
        for f in schema.fields:
            t = _pa_type(f.dataType)
            if t is None:
                raise TypeError(f"no arrow mapping for {f.dataType}")
            pa_fields.append(pa.field(f.name, t, nullable=True))
        arrays = [
            pa.array([r[i] for r in rows], type=pa_fields[i].type)
            for i in range(len(pa_fields))
        ]
        tbl = pa.Table.from_arrays(arrays, schema=pa.schema(pa_fields))
        return spark.createDataFrame(tbl, schema)
    except Exception:
        return spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 1) if rows else rows,
            schema,
        )


def driver_local_from_rows(spark, rows: list, schema) -> DataFrame:
    """driver_local for rows the caller ALREADY collected (e.g. a probe
    that doubled as the size check): builds the LocalRelation and tags
    the rows for filter_by_ids, without any Spark action."""
    out = local_relation(spark, rows, schema)
    out._streamsum_local_rows = rows
    return out


def is_local_relation(df: DataFrame) -> bool:
    """Whether ``df``'s OPTIMIZED plan folds to a Catalyst
    LocalRelation (driver-held rows: collects need no job, probes can
    run in Python).  Best-effort — False on any introspection error."""
    try:
        return (
            df._jdf.queryExecution().optimizedPlan().getClass()
            .getSimpleName() == "LocalRelation"
        )
    except Exception:
        return False


def unpersist_checkpoint(df: DataFrame) -> None:
    """Best-effort release of a ``localCheckpoint``'s storage blocks
    once the caller knows the relation will not be read again —
    otherwise they sit until driver GC + ContextCleaner get around to
    them, which on a steady-state incremental loop means unbounded
    block-metadata churn.  The JVM-handle walk depends on the
    checkpointed plan being a LogicalRDD (Dataset.localCheckpoint
    guarantees it); anything else is silently left to the GC path."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def driver_local(
    df: DataFrame, max_rows: int | None = None, n_rows: int | None = None
) -> DataFrame:
    """Driver-local (LocalRelation) copy of a SMALL metadata relation.

    A broadcast-hash join whose build side is a distributed relation pays
    one Spark job PER CONSUMING ACTION to rebuild the broadcast (exchange
    reuse only applies within a single query execution), even when the
    input is an already-materialized localCheckpoint.  An incremental
    cycle that probes the same batch-sized id set from a dozen separate
    actions therefore spends a dozen scheduling rounds re-collecting the
    same rows.  Collecting the relation ONCE into a LocalRelation makes
    every later broadcast build job-free (LocalTableScan.executeCollect
    launches no tasks) and drops the relation's whole upstream subtree
    from every consumer's plan.

    Returns ``df`` unchanged when the relation exceeds ``max_rows``
    (default $STREAMSUM_LOCAL_REL_ROWS = 20k rows) — large batches keep
    the distributed form, so this is a fixed-overhead trade, never a
    driver-memory hazard; the rows it does collect are rows a broadcast
    join would have collected to the driver anyway.  Pass ``n_rows``
    when the caller already knows the count (skips the bounded probe).
    The input should be cheap to evaluate once (e.g. a materialized
    checkpoint): this evaluates it one extra time."""
    bound = _LOCAL_REL_ROWS if max_rows is None else max_rows
    spark = df.sparkSession
    if n_rows is not None:
        if n_rows > bound:
            return df
        rows = df.collect()
    else:
        rows = one_shot_take(df, bound + 1)
        if len(rows) > bound:
            return df
    out = local_relation(spark, rows, df.schema)
    # consumers with a single-key probe shape can skip the join
    # entirely via filter_by_ids (a literal predicate needs no
    # broadcast build at all, and it pushes down to scans)
    out._streamsum_local_rows = rows
    return out


_ISIN_MAX = int(os.environ.get("STREAMSUM_ISIN_MAX", "20000"))

_IDENT_OK = __import__("re").compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _raw_string_literals() -> bool:
    """Whether the ACTIVE session's SQL parser treats backslash
    sequences in string literals as raw text
    (``spark.sql.parser.escapedStringLiterals=true`` — the
    Hive-compatible mode).  String rendering in ``_in_set_pred`` must
    match the parser that will read it back or keys containing
    backslashes/quotes filter the wrong rows."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        return False
    try:
        return (
            str(
                spark.conf.get(
                    "spark.sql.parser.escapedStringLiterals", "false"
                )
            ).lower()
            == "true"
        )
    except Exception:
        return False


def _in_set_pred(col: str, vals: set):
    """One-round-trip IN predicate: ``F.col(col).isin(vals)`` makes a
    py4j call PER LITERAL (~3 ms each — an 1,200-id set costs ~4 s to
    merely CONSTRUCT, at every call site, before any analysis), so the
    predicate is rendered as ONE SQL string and parsed JVM-side
    (~30 ms for the same set).  Identical Catalyst ``In`` expression,
    so InSet conversion and parquet pushdown are unchanged.  Returns
    None when a value type (or the column name) has no safe SQL
    literal rendering — caller falls back to ``isin``.

    String escaping matches the session parser's mode: the default
    parser understands ``\\\\`` / ``\\'``; with
    ``spark.sql.parser.escapedStringLiterals=true`` there IS no escape
    on the unescaping side (text stays raw) while the LEXER still
    pairs ``\\X`` to find the closing delimiter — so a value holding a
    quote renders via the OTHER delimiter (``\"...\"``) and a value
    holding a backslash has no safe rendering at all (a trailing
    backslash swallows the delimiter): those return None and the
    caller's ``isin`` fallback (driver-built literals, no parser
    involved) keeps the semantics exact."""
    from pyspark.sql import functions as F

    if not _IDENT_OK.match(col):
        return None
    raw_mode = None  # resolved lazily, only if a string value appears
    parts = []
    for v in vals:
        if isinstance(v, bool):
            parts.append("TRUE" if v else "FALSE")
        elif isinstance(v, int):
            parts.append(str(v))
        elif isinstance(v, str):
            if raw_mode is None:
                raw_mode = _raw_string_literals()
            if raw_mode:
                if "\\" in v:
                    return None
                if "'" in v:
                    if '"' in v:
                        return None
                    parts.append('"' + v + '"')
                else:
                    parts.append("'" + v + "'")
            else:
                parts.append(
                    "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
                )
        else:
            return None
    return F.expr(f"`{col}` IN ({','.join(parts)})")


def filter_by_ids(
    df: DataFrame,
    col: str,
    ids_df: DataFrame,
    anti: bool = False,
    id_col: str | None = None,
    hint_broadcast: bool = True,
) -> DataFrame:
    """Semi/anti join of ``df`` against ``ids_df``'s key column — as a
    literal InSet PREDICATE when ``ids_df`` is a driver_local relation
    within the isin bound, else as the broadcast semi/anti join.

    The predicate form costs no broadcast-build job in ANY consuming
    action and is a pushable filter (key-sorted state-table files then
    prune row groups under it — the same sub-bucket pruning
    lookup_state_keys gets from its IN filters).  Exactness: a semi
    join never matches a NULL key and an anti join KEEPS null-key rows;
    the predicates reproduce both (``isin`` is NULL on NULL input, and
    a NULL id value — which could match nothing in either join — is
    dropped from the set before rendering)."""
    from pyspark.sql import functions as F

    rows = getattr(ids_df, "_streamsum_local_rows", None)
    key = id_col or col
    if rows is not None and len(rows) <= _ISIN_MAX:
        vals = {r[key] for r in rows}
        vals.discard(None)
        if anti:
            if not vals:
                return df
            pred = _in_set_pred(col, vals)
            if pred is None:
                pred = F.col(col).isin(list(vals))
            return df.where(F.col(col).isNull() | ~pred)
        if not vals:
            return df.where(F.lit(False))
        pred = _in_set_pred(col, vals)
        if pred is None:
            pred = F.col(col).isin(list(vals))
        return df.where(pred)
    probe = ids_df.select(F.col(key).alias(col))
    if hint_broadcast:
        probe = F.broadcast(probe)
    return df.join(probe, col, "left_anti" if anti else "left_semi")


def salted_count(df: DataFrame, key_cols: list[str], salt_buckets: int = 16) -> DataFrame:
    """Skew-resistant grouped count: two-phase aggregation through a salted
    key.  Phase 1 shuffles on (key, salt) — a hot key spreads over
    ``salt_buckets`` reducers instead of melting one; phase 2 merges the
    per-salt partials (tiny: |keys| x salt rows).

    AQE's skew-join splitting covers joins; salting is the groupBy-side
    counterpart for when a single group's rows exceed one reducer.  Counts
    are commutative so the rewrite is exact.
    """
    from pyspark.sql import functions as F

    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*key_cols, "_salt").agg(F.count(F.lit(1)).alias("_c"))
    return partial.groupBy(*key_cols).agg(F.sum("_c").cast("long").alias("cnt"))
