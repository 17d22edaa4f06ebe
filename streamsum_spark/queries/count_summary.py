"""B1-B7 — the reference's CountSummary / Queries Java API as DataFrame
queries over the flat count-cache view (subject, action, obj, cnt,
latest_ts).

Reference: /root/reference/src-java/streamsum/tuple_counts/CountSummary.java:6-44,
Queries.java:9-25, query_api.clj:74-208, TupleComparators.java:7-82.

The reference walks a nested mutable map ``{subj {action {obj [cnt ts]}}}``
per query (an interpreted scan — query_api.clj:74-95, with a TODO noting
paths are re-interpreted every call).  Here state is already the flat table,
so every API method is a one-line Catalyst plan: compiled, codegen'd,
filter-pushed, and parallel — the "compiled query path" the reference
aspires to (query_api.clj:71-72).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def get_count(cache: DataFrame, subj, action, obj) -> DataFrame:
    """B1 getCount — point lookup with (obj, 0, NULL) default on miss.

    Reference: CountSummary.java:14-18; query_api.clj:120-125 (``get-in``
    with default ``[0 nil]`` — never returns null).  Spark: probe-row left
    join + COALESCE, so a missing key still yields exactly one row.
    """
    spark = cache.sparkSession
    probe = spark.createDataFrame(
        [(str(subj), str(action), str(obj))], "p_subj string, p_action string, p_obj string"
    )
    return (
        probe.join(
            cache,
            (F.col("p_subj") == F.col("subject"))
            & (F.col("p_action") == F.col("action"))
            & (F.col("p_obj") == F.col("obj")),
            "left",
        )
        .select(
            F.col("p_obj").alias("obj"),
            F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt"),
            F.col("latest_ts"),
        )
    )


def actions_for_subj(cache: DataFrame, subj=None) -> DataFrame:
    """B2 actionsForSubj — distinct action keys per subject (empty on miss).

    Reference: CountSummary.java:20-24; query_api.clj:128-133.  Generalized
    to all subjects when ``subj`` is None (one query, grouped), which is the
    scan-once form a batch engine wants; the single-subject call is the
    filtered special case.
    """
    df = cache if subj is None else cache.where(F.col("subject") == str(subj))
    return df.select("subject", "action").distinct()


def counts_for_subj_action(cache: DataFrame, subj=None, actions: list[str] | None = None) -> DataFrame:
    """B3 countsForSubjAction — per-object merge across an action set:
    sum(count), max(time).

    Reference: CountSummary.java:26-33; merge-leaves sums counts and keeps
    the later timestamp (query_api.clj:170-188; golden: query_api_test.clj:74-83).
    """
    df = cache
    if subj is not None:
        df = df.where(F.col("subject") == str(subj))
    if actions is not None:
        df = df.where(F.col("action").isin([str(a) for a in actions]))
    return df.groupBy("subject", "obj").agg(
        F.sum("cnt").cast("long").alias("cnt"), F.max("latest_ts").alias("latest_ts")
    )


def sum_counts(cache: DataFrame, subj=None, actions: list[str] | None = None) -> DataFrame:
    """B4 sumCounts — total event count per subject, optionally restricted
    to an action set; 0 when nothing matches; unknown actions ignored.

    Reference: CountSummary.java:35-43; query_api.clj:142-151, 190-199.
    """
    df = cache
    if subj is not None:
        df = df.where(F.col("subject") == str(subj))
    if actions is not None:
        df = df.where(F.col("action").isin([str(a) for a in actions]))
    return df.groupBy("subject").agg(F.sum("cnt").cast("long").alias("total"))


def tuples_for_subj_action(
    cache: DataFrame, subj=None, actions: list[str] | None = None
) -> DataFrame:
    """B5 tuplesForSubjAction — flat [s a o cnt ts] scan with optional
    subject and action-set filters; nil filter = all.

    Reference: Queries.java:11-16; query_api.clj:74-95, 153-161 (a specter
    tree walk — here the flat table already *is* the flattened form, and the
    filters push down to the scan).
    """
    df = cache
    if subj is not None:
        df = df.where(F.col("subject") == str(subj))
    if actions is not None:
        df = df.where(F.col("action").isin([str(a) for a in actions]))
    return df.select("subject", "action", "obj", "cnt", "latest_ts")


def tuples_sorted(
    cache: DataFrame,
    by: str = "count_time",
    asc: bool = False,
    subj=None,
    actions: list[str] | None = None,
) -> DataFrame:
    """B6+B7 — sorted scan under the reference's three comparator families
    (time | count | count-then-time, asc/desc).

    Reference: Queries.java:18-24; TupleComparators.java:7-82.  A trailing
    (subject, action, obj) tie-break makes the order total — the reference
    leaves ties unspecified (tests use set equality, query_api_test.clj:59-62),
    so a deterministic refinement is a valid implementation.
    """
    keys = {
        "time": [F.col("latest_ts")],
        "count": [F.col("cnt")],
        "count_time": [F.col("cnt"), F.col("latest_ts")],
    }[by]
    ordered = [k.asc() if asc else k.desc() for k in keys] + [
        F.col("subject"),
        F.col("action"),
        F.col("obj"),
    ]
    return tuples_for_subj_action(cache, subj, actions).orderBy(*ordered)


def topk_by_count_time(cache: DataFrame, k: int = 100) -> DataFrame:
    """Ranked retrieval: top-k objects by (count desc, recency desc) —
    the comparator family's primary use case (SURVEY.md §2 B7)."""
    return tuples_sorted(cache, by="count_time", asc=False).limit(k)


class CountSummaryTable:
    """The reference's Java read API, shape-for-shape, over a (usually
    materialized) count-cache table — the ergonomic layer a CountSummary
    caller switches to (CountSummary.java:6-44, Queries.java:9-25).

    Methods return plain Python values like the Java API returns objects:
    these are point reads and small merges over the PRE-AGGREGATED cache
    relation (one row per (subject, action, obj)), so collecting the
    result is the contract, not a scale hazard — the corpus-sized work
    happened once, at cache build/write time.  Construct from any cache
    DataFrame or from a stored table via :meth:`from_parquet` (pair with
    sinks.write_cache_bucketed so repeated reads stay shuffle-free).
    """

    def __init__(self, cache: DataFrame):
        self._cache = cache

    @classmethod
    def from_parquet(cls, spark, path: str) -> "CountSummaryTable":
        return cls(spark.read.parquet(path))

    def getCount(self, subj, action, obj) -> tuple:
        """(obj, cnt, latest_ts); (obj, 0, None) on miss — never null."""
        r = get_count(self._cache, subj, action, obj).collect()[0]
        return (r.obj, r.cnt, r.latest_ts)

    def actionsForSubj(self, subj) -> list:
        """Distinct actions for the subject; [] on miss."""
        return sorted(r.action for r in actions_for_subj(self._cache, subj).collect())

    def countsForSubjAction(self, subj, *actions) -> list:
        """Per-object (obj, cnt, latest_ts) merged across the action set."""
        rows = counts_for_subj_action(
            self._cache, subj, list(actions) or None
        ).collect()
        return sorted((r.obj, r.cnt, r.latest_ts) for r in rows)

    def sumCounts(self, subj, *actions) -> int:
        """Total count for the subject (optional action set); 0 on miss."""
        rows = sum_counts(self._cache, subj, list(actions) or None).collect()
        return int(rows[0].total) if rows else 0

    def tuplesForSubjAction(self, subj=None, *actions, comparator=None, asc=False) -> list:
        """Flat (subject, action, obj, cnt, latest_ts) tuples; optional
        comparator in {'time', 'count', 'count_time'} (Queries.java:18-24)."""
        if comparator is None:
            df = tuples_for_subj_action(self._cache, subj, list(actions) or None)
        else:
            df = tuples_sorted(
                self._cache, by=comparator, asc=asc, subj=subj,
                actions=list(actions) or None,
            )
        return [(r.subject, r.action, r.obj, r.cnt, r.latest_ts) for r in df.collect()]


def topk_per_group(
    df: DataFrame, part_cols: list[str], order_cols: list, k: int
) -> DataFrame:
    """Per-group top-k via window row_number (generic helper; Spark pushes
    the rank filter into the sort via WindowGroupLimit — no full sort
    materialization per group)."""
    w = Window.partitionBy(*part_cols).orderBy(*order_cols)
    return df.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
