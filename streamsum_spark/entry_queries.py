"""Declared-query registry: name -> (spark, sf_dir) -> DataFrame, plus the
matching DuckDB oracle SQL (SURVEY.md §2 "declared query" column).

Conventions for oracle stability (driver hashes values order-insensitively
after sorting columns by name):
- every computed column aliased identically on both sides;
- counts cast to BIGINT on both sides;
- sums of fixed-decimal inputs rounded to their exact decimal width
  (the true value lies on the rounding grid, so both engines land on the
  same grid point regardless of FP summation order);
- top-k queries carry a full deterministic tie-break before LIMIT.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamsum_spark import oracles, pipeline
from streamsum_spark.config import DEFAULT_CONFIG
from streamsum_spark.operators import caches as cache_ops
from streamsum_spark.operators import relational as rel
from streamsum_spark.operators.extract import extract_events
from streamsum_spark.queries import count_summary as cs
from streamsum_spark.tables import table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def _ensure_package_shipped(spark: SparkSession) -> None:
    """Ship streamsum_spark to executor Python workers via addPyFile.

    Functions passed to applyInPandasWithState / mapInPandas are pickled by
    *reference* (module + name); the driver process may have /root/repo on
    sys.path without the workers inheriting it (e.g. the harness imports
    __spark_entry__ from a different cwd).  Shipping a zip of the package
    makes worker-side imports work regardless of how the session was built.
    """
    sc = spark.sparkContext
    if getattr(sc, "_streamsum_shipped", False):
        return
    import os
    import tempfile
    import zipfile

    # Right-size shuffle parallelism for the host when the session still has
    # the 200 default: AQE coalesces batch shuffles at runtime, but streaming
    # plans (no AQE) would run 200 state-store tasks per micro-batch.
    try:
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
            spark.conf.set("spark.sql.shuffle.partitions", str(cpus))
    except Exception:
        pass

    import streamsum_spark

    pkg_dir = os.path.dirname(os.path.abspath(streamsum_spark.__file__))
    zpath = os.path.join(tempfile.gettempdir(), f"streamsum_spark_pkg_{os.getpid()}.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    arc = os.path.join(
                        "streamsum_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, arc)
    sc.addPyFile(zpath)
    sc._streamsum_shipped = True


def declare(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_package_shipped(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = getattr(fn, "__name__", name)
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# §2.A — reference pipeline operators
# ---------------------------------------------------------------------------


@declare(
    "scan_events",
    "SELECT event_id, event_type, CAST(user_id AS BIGINT) AS user_id, ts FROM events",
)
def scan_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 source scan with column pruning (only 4 of 6 columns read)."""
    return table(spark, sf_dir, "events").select(
        "event_id", "event_type", F.col("user_id").cast("long").alias("user_id"), "ts"
    )


@declare("extract_events", oracles.TUPLES_SQL)
def q_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 extract: events -> (pred, subj, obj, ts, seq), malformed dropped."""
    return extract_events(table(spark, sf_dir, "events"))


@declare(
    "transform_fanout",
    oracles.with_pipeline_ctes("SELECT cache_key, k, action, v, ts, seq FROM fanout"),
)
def q_transform_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 pattern fan-out (single-scan explode; oracle uses UNION ALL)."""
    return pipeline.cache_tuples(spark, sf_dir)


@declare(
    "assoc_last_value",
    oracles.with_pipeline_ctes(
        """
SELECT k, v, latest_ts FROM (
    SELECT k, v, ts AS latest_ts,
           row_number() OVER (PARTITION BY k ORDER BY ts DESC, seq DESC) AS rn
    FROM fanout WHERE cache_key = 'click-obj-user'
) WHERE rn = 1
"""
    ),
)
def q_assoc_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 assoc cache: last-value upsert per key (max_by over arrival order)."""
    tuples = pipeline.cache_tuples(spark, sf_dir)
    return cache_ops.assoc_last_value(tuples.where(F.col("cache_key") == "click-obj-user"))


@declare(
    "lastn_per_key",
    oracles.with_pipeline_ctes(
        """
SELECT k, v, ts, seq, rn FROM (
    SELECT k, v, ts, seq,
           CAST(row_number() OVER (PARTITION BY k ORDER BY ts DESC, seq DESC) AS INTEGER) AS rn
    FROM fanout WHERE cache_key = 'act-user-obj'
) WHERE rn <= 20
"""
    ),
)
def q_lastn_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 lastn ring buffer, row form (rn=1 newest, rn<=N)."""
    tuples = pipeline.cache_tuples(spark, sf_dir)
    return cache_ops.lastn_per_key(
        tuples.where(F.col("cache_key") == "act-user-obj"), n=DEFAULT_CONFIG.lastn_buf_size
    )


@declare(
    "count_cache_inc",
    oracles.with_pipeline_ctes("SELECT subject, action, obj, cnt, latest_ts FROM cache"),
)
def q_count_cache_inc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 count cache: groupBy(s,a,o).agg(count, max ts) — exact for inc-only."""
    return pipeline.count_cache_view(spark, sf_dir)


@declare(
    "count_cache_inc_dec",
    oracles.with_pipeline_ctes(
        """
SELECT subject,
       CAST(s_final - LEAST(0, s_min) AS BIGINT) AS cnt,
       latest_ts
FROM (
    SELECT subject,
           max(CASE WHEN rn_desc = 1 THEN s_run END) AS s_final,
           min(s_run) AS s_min,
           max(CASE WHEN delta = 1 THEN ts END) AS latest_ts,
           sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS n_inc
    FROM (
        SELECT subj AS subject, ts, seq,
               CASE WHEN pred = 'error' THEN -1 ELSE 1 END AS delta,
               sum(CASE WHEN pred = 'error' THEN -1 ELSE 1 END)
                   OVER (PARTITION BY subj ORDER BY ts, seq
                         ROWS UNBOUNDED PRECEDING) AS s_run,
               row_number() OVER (PARTITION BY subj ORDER BY ts DESC, seq DESC) AS rn_desc
        FROM tuples
    )
    GROUP BY subject
)
WHERE n_inc > 0
"""
    ),
)
def q_count_cache_inc_dec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 clamped-decrement fold via the prefix-sum reflection identity.

    Per-user op stream over arrival order: 'error' events decrement (clamped
    at 0, never touching the timestamp), everything else increments with the
    max-timestamp rule — the reference's inc/dec semantics (update.clj:44-91)
    as two window functions instead of a stateful fold.
    """
    tuples = extract_events(table(spark, sf_dir, "events"))
    ops = tuples.select(
        F.col("subj").alias("subject"),
        F.when(F.col("pred") == "error", F.lit("dec")).otherwise(F.lit("inc")).alias("op"),
        "ts",
        "seq",
    )
    return cache_ops.count_cache_inc_dec(ops)


@declare(
    "keycount_per_subject",
    oracles.with_pipeline_ctes(
        "SELECT k, CAST(count(*) AS BIGINT) AS cnt FROM fanout GROUP BY k"
    ),
)
def q_keycount_per_subject(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 keycount example cache: updates per key across the whole stream."""
    return cache_ops.keycount(pipeline.cache_tuples(spark, sf_dir))


# ---------------------------------------------------------------------------
# §2.B — count-cache read-side query API
# ---------------------------------------------------------------------------


@declare(
    "get_count_point",
    oracles.with_pipeline_ctes(
        """
SELECT '69' AS obj, CAST(COALESCE(cache.cnt, 0) AS BIGINT) AS cnt, cache.latest_ts
FROM (SELECT 1 AS x) probe
LEFT JOIN cache ON cache.subject = '8' AND cache.action = 'error' AND cache.obj = '69'
"""
    ),
)
def q_get_count_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 getCount point lookup with (obj, 0, NULL) default on miss."""
    return cs.get_count(pipeline.count_cache_view(spark, sf_dir), "8", "error", "69")


@declare(
    "actions_for_subj",
    oracles.with_pipeline_ctes("SELECT DISTINCT subject, action FROM cache"),
)
def q_actions_for_subj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 actionsForSubj, grouped form over all subjects."""
    return cs.actions_for_subj(pipeline.count_cache_view(spark, sf_dir))


@declare(
    "counts_merge_actions",
    oracles.with_pipeline_ctes(
        """
SELECT subject, obj, CAST(sum(cnt) AS BIGINT) AS cnt, max(latest_ts) AS latest_ts
FROM cache WHERE action IN ('click', 'buy')
GROUP BY subject, obj
"""
    ),
)
def q_counts_merge_actions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 countsForSubjAction: per-object merge (sum cnt, max ts) across an
    action set — the flagship query (entry())."""
    return cs.counts_for_subj_action(
        pipeline.count_cache_view(spark, sf_dir), actions=["click", "buy"]
    )


@declare(
    "sum_counts",
    oracles.with_pipeline_ctes(
        "SELECT subject, CAST(sum(cnt) AS BIGINT) AS total FROM cache GROUP BY subject"
    ),
)
def q_sum_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4 sumCounts per subject (all actions)."""
    return cs.sum_counts(pipeline.count_cache_view(spark, sf_dir))


@declare(
    "tuples_filter_scan",
    oracles.with_pipeline_ctes(
        """
SELECT subject, action, obj, cnt, latest_ts
FROM cache WHERE action IN ('click', 'error')
"""
    ),
)
def q_tuples_filter_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5 tuplesForSubjAction: flat scan filtered by an action set."""
    return cs.tuples_for_subj_action(
        pipeline.count_cache_view(spark, sf_dir), actions=["click", "error"]
    )


@declare(
    "topk_by_count_time",
    oracles.with_pipeline_ctes(
        """
SELECT subject, action, obj, cnt, latest_ts
FROM cache
ORDER BY cnt DESC, latest_ts DESC, subject, action, obj
LIMIT 100
"""
    ),
)
def q_topk_by_count_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6+B7 ranked retrieval: top-100 by (count desc, time desc) with a
    total-order tie-break so LIMIT is deterministic."""
    return cs.topk_by_count_time(pipeline.count_cache_view(spark, sf_dir), k=100)


# ---------------------------------------------------------------------------
# §2.C — relational surface
# ---------------------------------------------------------------------------

declare(
    "filter_predicates",
    """
SELECT event_id, ts, user_id, event_type, value
FROM events
WHERE event_type IN ('click', 'purchase')
  AND value >= 10.0 AND value < 50.0
  AND ts >= TIMESTAMP '2024-01-10 00:00:00'
""",
)(rel.filter_predicates)

declare(
    "join_inner",
    """
SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
""",
)(rel.join_inner)

declare(
    "join_semi",
    "SELECT c_custkey, c_name FROM customer WHERE EXISTS "
    "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)",
)(rel.join_semi)

declare(
    "join_left_anti",
    "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS "
    "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)",
)(rel.join_left_anti)

declare(
    "join_asof",
    """
SELECT p.event_id, p.user_id, p.ts, c.ts AS click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
)(rel.join_asof)

declare("agg_revenue_by_flag", rel.AGG_REVENUE_SQL)(rel.agg_revenue_by_flag)

declare(
    "agg_rollup_nation_region",
    """
SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_cust,
       round(sum(c_acctbal), 2) AS sum_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
)(rel.agg_rollup_nation_region)

declare(
    "agg_distinct_users",
    """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY event_type
""",
)(rel.agg_distinct_users)

# approximate by design -> rows-only check (no oracle)
declare("agg_approx_distinct")(rel.agg_approx_distinct)

declare(
    "window_rownum_lastn",
    """
SELECT user_id, event_id, event_type, ts, rn FROM (
    SELECT user_id, event_id, event_type, ts,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS INTEGER) AS rn
    FROM events
) WHERE rn <= 5
""",
)(rel.window_rownum_lastn)

declare(
    "window_running_sum",
    """
SELECT user_id, event_id, ts,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING), 2) AS running_value
FROM events
""",
)(rel.window_running_sum)

declare(
    "topk_per_group",
    """
SELECT p_brand, p_partkey, p_retailprice, rn FROM (
    SELECT p_brand, p_partkey, p_retailprice,
           CAST(row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS INTEGER) AS rn
    FROM part
) WHERE rn <= 3
""",
)(rel.topk_per_group)

declare(
    "set_union_except",
    """
SELECT user_id FROM events WHERE event_type = 'click'
UNION
SELECT user_id FROM events WHERE event_type = 'view'
EXCEPT
SELECT user_id FROM events
WHERE event_type = 'error' AND ts < TIMESTAMP '2024-01-03 00:00:00'
""",
)(rel.set_union_except)

declare(
    "dedup_events",
    """
SELECT user_id, event_type, event_id, ts FROM (
    SELECT user_id, event_type, event_id, ts,
           row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
    FROM events
) WHERE rn = 1
""",
)(rel.dedup_events)

declare(
    "scalar_string",
    r"""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       substring(p_name, 1, 8) AS name_prefix,
       CAST(length(p_name) AS BIGINT) AS name_len,
       concat_ws('/', p_brand, p_type) AS brand_type,
       regexp_extract(p_type, '(\w+)$', 1) AS type_last_word,
       (p_name LIKE '%green%') AS is_green
FROM part
""",
)(rel.scalar_string)

declare(
    "scalar_datetime",
    """
SELECT event_id,
       date_trunc('day', ts) AS day,
       CAST(year(ts) AS BIGINT) AS y,
       CAST(month(ts) AS BIGINT) AS m,
       CAST(dayofweek(ts) AS BIGINT) AS dow,
       CAST(hour(ts) AS BIGINT) AS h
FROM events
""",
)(rel.scalar_datetime)

declare(
    "json_extract_props",
    "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events",
)(rel.json_extract_props)

declare(
    "batch_tumbling_counts",
    """
SELECT date_trunc('hour', ts) AS bucket, event_type,
       CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2
""",
)(rel.batch_tumbling_counts)

declare(
    "array_ops",
    """
SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
       CAST(idx AS BIGINT) AS idx,
       CAST(embedding[idx] AS DOUBLE) AS val
FROM (SELECT vec_id, embedding, unnest(generate_series(1, 3)) AS idx FROM embeddings)
""",
)(rel.array_ops)


# ---------------------------------------------------------------------------
# LLM-data-pipeline extensions: text analysis, dedup, similarity search
# ---------------------------------------------------------------------------

from streamsum_spark.operators import dedup as dd  # noqa: E402
from streamsum_spark.operators import similarity as sim  # noqa: E402
from streamsum_spark.operators import text as tx  # noqa: E402

declare("text_token_counts", tx.TEXT_TOKEN_COUNTS_SQL)(tx.text_token_counts)
declare("text_quality_score", tx.TEXT_QUALITY_SQL)(tx.text_quality_score)
declare("text_langid", tx.TEXT_LANGID_SQL)(tx.text_langid)
declare("doc_fingerprint", tx.DOC_FINGERPRINT_SQL)(tx.doc_fingerprint)

declare("dedup_exact_docs", dd.DEDUP_EXACT_SQL)(dd.dedup_exact)
declare("minhash_signatures", dd.MINHASH_SIG_SQL)(dd.minhash_signatures)
declare("minhash_lsh_pairs", dd.LSH_PAIRS_SQL)(dd.lsh_candidate_pairs)
declare("ngram_jaccard_dupes", dd.NGRAM_JACCARD_SQL)(dd.ngram_jaccard_dupes)
declare("simhash_signatures", dd.SIMHASH_SQL)(dd.simhash_signatures)

declare("similarity_topk", sim.SIMILARITY_TOPK_SQL)(sim.similarity_topk)
declare("knn_per_probe", sim.KNN_PER_PROBE_SQL)(sim.knn_per_probe)
# bucketed ANN: bucket ids are engine-internal -> rows-only check
declare("ann_lsh_topk")(sim.ann_lsh_topk)


# ---------------------------------------------------------------------------
# Streaming surface (SURVEY.md §7 Phase 4) — exact ops share batch oracles,
# so batch≡streaming equivalence is enforced by the correctness gate itself.
# ---------------------------------------------------------------------------

from streamsum_spark.streaming import pipeline as streaming  # noqa: E402

declare("stream_count_cache", ORACLES["count_cache_inc"])(streaming.stream_count_cache)
declare("stream_clamp_dec", ORACLES["count_cache_inc_dec"])(streaming.stream_clamp_dec)
declare("stream_lastn", ORACLES["lastn_per_key"])(streaming.stream_lastn)
declare("stream_tumbling_counts", ORACLES["batch_tumbling_counts"])(
    streaming.stream_tumbling_counts
)
# watermark semantics legitimately withhold/drop rows -> rows-only checks
declare("stream_tumbling_late_data")(streaming.stream_tumbling_late_data)
declare("stream_dedup_watermark")(streaming.stream_dedup_watermark)


# ---------------------------------------------------------------------------
# A10 encode — JSON output encoding of the fanned-out tuple stream
# ---------------------------------------------------------------------------

from streamsum_spark.operators import output as outp  # noqa: E402


@declare(
    "encode_output",
    oracles.with_pipeline_ctes(
        """
SELECT cache_key, k,
       to_json(struct_pack(cache_key := cache_key, k := k, v := v,
                           ts := strftime(ts, '%Y-%m-%d %H:%M:%S.%f'),
                           seq := seq)) AS encoded
FROM fanout
"""
    ),
)
def q_encode_output(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 Encode: post-record JSON projection (timestamps pre-formatted to
    microsecond strings so the encoding is engine-portable)."""
    return outp.encode_output(pipeline.cache_tuples(spark, sf_dir))


# ---------------------------------------------------------------------------
# relational coverage, second wave: cube / pivot / intersect / math / subquery
# ---------------------------------------------------------------------------

declare(
    "agg_cube_region_segment",
    """
SELECT r_name, c_mktsegment, CAST(count(*) AS BIGINT) AS n_cust,
       round(sum(c_acctbal), 2) AS sum_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY CUBE (r_name, c_mktsegment)
""",
)(rel.agg_cube_region_segment)

declare(
    "pivot_status_by_flag",
    """
SELECT l_returnflag,
       round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_open,
       round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_filled
FROM lineitem GROUP BY l_returnflag
""",
)(rel.pivot_status_by_flag)

declare(
    "set_intersect",
    """
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
""",
)(rel.set_intersect)

declare(
    "scalar_math",
    """
SELECT l_orderkey, l_linenumber,
       abs(l_quantity - 25.0) AS qty_dev,
       CAST(l_partkey % 7 AS BIGINT) AS part_mod,
       greatest(l_discount, l_tax) AS max_rate,
       least(l_discount, l_tax) AS min_rate,
       round(l_discount * l_discount, 4) AS disc_sq
FROM lineitem
""",
)(rel.scalar_math)

declare(
    "subquery_above_nation_avg",
    """
SELECT c_custkey, c_name, c_acctbal, nation_avg
FROM customer
JOIN (SELECT c_nationkey, round(avg(c_acctbal), 2) AS nation_avg
      FROM customer GROUP BY c_nationkey) USING (c_nationkey)
WHERE c_acctbal > nation_avg
""",
)(rel.subquery_above_nation_avg)


# ---------------------------------------------------------------------------
# UDF surface + sinks + term statistics
# ---------------------------------------------------------------------------


@declare("udf_grouped_fold")
def q_udf_grouped_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The declared pandas-UDF surface (SURVEY.md §2.C "UDF/UDAF/UDTF"):
    the exact lastn-with-undo fold — a per-key sorted applyInPandas whose
    semantics (ring-buffer eviction interleaved with undo removal) are not
    expressible in window SQL => rows-only check.  Derivation: error events
    undo the user's previous object value."""
    tuples = extract_events(table(spark, sf_dir, "events"))
    ops = tuples.select(
        F.col("subj").alias("k"),
        F.when(F.col("pred") == "error", F.lit("undo")).otherwise(F.lit("update")).alias("op"),
        F.col("obj").alias("v"),
        "ts",
        "seq",
    )
    return cache_ops.lastn_with_undo(ops, n=DEFAULT_CONFIG.lastn_buf_size)


declare("term_frequencies", tx.TERM_FREQ_SQL)(tx.term_frequencies)
declare("top_terms_per_lang", tx.TOP_TERMS_SQL)(tx.top_terms_per_lang)


declare(
    "join_range_bucketed",
    """
SELECT DISTINCT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND p.ts >= c.ts
 AND p.ts - c.ts < INTERVAL 1 HOUR
""",
)(rel.join_range_bucketed)


declare("window_sliding_counts", rel.WINDOW_SLIDING_SQL)(rel.window_sliding_counts)
declare("sessionize_events", rel.SESSIONIZE_SQL)(rel.sessionize_events)


declare("agg_percentiles", rel.AGG_PERCENTILES_SQL)(rel.agg_percentiles)

declare(
    "agg_grouping_sets",
    """
SELECT event_type, date_trunc('day', ts) AS day,
       CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS sum_value
FROM events
GROUP BY GROUPING SETS ((event_type, date_trunc('day', ts)), (event_type), ())
""",
)(rel.agg_grouping_sets)


declare("winnow_fingerprints", dd.WINNOW_SQL)(dd.winnow_fingerprints)
declare("embedding_centroids", sim.EMBEDDING_CENTROIDS_SQL)(sim.embedding_centroids)
# coarse-quantizer routing is engine-internal -> rows-only
declare("ann_ivf_topk")(sim.ann_ivf_topk)


declare("stream_assoc_last_value", ORACLES["assoc_last_value"])(
    streaming.stream_assoc_last_value
)
declare("stream_keycount", ORACLES["keycount_per_subject"])(streaming.stream_keycount)


declare(
    "scalar_null_safe",
    """
SELECT event_id,
       nullif(event_type, 'error') AS masked_type,
       nullif(event_type, 'error') IS NOT DISTINCT FROM NULL AS is_error,
       nullif(event_type, 'error') IS NOT DISTINCT FROM 'click' AS is_click,
       coalesce(nullif(event_type, 'error'), '(err)') AS type_or_default
FROM events
""",
)(rel.scalar_null_safe)


# ---------------------------------------------------------------------------
# dataset preparation: deterministic splits + sequence packing
# ---------------------------------------------------------------------------

from streamsum_spark.operators import sampling as smp  # noqa: E402

declare("train_val_split", smp.TRAIN_VAL_SPLIT_SQL)(smp.train_val_split)
declare("pack_into_chunks", smp.PACK_INTO_CHUNKS_SQL)(smp.pack_into_chunks)
