"""Physical-plan regression guards (SURVEY.md §4 / the 100 TB posture).

Each test pins a scale-critical plan property; if a refactor silently turns
a broadcast join into a shuffle join or un-pushes a filter, these fail
before any benchmark notices.
"""

from __future__ import annotations

from streamsum_spark import plans
from streamsum_spark.entry_queries import QUERIES
from tests.conftest import SF_ORACLE


def test_filter_pushdown_reaches_scan(spark):
    df = QUERIES["filter_predicates"](spark, SF_ORACLE)
    assert plans.has_pushed_filters(df, "event_type", "value")


def test_scan_prunes_columns(spark):
    """A1 scan coverage: projections prune the parquet scan to used columns
    (filter_predicates never reads props; extract never reads value)."""
    cols = plans.read_schema_columns(QUERIES["filter_predicates"](spark, SF_ORACLE))
    assert "props" not in cols


def test_extract_prunes_to_used_columns(spark):
    df = QUERIES["extract_events"](spark, SF_ORACLE)
    assert "value" not in plans.read_schema_columns(df)


def test_join_inner_broadcasts_while_small(spark):
    """No hint (round-11: customer is O(SF), not a fixed dimension) — AQE
    still broadcasts while customer measures under the threshold."""
    assert plans.has_broadcast_join(QUERIES["join_inner"](spark, SF_ORACLE))


def test_join_inner_degrades_to_shuffle_at_scale(spark):
    """The 100 TB regime (autoBroadcastJoinThreshold=-1, the r7/r8
    recipe): the customer side must plan as a shuffle join — a forced
    broadcast of a linearly-growing relation would OOM the driver — with
    values identical to the default plan."""
    from tests.conftest import canon_rows

    base = canon_rows(QUERIES["join_inner"](spark, SF_ORACLE).toPandas())
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = QUERIES["join_inner"](spark, SF_ORACLE)
        plan = plans.explain_str(df)
        assert "BroadcastHashJoin" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert canon_rows(df.toPandas()) == base
    finally:
        for k, v in saved.items():
            spark.conf.unset(k) if v is None else spark.conf.set(k, v)


def test_rollup_joins_broadcast(spark):
    from streamsum_spark.operators import relational as rel

    assert plans.has_broadcast_join(rel.agg_rollup_nation_region(spark, SF_ORACLE))
    # the merged GROUPING SETS form keeps the same broadcast dims
    assert plans.has_broadcast_join(QUERIES["agg_grouping_multi"](spark, SF_ORACLE))


def test_lastn_uses_window_group_limit(spark):
    """The rank<=N filter must push into the sort (per-key state O(N))."""
    from streamsum_spark.operators import relational as rel

    assert plans.has_window_group_limit(rel.window_rownum_lastn(spark, SF_ORACLE))
    assert plans.has_window_group_limit(QUERIES["topk_per_group"](spark, SF_ORACLE))
    assert plans.has_window_group_limit(QUERIES["lastn_per_key"](spark, SF_ORACLE))


def test_count_cache_has_partial_aggregation(spark):
    """Map-side combine: the count-cache shuffle carries group partials,
    not raw events."""
    assert plans.has_partial_aggregate(QUERIES["count_cache_inc"](spark, SF_ORACLE))


def test_transform_fanout_is_narrow(spark):
    """The explode fan-out must not introduce a KEYED shuffle — the only
    permitted exchange is the explicit round-robin rebalance of the
    single-row-group test scan (a no-op at real scale)."""
    plan = plans.explain_str(QUERIES["transform_fanout"](spark, SF_ORACLE))
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_similarity_topk_broadcasts_probe(spark):
    from streamsum_spark.operators import similarity as sim

    assert plans.has_broadcast_join(sim.similarity_topk(spark, SF_ORACLE))


def test_knn_per_probe_never_broadcasts_probe_set(spark):
    """The probe set is a fixed fraction of the corpus — at 100 TB it is
    not broadcastable.  The plan must be a shuffled join keyed on the label
    block, never a broadcast of the probe side."""
    plan = plans.explain_str(QUERIES["knn_per_probe"](spark, SF_ORACLE))
    assert "BroadcastHashJoin" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan


def test_pack_into_chunks_window_is_partitioned(spark):
    """Sequence packing must never funnel the corpus through one task: the
    running-sum window is partitioned by hash prefix, so the plan contains
    no single-partition exchange (the unpartitioned global window's
    signature)."""
    plan = plans.explain_str(QUERIES["pack_into_chunks"](spark, SF_ORACLE))
    assert "SinglePartition" not in plan
    assert "Window" in plan


def test_encode_output_updated_single_shuffle_family(spark):
    """The out-queue encoding is window-only over (cache_key, k[, action,
    v]) — no joins, no collect, no Python."""
    plan = plans.explain_str(QUERIES["encode_output_updated"](spark, SF_ORACLE))
    assert "Join" not in plan
    assert "pythonUDF" not in plan.lower()


def test_window_time_buckets_reuses_base_aggregation(spark):
    """Tumble and slide derive from one shared 30-min pre-aggregation: AQE
    must reuse the base exchange at runtime, so the event scan + partial
    aggregation execute once for both window families."""
    df = QUERIES["window_time_buckets"](spark, SF_ORACLE)
    df.collect()  # AQE reuse is decided at runtime
    assert "ReusedExchange" in plans.explain_str(df, mode="simple")


def test_near_dup_verified_joins_candidates_not_corpus(spark):
    """Jaccard verification must consume LSH candidate pairs (keyed joins
    of the candidate relation), never a shingle self-join of the corpus:
    no nested-loop anywhere in the plan."""
    plan = plans.explain_str(QUERIES["near_dup_verified"](spark, SF_ORACLE))
    assert "NestedLoop" not in plan


def test_embedding_near_dupes_is_bucket_equi_join(spark):
    """The pair generator must join on the LSH bucket id (equi-join; the
    vec_a < vec_b inequality is a post-join filter), never a nested-loop
    or cartesian pair enumeration, and the bucketed corpus feeding both
    self-join sides must come from ONE persisted computation."""
    from streamsum_spark.operators import similarity as sim

    df = sim.embedding_near_dupes(spark, SF_ORACLE, threshold=0.35)
    plan = plans.explain_str(df)
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan  # persisted bucketed corpus, both sides


def test_heavy_hitters_mg_broadcasts_candidates(spark):
    """The exact verification pass must join the corpus against a
    BROADCAST candidate relation (the sketch output, <= partitions x k
    rows) — a shuffle of the token stream keyed on candidate membership
    would defeat the bounded two-pass design."""
    from streamsum_spark.operators import sketches as sk

    plan = plans.explain_str(sk.heavy_hitters_mg(spark, SF_ORACLE))
    assert "BroadcastHashJoin" in plan


def test_salted_count_equals_direct(spark):
    """Skew-salting rewrite is exact: two-phase salted counts equal the
    direct groupBy."""
    from pyspark.sql import functions as F

    from streamsum_spark.tables import table
    from streamsum_spark.util import salted_count

    ev = table(spark, SF_ORACLE, "events")
    direct = {
        (r.event_type, r.cnt)
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .collect()
    }
    salted = {(r.event_type, r.cnt) for r in salted_count(ev, ["event_type"]).collect()}
    assert salted == direct


def test_join_asof_single_shuffle(spark):
    """The as-of join must stay a single user_id shuffle (union + window),
    never a nested-loop or per-row range join."""
    plan = plans.explain_str(QUERIES["join_asof"](spark, SF_ORACLE))
    assert "NestedLoop" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # shuffle + AQE read


def test_udtf_surface_available(spark):
    """Spark's Python UDTF surface (the 1->n row shape of the reference's
    deftransform) — demonstrated here; production fan-out uses the native
    explode plan (test_transform_fanout_is_narrow)."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="cache_key: string, k: string, v: string")
    class FanOut:
        def eval(self, pred: str, subj: str, obj: str):
            if pred == "CREATE_CHAT":
                yield ("create-thread-user", obj, subj)
                yield ("post-user-thread", subj, obj)
            elif pred == "REPLY_CHAT":
                yield ("post-user-thread", subj, obj)

    rows = FanOut(lit("CREATE_CHAT"), lit("u1"), lit("th1")).collect()
    assert [(r.cache_key, r.k, r.v) for r in rows] == [
        ("create-thread-user", "th1", "u1"),
        ("post-user-thread", "u1", "th1"),
    ]


def test_runtime_bloom_filter_injects_on_scan_backed_verify_join(spark, tmp_path):
    """Runtime bloom-filter injection (SPARK-32268) on the near-dup verify
    join — resolution of the round-2 open item "why does it never fire?":

    InjectRuntimeFilter sizes both sides from their FILE SCANS, so it
    declines the in-session operator, whose shingle/candidate inputs are
    persisted InMemoryRelations (pinned below).  In the production layout
    the same relations are WRITTEN tables (near_dup_verified's docstring:
    write + bucket by doc_id at 100 TB) — and there, with the application
    side over the default 10 GB scan threshold (lowered here) and a
    shuffle join, Spark 4 injects might_contain as expected."""
    from pyspark.sql import functions as F

    from streamsum_spark.operators import dedup

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB")
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        # table-backed production shape: shingle sets + candidates on disk
        sh = dedup.shingle_sets(spark, SF_ORACLE)
        sh.write.mode("overwrite").parquet(str(tmp_path / "sh"))
        (
            spark.read.parquet(str(tmp_path / "sh"))
            .where(F.abs(F.hash("doc_id")) % 20 == 0)
            .select(F.col("doc_id").alias("doc_a"))
            .write.mode("overwrite")
            .parquet(str(tmp_path / "cand"))
        )
        cand = spark.read.parquet(str(tmp_path / "cand")).where(F.col("doc_a") >= 0)
        corpus = spark.read.parquet(str(tmp_path / "sh"))
        verify = cand.join(corpus, F.col("doc_a") == F.col("doc_id"))
        phys = verify._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in phys

        # the persisted in-session operator: no scans to size -> declines
        nd = dedup.near_dup_verified(spark, SF_ORACLE)
        assert "might_contain" not in nd._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_decontaminate_broadcasts_benchmark_grams(spark):
    """The benchmark gram set must broadcast: the corpus side is scanned
    once and never shuffled on grams (no sort-merge join anywhere — the
    only shuffle is the per-doc count aggregation)."""
    from streamsum_spark.operators import dedup as dd

    plan = plans.explain_str(dd.decontaminate(spark, SF_ORACLE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_cm_sketch_has_partial_aggregation(spark):
    """Count-Min cell counts must combine map-side: the shuffle carries at
    most depth x width partials per task, not one row per token."""
    from streamsum_spark.operators import sketches as sk

    assert plans.has_partial_aggregate(sk.cm_sketch(spark, SF_ORACLE))


def test_split_token_windows_has_no_exchange(spark):
    """The sliding-window splitter is split + sequence + explode + slice —
    per-partition narrow work with NO shuffle of any kind: each task
    windows its own documents independently."""
    from streamsum_spark.operators import sampling as sp

    plan = plans.explain_str(sp.split_token_windows(spark, SF_ORACLE))
    assert "Exchange" not in plan, plan


def test_near_dup_tuned_candidate_join_is_equi(spark):
    """Round 12: the tuned (b x r) banding must keep the candidate join
    an equi-join on (band_id, bkey) — never nested-loop/cartesian — and
    its only Python is absent entirely (pure expressions)."""
    from streamsum_spark.operators.dedup import near_dup_tuned

    plan = plans.explain_str(near_dup_tuned(spark, SF_ORACLE, threshold=0.5))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_dedup_paragraphs_stays_jvm_and_shuffles_hashes(spark):
    """Round 12: paragraph dedup's window key is the 32-char md5 (plus
    unique blank keys), so the dedup exchange never carries paragraph
    text twice; no Python anywhere."""
    from streamsum_spark.operators.dedup import dedup_paragraphs

    plan = plans.explain_str(dedup_paragraphs(spark, SF_ORACLE))
    assert "EvalPython" not in plan
    assert "p_md5" in plan  # the exchange key is the constant-width hash


def test_crawl_cap_windows_per_domain_without_global_sort(spark):
    """Round 12: cap_per_domain is one window over the domain — a global
    orderBy (Exchange rangepartitioning over all rows) must never appear."""
    from pyspark.sql import functions as F

    from streamsum_spark.operators.crawl import cap_per_domain

    df = spark.createDataFrame(
        [(f"http://h.d{i % 5}.com/{i}", "t") for i in range(100)],
        "target_uri string, text string",
    )
    plan = plans.explain_str(cap_per_domain(df, cap=3))
    assert "rangepartitioning" not in plan.lower()
    assert "EvalPython" not in plan


def test_warc_text_html_strip_fuses_with_record_scan(spark, tmp_path):
    """Round 12: read_warc_text's HTML strip is pure expressions over the
    record relation — exactly ONE Python node (the record parser's
    mapInPandas), no second EvalPython for the text chain."""
    import gzip

    from streamsum_spark.sources.warc import build_warc_record, read_warc_text

    body = b"<p>x</p>"
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    )
    rec = build_warc_record(
        {
            "WARC-Type": "response",
            "WARC-Record-ID": "<urn:t:1>",
            "WARC-Date": "2024-01-01T00:00:00Z",
            "WARC-Target-URI": "http://x/",
            "Content-Type": "application/http; msgtype=response",
        },
        http,
    )
    d = tmp_path / "w"
    d.mkdir()
    (d / "a.warc.gz").write_bytes(gzip.compress(rec, mtime=0))
    plan = plans.explain_str(read_warc_text(spark, str(d), glob="*"))
    # one PHYSICAL node: "MapInPandas (n)" in the tree (formatted mode
    # repeats the name in the details section — don't count that)
    assert plan.count("MapInPandas (") == 1
    assert "BatchEvalPython" not in plan
