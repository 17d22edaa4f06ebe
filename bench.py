#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is MATERIALIZED end-to-end: the timing action is a full-column
xxhash64 checksum aggregation, so every projection/expression in the plan
is actually evaluated (a bare .count() lets Catalyst prune unevaluated
projections, timing only the scan for projection-only queries).

Each query runs THREE times and the minimum is reported: the min is the
standard noise-robust estimator for shared hosts (co-tenant load adds
one-sided noise only — a query can run slower than its true cost, never
faster), and it still includes codegen/JIT compile on run 1, so the
first-run tail is visible in the max but doesn't corrupt round-over-round
comparisons.  (Round-1 numbers were single-shot .count(); rounds 2-4 were
best-of-2 — see README.md for the comparability note.)

The JSON line also records host load (os.getloadavg() sampled before and
after the run) and per-query max-over-min spread, so the per-round BENCH
artifact distinguishes co-tenant noise from real regressions: rounds 3-4
showed ±20-35%% total swing on byte-identical code, which this metadata
makes attributable at a glance.

Contention contract (round 13): a query whose post-compile runs spread
beyond 1.5x earns up to 2 extra runs (min over all), and the headline
line carries load_start (1-min loadavg sampled BEFORE the Spark session
exists — pure co-tenant signal), load_after, and a `contended` boolean
(high start load, or >=25%% of entries still unstable after re-runs) so
a recorded artifact can't silently overstate the way BENCH_r12 did.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# post-compile max/min ratio beyond which a query's 3 runs are deemed
# contention-suspect and earn up to 2 extra runs (r12 verdict order #1:
# the recorded r12 artifact overstated ~15% purely from co-tenant load)
_SPREAD_BOUND = 1.5

# Headline set: one per operator family (pipeline, caches, read-API, joins,
# aggs, windows, dedup, text, similarity) — kept name-stable across rounds
# for round-over-round comparability.  Names demoted from the declared
# registry (the driver's 50-row CORRECTNESS window) resolve through
# EXTRA below to the same standalone implementations.
HEADLINE = [
    "transform_fanout",
    "count_cache_inc",
    "count_cache_inc_dec",
    "lastn_per_key",
    "counts_merge_actions",
    "topk_by_count_time",
    "join_inner",
    "join_asof",
    "agg_revenue_by_flag",
    "agg_rollup_nation_region",
    "window_rownum_lastn",
    "dedup_events",
    "minhash_signatures",
    "text_token_counts",
    "similarity_topk",
    # round 6 addition (compare totals to r<=5 minus this entry): the
    # incremental state-table layer — 3 bucketed additive merges + read
    "bucketed_state_merge",
    # round 6: same workload through the snapshot-manifest layer (MVCC
    # pointer-swap commits) — the two sink shapes stay directly comparable
    "snapshot_state_merge",
    # round 7 additions (compare totals to r<=6 minus these two): codec
    # decode through the Arrow batch path, and the MVCC read path —
    # regressions there were previously pytest-visible only
    "multimodal_decode",
    "snapshot_read",
    # round 9 additions (compare totals to r<=8 minus these five): the
    # LLM-pipeline composites — LSH near-dup with verified Jaccard,
    # full corpus dedup (pairs -> connected components -> anti-join),
    # Misra-Gries heavy hitters, the materialized-IVF ANN probe, and the
    # 3-micro-batch incremental near-dup stream.  Regressions in the
    # operators the training-data north star names were previously
    # pytest/prose-visible only (r8 verdict item 1).
    "near_dup_verified_cap100",
    "dedup_corpus",
    "heavy_hitters_mg",
    "ann_ivf_partitioned_topk",
    "ann_ivfpq_adc_topk",
    "stream_near_dup_pairs_3batch",
    # round 10 addition (compare totals to r<=9 minus this entry): the
    # steady-state marginal-batch cost of the near-dup stream — batch 3
    # ingested against pre-seeded state (r9 verdict item 4)
    "stream_near_dup_marginal",
    # round 12 additions (compare totals to r<=11 minus these three):
    # the crawl-ingest front door (WARC records -> HTML responses ->
    # text), the threshold-tuned r>1 LSH banding next to the r=1
    # cap100 entry, and the one-pass NB quality-classifier train+score
    "warc_read_text",
    "near_dup_tuned05",
    "classifier_train_score",
    # round 13 addition (compare totals to r<=12 minus this entry): the
    # composed crawl-to-corpus funnel — every stage above chained as
    # one plan family (r12 verdict order #2)
    "corpus_prep_e2e",
    # round 14 addition (compare totals to r<=13 minus this entry): the
    # STREAMING funnel's marginal-shard cost — one new WARC shard
    # ingested against pre-seeded state + the finalize tail (r13
    # verdict order #1); the number an incremental pipeline pays per
    # cycle, next to corpus_prep_e2e's full re-run for the ratio
    "stream_corpus_prep_marginal",
    # round 15 addition (compare totals to r<=14 minus this entry): the
    # same marginal-shard workload through the FROZEN-MODEL O(delta)
    # finalize (r14 verdict order #1) — the per-cycle number an
    # incremental pipeline pays once it accepts frozen-as-of-freeze
    # models; sits next to the exact-mode marginal and corpus_prep_e2e
    # for the three-way cost comparison
    "stream_corpus_prep_frozen_marginal",
]


def bucketed_state_merge(spark, sf_dir):
    """Headline for the state-sink layer: per-user event counts arriving
    as 3 micro-batch deltas, sum-merged into a fresh 16-bucket state
    table (read + re-reduce + atomic swap of touched buckets per merge,
    per-bucket replay manifests), then read back.  Regressions in the
    bucketed merge path are driver-visible through this entry, not only
    pytest-visible."""
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from streamsum_spark import sinks
    from streamsum_spark.tables import table

    target = os.path.join(
        tempfile.gettempdir(), f"bench_state_{uuid.uuid4().hex[:10]}"
    )
    ev = table(spark, sf_dir, "events")
    for i in range(3):
        deltas = (
            ev.where(F.pmod(F.col("event_id"), F.lit(3)) == i)
            .groupBy(F.col("user_id").alias("k"))
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )
        sinks.accumulate_batch(
            spark, target, deltas, ["k"], ["c"],
            epoch_id=i, run_id="bench", n_buckets=16,
        )
    return sinks.read_state_table(spark, target)


def snapshot_state_merge(spark, sf_dir):
    """Same 3-delta accumulate workload as bucketed_state_merge, through
    the snapshot-manifest layer (snapshots.py): immutable generation
    files + one pointer-swap commit per merge.  Keeping both entries
    makes the cost delta between the two state-table shapes (rename-swap
    vs MVCC manifests) driver-visible round over round."""
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from streamsum_spark import snapshots
    from streamsum_spark.tables import table

    target = os.path.join(
        tempfile.gettempdir(), f"bench_snap_{uuid.uuid4().hex[:10]}"
    )
    ev = table(spark, sf_dir, "events")
    for i in range(3):
        deltas = (
            ev.where(F.pmod(F.col("event_id"), F.lit(3)) == i)
            .groupBy(F.col("user_id").alias("k"))
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )
        snapshots.snapshot_accumulate(
            spark, target, deltas, ["k"], ["c"],
            epoch_id=i, run_id="bench", n_buckets=16,
        )
    return snapshots.read_snapshot(spark, target)


def multimodal_decode(spark, sf_dir):
    """Headline for the codec family: 600 real-format blobs (BMP, PPM,
    PNG across all five row filters, baseline+progressive JPEG, WebP
    VP8L/VP8, TIFF, PCM WAV) through extract_features' mapInPandas
    decode.  Since round 9 WebP routes through the libwebp fast path,
    and since round 10 JPEG/PNG/GIF/TIFF route through the JVM ImageIO
    sidecar (jvm_codecs.py), each with a 5% sampled spec cross-check
    (the production posture) — compare r<=9 numbers with that in mind;
    the pure spec-decoder ceiling is recorded separately in
    codec_throughput.  Blob generation (driver-side encoders) is
    memoized and pre-warmed."""
    from streamsum_spark.operators import multimodal as mm

    return mm.extract_features(mm.synthetic_media(spark, n=600))


_SNAP_READ_CACHE: dict[str, str] = {}


def snapshot_read(spark, sf_dir):
    """Headline for the MVCC READ path: read_snapshot (manifest resolve +
    generation-file scan) plus a 1000-key bucket-pruned
    lookup_snapshot_keys against a prebuilt 3-version snapshot table.
    The build is memoized AND pre-run during warm-up (round 8), so all
    three timed runs — and therefore the spread metric, not just the
    min — measure the pure read cost."""
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from streamsum_spark import snapshots
    from streamsum_spark.tables import table

    target = _SNAP_READ_CACHE.get(sf_dir)
    if target is None:
        target = os.path.join(
            tempfile.gettempdir(), f"bench_snapread_{uuid.uuid4().hex[:10]}"
        )
        ev = table(spark, sf_dir, "events")
        for i in range(3):
            deltas = (
                ev.where(F.pmod(F.col("event_id"), F.lit(3)) == i)
                .groupBy(F.col("user_id").alias("k"))
                .agg(F.count(F.lit(1)).cast("long").alias("c"))
            )
            snapshots.snapshot_accumulate(
                spark, target, deltas, ["k"], ["c"],
                epoch_id=i, run_id="bench_read", n_buckets=16,
            )
        _SNAP_READ_CACHE[sf_dir] = target
    full = snapshots.read_snapshot(spark, target)
    lk = snapshots.lookup_snapshot_keys(
        spark, target, ["k"], [(k,) for k in range(0, 2000, 2)]
    )
    return full.unionByName(lk)


def near_dup_verified_cap100(spark, sf_dir):
    """Headline for the dedup family's production pipeline: LSH candidate
    pairs (bucket size capped at 100 — the bound a 100 TB run sets so a
    degenerate bucket can't go quadratic) -> exact n-gram Jaccard verify.
    Each timed run re-tokenizes the corpus once (shared_persist replaces,
    not reuses, the shingle relation per invocation), so the min measures
    the full per-invocation cost."""
    from streamsum_spark.operators.dedup import near_dup_verified

    return near_dup_verified(spark, sf_dir, max_bucket=100)


def dedup_corpus(spark, sf_dir):
    """Headline for end-to-end corpus dedup: verified near-dup pairs ->
    connected components -> anti-join survivors.  The sweep corpus's 10
    exact-duplicate families stress exactly the regime where dedup cost
    grows superlinearly if candidate generation degrades."""
    from streamsum_spark.operators.clusters import dedup_corpus as _dc

    return _dc(spark, sf_dir)


def heavy_hitters_mg(spark, sf_dir):
    """Headline for the sketch family: per-partition Misra-Gries candidate
    pass + exact verification over only the candidates."""
    from streamsum_spark.operators.sketches import heavy_hitters_mg as _hh

    return _hh(spark, sf_dir)


_IVF_LAYOUT_CACHE: dict[str, str] = {}


def ann_ivf_partitioned_topk(spark, sf_dir):
    """Headline for ANN over the materialized IVF layout: centroid route
    + nprobe partition-pruned scan.  The layout build (k-means +
    partitioned write) is memoized per sf_dir and pre-run during warm-up,
    so timed runs measure the QUERY path — manifest-light centroid read,
    partition-filtered list scan, top-k — which is what repeats at
    serving time; the one-time build cost is an indexing job, not a
    query cost."""
    import tempfile
    import uuid

    from streamsum_spark.operators import similarity as sim

    layout = _IVF_LAYOUT_CACHE.get(sf_dir)
    if layout is None:
        layout = os.path.join(
            tempfile.gettempdir(), f"bench_ivf_{uuid.uuid4().hex[:10]}"
        )
        sim.write_embeddings_ivf(spark, sf_dir, layout)
        _IVF_LAYOUT_CACHE[sf_dir] = layout
    return sim.ann_ivf_partitioned_topk(spark, layout, sf_dir, k=10, nprobe=2)


_IVFPQ_LAYOUT_CACHE: dict[str, str] = {}


def ann_ivfpq_adc_topk(spark, sf_dir):
    """Headline for the compact-code ANN path (the 100 TB layout): IVFPQ
    routing via the stored centroids, partition-pruned scan of 4-byte PQ
    codes, ADC scoring with per-list residual tables, exact float rerank
    of the shortlist.  Layout build memoized + pre-warmed like the float
    IVF entry; timed runs measure the query path."""
    import tempfile
    import uuid

    from streamsum_spark.operators import similarity as sim

    layout = _IVFPQ_LAYOUT_CACHE.get(sf_dir)
    if layout is None:
        layout = os.path.join(
            tempfile.gettempdir(), f"bench_ivfpq_{uuid.uuid4().hex[:10]}"
        )
        sim.write_embeddings_ivfpq(spark, sf_dir, layout)
        _IVFPQ_LAYOUT_CACHE[sf_dir] = layout
    return sim.ann_ivfpq_partitioned_topk(spark, layout, sf_dir, k=10, nprobe=2)


_SLICED_DOCS_CACHE: dict[str, str] = {}


def _sliced_docs(spark, sf_dir) -> str:
    """documents corpus split into 3 disjoint single-file slices
    documents_{i}.parquet (memoized per sf_dir) so the streaming entry
    runs a genuine 3-micro-batch ingest with maxFilesPerTrigger=1."""
    import glob as g
    import shutil
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from streamsum_spark.tables import table

    src = _SLICED_DOCS_CACHE.get(sf_dir)
    if src is None:
        src = os.path.join(
            tempfile.gettempdir(), f"bench_docs3_{uuid.uuid4().hex[:10]}"
        )
        os.makedirs(src, exist_ok=True)
        docs = table(spark, sf_dir, "documents")
        for i in range(3):
            part = docs.where(F.pmod(F.col("doc_id"), F.lit(3)) == i)
            tmp = os.path.join(src, f"_slice{i}")
            part.coalesce(1).write.mode("overwrite").parquet(tmp)
            shutil.copy(
                g.glob(os.path.join(tmp, "part-*.parquet"))[0],
                os.path.join(src, f"documents_{i}.parquet"),
            )
            shutil.rmtree(tmp)
        _SLICED_DOCS_CACHE[sf_dir] = src
    return src


def stream_near_dup_pairs_3batch(spark, sf_dir):
    """Headline for incremental (streaming) near-dup: 3 micro-batches of
    new docs LSH-joined against the accumulated bucketed signature/shingle
    stores, verified pairs upserted per batch.  Each timed run ingests
    from scratch into a fresh state dir (the corpus slices are prebuilt
    and memoized), so the min is the full 3-batch ingest cost."""
    from streamsum_spark.streaming import pipeline as sp

    src = _sliced_docs(spark, sf_dir)
    return sp.stream_near_dup_pairs(
        spark, src, glob="documents_*.parquet", max_files_per_trigger=1
    )


_NDUP_SEED_CACHE: dict[str, str] = {}


def _ndup_seed(spark, sf_dir) -> str:
    """State + checkpoint dirs pre-seeded with the first TWO corpus
    slices (memoized per sf_dir, built during warm-up)."""
    import tempfile

    from streamsum_spark.streaming import pipeline as sp

    seed = _NDUP_SEED_CACHE.get(sf_dir)
    if seed is None:
        src = _sliced_docs(spark, sf_dir)
        seed = tempfile.mkdtemp(prefix="bench_ndup_seed_")
        sp.stream_near_dup_pairs(
            spark, src, glob="documents_[01].parquet", max_files_per_trigger=1,
            state_base=os.path.join(seed, "state"),
            checkpoint=os.path.join(seed, "ckpt"),
        )
        _NDUP_SEED_CACHE[sf_dir] = seed
    return seed


def stream_near_dup_marginal(spark, sf_dir):
    """Steady-state twin of the 3-batch entry (r9 verdict item 4): state
    and checkpoint arrive pre-seeded with batches 1-2, and the timed run
    restarts the stream over the widened glob — the file-source log
    skips the seen slices, so ONLY batch 3 is ingested against the
    accumulated stores.  This is the marginal-batch cost that repeats
    forever at scale; the 3-batch entry is ~90% fixed from-scratch
    setup at sf0.1.  The per-run copy of the seeded dirs (a production
    ingest mutates in place instead) rides inside the timed number.

    Composition (one instrumented run at sf0.1 — see SURVEY §2.F):
    ~58% verify + pair-table upsert (the action computing the pruned
    shingle fetch, Jaccard, and pair merge), ~18% the two state-store
    merges, ~6% candidate join, ~5% batch prep, ~2% stream startup —
    regressions here are first a verify/pair-upsert question."""
    import shutil
    import tempfile
    import uuid

    from streamsum_spark.streaming import pipeline as sp

    src = _sliced_docs(spark, sf_dir)
    seed = _ndup_seed(spark, sf_dir)
    run = os.path.join(
        tempfile.gettempdir(), f"bench_ndup_marg_{uuid.uuid4().hex[:10]}"
    )
    shutil.copytree(seed, run)
    return sp.stream_near_dup_pairs(
        spark, src, glob="documents_*.parquet", max_files_per_trigger=1,
        state_base=os.path.join(run, "state"),
        checkpoint=os.path.join(run, "ckpt"),
    )


_WARC_CACHE: dict[str, str] = {}


def _warc_corpus(spark, sf_dir) -> str:
    """documents corpus wrapped as HTML response records and packed into
    .warc.gz files (per-record gzip members), memoized per sf_dir and
    built during warm-up — the timed entry measures the READ path."""
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from streamsum_spark.sources.warc import write_warc
    from streamsum_spark.tables import table

    out = _WARC_CACHE.get(sf_dir)
    if out is None:
        out = os.path.join(
            tempfile.gettempdir(), f"bench_warc_{uuid.uuid4().hex[:10]}"
        )
        # 64 registered domains (host h.d{k}.com -> domain d{k}.com) so
        # the corpus_prep_e2e entry's per-domain cap stage has real
        # domain cardinality to bind on
        docs = table(spark, sf_dir, "documents").select(
            F.lit("response").alias("rec_type"),
            F.concat(
                F.lit("http://h.d"),
                F.pmod(F.col("doc_id"), F.lit(64)),
                F.lit(".com/"),
                F.col("doc_id"),
            ).alias("target_uri"),
            F.lit("2024-01-01T00:00:00Z").alias("warc_date"),
            F.lit("application/http; msgtype=response").alias("content_type"),
            F.encode(
                F.concat(
                    F.lit(
                        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                        "<html><body><h1>Doc</h1><p>"
                    ),
                    F.col("text"),
                    F.lit("</p></body></html>"),
                ),
                "UTF-8",
            ).alias("body"),
        )
        write_warc(docs.repartition(8), out, warc_max_bytes=4 << 20).collect()
        _WARC_CACHE[sf_dir] = out
    return out


def warc_read_text(spark, sf_dir):
    """Headline for the crawl-ingest front door: WARC files (per-record
    gzip members) -> streamed record parse + HTTP decomposition -> the
    pure-expression HTML strip.  The corpus build is memoized and
    pre-warmed; timed runs measure the read+extract path a crawl
    pipeline repeats per shard."""
    from streamsum_spark.sources.warc import read_warc_text

    return read_warc_text(spark, _warc_corpus(spark, sf_dir))


def corpus_prep_e2e(spark, sf_dir):
    """Headline for the COMPOSED crawl-to-corpus funnel (r12 verdict
    order #2): WARC ingest -> paragraph dedup -> per-domain cap -> NB
    quality gate -> tuned near-dup -> semantic dedup (hashed
    embeddings) -> sequence packing, as ONE chained plan family over
    the memoized WARC corpus.  Each timed run pays the full pipeline
    including NB training and the k-means fit — the number a user
    preparing a corpus actually experiences.  Stage-by-stage survivor
    equality vs the individual operators is pinned in
    tests/test_corpus_prep.py."""
    from streamsum_spark.corpus_prep import corpus_prep_e2e as _cp

    return _cp(
        spark,
        _warc_corpus(spark, sf_dir),
        domain_cap=50,
        n_lists=8,
        cache_token=f"bench_corpus_prep:{sf_dir}",
    )


_CPREP_SEED_CACHE: dict[str, str] = {}


def _cprep_seed(spark, sf_dir) -> str:
    """Streaming corpus-prep state pre-seeded with every WARC partition
    except the last (memoized per sf_dir, built during warm-up)."""
    import tempfile

    from streamsum_spark.corpus_prep import stream_corpus_prep_ingest

    seed = _CPREP_SEED_CACHE.get(sf_dir)
    if seed is None:
        import atexit
        import shutil

        from streamsum_spark.corpus_prep import stream_corpus_prep_stages

        src = _warc_corpus(spark, sf_dir)
        seed = tempfile.mkdtemp(prefix="bench_cprep_seed_")
        atexit.register(shutil.rmtree, seed, ignore_errors=True)
        stream_corpus_prep_ingest(
            spark, src, glob="warc-0000[0-6]-*.warc.gz",
            state_base=os.path.join(seed, "state"),
            checkpoint=os.path.join(seed, "ckpt"),
        )
        # one finalize over the seeded state (same params as the timed
        # entry) so its content-hash band store exists: the timed run
        # then re-derives LSH bands only for the new shard's docs and
        # for docs whose cleaned text the new shard changed — the
        # steady-state shape, not a first-cycle cold start
        stream_corpus_prep_stages(
            spark, os.path.join(seed, "state"), domain_cap=50, n_lists=8,
            cache_token=f"bench_cprep_seed:{sf_dir}",
        )["packed"].count()
        _CPREP_SEED_CACHE[sf_dir] = seed
    return seed


def stream_corpus_prep_marginal(spark, sf_dir):
    """Headline for the STREAMING corpus-prep funnel's steady-state
    shape (r13 verdict order #1): state arrives pre-seeded with 7 of
    the crawl's 8 WARC partitions, and the timed run pays what an
    incremental 100 TB pipeline pays per cycle — parse ONLY the new
    shard's bytes (the file-source log skips the seen ones) + three
    bucketed state upserts + the finalize tail (cap -> NB gate ->
    near-dup -> semantic -> pack) over the accumulated PARSED state.
    The tail re-runs because those stages are whole-corpus functions
    (the NB model trains on the capped union — membership cannot
    finalize per batch); the raw-bytes work, the funnel's dominant
    cost, is never re-paid — compare against corpus_prep_e2e, which
    re-parses the entire crawl every run.  The per-run copy of the
    seeded dirs rides inside the timed number (a production ingest
    mutates in place).  Run dirs are reclaimed at process exit
    (atexit — OUTSIDE every timed region; the returned relation reads
    the run dir lazily, so an inline rmtree would race the
    materialization), so repeated bench runs leave nothing in /tmp."""
    import atexit
    import shutil
    import tempfile
    import uuid

    from streamsum_spark.corpus_prep import stream_corpus_prep

    src = _warc_corpus(spark, sf_dir)
    seed = _cprep_seed(spark, sf_dir)
    run = os.path.join(
        tempfile.gettempdir(), f"bench_cprep_marg_{uuid.uuid4().hex[:10]}"
    )
    shutil.copytree(seed, run)
    atexit.register(shutil.rmtree, run, ignore_errors=True)
    return stream_corpus_prep(
        spark, src, glob="warc-*.warc.gz",
        state_base=os.path.join(run, "state"),
        checkpoint=os.path.join(run, "ckpt"),
        domain_cap=50, n_lists=8,
        cache_token=f"bench_cprep_marg:{sf_dir}",
    )


_CPREP_FZ_SEED_CACHE: dict[str, str] = {}


def _cprep_frozen_seed(spark, sf_dir) -> str:
    """Frozen-mode corpus-prep state pre-seeded with every WARC
    partition except the last, INCLUDING the first full finalize that
    trains and freezes the NB gate + quantizer (memoized per sf_dir,
    built during warm-up) — so the timed entry pays a steady-state
    frozen cycle, never the freeze itself."""
    import atexit
    import shutil
    import tempfile

    from streamsum_spark.corpus_prep import (
        stream_corpus_prep_ingest,
        stream_corpus_prep_stages,
    )

    seed = _CPREP_FZ_SEED_CACHE.get(sf_dir)
    if seed is None:
        src = _warc_corpus(spark, sf_dir)
        seed = tempfile.mkdtemp(prefix="bench_cprep_fzseed_")
        atexit.register(shutil.rmtree, seed, ignore_errors=True)
        stream_corpus_prep_ingest(
            spark, src, glob="warc-0000[0-6]-*.warc.gz",
            state_base=os.path.join(seed, "state"),
            checkpoint=os.path.join(seed, "ckpt"),
        )
        stream_corpus_prep_stages(
            spark, os.path.join(seed, "state"), mode="frozen",
            domain_cap=50, n_lists=8,
            cache_token=f"bench_cprep_fzseed:{sf_dir}",
        )["packed"].count()
        _CPREP_FZ_SEED_CACHE[sf_dir] = seed
    return seed


def stream_corpus_prep_frozen_marginal(spark, sf_dir):
    """Headline for the frozen-model O(delta) finalize (r14 verdict
    order #1): state arrives pre-seeded with 7 of the crawl's 8 WARC
    partitions AND an already-frozen model set, and the timed run pays
    a steady-state frozen cycle — parse ONLY the new shard's bytes,
    re-curate (gate/bands/embedding/pairs) ONLY the new shard's docs
    plus any old doc whose cleaned text the shard changed, maintain the
    append-stable pack state, and emit ``packed_delta``: this cycle's
    NEW chunks, the relation an incremental pipeline actually hands its
    consumer per cycle (old chunks are immutable under the append-pack
    contract — a consumer already holds them).  Compare three ways:
    corpus_prep_e2e (full batch re-run), stream_corpus_prep_marginal
    (incremental parse + exact whole-corpus finalize + full re-emit),
    and this entry (incremental parse + O(delta) finalize + delta
    emit).  Same run-dir hygiene as the exact-mode marginal."""
    import atexit
    import shutil
    import tempfile
    import uuid

    from streamsum_spark.corpus_prep import (
        stream_corpus_prep_ingest,
        stream_corpus_prep_stages,
    )

    src = _warc_corpus(spark, sf_dir)
    seed = _cprep_frozen_seed(spark, sf_dir)
    run = os.path.join(
        tempfile.gettempdir(), f"bench_cprep_fzmarg_{uuid.uuid4().hex[:10]}"
    )
    shutil.copytree(seed, run)
    atexit.register(shutil.rmtree, run, ignore_errors=True)
    stream_corpus_prep_ingest(
        spark, src, glob="warc-*.warc.gz",
        state_base=os.path.join(run, "state"),
        checkpoint=os.path.join(run, "ckpt"),
    )
    return stream_corpus_prep_stages(
        spark, os.path.join(run, "state"),
        domain_cap=50, n_lists=8, mode="frozen",
        cache_token=f"bench_cprep_fzmarg:{sf_dir}",
    )["packed_delta"]


def near_dup_tuned05(spark, sf_dir):
    """Headline for the threshold-tuned LSH path: (b, r) chosen for
    Jaccard 0.5 (r>1 band keys suppress sub-threshold candidates before
    the verify join), next to the r=1 cap100 entry so the cost delta
    between the two banding regimes stays driver-visible."""
    from streamsum_spark.operators.dedup import near_dup_tuned

    return near_dup_tuned(spark, sf_dir, threshold=0.5)


def classifier_train_score(spark, sf_dir):
    """Headline for the quality-classifier family: one-pass NB training
    on half the corpus (lang labels), broadcast-apply scoring on the
    other half.  Train AND apply ride in the timed number — the train
    is a single sufficient-statistics shuffle, which is the operator's
    scale claim."""
    from pyspark.sql import functions as F

    from streamsum_spark.operators.classifier import nb_scores, train_nb
    from streamsum_spark.tables import table

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.col("lang").alias("label"), "text"
    )
    model = train_nb(docs.where(F.col("doc_id") % 2 == 0))
    return nb_scores(
        docs.where(F.col("doc_id") % 2 == 1).select("doc_id", "text"), model
    )


def codec_throughput() -> dict:
    """Per-format decode throughput — the pure-Python/numpy spec-decoder
    ceiling as a NUMBER (r8 verdict item 2), plus the native fast path
    where a system codec is bound (currently WebP via libwebp).

    One fixed gradient image per format, encoded driver-side by the
    in-repo fixture encoders, decoded best-of-2; reports input-bytes
    MB/s (what a 100 TB corpus pays per blob byte) AND megapixels/s
    (decode work normalized across containers whose byte sizes differ
    by 50x for the same pixels).  Runs driver-side on purpose: this is
    single-core codec cost, not cluster throughput — multiply by cores."""
    import numpy as np

    from streamsum_spark.operators import multimodal as mm
    from streamsum_spark.operators import native_codecs as nc
    from streamsum_spark.operators import tiff as tf
    from streamsum_spark.operators.flac import encode_flac
    from streamsum_spark.operators.gif import encode_gif
    from streamsum_spark.operators.jpeg import encode_jpeg, encode_jpeg_progressive
    from streamsum_spark.operators.vp8_encode import encode_webp_lossy
    from streamsum_spark.operators.webp import encode_webp_lossless

    def img(w, h):
        yy, xx = np.mgrid[0:h, 0:w]
        return np.stack(
            [(xx * 7) % 256, (yy * 11) % 256, (xx + yy) % 256], 2
        ).astype(np.uint8)

    big, mid = img(512, 384), img(256, 192)
    tone = (
        np.sin(np.arange(240_000, dtype=np.float64) * 0.05) * 12000
    ).astype(np.int16).reshape(-1, 1)
    cases = {
        "bmp": (mm.encode_bmp(big), big.shape),
        "ppm": (mm.encode_ppm(big), big.shape),
        "png": (mm.encode_png(big, filter_type=4), big.shape),
        # GIF is palettized: quantize the gradient to 216 websafe colors
        "gif": (encode_gif((big // 51) * 51), big.shape),
        "tiff_lzw": (tf.encode_tiff(big, compression="lzw", predictor=2), big.shape),
        # JPEG at 512x384 (not mid): the sidecar's per-blob pipe
        # roundtrip dominates tiny blobs; crawl JPEGs are Mpix-scale
        "jpeg_baseline": (encode_jpeg(big), big.shape),
        "jpeg_progressive": (encode_jpeg_progressive(big), big.shape),
        "webp_vp8l": (encode_webp_lossless(big), big.shape),
        "webp_vp8": (encode_webp_lossy(mid, quality=85), mid.shape),
        "wav_pcm": (mm.encode_wav(tone, 48000), None),
        "flac": (encode_flac(tone, 48000), None),
    }
    out: dict[str, dict] = {}

    def clock(fn, blob, shape):
        dt = min(
            (lambda t0: (fn(blob), time.perf_counter() - t0))(time.perf_counter())[1]
            for _ in range(2)
        )
        entry = {"mb_s": round(len(blob) / dt / 1e6, 2)}
        if shape is not None:
            entry["mpix_s"] = round(shape[0] * shape[1] / dt / 1e6, 3)
        return entry

    was = mm.NATIVE_DECODE
    mm.NATIVE_DECODE = False  # measure the spec-decoder ceiling
    try:
        for name, (blob, shape) in cases.items():
            fn = mm.decode_audio if shape is None else mm.decode_image
            out[name] = clock(fn, blob, shape)
        if nc.HAVE_LIBWEBP:
            for name in ("webp_vp8l", "webp_vp8"):
                blob, shape = cases[name]
                out[name + "_native"] = clock(nc.decode_webp_rgb, blob, shape)
        from streamsum_spark.operators import jvm_codecs as jc

        if jc.have_jvm_imageio():
            # the JVM ImageIO sidecar path (r9 verdict item 1): JPEG —
            # the dominant crawl format — plus PNG/GIF/TIFF
            for name in ("jpeg_baseline", "jpeg_progressive", "png", "gif",
                         "tiff_lzw"):
                blob, shape = cases[name]
                jc.decode_image_jvm(blob)  # exclude sidecar start from run 1
                out[name + "_native"] = clock(jc.decode_image_jvm, blob, shape)
        # AVI/MJPEG — the decodable video class (round 11): whole-file
        # frame decode, pixels = w*h*frames.  The spec row is the
        # pure-Python ceiling; the routed row re-enables NATIVE_DECODE
        # so each frame pays the sidecar fast path PLUS the actual
        # per-blob sampled verification (measured, not computed).
        from streamsum_spark.operators.avi import encode_avi_mjpeg

        avi_frames = [img(512, 384) for _ in range(6)]
        avi_blob = encode_avi_mjpeg(avi_frames, rate=25, table_less=True)
        avi_pix = 512 * 384 * len(avi_frames)

        def clock_frames(blob):
            dt = min(
                (lambda t0: (mm.decode_frames(blob),
                             time.perf_counter() - t0))(time.perf_counter())[1]
                for _ in range(2)
            )
            return {"mb_s": round(len(blob) / dt / 1e6, 2),
                    "mpix_s": round(avi_pix / dt / 1e6, 3)}

        out["avi_mjpeg"] = clock_frames(avi_blob)
        if jc.have_jvm_imageio():
            mm.NATIVE_DECODE = True
            out["avi_mjpeg_routed"] = clock_frames(avi_blob)
            out["avi_mjpeg_routed"]["verify_pct"] = mm.NATIVE_VERIFY_PCT.get(
                "JPEG", 5.0
            )
            mm.NATIVE_DECODE = False
    finally:
        mm.NATIVE_DECODE = was
    # the decode-free header probe: one number that shows why curation
    # filters should consult headers, not decodes — MB/s over the same
    # blob set the decoders above are measured on
    from streamsum_spark.operators.media_probe import probe_header

    probe_blobs = [blob for blob, _ in cases.values()]
    total = sum(len(x) for x in probe_blobs)
    dt = min(
        (lambda t0: ([probe_header(x) for x in probe_blobs],
                     time.perf_counter() - t0))(time.perf_counter())[1]
        for _ in range(2)
    )
    out["header_probe"] = {"mb_s": round(total / dt / 1e6, 2),
                           "blobs_s": round(len(probe_blobs) / dt)}
    # resize is the post-decode half of the multimodal prep path: record
    # the kernel's single-core rate (input Mpix/s) next to the decoders
    # it follows — model-input normalization (to 224x224) at the bench
    # image size and at a camera-sized downscale
    from streamsum_spark.operators.resize import resize_image

    for name, (src_h, src_w) in (
        ("resize_512x384_to_224", (384, 512)),
        ("resize_2000x1500_to_224", (1500, 2000)),
    ):
        src = img(src_w, src_h)
        dt = min(
            (lambda t0: (resize_image(src, 224, 224), time.perf_counter() - t0))(
                time.perf_counter()
            )[1]
            for _ in range(2)
        )
        out[name] = {"mpix_s": round(src_h * src_w / dt / 1e6, 3)}
    # audio twin: polyphase 48k-stereo -> 16k-mono (the ASR front-end
    # contract), reported as realtime multiple per core
    from streamsum_spark.operators.audio_prep import downmix_mono, resample_audio

    sec10 = np.tile(tone[:240_000], (2, 2))[:480_000]
    dt = min(
        (lambda t0: (resample_audio(downmix_mono(sec10), 48000, 16000),
                     time.perf_counter() - t0))(time.perf_counter())[1]
        for _ in range(2)
    )
    out["audio_resample_48k_to_16k_mono"] = {
        "x_realtime": round(len(sec10) / 48000 / dt, 1)
    }
    # what the ROUTED path actually pays: native decode plus the
    # deterministic per-format sampled spec cross-check (r10 verdict
    # order #1: the sample pct is sized per format so expected verify
    # time is a bounded fraction of native decode time, floored at
    # 0.2%).  The chosen pct is recorded next to each routed_mb_s row
    # so the verification budget stays auditable.  GIF's native row is
    # a capability measurement only (GIF does not route native; ImageIO
    # is lenient about truncated LZW).
    fmt_of = {"png": "PNG", "jpeg_baseline": "JPEG", "jpeg_progressive": "JPEG",
              "tiff_lzw": "TIFF", "webp_vp8l": "WebP", "webp_vp8": "WebP"}
    for name, entry in list(out.items()):
        if not name.endswith("_native") or name == "gif_native":
            continue
        base = name[: -len("_native")]
        spec = out.get(base)
        if spec and spec.get("mb_s"):
            pct = mm.NATIVE_VERIFY_PCT.get(fmt_of.get(base, ""), 5.0)
            eff = 1.0 / (1.0 / entry["mb_s"] + pct / 100.0 / spec["mb_s"])
            out[name]["routed_mb_s"] = round(eff, 2)
            out[name]["verify_pct"] = pct
    return out


def extra_queries() -> dict:
    """Headline entries NOT in the declared registry (demoted names plus
    bench-only composites).  Shared with tools/scale_sweep.py so the
    sweep and the per-round bench always resolve the same functions."""
    from streamsum_spark.operators import relational as rel
    from streamsum_spark.operators import similarity as sim
    from streamsum_spark.operators import text as tx

    return {
        "agg_rollup_nation_region": rel.agg_rollup_nation_region,
        "window_rownum_lastn": rel.window_rownum_lastn,
        "text_token_counts": tx.text_token_counts,
        "similarity_topk": sim.similarity_topk,
        "bucketed_state_merge": bucketed_state_merge,
        "snapshot_state_merge": snapshot_state_merge,
        "multimodal_decode": multimodal_decode,
        "snapshot_read": snapshot_read,
        "near_dup_verified_cap100": near_dup_verified_cap100,
        "dedup_corpus": dedup_corpus,
        "heavy_hitters_mg": heavy_hitters_mg,
        "ann_ivf_partitioned_topk": ann_ivf_partitioned_topk,
        "ann_ivfpq_adc_topk": ann_ivfpq_adc_topk,
        "stream_near_dup_pairs_3batch": stream_near_dup_pairs_3batch,
        "stream_near_dup_marginal": stream_near_dup_marginal,
        "warc_read_text": warc_read_text,
        "near_dup_tuned05": near_dup_tuned05,
        "classifier_train_score": classifier_train_score,
        "corpus_prep_e2e": corpus_prep_e2e,
        "stream_corpus_prep_marginal": stream_corpus_prep_marginal,
        "stream_corpus_prep_frozen_marginal": stream_corpus_prep_frozen_marginal,
    }


def prewarm(spark, sf_dir) -> None:
    """One-time per-(process, sf_dir) warm-up so first timed runs measure
    steady-state cost, not JIT/build noise: JVM + parquet footers, the
    Python-worker pool + Arrow path (r7: 4.5x spread was exactly this),
    the memoized media table / snapshot table / IVF layout / sliced
    corpus builds."""
    from streamsum_spark.entry_queries import QUERIES
    from streamsum_spark.operators import multimodal as mm

    QUERIES["extract_events"](spark, sf_dir).limit(1).collect()
    _materialize(mm.extract_features(mm.synthetic_media(spark, n=8)))
    mm.synthetic_media(spark, n=600)
    snapshot_read(spark, sf_dir).limit(1).collect()
    ann_ivf_partitioned_topk(spark, sf_dir).limit(1).collect()
    ann_ivfpq_adc_topk(spark, sf_dir).limit(1).collect()
    _sliced_docs(spark, sf_dir)
    _ndup_seed(spark, sf_dir)  # 2-batch state seed for the marginal entry
    _warc_corpus(spark, sf_dir)  # memoized crawl corpus for warc_read_text
    _cprep_seed(spark, sf_dir)  # 7/8-shard state seed for the funnel entry
    _cprep_frozen_seed(spark, sf_dir)  # + the frozen-model twin's seed
    # one full multimodal_decode pass: formats absent from the 8-blob
    # Arrow warm (TIFF LZW, progressive JPEG, lossy VP8) otherwise pay
    # their first-call numpy compile inside timed run 1 (r9 spread 2.1x)
    _materialize(multimodal_decode(spark, sf_dir))


def _materialize(df) -> int:
    """Full-plan checksum: hash every column of every row, XOR-fold.
    Forces evaluation of all projections (unlike count(), which lets
    Catalyst prune them) while collecting only one scalar to the driver;
    bit_xor cannot overflow under ANSI mode."""
    from pyspark.sql import functions as F

    row = df.agg(
        F.expr(
            "bit_xor(xxhash64(" + ", ".join(f"`{c}`" for c in df.columns) + "))"
        ).alias("checksum"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return int(row["n"])


def main() -> None:
    from streamsum_spark.session import get_spark
    from streamsum_spark.entry_queries import QUERIES

    extra = extra_queries()

    # sampled BEFORE the Spark session exists: at this point the 1-min
    # loadavg is co-tenant work, not our own executors — the one load
    # number that cleanly separates "busy host" from "busy bench"
    load_start = os.getloadavg()

    spark = get_spark("streamsum_spark_bench")
    sf = None
    try:
        sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", ""))
    except ValueError:
        pass

    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    reruns: dict[str, int] = {}
    n_unstable = 0
    prewarm(spark, SF_DIR)

    load_before = os.getloadavg()
    for name in HEADLINE:
        fn = QUERIES.get(name) or extra[name]

        def one_run() -> float:
            t0 = time.perf_counter()
            n = _materialize(fn(spark, SF_DIR))
            dt = time.perf_counter() - t0
            assert n >= 0
            return dt

        runs = [one_run() for _ in range(3)]
        # contention guard (r12 verdict order #1): when the post-compile
        # runs still disagree by >1.5x — run 1 is excluded from the
        # trigger because its codegen/JIT tail is expected — the min is
        # probably a co-tenant-inflated estimate; buy up to 4 extra
        # runs (r15 verdict item 4 raised the budget from 2: spreads of
        # 1.6-3.0 survived the smaller budget and burned a verdict
        # section on phantom regressions) and keep the min over all.
        # One-sided noise means extra runs can only IMPROVE the
        # estimator.
        while (
            len(runs) < 7
            and min(runs) > 0.2  # sub-0.2 s entries: spread is all jitter
            and max(runs[1:]) / max(min(runs), 1e-9) > _SPREAD_BOUND
        ):
            runs.append(one_run())
        if len(runs) > 3:
            reruns[name] = len(runs) - 3
        if (
            min(runs) > 0.2
            and max(runs[1:]) / max(min(runs), 1e-9) > _SPREAD_BOUND
        ):
            # still unstable after the extra budget: count toward the
            # run-level contended verdict
            n_unstable += 1
        timings[name] = round(min(runs), 3)
        # max/min over the runs: ~1 means a stable host; co-tenant load
        # spikes show up here without touching the min estimator
        spreads[name] = round(max(runs) / max(min(runs), 1e-9), 2)
    load_after = os.getloadavg()
    total = round(sum(timings.values()), 3)
    # the recorded artifact says so itself when its numbers are suspect:
    # high 1-min load at process start (before OUR Spark session did any
    # work — that load is co-tenants) or a quarter of the headline
    # entries still spread-unstable after re-runs
    ncpu = os.cpu_count() or 1
    contended = (
        load_start[0] > 0.25 * ncpu
        or n_unstable * 4 > len(HEADLINE)
    )
    # side metrics each print as their OWN earlier stdout line: the
    # driver records a bounded (~2000-char) TAIL of stdout, and r8/r9
    # both lost the front of the headline JSON to ride-along dicts
    # (codec throughput, full sweep, loadavg).  The headline line is
    # FINAL and size-asserted so the "queries" dict can never be pushed
    # out of the recorded window again (r9 verdict "what's wrong" #1).
    print(json.dumps({
        # single-core spec-decoder ceiling per format (+ native fast
        # path where bound) — NOT part of the query total
        "metric": "codec_throughput",
        "formats": codec_throughput(),
    }))
    print(json.dumps({
        "metric": "bench_loadavg",
        "start": [round(x, 2) for x in load_start],
        "before": [round(x, 2) for x in load_before],
        "after": [round(x, 2) for x in load_after],
        "reruns": reruns,
    }))
    out = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "runs_per_query": 3,
        # contention contract (r12): 1-min loadavg at process start
        # (pre-Spark = co-tenants only) and post-run, plus the verdict —
        # IN the headline line so the recorded artifact carries its own
        # trust label
        "load_start": round(load_start[0], 1),
        "load_after": round(load_after[0], 1),
        "contended": contended,
    }
    # ride-along scale-factor sweep (tools/scale_sweep.py): one sf1.0
    # datapoint per query so the per-round artifact carries scaling
    # SLOPES, not just one scale's absolute times.  The FULL sweep block
    # (and the per-query slope dict) print on their OWN earlier lines;
    # only the compact superlinear list rides in the headline.
    sweep_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "BENCH_SF1_SWEEP.json")
    if os.path.exists(sweep_path):
        try:
            with open(sweep_path) as fh:
                sweep = json.load(fh)
            print(json.dumps({"metric": "sf_sweep", **sweep}))
            print(json.dumps({"metric": "sf_sweep_slope",
                              "slope": sweep.get("slope", {})}))
            out["sf_sweep_superlinear"] = sweep.get("superlinear", [])
        except (OSError, json.JSONDecodeError):
            pass
    # per-query max/min spread on its OWN penultimate line (round 12):
    # with 29 headline entries the spread dict pushed the headline line
    # against the 1800-char guard; printed here — after the sweep lines,
    # directly before the headline — it still lands inside the driver's
    # recorded stdout tail next to the headline
    print(json.dumps({"metric": "bench_spread", "spread": spreads}))
    line = json.dumps(out)
    # guard the driver's ~2000-char recorded stdout tail.  NOT an
    # assert (vanishes under -O) and NEVER instead of printing: if a
    # future field grows the line, the headline still prints (partial
    # data beats none after minutes of timed work) and the breach is
    # loud on stderr + exit code for the next round to fix.
    print(line)
    if len(line) >= 1800:
        print(f"headline line {len(line)} chars >= 1800 — would overflow "
              "the driver's recorded stdout tail; move whatever grew to "
              "its own earlier line", file=sys.stderr)
        sys.exit(3)


if __name__ == "__main__":
    main()
