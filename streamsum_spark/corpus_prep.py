"""The composed corpus-preparation pipeline, in BOTH execution shapes:
the batch funnel (corpus_prep_e2e, r12 verdict order #2) and its
streaming twin (stream_corpus_prep, r13 verdict order #1 — incremental
ingest state + a finalize running the identical curation tail; see the
block comment above stream_corpus_prep_ingest for the precise
incremental/finalize split and why it is forced by semantics).  Every
stage of the crawl-to-corpus chain the individual operators implement,
chained end-to-end with NO driver-side seam —

    WARC shards -> read_warc_text -> canonical-URL dedup -> paragraph
    dedup -> per-domain cap -> NB quality gate -> threshold-tuned
    near-dup -> semantic dedup -> sequence packing

This is the capstone proof that the operators COMPOSE: each stage
consumes the previous stage's DataFrame directly (the only driver-side
values are the NB model's per-label rows and the k-means centroids,
both bounded by construction), so the whole funnel is one lazily-built
plan family over the WARC scan.  Stage-by-stage survivor equality
against the individually-invoked operators is pinned in
tests/test_corpus_prep.py; the end-to-end wall-clock is a bench.py
headline entry (corpus_prep_e2e).

Scale posture — inherited, not re-derived: every stage keeps its own
operator's 100 TB shape (per-file WARC isolation, hash-width paragraph
keys, domain-keyed cap window, one sufficient-statistics shuffle +
broadcast model, banded candidate join, per-cluster semantic pairs,
partitioned pack streams).  The intermediates that multiple stages
consume are pinned via shared_persist under ``cache_token`` — at
100 TB the same role is played by writing them out as tables between
stages.

Quality-gate labels: a production run trains the classifier on curated
seed corpora (wiki-vs-crawl, the CCNet recipe).  Self-contained here,
the seed labels come from a deterministic word-count heuristic
(``min_words``) on the capped corpus itself and the NB gate re-applies
what it learned — the mechanism (train -> broadcast -> margin gate) is
exactly the production one, only the label source is simplified.

Semantic stage embeddings: hashed_text_embeddings (feature hashing)
gives the text-only corpus a deterministic dense vector per doc; a
deployment passes real model embeddings through the same ``emb=``
parameter of semantic_dedup and nothing else changes.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def doc_id_col() -> Column:
    """Document identity for WARC-ingested pages: xxhash64 of
    (target_uri, warc_file, ordinal) — the URI alone is NOT an identity
    (a real crawl re-fetches pages, and two fetches of one URI are two
    documents with different text), so the per-file record ordinal the
    WARC reader threads through makes every FETCH a distinct doc_id and
    keeps the URL-dedup survivor deterministic.

    64-bit honesty: at multi-billion-document scale a birthday
    collision between two distinct fetches becomes likely (~50% near
    5e9 docs); a collision merges the two in the dedup windows (the
    ``tiebreak_cols`` keep even that survivor deterministic).
    Deployments past ~1e9 docs should widen the key — e.g. md5 of the
    same triple — at the cost of doubling the join-key width on every
    doc_id-keyed shuffle."""
    return F.xxhash64("target_uri", "warc_file", "ordinal")


def corpus_prep_stages(
    spark: SparkSession,
    warc_dir: str,
    glob: str = "*.warc.gz",
    domain_cap: int = 1000,
    min_words: int = 40,
    nd_threshold: float = 0.5,
    sem_threshold: float = 0.9,
    emb_dim: int = 16,
    chunk_budget: int = 2048,
    n_lists: int | None = None,
    kmeans_max_iter: int = 8,
    nb_bigrams: bool = False,
    cache_token: str = "corpus_prep",
) -> dict[str, DataFrame]:
    """Every stage's output relation, keyed by stage name — the form the
    stage-equality pins (and any audit of the funnel) consume.  Building
    the dict runs the bounded driver-side steps (NB model rows, k-means
    centroids); the relations themselves stay lazy."""
    from streamsum_spark.cached import shared_persist
    from streamsum_spark.operators.crawl import (
        dedup_by_canonical_url,
        with_url_parts,
    )
    from streamsum_spark.operators.dedup import dedup_paragraphs
    from streamsum_spark.sources.warc import read_warc_text

    stages: dict[str, DataFrame] = {}

    # 1. ingest: WARC -> text, with a per-FETCH doc identity (URI +
    # file + record ordinal — see doc_id_col for the 64-bit honesty
    # note; WARC records carry no numeric id).  with_url_parts adds
    # canonical_url + host in ONE projection — the funnel's single
    # try_parse_url family: the URL-dedup window and the domain cap
    # both consume these columns instead of re-parsing the URL
    from pyspark.sql import Observation

    ingest_obs = Observation()
    # the observe() tap is the A11 metrics machinery in batch form: it
    # records the ingest cardinality AS the rows flow through the first
    # downstream action, so funnel_report's `ingested` count never has
    # to re-run the WARC parse (the funnel's dominant cost) just for
    # accounting — at 100 TB an audit row must not re-read crawl bytes
    ingested = with_url_parts(
        read_warc_text(spark, warc_dir, glob)
        .select(
            doc_id_col().alias("doc_id"),
            "target_uri",
            "warc_file",
            "ordinal",
            "text",
        )
        .observe(ingest_obs, F.count(F.lit(1)).alias("n"))
    )
    # carried on the relation itself (not a stages entry) so the dict
    # stays DataFrame-pure for pins/audits that walk every value
    ingested._streamsum_ingest_obs = ingest_obs
    stages["ingested"] = ingested

    # 1b. URL-level dedup: re-fetches of one page differ by tracking
    # params / fragments far more often than by content — keep the
    # smallest doc_id per CANONICAL URL (one window, row-unique
    # fallback keys for unparseable URLs, same posture as the cap).
    # (warc_file, ordinal) tiebreaks make the survivor deterministic
    # even under a doc_id hash collision between two fetches.
    # persisted: both the paragraph explode and the text rebuild join
    # consume it — unpinned, each would re-run the WARC parse + window
    url_deduped = shared_persist(
        (cache_token, "url"),
        dedup_by_canonical_url(
            ingested,
            tiebreak_cols=("warc_file", "ordinal"),
            canon_col="canonical_url",
        ).select("doc_id", "target_uri", "host", "text"),
    )
    stages["url_deduped"] = url_deduped

    # 2. paragraph-level exact dedup (boilerplate strip), rebuilt text
    paras = dedup_paragraphs(
        spark, "", docs=url_deduped.select("doc_id", "text")
    ).select("doc_id", F.col("text_clean").alias("text"))
    para_deduped = url_deduped.drop("text").join(paras, "doc_id")
    stages["para_deduped"] = para_deduped

    stages.update(
        _curate_stages(
            spark,
            para_deduped,
            domain_cap=domain_cap,
            min_words=min_words,
            nd_threshold=nd_threshold,
            sem_threshold=sem_threshold,
            emb_dim=emb_dim,
            chunk_budget=chunk_budget,
            n_lists=n_lists,
            kmeans_max_iter=kmeans_max_iter,
            nb_bigrams=nb_bigrams,
            cache_token=cache_token,
        )
    )
    return stages


def _curate_stages(
    spark: SparkSession,
    para_deduped: DataFrame,
    *,
    domain_cap: int,
    min_words: int,
    nd_threshold: float,
    sem_threshold: float,
    emb_dim: int,
    chunk_budget: int,
    n_lists: int | None,
    kmeans_max_iter: int,
    nb_bigrams: bool,
    cache_token: str,
    nd_pairs_fn=None,
) -> dict[str, DataFrame]:
    """Funnel stages 3-7 (cap -> NB gate -> near-dup -> semantic ->
    pack) over a (doc_id, target_uri, host, text) relation — the
    curation tail SHARED verbatim by the batch funnel and the streaming
    funnel's finalize, which is what makes their survivor equality hold
    by construction: these stages are whole-corpus functions (the NB
    model trains on the capped corpus; the caps and dedup windows rank
    globally), so the streaming side cannot finalize them per batch —
    it accumulates compact parsed state incrementally and runs this
    tail at read time.

    ``nd_pairs_fn`` (spark, quality_gated) -> verified-pair DataFrame
    replaces the default near_dup_tuned call with a value-identical
    alternative — the streaming finalize plugs in its content-hash
    band cache here so only new/changed docs re-shingle."""
    from streamsum_spark.cached import shared_persist
    from streamsum_spark.operators.classifier import quality_filter_nb, train_nb
    from streamsum_spark.operators.clusters import connected_components
    from streamsum_spark.operators.crawl import cap_per_domain
    from streamsum_spark.operators.dedup import near_dup_tuned
    from streamsum_spark.operators.sampling import pack_into_chunks
    from streamsum_spark.operators.similarity import (
        hashed_text_embeddings,
        semantic_dedup,
    )

    stages: dict[str, DataFrame] = {}

    # 3. per-registered-domain cap (anti-monoculture); host threaded
    # from the ingest projection — no URL re-parse here
    domain_capped = cap_per_domain(
        para_deduped, cap=domain_cap, url_col="target_uri", host_col="host"
    ).select("doc_id", "target_uri", "text")
    # persisted: the classifier reads it twice (train + score) and the
    # dedup stages chain from it — without a pin the WARC parse reruns
    # per consumer
    domain_capped = shared_persist((cache_token, "capped"), domain_capped)
    stages["domain_capped"] = domain_capped

    # 4. NB quality gate, self-seeded (see module docstring)
    wc = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    labeled = domain_capped.select(
        "doc_id",
        "text",
        F.when(wc >= min_words, F.lit("keep")).otherwise("drop").alias("label"),
    )
    # unigram features by default: a word-count-seeded gate needs no
    # bigram discrimination, and halving the feature stream halves the
    # training shuffle
    model = train_nb(labeled, bigrams=nb_bigrams)
    quality_gated = quality_filter_nb(
        domain_capped, model, keep_label="keep"
    ).select("doc_id", "target_uri", "text")
    # localCheckpoint, not persist: this is the funnel's waist, and
    # every downstream stage's LOGICAL plan would otherwise carry the
    # whole upstream tree (WARC parse + two windows + NB scoring),
    # which Catalyst re-analyzes per action — at 100 TB this boundary
    # is where a pipeline writes an intermediate table for the same
    # reason
    quality_gated = quality_gated.localCheckpoint()
    stages["quality_gated"] = quality_gated

    # 5. threshold-tuned near-dup: verified pairs -> connected
    # components -> keep the smallest doc_id per duplicate group
    if nd_pairs_fn is not None:
        pairs = nd_pairs_fn(spark, quality_gated)
    else:
        pairs = near_dup_tuned(
            spark,
            "",
            threshold=nd_threshold,
            docs=quality_gated.select("doc_id", "text"),
            cache_token=cache_token,
        )
    comp = connected_components(pairs, "doc_a", "doc_b")
    nd_drops = comp.where(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id")
    )
    near_deduped = quality_gated.join(nd_drops, "doc_id", "left_anti")
    # persisted: the k-means fit iterates over the embedding relation,
    # which chains through this anti-join — without a pin every Lloyd
    # job replays the near-dup stage
    near_deduped = shared_persist((cache_token, "near_dedup"), near_deduped)
    stages["near_deduped"] = near_deduped

    # 6. semantic dedup over hashed embeddings (or real ones — swap emb=)
    emb = shared_persist(
        (cache_token, "emb"), hashed_text_embeddings(near_deduped, dim=emb_dim)
    )
    # bounded Lloyd iterations: SemDeDup buckets by cluster geometry,
    # it does not need a converged fit
    sem = semantic_dedup(
        spark,
        "",
        threshold=sem_threshold,
        n_lists=n_lists,
        emb=emb,
        cache_token=cache_token,
        kmeans_max_iter=kmeans_max_iter,
    )
    sem_keep = sem.where(F.col("kept")).select(F.col("vec_id").alias("doc_id"))
    sem_deduped = near_deduped.join(sem_keep, "doc_id")
    stages["sem_deduped"] = sem_deduped

    # 7. pack survivors into training chunks
    chunks = pack_into_chunks(
        spark, "", budget=chunk_budget, docs=sem_deduped
    )
    stages["packed"] = sem_deduped.join(
        chunks.select("doc_id", "n_tokens", "part", "chunk"), "doc_id"
    )
    return stages


def corpus_prep_e2e(
    spark: SparkSession, warc_dir: str, **kwargs
) -> DataFrame:
    """The end-to-end funnel's FINAL relation: (doc_id, target_uri,
    text, n_tokens, part, chunk) — surviving documents with their
    training-chunk assignment.  See corpus_prep_stages for the chain."""
    return corpus_prep_stages(spark, warc_dir, **kwargs)["packed"]


# --------------------------------------------------------------------
# Streaming funnel (r13 verdict order #1): new WARC shards arriving
# under a directory process INCREMENTALLY, survivors converging to the
# batch funnel's on the union.
#
# What is incremental and what is not — stated precisely, because the
# split is forced by the semantics, not by implementation convenience:
#
# - INCREMENTAL (per micro-batch, never re-run): the raw-bytes work —
#   WARC record parse + HTTP decomposition + HTML strip (the funnel's
#   dominant cost: it reads every crawl byte), URL canonicalization,
#   paragraph split + hashing, and the doc-identity projection.  Each
#   batch lands in three bucketed idempotent state stores: the parsed
#   docs table, the canonical-URL first-occurrence store (the
#   stream_dedup_urls recipe — converges to batch keep-smallest under
#   any arrival order), and the paragraph OCCURRENCE multiset
#   (g=md5(para), doc_id, idx — constant ~50 B per paragraph, the
#   compact form the finalize window needs; storing first-occurrences
#   only would bake in flags CONDITIONED on nothing, while the batch
#   funnel's paragraph stage is conditioned on URL survivorship).
# - FINALIZE (read time, over the compact state): everything from the
#   paragraph-flag window on — cap, NB gate, near-dup, semantic, pack
#   — because those are WHOLE-CORPUS functions: the NB model trains on
#   the capped union, so gate membership (and therefore the near-dup/
#   semantic input SET) cannot be finalized until read; a per-batch
#   decision would diverge from the batch funnel a later shard can
#   always overturn.  The finalize consumes the already-parsed state
#   tables — no crawl byte is ever re-read — and runs the IDENTICAL
#   _curate_stages tail as the batch funnel, which is why survivor
#   equality holds by construction.
#
# The marginal-shard cost a production ingest pays per cycle is
# therefore: parse NEW bytes + three bucketed upserts + finalize over
# parsed text — benched as stream_corpus_prep_marginal in bench.py.
# --------------------------------------------------------------------


def stream_corpus_prep_ingest(
    spark: SparkSession,
    warc_dir: str,
    glob: str = "*.warc.gz",
    max_files_per_trigger: int | None = None,
    n_buckets: int = 16,
    state_base: str | None = None,
    checkpoint: str | None = None,
) -> str:
    """Ingest NEW WARC shards under ``warc_dir`` into the corpus-prep
    state tables (docs / URL first-occurrence + flags / paragraph
    occurrences) and return the state base path.  The checkpoint
    derives from ``state_base`` (resume, don't replay): re-invoking
    with the same base processes only files that appeared since.  All
    stores are keyed upserts — redelivered micro-batches repair, never
    duplicate."""
    import os
    import tempfile
    import uuid

    from streamsum_spark.operators.crawl import with_url_parts
    from streamsum_spark.sinks import upsert_batch
    from streamsum_spark.sources.warc import stream_warc_text
    from streamsum_spark.streaming.pipeline import _url_dedup_batch

    base = state_base or os.path.join(
        tempfile.gettempdir(), f"streamsum_cprep_{uuid.uuid4().hex[:12]}"
    )
    docs_tbl = base + "_docs"
    url_fp, url_flags = base + "_urlfp", base + "_urlflags"
    occ_tbl = base + "_occ"

    def on_batch(batch_df: DataFrame, epoch_id: int) -> None:
        rows = (
            with_url_parts(
                batch_df.select(
                    doc_id_col().alias("doc_id"), "target_uri", "text"
                )
            )
            # same (uri, file, ordinal) repeated in one batch = a
            # redelivered record, not a new document
            .dropDuplicates(["doc_id"])
            .localCheckpoint()
        )
        upsert_batch(
            spark,
            docs_tbl,
            rows.select("doc_id", "target_uri", "host", "text"),
            ["doc_id"],
            "doc_id",
            n_buckets=n_buckets,
        )
        _url_dedup_batch(
            spark,
            rows.select(
                "doc_id",
                F.md5(
                    F.coalesce(
                        F.col("canonical_url"),
                        F.concat_ws("-", F.lit("nocanon"), F.col("doc_id")),
                    )
                ).alias("g"),
            ),
            url_fp,
            url_flags,
            n_buckets,
        )
        # paragraph OCCURRENCES (not first-occurrences): the finalize
        # window ranks them conditioned on URL survivorship, exactly as
        # the batch paragraph stage does.  Blank paragraphs are
        # structure — exempt from dedup, never stored.
        occ = (
            rows.select(
                "doc_id",
                F.posexplode(F.split(F.col("text"), "\n")).alias(
                    "idx", "para"
                ),
            )
            .where(F.trim(F.col("para")) != "")
            .select(
                F.md5(F.col("para")).alias("g"),
                "doc_id",
                F.col("idx").cast("long").alias("idx"),
            )
        )
        upsert_batch(
            spark,
            occ_tbl,
            occ,
            ["g", "doc_id", "idx"],
            "idx",
            n_buckets=n_buckets,
            bucket_cols=["g"],
        )

    pages = stream_warc_text(spark, warc_dir, glob, max_files_per_trigger)
    ckpt = checkpoint or base + "_ckpt"
    q = (
        pages.select("target_uri", "warc_file", "ordinal", "text")
        .writeStream.foreachBatch(on_batch)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return base


class BandStoreWriterConflict(RuntimeError):
    """A second mutator (finalize band upsert or vacuum_band_store)
    tried to run against a band store while another holds the advisory
    writer lock — the store's swap discipline assumes ONE mutator at a
    time (a vacuum racing an upsert can rewrite a bucket the upsert is
    mid-swap on)."""


class _band_writer_lock:
    """Advisory single-writer guard for a band store: an O_EXCL lock
    file claimed through the commit backend (put_if_absent — the same
    primitive every other claim in this repo serializes on), released
    on exit.  A lock older than ``stale_s`` is presumed a crashed
    mutator's leftover and is stolen (atomically, via replace).
    Readers are unaffected — the lock only serializes MUTATORS."""

    def __init__(self, store: str, stale_s: float = 3600.0):
        self.lock_path = store + "_writer.lock"
        self.stale_s = stale_s

    def __enter__(self):
        from streamsum_spark import commitio

        os.makedirs(os.path.dirname(self.lock_path) or ".", exist_ok=True)
        tmp = self.lock_path + f".claim-{os.getpid()}"
        with open(tmp, "w") as fh:
            fh.write(str(os.getpid()))
        backend = commitio.get_backend()
        if backend.put_if_absent(tmp, self.lock_path):
            return self
        # lost the claim: an in-flight mutator holds it, unless stale
        import time as _time

        try:
            age = _time.time() - os.path.getmtime(self.lock_path)
        except OSError:  # released between our loss and the stat: retry
            age = None
        if age is not None and age < self.stale_s:
            os.unlink(tmp)
            raise BandStoreWriterConflict(
                f"{self.lock_path} is held by another finalize/vacuum "
                f"(age {age:.0f}s < {self.stale_s:.0f}s) — band-store "
                "mutators are single-writer; wait or raise stale_s"
            )
        backend.replace(tmp, self.lock_path)  # steal the stale lock
        return self

    def __exit__(self, *exc):
        try:
            os.unlink(self.lock_path)
        except FileNotFoundError:
            pass
        return False


def _claim_band_scheme(store: str, b: int, r: int, nd_threshold: float) -> None:
    """Record (or verify) the band store's (b, r) scheme sidecar
    CRASH-CONSISTENTLY: the JSON is staged to a temp file and published
    with the commit backend's put-if-absent — a crashed writer can
    never leave a torn sidecar, and two concurrent first-finalizes
    serialize with one winner (the loser re-reads and compares, which
    succeeds because both derive the same scheme from the same
    threshold).  A mismatched scheme refuses loudly."""
    import json

    from streamsum_spark import commitio

    scheme_path = store + "_scheme.json"
    if not os.path.exists(scheme_path):
        os.makedirs(os.path.dirname(store) or ".", exist_ok=True)
        tmp = scheme_path + f".claim-{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump({"b": b, "r": r}, fh)
        if commitio.get_backend().put_if_absent(tmp, scheme_path):
            return
        os.unlink(tmp)  # lost the race: fall through and compare
    try:
        with open(scheme_path) as fh:
            prev = json.load(fh)
    except (json.JSONDecodeError, OSError) as e:
        raise ValueError(
            f"band-store scheme sidecar {scheme_path!r} is unreadable "
            f"({e}) — it predates the crash-consistent claim protocol or "
            "was written by something else; delete it (with no finalize "
            "running) and re-finalize to re-record the scheme"
        ) from e
    if (prev["b"], prev["r"]) != (b, r):
        raise ValueError(
            f"band store {store!r} was built with (b, r)="
            f"({prev['b']}, {prev['r']}) but nd_threshold="
            f"{nd_threshold} needs ({b}, {r}) — one store serves one "
            "threshold; use a fresh state_base"
        )


def _cached_bands(
    spark: SparkSession,
    store: str,
    gated: DataFrame,
    nd_threshold: float,
    n_buckets: int,
) -> tuple[DataFrame, DataFrame]:
    """LSH banded keys for ``gated`` (doc_id, text) with a CONTENT-HASH
    cache: the band store keys rows by (doc_id, md5(text), band_id), so
    a finalize derives signatures only for docs whose cleaned text is
    new or changed since the last cycle — the text-proportional half of
    near-dup goes delta-incremental, and only candidate docs ever
    re-shingle for verification (near_dup_pairs_from_bands).  Stale
    text versions stay in the store as dead rows (pruned by the
    version semi-join at read; a compaction cycle reclaims them).
    Returns (bands for the CURRENT doc versions, the misses relation —
    empty when nothing changed, which the steady-state pin asserts).

    The store is valid for ONE threshold (the (b, r) scheme is derived
    from it) — a crash-consistent sidecar records the scheme
    (_claim_band_scheme) and a mismatched reuse refuses loudly instead
    of silently mixing band keys from two schemes.  A doc whose text
    yields NO shingles (under 3 words) gets a SENTINEL row (band_id
    −1) so it too enters the store and stops re-deriving every cycle;
    sentinels are filtered from the served bands.  Mutation runs under
    the store's advisory single-writer lock (shared with
    vacuum_band_store)."""
    from streamsum_spark.operators.dedup import (
        _signatures_from,
        banded_keys,
        choose_lsh_params,
        shingle_sets,
    )
    from streamsum_spark.sinks import read_state_table, upsert_batch

    b, r = choose_lsh_params(nd_threshold)
    _claim_band_scheme(store, b, r, nd_threshold)
    docs_v = gated.select(
        "doc_id", F.md5(F.col("text")).alias("tmd5"), "text"
    )
    if os.path.exists(store):
        versions = read_state_table(spark, store).select(
            "doc_id", "tmd5"
        ).distinct()
        misses = docs_v.join(versions, ["doc_id", "tmd5"], "left_anti")
    else:
        misses = docs_v
    # materialize BEFORE the upsert: the lazy plan reads the store's
    # pre-swap files, which the upsert's bucket swap deletes — the
    # checkpoint also keeps the anti-join from re-running per consumer
    # (band derivation + the returned misses relation)
    misses = misses.localCheckpoint()
    # delta-sized materialization: both the upsert union and the
    # sentinel anti-join consume it — unpinned, the signature
    # derivation would run twice over the misses set
    new_bands = (
        banded_keys(
            _signatures_from(
                shingle_sets(spark, "", docs=misses.select("doc_id", "text"))
            ),
            b,
            r,
        )
        .join(misses.select("doc_id", "tmd5"), "doc_id")
        .localCheckpoint()
    )
    # sentinel rows for missed docs that produced no bands (zero
    # shingles): without them such docs never enter the store and
    # reappear in the misses anti-join — re-deriving — every finalize
    sentinels = (
        misses.select("doc_id", "tmd5")
        .join(new_bands.select("doc_id").distinct(), "doc_id", "left_anti")
        .select(
            "doc_id",
            "tmd5",
            F.lit(-1).alias("band_id"),
            F.lit("").alias("bkey"),
        )
    )
    with _band_writer_lock(store):
        upsert_batch(
            spark,
            store,
            new_bands.select("doc_id", "tmd5", "band_id", "bkey").unionByName(
                sentinels
            ),
            ["doc_id", "tmd5", "band_id"],
            "bkey",
            n_buckets=n_buckets,
        )
    bands = (
        read_state_table(spark, store)
        .where(F.col("band_id") >= 0)
        .join(docs_v.select("doc_id", "tmd5"), ["doc_id", "tmd5"], "left_semi")
        .select("doc_id", "band_id", "bkey")
    )
    return bands, misses.select("doc_id")


FUNNEL_STAGE_ORDER = (
    "ingested",
    "url_deduped",
    "para_deduped",
    "domain_capped",
    "quality_gated",
    "near_deduped",
    "sem_deduped",
    "packed",
)


def funnel_report(stages: dict[str, DataFrame]) -> list[dict]:
    """Per-stage survivor accounting for either funnel's stages dict:
    one {stage, n_docs, dropped} row per present stage in funnel order
    — the audit trail a curation run logs per cycle (curation.py's
    per-rule drop accounting at funnel granularity; which URL/paragraph
    /cap/gate/dedup stage ate the corpus is the first question a yield
    regression raises).  Each count is one action over the stage
    relation — the funnel's shared persists and the gate checkpoint
    keep those cheap — and driver state is one number per stage.

    The ``ingested`` count comes from the observe() tap the batch
    funnel plants on the WARC parse (populated by the first downstream
    action — here the url_deduped count, which materializes the shared
    persist this report needs anyway), NEVER from a count() over the
    unpersisted parse relation: that count would re-read every crawl
    byte.  Sanity guard: an observation poisoned by an earlier PARTIAL
    action over the ingest relation (a limit().collect() probe) would
    undercount, so a value below the url_deduped count falls back to
    the honest full count."""
    # downstream-first: counting url_deduped materializes its persist
    # AND fires the ingest observation riding below it
    counts: dict[str, int] = {}
    for name in FUNNEL_STAGE_ORDER:
        if name == "ingested" or name not in stages:
            continue
        counts[name] = stages[name].count()
    if "ingested" in stages:
        ing = stages["ingested"]
        obs = getattr(ing, "_streamsum_ingest_obs", None)
        n_ing = obs.get["n"] if obs is not None else None
        if n_ing is None or n_ing < counts.get("url_deduped", 0):
            n_ing = ing.count()
        counts["ingested"] = n_ing
    out: list[dict] = []
    prev: int | None = None
    for name in FUNNEL_STAGE_ORDER:
        if name not in counts:
            continue
        n = counts[name]
        out.append(
            {
                "stage": name,
                "n_docs": n,
                "dropped": (prev - n) if prev is not None else 0,
            }
        )
        prev = n
    return out


def export_packed_webdataset(
    packed: DataFrame,
    out_dir: str,
    shard_max_bytes: int = 256 << 20,
) -> DataFrame:
    """Close the loop: the funnel's packed relation (either funnel —
    corpus_prep_e2e or stream_corpus_prep) -> WebDataset .tar shards, a
    delivery format training jobs consume directly.  One sample per
    training chunk: key ``{part:05d}-{chunk:06d}``, a ``txt`` part
    holding the chunk's documents concatenated in doc_id order
    (blank-line separated), and a ``json`` part with per-doc provenance
    (doc_id, target_uri, n_tokens) in the same order — the lineage a
    data audit needs to trace a training sample back to its crawl
    fetches.  One shuffle on (part, chunk) + pure expressions into the
    existing streaming tar packer (write_webdataset: per-task shard
    files, bounded memory, deterministic bytes); returns the shard
    manifest, whose materialization executes the write."""
    from streamsum_spark.sources.webdataset import write_webdataset

    chunks = packed.groupBy("part", "chunk").agg(
        F.expr(
            "sort_array(collect_list(struct(doc_id, target_uri, text, n_tokens)))"
        ).alias("ds")
    )
    samples = chunks.select(
        F.format_string("%05d-%06d", "part", "chunk").alias("key"),
        F.create_map(
            F.lit("txt"),
            F.encode(
                F.expr("array_join(transform(ds, d -> d.text), '\\n\\n')"),
                "UTF-8",
            ),
            F.lit("json"),
            F.encode(
                F.to_json(
                    F.expr(
                        "transform(ds, d -> struct(d.doc_id, d.target_uri,"
                        " d.n_tokens))"
                    )
                ),
                "UTF-8",
            ),
        ).alias("parts"),
    )
    return write_webdataset(samples, out_dir, shard_max_bytes)


def vacuum_band_store(
    spark: SparkSession, state_base: str, current: DataFrame
) -> dict:
    """Reclaim SUPERSEDED text-version rows from the finalize's band
    store: a row whose doc_id appears in ``current`` (doc_id, tmd5 —
    the ``nd_band_current`` relation a finalize exposes) under a
    DIFFERENT tmd5 is a dead version the semi-join will never serve
    again.  Rows for docs absent from ``current`` are KEPT — a doc the
    gate dropped this cycle may return with unchanged text, and its
    cached bands then save a re-derivation.  Bucket layout and sidecars
    survive (same swap discipline as sinks.compact_parquet).  Run on
    the same schedule as state-table compaction; returns row counts.

    Single-writer contract: the vacuum's read-rewrite-swap and a
    finalize's band upsert must not interleave (each assumes the other
    is not mid-swap on the same buckets) — both run under the store's
    advisory writer lock, so a concurrent mutator raises
    BandStoreWriterConflict instead of silently corrupting the store."""
    import shutil
    import uuid as _uuid

    from streamsum_spark.sinks import _atomic_swap

    store = state_base + "_ndbands"
    if not os.path.exists(store):
        return {"kept": 0, "dropped": 0}
    with _band_writer_lock(store):
        full = spark.read.parquet(store)  # keeps the kb partition column
        n_before = full.count()
        superseded = (
            full.join(current.withColumnRenamed("tmd5", "_cur"), "doc_id")
            .where(F.col("tmd5") != F.col("_cur"))
            .select("doc_id", "tmd5")
            .distinct()
        )
        kept = full.join(superseded, ["doc_id", "tmd5"], "left_anti")
        n_kept = kept.count()
        tmp = store + f".tmp-{_uuid.uuid4().hex[:8]}"
        (
            kept.repartition("kb")
            .write.mode("overwrite")
            .partitionBy("kb")
            .parquet(tmp)
        )
        meta = os.path.join(store, "_table_meta.json")
        if os.path.exists(meta):
            shutil.copy(meta, os.path.join(tmp, "_table_meta.json"))
        for d in os.listdir(store):
            mpath = os.path.join(store, d, "_applied_epochs.json")
            if d.startswith("kb=") and os.path.exists(mpath):
                os.makedirs(os.path.join(tmp, d), exist_ok=True)
                shutil.copy(
                    mpath, os.path.join(tmp, d, "_applied_epochs.json")
                )
        _atomic_swap(store, tmp)
    return {"kept": n_kept, "dropped": n_before - n_kept}


def stream_corpus_prep_stages(
    spark: SparkSession,
    state_base: str,
    domain_cap: int = 1000,
    min_words: int = 40,
    nd_threshold: float = 0.5,
    sem_threshold: float = 0.9,
    emb_dim: int = 16,
    chunk_budget: int = 2048,
    n_lists: int | None = None,
    kmeans_max_iter: int = 8,
    nb_bigrams: bool = False,
    n_buckets: int = 16,
    cache_token: str = "stream_corpus_prep",
) -> dict[str, DataFrame]:
    """Finalize the streaming funnel over the accumulated state tables:
    URL survivors (docs anti-joined on the converged flag store) feed
    the paragraph-flag window (one shuffle over the hash-width
    occurrence multiset, conditioned on survivorship), texts rebuild
    through the SAME strip/rebuild aggregation as the batch stage, and
    the identical _curate_stages tail runs the cap/gate/near-dup/
    semantic/pack chain — with the near-dup stage's band derivation
    served from the content-hash cache (_cached_bands): only docs
    whose cleaned text is new or changed since the previous finalize
    re-shingle, and only candidate docs shingle for verification.
    Stage keys mirror corpus_prep_stages from url_deduped on, plus
    ``nd_band_misses`` — the docs the band cache had to (re)derive
    this cycle, empty at steady state (pinned) — and
    ``nd_band_current`` — the (doc_id, tmd5) versions this cycle
    served, the input vacuum_band_store reclaims superseded rows
    against."""
    import os

    from pyspark.sql import Window

    from streamsum_spark.cached import shared_persist
    from streamsum_spark.operators.dedup import strip_flagged_paragraphs
    from streamsum_spark.sinks import read_state_table

    docs_tbl = state_base + "_docs"
    url_flags_tbl = state_base + "_urlflags"
    occ_tbl = state_base + "_occ"
    if not os.path.exists(docs_tbl):
        raise ValueError(
            f"no ingested corpus-prep state under {state_base!r} — run "
            "stream_corpus_prep_ingest first"
        )
    stages: dict[str, DataFrame] = {}
    docs = read_state_table(spark, docs_tbl)
    if os.path.exists(url_flags_tbl):
        flags = read_state_table(spark, url_flags_tbl).select("doc_id")
    else:
        flags = spark.createDataFrame([], "doc_id long")
    # persisted for the same reason the batch funnel pins url_deduped:
    # the paragraph window, the rebuild join and the curation tail all
    # chain from it
    survivors = shared_persist(
        (cache_token, "url"), docs.join(flags, "doc_id", "left_anti")
    )
    stages["url_deduped"] = survivors

    if os.path.exists(occ_tbl):
        occ = read_state_table(spark, occ_tbl)
    else:
        occ = spark.createDataFrame([], "g string, doc_id long, idx long")
    occ = occ.join(survivors.select("doc_id"), "doc_id", "left_semi")
    byg = Window.partitionBy("g").orderBy("doc_id", "idx")
    pflags = (
        occ.withColumn("rn", F.row_number().over(byg))
        .where(F.col("rn") > 1)
        .select("doc_id", "idx")
    )
    cleaned = strip_flagged_paragraphs(
        survivors.select("doc_id", "text"), pflags
    ).select("doc_id", F.col("text_clean").alias("text"))
    para_deduped = survivors.drop("text").join(cleaned, "doc_id")
    stages["para_deduped"] = para_deduped

    nd_store = state_base + "_ndbands"
    observed: dict[str, DataFrame] = {}

    def nd_pairs(spark_, quality_gated):
        from streamsum_spark.operators.dedup import near_dup_pairs_from_bands

        bands, misses = _cached_bands(
            spark_,
            nd_store,
            quality_gated.select("doc_id", "text"),
            nd_threshold,
            n_buckets,
        )
        observed["misses"] = misses
        # the CURRENT (doc_id, text-version) relation — what
        # vacuum_band_store consumes to reclaim superseded rows
        observed["current"] = quality_gated.select(
            "doc_id", F.md5(F.col("text")).alias("tmd5")
        )
        return near_dup_pairs_from_bands(
            spark_,
            bands,
            quality_gated.select("doc_id", "text"),
            threshold=nd_threshold,
            cache_token=cache_token,
        )

    stages.update(
        _curate_stages(
            spark,
            para_deduped,
            domain_cap=domain_cap,
            min_words=min_words,
            nd_threshold=nd_threshold,
            sem_threshold=sem_threshold,
            emb_dim=emb_dim,
            chunk_budget=chunk_budget,
            n_lists=n_lists,
            kmeans_max_iter=kmeans_max_iter,
            nb_bigrams=nb_bigrams,
            cache_token=cache_token,
            nd_pairs_fn=nd_pairs,
        )
    )
    stages["nd_band_misses"] = observed["misses"]
    stages["nd_band_current"] = observed["current"]
    return stages


def stream_corpus_prep(
    spark: SparkSession,
    warc_dir: str,
    glob: str = "*.warc.gz",
    max_files_per_trigger: int | None = None,
    n_buckets: int = 16,
    state_base: str | None = None,
    checkpoint: str | None = None,
    domain_cap: int = 1000,
    min_words: int = 40,
    nd_threshold: float = 0.5,
    sem_threshold: float = 0.9,
    emb_dim: int = 16,
    chunk_budget: int = 2048,
    n_lists: int | None = None,
    kmeans_max_iter: int = 8,
    nb_bigrams: bool = False,
    cache_token: str = "stream_corpus_prep",
) -> DataFrame:
    """The composed STREAMING corpus-prep funnel: ingest whatever WARC
    shards are new under ``warc_dir`` (incremental parse + state
    upserts), then finalize over the accumulated state.  Same output
    relation as corpus_prep_e2e — and pinned EQUAL to it over the union
    of everything ingested, across out-of-order shard arrival,
    redelivery, and resume (tests/test_corpus_prep.py)."""
    base = stream_corpus_prep_ingest(
        spark,
        warc_dir,
        glob,
        max_files_per_trigger,
        n_buckets,
        state_base,
        checkpoint,
    )
    return stream_corpus_prep_stages(
        spark,
        base,
        domain_cap=domain_cap,
        min_words=min_words,
        nd_threshold=nd_threshold,
        sem_threshold=sem_threshold,
        emb_dim=emb_dim,
        chunk_budget=chunk_budget,
        n_lists=n_lists,
        kmeans_max_iter=kmeans_max_iter,
        nb_bigrams=nb_bigrams,
        n_buckets=n_buckets,
        cache_token=cache_token,
    )["packed"]
