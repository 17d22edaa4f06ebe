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

from streamsum_spark.functions.expressions import (
    cosine_safe_expr as _cos_safe_expr,
)
from streamsum_spark.util import (
    _LOCAL_REL_ROWS,
    driver_local,
    driver_local_from_rows,
    filter_by_ids,
    one_shot_take,
    unpersist_checkpoint,
)


def _parallel_jobs(*thunks) -> None:
    """Run independent Spark actions from separate driver threads so the
    scheduler overlaps their stages — maintenance of DISJOINT state
    tables fed by one already-checkpointed batch is embarrassingly
    parallel, and on a small delta each action's cost is scheduling, not
    data, so overlap collapses N sequential latencies into ~one.  The
    callables must touch disjoint tables; the first failure re-raises
    after all threads finish (no partially-cancelled merges)."""
    if len(thunks) == 1:
        thunks[0]()
        return
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(thunks)) as ex:
        futures = [ex.submit(t) for t in thunks]
    errs = [f.exception() for f in futures]
    for e in errs:
        if e is not None:
            raise e


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
    from streamsum_spark.sinks import (
        append_batch,
        mark_epoch_complete,
        read_touched_buckets,
    )
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
            # lazy: the count below materializes the parse in the SAME
            # job (an eager checkpoint would spend a separate one), then
            # the store-maintenance branches read blocks
            .localCheckpoint(eager=False)
        )
        # checkpointed relations carry no size statistic, so the batch
        # side of the probe joins below is hinted broadcast while the
        # batch is small — the count is the materializing scan
        bc_batch = rows.count() <= _FZ_BC_DELTA_MAX
        # a (file, ordinal) document is IMMUTABLE, so the docs and occ
        # stores are add-only: append epoch-named files instead of
        # read-merge-rewriting every touched bucket (which at steady
        # state rewrites ~the whole accumulated store per shard).  A
        # doc already stored — a redelivered epoch under a fresh
        # checkpoint — is dropped from the batch by a doc_id-only
        # probe (column-pruned: the scan reads one long column), so
        # the appends stay exactly-once per doc.  The probe hides the
        # CURRENT epoch's own uncommitted files (mark_epoch_complete
        # protocol on the docs store, written LAST): a crash at any
        # point replays against the deterministic pre-epoch state and
        # overwrites its own epoch files.
        if os.path.exists(docs_tbl):
            seen = (
                rows.select("doc_id")
                .join(
                    read_touched_buckets(
                        spark, docs_tbl, rows.select("doc_id"),
                        exclude_epoch=epoch_id,
                    ).select("doc_id"),
                    "doc_id",
                    "left_semi",
                )
            )
            # steady state this is EMPTY (no redelivery): a driver-local
            # copy turns the three store branches' broadcast anti-joins
            # into a literal predicate (empty set: no filter at all)
            # instead of a per-action broadcast rebuild.  driver_local's
            # own bounded probe doubles as the materializing action (the
            # old shape paid an eager checkpoint AND a collect); over
            # the bound the rare oversized-redelivery batch recomputes
            # the pruned probe per consuming branch, which is still
            # bucket-pruned reads of delta-sized data
            seen = driver_local(seen)
            new_rows = filter_by_ids(
                rows, "doc_id", seen, anti=True, hint_broadcast=bc_batch
            )
        else:
            new_rows = rows

        def _urls() -> None:
            _url_dedup_batch(
                spark,
                new_rows.select(
                    "doc_id",
                    F.md5(
                        F.coalesce(
                            F.col("canonical_url"),
                            F.concat_ws(
                                "-", F.lit("nocanon"), F.col("doc_id")
                            ),
                        )
                    ).alias("g"),
                ),
                url_fp,
                url_flags,
                n_buckets,
                bc_batch=bc_batch,
            )

        def _occ() -> None:
            # paragraph OCCURRENCES (not first-occurrences): the
            # finalize window ranks them conditioned on URL
            # survivorship, exactly as the batch paragraph stage does.
            # Blank paragraphs are structure — exempt from dedup,
            # never stored.
            occ = (
                new_rows.select(
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
            append_batch(
                spark,
                occ_tbl,
                occ,
                ["g", "doc_id", "idx"],
                epoch_id=epoch_id,
                n_buckets=n_buckets,
                bucket_cols=["g"],
            )

        # disjoint relations of one checkpointed batch overlap on the
        # cluster; the docs append — the probe store — commits last,
        # then its epoch marker
        _parallel_jobs(_urls, _occ)
        append_batch(
            spark,
            docs_tbl,
            new_rows.select("doc_id", "target_uri", "host", "text"),
            ["doc_id"],
            epoch_id=epoch_id,
            n_buckets=n_buckets,
        )
        mark_epoch_complete(docs_tbl, epoch_id)

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


def _new_bands_with_sentinels(
    spark: SparkSession, misses: DataFrame, b: int, r: int
) -> DataFrame:
    """Banded keys for a (doc_id, tmd5, text) misses relation, plus a
    SENTINEL row (band_id −1) per missed doc that produced no bands
    (zero 3-word shingles) — without sentinels such docs never enter
    the store and re-derive every cycle.  Delta-checkpointed: both the
    upsert union and the sentinel anti-join consume the derivation —
    unpinned, the signature work would run twice over the misses."""
    from streamsum_spark.operators.dedup import (
        _signatures_from,
        banded_keys,
        shingle_sets,
    )

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
    return new_bands.select("doc_id", "tmd5", "band_id", "bkey").unionByName(
        sentinels
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
    from streamsum_spark.operators.dedup import choose_lsh_params
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
    with _band_writer_lock(store):
        # bucketed on doc_id (not the full key): the frozen finalize's
        # miss detection prunes its version probe to the delta docs'
        # buckets, and all consumers route by doc_id anyway
        upsert_batch(
            spark,
            store,
            _new_bands_with_sentinels(spark, misses, b, r),
            ["doc_id", "tmd5", "band_id"],
            "bkey",
            n_buckets=n_buckets,
            bucket_cols=["doc_id"],
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
    mode: str = "exact",
) -> dict[str, DataFrame]:
    """``mode="exact"`` (default): re-run the identical batch curation
    tail per finalize — exact batch equality every cycle, O(corpus)
    finalize cost.  ``mode="frozen"``: O(delta) cycles under models
    frozen at the first full finalize — see
    stream_corpus_prep_frozen_stages for the contract.

    Finalize the streaming funnel over the accumulated state tables:
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

    if mode == "frozen":
        return stream_corpus_prep_frozen_stages(
            spark,
            state_base,
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
        )
    if mode != "exact":
        raise ValueError(f"mode must be 'exact' or 'frozen', got {mode!r}")

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


# --------------------------------------------------------------------
# FROZEN-MODEL O(delta) finalize (r14 verdict order #1).
#
# The exact finalize above re-runs the whole _curate_stages tail per
# cycle because its stages are whole-corpus functions — the NB model
# trains on the capped union, the k-means quantizer fits on the
# current survivors.  That is the right default for exact batch
# equality, but it makes the INCREMENTAL cycle O(corpus): at 100 TB an
# ingest cycle must not re-train, re-band, re-pair and re-pack
# everything to admit one shard.
#
# mode="frozen" trades model freshness for O(delta) cycles, the same
# trade similarity_incremental makes for the IVF index (and FAISS's
# add() makes for every vector index): after a first FULL finalize
# trains and freezes the NB model + the k-means coarse quantizer (+
# the semantic cap max_list), every curation decision becomes a PURE
# PER-DOCUMENT function of the doc's cleaned text — gate membership,
# LSH bands, embedding, cluster assignment — so a cycle only computes
# them for documents whose cleaned text is new or changed, detected by
# (doc_id, flag_fp): raw text per doc_id is immutable by construction
# (the identity hashes the fetch), so cleaned text changes exactly
# when the paragraph-flag set changes.
#
# What stays whole-corpus per cycle, and why it is cheap: the
# URL-survivor anti-join, the paragraph first-occurrence window, and
# the domain-cap window all run over COMPACT state (ids, hashes, URL
# metadata — never document text), and the serve-side group
# resolution (pair CC, exemplar windows, packing) runs over pair
# relations and (doc_id, n_tokens) metadata.  Document text is
# touched only for (a) delta docs and (b) the final packed OUTPUT.
#
# Pinned contracts (tests/test_corpus_prep_frozen.py):
# - freeze-over-the-full-corpus == corpus_prep_e2e exactly (the first
#   full finalize IS the batch funnel, it just also freezes);
# - incremental frozen cycles == batch over the union whenever the
#   frozen models decide like fresh ones (wide-margin gates, stable
#   vocabulary) — the documented approximation otherwise is precisely
#   "the models are as of the freeze";
# - a no-new-data cycle recurates NOTHING (fz_delta empty) and serves
#   the identical corpus.
#
# Documented divergence corners (all require URL retraction or cap
# eviction of an already-curated doc followed by its return):
# near-dup/semantic PAIRS are computed when the later endpoint enters
# the gated set, so a doc absent from the gated set during a partner's
# delta cycle misses that pair until either side re-enters the delta.
# The semantic delta join is additionally work-bounded by the frozen
# max_list on current GATED cluster size (batch bounds on survivor
# size — a cluster between the two bounds may miss pairs).
# --------------------------------------------------------------------


# wall-clock and Spark-job count per phase of the most recent frozen
# finalize in this process — the audit hook for "where does my
# incremental cycle go": a steady-state cycle should be dominated by
# `metadata` (corpus-width but text-free) and `serve_build` (pair CC +
# windows), with the text-touching delta phases near zero when nothing
# changed.  The job counts matter because a small-delta cycle's cost is
# SCHEDULING, not data: every job is ~fixed overhead at high
# parallelism, so the O(delta) contract is kept by job count as much as
# by bytes.
LAST_FROZEN_PHASE_SECONDS: dict[str, float] = {}
LAST_FROZEN_PHASE_JOBS: dict[str, int] = {}

# Broadcast bound (rows) for the frozen cycle's MICRO-BATCH side.
# Every delta-sized relation descends from a localCheckpoint, whose
# size statistic is the planner default (max), so Catalyst never
# auto-broadcasts it and each tiny delta⋈store join plans as a shuffle
# join — two Exchanges and an AQE stage round-trip per side, pure
# scheduling on an O(delta) cycle.  The driver knows the exact delta
# row count before any of those joins are built, so it picks the join
# strategy itself: at or below this bound the delta side is hinted
# broadcast (the stream-static join shape), above it the joins keep
# the shuffle path.  ~100k rows of id/hash/gate metadata is ~10 MB —
# the stock broadcast comfort zone; tune per deployment via env.
_FZ_BC_DELTA_MAX = int(os.environ.get("STREAMSUM_FZ_BC_DELTA_ROWS", "100000"))


def _fz_paths(state_base: str) -> dict[str, str]:
    return {
        "cur": state_base + "_fzcur",
        "pack": state_base + "_fzpack",
        "pairs": state_base + "_fzpairs",
        "sem": state_base + "_fzsem",
        "nb": state_base + "_fznb",
        "nb_meta": state_base + "_fznb.json",
        "km": state_base + "_fzkm",
        "cent": state_base + "_fzcentroids",
        "meta": state_base + "_fzmeta.json",
        "bands": state_base + "_ndbands",
    }


_N_TOKENS_EXPR = "CAST(size(split(trim(text), '\\\\s+')) AS BIGINT)"


_FZ_NB_LOCAL: dict = {}


def _fz_load_nb(spark: SparkSession, paths: dict):
    import json

    from streamsum_spark.cached import peek_shared, shared_persist
    from streamsum_spark.operators.classifier import NBModel

    with open(paths["nb_meta"]) as fh:
        m = json.load(fh)
    # persisted under the model path: the frozen model is immutable once
    # written, so repeated cycles in one process reuse the materialized
    # blocks (peek first — shared_persist always evicts-and-replaces)
    key = ("fz_nb_counts", paths["nb"])
    counts = _FZ_NB_LOCAL.get(key) or peek_shared(key, spark)
    if counts is None:
        raw = spark.read.parquet(paths["nb"])
        # frozen counts within the driver-local bound become a
        # LocalRelation: the gate scoring broadcasts them from every
        # delta evaluation, and a LocalRelation build is job-free where
        # the persisted-relation build was one scheduling round per
        # action; larger vocabularies keep the persisted form
        local = driver_local(raw)
        if local is not raw:
            counts = local
            _FZ_NB_LOCAL.clear()  # one frozen model per process is typical
            _FZ_NB_LOCAL[key] = counts
        else:
            counts = shared_persist(key, raw)
    return NBModel(
        labels=m["labels"],
        log_prior={k: float(v) for k, v in m["log_prior"].items()},
        total={k: int(v) for k, v in m["total"].items()},
        counts=counts,
        alpha=m["alpha"],
        n_buckets=m["n_buckets"],
        bigrams=m["bigrams"],
    )


def _fz_save_nb(model, paths: dict) -> None:
    import json

    # overwrite: a crash between the counts write and the meta rename
    # leaves nb_meta absent, so the repairing retry re-trains the same
    # deterministic model and must be able to re-write the counts
    model.counts.write.mode("overwrite").parquet(paths["nb"])
    with open(paths["nb_meta"] + ".tmp", "w") as fh:
        json.dump(
            {
                "labels": model.labels,
                "log_prior": model.log_prior,
                "total": model.total,
                "alpha": model.alpha,
                "n_buckets": model.n_buckets,
                "bigrams": model.bigrams,
            },
            fh,
        )
    os.replace(paths["nb_meta"] + ".tmp", paths["nb_meta"])


# frozen-model in-process caches: the quantizer and its centroid rows
# are IMMUTABLE after the freeze cycle, but pyspark.ml persistence runs
# several Spark jobs per load — on an O(delta) cycle that is pure
# scheduling overhead, so loads memoize per (path, mtime, application)
_FZ_KM_CACHE: dict[tuple, object] = {}
_FZ_CENT_CACHE: dict[tuple, DataFrame] = {}


def _fz_load_centroids(spark: SparkSession, cent_path: str) -> DataFrame:
    """Centroid rows as a memoized DRIVER-LOCAL relation (bounded by the
    number of k-means lists at any corpus size): the quantizer join
    broadcasts them from every consuming action, and a driver-local
    build is job-free where the persisted-relation build was one
    scheduling round per action.  Over the (generous) bound it falls
    back to the persisted distributed relation."""
    from streamsum_spark.cached import peek_shared, shared_persist

    key = (
        cent_path,
        os.path.getmtime(cent_path),
        spark.sparkContext.applicationId,
    )
    df = _FZ_CENT_CACHE.get(key)
    if df is None:
        raw = spark.read.parquet(cent_path)
        df = driver_local(raw, max_rows=1_000_000)
        if df is raw:  # over the bound: keep the persisted form
            ckey = ("fz_centroids",) + key
            df = peek_shared(ckey, spark) or shared_persist(ckey, raw)
        _FZ_CENT_CACHE.clear()
        _FZ_CENT_CACHE[key] = df
    return df


def _fz_load_km(spark: SparkSession, km_path: str):
    from pyspark.ml.clustering import KMeansModel

    key = (
        km_path,
        os.path.getmtime(km_path),
        spark.sparkContext.applicationId,
    )
    model = _FZ_KM_CACHE.get(key)
    if model is None:
        model = KMeansModel.load(km_path)
        _FZ_KM_CACHE.clear()  # one frozen quantizer per process is typical
        _FZ_KM_CACHE[key] = model
    return model


def _fz_assign(
    emb: DataFrame, km_path: str, carry: tuple[str, ...] = ()
) -> DataFrame:
    """(doc_id, list_id[, *carry]) through the FROZEN quantizer's own
    transform() — euclidean nearest centroid with the exact tie and FP
    behavior of the fit, because it IS the fitted model (saved/loaded
    through pyspark.ml persistence), not a reimplementation.  ``carry``
    columns ride through the transform (ML transformers keep their
    input columns), so a caller that needs the embedding next to the
    assignment gets both in ONE projection instead of re-deriving the
    embedding and joining on doc_id."""
    from pyspark.ml.functions import array_to_vector

    model = _fz_load_km(emb.sparkSession, km_path)
    feats = emb.select(
        F.col("vec_id"),
        *[F.col(c) for c in carry],
        array_to_vector(F.col("embedding").cast("array<double>")).alias(
            "features"
        ),
    )
    return model.transform(feats).select(
        F.col("vec_id").alias("doc_id"),
        F.col("list_id").cast("long").alias("list_id"),
        *[F.col(c) for c in carry],
    )


def _fz_served_nd_pairs(spark, paths, gated_meta: DataFrame) -> DataFrame:
    """Stored verified pairs restricted to CURRENT gated doc versions:
    a pair serves only while both endpoints are gated and their stored
    tmd5 matches the doc's current cleaned text (a changed doc's stale
    pairs drop out; its re-verified pairs re-enter via the delta
    join)."""
    from streamsum_spark.sinks import read_state_table

    if not os.path.exists(paths["pairs"]):
        return spark.createDataFrame(
            [], "doc_a long, doc_b long, jaccard double"
        )
    p = read_state_table(spark, paths["pairs"])
    ga = gated_meta.select(
        F.col("doc_id").alias("doc_a"), F.col("tmd5").alias("tmd5_a")
    )
    gb = gated_meta.select(
        F.col("doc_id").alias("doc_b"), F.col("tmd5").alias("tmd5_b")
    )
    return p.join(ga, ["doc_a", "tmd5_a"], "left_semi").join(
        gb, ["doc_b", "tmd5_b"], "left_semi"
    ).select("doc_a", "doc_b", "jaccard")


def _fz_near_dedup_ids(spark, paths, gated_meta: DataFrame) -> DataFrame:
    """Near-dup survivor ids over the served pair set: connected
    components + keep-smallest (the batch rule) — CC runs over the
    pair relation (duplicates only), never the corpus.  The drop set
    (losers only) rides as a driver-local relation when bounded, so
    the anti-join collapses to a literal predicate over the
    checkpointed gated metadata — consumers of the survivor chain stop
    rebuilding the CC subtree per action."""
    from streamsum_spark.operators.clusters import connected_components

    pairs = _fz_served_nd_pairs(spark, paths, gated_meta)
    comp = connected_components(pairs, "doc_a", "doc_b")
    drops = driver_local(
        comp.where(F.col("id") != F.col("component")).select(
            F.col("id").alias("doc_id")
        )
    )
    return filter_by_ids(
        gated_meta.select("doc_id"), "doc_id", drops, anti=True
    )


def stream_corpus_prep_frozen_stages(
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
    cache_token: str = "stream_corpus_prep_frozen",
) -> dict[str, DataFrame]:
    """The O(delta) finalize (see the block comment above): first call
    runs the full funnel and FREEZES the NB model, the k-means coarse
    quantizer and max_list; later calls re-curate only docs whose
    cleaned text is new or changed.  Parameters are frozen with the
    models — a mismatched re-finalize refuses loudly.  Returns the
    stage dict (url_deduped, domain_capped, quality_gated,
    near_deduped, sem_deduped, packed — para_deduped is deliberately
    absent: serving it would rebuild every survivor's text, exactly the
    work this mode exists to avoid) plus diagnostics ``fz_delta`` (docs
    re-curated this cycle) and ``nd_band_misses``."""
    import json

    from pyspark.sql import Row, Window
    from pyspark.sql import types as T

    from streamsum_spark.operators.classifier import (
        classifier_drop_flags,
        train_nb,
    )
    from streamsum_spark.operators.clusters import connected_components
    from streamsum_spark.operators.crawl import cap_per_domain
    from streamsum_spark.operators.dedup import (
        choose_lsh_params,
        shingle_sets,
        strip_flagged_paragraphs,
    )
    from streamsum_spark.operators.sampling import pack_into_chunks
    from streamsum_spark.operators.similarity import (
        hashed_text_embeddings,
        kmeans_ivf_index,
    )
    from streamsum_spark.cached import shared_persist
    from streamsum_spark.sinks import (
        read_state_table,
        read_touched_buckets,
        upsert_batch,
    )

    paths = _fz_paths(state_base)
    docs_tbl = state_base + "_docs"
    url_flags_tbl = state_base + "_urlflags"
    occ_tbl = state_base + "_occ"
    if not os.path.exists(docs_tbl):
        raise ValueError(
            f"no ingested corpus-prep state under {state_base!r} — run "
            "stream_corpus_prep_ingest first"
        )
    params = {
        "domain_cap": domain_cap,
        "min_words": min_words,
        "nd_threshold": nd_threshold,
        "sem_threshold": sem_threshold,
        "emb_dim": emb_dim,
        "chunk_budget": chunk_budget,
        "n_lists": n_lists,
        "kmeans_max_iter": kmeans_max_iter,
        "nb_bigrams": nb_bigrams,
        "n_buckets": n_buckets,
    }
    import time as _time

    LAST_FROZEN_PHASE_SECONDS.clear()
    LAST_FROZEN_PHASE_JOBS.clear()
    _t0 = _time.perf_counter()

    def _jobs_now() -> int:
        try:
            return spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
        except Exception:
            return 0

    _j0 = _jobs_now()

    def _mark(phase: str) -> None:
        nonlocal _t0, _j0
        now = _time.perf_counter()
        LAST_FROZEN_PHASE_SECONDS[phase] = round(
            LAST_FROZEN_PHASE_SECONDS.get(phase, 0.0) + now - _t0, 3
        )
        jn = _jobs_now()
        LAST_FROZEN_PHASE_JOBS[phase] = (
            LAST_FROZEN_PHASE_JOBS.get(phase, 0) + jn - _j0
        )
        _t0, _j0 = now, jn

    with _band_writer_lock(state_base + "_fzstate"):
        meta = None
        if os.path.exists(paths["meta"]):
            with open(paths["meta"]) as fh:
                meta = json.load(fh)
            if meta["params"] != params:
                diff = {
                    k: (meta["params"].get(k), params[k])
                    for k in params
                    if meta["params"].get(k) != params[k]
                }
                raise ValueError(
                    "frozen corpus-prep state was frozen with different "
                    f"parameters (frozen, requested): {diff} — parameters "
                    "freeze with the models; use a fresh state_base (or "
                    "exact mode) to change them"
                )
        cycle = (meta["fz_cycle"] + 1) if meta else 1

        # ---- whole-corpus METADATA phase (no document text) --------
        docs_meta = read_state_table(spark, docs_tbl).select(
            "doc_id", "target_uri", "host"
        )
        if os.path.exists(url_flags_tbl):
            flags = read_state_table(spark, url_flags_tbl).select("doc_id")
        else:
            flags = spark.createDataFrame([], "doc_id long")
        survivors_meta = docs_meta.join(flags, "doc_id", "left_anti")
        if os.path.exists(occ_tbl):
            occ = read_state_table(spark, occ_tbl)
        else:
            occ = spark.createDataFrame([], "g string, doc_id long, idx long")
        occ = occ.join(survivors_meta.select("doc_id"), "doc_id", "left_semi")
        byg = Window.partitionBy("g").orderBy("doc_id", "idx")
        # flagged-paragraph occurrences, conditioned on URL survivorship
        # (the batch stage's rule) — hash-width rows, one shuffle
        # lazy: n_delta's count below materializes pflags, capped and
        # delta in ONE job — on an O(delta) cycle every separate eager
        # checkpoint is a whole scheduling round
        pflags = (
            occ.withColumn("rn", F.row_number().over(byg))
            .where(F.col("rn") > 1)
            .select("doc_id", "idx")
            .localCheckpoint(eager=False)
        )
        fp = pflags.groupBy("doc_id").agg(
            F.md5(
                F.concat_ws(",", F.sort_array(F.collect_list("idx")))
            ).alias("flag_fp")
        )
        capped = (
            cap_per_domain(
                survivors_meta,
                cap=domain_cap,
                url_col="target_uri",
                host_col="host",
            )
            .select("doc_id", "target_uri")
            .join(fp, "doc_id", "left")
            .withColumn("flag_fp", F.coalesce("flag_fp", F.lit("")))
            .localCheckpoint(eager=False)
        )
        cur_schema = (
            "doc_id long, flag_fp string, tmd5 string, target_uri string, "
            "text string, n_tokens long, gate_keep boolean, "
            "list_id long, cent_cos double, embedding array<double>, "
            "fz_cycle long, fz_seq long"
        )
        if os.path.exists(paths["cur"]):
            cur_prev = read_state_table(spark, paths["cur"])
        else:
            cur_prev = spark.createDataFrame([], cur_schema)
        # lazy checkpoint + immediate bounded probe: ONE job both
        # materializes the checkpoint (round one spans the session's
        # parallelism and LocalRDDCheckpointData completes skipped
        # partitions) and, when the delta is small, collects it for the
        # driver-local form — where a count + a separate driver_local
        # collect paid two scheduling rounds for the same data
        delta = capped.join(
            cur_prev.select("doc_id", "flag_fp"),
            ["doc_id", "flag_fp"],
            "left_anti",
        ).localCheckpoint(eager=False)
        _d_rows = one_shot_take(delta, _LOCAL_REL_ROWS + 1)
        if len(_d_rows) <= _LOCAL_REL_ROWS:
            # small deltas become a driver-local LocalRelation: ~10
            # downstream actions probe delta's id set through broadcast
            # joins, and over a LocalRelation every build is job-free
            n_delta = len(_d_rows)
            delta = driver_local_from_rows(spark, _d_rows, delta.schema)
        else:
            n_delta = delta.count()

        def _bc(df: DataFrame) -> DataFrame:
            # broadcast hint for a DELTA-sized relation (see
            # _FZ_BC_DELTA_MAX) — identity when the batch is large
            return F.broadcast(df) if n_delta <= _FZ_BC_DELTA_MAX else df

        def _vec_cols(
            docs_texts: DataFrame, carry: tuple[str, ...] = ()
        ) -> DataFrame:
            """(doc_id, list_id, cent_cos, embedding[, *carry]) for
            (doc_id, text[, ...]) rows through the frozen quantizer.
            Lazy — the caller checkpoints the composed row relation
            once; the embedding fold is a pure projection.  ``carry``
            columns ride through the fold AND the transform, so a
            caller that needs the vec columns next to the full row gets
            them in one projection chain instead of a join-back on
            doc_id (the centroid attach stays a join, but its build
            side is a driver-local LocalRelation — job-free)."""
            emb = hashed_text_embeddings(
                docs_texts, dim=emb_dim, carry=tuple(carry)
            )
            assigned = _fz_assign(
                emb, paths["km"], carry=("embedding",) + tuple(carry)
            )
            centroids_df = _fz_load_centroids(spark, paths["cent"])
            return assigned.join(F.broadcast(centroids_df), "list_id").select(
                "doc_id",
                "list_id",
                F.expr(_cos_safe_expr("embedding", "centroid")).alias(
                    "cent_cos"
                ),
                "embedding",
                *[F.col(c) for c in carry],
            )

        _cur_cols = [
            "doc_id", "flag_fp", "tmd5", "target_uri", "text", "n_tokens",
            "gate_keep", "list_id", "cent_cos", "embedding",
            "fz_cycle", "fz_seq",
        ]

        _mark("metadata")
        # ---- per-document DELTA phase (text touched for delta only) -
        enriched = None
        if n_delta:
            bc_delta = n_delta <= _FZ_BC_DELTA_MAX
            raw = filter_by_ids(
                read_touched_buckets(
                    spark, docs_tbl, delta.select("doc_id")
                ),
                "doc_id",
                delta,
                hint_broadcast=bc_delta,
            ).select("doc_id", "text")
            cleaned = strip_flagged_paragraphs(
                raw,
                filter_by_ids(
                    pflags, "doc_id", delta, hint_broadcast=bc_delta
                ),
            ).select("doc_id", F.col("text_clean").alias("text"))
            # the metadata side (ids/fingerprints, never text) is the
            # broadcast side of the rebuild join
            dd = (
                cleaned.join(
                    _bc(delta.select("doc_id", "flag_fp", "target_uri")),
                    "doc_id",
                )
                .withColumn("tmd5", F.md5(F.col("text")))
                .withColumn("n_tokens", F.expr(_N_TOKENS_EXPR))
            )
            if meta is None:
                # freeze cycle only: the rebuild feeds TRAINING too, so
                # pin it before the two consumers
                dd = dd.localCheckpoint()
                if not os.path.exists(paths["nb_meta"]):
                    # first full finalize: train on the capped corpus
                    # with the SAME self-seeded labels as the batch
                    # funnel, then freeze
                    wc = F.size(F.split(F.trim(F.col("text")), r"\s+"))
                    labeled = dd.select(
                        "doc_id",
                        "text",
                        F.when(wc >= min_words, F.lit("keep"))
                        .otherwise("drop")
                        .alias("label"),
                    )
                    _fz_save_nb(train_nb(labeled, bigrams=nb_bigrams), paths)
            nb_model = _fz_load_nb(spark, paths)
            gate = classifier_drop_flags(
                dd.select("doc_id", "text"), nb_model, keep_label="keep"
            ).select("doc_id", (~F.col("drop_classifier")).alias("gate_keep"))
            if meta is not None:
                # steady state: rebuild -> gate -> frozen-quantizer vec
                # columns composed into ONE delta-sized materialization
                # (every action on small data is mostly scheduling, so
                # the cycle's job count is the cost that matters); the
                # single upsert writes the whole per-doc record.  The
                # vec columns ride the projection chain (carry=) as a
                # gated/ungated UNION instead of the old left join-back
                # on doc_id — one broadcast build fewer per evaluation,
                # and the lazy checkpoint under the union makes the
                # rebuild+gate work evaluate once, not once per branch.
                with_gate = dd.join(_bc(gate), "doc_id").localCheckpoint(
                    eager=False
                )
                _wg_carry = tuple(
                    c for c in with_gate.columns if c != "doc_id"
                )
                vec_half = _vec_cols(
                    with_gate.where(F.col("gate_keep")), carry=_wg_carry
                )
                # exact left-join semantics: a NULL gate_keep row (none
                # by construction, but pinned) lands in the ungated
                # half with its vec columns NULL
                ungated_half = (
                    with_gate.where(
                        ~F.coalesce(F.col("gate_keep"), F.lit(False))
                    )
                    .withColumn("list_id", F.lit(None).cast("long"))
                    .withColumn("cent_cos", F.lit(None).cast("double"))
                    .withColumn(
                        "embedding", F.lit(None).cast("array<double>")
                    )
                )
                enriched = vec_half.unionByName(
                    ungated_half
                ).localCheckpoint()
                # the union's branches were the checkpoint's only
                # readers — release its blocks now
                unpersist_checkpoint(with_gate)
                _mark("delta_enrich")
                rows = enriched
            else:
                # freeze cycle: the quantizer trains on this cycle's
                # near-dup survivors — vec columns land in a second
                # (gated-rows-only) upsert below, fz_seq tiebreaking
                enriched = dd.join(gate, "doc_id").localCheckpoint()
                rows = (
                    enriched.withColumn("list_id", F.lit(None).cast("long"))
                    .withColumn("cent_cos", F.lit(None).cast("double"))
                    .withColumn(
                        "embedding", F.lit(None).cast("array<double>")
                    )
                )
            upsert_batch(
                spark,
                paths["cur"],
                rows.withColumn("fz_cycle", F.lit(cycle).cast("long"))
                .withColumn("fz_seq", F.lit(0).cast("long"))
                .select(*_cur_cols),
                ["doc_id"],
                ["fz_cycle", "fz_seq"],
                n_buckets=n_buckets,
            )

        def _texts_for(ids_df: DataFrame) -> DataFrame:
            """(doc_id, tmd5, text) for the given ids — served from the
            delta rebuild when possible; bucket-pruned cur reads only
            for non-delta partners."""
            bc = n_delta <= _FZ_BC_DELTA_MAX
            if enriched is None:
                rest = ids_df
                out = None
            else:
                out = filter_by_ids(
                    enriched.select("doc_id", "tmd5", "text"),
                    "doc_id", ids_df, hint_broadcast=bc,
                )
                rest = ids_df.select("doc_id").join(
                    _bc(enriched.select("doc_id")), "doc_id", "left_anti"
                )
            fetched = filter_by_ids(
                read_touched_buckets(spark, paths["cur"], rest),
                "doc_id", rest, hint_broadcast=bc,
            ).select("doc_id", "tmd5", "text")
            return fetched if out is None else out.unionByName(fetched)

        _mark("delta_curate")
        # ---- shared prelude for the two pair branches ---------------
        cur = read_state_table(spark, paths["cur"]) if os.path.exists(
            paths["cur"]
        ) else spark.createDataFrame([], cur_schema)
        gated_meta = (
            cur.join(capped.select("doc_id"), "doc_id", "left_semi")
            .where(F.col("gate_keep"))
            .select("doc_id", "tmd5")
            # lazy: the n_delta_gated count below materializes this and
            # delta_gated in one job, pinned before any later bucket
            # swap and before the pair branches fork threads
            .localCheckpoint(eager=False)
        )
        delta_gated = filter_by_ids(
            gated_meta, "doc_id", delta,
            hint_broadcast=n_delta <= _FZ_BC_DELTA_MAX,
        ).localCheckpoint(eager=False)
        # same one-probe trade as delta above: both pair branches and
        # the freeze backfill probe this id set from separate actions
        _dg_rows = one_shot_take(delta_gated, _LOCAL_REL_ROWS + 1)
        if len(_dg_rows) <= _LOCAL_REL_ROWS:
            n_delta_gated = len(_dg_rows)
            delta_gated = driver_local_from_rows(
                spark, _dg_rows, delta_gated.schema
            )
        else:
            n_delta_gated = delta_gated.count()

        def _stamp(phase: str, t_start: float) -> None:
            # seconds-only phase stamp, safe to call from branch
            # threads (a per-thread job-count split is meaningless
            # under overlap — the parallel section's combined job count
            # lands in nd_sem_parallel)
            LAST_FROZEN_PHASE_SECONDS[phase] = round(
                LAST_FROZEN_PHASE_SECONDS.get(phase, 0.0)
                + _time.perf_counter()
                - t_start,
                3,
            )

        def _nd_branch() -> None:
            """Band upkeep + near-dup delta pairs.  Ordering contract:
            every relation that reads the band store's PRE-swap files
            (the snapshot union both candidate sides consume) is
            materialized by pair_rows' count BEFORE the branch starts
            its store writes — so the in-memory read-your-writes view
            never races the bucket swaps.  The two writes themselves
            (band store, pair store) are disjoint and run in parallel
            at the branch tail."""
            t0 = _time.perf_counter()
            b, r = choose_lsh_params(nd_threshold)
            _claim_band_scheme(paths["bands"], b, r, nd_threshold)
            if os.path.exists(paths["bands"]):
                store_pre = (
                    read_state_table(spark, paths["bands"])
                    .where(F.col("band_id") >= 0)
                    .join(gated_meta, ["doc_id", "tmd5"], "left_semi")
                    .select("doc_id", "tmd5", "band_id", "bkey")
                )
            else:
                store_pre = spark.createDataFrame(
                    [], "doc_id long, tmd5 string, band_id int, bkey string"
                )
            # delta bands derive straight from the checkpointed delta
            # rebuild — no store miss-probe, no text re-read: a delta
            # doc's cleaned text is new by construction, and the keyed
            # idempotent upsert makes re-banding a redelivered
            # unchanged version a same-rows rewrite, not a duplicate
            new_bands = (
                _new_bands_with_sentinels(
                    spark,
                    enriched.where(F.col("gate_keep")).select(
                        "doc_id", "tmd5", "text"
                    ),
                    b,
                    r,
                )
                if n_delta_gated
                else None
            )
            # read-your-writes view: pre-swap store snapshot + this
            # cycle's fresh bands (duplicate rows from a replayed
            # version are harmless — candidates are distinct'd).
            # Consumed ONCE, as the candidate join's right side, so it
            # stays a lazy union — no persist, no second store scan:
            # the delta side below rides the already-checkpointed
            # new_bands instead of re-probing the store
            all_bands = (
                store_pre
                if new_bands is None
                else store_pre.unionByName(
                    new_bands.where(F.col("band_id") >= 0).select(
                        "doc_id", "tmd5", "band_id", "bkey"
                    )
                )
            ).select("doc_id", "band_id", "bkey")
            _stamp("band_upkeep", t0)
            t0 = _time.perf_counter()
            # ---- near-dup DELTA pairs -------------------------------
            pair_rows = None
            if n_delta_gated:
                # a delta doc's bands are exactly this cycle's fresh
                # derivation (its cleaned text is new by construction),
                # so the delta side needs no store read at all
                db = filter_by_ids(
                    new_bands.where(F.col("band_id") >= 0),
                    "doc_id",
                    delta_gated,
                    hint_broadcast=n_delta_gated <= _FZ_BC_DELTA_MAX,
                ).select("doc_id", "band_id", "bkey")
                # delta-side ⋈ ALL current bands (not a full
                # self-join): symmetric normalization because the delta
                # doc may be either endpoint.  The DELTA side is the
                # broadcast side (n_delta_gated × b band rows), so the
                # store-wide side never shuffles — the stream-static
                # join shape this candidate probe is at scale
                bc_bands = n_delta_gated * b <= _FZ_BC_DELTA_MAX
                cand = (
                    (F.broadcast(db) if bc_bands else db).alias("a")
                    .join(
                        all_bands.alias("b"),
                        (F.col("a.band_id") == F.col("b.band_id"))
                        & (F.col("a.bkey") == F.col("b.bkey"))
                        & (F.col("a.doc_id") != F.col("b.doc_id")),
                    )
                    .select(
                        F.least("a.doc_id", "b.doc_id").alias("doc_a"),
                        F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
                    )
                    .distinct()
                    .localCheckpoint(eager=False)
                )
                need = (
                    cand.select(F.col("doc_a").alias("doc_id"))
                    .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
                    .distinct()
                )
                texts = _texts_for(need).localCheckpoint(eager=False)
                sh = shingle_sets(
                    spark, "", docs=texts.select("doc_id", "text")
                ).localCheckpoint(eager=False)
                scored = (
                    cand.join(
                        sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id")
                    )
                    .join(
                        sh.alias("sb"), F.col("doc_b") == F.col("sb.doc_id")
                    )
                    .select(
                        "doc_a",
                        "doc_b",
                        F.expr("size(array_intersect(sa.sh, sb.sh))").alias(
                            "_i"
                        ),
                        F.expr("size(sa.sh) + size(sb.sh)").alias("_n"),
                    )
                    .select(
                        "doc_a",
                        "doc_b",
                        (
                            F.col("_i").cast("double")
                            / (F.col("_n") - F.col("_i"))
                        ).alias("jaccard"),
                    )
                    .where(F.col("jaccard") >= nd_threshold)
                )
                ta = texts.select(
                    F.col("doc_id").alias("doc_a"),
                    F.col("tmd5").alias("tmd5_a"),
                )
                tb = texts.select(
                    F.col("doc_id").alias("doc_b"),
                    F.col("tmd5").alias("tmd5_b"),
                )
                pair_rows = (
                    scored.join(_bc(ta), "doc_a")
                    .join(_bc(tb), "doc_b")
                    .select(
                        "doc_a",
                        "doc_b",
                        "jaccard",
                        "tmd5_a",
                        "tmd5_b",
                        F.lit(cycle).cast("long").alias("fz_cycle"),
                    )
                    .localCheckpoint(eager=False)
                )
                # the ONE materializing action of the branch: computes
                # band derivation, the snapshot union, candidates and
                # verification together — and pins everything the
                # writes below would otherwise invalidate
                if not pair_rows.count():
                    pair_rows = None
            # ---- branch tail: the two disjoint store writes ---------
            writes = []
            if new_bands is not None:
                def _write_bands():
                    with _band_writer_lock(paths["bands"]):
                        upsert_batch(
                            spark,
                            paths["bands"],
                            new_bands,
                            ["doc_id", "tmd5", "band_id"],
                            "bkey",
                            n_buckets=n_buckets,
                            bucket_cols=["doc_id"],
                        )
                writes.append(_write_bands)
            if pair_rows is not None:
                _pair_rows = pair_rows
                def _write_pairs():
                    upsert_batch(
                        spark,
                        paths["pairs"],
                        _pair_rows,
                        ["doc_a", "doc_b"],
                        ["fz_cycle"],
                        n_buckets=n_buckets,
                        bucket_cols=["doc_a"],
                    )
                writes.append(_write_pairs)
            if writes:
                _parallel_jobs(*writes)
            _stamp("nd_delta_pairs", t0)

        def _sem_branch() -> None:
            """Semantic delta pairs over the frozen quantizer's lists.
            Writes the sem store; reads cur only.  ``max_list`` is
            bound in the enclosing scope before either dispatch."""
            t0 = _time.perf_counter()
            if n_delta_gated:
                vec_gated = (
                    read_state_table(spark, paths["cur"])
                    .join(gated_meta, ["doc_id", "tmd5"], "left_semi")
                    .where(F.col("list_id").isNotNull())
                    .select("doc_id", "tmd5", "list_id", "embedding")
                )
                sizes = vec_gated.groupBy("list_id").agg(
                    F.count(F.lit(1)).alias("_n")
                )
                # only clusters CONTAINING a delta doc can gain pairs
                # this cycle — everything else skips the join (and the
                # vector materialization) entirely
                delta_lists = (
                    filter_by_ids(
                        vec_gated, "doc_id", delta_gated,
                        hint_broadcast=n_delta_gated <= _FZ_BC_DELTA_MAX,
                    )
                    .select("list_id")
                    .distinct()
                )
                ok_lists = (
                    sizes.where(F.col("_n") <= max_list)
                    .select("list_id")
                    .join(delta_lists, "list_id", "left_semi")
                )
                joinable = vec_gated.join(
                    F.broadcast(ok_lists),
                    "list_id",
                    "left_semi",
                ).localCheckpoint(eager=False)
                dv = filter_by_ids(
                    joinable, "doc_id", delta_gated,
                    hint_broadcast=n_delta_gated <= _FZ_BC_DELTA_MAX,
                )
                # delta vectors are the broadcast side of the
                # cluster-pair join — the cluster-wide side stays
                # shuffle-free (same shape as the band candidate join)
                sem_scored = (
                    _bc(dv).alias("a")
                    .join(
                        joinable.alias("b"),
                        (F.col("a.list_id") == F.col("b.list_id"))
                        & (F.col("a.doc_id") != F.col("b.doc_id")),
                    )
                    .select(
                        F.least("a.doc_id", "b.doc_id").alias("vec_a"),
                        F.greatest("a.doc_id", "b.doc_id").alias("vec_b"),
                        F.when(
                            F.col("a.doc_id") < F.col("b.doc_id"),
                            F.col("a.tmd5"),
                        )
                        .otherwise(F.col("b.tmd5"))
                        .alias("tmd5_a"),
                        F.when(
                            F.col("a.doc_id") < F.col("b.doc_id"),
                            F.col("b.tmd5"),
                        )
                        .otherwise(F.col("a.tmd5"))
                        .alias("tmd5_b"),
                        F.expr(
                            _cos_safe_expr("a.embedding", "b.embedding")
                        ).alias("cos"),
                    )
                    .where(F.col("cos") >= sem_threshold)
                    .distinct()
                    .withColumn("fz_cycle", F.lit(cycle).cast("long"))
                    .localCheckpoint(eager=False)
                )
                # no separate emptiness count: the upsert's own
                # touched-bucket probe materializes the checkpointed
                # batch and early-returns when it is empty — one exec
                # per cycle instead of two
                upsert_batch(
                    spark,
                    paths["sem"],
                    sem_scored,
                    ["vec_a", "vec_b"],
                    ["fz_cycle"],
                    n_buckets=n_buckets,
                    bucket_cols=["vec_a"],
                )
            _stamp("sem_delta_pairs", t0)

        if meta is not None:
            # ---- steady state: the two pair branches write DISJOINT
            # stores (bands+pairs vs sem) off the same checkpointed
            # prelude — overlap them on the cluster; on a small delta
            # each branch is scheduling-bound, so the fork collapses
            # their latencies into ~the longer one
            max_list = meta["max_list"]
            _parallel_jobs(_nd_branch, _sem_branch)
            _mark("nd_sem_parallel")
        else:
            # ---- freeze cycle: sequential — the quantizer trains on
            # the near-dup SURVIVORS, which need the pair branch done,
            # and the sem branch needs the quantizer
            _nd_branch()
            _mark("nd_branch_wall")
            # quantizer freeze: keyed on the META file, not the model
            # dir — a crash between the model save and the meta commit
            # repairs by re-running the (deterministic) fit
            near_ids = _fz_near_dedup_ids(spark, paths, gated_meta)
            nd_texts = _texts_for(near_ids).select("doc_id", "text")
            emb_fit = hashed_text_embeddings(nd_texts, dim=emb_dim)
            # identical fit path to semantic_dedup's internal call
            # (same n_lists resolution, seed, sample cap, max_iter)
            _, centroids, kmodel = kmeans_ivf_index(
                spark,
                "",
                n_lists=n_lists,
                seed=7,
                emb=emb_fit,
                max_iter=kmeans_max_iter,
                return_model=True,
            )
            kmodel.write().overwrite().save(paths["km"])
            centroids.write.mode("overwrite").parquet(paths["cent"])
            # freeze the cap exactly as semantic_dedup derives it:
            # 8x the mean SURVIVOR list size, floored at 64
            n_vec = emb_fit.count()
            n_cl = max(centroids.count(), 1)
            max_list = max(64, -(-8 * n_vec // n_cl))
            _mark("quantizer")
            # vec backfill: the steady-state path writes vec columns
            # inline with the cur upsert; on the FREEZE cycle the
            # quantizer did not exist yet, so gated rows get their vec
            # columns in a second upsert (fz_seq=1 outranks the seq-0
            # row of the same cycle)
            if enriched is not None and n_delta_gated:
                gated_rows = filter_by_ids(
                    enriched, "doc_id", delta_gated,
                    hint_broadcast=n_delta_gated <= _FZ_BC_DELTA_MAX,
                )
                rows2 = gated_rows.join(
                    _vec_cols(gated_rows.select("doc_id", "text")), "doc_id"
                )
                upsert_batch(
                    spark,
                    paths["cur"],
                    rows2.withColumn("fz_cycle", F.lit(cycle).cast("long"))
                    .withColumn("fz_seq", F.lit(1).cast("long"))
                    .select(*_cur_cols),
                    ["doc_id"],
                    ["fz_cycle", "fz_seq"],
                    n_buckets=n_buckets,
                )
            _mark("vec_backfill")
            _sem_branch()
            _mark("sem_branch_wall")

        # ---- commit the cycle ----------------------------------------
        mtmp = paths["meta"] + f".tmp-{os.getpid()}"
        with open(mtmp, "w") as fh:
            json.dump(
                {"fz_cycle": cycle, "max_list": int(max_list),
                 "params": params},
                fh,
            )
        from streamsum_spark import commitio

        commitio.get_backend().replace(mtmp, paths["meta"])

    _mark("commit")
    # ---- serve (lazy relations over the committed state) -------------
    stages: dict[str, DataFrame] = {}
    docs_full = read_state_table(spark, docs_tbl)
    stages["url_deduped"] = docs_full.join(flags, "doc_id", "left_anti")
    cur = read_state_table(spark, paths["cur"]) if os.path.exists(
        paths["cur"]
    ) else spark.createDataFrame([], cur_schema)
    domain_capped = capped.select("doc_id").join(
        cur.select("doc_id", "target_uri", "text", "n_tokens", "gate_keep"),
        "doc_id",
    )
    stages["domain_capped"] = domain_capped.select(
        "doc_id", "target_uri", "text"
    )
    quality_gated = domain_capped.where(F.col("gate_keep")).select(
        "doc_id", "target_uri", "text", "n_tokens"
    )
    stages["quality_gated"] = quality_gated.select(
        "doc_id", "target_uri", "text"
    )
    # no checkpoint: the drops side is a driver-local relation (the CC
    # fast path), so each consumer re-derives a cheap anti-join over
    # the checkpointed gated_meta, not a recomputation
    near_ids = _fz_near_dedup_ids(spark, paths, gated_meta)
    near_deduped = quality_gated.join(near_ids, "doc_id", "left_semi")
    stages["near_deduped"] = near_deduped.select(
        "doc_id", "target_uri", "text"
    )
    _mark("serve_nd_cc")
    # semantic keep over current nd survivors: batch semantics — capped
    # clusters (by SURVIVOR size vs the frozen max_list) bypass, pairs
    # among uncapped clusters resolve to components, the exemplar
    # farthest from its centroid survives
    nd_vec = (
        cur.where(F.col("list_id").isNotNull())
        .join(near_ids, "doc_id", "left_semi")
        .select("doc_id", "tmd5", "list_id", "cent_cos")
    )
    nd_sizes = nd_vec.groupBy("list_id").agg(F.count(F.lit(1)).alias("_n"))
    # bounded by the number of k-means lists at ANY corpus size, and the
    # uncapped_vec chain below is re-evaluated by every consumer of
    # sem_drops (CC probe, pack maintenance, packed materialization) —
    # each would re-run this aggregation as its own broadcast-build job;
    # one driver-local copy makes those rebuilds free
    capped_lists = driver_local(
        nd_sizes.where(F.col("_n") > max_list).select("list_id"),
        max_rows=1_000_000,
    )
    # metadata-width (ids + list routing, no text/vectors) and consumed
    # by FOUR chains (sem pair serve x2, the drop window, the pack and
    # packed consumers downstream of sem_deduped): one lazy checkpoint,
    # materialized by the CC probe below, replaces a per-action re-read
    # of cur + the near-dup anti + the capped-list filter
    uncapped_vec = filter_by_ids(
        nd_vec, "list_id", capped_lists, anti=True, id_col="list_id"
    )
    if os.path.exists(paths["sem"]):
        semp = read_state_table(spark, paths["sem"])
    else:
        semp = spark.createDataFrame(
            [],
            "vec_a long, vec_b long, tmd5_a string, tmd5_b string, "
            "cos double, fz_cycle long",
        )
    # one inner join per endpoint: uncapped_vec carries tmd5 straight
    # from cur, so "endpoint is an uncapped survivor" and "stored tmd5
    # matches the current cleaned text" collapse into a single probe
    # (uncapped ⊆ cur, tmd5 identical; one row per doc_id, so the inner
    # join is the semi join plus the endpoint's cent_cos riding along).
    # Carrying cent_cos on the EDGES lets the whole serve step — CC and
    # the keep-one-exemplar window — run on the driver from the one
    # bounded edge collect: the old shape paid a second full
    # cur-scan-join-window job to attach cent_cos back to components.
    ua = uncapped_vec.select(
        F.col("doc_id").alias("vec_a"),
        F.col("tmd5").alias("tmd5_a"),
        F.col("cent_cos").alias("cent_a"),
    )
    ub = uncapped_vec.select(
        F.col("doc_id").alias("vec_b"),
        F.col("tmd5").alias("tmd5_b"),
        F.col("cent_cos").alias("cent_b"),
    )
    sem_edges = (
        semp.join(ua, ["vec_a", "tmd5_a"])
        .join(ub, ["vec_b", "tmd5_b"])
        .select("vec_a", "vec_b", "cos", "cent_a", "cent_b")
        .localCheckpoint(eager=False)
    )
    from streamsum_spark.operators.clusters import (
        SMALL_CC_EDGES,
        union_find_components,
    )

    _sem_probe = one_shot_take(sem_edges, SMALL_CC_EDGES + 1)
    if len(_sem_probe) <= SMALL_CC_EDGES:
        unpersist_checkpoint(sem_edges)
        # driver-side CC + exemplar choice, value-identical to the
        # distributed window (pinned in tests): component = min id
        # reachable; within a component the FIRST row of the window
        # ordered (cent_cos ASC NULLS FIRST with NaN greatest, doc_id
        # ASC) survives, the rest drop.  cent_cos is doc-unique (cur is
        # doc_id-keyed), so the edge-carried copies agree.
        import math

        cent: dict = {}
        for r in _sem_probe:
            cent[r.vec_a] = r.cent_a
            cent[r.vec_b] = r.cent_b
        groups: dict = {}
        for v, root in union_find_components(
            [(r.vec_a, r.vec_b) for r in _sem_probe]
        ):
            groups.setdefault(root, []).append(v)

        def _ord(d):
            c = cent.get(d)
            if c is None:
                return (0, 0.0, d)  # NULLS FIRST under ASC
            if isinstance(c, float) and math.isnan(c):
                return (2, 0.0, d)  # NaN sorts greater than any double
            return (1, c, d)

        drop_ids = []
        for members in groups.values():
            members.sort(key=_ord)
            drop_ids.extend(members[1:])
        sem_drops = driver_local_from_rows(
            spark,
            [Row(doc_id=d) for d in sorted(drop_ids)],
            T.StructType(
                [T.StructField("doc_id", cur.schema["doc_id"].dataType)]
            ),
        )
    else:
        # big pair graph: the distributed CC + window path, unchanged
        # (small_cut=0 — the edge relation is already materialized and
        # known big, so the dispatch probe would be wasted)
        served_sem = sem_edges.select("vec_a", "vec_b", "cos")
        comp2 = connected_components(
            served_sem, "vec_a", "vec_b", small_cut=0
        )
        wr = Window.partitionBy("component").orderBy(
            F.col("cent_cos").asc(), F.col("doc_id").asc()
        )
        # duplicates-only (losers of clustered components): bounded
        # driver-local, so the anti below is a literal predicate and no
        # downstream consumer re-runs the window + component join
        sem_drops = driver_local(
            uncapped_vec.join(
                comp2.withColumnRenamed("id", "doc_id"), "doc_id"
            )
            .withColumn("rn", F.row_number().over(wr))
            .where(F.col("rn") > 1)
            .select("doc_id")
        )
    sem_deduped = filter_by_ids(
        near_deduped, "doc_id", sem_drops, anti=True
    )
    stages["sem_deduped"] = sem_deduped.select(
        "doc_id", "target_uri", "text"
    )
    _mark("serve_sem_cc")
    # ---- incremental pack (append-stable chunk identities) -----------
    # Batch packing re-flows every chunk whenever membership changes —
    # O(corpus) serving per cycle, and chunk ids a resumed training
    # loader cannot trust.  The frozen funnel keeps a pack STATE table
    # (doc_id -> part/chunk/n_tokens) instead: a survivor keeps its
    # assignment for as long as it survives with that text
    # (append-stable), a lapsed doc tombstones out (its chunk id is
    # never reused), and new survivors pack into FRESH chunks per part
    # starting one past the part's historical max.  The freeze cycle
    # seeds the table with pack_into_chunks over the full survivor set
    # — bit-identical to the batch funnel, so freeze-equals-batch holds
    # through (part, chunk); later cycles trade batch-identical
    # chunking for O(delta) pack maintenance, the same
    # exactness-for-incrementality trade the whole frozen mode makes.
    surv_meta = sem_deduped.select("doc_id", "n_tokens")
    pack_tbl = paths["pack"]
    news_asg = None
    if not os.path.exists(pack_tbl):
        seeded = pack_into_chunks(
            spark,
            "",
            budget=chunk_budget,
            docs=surv_meta,
            n_tokens_col="n_tokens",
        ).withColumn("fz_cycle", F.lit(cycle).cast("long"))
        upsert_batch(
            spark, pack_tbl, seeded, ["doc_id"], ["fz_cycle"],
            n_buckets=n_buckets,
        )
    else:
        prev = read_state_table(spark, pack_tbl).select(
            "doc_id", "n_tokens", "part", "chunk"
        )
        # ONE full-outer join on doc_id (both sides key-unique) serves
        # all three derivations — news, gone, bases — where the old
        # form scanned the pack table three times through two
        # anti-joins plus a separate groupBy: surviving docs with a
        # changed token count re-enter as news, prev docs absent from
        # the survivors leave, and the per-part chunk base rides the
        # prev side of the same join.  Lazily checkpointed: the upsert
        # below materializes it once and every consumer reuses it.
        j = (
            prev.select(
                "doc_id",
                F.col("n_tokens").alias("_p_nt"),
                "part",
                F.col("chunk").alias("_p_chunk"),
            )
            .join(
                surv_meta.select(
                    "doc_id", F.col("n_tokens").alias("_s_nt")
                ),
                "doc_id",
                "full_outer",
            )
            .localCheckpoint(eager=False)
        )
        news = j.where(
            F.col("_s_nt").isNotNull()
            & (F.col("_p_nt").isNull() | (F.col("_p_nt") != F.col("_s_nt")))
        ).select("doc_id", F.col("_s_nt").alias("n_tokens"))
        bases = (
            j.where(F.col("_p_nt").isNotNull())
            .groupBy("part")
            .agg((F.max("_p_chunk") + F.lit(1)).alias("_base"))
        )
        part_expr = (
            "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 1), "
            "16, 10) AS BIGINT)"
        )
        wpk = (
            Window.partitionBy("part")
            .orderBy("_ord")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        assigned = (
            news.withColumn("part", F.expr(part_expr))
            .withColumn("_ord", F.md5(F.col("doc_id").cast("string")))
            .join(F.broadcast(bases), "part", "left")
            .withColumn("running", F.sum("n_tokens").over(wpk))
            .select(
                "doc_id",
                "n_tokens",
                "part",
                (
                    F.coalesce(F.col("_base"), F.lit(0))
                    + F.expr(
                        f"CAST((running - n_tokens) / {chunk_budget} "
                        "AS BIGINT)"
                    )
                ).alias("chunk"),
            )
        )
        # a re-packed doc is simply overwritten by its new row;
        # tombstones are only for docs leaving the pack entirely
        gone = j.where(F.col("_s_nt").isNull()).select(
            "doc_id",
            F.col("_p_nt").alias("n_tokens"),
            "part",
            F.col("_p_chunk").alias("chunk"),
        )
        pk_ups = (
            assigned.withColumn("_deleted", F.lit(False))
            .unionByName(gone.withColumn("_deleted", F.lit(True)))
            .withColumn("fz_cycle", F.lit(cycle).cast("long"))
            .localCheckpoint(eager=False)
        )
        # no separate emptiness count: the upsert's own touched-bucket
        # probe materializes the checkpointed batch and early-returns
        # when it is empty
        upsert_batch(
            spark, pack_tbl, pk_ups, ["doc_id"], ["fz_cycle"],
            n_buckets=n_buckets,
        )
        # delta-sized by construction; the emission chain probes it from
        # several actions (texts fetch, uri attach, final join) — see
        # driver_local.  Over the bound it stays a lazy view of the
        # already-materialized pk_ups checkpoint.
        news_asg = driver_local(
            pk_ups.where(~F.col("_deleted")).select(
                "doc_id", "n_tokens", "part", "chunk"
            )
        )
    _mark("serve_pack")
    pack_cur = read_state_table(spark, pack_tbl).select(
        "doc_id", "n_tokens", "part", "chunk"
    )
    stages["packed"] = sem_deduped.select(
        "doc_id", "target_uri", "text"
    ).join(pack_cur, "doc_id")
    # the per-cycle EMISSION an incremental pipeline hands its consumer:
    # this cycle's newly packed docs (their chunks are whole — chunks
    # never span cycles).  On the seed cycle everything is new.  Built
    # DELTA-FIRST, not by filtering the corpus-width packed relation:
    # texts come from the checkpointed delta rebuild (bucket-pruned cur
    # reads only for re-entrant survivors that were never re-curated),
    # uris from the checkpointed capped metadata, assignments from the
    # checkpointed pack batch — materializing the emission costs
    # O(delta), never a corpus-width window or text scan.
    if news_asg is None:
        stages["packed_delta"] = stages["packed"]
    else:
        stages["packed_delta"] = (
            _texts_for(news_asg)
            .select("doc_id", "text")
            .join(capped.select("doc_id", "target_uri"), "doc_id")
            .join(_bc(news_asg), "doc_id")
            .select(
                "doc_id", "target_uri", "text", "n_tokens", "part", "chunk"
            )
        )
    stages["fz_delta"] = delta.select("doc_id")
    # diagnostic: the versions whose bands were (re)derived this cycle
    # — a delta doc's cleaned text is new by construction, so this IS
    # the former miss set without the store probe it used to cost; an
    # idle cycle reports it empty
    stages["nd_band_misses"] = delta_gated.select("doc_id")
    _mark("serve_build")
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
    mode: str = "exact",
) -> DataFrame:
    """The composed STREAMING corpus-prep funnel: ingest whatever WARC
    shards are new under ``warc_dir`` (incremental parse + state
    upserts), then finalize over the accumulated state.  Same output
    relation as corpus_prep_e2e — and pinned EQUAL to it over the union
    of everything ingested, across out-of-order shard arrival,
    redelivery, and resume (tests/test_corpus_prep.py).
    ``mode="frozen"`` switches the finalize to the O(delta) frozen-
    model path (stream_corpus_prep_frozen_stages)."""
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
        mode=mode,
    )["packed"]
