"""The composed corpus-preparation pipeline (r12 verdict order #2):
every stage of the crawl-to-corpus chain the individual operators
implement, chained end-to-end with NO driver-side seam —

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
    from streamsum_spark.operators.classifier import quality_filter_nb, train_nb
    from streamsum_spark.operators.clusters import connected_components
    from streamsum_spark.operators.crawl import (
        cap_per_domain,
        dedup_by_canonical_url,
        with_url_parts,
    )
    from streamsum_spark.operators.dedup import dedup_paragraphs, near_dup_tuned
    from streamsum_spark.operators.sampling import pack_into_chunks
    from streamsum_spark.operators.similarity import (
        hashed_text_embeddings,
        semantic_dedup,
    )
    from streamsum_spark.sources.warc import read_warc_text

    stages: dict[str, DataFrame] = {}

    # 1. ingest: WARC -> text, with a per-FETCH doc identity (URI +
    # file + record ordinal — see doc_id_col for the 64-bit honesty
    # note; WARC records carry no numeric id).  with_url_parts adds
    # canonical_url + host in ONE projection — the funnel's single
    # try_parse_url family: the URL-dedup window and the domain cap
    # both consume these columns instead of re-parsing the URL
    ingested = with_url_parts(
        read_warc_text(spark, warc_dir, glob).select(
            doc_id_col().alias("doc_id"),
            "target_uri",
            "warc_file",
            "ordinal",
            "text",
        )
    )
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
