"""corpus_prep_e2e (r12 verdict order #2): the crawl-to-corpus funnel
composes without a driver-side seam — each stage's survivor set equals
the individually-invoked operator run on the previous stage's output,
and the planted fixtures (boilerplate paragraph, over-cap domain, junk
docs, a near-dup pair, a semantic-dup pair) each fall at exactly the
stage built to catch them."""

from __future__ import annotations

import gzip
import random

import pytest
from pyspark.sql import functions as F

from streamsum_spark.corpus_prep import corpus_prep_e2e, corpus_prep_stages
from streamsum_spark.sources import warc as W

BANNER = "ACCEPT COOKIES TO CONTINUE"
CAP = 3
MIN_WORDS = 40


def _good_text(tag: str, n: int = 45) -> str:
    """n unique words (vocabulary disjoint across docs except planted
    pairs) + the shared boilerplate paragraph."""
    words = " ".join(f"{tag}w{j}" for j in range(n))
    return f"{BANNER}\n{words}"


def _build_corpus(tmp_path):
    """WARC shards holding: 6 good docs on big.com (cap=3 binds), 4 good
    docs on other domains, a near-dup pair (1-word edit), a semantic-dup
    pair (same multiset, shuffled order), and 5 junk docs."""
    docs: list[tuple[str, str]] = []
    for i in range(6):
        docs.append((f"http://h{i}.big.com/p{i}", _good_text(f"big{i}")))
    for i in range(4):
        docs.append((f"http://site{i}.com/p", _good_text(f"solo{i}")))
    # near-dup pair: 44 shared words of 45 -> shingle Jaccard ~0.9
    base = [f"ndw{j}" for j in range(45)]
    docs.append(("http://ndpair.com/a", BANNER + "\n" + " ".join(base)))
    docs.append(
        ("http://ndpair.com/b", BANNER + "\n" + " ".join(base[:-1] + ["ndx"]))
    )
    # semantic-dup pair: identical multiset, shuffled -> shingle overlap
    # ~0, hashed-BoW cosine exactly 1.0
    sem = [f"semw{j}" for j in range(45)]
    shuffled = sem[:]
    random.Random(3).shuffle(shuffled)
    docs.append(("http://sempair.com/a", BANNER + "\n" + " ".join(sem)))
    docs.append(("http://sempair.com/b", BANNER + "\n" + " ".join(shuffled)))
    # junk: short, distinct spam vocabulary
    for i in range(5):
        docs.append(
            (f"http://junk{i}.spam.com/x", f"buy click now pills deal j{i}")
        )
    # URL-level re-fetch: same page as site0's, URI differs only by a
    # tracking param — must collapse at the url_deduped stage
    docs.append(("http://site0.com/p?utm_source=tw", _good_text("solo0")))

    recs = []
    for uri, text in docs:
        html = f"<html><body><p>{text}</p></body></html>".replace(
            "\n", "</p><p>"
        ).encode()
        http = (
            f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            f"Content-Length: {len(html)}\r\n\r\n".encode() + html
        )
        recs.append(
            W.build_warc_record(
                {
                    "WARC-Type": "response",
                    "WARC-Record-ID": f"<urn:t:{uri}>",
                    "WARC-Date": "2024-01-01T00:00:00Z",
                    "WARC-Target-URI": uri,
                    "Content-Type": "application/http; msgtype=response",
                },
                http,
            )
        )
    d = tmp_path / "prep_warc"
    d.mkdir()
    half = len(recs) // 2
    for i, chunk in enumerate((recs[:half], recs[half:])):
        (d / f"s{i}.warc.gz").write_bytes(
            b"".join(gzip.compress(r, mtime=0) for r in chunk)
        )
    return str(d), docs


@pytest.fixture(scope="module")
def prep(spark, tmp_path_factory):
    warc_dir, docs = _build_corpus(tmp_path_factory.mktemp("cp"))
    stages = corpus_prep_stages(
        spark,
        warc_dir,
        domain_cap=CAP,
        min_words=MIN_WORDS,
        emb_dim=32,
        cache_token="corpus_prep_test",
    )
    return warc_dir, docs, stages, {
        name: {r.doc_id: r for r in df.collect()}
        for name, df in stages.items()
    }


def test_funnel_is_monotone_and_stagewise_correct(prep):
    warc_dir, docs, stages, got = prep
    n_in = len(docs)
    assert len(got["ingested"]) == n_in
    # survivor sets only ever shrink, in stage order
    order = [
        "ingested", "url_deduped", "para_deduped", "domain_capped",
        "quality_gated", "near_deduped", "sem_deduped", "packed",
    ]
    for a, b in zip(order, order[1:]):
        assert set(got[b]) <= set(got[a]), (a, b)
    # URL dedup: the tracking-param re-fetch collapses to one survivor
    surv_uris = [r.target_uri for r in got["url_deduped"].values()]
    assert len(got["url_deduped"]) == n_in - 1
    assert (
        sum(1 for u in surv_uris if u.startswith("http://site0.com/p")) == 1
    )
    # paragraph dedup: the banner survives exactly once corpus-wide
    texts = [r.text for r in got["para_deduped"].values()]
    assert sum(t.count(BANNER) for t in texts) == 1
    assert len(got["para_deduped"]) == n_in - 1
    # domain cap binds on big.com only
    by_dom = {}
    for r in got["domain_capped"].values():
        dom = ".".join(r.target_uri.split("/")[2].split(".")[-2:])
        by_dom.setdefault(dom, []).append(r)
    assert len(by_dom["big.com"]) == CAP
    assert all(len(v) <= CAP for v in by_dom.values())
    # quality gate: every junk doc is gone, pairs survive
    gated_uris = {r.target_uri for r in got["quality_gated"].values()}
    assert not any("spam.com" in u for u in gated_uris)
    assert {"http://ndpair.com/a", "http://ndpair.com/b"} <= gated_uris
    assert {"http://sempair.com/a", "http://sempair.com/b"} <= gated_uris
    # near-dup drops exactly one of the nd pair, leaves the sem pair
    nd_uris = {r.target_uri for r in got["near_deduped"].values()}
    assert len(nd_uris & {"http://ndpair.com/a", "http://ndpair.com/b"}) == 1
    assert {"http://sempair.com/a", "http://sempair.com/b"} <= nd_uris
    # semantic dedup drops exactly one of the sem pair
    sem_uris = {r.target_uri for r in got["sem_deduped"].values()}
    assert len(sem_uris & {"http://sempair.com/a", "http://sempair.com/b"}) == 1
    # packing covers every survivor with positive token counts
    assert set(got["packed"]) == set(got["sem_deduped"])
    assert all(r.n_tokens > 0 and r.chunk >= 0 for r in got["packed"].values())


def test_stages_equal_individual_operators(spark, prep):
    """Survivor-set equality: re-run each operator standalone on the
    PREVIOUS stage's relation with the same parameters — the composed
    funnel must produce identical survivors (no seam, no reordering
    effects)."""
    warc_dir, docs, stages, got = prep
    from streamsum_spark.operators.classifier import quality_filter_nb, train_nb
    from streamsum_spark.operators.clusters import connected_components
    from streamsum_spark.operators.crawl import cap_per_domain
    from streamsum_spark.operators.dedup import dedup_paragraphs, near_dup_tuned
    from streamsum_spark.operators.similarity import (
        hashed_text_embeddings,
        semantic_dedup,
    )

    # stage 1b: canonical-URL dedup on the ingested relation
    from streamsum_spark.operators.crawl import dedup_by_canonical_url

    direct_url = {
        r.doc_id
        for r in dedup_by_canonical_url(stages["ingested"]).collect()
    }
    assert direct_url == set(got["url_deduped"])
    # stage 2: paragraph dedup on the url-deduped relation
    ing = stages["url_deduped"]
    direct = {
        r.doc_id: r.text_clean
        for r in dedup_paragraphs(
            spark, "", docs=ing.select("doc_id", "text")
        ).collect()
    }
    assert direct == {k: r.text for k, r in got["para_deduped"].items()}
    # stage 3: cap on the para-deduped relation
    capped = {
        r.doc_id
        for r in cap_per_domain(
            stages["para_deduped"], cap=CAP, url_col="target_uri"
        ).collect()
    }
    assert capped == set(got["domain_capped"])
    # stage 4: train + gate reproduces the composed gate exactly
    dc = stages["domain_capped"]
    wc = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    model = train_nb(
        dc.select(
            "doc_id", "text",
            F.when(wc >= MIN_WORDS, F.lit("keep")).otherwise("drop").alias("label"),
        ),
        bigrams=False,  # the pipeline's nb_bigrams default
    )
    gated = {
        r.doc_id for r in quality_filter_nb(dc, model, keep_label="keep").collect()
    }
    assert gated == set(got["quality_gated"])
    # stage 5: tuned near-dup + CC keep-min on the gated relation
    qg = stages["quality_gated"]
    pairs = near_dup_tuned(
        spark, "", threshold=0.5, docs=qg.select("doc_id", "text"),
        cache_token="corpus_prep_test_direct",
    )
    comp = connected_components(pairs, "doc_a", "doc_b")
    drops = {r.id for r in comp.where(F.col("id") != F.col("component")).collect()}
    assert set(got["quality_gated"]) - drops == set(got["near_deduped"])
    # stage 6: semantic dedup over the same hashed embeddings
    emb = hashed_text_embeddings(stages["near_deduped"], dim=32)
    sem = semantic_dedup(
        spark, "", threshold=0.9, emb=emb,
        cache_token="corpus_prep_test_direct",
        kmeans_max_iter=8,  # the pipeline's kmeans_max_iter default
    )
    sem_keep = {r.vec_id for r in sem.collect() if r.kept}
    assert sem_keep == set(got["sem_deduped"])


def test_funnel_report_accounts_every_stage(prep):
    """The audit report walks the stages in funnel order with
    consistent drop accounting: counts monotone non-increasing, drops
    non-negative and telescoping (ingested count - packed count =
    total dropped)."""
    from streamsum_spark.corpus_prep import FUNNEL_STAGE_ORDER, funnel_report

    warc_dir, docs, stages, got = prep
    rep = funnel_report(stages)
    assert [r["stage"] for r in rep] == list(FUNNEL_STAGE_ORDER)
    assert rep[0]["n_docs"] == len(docs) and rep[0]["dropped"] == 0
    ns = [r["n_docs"] for r in rep]
    assert all(a >= b for a, b in zip(ns, ns[1:]))
    assert all(r["dropped"] >= 0 for r in rep)
    assert sum(r["dropped"] for r in rep) == ns[0] - ns[-1]
    # every stage's count matches the collected fixture
    for r in rep:
        assert r["n_docs"] == len(got[r["stage"]]), r["stage"]


def test_funnel_report_never_rescans_crawl_bytes(spark, tmp_path):
    """Verdict r14 order #3, the IO assertion: after one full pass the
    accounting report runs entirely from the funnel's persists plus the
    observe() tap on the parse — proven by DELETING the WARC files and
    re-running funnel_report, which would fail loudly on any stage
    count (including `ingested`, previously a count() over the
    unpersisted parse) that re-reads crawl bytes."""
    import shutil

    from streamsum_spark.corpus_prep import funnel_report

    warc_dir, docs = _build_corpus(tmp_path)
    stages = corpus_prep_stages(
        spark,
        warc_dir,
        domain_cap=CAP,
        min_words=MIN_WORDS,
        emb_dim=32,
        cache_token="corpus_prep_test_noscan",
    )
    rep1 = funnel_report(stages)
    assert rep1[0]["stage"] == "ingested"
    assert rep1[0]["n_docs"] == len(docs)
    shutil.rmtree(warc_dir)
    rep2 = funnel_report(stages)
    assert rep2 == rep1


def test_corpus_prep_e2e_returns_packed(spark, prep):
    warc_dir, docs, stages, got = prep
    out = corpus_prep_e2e(
        spark, warc_dir, domain_cap=CAP, min_words=MIN_WORDS, emb_dim=32,
        cache_token="corpus_prep_test_e2e",
    )
    assert {r.doc_id for r in out.collect()} == set(got["packed"])
    assert set(out.columns) == {
        "doc_id", "target_uri", "text", "n_tokens", "part", "chunk",
    }


def test_hashed_text_embeddings_contract(spark):
    from streamsum_spark.operators.similarity import hashed_text_embeddings

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),
            (1, "delta gamma beta alpha"),  # same multiset -> same vector
            (2, "totally different words here"),
            (3, ""),  # empty text: zero vector stays zero (no NaN)
        ],
        "doc_id long, text string",
    )
    out = {r.vec_id: list(r.embedding) for r in
           hashed_text_embeddings(docs, dim=16).collect()}
    assert all(len(v) == 16 for v in out.values())
    assert out[0] == out[1]
    assert out[0] != out[2]
    for vid in (0, 2):
        assert sum(x * x for x in out[vid]) == pytest.approx(1.0, abs=1e-9)
    assert all(x == 0.0 for x in out[3])
    with pytest.raises(ValueError, match="dim"):
        hashed_text_embeddings(docs, dim=1)


def test_corpus_prep_plan_is_jvm_side_except_warc_parse(prep):
    """Scale shape: the whole funnel's plan carries NO row-at-a-time or
    Arrow Python evaluation and no cartesian/nested-loop join — the one
    designed Python seam is the WARC record parse (mapInPandas), and
    every later stage (paragraph dedup, cap window, NB gate, LSH,
    semantic pairs, packing) stays JVM-side expression work."""
    from streamsum_spark.plans import inspect as PI

    warc_dir, docs, stages, got = prep
    for stage in ("domain_capped", "packed"):
        plan = PI.explain_str(stages[stage])
        assert "ArrowEvalPython" not in plan, stage
        assert "BatchEvalPython" not in plan, stage
        assert "CartesianProduct" not in plan, stage
        assert "BroadcastNestedLoop" not in plan, stage
    # the WARC parse seam shows up in the pre-gate plan; the post-gate
    # plan starts from the localCheckpoint boundary (lineage cut) and
    # carries NO Python at all
    assert "MapInPandas" in PI.explain_str(stages["domain_capped"])
    assert "MapInPandas" not in PI.explain_str(stages["packed"])


def test_stream_corpus_prep_equals_batch_out_of_order(spark, tmp_path):
    """r13 verdict order #1 — the composed STREAMING funnel: the same
    corpus split into 3 shards arriving OUT OF ORDER (one file per
    micro-batch) yields exactly corpus_prep_e2e's survivors on the
    union; a resume (same state, derived checkpoint) is stable, and a
    full REDELIVERY (same state, fresh checkpoint re-feeds every
    shard) changes nothing — the state stores are keyed upserts."""
    import os
    import time

    from streamsum_spark.corpus_prep import (
        corpus_prep_stages,
        stream_corpus_prep,
        stream_corpus_prep_stages,
    )

    # the module corpus's doc list, re-sharded 3 ways by stride so the
    # URL-dup pair, the near-dup pair and the sem-dup pair all straddle
    # shards; mtimes make arrival order s2, s0, s1 (out of construction
    # order)
    import gzip

    (tmp_path / "c3").mkdir()
    _, docs = _build_corpus(tmp_path / "c3")
    d3 = tmp_path / "shards3"
    d3.mkdir()
    from streamsum_spark.sources import warc as W

    def rec(uri, text):
        html = f"<html><body><p>{text}</p></body></html>".replace(
            "\n", "</p><p>"
        ).encode()
        http = (
            f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            f"Content-Length: {len(html)}\r\n\r\n".encode() + html
        )
        return W.build_warc_record(
            {
                "WARC-Type": "response",
                "WARC-Record-ID": f"<urn:t:{uri}>",
                "WARC-Date": "2024-01-01T00:00:00Z",
                "WARC-Target-URI": uri,
                "Content-Type": "application/http; msgtype=response",
            },
            http,
        )

    arrival = {0: 1, 1: 2, 2: 0}  # shard index -> arrival rank
    for i in range(3):
        chunk = docs[i::3]
        p = d3 / f"s{i}.warc.gz"
        p.write_bytes(
            b"".join(gzip.compress(rec(u, t), mtime=0) for u, t in chunk)
        )
        t = time.time() + arrival[i] * 20
        os.utime(p, (t, t))

    kw = dict(domain_cap=CAP, min_words=MIN_WORDS, emb_dim=32)
    bstages = corpus_prep_stages(
        spark, str(d3), cache_token="scp_batch", **kw
    )
    batch = {
        (r.doc_id, r.text, r.n_tokens) for r in bstages["packed"].collect()
    }
    assert batch  # the funnel keeps something

    base = str(tmp_path / "scp_state")
    out1 = stream_corpus_prep(
        spark, str(d3), max_files_per_trigger=1, state_base=base,
        cache_token="scp_stream", **kw,
    )
    assert {(r.doc_id, r.text, r.n_tokens) for r in out1.collect()} == batch

    # stage-level equality against the batch stages (the composed
    # proof, not just the endpoint)
    sstages = stream_corpus_prep_stages(
        spark, base, cache_token="scp_stream2", **kw
    )
    # steady state: the second finalize over unchanged state re-derives
    # ZERO LSH bands — the content-hash cache serves them all
    assert sstages["nd_band_misses"].count() == 0
    for st in ("url_deduped", "para_deduped", "quality_gated", "sem_deduped"):
        assert {
            (r.doc_id, r.text) for r in sstages[st].select("doc_id", "text").collect()
        } == {
            (r.doc_id, r.text) for r in bstages[st].select("doc_id", "text").collect()
        }, st

    # resume: derived checkpoint skips the seen files; survivors stable
    out2 = stream_corpus_prep(
        spark, str(d3), max_files_per_trigger=1, state_base=base,
        cache_token="scp_stream3", **kw,
    )
    assert {(r.doc_id, r.text, r.n_tokens) for r in out2.collect()} == batch

    # redelivery: fresh checkpoint re-feeds ALL shards into the same
    # state — keyed upserts make it a no-op
    out3 = stream_corpus_prep(
        spark, str(d3), max_files_per_trigger=1, state_base=base,
        checkpoint=str(tmp_path / "ck2"), cache_token="scp_stream4", **kw,
    )
    assert {(r.doc_id, r.text, r.n_tokens) for r in out3.collect()} == batch


def _warc_rec(uri: str, text: str) -> bytes:
    html = f"<html><body><p>{text}</p></body></html>".replace(
        "\n", "</p><p>"
    ).encode()
    http = (
        f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        f"Content-Length: {len(html)}\r\n\r\n".encode() + html
    )
    from streamsum_spark.sources import warc as W

    return W.build_warc_record(
        {
            "WARC-Type": "response",
            "WARC-Record-ID": f"<urn:t:{uri}>",
            "WARC-Date": "2024-01-01T00:00:00Z",
            "WARC-Target-URI": uri,
            "Content-Type": "application/http; msgtype=response",
        },
        http,
    )


def test_stream_corpus_prep_growing_directory_and_vacuum(spark, tmp_path):
    """The production cycle: the crawl directory GROWS between
    finalizes.  Cycle 2 ingests only the new shard; its band cache
    re-derives exactly the docs the new shard ADDED or whose cleaned
    text it CHANGED (a new globally-first copy of an old doc's
    paragraph flags the old occurrence, so the old doc's cleaned text —
    and tmd5 — changes); survivors equal the batch funnel over the
    grown union; vacuum_band_store reclaims the superseded version's
    rows and the next finalize still misses nothing."""
    import gzip
    import os
    import time

    from pyspark.sql import functions as F

    from streamsum_spark.corpus_prep import (
        corpus_prep_e2e,
        stream_corpus_prep,
        stream_corpus_prep_stages,
        vacuum_band_store,
    )

    def wc_text(tag, extra=""):
        return extra + " ".join(f"{tag}w{j}" for j in range(45))

    shared_para = "THIS EXACT PARAGRAPH REPEATS ACROSS THE CRAWL"
    old_uri = "http://old.site0.com/p"
    old_text = shared_para + "\n" + wc_text("old")
    cycle1 = [
        (old_uri, old_text),
        ("http://a.site1.com/p", wc_text("aa")),
        ("http://b.site2.com/p", wc_text("bb")),
        # junk: the self-seeded gate needs a drop class to train on
        ("http://j0.spam.com/x", "buy click now pills deal j0"),
        ("http://j1.spam.com/x", "buy click now pills deal j1"),
    ]
    d = tmp_path / "grow"
    d.mkdir()
    (d / "s0.warc.gz").write_bytes(
        b"".join(gzip.compress(_warc_rec(u, t), mtime=0) for u, t in cycle1)
    )

    # n_lists pinned: the auto sqrt(N) sizing is for real corpora, not
    # a 3-doc fixture (k-means over fewer points than centers)
    kw = dict(domain_cap=50, min_words=40, emb_dim=32, n_lists=2)
    base = str(tmp_path / "grow_state")
    out1 = stream_corpus_prep(
        spark, str(d), max_files_per_trigger=1, state_base=base,
        cache_token="grow1", **kw,
    )
    got1 = {(r.doc_id, r.text) for r in out1.collect()}
    assert len(got1) == 3  # nothing dedups yet; old doc keeps its banner

    # pick a NEW uri whose per-fetch doc_id is SMALLER than the old
    # doc's, so its copy of the shared paragraph becomes globally first
    # and the OLD doc's cleaned text changes
    def fid(uri, fname, ordinal):
        return spark.createDataFrame(
            [(uri, fname, ordinal)],
            "target_uri string, warc_file string, ordinal int",
        ).selectExpr(
            "xxhash64(target_uri, warc_file, ordinal) AS h"
        ).collect()[0].h

    old_id = fid(old_uri, "s0.warc.gz", 0)
    new_uri = next(
        u for u in (f"http://n{i}.site3.com/p" for i in range(32))
        if fid(u, "s1.warc.gz", 0) < old_id
    )
    cycle2 = [
        (new_uri, shared_para + "\n" + wc_text("new")),
        ("http://c.site4.com/p", wc_text("cc")),
    ]
    p1 = d / "s1.warc.gz"
    p1.write_bytes(
        b"".join(gzip.compress(_warc_rec(u, t), mtime=0) for u, t in cycle2)
    )
    t = time.time() + 30
    os.utime(p1, (t, t))

    out2 = stream_corpus_prep(
        spark, str(d), max_files_per_trigger=1, state_base=base,
        cache_token="grow2", **kw,
    )
    got2 = {(r.doc_id, r.text) for r in out2.collect()}
    batch = {
        (r.doc_id, r.text)
        for r in corpus_prep_e2e(
            spark, str(d), cache_token="grow_batch", **kw
        ).collect()
    }
    assert got2 == batch and len(got2) == 5
    # the old doc's surviving text lost the shared paragraph to the
    # new doc's globally-first copy
    by_text = dict(got2)
    assert by_text[old_id] == wc_text("old")
    new_id = fid(new_uri, "s1.warc.gz", 0)
    assert by_text[new_id].startswith(shared_para)

    # cycle 2's band cache re-derived exactly: the 2 new docs + the 1
    # old doc whose cleaned text changed
    sstages = stream_corpus_prep_stages(
        spark, base, cache_token="grow3", **kw
    )
    assert sstages["nd_band_misses"].count() == 0  # finalize 3: steady
    # vacuum: the old doc's superseded version rows drop; steady state
    # survives the vacuum
    current = sstages["nd_band_current"].localCheckpoint()
    stats = vacuum_band_store(spark, base, current)
    assert stats["dropped"] > 0 and stats["kept"] > 0
    sstages4 = stream_corpus_prep_stages(
        spark, base, cache_token="grow4", **kw
    )
    assert sstages4["nd_band_misses"].count() == 0
    assert {
        (r.doc_id, r.text, r.n_tokens)
        for r in sstages4["packed"].collect()
    } == {
        (r.doc_id, r.text, r.n_tokens)
        for r in sstages["packed"].collect()
    }


def test_cached_bands_rederive_only_changed_docs(spark, tmp_path):
    """The finalize's band cache: first call derives every doc, an
    unchanged repeat derives none, and a single-doc text change
    re-derives exactly that doc — with the served bands always equal
    to a fresh derivation over the current texts."""
    from streamsum_spark.corpus_prep import _cached_bands
    from streamsum_spark.operators.dedup import (
        _signatures_from,
        banded_keys,
        choose_lsh_params,
        shingle_sets,
    )

    store = str(tmp_path / "bands")
    t1 = "alpha beta gamma delta epsilon zeta eta theta"
    t2 = "one two three four five six seven eight nine"
    docs1 = spark.createDataFrame(
        [(1, t1), (2, t2)], "doc_id long, text string"
    )
    b1, m1 = _cached_bands(spark, store, docs1, 0.5, 4)
    assert {r.doc_id for r in m1.collect()} == {1, 2}
    got1 = {(r.doc_id, r.band_id, r.bkey) for r in b1.collect()}

    b2, m2 = _cached_bands(spark, store, docs1, 0.5, 4)
    assert m2.count() == 0
    assert {(r.doc_id, r.band_id, r.bkey) for r in b2.collect()} == got1

    docs2 = spark.createDataFrame(
        [(1, t1), (2, t2 + " changed")], "doc_id long, text string"
    )
    b3, m3 = _cached_bands(spark, store, docs2, 0.5, 4)
    assert {r.doc_id for r in m3.collect()} == {2}
    bb, rr = choose_lsh_params(0.5)
    fresh = banded_keys(
        _signatures_from(shingle_sets(spark, "", docs=docs2)), bb, rr
    )
    assert {(r.doc_id, r.band_id, r.bkey) for r in b3.collect()} == {
        (r.doc_id, r.band_id, r.bkey) for r in fresh.collect()
    }
    # a different threshold needs a different (b, r) scheme: the store
    # refuses instead of silently mixing band keys
    with pytest.raises(ValueError, match="one store serves one"):
        _cached_bands(spark, store, docs2, 0.95, 4)


def test_cached_bands_zero_shingle_doc_reaches_steady_state(spark, tmp_path):
    """A doc too short for any 3-word shingle produces no band rows;
    the sentinel row keeps it from reappearing in the misses anti-join
    (and re-deriving) every cycle, and sentinels never leak into the
    served bands."""
    from streamsum_spark.corpus_prep import _cached_bands

    store = str(tmp_path / "bands")
    docs = spark.createDataFrame(
        [(1, "hi there"), (2, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    b1, m1 = _cached_bands(spark, store, docs, 0.5, 4)
    assert {r.doc_id for r in m1.collect()} == {1, 2}
    served1 = b1.collect()
    assert all(r.band_id >= 0 for r in served1)
    assert {r.doc_id for r in served1} == {2}  # doc 1 has no real bands
    # steady state: NOTHING re-derives, including the shingle-less doc
    b2, m2 = _cached_bands(spark, store, docs, 0.5, 4)
    assert m2.count() == 0
    assert {(r.doc_id, r.band_id, r.bkey) for r in b2.collect()} == {
        (r.doc_id, r.band_id, r.bkey) for r in served1
    }
    # and a text change on the short doc still re-derives it
    docs2 = spark.createDataFrame(
        [(1, "hi there friend"), (2, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    b3, m3 = _cached_bands(spark, store, docs2, 0.5, 4)
    assert {r.doc_id for r in m3.collect()} == {1}
    assert {r.doc_id for r in b3.collect()} == {1, 2}  # 3 words: real bands


def test_band_scheme_sidecar_crash_and_race_posture(spark, tmp_path):
    """Verdict r14 order #2: the (b, r) scheme sidecar goes through the
    commit backend's put-if-absent — a pre-claimed equal scheme is
    accepted (the losing racer re-reads and compares), a TORN sidecar
    (the failure a plain open().write crash used to leave) refuses
    loudly with recovery instructions instead of crashing json.load in
    the middle of a finalize."""
    import json

    from streamsum_spark.corpus_prep import _cached_bands
    from streamsum_spark.operators.dedup import choose_lsh_params

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    # pre-claimed equal scheme (= losing the race to an identical
    # first-finalize): proceeds
    store1 = str(tmp_path / "bands1")
    b, r = choose_lsh_params(0.5)
    with open(store1 + "_scheme.json", "w") as fh:
        json.dump({"b": b, "r": r}, fh)
    bands, _ = _cached_bands(spark, store1, docs, 0.5, 4)
    assert bands.count() > 0

    # torn sidecar: loud refusal naming the recovery
    store2 = str(tmp_path / "bands2")
    with open(store2 + "_scheme.json", "w") as fh:
        fh.write('{"b": 3')  # crashed mid-write
    with pytest.raises(ValueError, match="unreadable"):
        _cached_bands(spark, store2, docs, 0.5, 4)


def test_band_store_single_writer_lock(spark, tmp_path):
    """Band-store mutators (finalize upsert, vacuum) are single-writer:
    a held advisory lock makes a second mutator refuse loudly; a STALE
    lock (crashed mutator) is stolen and the mutation proceeds."""
    import os
    import time

    from streamsum_spark.corpus_prep import (
        BandStoreWriterConflict,
        _cached_bands,
        vacuum_band_store,
    )

    base = str(tmp_path / "st")
    store = base + "_ndbands"
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    _cached_bands(spark, store, docs, 0.5, 4)  # lock taken and released
    assert not os.path.exists(store + "_writer.lock")

    with open(store + "_writer.lock", "w") as fh:
        fh.write("424242")  # a live mutator holds the lock
    with pytest.raises(BandStoreWriterConflict, match="single-writer"):
        _cached_bands(spark, store, docs, 0.5, 4)
    current = docs.select("doc_id").withColumn(
        "tmd5", F.md5(F.col("doc_id").cast("string"))
    )
    with pytest.raises(BandStoreWriterConflict, match="single-writer"):
        vacuum_band_store(spark, base, current)

    # a crashed mutator's stale lock is stolen, not a permanent wedge
    old = time.time() - 7200
    os.utime(store + "_writer.lock", (old, old))
    _, m = _cached_bands(spark, store, docs, 0.5, 4)
    assert m.count() == 0
    assert not os.path.exists(store + "_writer.lock")


def test_export_packed_webdataset_roundtrip(spark, tmp_path):
    """The funnel's delivery end-cap: packed chunks export as
    WebDataset shards — one sample per (part, chunk), txt = the
    chunk's docs concatenated in doc_id order, json = per-doc
    provenance in the same order — and read back via the repo's own
    WebDataset reader byte-exactly."""
    import json

    from streamsum_spark.corpus_prep import export_packed_webdataset
    from streamsum_spark.sources.webdataset import read_webdataset

    packed = spark.createDataFrame(
        [
            (11, "http://a.com/1", "doc one text", 3, 0, 0),
            (7, "http://b.com/2", "doc two text", 3, 0, 0),
            (20, "http://c.com/3", "third doc", 2, 0, 1),
            (31, "http://d.com/4", "fourth doc", 2, 1, 0),
        ],
        "doc_id long, target_uri string, text string, n_tokens long,"
        " part int, chunk int",
    )
    out = str(tmp_path / "wds")
    manifest = export_packed_webdataset(packed, out)
    assert manifest.count() >= 1  # materializes the write
    back = {
        r.key: r.parts
        for r in read_webdataset(spark, out, glob="*.tar").collect()
    }
    assert set(back) == {"00000-000000", "00000-000001", "00001-000000"}
    # doc_id order inside the chunk: 7 before 11
    txt = bytes(back["00000-000000"]["txt"]).decode()
    assert txt == "doc two text\n\ndoc one text"
    meta = json.loads(bytes(back["00000-000000"]["json"]))
    assert [m["doc_id"] for m in meta] == [7, 11]
    assert [m["target_uri"] for m in meta] == [
        "http://b.com/2", "http://a.com/1",
    ]
    assert bytes(back["00001-000000"]["txt"]).decode() == "fourth doc"


def test_kmeans_index_clamps_k_to_tiny_corpora(spark):
    """A composed pipeline's gated corpus can be smaller than the
    quantizer's default center count: k clamps to the fit sample
    (instead of a bare JVM ArrayIndexOutOfBounds), and an empty
    relation refuses with a typed error."""
    import pytest as _pytest

    from streamsum_spark.operators.similarity import kmeans_ivf_index

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0 - i]) for i in range(3)],
        "vec_id long, embedding array<double>",
    )
    assignments, centroids = kmeans_ivf_index(spark, "", emb=emb, n_lists=8)
    assert assignments.count() == 3
    assert centroids.count() <= 3
    with _pytest.raises(ValueError, match="empty relation"):
        kmeans_ivf_index(spark, "", emb=emb.limit(0), n_lists=2)


def test_near_dup_pairs_from_bands_equals_tuned(spark):
    """near_dup_pairs_from_bands over precomputed bands produces the
    identical verified pair set as near_dup_tuned over the same texts
    (same band derivation, same Jaccard formula — only the shingling
    scope differs: candidates-only vs corpus)."""
    from streamsum_spark.operators.dedup import (
        _signatures_from,
        banded_keys,
        choose_lsh_params,
        near_dup_pairs_from_bands,
        near_dup_tuned,
        shingle_sets,
    )

    base = [f"w{j}" for j in range(40)]
    rows = [
        (1, " ".join(base)),
        (2, " ".join(base[:-1] + ["zz"])),  # near-dup of 1
        (3, " ".join(f"u{j}" for j in range(40))),  # unrelated
        (4, " ".join(base[:20] + [f"v{j}" for j in range(20)])),  # partial
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    b, r = choose_lsh_params(0.5)
    bands = banded_keys(
        _signatures_from(shingle_sets(spark, "", docs=docs)), b, r
    )
    got = {
        (x.doc_a, x.doc_b, round(x.jaccard, 9))
        for x in near_dup_pairs_from_bands(
            spark, bands, docs, threshold=0.5, cache_token="fb_test"
        ).collect()
    }
    want = {
        (x.doc_a, x.doc_b, round(x.jaccard, 9))
        for x in near_dup_tuned(
            spark, "", threshold=0.5, docs=docs, cache_token="fb_test2"
        ).collect()
    }
    assert got == want and got


def test_funnel_parses_each_url_once(prep):
    """r13 verdict order #4: the ingest projection (with_url_parts) is
    the funnel's ONE try_parse_url family — the URL-dedup window keys
    on the threaded canonical column and the domain cap on the threaded
    host, so no later plan node re-parses the URL."""
    from streamsum_spark.plans import inspect as PI

    warc_dir, docs, stages, got = prep
    for stage in ("url_deduped", "para_deduped", "domain_capped"):
        assert PI.nodes_with(stages[stage], "ParseUrlEvaluator") <= 1, stage
