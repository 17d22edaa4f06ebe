"""Frozen-model O(delta) finalize for the streaming corpus-prep funnel
(r14 verdict order #1): the first full finalize trains AND freezes the
NB gate + k-means quantizer and equals the batch funnel exactly; later
cycles re-curate only new/changed docs (fz_delta) yet still serve the
batch funnel's survivors whenever the frozen models decide like fresh
ones — constructed here with shared keep/junk vocabulary pools so the
shard-1-trained gate and the union-trained gate agree with wide
margins.  A no-new-data cycle recurates nothing and serves the
identical corpus."""

from __future__ import annotations

import gzip
import os
import random
import time

import pytest
from pyspark.sql import functions as F

from streamsum_spark.corpus_prep import (
    corpus_prep_e2e,
    stream_corpus_prep,
    stream_corpus_prep_ingest,
    stream_corpus_prep_stages,
)

BANNER = "ACCEPT COOKIES TO CONTINUE"
CAP = 3
KW = dict(domain_cap=CAP, min_words=40, emb_dim=32, n_lists=2)

# shared vocabulary pools: every shard's documents draw from the same
# pools, so an NB model trained on shard 0 alone scores shard 1 docs
# with the same wide-margin decisions as the union-trained model — the
# "frozen models equal fresh ones" regime the frozen mode documents
KEEP_POOL = [f"kw{j}" for j in range(80)]
JUNK_POOL = [f"junk{j}" for j in range(12)]


def _good(i: int) -> str:
    words = random.Random(100 + i).sample(KEEP_POOL, 45)
    return BANNER + "\n" + " ".join(words)


def _junk(i: int) -> str:
    return " ".join(random.Random(500 + i).sample(JUNK_POOL, 6))


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


def _fid(spark, uri: str, fname: str, ordinal: int) -> int:
    return (
        spark.createDataFrame(
            [(uri, fname, ordinal)],
            "target_uri string, warc_file string, ordinal int",
        )
        .selectExpr("xxhash64(target_uri, warc_file, ordinal) AS h")
        .collect()[0]
        .h
    )


def _build_shards(spark, d):
    """Two WARC shards: shard 0 = 6 good docs (3 on big.com — the cap
    binds at 3 across the union), a near-dup base, a sem-dup base, 3
    junk; shard 1 = 4 good docs (2 more on big.com), the near-dup and
    sem-dup partners, 2 junk, a tracking-param refetch of a shard-0
    URL, and a doc ENGINEERED to steal the shared banner paragraph's
    global first occurrence from shard 0 (smaller doc_id), changing an
    old doc's cleaned text between cycles."""
    s0 = []
    for i in range(3):
        s0.append((f"http://h{i}.big.com/p{i}", _good(i)))
    for i in range(3):
        s0.append((f"http://solo{i}.com/p", _good(10 + i)))
    nd_base = random.Random(7).sample(KEEP_POOL, 45)
    s0.append(("http://ndpair.com/a", BANNER + "\n" + " ".join(nd_base)))
    sem_base = random.Random(8).sample(KEEP_POOL, 45)
    s0.append(("http://sempair.com/a", BANNER + "\n" + " ".join(sem_base)))
    for i in range(3):
        s0.append((f"http://j{i}.spam.com/x", _junk(i)))

    s1 = []
    for i in range(3, 5):
        s1.append((f"http://h{i}.big.com/p{i}", _good(i)))
    for i in range(3, 5):
        s1.append((f"http://solo{i}.com/p", _good(10 + i)))
    s1.append(
        (
            "http://ndpair.com/b",
            BANNER + "\n" + " ".join(nd_base[:-1] + ["ndz"]),
        )
    )
    shuffled = sem_base[:]
    random.Random(9).shuffle(shuffled)
    s1.append(("http://sempair.com/b", BANNER + "\n" + " ".join(shuffled)))
    for i in range(3, 5):
        s1.append((f"http://j{i}.spam.com/x", _junk(i)))
    # URL-level refetch of a shard-0 page (tracking param): collapses
    # at the canonical-URL stage whichever fetch wins
    s1.append(("http://solo0.com/p?utm_source=tw", _good(10)))

    d.mkdir()
    (d / "s0.warc.gz").write_bytes(
        b"".join(gzip.compress(_warc_rec(u, t), mtime=0) for u, t in s0)
    )
    # banner-steal doc: first record of s1 (ordinal 0) with a doc_id
    # below every shard-0 good doc's, so its banner copy becomes the
    # global first occurrence and every shard-0 holder's cleaned text
    # changes in cycle 2
    min_s0 = min(
        _fid(spark, u, "s0.warc.gz", i) for i, (u, _t) in enumerate(s0)
    )
    steal_uri = next(
        u
        for u in (f"http://steal{i}.site.com/p" for i in range(64))
        if _fid(spark, u, "s1.warc.gz", 0) < min_s0
    )
    s1 = [(steal_uri, _good(20))] + s1
    p1 = d / "s1.warc.gz"
    p1.write_bytes(
        b"".join(gzip.compress(_warc_rec(u, t), mtime=0) for u, t in s1)
    )
    t = time.time() + 30
    os.utime(p1, (t, t))
    return s0, s1


def _packed_set(df):
    return {
        (r.doc_id, r.target_uri, r.text, r.n_tokens, r.part, r.chunk)
        for r in df.collect()
    }


def test_frozen_first_full_finalize_equals_batch(spark, tmp_path):
    """The freeze cycle IS the batch funnel: over a fully-ingested
    corpus the first frozen finalize (delta = everything; it trains
    the models it freezes) returns exactly corpus_prep_e2e's packed
    relation, full column tuple."""
    d = tmp_path / "warc"
    _build_shards(spark, d)
    base = str(tmp_path / "st_full")
    stream_corpus_prep_ingest(spark, str(d), state_base=base)
    fstages = stream_corpus_prep_stages(
        spark, base, mode="frozen", cache_token="fz_full", **KW
    )
    batch = corpus_prep_e2e(spark, str(d), cache_token="fz_full_b", **KW)
    assert _packed_set(fstages["packed"]) == _packed_set(batch)
    # every capped doc was a first-cycle delta
    assert fstages["fz_delta"].count() == fstages["domain_capped"].count()


def test_frozen_incremental_cycles_equal_batch_and_stay_delta(
    spark, tmp_path
):
    """The O(delta) contract end-to-end: freeze on shard 0, ingest
    shard 1, re-finalize — survivors equal the batch funnel over the
    union (frozen-models-equal-fresh regime by construction), cycle 2
    re-curates only the new docs plus the banner-steal victims (a
    strict subset of the corpus), and a third no-new-data cycle
    re-curates NOTHING while serving the identical relation."""
    d = tmp_path / "warc"
    s0, s1 = _build_shards(spark, d)
    base = str(tmp_path / "st_inc")

    # cycle 1: shard 0 only (mtime order makes it the only file seen
    # when max_files_per_trigger caps... ingest both-aware: feed s0
    # explicitly via glob)
    stream_corpus_prep_ingest(spark, str(d), glob="s0.warc.gz",
                              state_base=base)
    st1 = stream_corpus_prep_stages(
        spark, base, mode="frozen", cache_token="fz_c1", **KW
    )
    n1 = st1["packed"].count()
    assert n1 > 0
    assert st1["fz_delta"].count() == st1["domain_capped"].count()

    got1 = _packed_set(st1["packed"])

    # cycle 2: shard 1 arrives
    stream_corpus_prep_ingest(spark, str(d), state_base=base)
    st2c = stream_corpus_prep_stages(
        spark, base, mode="frozen", cache_token="fz_c2", **KW
    )
    out2 = st2c["packed"]
    got2 = _packed_set(out2)
    delta2 = _packed_set(st2c["packed_delta"])
    batch = _packed_set(
        corpus_prep_e2e(spark, str(d), cache_token="fz_b", **KW)
    )
    # SURVIVOR contract: equal to the batch funnel through (doc_id,
    # target_uri, text, n_tokens, part) — part is a pure hash of
    # doc_id, so it matches batch; CHUNK is the one coordinate the
    # frozen mode trades: append-stable ids instead of batch re-flow
    def _no_chunk(rows):
        return {(d_, u, t, n, p) for (d_, u, t, n, p, _c) in rows}

    assert _no_chunk(got2) == _no_chunk(batch)

    # append stability: a doc surviving cycle 1 -> 2 with unchanged
    # text keeps its exact (part, chunk); everything else is emitted in
    # packed_delta, whose union with the stable rows IS cycle 2
    key1 = {(d_, n): (p, c) for (d_, _u, _t, n, p, c) in got1}
    stable = {r for r in got2 if key1.get((r[0], r[3])) == (r[4], r[5])}
    assert stable == {
        r for r in got2 if (r[0], r[3]) in key1
    }  # no survivor was silently re-chunked
    assert delta2 == got2 - stable
    assert delta2  # the new shard genuinely emitted new chunks

    # greedy budget invariant on every chunk (batch rule, applied
    # per cycle): cumulative tokens before each chunk's last doc (in
    # md5(doc_id) order) stay under the budget
    import hashlib
    from collections import defaultdict

    by_chunk = defaultdict(list)
    for (d_, _u, _t, n, p, c) in got2:
        by_chunk[(p, c)].append(
            (hashlib.md5(str(d_).encode()).hexdigest(), n)
        )
    budget = 2048  # KW default chunk_budget
    for members in by_chunk.values():
        members.sort()
        assert sum(n for _h, n in members[:-1]) < budget

    # cycle 3 — no new data: nothing re-curates, nothing re-bands, no
    # pack churn, and the served corpus is IDENTICAL including chunk ids
    st2 = stream_corpus_prep_stages(
        spark, base, mode="frozen", cache_token="fz_c2b", **KW
    )
    assert st2["fz_delta"].count() == 0
    assert st2["nd_band_misses"].count() == 0
    assert st2["packed_delta"].count() == 0
    assert _packed_set(st2["packed"]) == got2

    # the banner-steal actually happened: the smallest-id doc holds the
    # banner, shard-0 good docs lost it (their packed text has no banner)
    texts = {r.doc_id: r.text for r in out2.collect()}
    holders = [t for t in texts.values() if BANNER in t]
    assert len(holders) <= 1


def test_frozen_param_change_refuses(spark, tmp_path):
    d = tmp_path / "warc"
    _build_shards(spark, d)
    base = str(tmp_path / "st_p")
    stream_corpus_prep_ingest(spark, str(d), glob="s0.warc.gz",
                              state_base=base)
    stream_corpus_prep_stages(
        spark, base, mode="frozen", cache_token="fz_p1", **KW
    )
    kw2 = dict(KW, min_words=10)
    with pytest.raises(ValueError, match="frozen with different"):
        stream_corpus_prep_stages(
            spark, base, mode="frozen", cache_token="fz_p2", **kw2
        )
    with pytest.raises(ValueError, match="mode must be"):
        stream_corpus_prep_stages(
            spark, base, mode="nope", cache_token="fz_p3", **KW
        )
