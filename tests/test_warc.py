"""WARC source (sources/warc.py): record parsing, HTTP response
decomposition (chunked / content-encoded bodies), per-file error
isolation, write→read roundtrips, deterministic output, and the
composed WARC→text pipeline against a direct clean_html run."""

from __future__ import annotations

import gzip
import os

import pytest

from streamsum_spark.sources import warc as W

HTML = (
    b"<html><head><title>T</title><script>var x=1;</script></head>"
    b"<body><h1>Heading</h1><p>Hello &amp; goodbye.</p></body></html>"
)


def http_response(
    body: bytes,
    status: int = 200,
    ctype: str = "text/html; charset=utf-8",
    extra: bytes = b"",
) -> bytes:
    return (
        f"HTTP/1.1 {status} X\r\nContent-Type: {ctype}\r\n".encode()
        + extra
        + f"Content-Length: {len(body)}\r\n\r\n".encode()
        + body
    )


def make_record(rtype: str, uri: str, block: bytes, ctype: str = "application/http; msgtype=response") -> bytes:
    return W.build_warc_record(
        {
            "WARC-Type": rtype,
            "WARC-Record-ID": f"<urn:test:{uri}>",
            "WARC-Date": "2024-01-01T00:00:00Z",
            "WARC-Target-URI": uri,
            "Content-Type": ctype,
        },
        block,
    )


def sample_warc() -> bytes:
    return b"".join(
        [
            make_record("warcinfo", "file:meta", b"software: test\r\n", "application/warc-fields"),
            make_record("request", "http://a.example/", b"GET / HTTP/1.1\r\n\r\n"),
            make_record("response", "http://a.example/", http_response(HTML)),
            make_record("response", "http://b.example/", http_response(b"gone", status=404)),
            make_record(
                "response",
                "http://c.example/img",
                http_response(b"\x89PNG", ctype="image/png"),
            ),
        ]
    )


def per_record_gz(raw_records: list[bytes]) -> bytes:
    return b"".join(gzip.compress(r, mtime=0) for r in raw_records)


# ---------------------------------------------------------------- parser


def test_iter_warc_records_parses_all_fields():
    import io

    recs = list(W.iter_warc_records(io.BytesIO(sample_warc())))
    assert [h["warc-type"] for h, _ in recs] == [
        "warcinfo",
        "request",
        "response",
        "response",
        "response",
    ]
    h, block = recs[2]
    assert h["warc-target-uri"] == "http://a.example/"
    assert h["__version__"] == "WARC/1.1"
    assert block == http_response(HTML)


def test_iter_warc_records_rejects_truncation_and_bad_length():
    import io

    whole = sample_warc()
    with pytest.raises(ValueError, match="truncated"):
        list(W.iter_warc_records(io.BytesIO(whole[: len(whole) - 40])))
    bad = whole.replace(b"Content-Length: 16\r\n", b"Content-Length: zz\r\n", 1)
    with pytest.raises(ValueError, match="Content-Length"):
        list(W.iter_warc_records(io.BytesIO(bad)))
    with pytest.raises(ValueError, match="version"):
        list(W.iter_warc_records(io.BytesIO(b"NOT A WARC\r\n\r\n")))


def test_folded_header_continuation():
    import io

    rec = (
        b"WARC/1.0\r\nWARC-Type: metadata\r\nWARC-Target-URI: http://x/\r\n"
        b"X-Long: part one\r\n  part two\r\nContent-Length: 2\r\n\r\nok\r\n\r\n"
    )
    (h, block), = W.iter_warc_records(io.BytesIO(rec))
    assert h["x-long"] == "part one part two"
    assert block == b"ok"


# ------------------------------------------------------------- http parse


def test_parse_http_response_basic_and_non_http():
    status, ctype, body = W.parse_http_response(http_response(b"hi"))
    assert (status, ctype, body) == (200, "text/html", b"hi")
    status, ctype, body = W.parse_http_response(b"garbage not http")
    assert (status, ctype) == (None, None) and body == b"garbage not http"


def test_parse_http_response_lf_only_split():
    payload = b"HTTP/1.0 204 N\nContent-Type: text/plain\n\nbody"
    assert W.parse_http_response(payload) == (204, "text/plain", b"body")


def test_parse_http_response_chunked():
    body = b"4\r\nWiki\r\n5\r\npedia\r\n0\r\n\r\n"
    payload = http_response(body, extra=b"Transfer-Encoding: chunked\r\n")
    assert W.parse_http_response(payload)[2] == b"Wikipedia"
    # malformed chunk stream -> raw body verbatim, not an exception
    bad = http_response(b"zz\r\nooo", extra=b"Transfer-Encoding: chunked\r\n")
    assert W.parse_http_response(bad)[2] == b"zz\r\nooo"


def test_parse_http_response_gzip_content_encoding():
    body = gzip.compress(b"inflate me", mtime=0)
    payload = http_response(body, extra=b"Content-Encoding: gzip\r\n")
    assert W.parse_http_response(payload)[2] == b"inflate me"
    # undecodable "gzip" keeps the captured bytes
    payload = http_response(b"\x1f\x8bnope", extra=b"Content-Encoding: gzip\r\n")
    assert W.parse_http_response(payload)[2] == b"\x1f\x8bnope"


# ------------------------------------------------------------ spark read


@pytest.fixture()
def warc_dir(tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "a.warc").write_bytes(sample_warc())
    recs = [
        make_record("response", "http://d.example/", http_response(b"<p>Doc D</p>")),
        make_record("response", "http://e.example/", http_response(b"<p>Doc E</p>")),
    ]
    (d / "b.warc.gz").write_bytes(per_record_gz(recs))
    (d / "bad.warc.gz").write_bytes(gzip.compress(b"NOT A WARC AT ALL\r\n\r\n"))
    return str(d)


def test_read_warc_records_mixed_files(spark, warc_dir):
    df = W.read_warc_records(spark, warc_dir, glob="*")
    rows = {(r.warc_file, r.ordinal): r for r in df.collect()}
    assert len(rows) == 5 + 2 + 1
    ok = rows[("a.warc", 2)]
    assert ok.rec_type == "response" and ok.http_status == 200
    assert ok.http_content_type == "text/html" and bytes(ok.body) == HTML
    assert rows[("a.warc", 3)].http_status == 404
    assert rows[("b.warc.gz", 1)].target_uri == "http://e.example/"
    (bad,) = [r for r in rows.values() if r.error is not None]
    assert bad.warc_file == "bad.warc.gz" and bad.rec_type is None
    assert "ValueError" in bad.error


def test_read_warc_text_end_to_end(spark, warc_dir):
    from streamsum_spark.operators.html_text import html_to_text_col
    from pyspark.sql import functions as F

    df = W.read_warc_text(spark, warc_dir, glob="*").orderBy("target_uri")
    got = {r.target_uri: r.text for r in df.collect()}
    # only 200 text/html responses: a, d, e — not 404, not image/png
    assert set(got) == {"http://a.example/", "http://d.example/", "http://e.example/"}
    (expect,) = (
        spark.createDataFrame([(HTML.decode(),)], "h string")
        .select(html_to_text_col(F.col("h")).alias("t"))
        .collect()
    )
    assert got["http://a.example/"] == expect.t
    assert got["http://d.example/"] == "Doc D"


def test_read_warc_budget_trips_isolate_the_file(spark, tmp_path):
    d = tmp_path / "c"
    d.mkdir()
    lying = (
        b"WARC/1.1\r\nWARC-Type: resource\r\nContent-Length: 9999999999\r\n\r\n"
    )
    (d / "bomb.warc").write_bytes(lying)
    (d / "ok.warc").write_bytes(sample_warc())
    df = W.read_warc_records(spark, str(d), glob="*.warc")
    by_file = {}
    for r in df.collect():
        by_file.setdefault(r.warc_file, []).append(r)
    assert len(by_file["ok.warc"]) == 5
    (bomb,) = by_file["bomb.warc"]
    assert bomb.error is not None


# ----------------------------------------------------------------- write


def _records_df(spark, n: int = 6):
    rows = [
        (
            "response",
            f"http://site{i}.example/",
            "2024-01-01T00:00:00Z",
            "application/http; msgtype=response",
            http_response(f"<p>Doc {i} body</p>".encode()),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "rec_type string, target_uri string, warc_date string, "
        "content_type string, body binary",
    )


def test_write_warc_roundtrip_and_rolling(spark, tmp_path):
    out = str(tmp_path / "out")
    src = _records_df(spark).coalesce(1)
    manifest = W.write_warc(src, out, warc_max_bytes=400).collect()
    assert sum(m.n_records for m in manifest) == 6
    assert len(manifest) > 1  # rolled
    for m in manifest:
        assert os.path.getsize(os.path.join(out, m.warc_file)) == m.n_bytes
    back = W.read_warc_records(spark, out, glob="*.warc.gz")
    got = sorted(
        (r.target_uri, bytes(r.body)) for r in back.collect() if r.error is None
    )
    assert got == sorted(
        (f"http://site{i}.example/", f"<p>Doc {i} body</p>".encode())
        for i in range(6)
    )


def test_write_warc_deterministic(spark, tmp_path):
    src = _records_df(spark).coalesce(1)
    outs = []
    for name in ("x", "y"):
        out = str(tmp_path / name)
        W.write_warc(src, out, warc_max_bytes=400).collect()
        outs.append(
            {f: open(os.path.join(out, f), "rb").read() for f in sorted(os.listdir(out))}
        )
    assert outs[0] == outs[1]


def test_write_warc_plain_uncompressed(spark, tmp_path):
    out = str(tmp_path / "plain")
    W.write_warc(
        _records_df(spark, 2).coalesce(1), out, per_record_gzip=False
    ).collect()
    (f,) = os.listdir(out)
    assert f.endswith(".warc")
    raw = open(os.path.join(out, f), "rb").read()
    assert raw.startswith(b"WARC/1.1\r\n")


# ------------------------------------------------------- hypothesis fuzz

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _hdr_val = st.text(
        alphabet=st.characters(
            blacklist_characters="\r\n", blacklist_categories=("Cs",)
        ),
        max_size=60,
    )

    @settings(max_examples=150, deadline=None)
    @given(
        recs=st.lists(
            st.tuples(
                st.sampled_from(["response", "request", "resource", "metadata"]),
                _hdr_val,  # target-uri (any junk — headers are opaque values)
                st.binary(max_size=400),  # block
            ),
            max_size=8,
        ),
        gz=st.booleans(),
    )
    def test_warc_roundtrip_hypothesis(recs, gz):
        """For ANY record list (junk URIs, arbitrary binary blocks incl.
        embedded CRLFs and fake version lines) the serialize→parse
        roundtrip preserves order, types, uris, and blocks exactly —
        Content-Length framing means block bytes can never be
        misparsed as structure."""
        import io

        raw = b"".join(
            make_record(t, u, b) for t, u, b in recs
        )
        if gz:
            raw = gzip.compress(raw, mtime=0)
            stream = io.BufferedReader(gzip.GzipFile(fileobj=io.BytesIO(raw)))
        else:
            stream = io.BytesIO(raw)
        got = list(W.iter_warc_records(stream))
        assert len(got) == len(recs)
        for (t, u, b), (h, block) in zip(recs, got):
            assert h["warc-type"] == t
            # the parser strips BYTES-side (ASCII whitespace only) then
            # decodes — mirror that exactly (str.strip also eats \x1c-\x1f)
            expect_uri = u.encode().strip().decode("utf-8", "replace")
            assert h["warc-target-uri"] == expect_uri
            assert block == b

    @settings(max_examples=150, deadline=None)
    @given(payload=st.binary(max_size=600))
    def test_parse_http_response_never_raises(payload):
        """Captured HTTP is hostile by definition: the decomposer must
        total-function any byte string (status/ctype/None, body bytes)."""
        status, ctype, body = W.parse_http_response(payload)
        assert status is None or isinstance(status, int)
        assert ctype is None or isinstance(ctype, str)
        assert isinstance(body, bytes)

    @settings(max_examples=100, deadline=None)
    @given(blob=st.binary(max_size=400))
    def test_iter_warc_records_raises_cleanly_on_garbage(blob):
        """Arbitrary garbage either parses (if it happens to be framed)
        or raises ValueError — never an unbounded loop or a foreign
        exception the per-file isolation wouldn't catch."""
        import io

        try:
            list(W.iter_warc_records(io.BytesIO(blob)))
        except ValueError:
            pass

except ImportError:  # pragma: no cover - hypothesis is in the container
    pass


def test_stream_warc_text_equals_batch(spark, tmp_path):
    """The streaming WARC reader over a 2-shard directory (one file per
    micro-batch) yields exactly the batch reader's text rows."""
    d = tmp_path / "streamcrawl"
    d.mkdir()
    for shard in range(2):
        recs = [
            make_record(
                "response",
                f"http://s{shard}.example/p{i}",
                http_response(f"<p>doc {shard}-{i}</p>".encode()),
            )
            for i in range(3)
        ]
        (d / f"s{shard}.warc.gz").write_bytes(per_record_gz(recs))

    from streamsum_spark.sources.warc import read_warc_text, stream_warc_text

    batch = {
        (r.target_uri, r.text) for r in read_warc_text(spark, str(d), glob="*").collect()
    }
    stream_df = stream_warc_text(spark, str(d), glob="*", max_files_per_trigger=1)
    assert stream_df.isStreaming
    q = (
        stream_df.writeStream.format("memory")
        .queryName("warc_stream_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.target_uri, r.text)
        for r in spark.sql("SELECT * FROM warc_stream_sink").collect()
    }
    assert got == batch and len(got) == 6


# ------------------------------------------- content-encoding bomb budget


def gz_response(inflated: bytes) -> bytes:
    """A 200 text/html response whose BODY travels Content-Encoding:
    gzip — small on the wire, large after inflation."""
    return http_response(
        gzip.compress(inflated, mtime=0),
        extra=b"Content-Encoding: gzip\r\n",
    )


def test_inflated_body_budget_fails_the_file(spark, tmp_path):
    """iter_warc_records meters raw block bytes, but gzip/deflate
    bodies inflate AFTER that check — the reader must charge the
    INFLATED sizes against the same per-file budget so an amplification
    bomb (tiny blocks, ~1000x-inflating bodies) errors its file instead
    of buffering the blow-up in one task's frame."""
    d = tmp_path / "enc"
    d.mkdir()
    inflated = b"A" * 100_000  # compresses to ~150 bytes per record
    bomb = b"".join(
        make_record("response", f"http://z{i}.example/", gz_response(inflated))
        for i in range(5)
    )
    (d / "bomb.warc").write_bytes(bomb)
    (d / "ok.warc").write_bytes(sample_warc())

    # raw blocks total ~1 KB — far inside the budget; inflated ~500 KB is not
    df = W.read_warc_records(
        spark, str(d), glob="*.warc", max_extract_bytes=300_000
    )
    by_file = {}
    for r in df.collect():
        by_file.setdefault(r.warc_file, []).append(r)
    (err,) = by_file["bomb.warc"]
    assert err.error is not None and "inflated" in err.error
    assert len(by_file["ok.warc"]) == 5 and all(
        r.error is None for r in by_file["ok.warc"]
    )

    # under the default budget the same file parses fully, bodies inflated
    df2 = W.read_warc_records(spark, str(d), glob="bomb.warc")
    rows = df2.collect()
    assert len(rows) == 5 and all(bytes(r.body) == inflated for r in rows)


def test_write_warc_record_ids_unique_for_repeated_uri(spark, tmp_path):
    """ISO 28500: WARC-Record-ID is globally unique PER RECORD — two
    records sharing a target_uri in one output file must not share an
    ID (the ID hash includes the per-file record ordinal)."""
    out = str(tmp_path / "dup")
    rows = [
        (
            "response",
            "http://same.example/",
            "2024-01-01T00:00:00Z",
            "application/http; msgtype=response",
            http_response(f"<p>copy {i}</p>".encode()),
        )
        for i in range(3)
    ]
    src = spark.createDataFrame(
        rows,
        "rec_type string, target_uri string, warc_date string, "
        "content_type string, body binary",
    ).coalesce(1)
    (m,) = W.write_warc(src, out).collect()
    import io

    with open(os.path.join(out, m.warc_file), "rb") as fh:
        blob = fh.read()
    stream = io.BufferedReader(gzip.GzipFile(fileobj=io.BytesIO(blob)))
    ids = [h["warc-record-id"] for h, _ in W.iter_warc_records(stream)]
    assert len(ids) == 3 and len(set(ids)) == 3
