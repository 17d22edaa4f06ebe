"""WARC web-archive source (ISO 28500) — the packaging of web-crawl
corpora (Common Crawl ships ~100 TB/month of .warc.gz), and therefore
the natural front door of a text training pipeline: WARC responses →
HTML body → html_text.clean_html → quality / langid / dedup.

Reference parity: the reference system (streamsum) reads queues of
clojure maps; this source extends the ingest surface for the 100 TB
text goal (SURVEY §2 sources row) the way web-scale text pipelines
actually ship data, exactly as sources/webdataset.py does for the
multimodal side.

Format (from the public ISO 28500 / WARC 1.1 spec): a WARC file is a
sequence of records — a version line (``WARC/1.0`` | ``WARC/1.1``),
CRLF-terminated ``Name: value`` headers (folded continuations
allowed), a blank line, ``Content-Length`` bytes of block, and a
CRLF CRLF separator.  The Common Crawl convention compresses each
record as its OWN gzip member, so a ``.warc.gz`` is a legal
multi-member gzip stream (readable end-to-end by one decompressor)
that is also range-splittable at member boundaries.

Scale shape: one WARC file = one ``binaryFile`` row = one task's unit
of work (crawl files are packer-sized, conventionally ~1 GB — the same
license as a WebDataset shard).  Decompression and record parsing
STREAM: the gzip reader inflates incrementally and the parser holds
one record at a time, so task memory is the compressed blob plus one
record, never the inflated file.  HTTP response parsing happens in the
same pass (the bytes are already in hand — a second pass would pay the
payload copy again).

Hostile-input posture mirrors webdataset.py: per-FILE isolation (a
malformed file contributes one error row and the scan continues — the
records before the malformation are dropped with it, since plain
concatenated WARC has no trustworthy resync point), with bounded
header sizes, record counts, per-record and cumulative block budgets —
metered over both the raw blocks AND the post-Content-Encoding
inflated bodies —
so a crafted tiny-file-inflating-to-TBs bomb fails its file, not the
executor."""

from __future__ import annotations

import functools
import gzip
import io
import os
import zlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd

_MAX_RECORDS = 1_000_000  # per file
_MAX_HEADER_BYTES = 64 << 10  # per record, version line + all headers
_MAX_LINE = 8 << 10
_MAX_BLOCK = 1 << 30  # per record content block
_MAX_EXTRACT_BYTES = 4 << 30  # cumulative per file, as in webdataset.py

RECORD_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType(), False),
        T.StructField("ordinal", T.IntegerType(), True),
        T.StructField("rec_type", T.StringType(), True),
        T.StructField("target_uri", T.StringType(), True),
        T.StructField("warc_date", T.StringType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("content_length", T.LongType(), True),
        T.StructField("http_status", T.IntegerType(), True),
        T.StructField("http_content_type", T.StringType(), True),
        T.StructField("body", T.BinaryType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def _read_header_line(stream, budget: list) -> bytes:
    """One CRLF-terminated header line, metered against the per-record
    header budget; returns the line without its terminator."""
    line = stream.readline(_MAX_LINE + 2)
    if len(line) > _MAX_LINE:
        raise ValueError("WARC header line too long")
    budget[0] -= len(line)
    if budget[0] < 0:
        raise ValueError("WARC header budget exceeded")
    return line.rstrip(b"\r\n")


def iter_warc_records(
    stream, max_extract_bytes: int = _MAX_EXTRACT_BYTES
) -> Iterator[tuple[dict, bytes]]:
    """(headers, block) per record from a binary file-like positioned
    at a record boundary — headers as a {lower-name: value} dict with
    the version kept under ``'__version__'``.  Streams: one record in
    memory at a time.  Raises ValueError on malformed input (missing
    version line, absent/invalid Content-Length, truncated block,
    budget trips)."""
    n = out_bytes = 0
    while True:
        # skip the inter-record CRLF CRLF (and tolerate extras)
        line = stream.readline(_MAX_LINE + 2)
        if not line:
            return
        if line.rstrip(b"\r\n") == b"":
            continue
        version = line.rstrip(b"\r\n")
        if not version.startswith(b"WARC/"):
            raise ValueError(f"expected WARC version line, got {version[:40]!r}")
        n += 1
        if n > _MAX_RECORDS:
            raise ValueError("WARC record budget exceeded")
        budget = [_MAX_HEADER_BYTES - len(line)]
        headers: dict[str, str] = {"__version__": version.decode("ascii", "replace")}
        last_key = None
        while True:
            raw = _read_header_line(stream, budget)
            if raw == b"":
                break
            if raw[:1] in (b" ", b"\t") and last_key:  # folded continuation
                headers[last_key] += " " + raw.strip().decode("utf-8", "replace")
                continue
            name, sep, value = raw.partition(b":")
            if not sep:
                raise ValueError(f"malformed WARC header line {raw[:40]!r}")
            last_key = name.decode("ascii", "replace").strip().lower()
            headers[last_key] = value.strip().decode("utf-8", "replace")
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("missing or non-integer Content-Length") from None
        if length < 0 or length > _MAX_BLOCK:
            raise ValueError(f"Content-Length {length} outside [0, {_MAX_BLOCK}]")
        out_bytes += length
        if out_bytes > max_extract_bytes:
            raise ValueError("WARC file exceeds the extraction budget")
        block = stream.read(length)
        if len(block) != length:
            raise ValueError(
                f"truncated record block: {len(block)} of {length} bytes"
            )
        yield headers, block


def _dechunk(body: bytes) -> bytes:
    """Decode an HTTP/1.1 chunked transfer-encoded body (hex size line,
    chunk, CRLF, ... until a 0 chunk).  A malformed chunk stream
    returns the body VERBATIM — captured traffic is full of almost-
    chunked bodies, and the downstream quality filters are the net."""
    out = []
    pos = 0
    try:
        while True:
            eol = body.index(b"\r\n", pos)
            size = int(body[pos:eol].split(b";")[0], 16)
            if size == 0:
                return b"".join(out)
            chunk = body[eol + 2 : eol + 2 + size]
            if len(chunk) != size:
                return body
            out.append(chunk)
            pos = eol + 2 + size + 2
    except (ValueError, IndexError):
        return body


def parse_http_response(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content-type, body) from a captured HTTP response
    message.  Header/body split at the first blank line (CRLF or bare
    LF — both occur in the wild); a payload with no HTTP status line
    comes back as (None, None, payload) so non-HTTP response blocks
    still flow.  ``Transfer-Encoding: chunked`` bodies are de-chunked;
    ``Content-Encoding: gzip/deflate`` bodies are inflated (bounded),
    with the raw bytes kept on any decoding failure."""
    crlf = payload.find(b"\r\n\r\n")
    lf = payload.find(b"\n\n")
    if crlf == -1 and lf == -1:
        head, body = payload, b""
    elif crlf != -1 and (lf == -1 or crlf <= lf):
        head, body = payload[:crlf], payload[crlf + 4 :]
    else:
        head, body = payload[:lf], payload[lf + 2 :]
    lines = head.split(b"\n")
    status_line = lines[0].rstrip(b"\r")
    parts = status_line.split(None, 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        return None, None, payload
    try:
        status = int(parts[1])
    except ValueError:
        return None, None, payload
    ctype = None
    chunked = gzipped = deflated = False
    for raw in lines[1:]:
        name, sep, value = raw.rstrip(b"\r").partition(b":")
        if not sep:
            continue
        key = name.strip().lower()
        val = value.strip().lower()
        if key == b"content-type":
            ctype = val.split(b";")[0].strip().decode("ascii", "replace") or None
        elif key == b"transfer-encoding" and b"chunked" in val:
            chunked = True
        elif key == b"content-encoding":
            gzipped = val in (b"gzip", b"x-gzip")
            deflated = val == b"deflate"
    if chunked:
        body = _dechunk(body)
    if gzipped or deflated:
        try:
            d = zlib.decompressobj(31 if gzipped else zlib.MAX_WBITS)
            inflated = d.decompress(body, _MAX_BLOCK)
            if not d.unconsumed_tail:
                body = inflated
        except zlib.error:
            pass  # keep the captured bytes
    return status, ctype, body


def _records_map(
    batches: Iterator["pd.DataFrame"],
    max_extract_bytes: int = _MAX_EXTRACT_BYTES,
) -> Iterator["pd.DataFrame"]:
    """The per-file record parse as a mapInPandas body — shared by the
    batch and streaming readers (a streaming micro-batch is just a
    smaller set of (path, content) rows).

    Buffered-bytes budget: iter_warc_records meters the raw (possibly
    compressed) block lengths, but a Content-Encoding gzip/deflate body
    inflates AFTER that check — so the INFLATED sizes are charged here
    against the same cumulative per-file budget before the body is
    buffered.  A file of small blocks whose bodies each inflate ~1000x
    (deflate's max ratio) therefore fails ITS file with an error row
    instead of accumulating multi-TB in one task's frame."""
    import pandas as pd

    for pdf in batches:
        for path_, blob in zip(pdf["path"], pdf["content"]):
            fname = os.path.basename(path_)
            blob = bytes(blob)
            rows: dict[str, list] = {f.name: [] for f in RECORD_SCHEMA}
            buffered = 0
            try:
                raw = io.BytesIO(blob)
                stream = (
                    io.BufferedReader(gzip.GzipFile(fileobj=raw))
                    if blob[:2] == b"\x1f\x8b"
                    else raw
                )
                for i, (hdrs, block) in enumerate(
                    iter_warc_records(stream, max_extract_bytes)
                ):
                    rtype = hdrs.get("warc-type")
                    status = hct = None
                    body = block
                    if rtype == "response":
                        status, hct, body = parse_http_response(block)
                    buffered += len(body)
                    if buffered > max_extract_bytes:
                        raise ValueError(
                            "WARC file exceeds the inflated-body budget"
                        )
                    rows["warc_file"].append(fname)
                    rows["ordinal"].append(i)
                    rows["rec_type"].append(rtype)
                    rows["target_uri"].append(hdrs.get("warc-target-uri"))
                    rows["warc_date"].append(hdrs.get("warc-date"))
                    rows["content_type"].append(hdrs.get("content-type"))
                    rows["content_length"].append(len(block))
                    rows["http_status"].append(status)
                    rows["http_content_type"].append(hct)
                    rows["body"].append(body)
                    rows["error"].append(None)
            except (ValueError, EOFError, OSError, zlib.error) as exc:
                rows = {f.name: [] for f in RECORD_SCHEMA}
                rows["warc_file"].append(fname)
                for c in RECORD_SCHEMA.names[1:]:
                    rows[c].append(None)
                rows["error"][:] = [f"{type(exc).__name__}: {exc}"[:200]]
            yield pd.DataFrame(
                {
                    "warc_file": rows["warc_file"],
                    "ordinal": pd.Series(rows["ordinal"], dtype="Int32"),
                    "rec_type": rows["rec_type"],
                    "target_uri": rows["target_uri"],
                    "warc_date": rows["warc_date"],
                    "content_type": rows["content_type"],
                    "content_length": pd.Series(
                        rows["content_length"], dtype="Int64"
                    ),
                    "http_status": pd.Series(rows["http_status"], dtype="Int32"),
                    "http_content_type": rows["http_content_type"],
                    "body": rows["body"],
                    "error": rows["error"],
                }
            )


def read_warc_records(
    spark: SparkSession,
    path: str,
    glob: str = "*.warc.gz",
    max_extract_bytes: int = _MAX_EXTRACT_BYTES,
) -> DataFrame:
    """One row per WARC record across all files matching ``glob`` under
    ``path`` (gzip — incl. Common Crawl per-record members — or plain,
    sniffed per blob): (warc_file, ordinal, rec_type, target_uri,
    warc_date, content_type, content_length, http_status,
    http_content_type, body, error).

    For ``response`` records the HTTP message is parsed in the same
    pass — ``body`` is the de-chunked/inflated HTTP body; for every
    other type ``body`` is the raw block.  A file that fails to parse
    contributes a single error row (everything else null) instead of
    failing the scan, exactly like a bad WebDataset shard."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )
    return files.mapInPandas(
        functools.partial(_records_map, max_extract_bytes=max_extract_bytes),
        RECORD_SCHEMA,
    )


def stream_warc_records(
    spark: SparkSession,
    path: str,
    glob: str = "*.warc.gz",
    max_files_per_trigger: int | None = None,
    max_extract_bytes: int = _MAX_EXTRACT_BYTES,
) -> DataFrame:
    """The continuous-ingest form: a file-source STREAM of WARC shards
    through the same per-file parse — new crawl files appearing under
    ``path`` become record micro-batches.  Same schema and per-file
    error isolation as read_warc_records (the parse is the identical
    shared mapInPandas body); compose downstream with foreachBatch into
    the incremental dedup/classifier state sinks, exactly like the
    documents stream twins."""
    # binaryFile's schema is FIXED by the format, but the streaming
    # source still demands it spelled out
    schema = (
        "path string, modificationTime timestamp, length long, content binary"
    )
    reader = (
        spark.readStream.format("binaryFile")
        .schema(schema)
        .option("pathGlobFilter", glob)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    files = reader.load(path).select("path", "content")
    return files.mapInPandas(
        functools.partial(_records_map, max_extract_bytes=max_extract_bytes),
        RECORD_SCHEMA,
    )


def _html_pages(recs: DataFrame) -> DataFrame:
    """Successful HTML responses -> extracted text (the shared
    projection of the batch and streaming text readers)."""
    from streamsum_spark.operators.html_text import clean_html

    pages = recs.where(
        (F.col("rec_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("http_content_type").isin("text/html", "application/xhtml+xml")
        & F.col("body").isNotNull()
    ).select(
        "warc_file",
        # the per-file record ordinal rides along so consumers can mint
        # a per-FETCH document identity — xxhash64(target_uri) alone
        # collides two crawls of the same page (corpus_prep.doc_id_col)
        "ordinal",
        "target_uri",
        "warc_date",
        F.col("body").cast("string").alias("html"),
    )
    return clean_html(pages).drop("html")


def read_warc_text(
    spark: SparkSession, path: str, glob: str = "*.warc.gz"
) -> DataFrame:
    """The composed front door: WARC files → successful HTML responses
    → extracted text, ready for the quality / langid / dedup operators.
    Output: (warc_file, ordinal, target_uri, warc_date, text,
    text_chars).  The
    byte→string step is ``CAST(body AS STRING)`` (lenient UTF-8 — a
    crawl's stray invalid sequences must not fail the scan), and the
    markup strip is html_text's pure-expression chain, fused into the
    same stage as the record scan."""
    return _html_pages(read_warc_records(spark, path, glob))


def stream_warc_text(
    spark: SparkSession,
    path: str,
    glob: str = "*.warc.gz",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin of read_warc_text: a continuously-growing crawl
    directory becomes a text STREAM (same projection, same expression
    chain) — pinned equal to the batch reader over a 2-shard split in
    tests/test_warc.py."""
    return _html_pages(
        stream_warc_records(spark, path, glob, max_files_per_trigger)
    )


MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType(), False),
        T.StructField("n_records", T.IntegerType(), False),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)


def build_warc_record(headers: dict[str, str], block: bytes) -> bytes:
    """Serialize one record (the exact inverse of iter_warc_records):
    version line, given headers plus the mandatory Content-Length,
    blank line, block, record separator."""
    out = [b"WARC/1.1\r\n"]
    for k, v in headers.items():
        out.append(f"{k}: {v}\r\n".encode())
    out.append(f"Content-Length: {len(block)}\r\n\r\n".encode())
    out.append(block)
    out.append(b"\r\n\r\n")
    return b"".join(out)


def write_warc(
    records: DataFrame,
    out_dir: str,
    warc_max_bytes: int = 256 << 20,
    per_record_gzip: bool = True,
) -> DataFrame:
    """Pack a record relation (rec_type, target_uri, warc_date,
    content_type, body) into .warc.gz files under ``out_dir`` and
    return the MANIFEST (warc_file, n_records, n_bytes); the write
    executes when the manifest materializes — the same executor-side IO
    pattern as write_webdataset.

    Per the Common Crawl convention each record is its own gzip member
    (``per_record_gzip=True``), so output files are range-splittable at
    member boundaries; ``False`` writes plain .warc.  Memory contract
    matches write_webdataset: a task holds one record plus one open
    file — ordering runs Spark-side (sortWithinPartitions on
    target_uri) so a given (partitioning, data) produces byte-identical
    files (gzip members are written with mtime=0).  WARC-Record-ID is
    derived deterministically (md5 of partition/sequence/record-ordinal
    /uri — the ordinal keeps repeated URIs unique) — pass a real
    registry's IDs through ``target_uri``-keyed joins if needed.
    File names ``warc-{partition:05d}-{seq:04d}.warc.gz`` are
    partition-disjoint so concurrent tasks never collide."""
    import hashlib

    import pandas as pd

    suffix = ".warc.gz" if per_record_gzip else ".warc"

    def pack(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from pyspark import TaskContext

        os.makedirs(out_dir, exist_ok=True)
        pid = TaskContext.get().partitionId()
        manifest: list[tuple[str, int, int]] = []
        seq = n_rec = written = 0
        fh = None
        name = None

        def roll():
            nonlocal fh, name, seq, n_rec, written
            if fh is not None:
                fh.close()
                manifest.append((name, n_rec, os.path.getsize(os.path.join(out_dir, name))))
                seq += 1
            name = f"warc-{pid:05d}-{seq:04d}{suffix}"
            fh = open(os.path.join(out_dir, name), "wb")
            n_rec = written = 0

        roll()
        for pdf in batches:
            for i in range(len(pdf)):
                row = pdf.iloc[i]
                block = bytes(row["body"]) if row["body"] is not None else b""
                # the per-file ordinal keeps IDs unique even when the
                # same target_uri recurs within one output file (ISO
                # 28500: WARC-Record-ID is globally unique PER RECORD)
                rid = hashlib.md5(
                    f"{pid}/{seq}/{n_rec}/{row['target_uri']}".encode()
                ).hexdigest()
                rec = build_warc_record(
                    {
                        "WARC-Type": row["rec_type"],
                        "WARC-Record-ID": f"<urn:md5:{rid}>",
                        "WARC-Date": row["warc_date"],
                        "WARC-Target-URI": row["target_uri"],
                        "Content-Type": row["content_type"],
                    },
                    block,
                )
                if per_record_gzip:
                    rec = gzip.compress(rec, mtime=0)
                if written and written + len(rec) > warc_max_bytes:
                    roll()
                fh.write(rec)
                written += len(rec)
                n_rec += 1
        fh.close()
        if n_rec:
            manifest.append((name, n_rec, os.path.getsize(os.path.join(out_dir, name))))
        else:
            os.unlink(os.path.join(out_dir, name))
        yield pd.DataFrame(
            {
                "warc_file": [m[0] for m in manifest],
                "n_records": pd.Series([m[1] for m in manifest], dtype="int32"),
                "n_bytes": pd.Series([m[2] for m in manifest], dtype="int64"),
            }
        )

    return (
        records.select("rec_type", "target_uri", "warc_date", "content_type", "body")
        .sortWithinPartitions("target_uri")
        .mapInPandas(pack, MANIFEST_SCHEMA)
    )
