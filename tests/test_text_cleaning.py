"""PII-redaction pins: the fixture carries real PII shapes (the corpus
has none), redacted identically by Spark and DuckDB; the corpus-level
md5 oracle lives in tests/test_demoted_oracles.py."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from streamsum_spark.operators.text import PII_PATTERNS, redact_pii
from tests.conftest import SF_ORACLE

FIXTURE = [
    ("mail me at jane.doe+spam@example.co.uk now", "mail me at <EMAIL> now"),
    ("server 192.168.001.1 and 10.0.0.255 up", "server <IP> and <IP> up"),
    ("call +1 555-123-4567 or 08 1234 5678 ok", "call <PHONE> or <PHONE> ok"),
    ("plain text with no pii at all", "plain text with no pii at all"),
    ("a@b.io 1.2.3.4 +123456789", "<EMAIL> <IP> <PHONE>"),
    ("short +1234567 stays", "short +1234567 stays"),  # below the 9-char floor
]


def _spark_redact(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    col = F.col("text")
    for pat, rep in PII_PATTERNS:
        col = F.regexp_replace(col, pat, rep)
    return [r.t for r in df.select(col.alias("t")).collect()]


def _duck_redact(texts):
    con = duckdb.connect()
    out = []
    for t in texts:
        expr = "?"
        sql_expr = "t"
        for pat, rep in PII_PATTERNS:
            sql_expr = f"regexp_replace({sql_expr}, '{pat}', '{rep}', 'g')"
        out.append(
            con.execute(f"SELECT {sql_expr} FROM (SELECT ? AS t)", [t]).fetchone()[0]
        )
    return out


def test_fixture_redaction_and_cross_engine_identity(spark):
    texts = [t for t, _ in FIXTURE]
    want = [w for _, w in FIXTURE]
    got_spark = _spark_redact(spark, texts)
    got_duck = _duck_redact(texts)
    assert got_spark == want
    assert got_duck == want  # byte-identical across engines


def test_corpus_redaction_is_nochange_and_hashstable(spark):
    """The synthetic corpus has no PII: every doc unchanged, and the
    md5 column equals md5(text) — a non-vacuous exercise of the full
    regex chain over all 500 docs."""
    out = redact_pii(spark, SF_ORACLE)
    assert out.where("changed").count() == 0
    from streamsum_spark.tables import table

    base = table(spark, SF_ORACLE, "documents").select(
        "doc_id", F.md5("text").alias("m")
    )
    joined = out.join(base, "doc_id").where(F.col("redacted_md5") != F.col("m"))
    assert joined.count() == 0
