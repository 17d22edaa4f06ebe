"""Shared fixtures: one SparkSession per test run + a DuckDB oracle
comparator mirroring the driver's check (row count + sorted-column schema +
order-insensitive values)."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamsum_spark.session import get_spark
from streamsum_spark.tables import TABLES

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # 8 shuffle/state partitions, not the session default (= cpu count):
    # the suite's data is sf0.001-0.01, where per-partition work is
    # nil but every stateful STREAMING operator commits one state-store
    # delta file per partition per micro-batch (a stream-stream join
    # keeps four stores per partition) — at 32 partitions the streaming
    # modules spent their wall-clock on thousands of tiny state commits,
    # not on computation (driver pytest gate timed out; r15 verdict
    # item 1).  8 keeps real multi-partition coverage (hash spread,
    # AQE coalesce/skew paths) while cutting the commit count 4x.
    # Value-parity tests are partition-count independent by design.
    s = get_spark("streamsum_spark_tests", shuffle_partitions=8)
    yield s


def duckdb_frame(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con.sql(sql).fetchdf()


def _canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == int(v) and abs(v) < 1e15:
            return repr(float(v))
        return repr(v)
    # pandas Timestamp / datetime / numpy types
    tname = type(v).__name__
    if tname in ("Timestamp", "datetime"):
        return v.isoformat()
    if hasattr(v, "item"):  # numpy scalar
        return _canon_cell(v.item())
    return str(v)


def canon_rows(pdf) -> tuple[list[str], list[tuple[str, ...]]]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [tuple(_canon_cell(v) for v in row) for row in pdf.itertuples(index=False)]
    rows.sort()
    return cols, rows


def assert_matches_oracle(spark, query_fn, oracle: str, sf_dir: str = SF_ORACLE):
    """Mirror of the driver's t2 check for one declared query."""
    spark_pdf = query_fn(spark, sf_dir).toPandas()
    duck_pdf = duckdb_frame(oracle, sf_dir)
    s_cols, s_rows = canon_rows(spark_pdf)
    d_cols, d_rows = canon_rows(duck_pdf)
    assert s_cols == d_cols, f"column mismatch: spark={s_cols} duckdb={d_cols}"
    assert len(s_rows) == len(d_rows), f"row count: spark={len(s_rows)} duckdb={len(d_rows)}"
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, f"value mismatch (first 5 of {len(mismatches)}): {mismatches[:5]}"
