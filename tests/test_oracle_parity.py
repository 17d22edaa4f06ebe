"""The central gate: every declared query with an oracle must match DuckDB
at sf0.01 — a local mirror of the driver's CORRECTNESS check."""

from __future__ import annotations

import pytest

from streamsum_spark.entry_queries import ORACLES, QUERIES
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_declared_query_matches_oracle(spark, name):
    assert_matches_oracle(spark, QUERIES[name], ORACLES[name])


def test_every_query_callable_smoke(spark):
    """Rows-only sanity for queries without an oracle, at tiny SF."""
    for name, fn in QUERIES.items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
