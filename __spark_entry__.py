"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Declared-query inventory follows SURVEY.md §2; implementations live in
``streamsum_spark`` and are re-exported here as (spark, sf_dir) callables.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from streamsum_spark import entry_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full reference hot
    path (extract -> pattern fan-out -> count cache) topped by the B3
    cross-action merge (countsForSubjAction) — SURVEY.md §7 Phase 1."""
    return entry_queries.QUERIES["counts_merge_actions"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(entry_queries.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per declared query (omissions are
    rows-only checks: approximate/non-deterministic-by-design ops)."""
    return dict(entry_queries.ORACLES)
