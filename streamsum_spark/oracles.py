"""Shared DuckDB oracle SQL fragments.

The driver registers the parquet tables as DuckDB views (region nation
customer supplier part orders lineitem events documents embeddings) and
runs each ``oracle_sql()`` string against them.  The pipeline queries all
build on the same three CTEs: extracted 4-tuples -> pattern fan-out ->
count-cache table, mirroring streamsum_spark.pipeline exactly.
"""

from __future__ import annotations

from streamsum_spark.config import DEFAULT_CONFIG
from streamsum_spark.operators.extract import EXTRACT_ORACLE_SQL
from streamsum_spark.operators.transform import transform_oracle_sql

TUPLES_SQL = EXTRACT_ORACLE_SQL.strip()

FANOUT_SQL = transform_oracle_sql(DEFAULT_CONFIG).strip()

COUNT_CACHE_NAME = DEFAULT_CONFIG.cache_names("count")[0]

CACHE_SQL = f"""
SELECT k AS subject, action, v AS obj,
       CAST(count(*) AS BIGINT) AS cnt, max(ts) AS latest_ts
FROM fanout
WHERE cache_key = '{COUNT_CACHE_NAME}' AND action IS NOT NULL
GROUP BY 1, 2, 3
""".strip()


def with_pipeline_ctes(body: str) -> str:
    """Prefix a query body with the tuples/fanout/cache CTE chain."""
    return (
        f"WITH tuples AS ({TUPLES_SQL}),\n"
        f"fanout AS ({FANOUT_SQL}),\n"
        f"cache AS ({CACHE_SQL})\n"
        f"{body}"
    )
