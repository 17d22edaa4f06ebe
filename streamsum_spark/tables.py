"""Table registry over the driver's synthetic parquet directories.

``load_tables(spark, sf_dir)`` reads each table lazily (a DataFrame is a
plan, not data) and registers temp views so operators can be written in
either DataFrame or SQL form.  Filters/projections written downstream reach
the parquet scan via Catalyst pushdown — verified in tests via
``explain`` containing PushedFilters/ReadSchema.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Columns stored as parquet TIMESTAMP(NANOS), which Spark's vectorized
# reader rejects ([PARQUET_TYPE_ILLEGAL]).  We read them via the
# nanosAsLong legacy conf and truncate to microseconds — the same ns->us
# conversion DuckDB applies on read, so oracle comparisons agree.
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}

# InferFiltersFromGenerate rewrites explode(e) into
# Filter(size(e)>0 AND isnotnull(e)) + explode(e), SUBSTITUTING the full
# generator expression into the filter.  When e is a computed array (our
# shingle/gram/fan-out lambdas), predicate pushdown then drags that filter
# below the parallelizing exchange onto the (often single-split) parquet
# scan — the whole interpreted-lambda pipeline runs twice, once serially.
# Measured 6.5 s -> 0.8 s on minhash_signatures at sf0.1.  The rule is a
# pure optimization (explode drops null/empty inputs natively), so
# excluding it never changes results; the only foregone win is row-group
# pruning for explodes of STORED arrays, which none of our queries need.
_EXCLUDED_RULES = (
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
)


def tune_optimizer(spark: SparkSession) -> None:
    """Merge our excluded optimizer rules into the session conf (runtime
    conf, same pattern as the nanos flag below — it must also apply under
    the driver's own plain session, not just get_spark())."""
    current = spark.conf.get("spark.sql.optimizer.excludedRules", None) or ""
    rules = [r for r in current.split(",") if r]
    for r in _EXCLUDED_RULES:
        if r not in rules:
            rules.append(r)
    spark.conf.set("spark.sql.optimizer.excludedRules", ",".join(rules))


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from pyspark.sql import functions as F

    tune_optimizer(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    nanos_cols = _NANOS_TS_COLS.get(name, ())
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos_cols:
        if dict(df.dtypes).get(c) == "bigint":
            # Integer micros added to an NTZ epoch: exact (no double
            # division) and independent of the session timezone — matches
            # how the other tables' timestamps read (TIMESTAMP_NTZ) and how
            # DuckDB treats naive parquet timestamps.
            df = df.withColumn(
                c,
                F.expr(f"timestampadd(MICROSECOND, `{c}` div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"),
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, register_views: bool = True) -> dict[str, DataFrame]:
    dfs: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = table(spark, sf_dir, name)
        dfs[name] = df
        if register_views:
            df.createOrReplaceTempView(name)
    return dfs
