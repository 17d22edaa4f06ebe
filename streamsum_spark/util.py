"""Small engine utilities."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def rebalance_for_cpu(df: DataFrame, min_ratio: float = 0.5) -> DataFrame:
    """Round-robin repartition when the source yields fewer splits than
    cores — parallelizes CPU-heavy narrow work (digests, folds) that would
    otherwise run on one task.

    Single-row-group parquet files (the test data) scan as ONE split no
    matter the maxPartitionBytes; a 100 TB table provides thousands of
    row groups, making this a no-op (partitions >= cores), so the extra
    exchange only ever happens when it is cheap and necessary.
    """
    spark = df.sparkSession
    cpus = int(
        os.environ.get(
            "SPARK_GRAFT_CPUS",
            spark.sparkContext.defaultParallelism or os.cpu_count() or 8,
        )
    )
    if df.rdd.getNumPartitions() < max(1, int(cpus * min_ratio)):
        return df.repartition(cpus)
    return df


def salted_count(df: DataFrame, key_cols: list[str], salt_buckets: int = 16) -> DataFrame:
    """Skew-resistant grouped count: two-phase aggregation through a salted
    key.  Phase 1 shuffles on (key, salt) — a hot key spreads over
    ``salt_buckets`` reducers instead of melting one; phase 2 merges the
    per-salt partials (tiny: |keys| x salt rows).

    AQE's skew-join splitting covers joins; salting is the groupBy-side
    counterpart for when a single group's rows exceed one reducer.  Counts
    are commutative so the rewrite is exact.
    """
    from pyspark.sql import functions as F

    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*key_cols, "_salt").agg(F.count(F.lit(1)).alias("_c"))
    return partial.groupBy(*key_cols).agg(F.sum("_c").cast("long").alias("cnt"))
