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
