"""SparkSession factory tuned for both local testing and cluster scale.

Local mode is one JVM; the settings that matter there are shuffle
partitions (match cores, not the 200 default) and AQE.  At cluster scale
the same AQE settings handle skew-join splitting and partition coalescing,
so the config is scale-portable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "streamsum_spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) the session.

    AQE is on so runtime stats re-plan shuffles (coalesce tiny partitions at
    small SF, split skewed ones at large SF); broadcast threshold stays at
    the 10 MB default — dimension tables (region/nation/customer at any SF
    we test) broadcast automatically, and we add explicit ``broadcast()``
    hints where the optimizer lacks stats.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # committer v2: task outputs commit directly to the job's
        # destination instead of the two-phase rename.  Safe HERE
        # because every state write in this engine lands in a PRIVATE
        # tmp directory that the sink layer publishes with its own
        # atomic swap/pointer protocols (sinks._atomic_swap, snapshot
        # manifests) — the v1 committer's extra rename pass protects
        # against a failure mode our commit protocol already owns, and
        # it costs two renames per task on every bucket write (a
        # 16-bucket merge pays it 16x per commit).
        .config(
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
            "2",
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
