"""Batch pipeline composition: events -> extract -> transform -> caches.

This is the Spark rendition of the reference's hot path
(/root/reference/src-clj/streamsum/system.clj:70-87): the stateless stages
(extract/transform) are one narrow, codegen-fused pass over the scan, and
each cache is an aggregation consuming the same fanned-out DataFrame —
Catalyst reuses the scan plan, and each cache's shuffle is keyed by its own
key column (the "record! dispatch" of caches.clj:158-179 becomes a
per-cache filter + groupBy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamsum_spark.config import DEFAULT_CONFIG, PipelineConfig
from streamsum_spark.operators.caches import (
    assoc_last_value,
    count_cache,
    keycount,
    lastn_per_key,
)
from streamsum_spark.operators.extract import extract_events
from streamsum_spark.operators.transform import transform_fanout
from streamsum_spark.tables import table


def cache_tuples(spark: SparkSession, sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """events.parquet -> cache-mapped tuples (cache_key, k, action, v, ts, seq)."""
    return transform_fanout(extract_events(table(spark, sf_dir, "events")), cfg)


def build_caches(
    spark: SparkSession, sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG
) -> dict[str, DataFrame]:
    """Materialize every configured cache as a DataFrame view.

    Unknown cache keys in the tuple stream are dropped (reference: record!
    logs and returns nil for unknown keys, caches.clj:166-170) — the
    per-cache ``filter(cache_key = name)`` does this implicitly.
    """
    tuples = cache_tuples(spark, sf_dir, cfg)
    out: dict[str, DataFrame] = {}
    for spec in cfg.caches:
        routed = tuples.where(F.col("cache_key") == spec.name)
        if spec.kind == "assoc":
            out[spec.name] = assoc_last_value(routed)
        elif spec.kind == "lastn":
            out[spec.name] = lastn_per_key(routed, n=cfg.lastn_buf_size)
        elif spec.kind == "count":
            out[spec.name] = count_cache(routed)
        elif spec.kind == "keycount":
            # subject-counts counts every tuple's key across the whole
            # stream (config.clj:88: "number of times each subject appears")
            out[spec.name] = keycount(tuples)
        else:
            raise ValueError(f"unknown cache kind: {spec.kind}")
    return out


def count_cache_view(spark: SparkSession, sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """The canonical count-cache table (subject, action, obj, cnt, latest_ts)."""
    tuples = cache_tuples(spark, sf_dir, cfg)
    name = cfg.cache_names("count")[0]
    return count_cache(tuples.where(F.col("cache_key") == name))
