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

from collections.abc import Callable

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
from streamsum_spark.util import rebalance_for_cpu

# A cache factory consumes that cache's ROUTED tuple subset (the rows whose
# cache_key names it) plus the pipeline config and returns the cache view.
CacheFactory = Callable[[DataFrame, PipelineConfig], DataFrame]

# Built-in disciplines — the engine's rendition of the reference's
# default-cache-factory-fns map (caches.clj:96-101).
DEFAULT_FACTORIES: dict[str, CacheFactory] = {
    "assoc": lambda routed, cfg: assoc_last_value(routed),
    "lastn": lambda routed, cfg: lastn_per_key(routed, n=cfg.lastn_buf_size),
    "count": lambda routed, cfg: count_cache(routed),
    "keycount": lambda routed, cfg: keycount(routed),
}


def cache_tuples(spark: SparkSession, sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """events.parquet -> cache-mapped tuples (cache_key, k, action, v, ts, seq).

    Extraction runs BELOW the rebalance: the null-drop filter references
    the parsed fields, so with extraction above the exchange predicate
    pushdown would drag the JSON parse below it into its own serial filter
    while the projection re-parses above — two parses per row.  Extracting
    first fuses filter+projection into the scan's codegen stage (one parse
    via subexpression elimination) and the exchange ships the narrower
    extracted tuples, not raw props.  The rebalance itself parallelizes
    the explode fan-out when the source yields fewer splits than cores
    (single-row-group test files); at real scale (thousands of row
    groups) it is a documented no-op and the whole chain fuses anyway."""
    return transform_fanout(
        rebalance_for_cpu(extract_events(table(spark, sf_dir, "events"))), cfg
    )


def build_caches(
    spark: SparkSession,
    sf_dir: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    cache_factory_fns: dict[str, CacheFactory] | None = None,
) -> dict[str, DataFrame]:
    """Materialize every configured cache as a DataFrame view.

    Every cache — including keycount — consumes only its ROUTED subset
    (``filter(cache_key = name)``), mirroring the reference's
    dispatch-by-cache-key in record! (caches.clj:158-179); unknown cache
    keys in the tuple stream are dropped by the same filter (record! logs
    and returns nil for unknown keys, caches.clj:166-170).

    ``cache_factory_fns`` is the user-extension SPI: a ``{kind: factory}``
    dict merged OVER the built-in disciplines, mirroring the reference's
    ``:cache-factory-fns`` config entry (README.md:101-112, merged with
    defaults at caches.clj:103-113).  A factory receives the routed tuple
    subset and the config and returns the cache DataFrame — so user
    disciplines compose with the same pushdown/shuffle machinery as the
    built-ins.
    """
    factories = {**DEFAULT_FACTORIES, **(cache_factory_fns or {})}
    tuples = cache_tuples(spark, sf_dir, cfg)
    out: dict[str, DataFrame] = {}
    for spec in cfg.caches:
        factory = factories.get(spec.kind)
        if factory is None:
            raise ValueError(
                f"unknown cache kind: {spec.kind} (known: {sorted(factories)})"
            )
        routed = tuples.where(F.col("cache_key") == spec.name)
        out[spec.name] = factory(routed, cfg)
    return out


def count_cache_view(spark: SparkSession, sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """The canonical count-cache table (subject, action, obj, cnt, latest_ts)."""
    tuples = cache_tuples(spark, sf_dir, cfg)
    name = cfg.cache_names("count")[0]
    return count_cache(tuples.where(F.col("cache_key") == name))


def keycount_view(spark: SparkSession, sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """The keycount cache table (k, cnt) over its routed subset (A9)."""
    tuples = cache_tuples(spark, sf_dir, cfg)
    name = cfg.cache_names("keycount")[0]
    return keycount(tuples.where(F.col("cache_key") == name))
