"""User-extensible cache-discipline SPI (reference: ``:cache-factory-fns``,
README.md:101-112, merged with the built-in factories at caches.clj:103-113;
custom-factory end-to-end test shape: caches_test.clj:162-203).

``build_caches(cache_factory_fns={kind: factory})`` merges user factories
OVER the defaults; a factory receives that cache's routed tuple subset and
the config, and returns the cache DataFrame.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from streamsum_spark.config import CacheSpec, PipelineConfig, TransformPattern, TupleTemplate
from streamsum_spark.pipeline import build_caches, cache_tuples
from tests.conftest import SF_SMOKE

# config routing clicks into a cache of a USER-DEFINED discipline
CFG = PipelineConfig(
    patterns=(
        TransformPattern(
            "click", (TupleTemplate("first-click-obj", "subj", "obj"),)
        ),
    ),
    caches=(CacheSpec("first-click-obj", "firstvalue", "first object clicked"),),
)


def first_value_factory(routed, cfg):
    """Custom discipline: keep the FIRST value per key by arrival order —
    the mirror image of assoc (min_by instead of max_by)."""
    return routed.groupBy("k").agg(
        F.expr("min_by(v, struct(ts, seq))").alias("v"),
        F.min("ts").alias("first_ts"),
    )


def test_custom_factory_end_to_end(spark):
    caches = build_caches(
        spark, SF_SMOKE, cfg=CFG, cache_factory_fns={"firstvalue": first_value_factory}
    )
    assert set(caches) == {"first-click-obj"}
    got = {r.k: r.v for r in caches["first-click-obj"].collect()}

    # independent expectation: window-rank the routed tuples directly
    tuples = cache_tuples(spark, SF_SMOKE, CFG)
    expected = {
        r.k: r.v
        for r in tuples.where(F.col("cache_key") == "first-click-obj")
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy("k").orderBy("ts", "seq"))
        )
        .where(F.col("rn") == 1)
        .collect()
    }
    assert got == expected and len(got) > 0


def test_custom_factory_overrides_builtin(spark):
    """User factories merge OVER defaults (caches.clj:112: extensions
    replace same-named defaults)."""
    cfg = PipelineConfig(
        patterns=CFG.patterns,
        caches=(CacheSpec("first-click-obj", "assoc", "overridden"),),
    )
    caches = build_caches(
        spark, SF_SMOKE, cfg=cfg, cache_factory_fns={"assoc": first_value_factory}
    )
    assert "first_ts" in caches["first-click-obj"].columns  # custom, not builtin


def test_unknown_kind_raises(spark):
    with pytest.raises(ValueError, match="unknown cache kind"):
        build_caches(spark, SF_SMOKE, cfg=CFG)  # 'firstvalue' not registered
