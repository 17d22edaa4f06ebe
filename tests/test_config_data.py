"""Declarative (data-only) pipeline config: JSON round-trip, validation
errors, and an end-to-end run of a custom config — the reference's
config-driven design (README.md:101-126) without its executable-config
surface (system.clj:32-38)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from streamsum_spark import pipeline
from streamsum_spark.config import (
    DEFAULT_CONFIG,
    config_from_dict,
    config_to_dict,
)
from tests.conftest import SF_SMOKE


def test_roundtrip_default_config():
    d = json.loads(json.dumps(config_to_dict(DEFAULT_CONFIG)))
    assert config_from_dict(d) == DEFAULT_CONFIG


def test_custom_config_runs_end_to_end(spark):
    cfg = config_from_dict(
        {
            "patterns": [
                {
                    "pred": "purchase",
                    "outputs": [
                        {"cache": "spend", "key_field": "subj", "val_field": "obj"}
                    ],
                }
            ],
            "caches": [{"name": "spend", "kind": "lastn"}],
            "lastn_buf_size": 3,
        }
    )
    caches = pipeline.build_caches(spark, SF_SMOKE, cfg)
    assert set(caches) == {"spend"}
    out = caches["spend"]
    assert out.where(F.col("rn") > 3).count() == 0
    assert out.count() > 0


@pytest.mark.parametrize(
    "broken, msg",
    [
        ({"patterns": [], "caches": [{"name": "c", "kind": "lastn"}]}, "at least one pattern"),
        ({"patterns": [{"pred": "x", "outputs": []}], "caches": []}, "at least one cache"),
        (
            {
                "patterns": [
                    {"pred": "x", "outputs": [{"cache": "nope", "key_field": "subj", "val_field": "obj"}]}
                ],
                "caches": [{"name": "c", "kind": "lastn"}],
            },
            "undeclared cache",
        ),
        (
            {
                "patterns": [
                    {"pred": "x", "outputs": [{"cache": "c", "key_field": "bogus", "val_field": "obj"}]}
                ],
                "caches": [{"name": "c", "kind": "lastn"}],
            },
            "must be 'subj' or 'obj'",
        ),
        (
            {
                "patterns": [{"pred": "x", "outputs": [{"cache": "c", "key_field": "subj"}]}],
                "caches": [{"name": "c", "kind": "lastn"}],
            },
            "missing 'val_field'",
        ),
    ],
)
def test_invalid_configs_fail_fast(broken, msg):
    with pytest.raises(ValueError, match=msg):
        config_from_dict(broken)


def test_unknown_kind_defers_to_spi(spark):
    """An unknown cache kind passes config validation (the SPI may supply
    a factory at build time) but build_caches without a factory raises."""
    cfg = config_from_dict(
        {
            "patterns": [
                {"pred": "click", "outputs": [{"cache": "c", "key_field": "subj", "val_field": "obj"}]}
            ],
            "caches": [{"name": "c", "kind": "exotic"}],
        }
    )
    with pytest.raises(ValueError, match="unknown cache kind"):
        pipeline.build_caches(spark, SF_SMOKE, cfg)
    # with a registered factory it builds
    caches = pipeline.build_caches(
        spark,
        SF_SMOKE,
        cfg,
        cache_factory_fns={"exotic": lambda routed, _cfg: routed.groupBy("k").count()},
    )
    assert caches["c"].columns == ["k", "count"]
