"""Multimodal plumbing: schema, Arrow batch flow, deterministic features."""

from __future__ import annotations

import pytest

from streamsum_spark.operators import multimodal as mm


def test_extract_features_roundtrip(spark):
    media = mm.synthetic_media(spark, n=32)
    feats = mm.extract_features(media)
    rows = {r.media_id: r for r in feats.collect()}
    assert len(rows) == 32
    assert all(len(r.feature) == 8 for r in rows.values())
    assert all(r.content_sha and len(r.content_sha) == 64 for r in rows.values())
    # deterministic across runs
    again = {r.media_id: r for r in mm.extract_features(media).collect()}
    assert all(rows[i].feature == again[i].feature for i in rows)


def test_metadata_predicates_prune_without_touching_blobs(spark):
    media = mm.synthetic_media(spark, n=32)
    imgs = media.where(mm.F.col("mime") == "image/png").select("media_id", "width")
    assert imgs.count() == 16


def test_frame_sample_plan(spark):
    media = mm.synthetic_media(spark, n=14)
    plan = mm.frame_sample_plan(media, every_ms=1000)
    # durations cycle 1000..7000 -> 1..7 frames each
    counts = dict(
        plan.groupBy("media_id").count().collect()
        and [(r.media_id, r["count"]) for r in plan.groupBy("media_id").count().collect()]
    )
    assert counts[0] == 1 and counts[6] == 7


def test_decode_is_honest_stub():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG")
