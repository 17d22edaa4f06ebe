"""Curation funnel: cascade invariants on the real corpus, first-rule-
wins attribution, per-rule cross-checks against independently-derived
counts, and survivor consistency."""

import pytest

from streamsum_spark.operators.curation import (
    RULES,
    curate_documents,
    curation_funnel,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def funnel(spark):
    return curation_funnel(spark, SF).orderBy("stage").collect()


def test_cascade_invariants(spark, funnel):
    from streamsum_spark.tables import table

    total = table(spark, SF, "documents").count()
    assert funnel[0].n_in == total
    for a, b in zip(funnel, funnel[1:]):
        assert a.n_out == b.n_in
        assert a.n_in - a.n_dropped == a.n_out
    assert [r.rule for r in funnel] == [r.removeprefix("drop_") for r in RULES]
    assert sum(r.n_dropped for r in funnel) + funnel[-1].n_out == total
    assert all(r.n_dropped >= 0 for r in funnel)


def test_survivors_match_funnel_tail(spark, funnel):
    assert curate_documents(spark, SF).count() == funnel[-1].n_out


def test_stage1_matches_direct_filter(spark, funnel):
    # the first rule has no prior stages: its drop count is the plain
    # complement of the word-count window, independently derived
    from streamsum_spark.operators.text import gopher_quality_flags

    direct = (
        gopher_quality_flags(spark, SF)
        .where("n_words < 50 OR n_words > 100000")
        .count()
    )
    assert funnel[0].n_dropped == direct


def test_first_rule_wins(spark, funnel):
    # total attributed drops == docs failing ANY rule (no double count)
    from streamsum_spark.operators.curation import _rule_flags

    flags = _rule_flags(spark, SF)
    any_fail = flags.where(" OR ".join(RULES)).count()
    assert sum(r.n_dropped for r in funnel) == any_fail
    # and per-rule attributed <= per-rule raw failures
    for r, row in zip(RULES, funnel):
        raw = flags.where(r).count()
        assert row.n_dropped <= raw


def test_funnel_actually_drops_something(funnel):
    # the synthetic corpus exercises the battery: near-dup and exact-dup
    # rules must both fire on it (documents.parquet contains dup pairs)
    by_rule = {r.rule: r.n_dropped for r in funnel}
    assert by_rule["near_dup"] > 0
    assert sum(by_rule.values()) > 0


def test_survivors_pass_every_rule(spark):
    from streamsum_spark.operators.curation import _rule_flags

    flags = _rule_flags(spark, SF)
    kept = curate_documents(spark, SF).select("doc_id")
    bad = flags.join(kept, "doc_id", "left_semi").where(" OR ".join(RULES))
    assert bad.count() == 0


# --- media twin ----------------------------------------------------------------


def _media_df(spark):
    import numpy as np

    from streamsum_spark.operators.jpeg import encode_jpeg
    from streamsum_spark.operators.multimodal import encode_png, encode_wav

    def img(w, h):
        yy, xx = np.mgrid[0:h, 0:w]
        return np.stack([(xx * 7) % 256, (yy * 11) % 256, (xx + yy) % 256], 2).astype(
            np.uint8
        )

    tone = (np.sin(np.arange(4000) * 0.05) * 9000).astype(np.int16).reshape(-1, 1)
    big = encode_png(img(64, 64))
    rows = [
        (1, bytearray(big)),                              # keeper
        (2, bytearray(encode_png(img(16, 16)))),          # too small
        (3, bytearray(encode_jpeg(img(64, 64), quality=15))),  # low quality
        (4, bytearray(encode_wav(tone, 8000))),           # wrong kind
        (5, bytearray(b"corrupt nonsense " * 8)),         # unprobed
        (6, bytearray(big)),                              # exact dup of 1
        (7, bytearray(encode_jpeg(img(48, 40), quality=85))),  # keeper
    ]
    return spark.createDataFrame(rows, "media_id long, content binary")


def test_media_funnel_accounting(spark):
    from streamsum_spark.operators.curation import (
        MEDIA_RULES,
        curate_media,
        media_curation_funnel,
    )

    media = _media_df(spark)
    funnel = media_curation_funnel(media).orderBy("stage").collect()
    by_rule = {r.rule: r.n_dropped for r in funnel}
    assert by_rule == {
        "unprobed": 1, "kind": 1, "small": 1, "low_quality": 1, "exact_dup": 1,
    }
    assert funnel[0].n_in == 7 and funnel[-1].n_out == 2
    for a, b in zip(funnel, funnel[1:]):
        assert a.n_out == b.n_in
    assert [r.rule for r in funnel] == [r.removeprefix("drop_") for r in MEDIA_RULES]
    kept = {r.media_id for r in curate_media(media).collect()}
    assert kept == {1, 7}


def test_media_funnel_rule_knobs(spark):
    from streamsum_spark.operators.curation import curate_media

    media = _media_df(spark)
    # loosen everything: only the unprobed blob and the dup fall
    kept = {
        r.media_id
        for r in curate_media(
            media, kinds=("image", "audio"), min_w=1, min_h=1, min_jpeg_quality=1
        ).collect()
    }
    assert kept == {1, 2, 3, 4, 7}


def test_curated_media_survivors_decode(spark):
    from streamsum_spark.operators.curation import curate_media
    from streamsum_spark.operators.multimodal import decode_image

    media = _media_df(spark)
    for r in curate_media(media).collect():
        px = decode_image(bytes(r.content))  # the decode stage never sees junk
        assert px.shape[0] >= 32 and px.shape[1] >= 32


def test_media_funnel_video_kind(spark):
    import numpy as np

    from streamsum_spark.operators.avi import encode_avi_mjpeg
    from streamsum_spark.operators.curation import curate_media
    from streamsum_spark.operators.mp4_frames import encode_mp4_mjpeg
    from streamsum_spark.operators.multimodal import encode_png

    def img(k):
        yy, xx = np.mgrid[0:48, 0:64]
        return np.stack([(xx + k) % 256, yy % 256, (xx + yy) % 256], 2).astype(
            np.uint8
        )

    rows = [
        (1, bytearray(encode_avi_mjpeg([img(0), img(1)], rate=10))),
        (2, bytearray(encode_mp4_mjpeg([img(0), img(1)]))),
        (3, bytearray(encode_png(img(0)))),  # image: wrong kind now
    ]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    kept = {r.media_id for r in curate_media(media, kinds=("video",)).collect()}
    assert kept == {1, 2}


def test_empty_input_funnels_are_all_zero(spark, tmp_path):
    """ADVICE r11: F.sum over zero rows is null — an empty relation
    must produce a well-formed all-zero funnel, not a TypeError."""
    import pyarrow.parquet as pq

    from streamsum_spark.operators.curation import (
        MEDIA_RULES,
        RULES,
        curate_media,
        curation_funnel,
        media_curation_funnel,
    )

    empty_media = spark.createDataFrame([], "media_id long, content binary")
    rows = media_curation_funnel(empty_media).orderBy("stage").collect()
    assert [r.rule for r in rows] == [r.removeprefix("drop_") for r in MEDIA_RULES]
    assert all(r.n_in == 0 and r.n_dropped == 0 and r.n_out == 0 for r in rows)
    assert curate_media(empty_media).count() == 0

    # document funnel over an EMPTY documents table (pyarrow slice
    # keeps the real schema; an empty pandas frame would degrade types)
    src = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    pq.write_table(src.slice(0, 0), tmp_path / "documents.parquet")
    rows = curation_funnel(spark, str(tmp_path)).orderBy("stage").collect()
    assert [r.rule for r in rows] == [r.removeprefix("drop_") for r in RULES]
    assert all(r.n_in == 0 and r.n_dropped == 0 and r.n_out == 0 for r in rows)


def test_funnel_accepts_classifier_extra_rule(spark):
    """Round 12: a classifier margin gate plugs into the funnel as a
    trailing audited stage — built-in stage counts unchanged, the new
    stage's accounting consistent, survivors pass the gate."""
    from pyspark.sql import functions as F

    from streamsum_spark.operators.classifier import (
        classifier_drop_flags,
        train_nb,
    )
    from streamsum_spark.operators.curation import (
        curate_documents,
        curation_funnel,
    )
    from streamsum_spark.tables import table

    sf = "/root/testdata/sf0.001"
    docs = table(spark, sf, "documents").select(
        "doc_id", F.col("lang").alias("label"), "text"
    )
    model = train_nb(docs.where(F.col("doc_id") % 2 == 0), n_buckets=1 << 12)
    extra = classifier_drop_flags(
        docs.select("doc_id", "text"), model, keep_label="en"
    )
    base = {r.rule: r for r in curation_funnel(spark, sf).collect()}
    with_c = {r.rule: r for r in curation_funnel(spark, sf, extra=extra).collect()}
    assert set(with_c) == set(base) | {"classifier"}
    for rule, row in base.items():
        got = with_c[rule]
        assert (got.n_in, got.n_dropped, got.n_out) == (
            row.n_in, row.n_dropped, row.n_out,
        ), rule
    c = with_c["classifier"]
    assert c.stage == len(with_c)
    assert c.n_in == base["contaminated"].n_out
    assert c.n_out == c.n_in - c.n_dropped
    assert c.n_dropped > 0  # non-'en' docs that survived the battery
    survivors = {r.doc_id for r in curate_documents(spark, sf, extra=extra).collect()}
    assert len(survivors) == c.n_out
    gate = {r.doc_id: r.drop_classifier for r in extra.collect()}
    assert all(not gate[d] for d in survivors)
