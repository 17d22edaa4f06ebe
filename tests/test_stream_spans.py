"""Pins for the streaming exact-substring dedup twin: flagged-span set
equal to the batch operator over a doc_id-ordered 3-slice split,
restartable state (a rerun over a widened glob processes only new
slices), and redelivery idempotence (a replayed slice adds nothing)."""

from __future__ import annotations

import glob as g
import os
import shutil

import pytest
from pyspark.sql import functions as F

from streamsum_spark.operators.dedup import SPAN_N, duplicate_ngram_spans
from streamsum_spark.streaming import pipeline as sp
from streamsum_spark.tables import table

SF_ORACLE = "/root/testdata/sf0.001"


def _ordered_slices(spark, tmp_path, n_slices=3):
    """documents.parquet + doc_id-RANGE slices documents_{i}.parquet:
    arrival order equals doc_id order, so the stream's first-arrival
    semantics coincide with the batch op's smallest-(doc_id, start)
    tie-break and the flag sets are comparable exactly."""
    docs = table(spark, SF_ORACLE, "documents")
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
    step = (hi - lo) // n_slices + 1
    src = str(tmp_path / "span_src")
    os.makedirs(src, exist_ok=True)
    docs.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "span_full"))
    shutil.copy(
        g.glob(str(tmp_path / "span_full" / "part-*.parquet"))[0],
        os.path.join(src, "documents.parquet"),
    )
    for i in range(n_slices):
        part = docs.where(
            (F.col("doc_id") >= lo + i * step) & (F.col("doc_id") < lo + (i + 1) * step)
        )
        part.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / f"span_s{i}"))
        shutil.copy(
            g.glob(str(tmp_path / f"span_s{i}" / "part-*.parquet"))[0],
            os.path.join(src, f"documents_{i}.parquet"),
        )
    return src


def test_stream_spans_equal_batch_over_ordered_split(spark, tmp_path):
    src = _ordered_slices(spark, tmp_path)
    batch = {
        (r.doc_id, r.start, r.gram_md5)
        for r in duplicate_ngram_spans(spark, src).collect()
    }
    stream = {
        (r.doc_id, r.start, r.gram_md5)
        for r in sp.stream_duplicate_spans(
            spark, src, glob="documents_*.parquet", max_files_per_trigger=1
        ).collect()
    }
    assert batch and stream == batch


def test_stream_spans_restartable_and_marginal(spark, tmp_path):
    src = _ordered_slices(spark, tmp_path)
    base = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    two = sp.stream_duplicate_spans(
        spark, src, glob="documents_[01].parquet", max_files_per_trigger=1,
        state_base=base, checkpoint=ckpt,
    ).count()
    # widened glob: the file-source log skips slices 0-1, ingests only 2
    full = {
        (r.doc_id, r.start, r.gram_md5)
        for r in sp.stream_duplicate_spans(
            spark, src, glob="documents_*.parquet", max_files_per_trigger=1,
            state_base=base, checkpoint=ckpt,
        ).collect()
    }
    batch = {
        (r.doc_id, r.start, r.gram_md5)
        for r in duplicate_ngram_spans(spark, src).collect()
    }
    assert full == batch and two <= len(full)


def test_stream_spans_redelivery_idempotent(spark, tmp_path):
    """Replaying an already-ingested slice through a FRESH checkpoint
    (same state tables) must not flag a doc's windows against its own
    stored fingerprints or duplicate existing span rows."""
    src = _ordered_slices(spark, tmp_path)
    base = str(tmp_path / "state2")
    first = {
        (r.doc_id, r.start, r.gram_md5)
        for r in sp.stream_duplicate_spans(
            spark, src, glob="documents_*.parquet", max_files_per_trigger=1,
            state_base=base, checkpoint=str(tmp_path / "ck_a"),
        ).collect()
    }
    replay = {
        (r.doc_id, r.start, r.gram_md5)
        for r in sp.stream_duplicate_spans(
            spark, src, glob="documents_0.parquet",
            state_base=base, checkpoint=str(tmp_path / "ck_b"),
        ).collect()
    }
    assert replay == first
