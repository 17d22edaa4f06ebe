#!/usr/bin/env python
"""Dump .explain("formatted") for every declared query (and the
bench-only composites that take (spark, sf_dir)) to plans/r15/<name>_<tag>.txt.

Usage: python scripts/capture_plans.py <tag> [name ...]
  tag: "before" / "after"
  name: optional subset; default = all declared queries + cheap extras.

Composite bench entries that mutate state (stream_*, snapshot/bucketed
merges) are excluded: their cost is a sequence of jobs, not one plan —
their evidence lives in the phase profiles instead.
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r15")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    os.makedirs(OUT, exist_ok=True)

    from streamsum_spark.entry_queries import QUERIES
    from streamsum_spark.session import get_spark

    spark = get_spark("capture_plans")

    import bench

    extra = {
        k: v
        for k, v in bench.extra_queries().items()
        if k in (
            "agg_rollup_nation_region", "window_rownum_lastn",
            "text_token_counts", "similarity_topk",
            "near_dup_verified_cap100", "dedup_corpus", "heavy_hitters_mg",
            "warc_read_text", "near_dup_tuned05", "classifier_train_score",
            "corpus_prep_e2e",
        )
    }
    names = dict(QUERIES)
    names.update(extra)
    for name, fn in sorted(names.items()):
        if only and name not in only:
            continue
        try:
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 - record, keep going
            text = f"ERROR capturing plan: {exc!r}\n"
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} chars)", flush=True)


if __name__ == "__main__":
    main()
