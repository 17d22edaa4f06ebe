#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is MATERIALIZED end-to-end: the timing action is a full-column
xxhash64 checksum aggregation, so every projection/expression in the plan
is actually evaluated (a bare .count() lets Catalyst prune unevaluated
projections, timing only the scan for projection-only queries).

Each query runs THREE times and the minimum is reported: the min is the
standard noise-robust estimator for shared hosts (co-tenant load adds
one-sided noise only — a query can run slower than its true cost, never
faster), and it still includes codegen/JIT compile on run 1, so the
first-run tail is visible in the max but doesn't corrupt round-over-round
comparisons.  (Round-1 numbers were single-shot .count(); rounds 2-4 were
best-of-2 — see README.md for the comparability note.)

The JSON line also records host load (os.getloadavg() sampled before and
after the run) and per-query max-over-min spread, so the per-round BENCH
artifact distinguishes co-tenant noise from real regressions: rounds 3-4
showed ±20-35%% total swing on byte-identical code, which this metadata
makes attributable at a glance.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family (pipeline, caches, read-API, joins,
# aggs, windows, dedup, text, similarity) — kept name-stable across rounds
# for round-over-round comparability.  Names demoted from the declared
# registry (the driver's 50-row CORRECTNESS window) resolve through
# EXTRA below to the same standalone implementations.
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
    # round 6 addition (compare totals to r<=5 minus this entry): the
    # incremental state-table layer — 3 bucketed additive merges + read
    "bucketed_state_merge",
    # round 6: same workload through the snapshot-manifest layer (MVCC
    # pointer-swap commits) — the two sink shapes stay directly comparable
    "snapshot_state_merge",
    # round 7 additions (compare totals to r<=6 minus these two): codec
    # decode through the Arrow batch path, and the MVCC read path —
    # regressions there were previously pytest-visible only
    "multimodal_decode",
    "snapshot_read",
]


def bucketed_state_merge(spark, sf_dir):
    """Headline for the state-sink layer: per-user event counts arriving
    as 3 micro-batch deltas, sum-merged into a fresh 16-bucket state
    table (read + re-reduce + atomic swap of touched buckets per merge,
    per-bucket replay manifests), then read back.  Regressions in the
    bucketed merge path are driver-visible through this entry, not only
    pytest-visible."""
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from streamsum_spark import sinks
    from streamsum_spark.tables import table

    target = os.path.join(
        tempfile.gettempdir(), f"bench_state_{uuid.uuid4().hex[:10]}"
    )
    ev = table(spark, sf_dir, "events")
    for i in range(3):
        deltas = (
            ev.where(F.pmod(F.col("event_id"), F.lit(3)) == i)
            .groupBy(F.col("user_id").alias("k"))
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )
        sinks.accumulate_batch(
            spark, target, deltas, ["k"], ["c"],
            epoch_id=i, run_id="bench", n_buckets=16,
        )
    return sinks.read_state_table(spark, target)


def snapshot_state_merge(spark, sf_dir):
    """Same 3-delta accumulate workload as bucketed_state_merge, through
    the snapshot-manifest layer (snapshots.py): immutable generation
    files + one pointer-swap commit per merge.  Keeping both entries
    makes the cost delta between the two state-table shapes (rename-swap
    vs MVCC manifests) driver-visible round over round."""
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from streamsum_spark import snapshots
    from streamsum_spark.tables import table

    target = os.path.join(
        tempfile.gettempdir(), f"bench_snap_{uuid.uuid4().hex[:10]}"
    )
    ev = table(spark, sf_dir, "events")
    for i in range(3):
        deltas = (
            ev.where(F.pmod(F.col("event_id"), F.lit(3)) == i)
            .groupBy(F.col("user_id").alias("k"))
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )
        snapshots.snapshot_accumulate(
            spark, target, deltas, ["k"], ["c"],
            epoch_id=i, run_id="bench", n_buckets=16,
        )
    return snapshots.read_snapshot(spark, target)


def multimodal_decode(spark, sf_dir):
    """Headline for the codec family: 600 real-format blobs (BMP, PPM,
    PNG across all five row filters, baseline JPEG 4:4:4/4:2:0, PCM WAV)
    through extract_features' mapInPandas decode — pixel/audio stats via
    the spec-built stdlib+numpy decoders.  Blob generation (driver-side
    encoders) is part of the entry, identical every run."""
    from streamsum_spark.operators import multimodal as mm

    return mm.extract_features(mm.synthetic_media(spark, n=600))


_SNAP_READ_CACHE: dict[str, str] = {}


def snapshot_read(spark, sf_dir):
    """Headline for the MVCC READ path: read_snapshot (manifest resolve +
    generation-file scan) plus a 1000-key bucket-pruned
    lookup_snapshot_keys against a prebuilt 3-version snapshot table.
    The build is memoized AND pre-run during warm-up (round 8), so all
    three timed runs — and therefore the spread metric, not just the
    min — measure the pure read cost."""
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from streamsum_spark import snapshots
    from streamsum_spark.tables import table

    target = _SNAP_READ_CACHE.get(sf_dir)
    if target is None:
        target = os.path.join(
            tempfile.gettempdir(), f"bench_snapread_{uuid.uuid4().hex[:10]}"
        )
        ev = table(spark, sf_dir, "events")
        for i in range(3):
            deltas = (
                ev.where(F.pmod(F.col("event_id"), F.lit(3)) == i)
                .groupBy(F.col("user_id").alias("k"))
                .agg(F.count(F.lit(1)).cast("long").alias("c"))
            )
            snapshots.snapshot_accumulate(
                spark, target, deltas, ["k"], ["c"],
                epoch_id=i, run_id="bench_read", n_buckets=16,
            )
        _SNAP_READ_CACHE[sf_dir] = target
    full = snapshots.read_snapshot(spark, target)
    lk = snapshots.lookup_snapshot_keys(
        spark, target, ["k"], [(k,) for k in range(0, 2000, 2)]
    )
    return full.unionByName(lk)


def _materialize(df) -> int:
    """Full-plan checksum: hash every column of every row, XOR-fold.
    Forces evaluation of all projections (unlike count(), which lets
    Catalyst prune them) while collecting only one scalar to the driver;
    bit_xor cannot overflow under ANSI mode."""
    from pyspark.sql import functions as F

    row = df.agg(
        F.expr(
            "bit_xor(xxhash64(" + ", ".join(f"`{c}`" for c in df.columns) + "))"
        ).alias("checksum"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return int(row["n"])


def main() -> None:
    from streamsum_spark.session import get_spark
    from streamsum_spark.entry_queries import QUERIES
    from streamsum_spark.operators import relational as rel
    from streamsum_spark.operators import similarity as sim
    from streamsum_spark.operators import text as tx

    extra = {
        "agg_rollup_nation_region": rel.agg_rollup_nation_region,
        "window_rownum_lastn": rel.window_rownum_lastn,
        "text_token_counts": tx.text_token_counts,
        "similarity_topk": sim.similarity_topk,
        "bucketed_state_merge": bucketed_state_merge,
        "snapshot_state_merge": snapshot_state_merge,
        "multimodal_decode": multimodal_decode,
        "snapshot_read": snapshot_read,
    }

    spark = get_spark("streamsum_spark_bench")
    sf = None
    try:
        sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", ""))
    except ValueError:
        pass

    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    # warm the JVM + parquet footers with one tiny action
    QUERIES["extract_events"](spark, SF_DIR).limit(1).collect()
    # warm the Python-worker pool + Arrow batch path (mapInPandas):
    # daemon fork, pandas import, and Arrow codegen otherwise land in
    # multimodal_decode's first timed run (r7 spread 4.5x was exactly
    # this — JIT noise, not codec cost)
    from streamsum_spark.operators import multimodal as _mm

    _materialize(_mm.extract_features(_mm.synthetic_media(spark, n=8)))
    # pre-build the 600-row media table once: the row build runs the
    # in-repo fixture ENCODERS (now incl. lossy VP8) driver-side and is
    # memoized, so timed runs measure decode throughput, not encoding
    _mm.synthetic_media(spark, n=600)
    # pre-build snapshot_read's 3-version table: its first timed run
    # otherwise carries the one-time build, inflating the spread metric
    # (r7 spread 2.4x) without touching the min
    snapshot_read(spark, SF_DIR).limit(1).collect()

    load_before = os.getloadavg()
    for name in HEADLINE:
        fn = QUERIES.get(name) or extra[name]
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            n = _materialize(fn(spark, SF_DIR))
            runs.append(time.perf_counter() - t0)
            assert n >= 0
        timings[name] = round(min(runs), 3)
        # max/min over the runs: ~1 means a stable host; co-tenant load
        # spikes show up here without touching the min estimator
        spreads[name] = round(max(runs) / max(min(runs), 1e-9), 2)
    load_after = os.getloadavg()
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "runs_per_query": 3,
        "spread": spreads,
        "loadavg_before": [round(x, 2) for x in load_before],
        "loadavg_after": [round(x, 2) for x in load_after],
    }
    # ride-along scale-factor sweep (tools/scale_sweep.py): one sf1.0
    # datapoint per query so the per-round artifact carries scaling
    # SLOPES, not just one scale's absolute times
    sweep_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "BENCH_SF1_SWEEP.json")
    if os.path.exists(sweep_path):
        try:
            with open(sweep_path) as fh:
                out["sf_sweep"] = json.load(fh)
        except (OSError, json.JSONDecodeError):
            pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
