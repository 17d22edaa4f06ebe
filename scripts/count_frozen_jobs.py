#!/usr/bin/env python
"""Ad-hoc: count Spark jobs per section of one frozen marginal cycle."""
import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from streamsum_spark.session import get_spark  # noqa: E402
from streamsum_spark.corpus_prep import (  # noqa: E402
    LAST_FROZEN_PHASE_SECONDS,
    stream_corpus_prep_ingest,
    stream_corpus_prep_stages,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    spark = get_spark("count_frozen_jobs")
    sc = spark.sparkContext
    src = bench._warc_corpus(spark, SF_DIR)
    seed = bench._cprep_frozen_seed(spark, SF_DIR)
    run = os.path.join(tempfile.gettempdir(), f"cnt_fz_{uuid.uuid4().hex[:8]}")
    shutil.copytree(seed, run)

    def njobs():
        return sc._jsc.sc().dagScheduler().nextJobId()

    counts = {}
    j0, t0 = njobs(), time.perf_counter()
    base = stream_corpus_prep_ingest(
        spark, src, glob="warc-*.warc.gz",
        state_base=os.path.join(run, "state"),
        checkpoint=os.path.join(run, "ckpt"),
    )
    j1, t1 = njobs(), time.perf_counter()
    counts["ingest"] = {"jobs": j1 - j0, "sec": round(t1 - t0, 2)}
    stages = stream_corpus_prep_stages(
        spark, base, mode="frozen", domain_cap=50, n_lists=8,
        cache_token="cnt_fz",
    )
    j2, t2 = njobs(), time.perf_counter()
    counts["finalize"] = {"jobs": j2 - j1, "sec": round(t2 - t1, 2)}
    bench._materialize(stages["packed"])
    j3, t3 = njobs(), time.perf_counter()
    counts["materialize"] = {"jobs": j3 - j2, "sec": round(t3 - t2, 2)}
    counts["phases"] = dict(LAST_FROZEN_PHASE_SECONDS)
    from streamsum_spark.corpus_prep import LAST_FROZEN_PHASE_JOBS
    counts["phase_jobs"] = dict(LAST_FROZEN_PHASE_JOBS)
    print(json.dumps(counts))
    shutil.rmtree(run, ignore_errors=True)


if __name__ == "__main__":
    main()
# per-phase jobs appended by _mark instrumentation
