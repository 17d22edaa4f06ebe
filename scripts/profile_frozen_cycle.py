#!/usr/bin/env python
"""Ad-hoc: split one frozen marginal cycle at sf0.1 into ingest /
finalize / materialize wall-clock, plus the finalize's phase marks."""
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
    LAST_FROZEN_PHASE_JOBS,
    LAST_FROZEN_PHASE_SECONDS,
    stream_corpus_prep_ingest,
    stream_corpus_prep_stages,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    spark = get_spark("profile_frozen_cycle")
    src = bench._warc_corpus(spark, SF_DIR)
    seed = bench._cprep_frozen_seed(spark, SF_DIR)
    for it in range(2):
        run = os.path.join(
            tempfile.gettempdir(), f"prof_fz_{uuid.uuid4().hex[:8]}"
        )
        shutil.copytree(seed, run)
        t0 = time.perf_counter()
        base = stream_corpus_prep_ingest(
            spark, src, glob="warc-*.warc.gz",
            state_base=os.path.join(run, "state"),
            checkpoint=os.path.join(run, "ckpt"),
        )
        t1 = time.perf_counter()
        stages = stream_corpus_prep_stages(
            spark, base, mode="frozen", domain_cap=50, n_lists=8,
            cache_token=f"prof_fz:{it}",
        )
        t2 = time.perf_counter()
        bench._materialize(stages["packed_delta"])
        t3 = time.perf_counter()
        print(
            json.dumps(
                {
                    "iter": it,
                    "ingest": round(t1 - t0, 3),
                    "finalize": round(t2 - t1, 3),
                    "materialize": round(t3 - t2, 3),
                    "phases": dict(LAST_FROZEN_PHASE_SECONDS),
                    "jobs": dict(LAST_FROZEN_PHASE_JOBS),
                }
            ),
            flush=True,
        )
        shutil.rmtree(run, ignore_errors=True)


if __name__ == "__main__":
    main()
