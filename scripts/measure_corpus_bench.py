#!/usr/bin/env python
"""Ad-hoc: time the three corpus-funnel headline entries at sf0.1 the
same way bench.py does (prewarm seeds, 3 runs, min) — the three-way
cost comparison the r14 verdict's top order is graded on."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from streamsum_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NAMES = [
    "corpus_prep_e2e",
    "stream_corpus_prep_marginal",
    "stream_corpus_prep_frozen_marginal",
]


def main():
    spark = get_spark("measure_corpus_bench")
    extra = bench.extra_queries()
    # seeds (untimed, same as bench prewarm)
    bench._warc_corpus(spark, SF_DIR)
    bench._cprep_seed(spark, SF_DIR)
    bench._cprep_frozen_seed(spark, SF_DIR)
    out = {}
    for name in NAMES:
        fn = extra[name]
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            bench._materialize(fn(spark, SF_DIR))
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = {"min": min(runs), "runs": runs}
        print(name, out[name], flush=True)
    try:
        from streamsum_spark.corpus_prep import LAST_FROZEN_PHASE_SECONDS

        print("frozen phases:", json.dumps(LAST_FROZEN_PHASE_SECONDS))
    except Exception:
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
