#!/usr/bin/env python
"""Ad-hoc: time the two stream_near_dup headline entries bench-style."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench
from streamsum_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

def main():
    spark = get_spark("measure_ndup")
    bench._sliced_docs(spark, SF_DIR)
    bench._ndup_seed(spark, SF_DIR)
    out = {}
    for name in ("stream_near_dup_pairs_3batch", "stream_near_dup_marginal"):
        fn = bench.extra_queries()[name]
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            bench._materialize(fn(spark, SF_DIR))
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = {"min": min(runs), "runs": runs}
        print(name, out[name], flush=True)
    print(json.dumps(out))

if __name__ == "__main__":
    main()
