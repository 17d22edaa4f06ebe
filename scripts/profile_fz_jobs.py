#!/usr/bin/env python
"""Ad-hoc: one frozen marginal cycle with the UI enabled; dump every
Spark job's duration + call site from the REST API, slowest first."""
import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import SparkSession  # noqa: E402

import bench  # noqa: E402
from streamsum_spark.corpus_prep import (  # noqa: E402
    stream_corpus_prep_ingest,
    stream_corpus_prep_stages,
)

SF_DIR = os.environ["SPARK_GRAFT_SF_DIR"]


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile_fz_jobs")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    src = bench._warc_corpus(spark, SF_DIR)
    seed = bench._cprep_frozen_seed(spark, SF_DIR)
    run = os.path.join(tempfile.gettempdir(), f"profj_{uuid.uuid4().hex[:8]}")
    shutil.copytree(seed, run)
    app_id = spark.sparkContext.applicationId
    jobs_before = json.load(
        urllib.request.urlopen(
            f"http://localhost:4049/api/v1/applications/{app_id}/jobs"
        )
    )
    first = max((j["jobId"] for j in jobs_before), default=-1) + 1
    t0 = time.perf_counter()
    base = stream_corpus_prep_ingest(
        spark, src, glob="warc-*.warc.gz",
        state_base=os.path.join(run, "state"),
        checkpoint=os.path.join(run, "ckpt"),
    )
    t1 = time.perf_counter()
    stages = stream_corpus_prep_stages(
        spark, base, mode="frozen", domain_cap=50, n_lists=8,
        cache_token="profj",
    )
    t2 = time.perf_counter()
    bench._materialize(stages["packed_delta"])
    t3 = time.perf_counter()
    print(json.dumps({"ingest": round(t1 - t0, 3),
                      "finalize": round(t2 - t1, 3),
                      "materialize": round(t3 - t2, 3)}), flush=True)
    jobs = json.load(
        urllib.request.urlopen(
            f"http://localhost:4049/api/v1/applications/{app_id}/jobs?limit=1000"
        )
    )
    mine = [j for j in jobs if j["jobId"] >= first]
    from datetime import datetime

    def dur(j):
        f = "%Y-%m-%dT%H:%M:%S.%f%Z"
        try:
            a = datetime.strptime(j["submissionTime"], f)
            b = datetime.strptime(j["completionTime"], f)
            return (b - a).total_seconds()
        except Exception:
            return -1.0

    rows = sorted(((dur(j), j) for j in mine), key=lambda x: -x[0])
    tot = sum(d for d, _ in rows if d > 0)
    print(f"jobs={len(mine)} sum_job_wall={tot:.2f}s (overlap not removed)")
    for d, j in rows[:45]:
        name = (j.get("name") or "")[:110].replace("\n", " ")
        print(f"{d:7.3f}s  id={j['jobId']:4d} stages={len(j.get('stageIds', []))} tasks={j.get('numTasks', 0):4d}  {name}")
    shutil.rmtree(run, ignore_errors=True)


if __name__ == "__main__":
    main()
