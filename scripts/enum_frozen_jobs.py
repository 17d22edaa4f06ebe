#!/usr/bin/env python
"""Ad-hoc: enumerate per-job durations for one frozen marginal cycle
via a SparkListener bridge (UI is disabled in the standard session)."""
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from streamsum_spark.session import get_spark  # noqa: E402
from streamsum_spark import corpus_prep as cp  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark("job_enum")
sc = spark.sparkContext
tracker = sc.statusTracker()
src = bench._warc_corpus(spark, SF_DIR)
seed = bench._cprep_frozen_seed(spark, SF_DIR)


def run_cycle(token):
    run = os.path.join(tempfile.gettempdir(), f"je_{uuid.uuid4().hex[:8]}")
    shutil.copytree(seed, run)
    base = cp.stream_corpus_prep_ingest(
        spark, src, glob="warc-*.warc.gz",
        state_base=os.path.join(run, "state"),
        checkpoint=os.path.join(run, "ckpt"),
    )
    jmid = sc._jsc.sc().dagScheduler().nextJobId()
    cp.stream_corpus_prep_stages(
        spark, base, mode="frozen", domain_cap=50, n_lists=8,
        cache_token=token,
    )
    shutil.rmtree(run, ignore_errors=True)
    return jmid


run_cycle("je:w")  # warm
j0 = sc._jsc.sc().dagScheduler().nextJobId()
t0 = time.perf_counter()
jmid = run_cycle("je:m")
t1 = time.perf_counter()
j1 = sc._jsc.sc().dagScheduler().nextJobId()

appstatus = sc._jsc.sc().statusStore()
tot = 0.0
rows = []
for jid in range(j0, j1):
    try:
        j = appstatus.job(jid)
        dur = (j.completionTime().get().getTime() - j.submissionTime().get().getTime()) / 1000.0
        name = j.name()
        ntasks = j.numTasks()
    except Exception as e:
        rows.append((jid, -1.0, 0, f"<err {e}>"))
        continue
    tot += dur
    rows.append((jid, dur, ntasks, name))
rows.sort(key=lambda r: -r[1])
for jid, dur, ntasks, name in rows[:45]:
    seg = "ING" if jid < jmid else "FIN"
    print(f"JOB {seg} {jid} {dur:6.2f}s tasks={ntasks:4d} {str(name)[:130]}", flush=True)
print(f"TOT wall={t1 - t0:.2f} sum_job_dur={tot:.2f} njobs={j1 - j0}")
spark.stop()
