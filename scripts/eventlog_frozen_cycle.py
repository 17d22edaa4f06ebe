#!/usr/bin/env python
"""Ad-hoc: run one frozen marginal cycle with spark.eventLog enabled and
print per-job callsite + duration aggregation from the event log."""
import collections
import glob
import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = tempfile.mkdtemp(prefix="spark_events_")
os.environ["SPARK_GRAFT_EVENTLOG"] = EVDIR

from pyspark.sql import SparkSession  # noqa: E402

cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("eventlog_frozen")
    .config("spark.sql.shuffle.partitions", str(cpus))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.driver.memory", "16g")
    .config("spark.ui.enabled", "false")
    .config("spark.eventLog.enabled", "true")
    .config("spark.eventLog.dir", EVDIR)
    .config("spark.eventLog.compress", "false")
    .config("spark.eventLog.rolling.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")

import bench  # noqa: E402
from streamsum_spark.corpus_prep import (  # noqa: E402
    stream_corpus_prep_ingest,
    stream_corpus_prep_stages,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

SECTION = {"name": "seed"}
marks = []  # (t, section)


def set_section(name):
    SECTION["name"] = name
    marks.append((time.time(), name))


src = bench._warc_corpus(spark, SF_DIR)
seed = bench._cprep_frozen_seed(spark, SF_DIR)
run = os.path.join(tempfile.gettempdir(), f"ev_fz_{uuid.uuid4().hex[:8]}")
shutil.copytree(seed, run)
set_section("ingest")
base = stream_corpus_prep_ingest(
    spark, src, glob="warc-*.warc.gz",
    state_base=os.path.join(run, "state"),
    checkpoint=os.path.join(run, "ckpt"),
)
set_section("finalize")
stages = stream_corpus_prep_stages(
    spark, base, mode="frozen", domain_cap=50, n_lists=8,
    cache_token="ev_fz",
)
set_section("materialize")
bench._materialize(stages["packed_delta"])
set_section("done")
spark.stop()
shutil.rmtree(run, ignore_errors=True)

# parse the event log
logf = sorted(glob.glob(os.path.join(EVDIR, "*")))[-1]
if os.path.isdir(logf):  # Spark 4 rolling event log dir
    parts = sorted(
        p for p in glob.glob(os.path.join(logf, "events_*"))
        if os.path.isfile(p)
    )
else:
    parts = [logf]
jobs = {}
rows = []


def _lines():
    for p in parts:
        with open(p) as fh:
            yield from fh


if True:
    for line in _lines():
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        if ev.get("Event") == "SparkListenerJobStart":
            jid = ev["Job ID"]
            props = ev.get("Properties") or {}
            site = props.get("callSite.short", "?")
            if site == "?":
                # fall back to the repo frame in a stage's details
                for st in ev.get("Stage Infos") or []:
                    det = st.get("Details", "")
                    m = [ln for ln in det.splitlines()
                         if "streamsum_spark" in ln or "corpus_prep" in ln
                         or "bench.py" in ln]
                    if m:
                        site = m[0].strip()[:110]
                        break
                    nm = st.get("Stage Name", "")
                    if nm:
                        site = "stage:" + nm[:90]
            jobs[jid] = {
                "start": ev["Submission Time"],
                "site": site,
                "desc": props.get("spark.job.description", ""),
            }
        elif ev.get("Event") == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in jobs:
                j = jobs[jid]
                j["dur"] = (ev["Completion Time"] - j["start"]) / 1000.0
                rows.append(j)

# assign each job to the section active at its start
marks_s = [(int(t * 1000), n) for t, n in marks]


def section_of(ms):
    cur = "seed"
    for t, n in marks_s:
        if ms >= t:
            cur = n
        else:
            break
    return cur


agg = collections.defaultdict(lambda: [0, 0.0])
for j in rows:
    sec = section_of(j["start"])
    key = (sec, j["site"])
    agg[key][0] += 1
    agg[key][1] += j.get("dur", 0.0)

for (sec, site), (n, dur) in sorted(agg.items(), key=lambda kv: -kv[1][1]):
    if sec == "seed":
        continue
    print(f"{dur:8.2f}s  n={n:<4d} {sec:12s} {site}")
tot = collections.defaultdict(lambda: [0, 0.0])
for j in rows:
    sec = section_of(j["start"])
    tot[sec][0] += 1
    tot[sec][1] += j.get("dur", 0.0)
print("---- totals (sum of job durations; overlap not deducted)")
for sec, (n, dur) in tot.items():
    print(f"{dur:8.2f}s  n={n:<4d} {sec}")
import pickle
with open("/tmp/ev_fz_rows.pkl","wb") as fh:
    pickle.dump((rows, marks_s), fh)
print("EVDIR kept:", EVDIR)
