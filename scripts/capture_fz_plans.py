#!/usr/bin/env python
"""Capture .explain('formatted') for the frozen finalize's emission and
the streaming near-dup batch relations, with the micro-batch broadcast
hints ON (default) or OFF (--no-bc) — the plan-diff evidence for the
round-15 broadcast-hint work."""
import argparse
import io
import os
import shutil
import sys
import tempfile
import uuid
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

parser = argparse.ArgumentParser()
parser.add_argument("--no-bc", action="store_true")
parser.add_argument("--out", required=True)
args = parser.parse_args()

if args.no_bc:
    os.environ["STREAMSUM_FZ_BC_DELTA_ROWS"] = "0"
    os.environ["STREAMSUM_NDUP_BC_ROWS"] = "0"

import bench  # noqa: E402
from streamsum_spark.session import get_spark  # noqa: E402
from streamsum_spark.corpus_prep import (  # noqa: E402
    stream_corpus_prep_ingest,
    stream_corpus_prep_stages,
)

SF_DIR = os.environ["SPARK_GRAFT_SF_DIR"]
spark = get_spark("capture_fz_plans")
spark.sparkContext.setLogLevel("ERROR")

src = bench._warc_corpus(spark, SF_DIR)
seed = bench._cprep_frozen_seed(spark, SF_DIR)
run = os.path.join(tempfile.gettempdir(), f"fzplan_{uuid.uuid4().hex[:8]}")
shutil.copytree(seed, run)
stream_corpus_prep_ingest(
    spark, src, glob="warc-*.warc.gz",
    state_base=os.path.join(run, "state"),
    checkpoint=os.path.join(run, "ckpt"),
)
stages = stream_corpus_prep_stages(
    spark, os.path.join(run, "state"), mode="frozen",
    domain_cap=50, n_lists=8,
    cache_token=f"fzplan:{uuid.uuid4().hex[:6]}",
)
buf = io.StringIO()
with redirect_stdout(buf):
    print("==== frozen packed_delta ====")
    stages["packed_delta"].explain("formatted")
with open(args.out, "w") as fh:
    fh.write(buf.getvalue())
shutil.rmtree(run, ignore_errors=True)
print("wrote", args.out)
