#!/usr/bin/env python
"""Minimal repro: does an explicit-schema parquet re-read serve a stale
CacheManager entry after the files changed, where an inferred read does
not?  And does spark.catalog.refreshByPath fix it?"""
import os
import shutil
import sys
import tempfile
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamsum_spark.session import get_spark

spark = get_spark("repro_stale_cache")

d = os.path.join(tempfile.gettempdir(), f"stale_{uuid.uuid4().hex[:8]}")


def write(vals):
    tmp = d + ".tmp"
    spark.createDataFrame([(v,) for v in vals], "x int").coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    if os.path.exists(d):
        aside = d + ".aside"
        os.rename(d, aside)
        os.rename(tmp, d)
        shutil.rmtree(aside)
    else:
        os.rename(tmp, d)


for label, use_schema in (("inferred", False), ("explicit", True)):
    spark.catalog.clearCache()
    write([1, 2, 3])
    reader = spark.read.schema("x int") if use_schema else spark.read
    df1 = reader.parquet(d).groupBy().sum("x")
    df1.persist()
    n1 = df1.collect()[0][0]
    write([10, 20, 30, 40])
    reader = spark.read.schema("x int") if use_schema else spark.read
    df2 = reader.parquet(d).groupBy().sum("x")
    n2 = df2.collect()[0][0]
    # now with refreshByPath
    spark.catalog.refreshByPath(d)
    reader = spark.read.schema("x int") if use_schema else spark.read
    n3 = reader.parquet(d).groupBy().sum("x").collect()[0][0]
    print(
        f"{label}: first={n1} after-rewrite={n2} "
        f"(stale={'YES' if n2 == n1 else 'no'}) after-refresh={n3}",
        flush=True,
    )
    df1.unpersist()

shutil.rmtree(d, ignore_errors=True)
spark.stop()
