"""Physical-plan predicates over ``df.explain`` output.

These are string-level checks by design: the formatted plan is the stable
public surface Spark exposes, and the properties asserted (PushedFilters,
BroadcastHashJoin, WindowGroupLimit, partial HashAggregate) are exactly the
scale-critical ones — a regression in any of them multiplies IO or shuffle
at 100 TB long before it shows up in a small-SF benchmark.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def has_pushed_filters(df: DataFrame, *fragments: str) -> bool:
    """True if the parquet scan carries PushedFilters mentioning every
    fragment (e.g. a column name whose predicate must reach the scan)."""
    plan = explain_str(df)
    m = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    pushed = " ".join(m)
    return bool(m) and all(f in pushed for f in fragments)


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (column pruning check)."""
    plan = explain_str(df)
    cols: list[str] = []
    for m in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
        cols.extend(p.split(":")[0].strip() for p in m.split(",") if p.strip())
    return sorted(set(cols))


def has_broadcast_join(df: DataFrame) -> bool:
    """Any broadcast strategy: hash join for equi-keys, nested-loop for
    keyless probe joins (a 1-row broadcast cross join is the right plan)."""
    plan = explain_str(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def has_window_group_limit(df: DataFrame) -> bool:
    return "WindowGroupLimit" in explain_str(df)


def has_partial_aggregate(df: DataFrame) -> bool:
    """Partial+final hash aggregation (map-side combine before shuffle)."""
    plan = explain_str(df)
    return "HashAggregate" in plan and "partial_" in plan.lower()


def nodes_with(df: DataFrame, token: str) -> int:
    """How many DISTINCT formatted-plan node sections mention ``token``
    — the granularity that survives expression-tree repetition (one
    node's text repeats a subexpression many times, but one projection
    is one node) AND print duplication (a cached InMemoryRelation's
    child plan prints once per reference with the same expression ids,
    so identical bodies collapse to one).  Used e.g. to pin that a
    composed pipeline parses each URL column in exactly one projection
    (token 'ParseUrlEvaluator', the physical rendering of
    try_parse_url)."""
    plan = explain_str(df)
    return len(
        {sec for sec in re.split(r"\n\(\d+\) ", plan) if token in sec}
    )


def scan_runtime_metrics(df: DataFrame) -> list[dict]:
    """EXECUTE ``df`` and return one {metric_name: value} dict per
    file-scan node of the executed plan — the runtime evidence of what
    a query actually READ (numFiles, numOutputRows, filesSize...).

    ``numOutputRows`` on a parquet scan counts rows the reader
    MATERIALIZED after row-group/page statistics skipping, which is the
    read-path proof data-skipping layouts (zorder.py) need: plain Spark
    opens every file's footer (no file-level stats pruning — that is a
    Delta/Iceberg table-format feature) but skips row groups and pages
    whose min/max exclude the pushed predicate, so scanned-row counts
    are where clustering shows up at runtime.  Classic (non-Connect)
    sessions only — py4j traversal of the executed plan."""
    df.collect()
    out: list[dict] = []

    def walk(node) -> None:
        name = node.getClass().getSimpleName()
        if name.startswith(("FileSourceScan", "BatchScan")):
            m: dict = {}
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                m[kv._1()] = kv._2().value()
            out.append(m)
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))
        if "AdaptiveSparkPlan" in name:
            walk(node.executedPlan())
        elif name.endswith("QueryStageExec"):
            walk(node.plan())

    walk(df._jdf.queryExecution().executedPlan())
    return out
