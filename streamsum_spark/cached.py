"""Session-bounded persist registry for shared intermediate relations.

Several composite operators persist() a relation consumed by multiple
subtrees (Catalyst does not reuse exchanges across aliased self-join
subtrees, so without materialization the corpus would be recomputed per
consumer).  Left untracked, repeated invocations in one session
accumulate MEMORY_AND_DISK blocks indefinitely.

``shared_persist(key, df)`` bounds that: at most ONE persisted relation
lives per logical key — persisting under a key evicts (unpersists) the
previous holder.  Eviction is correctness-safe by construction: Spark
recomputes an unpersisted DataFrame from lineage, so a stale handle still
returns right answers, it just loses the cache.  ``release_shared()``
drops everything (tests and long sessions call it between phases).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_TRACKED: dict[tuple, DataFrame] = {}


def shared_persist(
    key: tuple,
    df: DataFrame,
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """Persist ``df`` under ``key``, evicting any previous relation
    persisted under the same key.  Keys are (operator, args...) tuples, so
    re-running an operator replaces its cached intermediates instead of
    leaking a new copy per call."""
    old = _TRACKED.pop(key, None)
    if old is not None:
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass  # a dead SparkSession just means there is nothing to free
    out = df.persist(level)
    _TRACKED[key] = out
    return out


def peek_shared(key: tuple, spark=None) -> DataFrame | None:
    """The relation currently persisted under ``key``, or None.  For
    IMMUTABLE inputs (a frozen model's parquet) this lets repeated calls
    in one process reuse the already-materialized blocks instead of
    evict-and-repersist (shared_persist always replaces).  Pass the
    live ``spark`` to reject a handle from a stopped session."""
    df = _TRACKED.get(key)
    if df is not None and spark is not None:
        try:
            if df.sparkSession is not spark:
                return None
        except Exception:
            return None
    return df


def release_shared(prefix: str | None = None) -> int:
    """Unpersist every tracked relation (or only keys whose first element
    equals ``prefix``); returns how many were released."""
    hit = [k for k in _TRACKED if prefix is None or k[0] == prefix]
    for k in hit:
        try:
            _TRACKED.pop(k).unpersist(blocking=False)
        except Exception:
            pass
    return len(hit)
