"""A2 Extract — event object -> [pred subj obj ts] 4-tuple.

Reference: the ``Extract`` protocol destructures an event into a 4-tuple;
vectors pass through; nil / non-extractable events are silently dropped
(/root/reference/src-clj/streamsum/protocols.clj:7-9,
/root/reference/src-clj/streamsum/system.clj:58-61, 75-76).

Spark form: a projection + null/malformed filter over the source DataFrame.
For the driver's ``events`` table the mapping (FIXTURES.md §F4) is
``pred := event_type, subj := user_id, obj := props->'k', ts := ts`` with
``seq := event_id`` as the deterministic arrival order (SURVEY.md §4.2.3).
All of this is JVM-side (get_json_object + casts) and the projection prunes
the parquet scan to the used columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TUPLE_COLS = ("pred", "subj", "obj", "ts", "seq")


def extract_events(events: DataFrame) -> DataFrame:
    """Project raw events to the canonical 4-tuple (+ seq) schema.

    Subjects/objects are canonicalized to STRING (SURVEY.md §1.2 — the
    reference treats them as opaque Objects; a concrete type keeps grouping
    and oracle hashing deterministic).  Rows missing any of pred/subj/ts or
    with unparseable props are dropped — the reference's "silently filter
    non-extractable" semantics (system.clj:75).
    """
    return (
        events.select(
            F.col("event_type").alias("pred"),
            F.col("user_id").cast("string").alias("subj"),
            F.get_json_object(F.col("props"), "$.k").alias("obj"),
            F.col("ts"),
            F.col("event_id").alias("seq"),
        )
        .where(
            F.col("pred").isNotNull()
            & F.col("subj").isNotNull()
            & F.col("obj").isNotNull()
            & F.col("ts").isNotNull()
        )
    )


EXTRACT_ORACLE_SQL = """
SELECT
    event_type AS pred,
    CAST(user_id AS VARCHAR) AS subj,
    json_extract_string(props, '$.k') AS obj,
    ts,
    event_id AS seq
FROM events
WHERE event_type IS NOT NULL
  AND user_id IS NOT NULL
  AND json_extract_string(props, '$.k') IS NOT NULL
  AND ts IS NOT NULL
"""
