"""Exact-gap boundary pin for sessionization.

Spark's session_window MERGES an event arriving at exactly
prev_ts + gap (verified empirically: two events 5:00 apart form ONE
session), i.e. the merge condition is next_ts <= prev_ts + gap — so the
gaps-and-islands oracle's ``<= INTERVAL 5 MINUTE`` is the correct
boundary (changing it to ``<`` would diverge on exact-gap data, which is
measure-zero on the synthetic microsecond timestamps and only a fixture
can pin).
"""

from __future__ import annotations

import os

import pytest

from streamsum_spark.operators import relational as rel
from tests.conftest import assert_matches_oracle

# (event_id, ts, user_id): exact 5-min gap / just under / just over
_ROWS = [
    (1, "2024-01-01 00:00:00", 1),
    (2, "2024-01-01 00:05:00", 1),  # exactly prev + gap -> MERGES
    (3, "2024-01-01 00:00:00", 2),
    (4, "2024-01-01 00:04:59", 2),  # under the gap -> merges
    (5, "2024-01-01 00:00:00", 3),
    (6, "2024-01-01 00:05:01", 3),  # over the gap -> splits
]


@pytest.fixture(scope="module")
def gap_sf_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("gap_events")
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in _ROWS], pa.int64()),
            # timestamp[ns] -> parquet TIMESTAMP(NANOS), matching the real
            # events table (and exercising the nanosAsLong read path)
            "ts": pa.array(
                [__import__("datetime").datetime.fromisoformat(r[1]) for r in _ROWS],
                pa.timestamp("ns"),
            ),
            "user_id": pa.array([r[2] for r in _ROWS], pa.int64()),
            "event_type": pa.array(["click"] * len(_ROWS), pa.string()),
            "value": pa.array([1.0] * len(_ROWS), pa.float64()),
            "props": pa.array(['{"k": 1}'] * len(_ROWS), pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(str(d), "events.parquet"))
    return str(d)


def test_exact_gap_merges_and_oracle_agrees(spark, gap_sf_dir):
    sessions = sorted(
        (r.user_id, r.n_events)
        for r in rel.sessionize_events(spark, gap_sf_dir).collect()
    )
    assert sessions == [(1, 2), (2, 2), (3, 1), (3, 1)]
    assert_matches_oracle(spark, rel.sessionize_events, rel.SESSIONIZE_SQL, gap_sf_dir)
