"""Plan inspection helpers (SURVEY.md §4): assert that Catalyst produced
the physical plan we designed for — pushdown reached the scan, dimension
joins broadcast, rank filters became WindowGroupLimit, aggregates have a
map-side partial phase.  Used by tests/test_plan_shapes.py as performance
regression guards."""

from streamsum_spark.plans.inspect import (  # noqa: F401
    explain_str,
    has_broadcast_join,
    has_partial_aggregate,
    has_pushed_filters,
    has_window_group_limit,
    read_schema_columns,
)
