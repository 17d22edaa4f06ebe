"""Source abstractions (A1): batch parquet, streaming file source, and an
in-memory feed for tests."""

from streamsum_spark.sources.events import (  # noqa: F401
    batch_events,
    memory_events,
    stream_events,
)
