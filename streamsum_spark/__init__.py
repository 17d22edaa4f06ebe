"""streamsum_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of michaelrkytch/streamsum.

The reference (/root/reference, Clojure+Java) is a configuration-driven
event-stream summarizer: extract -> pattern transform -> named KV caches
(last-value / last-N / count) -> a count-cache query API.  This package
re-expresses that surface on Spark DataFrames / SQL / Structured Streaming,
and extends it with the relational + LLM-data-pipeline operators needed at
100 TB scale (joins, windows, rollups, dedup, similarity search, text
analysis, multimodal plumbing).

Design rules (see SURVEY.md):
- DataFrame/SQL first; Catalyst does pushdown/pruning/join strategy.
- No per-row Python UDFs on hot paths; pandas only for genuinely stateful
  folds (streaming exact lastn / clamped decrement).
- Deterministic arrival order is ``(ts, event_id)`` so batch, streaming and
  the DuckDB oracle agree.
"""

__version__ = "0.1.0"

from streamsum_spark.session import get_spark  # noqa: F401
from streamsum_spark.tables import TABLES, load_tables  # noqa: F401
