"""A3 Transform — pattern-match fan-out: one [p s o t] -> 0..n cache-mapped
tuples [cache_key key val t].

Reference: core.match patterns applied via ``mapcat``
(/root/reference/src-clj/streamsum/system.clj:17-30, 78); an event matching
no pattern yields zero tuples; example patterns at
/root/reference/example/streamsum/config.clj:7-21.

Spark form: ONE scan -> ``explode`` of a CASE-built array of structs.  This
is a stateless narrow operator (no shuffle), stays inside whole-stage
codegen, and drops non-matching rows for free (explode of an empty/null
array emits nothing) — exactly the reference's "no match => empty seq".
A UNION-of-selects formulation would rescan the source once per pattern;
at 100 TB that multiplies scan cost, so we don't.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from streamsum_spark.config import DEFAULT_CONFIG, PipelineConfig

CACHE_TUPLE_COLS = ("cache_key", "k", "action", "v", "ts", "seq")


def _pattern_array(cfg: PipelineConfig) -> Column:
    """CASE WHEN pred = p THEN array(struct...) ... ELSE NULL (→ 0 rows)."""
    expr: Column | None = None
    for pat in cfg.patterns:
        outs = F.array(
            *[
                F.struct(
                    F.lit(t.cache).alias("cache_key"),
                    F.col(t.key_field).alias("k"),
                    (F.lit(t.action) if t.action is not None else F.lit(None).cast("string")).alias(
                        "action"
                    ),
                    F.col(t.val_field).alias("v"),
                )
                for t in pat.outputs
            ]
        )
        expr = F.when(F.col("pred") == pat.pred, outs) if expr is None else expr.when(
            F.col("pred") == pat.pred, outs
        )
    assert expr is not None, "config must declare at least one pattern"
    return expr


def transform_fanout(tuples: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Fan a 4-tuple DataFrame out to cache-mapped tuples.

    Output schema: (cache_key, k, action, v, ts, seq).  ``action`` is NULL
    except for count-shaped outputs, where the reference nests ``[action
    obj]`` in the value slot (doc/tuple-counts.md:25) — we carry it as a
    flat column (SURVEY.md §1.1).
    """
    return tuples.select(
        F.explode(_pattern_array(cfg)).alias("t"), F.col("ts"), F.col("seq")
    ).select("t.cache_key", "t.k", "t.action", "t.v", "ts", "seq")


def transform_oracle_sql(cfg: PipelineConfig = DEFAULT_CONFIG, tuples_cte: str = "tuples") -> str:
    """DuckDB-equivalent UNION ALL of per-pattern selects.

    (The oracle favors clarity over scan count; the engine itself uses the
    single-scan explode form.)
    """
    selects = []
    for pat in cfg.patterns:
        for t in pat.outputs:
            action = f"'{t.action}'" if t.action is not None else "CAST(NULL AS VARCHAR)"
            selects.append(
                f"SELECT '{t.cache}' AS cache_key, {t.key_field} AS k, "
                f"{action} AS action, {t.val_field} AS v, ts, seq "
                f"FROM {tuples_cte} WHERE pred = '{pat.pred}'"
            )
    return "\nUNION ALL\n".join(selects)
