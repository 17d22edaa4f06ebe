"""Shared expression builders (JVM-side, codegen-friendly)."""

from streamsum_spark.functions.expressions import (  # noqa: F401
    TOKENS_EXPR,
    TOKENS_SQL,
    cosine_expr,
    dot_expr,
    shingles_expr,
    shingles_sql,
)
