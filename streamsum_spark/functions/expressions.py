"""Reusable Catalyst expression snippets shared by the text / dedup /
similarity operators, with their DuckDB-oracle twins.

Keeping these in one place pins the cross-engine conventions:
- tokenization = regexp whitespace split on trimmed text (note the Spark
  SQL string-literal escaping: one extra backslash level vs DuckDB);
- array folds are sequential left folds over DOUBLE — both engines execute
  the same op order, so results agree bitwise before any rounding.
"""

from __future__ import annotations

# --- tokenization -----------------------------------------------------------

TOKENS_EXPR = "split(trim(text), '\\\\s+')"  # Spark SQL
TOKENS_SQL = r"regexp_split_to_array(trim(text), '\s+')"  # DuckDB


def shingles_expr(n: int, toks: str = TOKENS_EXPR) -> str:
    """Spark: n-word shingles from position 1..size-n+1 (1-based slice).

    Guarded for short documents: Spark's sequence(1, stop) with stop < 1
    generates a DESCENDING list (step defaults to -1), so the unguarded form
    would call slice(toks, 0, n) and throw at runtime — while the DuckDB
    twin's range() yields an empty list.  The CASE keeps both engines at
    "no shingles" for docs shorter than the shingle width.
    """
    return (
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"transform(sequence(1, size({toks}) - {n - 1}), "
        f"i -> array_join(slice({toks}, i, {n}), ' ')) "
        f"ELSE array() END"
    )


def shingles_sql(n: int, toks: str = "toks") -> str:
    """DuckDB twin: inclusive list slicing + exclusive range stop."""
    return (
        f"[array_to_string({toks}[i:i+{n - 1}], ' ') "
        f"FOR i IN range(1, len({toks}) - {n - 2})]"
    )


# --- vector math ------------------------------------------------------------


def dot_expr(a: str, b: str) -> str:
    """Sequential double fold of a.b — matches DuckDB list_dot_product on
    DOUBLE[] operand-for-operand."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def cosine_expr(a: str, b: str, digits: int = 6) -> str:
    """round(cos(a,b), digits): the rounding pins the cross-engine hash
    (residual FP divergence is ~1e-15, grid is 1e-6)."""
    dot = dot_expr(a, b)
    na = dot_expr(a, a)
    nb = dot_expr(b, b)
    return f"round({dot} / (sqrt({na}) * sqrt({nb})), {digits})"


def cosine_safe_expr(a: str, b: str, digits: int = 6) -> str:
    """cosine_expr that tolerates a ZERO vector on either side: the
    cosine is undefined there, and under ANSI mode the bare division
    throws DIVIDE_BY_ZERO — try_divide + coalesce map it to 0.0 (no
    similarity), which is the semantics a dedup/kNN stage wants for a
    degenerate vector (it pairs with nothing).  Identical values to
    cosine_expr for every nonzero pair, so pins built on the unsafe
    form carry over."""
    dot = dot_expr(a, b)
    na = dot_expr(a, a)
    nb = dot_expr(b, b)
    return (
        f"round(coalesce(try_divide({dot}, sqrt({na}) * sqrt({nb})), "
        f"0.0D), {digits})"
    )
