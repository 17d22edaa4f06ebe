"""Z-order (Morton) clustering for multi-column data skipping — the
layout optimization a 100 TB table needs when queries filter on MORE
than one column: sorting by (a, b) skips perfectly on ``a`` and not at
all on ``b``, while interleaving the bits of both ranks gives every
filtered column row-group min/max ranges a fraction of the domain, so
parquet statistics prune files/row-groups for ANY of them (the
technique Delta/Iceberg expose as OPTIMIZE ZORDER BY).

Everything is expression-level:

1. per-column affine rank — (col − min) / (max − min) scaled to
   ``bits``-bit integers.  min/max come from ONE tiny aggregate (two
   values per column — the only driver data); nulls rank 0 (they sort
   first, exactly like a plain sort layout).
2. bit interleave via an ``aggregate(sequence(...))`` fold — a 64-bit
   Morton code, no UDF.
3. ``repartitionByRange`` on the code (the global range exchange IS
   the clustering cost — one shuffle, same as any sort-based OPTIMIZE)
   + ``sortWithinPartitions`` so row-group statistics inside each file
   are tight too.

Column contract: numeric/timestamp-castable (Z-ordering a string's
hash has no range locality — honest ValueError).  Effectiveness is
pinned in tests/test_zorder.py by reading the written files' parquet
statistics: per-file [min, max] spans shrink to a fraction of the
domain on EVERY z-ordered column, and range predicates on the column
a 1-D sort does NOT cover prune files the sorted layout must read —
that second-column skipping is Z-order's claim (on its own column a
1-D sort at the same file count has finer resolution; Z-order trades
a little of that for skippability on all clustered columns)."""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType, T.TimestampType, T.DateType,
)


def _as_double(col: str, dtype: T.DataType) -> Column:
    if isinstance(dtype, (T.TimestampType, T.DateType)):
        return F.col(col).cast("timestamp").cast("double")
    return F.col(col).cast("double")



def _validate(df: DataFrame, cols: list[str]) -> dict:
    if not cols:
        raise ValueError("need at least one column")
    dtypes = dict(df.dtypes)
    schema = {f.name: f.dataType for f in df.schema.fields}
    for c in cols:
        if c not in schema:
            raise ValueError(f"no such column: {c}")
        if not isinstance(schema[c], _NUMERIC):
            raise ValueError(
                f"z-order needs numeric/timestamp columns; {c} is {dtypes[c]}"
            )
    return schema


def _rank_sqls(
    df: DataFrame, cols: list[str], bits: int | None, rank: str
) -> tuple[dict[str, str], int]:
    """Per-column rank expressions (SQL text) + the resolved bit width —
    shared by the Morton and Hilbert codes."""
    schema = _validate(df, cols)
    if rank not in ("quantile", "affine"):
        raise ValueError("rank must be 'quantile' or 'affine'")
    if bits is None:
        bits = 8 if rank == "quantile" else min(21, 63 // len(cols))
    if bits * len(cols) > 63:
        raise ValueError(f"{bits} bits x {len(cols)} columns overflows a BIGINT")
    if rank == "quantile" and bits > 12:
        raise ValueError("quantile ranks cap at 12 bits (4096 boundaries)")
    dbl = df.select(*[_as_double(c, schema[c]).alias(c) for c in cols])
    top = (1 << bits) - 1
    rank_sqls: dict[str, str] = {}
    if rank == "quantile":
        probs = [i / (top + 1) for i in range(1, top + 1)]
        qs = dbl.approxQuantile(cols, probs, 0.001)  # bounded: 2^bits/col
        for c, bounds in zip(cols, qs):
            # NaN/inf boundaries (a double column with NaNs sorts them
            # last, so they surface as TOP quantiles) would render as
            # unparseable 'nanD' literals — drop them; values at/above
            # the highest finite boundary share the top bucket, which
            # is exactly where NaN rows belong in a sort layout
            bounds = [b for b in bounds if b is not None and math.isfinite(b)]
            if not bounds:
                rank_sqls[c] = "CAST(0 AS BIGINT)"
                continue
            arr = ", ".join(f"{b!r}D" for b in bounds)
            col_sql = _COL_SQL(c, schema[c])
            # bucket = how many boundaries lie at/below the value —
            # a pure counting expression over the bounded literal array
            rank_sqls[c] = (
                f"coalesce(CAST(size(filter(array({arr}), "
                f"q -> q <= {col_sql})) AS BIGINT), CAST(0 AS BIGINT))"
            )
    else:
        # NaN compares greater than everything in Spark, so a bare max()
        # over a NaN-bearing column returns NaN — an unparseable 'nanD'
        # literal downstream; aggregate over the finite values only
        stats = dbl.agg(
            *[
                f
                for c in cols
                for f in (
                    F.min(F.when(~F.isnan(c), F.col(c))).alias(f"_mn_{c}"),
                    F.max(F.when(~F.isnan(c), F.col(c))).alias(f"_mx_{c}"),
                )
            ]
        ).collect()[0]
        for c in cols:
            mn, mx = stats[f"_mn_{c}"], stats[f"_mx_{c}"]
            col_sql = _COL_SQL(c, schema[c])
            if (
                mn is None
                or mx is None
                or not (math.isfinite(mn) and math.isfinite(mx))
                or mx <= mn
            ):
                rank_sqls[c] = "CAST(0 AS BIGINT)"  # constant/empty/all-null
            else:
                rank_sqls[c] = (
                    f"coalesce(least(CAST({top} AS BIGINT), greatest(CAST(0 AS BIGINT), "
                    f"CAST(floor((({col_sql} - {mn!r}D) / {(mx - mn)!r}D) * {float(top + 1)!r}D) "
                    f"AS BIGINT))), CAST(0 AS BIGINT))"
                )
    return rank_sqls, bits


def morton_code(
    df: DataFrame,
    cols: list[str],
    bits: int | None = None,
    rank: str = "quantile",
) -> Column:
    """The interleaved rank code as a Column (BIGINT).

    ``rank="quantile"`` (default): each column ranks by its
    approxQuantile bucket — 2^bits boundaries (bits defaults to 8: 256
    buckets per column, plenty of resolution for file/row-group
    skipping), collected once driver-side (bounded: 2^bits doubles per
    column) and evaluated as a pure counting expression.  Quantile
    ranks spend Morton resolution where the DATA is, so skewed columns
    (a long-tailed value, a hot key range) still interleave evenly —
    with affine ranks a column whose mass sits in 10% of its min/max
    span wastes ~3 of its bits on empty space.

    ``rank="affine"``: (col − min)/(max − min) scaled to ``bits``-bit
    integers (bits defaults to the largest fitting 63) — one 2-value
    aggregate per column, the cheaper choice for uniform columns.

    Nulls rank 0 in both modes (they sort first, like a plain sort)."""
    rank_sqls, bits = _rank_sqls(df, cols, bits, rank)
    parts = []
    for j, c in enumerate(cols):
        # spread rank's bits to positions j, j+k, j+2k, ... (k columns)
        parts.append(
            f"aggregate(sequence(0, {bits - 1}), CAST(0 AS BIGINT), "
            f"(acc, i) -> acc + shiftleft(shiftright({rank_sqls[c]}, i) & 1, "
            f"i * {len(cols)} + {j}))"
        )
    return F.expr(" + ".join(parts)).alias("zcode")


def _COL_SQL(c: str, dtype: T.DataType) -> str:
    if isinstance(dtype, (T.TimestampType, T.DateType)):
        return f"CAST(CAST(`{c}` AS TIMESTAMP) AS DOUBLE)"
    return f"CAST(`{c}` AS DOUBLE)"


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int | None = None,
) -> None:
    """Cluster ``df`` by the Morton code of ``cols`` into ``n_files``
    range partitions (one parquet file each, statistics-tight via the
    within-partition sort) and write to ``path``.  One range exchange —
    the same shuffle budget as a plain global sort, buying skippability
    on EVERY z-ordered column instead of the first."""
    code = morton_code(df, cols, bits)
    (
        df.withColumn("_z", code)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def hilbert_code(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    rank: str = "quantile",
) -> Column:
    """Hilbert-curve code for exactly TWO columns — Morton's
    better-locality sibling: consecutive codes are always
    grid-ADJACENT (|dx| + |dy| = 1, pinned exhaustively against a
    pure-Python reference), so a code range never takes Morton's
    quadrant-boundary jumps and per-file spans tighten — especially
    the worst file, the one the Morton test has to tolerate.

    The classic bitwise walk (quadrant index + rotate/flip per level)
    runs as ONE aggregate fold over bit positions with a (d, x, y)
    struct accumulator — still a pure expression, no UDF.  Ranks come
    from the same machinery as morton_code (quantile default /
    affine).  2-D only: the rotation step is the 2-D Hilbert
    construction; for 3+ columns use morton_code."""
    if len(cols) != 2:
        raise ValueError("hilbert_code is 2-D; use morton_code for other arities")
    rank_sqls, bits = _rank_sqls(df, cols, bits, rank)
    n = 1 << bits
    S = "shiftleft(1, i)"  # the level size s, inlined (lambdas have no LET)
    rx = f"(CASE WHEN (acc.x & {S}) > 0 THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN (acc.y & {S}) > 0 THEN 1 ELSE 0 END)"
    # rotation: ry=0 -> (flip both around n-1 if rx=1, then swap x/y)
    fx = f"(CASE WHEN {rx} = 1 THEN {n - 1} - acc.x ELSE acc.x END)"
    fy = f"(CASE WHEN {rx} = 1 THEN {n - 1} - acc.y ELSE acc.y END)"
    step = (
        "named_struct("
        f"'d', acc.d + CAST({S} AS BIGINT) * CAST({S} AS BIGINT) * "
        f"CAST(((3 * {rx}) ^ {ry}) AS BIGINT), "
        f"'x', CAST(CASE WHEN {ry} = 0 THEN {fy} ELSE acc.x END AS BIGINT), "
        f"'y', CAST(CASE WHEN {ry} = 0 THEN {fx} ELSE acc.y END AS BIGINT))"
    )
    expr = (
        f"aggregate(sequence({bits - 1}, 0, -1), "
        f"named_struct('d', CAST(0 AS BIGINT), "
        f"'x', {rank_sqls[cols[0]]}, 'y', {rank_sqls[cols[1]]}), "
        f"(acc, i) -> {step}, "
        "acc -> acc.d)"
    )
    return F.expr(expr).alias("hcode")


def write_hilbert(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = 8,
) -> None:
    """write_zordered's Hilbert twin: cluster two columns along the
    Hilbert curve (same single range exchange + within-file sort)."""
    code = hilbert_code(df, cols, bits)
    (
        df.withColumn("_h", code)
        .repartitionByRange(n_files, F.col("_h"))
        .sortWithinPartitions("_h")
        .drop("_h")
        .write.mode("overwrite")
        .parquet(path)
    )
