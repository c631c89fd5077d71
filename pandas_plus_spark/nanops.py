"""Global (non-grouped) null-skipping reductions.

Reference: nanops.py — chunk-parallel map-reduce over one array (reduce_1d
nanops.py:68-143, kernel _nb_reduce nanops.py:16-65). Spark's `df.agg` is
already a tree-reduced partial aggregation across partitions, so each of
these is a single declarative expression; `min_count` (reference
nanops.py:214-215) becomes a count guard.

All functions return a Column; use ``df.agg(nansum(df, 'x'))`` or the
convenience ``reduce_frame``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _guard(expr: Column, col: str, min_count: int) -> Column:
    if min_count <= 0:
        return expr
    return F.when(F.count(F.col(col)) >= min_count, expr)


def nansum(col: str, min_count: int = 0) -> Column:
    return _guard(F.sum(F.col(col)), col, min_count)


def nancount(col: str) -> Column:
    return F.count(F.col(col))


def nanmean(col: str, min_count: int = 0) -> Column:
    return _guard(F.avg(F.col(col)), col, min_count)


def nanmin(col: str, min_count: int = 0) -> Column:
    return _guard(F.min(F.col(col)), col, min_count)


def nanmax(col: str, min_count: int = 0) -> Column:
    return _guard(F.max(F.col(col)), col, min_count)


def nanvar(col: str, ddof: int = 1, min_count: int = 0) -> Column:
    c = F.col(col)
    if ddof == 1:
        e = F.var_samp(c)
    elif ddof == 0:
        e = F.var_pop(c)
    else:
        n = F.count(c)
        e = (F.sum(c * c) - F.sum(c) * F.sum(c) / n) / (n - F.lit(ddof))
    return _guard(e, col, min_count)


def nanstd(col: str, ddof: int = 1, min_count: int = 0) -> Column:
    e = nanvar(col, ddof=ddof, min_count=min_count)
    return F.sqrt(e)


def reduce_frame(df: DataFrame, funcs: dict[str, list[str]]) -> DataFrame:
    """Apply {col: [func names]} in ONE aggregation pass.

    reduce_frame(df, {'x': ['sum','mean'], 'y': ['max']}) →
    single-row DataFrame with columns x_sum, x_mean, y_max.
    """
    dispatch = {
        "sum": nansum, "count": nancount, "mean": nanmean,
        "min": nanmin, "max": nanmax, "var": nanvar, "std": nanstd,
    }
    exprs = [
        dispatch[fn](col).alias(f"{col}_{fn}")
        for col, fns in funcs.items()
        for fn in fns
    ]
    return df.agg(*exprs)


# --------------------------------------------------------------------- #
# axis=1 (row-wise) reductions — reference reduce_2d (nanops.py:146-179)
# --------------------------------------------------------------------- #
#
# The reference reduces a 2-D array along axis 1 by running the 1-D kernel
# per row. Spark-side a "row" of numeric columns is an array expression and
# the reduction is an array fold — purely map-side, embarrassingly parallel,
# zero shuffles: the natural 100 TB shape. Null handling mirrors pandas
# skipna semantics: nulls drop out of the fold; an all-null row yields
# sum=0 / count=0 / mean,min,max=NULL; `min_count` nulls any result built
# from fewer than min_count non-null values (reference nanops.py:214-215).

def _row_nn(cols: list[str]) -> Column:
    """Array of the row's NON-NULL values, doubles."""
    return F.filter(F.array(*[F.col(c).cast("double") for c in cols]),
                    lambda v: v.isNotNull())


def _row_guard(expr: Column, nn: Column, min_count: int) -> Column:
    if min_count <= 0:
        return expr
    return F.when(F.size(nn) >= min_count, expr)


def _let(val: Column, body):
    """Bind an array-valued expression once (HOF-interpreted lambdas
    re-evaluate free expressions per reference — the minhash lesson)."""
    from .functions.text import let
    return let(val, body)


def rownansum(cols: list[str], min_count: int = 0) -> Column:
    return _let(_row_nn(cols), lambda nn: _row_guard(
        F.aggregate(nn, F.lit(0.0), lambda acc, v: acc + v), nn, min_count))


def rownancount(cols: list[str]) -> Column:
    return F.size(_row_nn(cols)).cast("long")


def rownanmean(cols: list[str], min_count: int = 0) -> Column:
    return _let(_row_nn(cols), lambda nn: _row_guard(
        F.when(F.size(nn) > 0,
               F.aggregate(nn, F.lit(0.0), lambda acc, v: acc + v) / F.size(nn)),
        nn, min_count))


def rownanmin(cols: list[str], min_count: int = 0) -> Column:
    # array_min skips NULL elements natively; the filter keeps the
    # min_count guard's size() honest
    return _let(_row_nn(cols),
                lambda nn: _row_guard(F.array_min(nn), nn, min_count))


def rownanmax(cols: list[str], min_count: int = 0) -> Column:
    return _let(_row_nn(cols),
                lambda nn: _row_guard(F.array_max(nn), nn, min_count))


def rownanvar(cols: list[str], ddof: int = 1, min_count: int = 0) -> Column:
    def body(nn: Column) -> Column:
        n = F.size(nn)
        s = F.aggregate(nn, F.lit(0.0), lambda acc, v: acc + v)
        ssq = F.aggregate(nn, F.lit(0.0), lambda acc, v: acc + v * v)
        e = F.when(n > ddof, (ssq - s * s / n) / (n - F.lit(ddof)))
        return _row_guard(e, nn, min_count)
    return _let(_row_nn(cols), body)


def rownanstd(cols: list[str], ddof: int = 1, min_count: int = 0) -> Column:
    return F.sqrt(rownanvar(cols, ddof=ddof, min_count=min_count))


def reduce_rowwise(df: DataFrame, cols: list[str], funcs: list[str],
                   min_count: int = 0, prefix: str = "row_") -> DataFrame:
    """Append one ``{prefix}{func}`` column per requested row-wise reduction
    over ``cols`` — the axis=1 face of :func:`reduce_frame`. All reductions
    evaluate in a single projection (one codegen stage, no shuffle)."""
    dispatch = {
        "sum": rownansum, "mean": rownanmean, "min": rownanmin,
        "max": rownanmax, "var": rownanvar, "std": rownanstd,
    }
    out = df
    for fn in funcs:
        expr = (rownancount(cols) if fn == "count"
                else dispatch[fn](cols, min_count=min_count))
        out = out.withColumn(f"{prefix}{fn}", expr)
    return out
