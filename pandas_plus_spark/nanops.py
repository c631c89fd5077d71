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
