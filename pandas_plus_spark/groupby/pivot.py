"""crosstab — pivot table with optional margins.

Reference: core.py:1913-1991 (crosstab) + add_row_margin core.py:1994-2051.
The reference groups by index+column keys, aggregates, then unstacks and
recursively re-aggregates for margins. Spark-first shape:

- no margins: one ``groupBy(index).pivot(col).agg`` — a single shuffle.
- with margins: one ``cube(index..., col)`` pass — Catalyst evaluates every
  grouping set in a single scan+shuffle — then the tiny aggregated frame is
  labeled ("All") and pivoted. ONE pass over the data regardless of which
  margins are requested (the old formulation re-scanned the fact table per
  margin axis).

Always pass ``column_values`` when known: it saves the distinct-scan job
Spark otherwise runs to discover pivot values — at 100 TB that discovery is
a full extra pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .core import GroupBy, _ALL_LABEL, _as_list


def _agg_expr(func: str, values: str | None):
    if func == "size" or values is None:
        return F.count(F.lit(1))
    fn = {
        "sum": F.sum, "mean": F.avg, "count": F.count, "min": F.min,
        "max": F.max, "median": F.median,
        "var": F.var_samp, "std": F.stddev_samp,
    }[func]
    return fn(F.col(values))


def crosstab(
    df: DataFrame,
    index,
    columns: str,
    values: str | None = None,
    aggfunc: str = "size",
    mask=None,
    margins: bool | str = False,
    column_values: list | None = None,
    dropna: bool = True,
) -> DataFrame:
    """Pivot: rows = distinct ``index`` keys, one output column per distinct
    value of ``columns``, cells = aggfunc(values).

    margins: True = row and column totals, 'row' / 'column' for one axis
    (reference core.py:1955-1962).
    """
    index = _as_list(index)
    base = GroupBy(df, index + [columns], dropna=dropna)._base()
    if mask is not None:
        base = base.filter(mask if not isinstance(mask, str) else F.col(mask))
    expr = _agg_expr(aggfunc, values)

    if not margins:
        grouped = base.groupBy(*index)
        pivoted = (grouped.pivot(columns, column_values) if column_values is not None
                   else grouped.pivot(columns)).agg(expr)
        return pivoted.orderBy(*index)

    want_row = margins in (True, "row")      # an "All" index row
    want_col = margins in (True, "column")   # an "All" total column

    # One cube pass computes every grouping set; filter to the requested
    # margin combinations, label collapsed keys "All", then pivot the tiny
    # aggregated frame.
    # -1 marks partially-collapsed multi-index combos (cube emits them; the
    # reference's margins are all-or-nothing per row) — filtered out below.
    g_sum = sum([F.grouping(k) for k in index[1:]], F.grouping(index[0]))
    g_index = (F.when(g_sum == 0, F.lit(0))
               .when(g_sum == len(index), F.lit(1))
               .otherwise(F.lit(-1)))
    cubed = base.cube(*index, columns).agg(
        expr.alias("__cell"),
        g_index.alias("__g_idx"),
        F.grouping(columns).alias("__g_col"),
    )
    keep = (F.col("__g_idx") == 0) & (F.col("__g_col") == 0)
    if want_col:
        keep = keep | ((F.col("__g_idx") == 0) & (F.col("__g_col") == 1))
    if want_row:
        keep = keep | ((F.col("__g_idx") == 1) & (F.col("__g_col") == 0))
    if want_row and want_col:
        keep = keep | ((F.col("__g_idx") == 1) & (F.col("__g_col") == 1))
    cubed = cubed.filter(keep)

    labeled = cubed.select(
        *[
            F.when(F.col("__g_idx") == 1, F.lit(_ALL_LABEL))
            .otherwise(F.col(k).cast("string")).alias(k)
            for k in index
        ],
        F.when(F.col("__g_col") == 1, F.lit(_ALL_LABEL))
        .otherwise(F.col(columns).cast("string")).alias(columns),
        F.col("__cell"),
    )
    pivot_vals = None
    if column_values is not None:
        pivot_vals = [str(v) for v in column_values] + ([_ALL_LABEL] if want_col else [])
    grouped = labeled.groupBy(*index)
    pivoted = (grouped.pivot(columns, pivot_vals) if pivot_vals is not None
               else grouped.pivot(columns)).agg(F.first("__cell"))
    return pivoted.orderBy(*index)


def pivot_table(
    df: DataFrame,
    values: str | None = None,
    index=None,
    columns: str | None = None,
    aggfunc: str = "mean",
    margins: bool | str = False,
    column_values: list | None = None,
    dropna: bool = True,
    mask=None,
) -> DataFrame:
    """pandas ``pivot_table`` argument order over the crosstab engine
    (one cube/pivot pass — see :func:`crosstab`). pandas defaults apply:
    ``aggfunc='mean'`` (crosstab defaults to counts)."""
    if index is None or columns is None:
        raise ValueError("pivot_table requires index= and columns=")
    return crosstab(df, index, columns, values=values, aggfunc=aggfunc,
                    mask=mask, margins=margins, column_values=column_values,
                    dropna=dropna)
