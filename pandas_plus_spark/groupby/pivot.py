"""crosstab — pivot table with optional margins.

Reference: core.py:1913-1991 (crosstab) + add_row_margin core.py:1994-2051.
The reference groups by index+column keys, aggregates, then unstacks and
recursively re-aggregates for margins. Spark-first shape: one
``groupBy(index).pivot(col, values).agg(...)`` — a single shuffle — and
margins from a ``rollup`` union, all computed by Catalyst via grouping sets.

Always pass ``column_values`` when known: it saves Spark a distinct-scan job
to discover pivot values, and at 100 TB that discovery pass is a full shuffle
of its own.
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
    grouped = base.groupBy(*index)
    pivoted = (grouped.pivot(columns, column_values) if column_values is not None
               else grouped.pivot(columns)).agg(expr)

    want_row = margins in (True, "row")
    want_col = margins in (True, "column")

    if want_col:
        # column margin: total across all pivot columns = plain groupBy(index)
        totals = base.groupBy(*index).agg(expr.alias(_ALL_LABEL))
        pivoted = pivoted.join(totals, on=index, how="left")
    if want_row:
        # row margin: aggregate with index collapsed; label index as "All".
        row_grouped = base.groupBy()
        row_piv = (row_grouped.pivot(columns, column_values) if column_values is not None
                   else row_grouped.pivot(columns)).agg(expr)
        if want_col:
            row_piv = row_piv.join(base.groupBy().agg(expr.alias(_ALL_LABEL)))
        sel = [F.lit(_ALL_LABEL).alias(k) for k in index] + [
            F.col(c) for c in row_piv.columns]
        row_piv = row_piv.select(*sel)
        # align string-typed index columns for the union
        pivoted = pivoted.select(
            *[F.col(k).cast("string").alias(k) for k in index],
            *[F.col(c) for c in pivoted.columns if c not in index],
        )
        pivoted = pivoted.unionByName(row_piv)
    return pivoted.orderBy(*index)
