"""pretty_cut — bin a numeric column into labeled buckets.

Reference: util.py:689-763. Labels follow the reference's integer style:
`` <= 5``, ``6 - 10``, `` > 15`` (util.py:722-730); NULL input → NULL label.
Implemented as a chained CASE WHEN — stays in whole-stage codegen, no UDF.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _fmt(x, precision: int) -> str:
    if float(x) == int(x):
        return str(int(x))
    return f"{float(x):.{precision}f}"


def pretty_cut_labels(bins: Sequence[float], precision: int = 0) -> list[str]:
    labels = [f" <= {_fmt(bins[0], precision)}"]
    for lo, hi in zip(bins, bins[1:]):
        if float(lo) == int(lo):
            labels.append(f"{_fmt(lo + 1, precision)} - {_fmt(hi, precision)}")
        else:
            labels.append(f"{_fmt(lo, precision)} - {_fmt(hi, precision)}")
    labels.append(f" > {_fmt(bins[-1], precision)}")
    return labels


def pretty_cut(col: str | Column, bins: Sequence[float], precision: int = 0) -> Column:
    """Label ``col`` by the half-open buckets (-inf, b0], (b0, b1], …, (bn, inf).

    Returns a string Column (the reference returns a pandas Categorical;
    dictionary encoding is a storage concern Parquet handles for us).
    """
    c = F.col(col) if isinstance(col, str) else col
    labels = pretty_cut_labels(bins, precision)
    expr = F.when(c.isNull(), F.lit(None).cast("string"))
    expr = expr.when(c <= bins[0], F.lit(labels[0]))
    for hi, lab in zip(bins[1:], labels[1:-1]):
        expr = expr.when(c <= hi, F.lit(lab))
    return expr.otherwise(F.lit(labels[-1]))
