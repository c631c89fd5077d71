"""pretty_cut — bin a numeric column into labeled buckets.

Reference: util.py:689-763. Buckets are (-inf, b0], (b0, b1], …, (bn, inf)
(numpy searchsorted side='left'). Label style depends on the DATA dtype:
integer data gets non-overlapping "left+1 - right" labels; float data gets
"left - right" with ``precision`` decimals (default: max decimals among the
bin edges). NULL input → NULL label. Implemented as a chained CASE WHEN —
stays in whole-stage codegen, no UDF.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _infer_precision(bins: Sequence[float]) -> int:
    out = 0
    for b in bins:
        s = str(b)
        if "." in s:
            out = max(out, len(s.split(".", 1)[1]))
    return out


def pretty_cut_labels(
    bins: Sequence[float],
    precision: int | None = None,
    integer_data: bool | None = None,
) -> list[str]:
    """Labels exactly as the reference builds them (util.py:745-755).

    integer_data: whether the binned COLUMN is integer-typed (drives the
    left+1 style). Default: True iff every bin edge is integral — callers
    binning float columns with integer edges should pass False for strict
    reference parity.
    """
    if integer_data is None:
        integer_data = all(float(b) == int(b) for b in bins)
    if precision is None:
        precision = _infer_precision(bins) if not integer_data else 0

    def fmt(x) -> str:
        return str(int(x)) if integer_data else f"{float(x):.{precision}f}"

    labels = [f" <= {fmt(bins[0]) if integer_data else bins[0]}"]
    for lo, hi in zip(bins, bins[1:]):
        left = fmt(lo + 1) if integer_data else fmt(lo)
        right = fmt(hi)
        labels.append(left if left == right else f"{left} - {right}")
    labels.append(f" > {fmt(bins[-1]) if integer_data else bins[-1]}")
    return labels


def pretty_cut(
    col: str | Column,
    bins: Sequence[float],
    precision: int | None = None,
    integer_data: bool | None = None,
) -> Column:
    """Label ``col`` by the half-open buckets (-inf, b0], (b0, b1], …, (bn, inf).

    Returns a string Column (the reference returns a pandas Categorical;
    dictionary encoding is a storage concern Parquet handles for us).
    """
    c = F.col(col) if isinstance(col, str) else col
    bins = sorted(bins)
    labels = pretty_cut_labels(bins, precision, integer_data)
    expr = F.when(c.isNull() | F.isnan(c.cast("double")), F.lit(None).cast("string"))
    expr = expr.when(c <= bins[0], F.lit(labels[0]))
    for hi, lab in zip(bins[1:], labels[1:-1]):
        expr = expr.when(c <= hi, F.lit(lab))
    return expr.otherwise(F.lit(labels[-1]))
