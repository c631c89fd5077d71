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


def qcut_bin(col: str | Column, boundaries: Sequence[float]) -> Column:
    """Quantile-bin assignment as a pure Column expression given
    PRECOMPUTED internal boundaries b_1 < … < b_{q-1}: bin index =
    #{b_i : x > b_i}, i.e. pandas ``qcut``'s right-closed intervals
    (a value equal to a boundary falls in the LOWER bin). NULL → NULL.
    A chained sum of comparisons — whole-stage codegen, no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    expr = F.lit(0)
    for b in boundaries:
        expr = expr + F.when(c > F.lit(float(b)), 1).otherwise(0)
    return F.when(c.isNotNull(), expr.cast("int"))


def qcut(df, col: str, q: int = 4, output: str | None = None,
         approx: bool = False, duplicates: str = "drop"):
    """Global quantile binning — pandas ``qcut(series, q, labels=False)``:
    adds an integer bin column (0..q−1) splitting ``col`` at its
    1/q … (q−1)/q quantiles, right-closed like pandas.

    Scale shape: ONE aggregation computes all q−1 boundaries (a q-sized
    scalar collect — bounded, never row data); ``approx=True`` routes the
    mergeable percentile sketch for the 100 TB single-pass path. The
    assignment is a broadcast-free comparison chain, so the corpus is
    never shuffled — the same calibrate-then-map shape as
    ``cleaning.quantile_threshold_filter``, without the per-group axis.

    duplicates='drop' collapses repeated boundaries (pandas raises by
    default; on heavy-tailed data dropping is the useful behavior —
    resulting bins may then be fewer than ``q``)."""
    if q < 2:
        raise ValueError("q must be >= 2")
    if duplicates not in ("drop", "raise"):
        raise ValueError("duplicates must be 'drop' or 'raise'")
    fracs = [i / q for i in range(1, q)]
    fn = F.percentile_approx if approx else F.percentile
    row = df.select(*[
        fn(F.col(col), F.lit(p)).alias(f"b{i}") for i, p in enumerate(fracs)
    ]).first()
    bounds = [row[f"b{i}"] for i in range(len(fracs))]
    uniq = sorted(set(b for b in bounds if b is not None))
    if duplicates == "raise" and len(uniq) != len(bounds):
        raise ValueError(f"duplicate bin edges {bounds}; pass duplicates='drop'")
    return df.withColumn(output or f"{col}_qbin", qcut_bin(col, uniq))
