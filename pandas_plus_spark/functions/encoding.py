"""Column-encoding utilities.

- bools_to_categorical: reference util.py:796-892 — combine boolean columns
  into one label column ("A & C"); implemented with concat_ws over
  conditional literals (codegen-friendly, no UDF).
- linear_combination: reference nb_dot util.py:766-793 — DataFrame × weight
  vector as a single arithmetic expression (Catalyst folds the constants).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def bools_to_categorical(
    cols: Sequence[str],
    names: Sequence[str] | None = None,
    sep: str = " & ",
    na_rep: str = "none",
    allow_duplicates: bool = True,
) -> Column:
    """One string label per row from boolean columns: names of the true
    columns joined by ``sep``; ``na_rep`` when none are true.

    allow_duplicates=False errors on any row with more than one true column
    (reference util.py:796-892 raises ValueError); here the check runs
    distributed at execution time via ``raise_error`` — the driver never
    sees the data."""
    names = list(names or cols)
    if na_rep in names:
        raise ValueError(
            f"na_rep {na_rep!r} collides with a column label (reference "
            "util.py guards the same)")
    parts = [F.when(F.col(c), F.lit(n)) for c, n in zip(cols, names)]
    lab = F.concat_ws(sep, *parts)
    out = F.when(lab == "", F.lit(na_rep)).otherwise(lab)
    if not allow_duplicates:
        n_true = None
        for c in cols:
            t = F.col(c).cast("int")
            n_true = t if n_true is None else n_true + t
        out = F.when(
            n_true > 1,
            F.raise_error(F.lit(
                "bools_to_categorical: row with multiple true columns and "
                "allow_duplicates=False")),
        ).otherwise(out)
    return out


def linear_combination(weights: Mapping[str, float]) -> Column:
    """Σ wᵢ·colᵢ as one expression (the reference JIT-compiles a parallel
    mat-vec product; Spark's codegen fuses this into the scan projection)."""
    it = iter(weights.items())
    c0, w0 = next(it)
    expr = F.col(c0) * F.lit(float(w0))
    for c, w in it:
        expr = expr + F.col(c) * F.lit(float(w))
    return expr
