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
) -> Column:
    """One string label per row from boolean columns: names of the true
    columns joined by ``sep``; ``na_rep`` when none are true."""
    names = list(names or cols)
    parts = [F.when(F.col(c), F.lit(n)) for c, n in zip(cols, names)]
    lab = F.concat_ws(sep, *parts)
    return F.when(lab == "", F.lit(na_rep)).otherwise(lab)


def linear_combination(weights: Mapping[str, float]) -> Column:
    """Σ wᵢ·colᵢ as one expression (the reference JIT-compiles a parallel
    mat-vec product; Spark's codegen fuses this into the scan projection)."""
    it = iter(weights.items())
    c0, w0 = next(it)
    expr = F.col(c0) * F.lit(float(w0))
    for c, w in it:
        expr = expr + F.col(c) * F.lit(float(w))
    return expr
