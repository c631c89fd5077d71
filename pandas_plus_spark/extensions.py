"""Method-alias sugar on pyspark DataFrames.

Reference: extensions.py:11-91 installs short aliases on pandas objects
(``vc``, ``sv``, ``gb``, ``pc``, ``normalize``, ``filter_cols``, ...).
Spark-side the same conveniences, as thin DataFrame methods. Install with
``install_extensions()`` (idempotent).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .groupby.api import groupby_plus
from .groupby.core import NUMERIC_KINDS


def vc(self: DataFrame, col: str, normalize: bool = False) -> DataFrame:
    """value counts (reference ``vc``): groupBy(col).count, descending."""
    from .groupby.core import GroupBy
    return GroupBy(self, col).value_counts(normalize=normalize)


def sv(self: DataFrame, *cols, ascending: bool = True) -> DataFrame:
    """sort values (reference ``sv``)."""
    exprs = [F.col(c).asc() if ascending else F.col(c).desc() for c in cols]
    return self.orderBy(*exprs)


def svd(self: DataFrame, *cols) -> DataFrame:
    """sort values descending (reference ``svd`` =
    sort_values(ascending=False), extensions.py:15)."""
    return sv(self, *cols, ascending=False)


def tf(self: DataFrame, *names) -> DataFrame:
    """rename-all sugar (reference ``tf`` = to_frame; frames are already
    frames here, so ``tf`` maps to toDF column renaming)."""
    return self.toDF(*names) if names else self


def dd(self: DataFrame, *cols) -> DataFrame:
    """drop duplicates (reference ``dd`` = drop_duplicates,
    extensions.py:17)."""
    return self.dropDuplicates(list(cols) or None)


def normalize(self: DataFrame, col: str, out: str | None = None) -> DataFrame:
    """col / global sum(col) (reference ``normalize``) — the scalar total is
    one aggregate broadcast back (a partition-less window would drag the
    whole frame through one task)."""
    total = self.agg(F.sum(col).alias("__total"))
    return (self.crossJoin(F.broadcast(total))
            .withColumn(out or f"{col}_norm", F.col(col) / F.col("__total"))
            .drop("__total"))


def pc(self: DataFrame, col: str, order_by: str, out: str | None = None) -> DataFrame:
    """percent change vs previous row in ``order_by`` order (reference ``pc``)
    via the distributed global lag (functions.ordered.global_shift) — no
    single-partition window at any frame size."""
    from .functions.ordered import global_shift
    shifted = global_shift(self, order_by, col, n=1, suffix="__prev")
    prev = F.col(f"{col}__prev")
    return (shifted.withColumn(out or f"{col}_pc", (F.col(col) - prev) / prev)
            .drop(f"{col}__prev"))


def categorize_objects(self: DataFrame, columns=None, exclude=()) -> DataFrame:
    """Dictionary-encode string columns to integer codes (reference
    ``categorize_objects`` converts object→category, extensions.py:63-74).

    Codes match pandas category codes for object dtype: position in the
    SORTED distinct values, NULL → -1. Each column's dictionary is a
    distinct-aggregate (cardinality-sized) joined back broadcast; the
    row_number window runs over that tiny distinct frame only."""
    from pyspark.sql import Window
    if columns is None:
        columns = [f.name for f in self.schema.fields
                   if isinstance(f.dataType, T.StringType)]
    columns = [c for c in columns if c not in set(exclude)]
    out = self
    for c in columns:
        code_col = f"__code_{c}"
        cats = out.select(c).where(F.col(c).isNotNull()).distinct()
        codes = cats.withColumn(
            code_col, F.row_number().over(Window.orderBy(c)) - 1)
        out = (
            out.join(F.broadcast(codes), on=c, how="left")
            .withColumn(c, F.coalesce(F.col(code_col), F.lit(-1)))
            .drop(code_col)
        )
    return out


def heat_map(self: DataFrame, index, columns: str, values: str | None = None,
             aggfunc: str = "size", precision: int = 1, styled: bool = False,
             **kw):
    """The reference's ``heat_map`` (a styled crosstab, extensions.py:86-91).

    Default: the distributed pivot with cells rounded to ``precision`` (the
    data side — gradient rendering is a display concern). ``styled=True``
    collects the (tiny — group-dimension-sized) pivot to the driver and
    returns a ``pandas.io.formats.style.Styler`` with a white→blue
    background gradient per cell, matching the reference's rendered output
    without requiring matplotlib (the ramp is computed inline, not via a
    colormap)."""
    from .groupby.pivot import crosstab
    out = crosstab(self, index, columns, values=values, aggfunc=aggfunc, **kw)
    for f in out.schema.fields:
        if isinstance(f.dataType, (T.DoubleType, T.FloatType)):
            out = out.withColumn(f.name, F.round(F.col(f.name), precision))
    if not styled:
        return out
    import pandas as pd

    idx_cols = [index] if isinstance(index, str) else list(index)
    pdf = out.toPandas().set_index(idx_cols)
    num_cols = pdf.select_dtypes("number").columns
    lo = float(pdf[num_cols].min().min()) if len(num_cols) else 0.0
    hi = float(pdf[num_cols].max().max()) if len(num_cols) else 1.0

    def css(v):
        if pd.isna(v):
            return ""
        t = 0.0 if hi == lo else (float(v) - lo) / (hi - lo)
        r, g = int(255 - 160 * t), int(255 - 110 * t)
        fg = "white" if t > 0.65 else "black"
        return f"background-color: #{r:02x}{g:02x}ff; color: {fg}"

    styler = pdf.style
    mapper = getattr(styler, "map", None) or styler.applymap
    return mapper(css, subset=list(num_cols))


def select_numeric(self: DataFrame) -> DataFrame:
    """numeric/temporal/boolean columns only (reference ``select_numeric``,
    util.py:504-514)."""
    keep = [f.name for f in self.schema.fields if isinstance(f.dataType, NUMERIC_KINDS)]
    return self.select(*keep)


def filter_cols(self: DataFrame, pattern: str) -> DataFrame:
    """keep columns whose name matches the regex (reference ``filter_cols``)."""
    rx = re.compile(pattern)
    return self.select(*[c for c in self.columns if rx.search(c)])


def drop_cols(self: DataFrame, pattern: str) -> DataFrame:
    rx = re.compile(pattern)
    return self.select(*[c for c in self.columns if not rx.search(c)])


_METHODS = {
    "vc": vc, "sv": sv, "svd": svd, "tf": tf, "dd": dd,
    "normalize_col": normalize, "pc": pc,
    "select_numeric": select_numeric, "filter_cols": filter_cols,
    "drop_cols": drop_cols, "groupby_plus": groupby_plus, "gb": groupby_plus,
    "categorize_objects": categorize_objects,
    "heat_map": heat_map, "hm": heat_map,
}


def install_extensions() -> None:
    for name, fn in _METHODS.items():
        setattr(DataFrame, name, fn)
