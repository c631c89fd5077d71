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


def normalize(self: DataFrame, col: str, out: str | None = None) -> DataFrame:
    """col / global sum(col) (reference ``normalize``) — one window pass."""
    from pyspark.sql import Window
    total = F.sum(col).over(Window.partitionBy())
    return self.withColumn(out or f"{col}_norm", F.col(col) / total)


def pc(self: DataFrame, col: str, order_by: str, out: str | None = None) -> DataFrame:
    """percent change vs previous row in ``order_by`` order (reference ``pc``).
    NB: a global lag is a single-partition window — fine on small frames,
    use a keyed GroupBy().diff at scale."""
    from pyspark.sql import Window
    prev = F.lag(col).over(Window.orderBy(order_by))
    return self.withColumn(out or f"{col}_pc", (F.col(col) - prev) / prev)


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
    "vc": vc, "sv": sv, "normalize_col": normalize, "pc": pc,
    "select_numeric": select_numeric, "filter_cols": filter_cols,
    "drop_cols": drop_cols, "groupby_plus": groupby_plus,
}


def install_extensions() -> None:
    for name, fn in _METHODS.items():
        setattr(DataFrame, name, fn)
