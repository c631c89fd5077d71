"""pandas-style facade + DataFrame monkey-patch.

Reference: groupby/api.py (SeriesGroupBy/DataFrameGroupBy, by= resolution)
and monkey_patch.py (df.groupby_fast). Spark-side the facade is thin: a
``DataFrameGroupBy`` wraps (df, keys) and shares one GroupBy engine object —
the reference's shared-grouper / factorization-reuse (api.py:813-833) maps to
sharing the persisted keyed DataFrame.

``install_groupby_plus()`` patches ``DataFrame.groupby_plus`` onto the
pyspark DataFrame class, mirroring ``install_groupby_fast``
(reference monkey_patch.py:97-126).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .core import GroupBy

_FORWARDED = (
    "sum", "mean", "min", "max", "count", "size", "var", "std", "median",
    "prod", "any", "all", "sem",
    "sum_squares", "first", "last", "nunique", "agg", "ratio", "subset_ratio",
    "density", "value_counts", "key_count", "head", "tail", "nth",
    "find_first_n", "find_last_n", "mode", "quantile", "corr", "cov",
    "cumsum", "cummin", "cummax", "cumprod", "cumcount",
    "rolling_sum", "rolling_mean", "rolling_min", "rolling_max",
    "rolling_var", "rolling_std",
    "shift", "diff", "pct_change", "idxmax", "idxmin", "filter_groups",
    "group_nearby_members", "persist", "unpersist",
    "skew", "kurt", "kurtosis", "ngroup", "ffill", "bfill",
    "nlargest", "nsmallest", "ohlc", "describe",
    "resample", "expanding", "ewm_mean", "rolling_time",
    "rank", "take", "corrwith",
)


class DataFrameGroupBy:
    """``df.groupby_plus('k')`` facade. Column selection via ``gb['col']``
    narrows the value set while SHARING the same engine object (and thus any
    persisted keyed layout) — reference api.py:813-833."""

    def __init__(self, df: DataFrame, by=None, order_by=None, sort: bool = True,
                 dropna: bool = True, level=None,
                 _engine: GroupBy | None = None, _selection=None):
        self._engine = _engine or GroupBy(df, by, order_by=order_by, sort=sort,
                                          dropna=dropna, level=level)
        self._selection = _selection

    def __getitem__(self, cols) -> "DataFrameGroupBy":
        if isinstance(cols, str):
            cols = [cols]
        return DataFrameGroupBy(None, None, _engine=self._engine, _selection=list(cols))

    def __iter__(self):
        # (key, group-frame) pairs — reference api.py:207-210; see the
        # engine docstring for the scale warning.
        return iter(self._engine)

    @property
    def ngroups(self) -> int:
        return self._engine.ngroups()

    def filter(self, predicate):
        """pandas-name alias for :meth:`GroupBy.filter_groups` (the
        DataFrame.filter collision doesn't exist on the grouped facade).
        Takes the declarative aggregate predicate, not a callable."""
        return self._engine.filter_groups(predicate)

    def __getattr__(self, name):
        if name not in _FORWARDED:
            raise AttributeError(name)
        target = getattr(self._engine, name)
        # corr/cov take explicit (x, y) column args — selection binding
        # doesn't apply to two-column statistics
        # filter_groups takes an aggregate predicate, not values= —
        # selection binding does not apply (like corr/cov's explicit args)
        # ngroup/resample/expanding take no values=; nlargest/nsmallest
        # take an explicit single column arg
        if self._selection is None or name in ("size", "cumcount", "value_counts",
                                               "key_count", "persist", "unpersist",
                                               "group_nearby_members",
                                               "find_first_n", "find_last_n",
                                               "corr", "cov", "filter_groups",
                                               "ngroup", "resample", "expanding",
                                               "nlargest", "nsmallest", "take"):
            return target

        def bound(*args, **kwargs):
            if "values" not in kwargs and not args:
                kwargs["values"] = self._selection
            return target(*args, **kwargs)

        return bound


def groupby_plus(self: DataFrame, by=None, order_by=None, sort: bool = True,
                 dropna: bool = True, level=None) -> DataFrameGroupBy:
    return DataFrameGroupBy(self, by, order_by=order_by, sort=sort,
                            dropna=dropna, level=level)


def install_groupby_plus() -> None:
    """Attach ``groupby_plus`` to pyspark's DataFrame (reference
    monkey_patch.py:97-126 installs ``groupby_fast`` on pandas)."""
    DataFrame.groupby_plus = groupby_plus
