from .core import GroupBy
from .pivot import crosstab, pivot_table
from .api import DataFrameGroupBy, groupby_plus, install_groupby_plus

__all__ = ["GroupBy", "crosstab", "pivot_table", "DataFrameGroupBy", "groupby_plus", "install_groupby_plus"]
