from .core import GroupBy
from .pivot import crosstab
from .api import DataFrameGroupBy, groupby_plus, install_groupby_plus

__all__ = ["GroupBy", "crosstab", "DataFrameGroupBy", "groupby_plus", "install_groupby_plus"]
