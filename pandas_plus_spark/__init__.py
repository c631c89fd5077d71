"""pandas_plus_spark — PySpark-native analytics engine with the query surface
of eoincondron/pandas-plus, re-designed for Spark's distributed execution
model (DataFrame/Catalyst first; no RDDs, no driver-side loops, Python only
via Arrow-batched UDFs where built-ins genuinely cannot express semantics).
"""

from .groupby import GroupBy, crosstab, pivot_table, DataFrameGroupBy, groupby_plus, install_groupby_plus
from .session import get_spark
from .sources.local import from_arrays, from_pandas
from . import nanops
from . import functions
from . import plans

__all__ = [
    "GroupBy",
    "crosstab",
    "pivot_table",
    "DataFrameGroupBy",
    "groupby_plus",
    "install_groupby_plus",
    "get_spark",
    "from_arrays",
    "from_pandas",
    "nanops",
    "functions",
]

__version__ = "0.1.0"
