import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandas_plus_spark.session import get_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pandas-plus-spark-tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tables(spark):
    from pandas_plus_spark.sources import load_tables
    return load_tables(spark, SF_SMALL)


@pytest.fixture(scope="session")
def nullable_df(spark):
    """FIXTURES.md F1/F2-style frame with native NULLs in keys and values."""
    rows = [
        # (rid, key, val, fval, mask)
        (0, 1, -1, 0.1, False),
        (1, 1, 0, None, False),
        (2, 2, 4, 3.5, True),
        (3, 1, 3, 3.0, False),
        (4, 3, None, 8.0, True),
        (5, 3, 6, 6.0, True),
        (6, None, 3, 7.0, True),
        (7, 1, 1, None, False),
        (8, 6, 12, 1.2, True),
    ]
    return spark.createDataFrame(
        rows, "rid long, key long, val long, fval double, mask boolean")
