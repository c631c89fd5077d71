"""Cross-product oracle tests, mirroring the reference's dominant pattern
(reference test_core.py:14-60: methods × key dtypes × value dtypes × mask,
asserted against a pandas groupby oracle with dtype-kind-relaxed equality).

One wide DataFrame carries every dtype variant; each (method, key, value,
mask) combination compares the engine result to pandas computed on the same
rows (F1 fixture values, FIXTURES.md)."""

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from pandas_plus_spark import GroupBy

KEYS = [1, 1, 2, 1, 3, 3, 6, 1, 6]
VALS = [-1, 0.3, 4, 3.5, 8, 6, 3, 1, 12.6]


@pytest.fixture(scope="module")
def wide(spark):
    pdf = pd.DataFrame({
        "key_int": pd.array(KEYS, dtype="int64"),
        "key_str": [str(k) for k in KEYS],
        "key_float": pd.array([float(k) for k in KEYS], dtype="float64"),
        "val_float": pd.array(VALS, dtype="float64"),
        "val_int": pd.array([int(v) for v in VALS], dtype="int64"),
        "val_float32": pd.array([float(v) for v in VALS], dtype="float32"),
        "val_bool": [v > 2 for v in VALS],
        "mask": [k != 1 for k in KEYS],
    })
    return spark.createDataFrame(pdf), pdf


METHODS = ["sum", "mean", "min", "max", "count", "var", "std", "median"]
KEY_COLS = ["key_int", "key_str", "key_float"]
VAL_COLS = ["val_float", "val_int", "val_float32", "val_bool"]


@pytest.mark.parametrize("method", METHODS)
@pytest.mark.parametrize("key", KEY_COLS)
@pytest.mark.parametrize("val", VAL_COLS)
@pytest.mark.parametrize("masked", [False, True])
def test_method_matches_pandas(wide, method, key, val, masked):
    df, pdf = wide
    mask = F.col("mask") if masked else None

    got_df = getattr(GroupBy(df, key), method)(val, mask=mask)
    got = {r[key]: r[val] for r in got_df.collect()}

    src = pdf[pdf["mask"]] if masked else pdf
    col = src[val].astype("float64") if val == "val_bool" and method in (
        "sum", "mean", "var", "std", "median") else src[val]
    exp = getattr(col.groupby(src[key]), method)()

    # reference semantics: groups that are fully masked out are dropped
    all_keys = set(pdf[key].unique())
    assert set(got) == set(exp.index) or set(got) == all_keys

    for k, v in exp.items():
        g = got[k]
        if isinstance(v, (float, np.floating)) and np.isnan(v):
            assert g is None
        elif method in ("count",):
            assert g == v
        elif val == "val_bool" and method in ("min", "max"):
            assert bool(g) == bool(v)
        else:
            assert g == pytest.approx(float(v), rel=1e-6), (k, g, v)
