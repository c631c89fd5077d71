"""axis=1 (row-wise) reductions vs pandas semantics.

Reference reduce_2d (nanops.py:146-179) reduces a 2-D array along axis 1
with null-skip + min_count; pandas `df.sum(axis=1, min_count=...)` etc. is
the behavioral model both the reference and this engine target.
"""

import math

import pandas as pd
import pytest

from pandas_plus_spark import nanops

ROWS = [
    (0, 1.0, 2.0, 3.0),
    (1, None, 5.0, -1.0),
    (2, None, None, 4.0),
    (3, None, None, None),
    (4, 2.5, None, 2.5),
]
COLS = ["a", "b", "c"]


@pytest.fixture(scope="module")
def rdf(spark):
    return spark.createDataFrame(
        ROWS, "rid long, a double, b double, c double")


@pytest.fixture(scope="module")
def pdf():
    return pd.DataFrame(ROWS, columns=["rid"] + COLS).set_index("rid")


def _got(df, col):
    return {r["rid"]: r[col] for r in df.collect()}


class TestRowwiseVsPandas:
    @pytest.mark.parametrize("fn", ["sum", "mean", "min", "max", "count"])
    def test_matches_pandas_axis1(self, rdf, pdf, fn):
        out = nanops.reduce_rowwise(rdf, COLS, [fn])
        got = _got(out, f"row_{fn}")
        exp = getattr(pdf[COLS], fn)(axis=1)
        for rid, e in exp.items():
            g = got[rid]
            if isinstance(e, float) and math.isnan(e):
                assert g is None, (fn, rid, g)
            else:
                assert g == pytest.approx(e), (fn, rid)

    @pytest.mark.parametrize("ddof", [0, 1])
    def test_var_std_match_pandas(self, rdf, pdf, ddof):
        out = rdf.select(
            "rid",
            nanops.rownanvar(COLS, ddof=ddof).alias("v"),
            nanops.rownanstd(COLS, ddof=ddof).alias("s"))
        got_v, got_s = _got(out, "v"), _got(out, "s")
        exp = pdf[COLS].var(axis=1, ddof=ddof)
        for rid, e in exp.items():
            if math.isnan(e):
                assert got_v[rid] is None
                assert got_s[rid] is None
            else:
                assert got_v[rid] == pytest.approx(e)
                assert got_s[rid] == pytest.approx(math.sqrt(e))

    def test_min_count_guard(self, rdf, pdf):
        out = rdf.select(
            "rid", nanops.rownansum(COLS, min_count=2).alias("s2"))
        got = _got(out, "s2")
        exp = pdf[COLS].sum(axis=1, min_count=2)
        for rid, e in exp.items():
            if math.isnan(e):
                assert got[rid] is None
            else:
                assert got[rid] == pytest.approx(e)

    def test_all_reductions_one_projection_no_shuffle(self, rdf):
        out = nanops.reduce_rowwise(
            rdf, COLS, ["sum", "mean", "min", "max", "count", "var", "std"])
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # purely map-side
