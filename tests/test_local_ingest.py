"""Local-container ingestion facade + positional mask helpers.

The reference accepts np/pd/Arrow arrays everywhere and addresses rows by
array position (reference util.py:633-686, tests/test_mask_indexing.py);
here the same workflows run through ``from_arrays``/``from_pandas`` (which
stamp the ``_row_id`` order contract at ingest) and the
``slice_mask``/``index_mask``/``bool_array_mask`` predicate builders."""

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from pandas_plus_spark import GroupBy, from_arrays, from_pandas
from pandas_plus_spark.functions import (bool_array_mask, index_mask,
                                         slice_mask)


@pytest.fixture(scope="module")
def local_pdf():
    rng = np.random.default_rng(11)
    n = 400
    pdf = pd.DataFrame({
        "key": rng.integers(0, 6, n),
        "val": rng.standard_normal(n),
    })
    pdf.loc[pdf.index % 17 == 0, "val"] = np.nan
    return pdf


class TestFromArrays:
    def test_single_unnamed_array(self, spark):
        sdf = from_arrays(spark, np.array([3.0, 1.0, 2.0]))
        rows = sorted(sdf.collect())
        assert sdf.columns == ["_row_id", "_arr_0"]
        assert [r["_arr_0"] for r in rows] == [3.0, 1.0, 2.0]
        assert [r["_row_id"] for r in rows] == [0, 1, 2]

    def test_sequence_of_arrays_synthetic_names(self, spark):
        sdf = from_arrays(spark, [np.arange(4), np.arange(4) * 2.0])
        assert sdf.columns == ["_row_id", "_arr_0", "_arr_1"]

    def test_mapping_and_named_series(self, spark):
        sdf = from_arrays(spark, {"k": [1, 1, 2], "v": [1.0, 2.0, 3.0]})
        assert sdf.columns == ["_row_id", "k", "v"]
        s = pd.Series([1, 2], name="named")
        assert from_arrays(spark, [s]).columns == ["_row_id", "named"]

    def test_2d_numpy_splits_columns(self, spark):
        sdf = from_arrays(spark, np.arange(6).reshape(3, 2),
                          names=["a", "b"])
        got = {tuple(r) for r in sdf.select("a", "b").collect()}
        assert got == {(0, 1), (2, 3), (4, 5)}

    def test_misaligned_lengths_raise(self, spark):
        with pytest.raises(ValueError, match="not aligned"):
            from_arrays(spark, [np.arange(3), np.arange(4)])

    def test_names_override_count_mismatch_raises(self, spark):
        with pytest.raises(ValueError, match="names has"):
            from_arrays(spark, [np.arange(3)], names=["a", "b"])

    def test_nan_becomes_null(self, spark):
        sdf = from_arrays(spark, {"v": [1.0, np.nan]})
        assert [r["v"] for r in sorted(sdf.collect())][1] is None


class TestFromPandas:
    def test_row_id_is_positional_not_index(self, spark):
        pdf = pd.DataFrame({"v": [10, 20, 30]}, index=[7, 3, 5])
        got = sorted(from_pandas(spark, pdf).collect())
        assert [(r["_row_id"], r["v"]) for r in got] == [
            (0, 10), (1, 20), (2, 30)]

    def test_series(self, spark):
        sdf = from_pandas(spark, pd.Series([1.0, 2.0], name="x"))
        assert sdf.columns == ["_row_id", "x"]

    def test_existing_row_id_collides(self, spark):
        with pytest.raises(ValueError, match="_row_id"):
            from_pandas(spark, pd.DataFrame({"_row_id": [1]}))


class TestGroupByThroughFacade:
    """Reference-style workflow: arrays in, grouped aggregation out."""

    def test_agg_parity_with_pandas(self, spark, local_pdf):
        sdf = from_pandas(spark, local_pdf)
        got = {r["key"]: r["val"]
               for r in GroupBy(sdf, "key").sum("val").collect()}
        exp = local_pdf.groupby("key")["val"].sum()
        for k, e in exp.items():
            assert got[k] == pytest.approx(e, rel=1e-9)

    def test_ordered_op_uses_ingest_order(self, spark, local_pdf):
        sdf = from_pandas(spark, local_pdf)
        got_df = GroupBy(sdf, "key", order_by="_row_id").cumsum("val")
        got = {r["_row_id"]: r["val_cumsum"] for r in got_df.collect()}
        # reference cumsum semantics: NaN rows emit the running value and
        # don't contribute (pandas would emit NaN at those positions)
        acc: dict = {}
        for rid, (k, v) in enumerate(zip(local_pdf["key"], local_pdf["val"])):
            if not np.isnan(v):
                acc[k] = acc.get(k, 0.0) + v
            e = acc.get(k)
            g = got[rid]
            if e is None:
                assert g is None, rid
            else:
                assert g == pytest.approx(e, rel=1e-9), rid

    def test_by_array_key_through_facade(self, spark, local_pdf):
        sdf = from_pandas(spark, local_pdf)
        arr = (local_pdf["key"].to_numpy() % 2).astype("int64")
        got = {r["_key_0"]: r["val"]
               for r in GroupBy(sdf, arr).sum("val").collect()}
        exp = local_pdf.groupby(local_pdf["key"] % 2)["val"].sum()
        for k, e in exp.items():
            assert got[k] == pytest.approx(e, rel=1e-9)


SLICES = [
    (100, 300, None), (None, 250, 3), (50, None, 7), (None, None, None),
    (-120, None, None), (None, -50, 2), (-300, -50, 5),
    (350, 20, -1), (350, 20, -3), (-1, None, -2), (None, 10, -4),
    (399, None, -1),
]


class TestSliceMask:
    @pytest.mark.parametrize("start,stop,step", SLICES)
    def test_matches_python_slice(self, spark, start, stop, step):
        n = 400
        sdf = spark.range(n).withColumnRenamed("id", "_row_id")
        got = sorted(r["_row_id"] for r in sdf.where(
            slice_mask("_row_id", start, stop, step, n=n)).collect())
        exp = sorted(range(*slice(start, stop, step).indices(n)))
        assert got == exp, (start, stop, step)

    def test_slice_object_form(self, spark):
        sdf = spark.range(50).withColumnRenamed("id", "_row_id")
        got = sorted(r["_row_id"] for r in sdf.where(
            slice_mask("_row_id", np.s_[5:20:3])).collect())
        assert got == list(range(5, 20, 3))

    def test_no_n_positive_step(self, spark):
        sdf = spark.range(30).withColumnRenamed("id", "_row_id")
        got = sorted(r["_row_id"] for r in sdf.where(
            slice_mask("_row_id", 4, 20, 2)).collect())
        assert got == list(range(4, 20, 2))

    def test_negative_bound_without_n_raises(self):
        with pytest.raises(ValueError, match="requires n="):
            slice_mask("_row_id", -5, None, None)
        with pytest.raises(ValueError, match="requires n="):
            slice_mask("_row_id", None, 10, -2)

    def test_zero_step_raises(self):
        with pytest.raises(ValueError, match="step"):
            slice_mask("_row_id", 0, 10, 0)


class TestIndexAndBoolMasks:
    def test_index_mask_with_negatives(self, spark):
        sdf = spark.range(20).withColumnRenamed("id", "_row_id")
        got = sorted(r["_row_id"] for r in sdf.where(
            index_mask("_row_id", [0, 5, -1, -2], n=20)).collect())
        assert got == [0, 5, 18, 19]

    def test_bool_array_mask(self, spark):
        flags = np.zeros(20, dtype=bool)
        flags[[2, 3, 11]] = True
        sdf = spark.range(20).withColumnRenamed("id", "_row_id")
        got = sorted(r["_row_id"] for r in sdf.where(
            bool_array_mask("_row_id", flags)).collect())
        assert got == [2, 3, 11]

    def test_bool_mask_rejects_non_bool(self):
        with pytest.raises(TypeError, match="boolean"):
            bool_array_mask("_row_id", np.array([1, 0, 1]))


class TestMaskedAggThroughHelpers:
    """The reference's mask matrix driven end-to-end from local arrays:
    mask= built by the positional helpers ≡ pandas positional filtering."""

    @pytest.mark.parametrize("mask_kind", ["slice", "neg_slice", "fancy", "bool"])
    def test_sum_parity(self, spark, local_pdf, mask_kind):
        n = len(local_pdf)
        sdf = from_pandas(spark, local_pdf)
        if mask_kind == "slice":
            m_col, sel = slice_mask("_row_id", 100, 300, None), np.s_[100:300]
        elif mask_kind == "neg_slice":
            m_col, sel = slice_mask("_row_id", 350, 20, -3, n=n), np.s_[350:20:-3]
        elif mask_kind == "fancy":
            idx = [0, 5, 9, 250, -1]
            m_col, sel = index_mask("_row_id", idx, n=n), idx
        else:
            flags = local_pdf["key"].to_numpy() % 2 == 0
            m_col, sel = bool_array_mask("_row_id", flags), flags
        got = {r["key"]: r["val"]
               for r in GroupBy(sdf, "key").sum("val", mask=m_col).collect()}
        sub = local_pdf.iloc[sel]
        exp = sub.groupby("key")["val"].sum()
        # groups with zero unmasked rows drop (reference core.py:704-717)
        exp = exp[sub.groupby("key")["val"].count() > 0]
        assert set(got) == set(exp.index)
        for k, e in exp.items():
            assert got[k] == pytest.approx(e, rel=1e-9), k


class TestPolarsIngestion:
    """Polars container branch (reference util.py:24-33, 680-682 accepts
    pl.Series/pl.DataFrame/pl.LazyFrame). polars isn't installed in this
    container, so the branch is exercised through a minimal in-test double
    that implements the exact contract the branch consumes — ``to_arrow()``
    (the real polars API) — registered as ``sys.modules['polars']``. With
    real polars installed the same tests run against it unchanged."""

    @pytest.fixture()
    def pl(self, monkeypatch):
        try:
            import polars as real_pl
            return real_pl
        except ImportError:
            pass
        import sys
        import types

        import pyarrow as pa

        mod = types.ModuleType("polars")

        class Series:
            def __init__(self, name, values):
                self.name, self._values = name, list(values)

            def __len__(self):
                return len(self._values)

            def __getitem__(self, i):
                return self._values[i]

            def to_arrow(self):
                return pa.array(self._values)

        class DataFrame:
            def __init__(self, data):
                self._data = dict(data)

            def __len__(self):
                return len(next(iter(self._data.values())))

            def to_arrow(self):
                return pa.table(self._data)

        class LazyFrame:
            def __init__(self, df):
                self._df = df

            def collect(self):
                return self._df

        mod.Series, mod.DataFrame, mod.LazyFrame = Series, DataFrame, LazyFrame
        monkeypatch.setitem(sys.modules, "polars", mod)
        return mod

    def test_polars_series(self, spark, pl):
        s = pl.Series("vals", [1, 2, None, 4])
        sdf = from_arrays(spark, s)
        rows = sorted(map(tuple, sdf.collect()))
        assert rows == [(0, 1), (1, 2), (2, None), (3, 4)]
        assert sdf.columns == ["_row_id", "vals"]

    def test_polars_dataframe(self, spark, pl):
        df = pl.DataFrame({"k": [1, 1, 2], "v": [10.0, None, 30.0]})
        sdf = from_arrays(spark, df)
        assert sdf.columns == ["_row_id", "k", "v"]
        rows = sorted(map(tuple, sdf.collect()))
        assert rows == [(0, 1, 10.0), (1, 1, None), (2, 2, 30.0)]

    def test_polars_lazyframe(self, spark, pl):
        lf = pl.LazyFrame(pl.DataFrame({"a": [5, 6]}))
        rows = sorted(map(tuple, from_arrays(spark, lf).collect()))
        assert rows == [(0, 5), (1, 6)]

    def test_polars_series_in_mapping(self, spark, pl):
        sdf = from_arrays(spark, {"x": pl.Series("ignored", [7, 8])})
        assert sdf.columns == ["_row_id", "x"]
        assert sorted(map(tuple, sdf.collect())) == [(0, 7), (1, 8)]
