"""Mask-indexing matrix: pin the boolean-Column mask contract across every
aggregation / cumulative / rolling / shift operator family, mirroring the
reference's tests/test_mask_indexing.py sweep (its slice / integer-indexer
mask forms are positional; the documented Spark mapping is a predicate over a
row-id column — ``rid`` here — so the slice/indexer cases below construct
exactly those predicates and the boolean path covers all three forms)."""

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from pandas_plus_spark import GroupBy


@pytest.fixture(scope="module")
def matrix_pdf():
    rng = np.random.default_rng(7)
    n = 600
    pdf = pd.DataFrame({
        "rid": np.arange(n),
        "key": rng.integers(0, 8, n),
        "val": rng.standard_normal(n),
    })
    pdf.loc[pdf.index % 13 == 0, "val"] = np.nan
    return pdf


@pytest.fixture(scope="module")
def matrix_sdf(spark, matrix_pdf):
    return spark.createDataFrame(matrix_pdf).persist()


# boolean form + the documented row-id translations of the reference's
# positional mask forms (slice 100:400, fancy indexer = every 3rd row).
# Column factories are lazy: no active session at import time.
MASKS = {
    "boolean": (lambda: F.col("val") > -0.5, lambda p: p["val"] > -0.5),
    "slice_rid": (lambda: F.col("rid").between(100, 399),
                  lambda p: p["rid"].between(100, 399)),
    "indexer_rid": (lambda: F.col("rid") % 3 == 0, lambda p: p["rid"] % 3 == 0),
}

AGGS = ["sum", "mean", "min", "max", "count", "var", "std", "median",
        "sum_squares", "nunique"]


@pytest.mark.parametrize("mask_name", list(MASKS))
@pytest.mark.parametrize("func", AGGS)
def test_agg_mask_equals_prefilter(matrix_sdf, matrix_pdf, func, mask_name):
    """mask= inside the agg ≡ aggregating the pre-filtered frame (groups
    with zero unmasked rows drop, reference core.py:704-717)."""
    m_fn, m_pd = MASKS[mask_name]
    m_col = m_fn()
    got_df = getattr(GroupBy(matrix_sdf, "key"), func)("val", mask=m_col)
    got = {r["key"]: r["val"] for r in got_df.collect()}
    exp_df = getattr(GroupBy(matrix_sdf.filter(m_col), "key"), func)("val")
    exp = {r["key"]: r["val"] for r in exp_df.collect()}
    assert set(got) == set(exp)
    for k, e in exp.items():
        g = got[k]
        if e is None:
            assert g is None, (k, g)
        else:
            assert g == pytest.approx(e, rel=1e-9, abs=1e-12), (k, g, e)


@pytest.mark.parametrize("mask_name", list(MASKS))
def test_size_mask_counts_not_drops(matrix_sdf, matrix_pdf, mask_name):
    m_fn, m_pd = MASKS[mask_name]
    m_col = m_fn()
    got = {r["key"]: r["size"]
           for r in GroupBy(matrix_sdf, "key").size(mask=m_col).collect()}
    pdf = matrix_pdf
    exp = pdf[m_pd(pdf)].groupby("key").size()
    for k in pdf["key"].unique():
        assert got[k] == int(exp.get(k, 0)), k


@pytest.mark.parametrize("mask_name", list(MASKS))
@pytest.mark.parametrize("func", ["cumsum", "cummax", "cummin"])
def test_cumulative_mask_passthrough(matrix_sdf, matrix_pdf, func, mask_name):
    """Masked rows pass THROUGH the accumulator: they emit the running value
    but do not contribute (reference numba.py:1663-1667)."""
    m_fn, m_pd = MASKS[mask_name]
    m_col = m_fn()
    got_df = getattr(GroupBy(matrix_sdf, "key", order_by="rid"), func)(
        "val", mask=m_col)
    got = {r["rid"]: r[f"val_{func}"] for r in got_df.collect()}

    op = {"cumsum": lambda a, v: a + v, "cummax": max, "cummin": min}[func]
    acc: dict = {}
    pdf = matrix_pdf.sort_values("rid")
    in_mask = m_pd(pdf)
    for rid, key, v, m in zip(pdf["rid"], pdf["key"], pdf["val"], in_mask):
        if m and not np.isnan(v):
            acc[key] = op(acc[key], v) if key in acc else v
        e = acc.get(key)
        g = got[rid]
        if e is None:
            assert g is None, (rid, g)
        else:
            assert g == pytest.approx(e, rel=1e-9), (rid, g, e)


@pytest.mark.parametrize("mask_name", list(MASKS))
@pytest.mark.parametrize("func", ["sum", "mean", "min", "max"])
def test_rolling_mask_excludes_from_buffer(matrix_sdf, matrix_pdf, func, mask_name):
    """Rolling masks EXCLUDE rows from the window buffer (last w unmasked
    observations) while still emitting output at every row
    (reference numba.py:1196-1246)."""
    window, min_periods = 3, 1
    m_fn, m_pd = MASKS[mask_name]
    m_col = m_fn()
    got_df = getattr(GroupBy(matrix_sdf, "key", order_by="rid"),
                     f"rolling_{func}")("val", window=window, mask=m_col,
                                        min_periods=min_periods)
    got = {r["rid"]: r[f"val_rolling_{func}"] for r in got_df.collect()}

    pdf = matrix_pdf.sort_values("rid")
    in_mask = m_pd(pdf)
    buf: dict = {}
    red = {"sum": np.nansum, "mean": np.nanmean, "min": np.nanmin,
           "max": np.nanmax}[func]
    for rid, key, v, m in zip(pdf["rid"], pdf["key"], pdf["val"], in_mask):
        if m:
            buf.setdefault(key, []).append(v)
        win = buf.get(key, [])[-window:]
        n_valid = sum(0 if np.isnan(x) else 1 for x in win)
        if n_valid >= min_periods:
            e = float(red([x for x in win if not np.isnan(x)]))
        else:
            e = None
        g = got[rid]
        if e is None:
            assert g is None, (rid, g)
        else:
            assert g == pytest.approx(e, rel=1e-9), (rid, g, e)


@pytest.mark.parametrize("mask_name", list(MASKS))
def test_shift_mask_nulls_masked_rows(matrix_sdf, matrix_pdf, mask_name):
    """Shift/diff masks: masked rows emit NULL and never enter the lag
    buffer (reference numba.py:1534-1583)."""
    m_fn, m_pd = MASKS[mask_name]
    m_col = m_fn()
    got = {r["rid"]: r["val_shift"]
           for r in GroupBy(matrix_sdf, "key", order_by="rid")
           .shift("val", mask=m_col).collect()}
    pdf = matrix_pdf.sort_values("rid")
    in_mask = m_pd(pdf)
    hist: dict = {}
    for rid, key, v, m in zip(pdf["rid"], pdf["key"], pdf["val"], in_mask):
        if not m:
            e = None
        else:
            h = hist.setdefault(key, [])
            e = h[-1] if h else None
            h.append(v)
        g = got[rid]
        if e is None or (isinstance(e, float) and np.isnan(e)):
            assert g is None, (rid, g, e)
        else:
            assert g == pytest.approx(e, rel=1e-9), (rid, g, e)


def test_by_array_zip_has_no_single_partition_window(spark):
    """The by-array zip path must not plan a global (unpartitioned) window:
    row numbering runs per input partition + broadcast prefix offsets
    (functions/ordered-style), so the physical plan may not contain a
    SinglePartition exchange or a 'Window' with no partition spec feeding
    the grouped aggregate."""
    import numpy as np

    pdf = pd.DataFrame({"val": np.arange(400, dtype="float64")})
    # createDataFrame parallelizes ORDER-PRESERVING across partitions (the
    # zip contract aligns to physical order; a round-robin repartition
    # would scramble it)
    sdf = spark.createDataFrame(pdf)
    assert sdf.rdd.getNumPartitions() > 1
    keys = np.tile(np.arange(4), 100)
    gb = GroupBy(sdf, [keys])
    out = gb.sum("val")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    # sanity: values still correct (value column = last output column)
    got = {r[0]: r[out.columns[-1]] for r in out.collect()}
    exp = {k: float(sum(v for i, v in enumerate(range(400)) if keys[i] == k))
           for k in range(4)}
    for k in range(4):
        assert got[k] == pytest.approx(exp[k])
