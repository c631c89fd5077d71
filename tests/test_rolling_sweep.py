"""Rolling/cumulative parameter sweep vs pandas oracle — the reference's F6
fixture pattern (FIXTURES.md: 1000-group random data, window ∈ {1,2,5,50},
min_periods ∈ {1, w//2, w}, seeded)."""

import numpy as np
import pandas as pd
import pytest

from pandas_plus_spark import GroupBy


@pytest.fixture(scope="module")
def rolling_pdf():
    rng = np.random.default_rng(42)
    n = 4000
    pdf = pd.DataFrame({
        "rid": np.arange(n),
        "key": rng.integers(0, 50, n),
        "val": rng.standard_normal(n),
    })
    # intersperse NULLs (reference test_numba.py:703-718)
    pdf.loc[pdf.index % 11 == 0, "val"] = np.nan
    return pdf


@pytest.fixture(scope="module")
def rolling_sdf(spark, rolling_pdf):
    return spark.createDataFrame(rolling_pdf).persist()


@pytest.mark.parametrize("window,min_periods", [(1, 1), (2, 1), (5, 2), (5, 5), (50, 25)])
@pytest.mark.parametrize("func", ["sum", "mean", "min", "max"])
def test_rolling_matches_pandas(rolling_sdf, rolling_pdf, func, window, min_periods):
    got_df = getattr(GroupBy(rolling_sdf, "key", order_by="rid"),
                     f"rolling_{func}")("val", window=window, min_periods=min_periods)
    got = {r["rid"]: r[f"val_rolling_{func}"] for r in got_df.collect()}

    srt = rolling_pdf.sort_values("rid")
    exp = getattr(
        srt.groupby("key")["val"].rolling(window, min_periods=min_periods), func)()
    exp.index = exp.index.get_level_values(1)
    for rid in srt["rid"]:
        e = exp.loc[rid]
        g = got[rid]
        if np.isnan(e):
            assert g is None, (rid, g, e)
        else:
            assert g == pytest.approx(e, rel=1e-9), (rid, g, e)


@pytest.mark.parametrize("func", ["cumsum", "cummax", "cummin"])
def test_cumulative_matches_reference_semantics(rolling_sdf, rolling_pdf, func):
    """NB: not the pandas semantics — the reference emits the RUNNING value
    at NaN rows with skip_na=True (reference test_numba.py:839-848 expects
    [1, 1, 4, ...] for values [1, nan, 3, ...]), pandas emits NaN there."""
    got_df = getattr(GroupBy(rolling_sdf, "key", order_by="rid"), func)("val")
    got = {r["rid"]: r[f"val_{func}"] for r in got_df.collect()}

    op = {"cumsum": lambda a, v: a + v,
          "cummax": max, "cummin": min}[func]
    acc: dict = {}
    srt = rolling_pdf.sort_values("rid")
    for rid, key, v in zip(srt["rid"], srt["key"], srt["val"]):
        if not np.isnan(v):
            acc[key] = op(acc[key], v) if key in acc else v
        e = acc.get(key)  # running value (None before first non-null)
        g = got[rid]
        if e is None:
            assert g is None, (rid, g)
        else:
            assert g == pytest.approx(e, rel=1e-9), (rid, g, e)


def test_shift_diff_match_pandas(rolling_sdf, rolling_pdf):
    g = GroupBy(rolling_sdf, "key", order_by="rid")
    got_s = {r["rid"]: r["val_shift"] for r in g.shift("val").collect()}
    got_d = {r["rid"]: r["val_diff"] for r in g.diff("val").collect()}
    srt = rolling_pdf.sort_values("rid")
    exp_s = srt.groupby("key")["val"].shift(1)
    exp_d = srt.groupby("key")["val"].diff(1)
    for rid, es, ed in zip(srt["rid"], exp_s, exp_d):
        assert (got_s[rid] is None) == bool(np.isnan(es))
        if not np.isnan(es):
            assert got_s[rid] == pytest.approx(es)
        if not np.isnan(ed):
            assert got_d[rid] == pytest.approx(ed)


@pytest.mark.parametrize("window", [1, 2, 5])
def test_shift_diff_masked_matches_reference_kernel(rolling_sdf, rolling_pdf, window):
    """Reference numba.py:1534-1583: masked rows emit null and never enter
    the circular buffer; unmasked rows lag over unmasked observations only."""
    import pyspark.sql.functions as F

    mask_expr = F.col("rid") % 3 != 0
    g = GroupBy(rolling_sdf, "key", order_by="rid")
    got_s = {r["rid"]: r["val_shift"]
             for r in g.shift("val", window=window, mask=mask_expr).collect()}
    got_d = {r["rid"]: r["val_diff"]
             for r in g.diff("val", window=window, mask=mask_expr).collect()}

    def check(rid, g_val, e_val):
        if e_val is None or (isinstance(e_val, float) and np.isnan(e_val)):
            assert g_val is None, (rid, g_val, e_val)
        else:
            assert g_val == pytest.approx(e_val, rel=1e-9), (rid, g_val, e_val)

    buf: dict = {}
    srt = rolling_pdf.sort_values("rid")
    for rid, key, v in zip(srt["rid"], srt["key"], srt["val"]):
        if rid % 3 == 0:  # masked: null out, value never buffered
            e_s = e_d = None
        else:
            hist = buf.setdefault(key, [])
            lagged = hist[-window] if len(hist) >= window else np.nan
            e_s = lagged
            e_d = v - lagged
            hist.append(v)
        check(rid, got_s[rid], e_s)
        check(rid, got_d[rid], e_d)


class TestRollingTime:
    def test_range_frame_values(self, spark):
        from pandas_plus_spark import GroupBy
        import pyspark.sql.functions as F
        rows = [  # (key, t, v) — gaps and a timestamp tie at t=40
            (1, 10, 1.0), (1, 20, 2.0), (1, 40, 4.0), (1, 40, 8.0),
            (1, 100, 16.0), (2, 10, 1.0),
        ]
        df = spark.createDataFrame(rows, "k long, t long, v double")
        out = GroupBy(df, "k", order_by="t").rolling_time(
            "v", on="t", window=30, funcs=("sum", "count"))
        got = {(r["k"], r["t"], r["v"]): (r["v_tsum"], r["v_tcount"])
               for r in out.collect()}
        assert got[(1, 10, 1.0)] == (1.0, 1)
        assert got[(1, 20, 2.0)] == (3.0, 2)       # 10 and 20 in [−10, 20]
        # closed interval + peer rows: t=40 frame covers {10,20,40,40}
        assert got[(1, 40, 4.0)] == (15.0, 4)
        assert got[(1, 40, 8.0)] == (15.0, 4)      # tie rows share the frame
        assert got[(1, 100, 16.0)] == (16.0, 1)    # gap: nothing in [70,100)
        assert got[(2, 10, 1.0)] == (1.0, 1)

    def test_min_periods_guard(self, spark):
        from pandas_plus_spark import GroupBy
        rows = [(1, 10, 1.0), (1, 50, None), (1, 60, 2.0)]
        df = spark.createDataFrame(rows, "k long, t long, v double")
        out = GroupBy(df, "k", order_by="t").rolling_time(
            "v", on="t", window=30, funcs=("sum",), min_periods=2)
        got = {r["t"]: r["v_tsum"] for r in out.collect()}
        # t=60 frame holds rows {50,60} but only ONE non-null value
        assert got[60] is None
        assert got[10] is None  # single row < min_periods
