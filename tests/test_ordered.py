"""Ordered operators: cumulative, rolling, shift/diff, sessionization.
Small deterministic fixtures mirroring the reference kernel tests
(reference test_numba.py:649-823 shapes)."""

import pyspark.sql.functions as F
import pytest

from pandas_plus_spark import GroupBy


@pytest.fixture(scope="module")
def ordered_df(spark):
    rows = [
        # (rid, key, val)
        (0, 0, 1.0),
        (1, 0, 2.0),
        (2, 0, 3.0),
        (3, 1, 4.0),
        (4, 1, 5.0),
        (5, 1, 6.0),
    ]
    return spark.createDataFrame(rows, "rid long, key long, val double")


@pytest.fixture(scope="module")
def null_ordered_df(spark):
    rows = [
        (0, 0, 1.0),
        (1, 0, None),
        (2, 0, 3.0),
        (3, 0, 4.0),
    ]
    return spark.createDataFrame(rows, "rid long, key long, val double")


def col_by_rid(df, col):
    return {r["rid"]: r[col] for r in df.collect()}


class TestCumulative:
    def test_cumsum(self, ordered_df):
        d = col_by_rid(GroupBy(ordered_df, "key", order_by="rid").cumsum("val"),
                       "val_cumsum")
        assert [d[i] for i in range(6)] == [1, 3, 6, 4, 9, 15]

    def test_cumsum_skipna(self, null_ordered_df):
        g = GroupBy(null_ordered_df, "key", order_by="rid")
        d = col_by_rid(g.cumsum("val"), "val_cumsum")
        assert [d[i] for i in range(4)] == [1, 1, 4, 8]  # null passes through

    def test_cumsum_no_skipna_propagates(self, null_ordered_df):
        g = GroupBy(null_ordered_df, "key", order_by="rid")
        d = col_by_rid(g.cumsum("val", skip_na=False), "val_cumsum")
        assert d[0] == 1 and d[1] is None and d[2] is None and d[3] is None

    def test_cummin_cummax(self, ordered_df):
        g = GroupBy(ordered_df, "key", order_by="rid")
        dmin = col_by_rid(g.cummin("val"), "val_cummin")
        dmax = col_by_rid(g.cummax("val"), "val_cummax")
        assert [dmin[i] for i in range(3)] == [1, 1, 1]
        assert [dmax[i] for i in range(3)] == [1, 2, 3]

    def test_cumcount(self, ordered_df):
        d = col_by_rid(GroupBy(ordered_df, "key", order_by="rid").cumcount(),
                       "cumcount")
        assert [d[i] for i in range(6)] == [0, 1, 2, 0, 1, 2]

    def test_cumcount_mask_reference_fixture(self, spark):
        # exact fixture from reference test_numba.py:885-896:
        # keys [0,0,0,1,1,1], mask [T,F,T,T,T,F] → [0,0,1,0,1,1]
        rows = [(i, k, m) for i, (k, m) in enumerate(
            zip([0, 0, 0, 1, 1, 1], [True, False, True, True, True, False]))]
        df = spark.createDataFrame(rows, "rid long, key long, m boolean")
        import pyspark.sql.functions as F
        d = col_by_rid(GroupBy(df, "key", order_by="rid").cumcount(mask=F.col("m")),
                       "cumcount")
        assert [d[i] for i in range(6)] == [0, 0, 1, 0, 1, 1]

    def test_cumsum_mask_passthrough(self, ordered_df):
        g = GroupBy(ordered_df, "key", order_by="rid")
        d = col_by_rid(g.cumsum("val", mask=F.col("rid") != 1), "val_cumsum")
        # masked row emits running value but doesn't contribute
        assert [d[i] for i in range(3)] == [1, 1, 4]


class TestRolling:
    def test_rolling_sum_window2(self, ordered_df):
        g = GroupBy(ordered_df, "key", order_by="rid")
        d = col_by_rid(g.rolling_sum("val", window=2), "val_rolling_sum")
        assert d[0] is None  # min_periods defaults to window
        assert [d[i] for i in (1, 2, 4, 5)] == [3, 5, 9, 11]

    def test_rolling_min_periods(self, ordered_df):
        g = GroupBy(ordered_df, "key", order_by="rid")
        d = col_by_rid(g.rolling_sum("val", window=2, min_periods=1),
                       "val_rolling_sum")
        assert [d[i] for i in range(3)] == [1, 3, 5]

    def test_rolling_mean_counts_non_null(self, null_ordered_df):
        g = GroupBy(null_ordered_df, "key", order_by="rid")
        d = col_by_rid(g.rolling_mean("val", window=2, min_periods=2),
                       "val_rolling_mean")
        # window (1.0, NULL) has 1 non-null < min_periods → NULL
        assert d[1] is None
        assert d[3] == pytest.approx(3.5)

    def test_rolling_window_larger_than_group(self, ordered_df):
        g = GroupBy(ordered_df, "key", order_by="rid")
        d = col_by_rid(g.rolling_max("val", window=10, min_periods=1),
                       "val_rolling_max")
        assert [d[i] for i in range(3)] == [1, 2, 3]

    def test_rolling_mask_excludes_from_buffer(self, spark):
        # reference circular-buffer semantics (numba.py:1196-1246): masked
        # rows don't enter the window; every row emits the rolling value as
        # of the latest observation at or before it.
        rows = [(0, 0, 1.0, True), (1, 0, 100.0, False), (2, 0, 2.0, True),
                (3, 0, 3.0, True), (4, 0, 200.0, False)]
        df = spark.createDataFrame(rows, "rid long, key long, val double, m boolean")
        g = GroupBy(df, "key", order_by="rid")
        d = col_by_rid(
            g.rolling_sum("val", window=2, mask=F.col("m"), min_periods=1),
            "val_rolling_sum")
        # obs sequence: 1, 2, 3 → rolling2: [1], [1+2], [2+3]
        assert d[0] == 1.0
        assert d[1] == 1.0    # masked row emits value as of last obs
        assert d[2] == 3.0
        assert d[3] == 5.0
        assert d[4] == 5.0
        # row before any observation → null
        rows2 = [(0, 0, 9.0, False), (1, 0, 1.0, True)]
        df2 = spark.createDataFrame(rows2, "rid long, key long, val double, m boolean")
        d2 = col_by_rid(
            GroupBy(df2, "key", order_by="rid").rolling_sum(
                "val", window=2, mask=F.col("m"), min_periods=1),
            "val_rolling_sum")
        assert d2[0] is None and d2[1] == 1.0

    def test_shift_diff(self, ordered_df):
        g = GroupBy(ordered_df, "key", order_by="rid")
        ds = col_by_rid(g.shift("val"), "val_shift")
        assert ds[0] is None and ds[1] == 1 and ds[3] is None and ds[4] == 4
        dd = col_by_rid(g.diff("val"), "val_diff")
        assert dd[0] is None and dd[1] == 1 and dd[5] == 1


class TestSessionize:
    def test_group_nearby_members(self, spark):
        # reference F7 fixture shape: gaps ≤ and > max_diff interleaved keys
        rows = [(0, 0.0), (0, 1.0), (1, 10.0), (1, 11.0), (0, 2.0), (1, 30.0), (0, 50.0)]
        df = spark.createDataFrame(rows, "key long, t double")
        out = GroupBy(df, "key").group_nearby_members("t", max_diff=5)
        sess = {(r["key"], r["t"]): r["session_id"] for r in out.collect()}
        assert sess[(0, 0.0)] == sess[(0, 1.0)] == sess[(0, 2.0)]
        assert sess[(0, 50.0)] != sess[(0, 0.0)]
        assert sess[(1, 10.0)] == sess[(1, 11.0)]
        assert sess[(1, 30.0)] != sess[(1, 10.0)]


class TestCumprod:
    """GroupBy.cumprod (pandas-parity extra) against pandas semantics."""

    def test_matches_pandas(self, spark):
        import pandas as pd
        pdf = pd.DataFrame({
            "rid": range(6), "k": [0, 0, 0, 1, 1, 1],
            "v": [2.0, None, 3.0, 1.5, 2.0, None],
        })
        sdf = spark.createDataFrame(pdf)
        from pandas_plus_spark import GroupBy
        out = GroupBy(sdf, "k", order_by="rid").cumprod("v")
        got = {r.rid: r.v_cumprod for r in out.collect()}
        want = pdf.sort_values("rid").groupby("k").v.cumprod()
        for rid in pdf.rid:
            w = want[rid]
            if pd.isna(w):
                # pandas emits NaN AT null rows; the engine's skip_na
                # window product SKIPS nulls (sum semantics) — the engine
                # emits the running product of prior observations there
                continue
            assert abs(got[rid] - w) < 1e-12, rid

    def test_skip_na_false_propagates(self, spark):
        from pandas_plus_spark import GroupBy
        sdf = spark.createDataFrame(
            [(0, 0, 2.0), (1, 0, None), (2, 0, 3.0)],
            "rid long, k long, v double")
        out = GroupBy(sdf, "k", order_by="rid").cumprod("v", skip_na=False)
        got = {r.rid: r.v_cumprod for r in out.collect()}
        assert got[0] == 2.0 and got[1] is None and got[2] is None

    def test_masked_rows_pass_through(self, spark):
        import pyspark.sql.functions as F
        from pandas_plus_spark import GroupBy
        sdf = spark.createDataFrame(
            [(0, 0, 2.0), (1, 0, 100.0), (2, 0, 3.0)],
            "rid long, k long, v double")
        out = GroupBy(sdf, "k", order_by="rid").cumprod(
            "v", mask=F.col("v") < 50)
        got = {r.rid: r.v_cumprod for r in out.collect()}
        assert got[0] == 2.0 and got[1] == 2.0 and got[2] == 6.0


class TestRollingCorrCov:
    """r14: trailing-window pairwise cov/corr (windowed-sum
    decomposition, pairwise-complete rows) must match pandas
    rolling().cov()/.corr(), incl. NULLs excluded pairwise and NULL
    (pandas NaN) at zero variance or under min_periods."""

    def _fixture(self, spark):
        import numpy as np
        rng = np.random.RandomState(11)
        rows = []
        for i in range(200):
            x = None if rng.rand() < 0.12 else float(rng.rand() * 10)
            y = None if rng.rand() < 0.12 else float(x or 0) * 0.5 \
                + float(rng.rand())
            rows.append((int(rng.randint(0, 3)), i, x, y))
        return rows, spark.createDataFrame(rows,
                                           "g int, o int, x double, y double")

    def test_matches_pandas(self, spark):
        import math

        import pandas as pd

        from pandas_plus_spark.groupby import GroupBy
        rows, df = self._fixture(spark)
        gb = GroupBy(df, "g", order_by="o")
        got_c = {r.o: r.x_y_rolling_cov
                 for r in gb.rolling_cov("x", "y", window=6,
                                         min_periods=3).collect()}
        got_r = {r.o: r.x_y_rolling_corr
                 for r in gb.rolling_corr("x", "y", window=6,
                                          min_periods=3).collect()}
        pdf = pd.DataFrame(rows, columns=["g", "o", "x", "y"])
        want_c = pdf.groupby("g", group_keys=False).apply(
            lambda d: d["x"].rolling(6, min_periods=3).cov(d["y"]))
        want_r = pdf.groupby("g", group_keys=False).apply(
            lambda d: d["x"].rolling(6, min_periods=3).corr(d["y"]))
        for i in range(200):
            for got, want in ((got_c[i], want_c[i]), (got_r[i], want_r[i])):
                if isinstance(want, float) and math.isnan(want):
                    assert got is None, i
                else:
                    assert got is not None and abs(got - want) < 1e-10, i

    def test_zero_variance_and_min_pairs(self, spark):
        from pandas_plus_spark.groupby import GroupBy
        df = spark.createDataFrame(
            [(0, 0, 1.0, 2.0), (0, 1, 1.0, 5.0), (0, 2, 1.0, 7.0),
             (0, 3, 2.0, 1.0)],
            "g int, o int, x double, y double")
        gb = GroupBy(df, "g", order_by="o")
        corr = {r.o: r.x_y_rolling_corr
                for r in gb.rolling_corr("x", "y", window=3,
                                         min_periods=2).collect()}
        # rows 1-2: x constant in window -> zero variance -> NULL;
        # row 0: only 1 pair (floor 2) -> NULL; row 3: x varies -> real
        assert corr[0] is None and corr[1] is None and corr[2] is None
        assert corr[3] is not None

    def test_mask_and_facades(self, spark):
        import pyspark.sql.functions as F

        from pandas_plus_spark.groupby import GroupBy
        rows, df = self._fixture(spark)
        gb = GroupBy(df, "g", order_by="o")
        # facade == direct
        a = {r.o: r.x_y_rolling_cov
             for r in gb.rolling(6, min_periods=3).cov("x", "y").collect()}
        b = {r.o: r.x_y_rolling_cov
             for r in gb.rolling_cov("x", "y", window=6,
                                     min_periods=3).collect()}
        assert a == b
        # mask: window spans the last 6 UNMASKED rows; masked rows
        # still emit (value as of the last observation before them)
        out = {r.o: r.x_y_rolling_cov
               for r in gb.rolling_cov("x", "y", window=6, mask=F.col("o") % 5 != 0,
                                       min_periods=3).collect()}
        assert len(out) == 200
        # expanding pair stats exist and respect min_periods
        e = {r.o: r.x_y_expanding_corr
             for r in gb.expanding(min_periods=4).corr("x", "y").collect()}
        assert len(e) == 200

    def test_scale_form_matches_window_form(self, spark):
        # grouped_rolling_cov/corr (range-partition prefix differences)
        # must equal the window form across partition counts, incl.
        # partition-boundary frames and pairwise-incomplete rows
        import math

        from pandas_plus_spark.functions.ordered import (
            grouped_rolling_corr, grouped_rolling_cov)
        from pandas_plus_spark.groupby import GroupBy
        rows, df = self._fixture(spark)
        gb = GroupBy(df, "g", order_by="o")
        want_c = {r.o: r.x_y_rolling_cov
                  for r in gb.rolling_cov("x", "y", window=6,
                                          min_periods=3).collect()}
        want_r = {r.o: r.x_y_rolling_corr
                  for r in gb.rolling_corr("x", "y", window=6,
                                           min_periods=3).collect()}
        for nparts in (1, 3, 16):
            got_c = {r.o: r.x_y_rolling_cov for r in grouped_rolling_cov(
                df, "g", "o", "x", "y", window=6, min_periods=3,
                num_partitions=nparts).collect()}
            got_r = {r.o: r.x_y_rolling_corr for r in grouped_rolling_corr(
                df, "g", "o", "x", "y", window=6, min_periods=3,
                num_partitions=nparts).collect()}
            for i in range(200):
                for got, want in ((got_c[i], want_c[i]),
                                  (got_r[i], want_r[i])):
                    if want is None:
                        assert got is None, (nparts, i)
                    else:
                        assert got is not None and not math.isnan(got) \
                            and abs(got - want) < 1e-10, (nparts, i)

    def test_mask_matches_prefiltered(self, spark):
        import pyspark.sql.functions as F

        from pandas_plus_spark.groupby import GroupBy
        rows, df = self._fixture(spark)
        keep = F.col("o") % 4 != 1
        gb = GroupBy(df, "g", order_by="o")
        masked = {r.o: r.x_y_rolling_corr
                  for r in gb.rolling_corr("x", "y", window=5, mask=keep,
                                           min_periods=3).collect()}
        pre = GroupBy(df.where(keep), "g", order_by="o")
        plain = {r.o: r.x_y_rolling_corr
                 for r in pre.rolling_corr("x", "y", window=5,
                                           min_periods=3).collect()}
        # on unmasked rows the masked path equals the prefiltered run
        for o, v in plain.items():
            m = masked[o]
            if v is None:
                assert m is None, o
            else:
                assert m is not None and abs(m - v) < 1e-12, o

    def test_large_offset_robustness(self, spark):
        # r15 adversarial: values 1e12 + O(1) noise. The unanchored
        # Σxy − ΣxΣy/n decomposition returned pure garbage here
        # (measured rel err ~1e38; pandas' own rolling().cov() ships
        # ~1e8 absolute error and even float64 np.cov is only good to
        # ~5e-6 relative on this fixture), so the reference is a
        # FLOAT128 mean-subtracted direct computation. Per-group min
        # anchoring must hold both forms to ~1e-9 relative (measured
        # ~1e-13).
        import numpy as np
        import pandas as pd

        from pandas_plus_spark.functions.ordered import grouped_rolling_cov
        from pandas_plus_spark.groupby import GroupBy
        rng = np.random.RandomState(7)
        n, w = 200, 20
        pdf = pd.DataFrame({
            "g": ["a"] * n, "o": np.arange(n),
            "x": 1e12 + rng.randn(n),
            "y": 1e12 + 0.5 * rng.randn(n) + 0.3 * rng.randn(n)})
        xs = pdf["x"].values.astype(np.float128)
        ys = pdf["y"].values.astype(np.float128)
        ref_cov = np.full(n, np.nan)
        ref_corr = np.full(n, np.nan)
        for t in range(w - 1, n):
            sx, sy = xs[t - w + 1:t + 1], ys[t - w + 1:t + 1]
            dx, dy = sx - sx.mean(), sy - sy.mean()
            cxy = np.sum(dx * dy) / (w - 1)
            ref_cov[t] = float(cxy)
            ref_corr[t] = float(cxy / np.sqrt(
                (np.sum(dx * dx) / (w - 1)) * (np.sum(dy * dy) / (w - 1))))
        df = spark.createDataFrame(pdf)
        gb = GroupBy(df, "g", order_by="o")
        got = gb.rolling_cov("x", "y", window=w, min_periods=w).orderBy(
            "o").toPandas()["x_y_rolling_cov"].values
        assert np.nanmax(np.abs(got - ref_cov)
                         / np.abs(ref_cov)) < 1e-9
        gotc = gb.rolling_corr("x", "y", window=w, min_periods=w).orderBy(
            "o").toPandas()["x_y_rolling_corr"].values
        assert np.nanmax(np.abs(gotc - ref_corr)) < 1e-9
        gots = grouped_rolling_cov(
            df, "g", "o", "x", "y", window=w, min_periods=w,
            num_partitions=4).orderBy("o").toPandas()[
            "x_y_rolling_cov"].values
        assert np.nanmax(np.abs(gots - ref_cov)
                         / np.abs(ref_cov)) < 1e-9

    def test_ewm_var_large_offset(self, spark):
        # ewm var/std share the cancellation class; anchored scan must
        # hold ~1e-6 at 1e12 offsets where pandas' own ewm().var() is
        # ~2e-4 off the stable direct computation. The moments mean
        # (anchored sums + add-back) must stay exact-scale too.
        import numpy as np
        import pandas as pd

        from pandas_plus_spark.groupby import GroupBy
        rng = np.random.RandomState(11)
        n, alpha = 250, 0.1
        xs = 1e12 + rng.randn(n)
        pdf = pd.DataFrame({"g": ["a"] * n, "o": np.arange(n), "x": xs})
        r = 1 - alpha
        ref = np.full(n, np.nan)
        for t in range(1, n):
            wts = r ** np.arange(t, -1, -1.0)
            m = np.sum(wts * xs[:t + 1]) / np.sum(wts)
            w1, w2 = np.sum(wts), np.sum(wts * wts)
            if w1 * w1 > w2:
                ref[t] = (w1 * w1 / (w1 * w1 - w2)
                          * np.sum(wts * (xs[:t + 1] - m) ** 2) / w1)
        gb = GroupBy(spark.createDataFrame(pdf), "g", order_by="o")
        got = gb.ewm_var("x", alpha=alpha).orderBy("o").toPandas()[
            "x_ewm_var"].values
        assert np.nanmax(np.abs(got[1:] - ref[1:])
                         / np.abs(ref[1:])) < 1e-6
        mom = gb.ewm_moments("x", alpha=alpha).orderBy("o").toPandas()
        ref_m = pdf["x"].ewm(alpha=alpha).mean().values
        assert np.nanmax(np.abs(mom["x_ewm"].values - ref_m)
                         / np.abs(ref_m)) < 1e-12
        assert np.nanmax(np.abs(mom["x_ewm_var"].values[1:] - ref[1:])
                         / np.abs(ref[1:])) < 1e-6

    def test_scale_form_carries_cache_handle(self, spark):
        # r15 advisory: the prefix pass pins an intermediate; the
        # final join must re-attach _pps_cached so release_cached on
        # the RESULT frees it (the handle does not survive .join()).
        # r16: the pin is a lineage cut (localCheckpoint blocks on the
        # handle's _pps_ckpt_rdd), not a CacheManager entry.
        from pandas_plus_spark.functions.ordered import grouped_rolling_cov
        from pandas_plus_spark.util import release_cached
        _, df = self._fixture(spark)
        out = grouped_rolling_cov(df, "g", "o", "x", "y", window=6,
                                  min_periods=3, num_partitions=3)
        handles = getattr(out, "_pps_cached", ())
        assert handles, "result lost the pinned-prefix cache handle"
        out.collect()

        def pinned(h):
            rdd = getattr(h, "_pps_ckpt_rdd", None)
            if rdd is not None:
                lvl = rdd.getStorageLevel()
                return lvl.useMemory() or lvl.useDisk()
            return h.is_cached

        assert any(pinned(h) for h in handles)
        release_cached(out)
        assert not any(pinned(h) for h in handles)


class TestRollingQuantile:
    """r13: trailing-window exact median/quantile (windowed percentile,
    linear interpolation) must match pandas rolling().median()/
    .quantile(interpolation='linear'), including NULL rows occupying
    window slots while being skipped by the stat and min_periods."""

    def _fixture(self, spark):
        import numpy as np
        rng = np.random.RandomState(7)
        rows = [(int(rng.randint(0, 3)), i,
                 None if rng.rand() < 0.15 else float(rng.rand() * 10))
                for i in range(200)]
        return rows, spark.createDataFrame(rows, "g int, o int, v double")

    def test_matches_pandas(self, spark):
        import math

        import pandas as pd

        from pandas_plus_spark.groupby import GroupBy
        rows, df = self._fixture(spark)
        gb = GroupBy(df, "g", order_by="o")
        got_m = {r.o: r.v_rolling_median
                 for r in gb.rolling_median("v", window=5,
                                            min_periods=3).collect()}
        got_q = {r.o: r.v_rolling_quantile
                 for r in gb.rolling_quantile(0.7, "v", window=5,
                                              min_periods=3).collect()}
        pdf = pd.DataFrame(rows, columns=["g", "o", "v"])
        want_m = pdf.groupby("g")["v"].rolling(5, min_periods=3).median() \
            .reset_index(0, drop=True)
        want_q = pdf.groupby("g")["v"].rolling(5, min_periods=3) \
            .quantile(0.7, interpolation="linear").reset_index(0, drop=True)
        for i in range(200):
            for got, want in ((got_m[i], want_m[i]), (got_q[i], want_q[i])):
                if isinstance(want, float) and math.isnan(want):
                    assert got is None, i
                else:
                    assert got is not None and abs(got - want) < 1e-12, i

    def test_facades_and_validation(self, spark):
        import pytest as _pt

        from pandas_plus_spark.groupby import GroupBy
        _, df = self._fixture(spark)
        gb = GroupBy(df, "g", order_by="o")
        r = gb.rolling(5, min_periods=3)
        a = {x.o: x.v_rolling_median for x in r.median("v").collect()}
        b = {x.o: x.v_rolling_median
             for x in gb.rolling_median("v", window=5,
                                        min_periods=3).collect()}
        assert a == b
        q = {x.o: x.v_rolling_quantile for x in r.quantile(0.7, "v").collect()}
        assert len(q) == 200
        e = gb.expanding(min_periods=2)
        em = {x.o: x.v_expanding_median for x in e.median("v").collect()}
        # expanding median at min_periods=2 over the whole prefix
        import pandas as pd
        pdf = pd.DataFrame(self._fixture(spark)[0], columns=["g", "o", "v"])
        want = pdf.groupby("g")["v"].expanding(min_periods=2).median() \
            .reset_index(0, drop=True)
        import math
        for i in range(200):
            if isinstance(want[i], float) and math.isnan(want[i]):
                assert em[i] is None, i
            else:
                assert em[i] is not None and abs(em[i] - want[i]) < 1e-12, i
        with _pt.raises(ValueError):
            gb.rolling_quantile(1.5, "v", window=5)
