"""GroupScatter facade: distributed binning/fit/R² + optional rendering.

Reference plotting/group_scatter.py:12-116; statistics must come from
distributed aggregations, with only the ≤ n_groups binned frame and the
coefficient list reaching the driver.
"""

import pytest

from pandas_plus_spark.plotting import GroupScatter, linear_fit, r_squared


@pytest.fixture(scope="module")
def xy(spark):
    # y = 3 + 2x + small deterministic wiggle
    rows = [(float(i), 3.0 + 2.0 * i + ((-1) ** i) * 0.25) for i in range(200)]
    return spark.createDataFrame(rows, "x double, y double")


class TestGroupScatter:
    def test_stats_and_fit(self, xy):
        gs = GroupScatter(xy, "x", "y", n_groups=10)
        pdf = gs.to_pandas()
        assert len(pdf) == 10
        assert (pdf["n"] == 20).all()  # equal-count bins
        c0, c1 = gs.regression_coefs
        assert c0 == pytest.approx(3.0, abs=0.05)
        assert c1 == pytest.approx(2.0, abs=0.01)
        assert gs.r_squared == pytest.approx(1.0, abs=1e-4)

    def test_filter_and_nulls(self, spark):
        rows = [(1.0, 2.0), (2.0, None), (None, 5.0), (3.0, 6.0), (50.0, 1.0)]
        df = spark.createDataFrame(rows, "x double, y double")
        gs = GroupScatter(df, "x", "y", n_groups=3, filter="x < 10")
        assert int(gs.to_pandas()["n"].sum()) == 2  # null rows + filtered out

    def test_r_squared_perfect_line(self, spark):
        df = spark.createDataFrame(
            [(float(i), 1.0 + 4.0 * i) for i in range(50)], "x double, y double")
        coefs = linear_fit(df, "x", "y")
        assert r_squared(df, "x", "y", coefs) == pytest.approx(1.0)

    def test_plot_path_executes(self, xy, tmp_path, monkeypatch):
        """GroupScatter.plot EXECUTES end-to-end — against real matplotlib
        when installed, else against a minimal double implementing the
        exact pyplot surface plot() consumes (subplots -> (fig, ax),
        ax.plot) — and the rendered artists carry the right data: the
        per-bin means as points and the fitted line evaluated at the bin
        means. This is the content assertion the Agg smoke can't make."""
        import sys
        import types

        calls = []
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot  # noqa: F401
            real = True
        except ImportError:
            real = False
            mpl = types.ModuleType("matplotlib")
            pyplot = types.ModuleType("matplotlib.pyplot")

            class _Fig:
                def savefig(self, path, **kw):
                    with open(path, "wb") as fh:
                        fh.write(b"\x89PNGfake")

            class _Ax:
                def __init__(self):
                    self.figure = _Fig()

                def plot(self, xs, ys, *a, **kw):
                    calls.append((list(xs), list(ys)))

            pyplot.subplots = lambda *a, **kw: (_Fig(), _Ax())
            mpl.pyplot = pyplot
            monkeypatch.setitem(sys.modules, "matplotlib", mpl)
            monkeypatch.setitem(sys.modules, "matplotlib.pyplot", pyplot)

        gs = GroupScatter(xy, "x", "y", n_groups=5)
        ax = gs.plot()
        pdf = gs.to_pandas().sort_values("x_mean")
        exp_x = pdf["x_mean"].tolist()
        c0, c1 = gs.regression_coefs
        if real:
            lines = ax.get_lines()
            assert len(lines) == 2
            got = [(list(ln.get_xdata()), list(ln.get_ydata()))
                   for ln in lines]
        else:
            assert len(calls) == 2
            got = calls
        # scatter points = the binned means; fit line = c0 + c1*x at them
        assert got[0][0] == pytest.approx(exp_x)
        assert got[0][1] == pytest.approx(pdf["y_mean"].tolist())
        assert got[1][0] == pytest.approx(exp_x)
        assert got[1][1] == pytest.approx([c0 + c1 * x for x in exp_x],
                                         rel=1e-9)
        ax.figure.savefig(tmp_path / "gs.png")
        assert (tmp_path / "gs.png").stat().st_size > 0

    def test_plot_import_error_is_actionable(self, xy, monkeypatch):
        import builtins
        real_import = builtins.__import__

        def no_mpl(name, *a, **k):
            if name.startswith("matplotlib"):
                raise ImportError("nope")
            return real_import(name, *a, **k)

        monkeypatch.setattr(builtins, "__import__", no_mpl)
        gs = GroupScatter(xy, "x", "y", n_groups=5)
        with pytest.raises(ImportError, match="to_pandas"):
            gs.plot()
