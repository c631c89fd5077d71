"""GroupScatter equivalent: quantile-bin x, aggregate y per bin, linear fit.

Reference: plotting/group_scatter.py:12-116 (quantile binning via pandas
qcut, per-bin mean of y, sklearn linear fit, matplotlib plot). Spark-first:
``ntile`` over an ordered window gives exact quantile bins; the per-bin stats
are one aggregation; the regression fit runs on pyspark.ml over the full
data. Plotting itself is a client concern — callers collect the (tiny)
binned frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def binned_scatter_stats(
    df: DataFrame,
    x: str,
    y: str,
    n_bins: int = 20,
    tiebreak: list[str] | None = None,
    method: str = "ntile",
    relative_error: float = 0.0,
) -> DataFrame:
    """(bin, x_mean, y_mean, n) with equal-count bins over x.

    method="ntile": exact equal-count bins with ntile semantics, computed
    by ``functions.ordered.global_ntile`` — range partitioning + prefix
    offsets, NOT a single-task global window, so the exact path is also
    distributed. ``tiebreak`` columns break x duplicates for determinism.

    method="cutpoints": the 100 TB path. Quantile cutpoints via
    ``approxQuantile`` (relative_error=0.0 → exact order statistics; raise it
    for one-pass sketching at extreme scale), then a map-side bucket
    assignment — no global sort, no single-task window; the only shuffle is
    the n_bins-group aggregate. Ties all land in one bucket (unlike ntile,
    which splits equal values to even out counts), so bin counts can be
    uneven under heavy ties and trailing duplicate cutpoints leave empty
    bins."""
    if method == "cutpoints":
        probs = [i / n_bins for i in range(1, n_bins)]
        cuts = df.stat.approxQuantile(x, probs, relative_error)
        bin_expr = F.lit(1)
        for c in cuts:
            bin_expr = bin_expr + (F.col(x) > F.lit(c)).cast("int")
        binned = df.withColumn("bin", bin_expr)
    elif method == "ntile":
        from .functions.ordered import global_ntile
        order = [F.col(x)] + [F.col(c) for c in (tiebreak or [])]
        binned = global_ntile(df, order, n_bins, out="bin")
    else:
        raise ValueError(f"method must be 'ntile' or 'cutpoints', got {method!r}")
    return (
        binned.groupBy("bin")
        .agg(
            F.avg(x).alias("x_mean"),
            F.avg(y).alias("y_mean"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("bin")
    )


def linear_fit(df: DataFrame, x: str, y: str, deg: int = 1) -> list[float]:
    """Least-squares polynomial fit coefficients [c0, c1, ...] computed from
    distributed moments (closed form for deg=1; pyspark.ml for higher).

    deg=1 uses cov/var — a single aggregation pass, no ML pipeline needed.
    """
    if deg == 1:
        row = df.agg(
            F.avg(x).alias("mx"),
            F.avg(y).alias("my"),
            F.covar_samp(x, y).alias("cxy"),
            F.var_samp(x).alias("vx"),
        ).first()
        slope = row.cxy / row.vx
        return [row.my - slope * row.mx, slope]
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import LinearRegression

    feats = df.select(F.col(x).cast("double").alias("_x"), F.col(y).cast("double").alias("_y"))
    for d in range(2, deg + 1):
        feats = feats.withColumn(f"_x{d}", F.pow("_x", d))
    cols = ["_x"] + [f"_x{d}" for d in range(2, deg + 1)]
    vec = VectorAssembler(inputCols=cols, outputCol="features").transform(feats)
    model = LinearRegression(featuresCol="features", labelCol="_y").fit(vec)
    return [float(model.intercept)] + [float(c) for c in model.coefficients]


def r_squared(df: DataFrame, x: str, y: str, coefs: list[float]) -> float:
    """R² of a polynomial fit, computed distributed: the prediction is a
    closed-form column expression, so SS_res / SS_tot is ONE aggregation
    pass over the data (reference group_scatter.py:87-93 calls
    sklearn's ``fit.score``; same statistic)."""
    pred = F.lit(float(coefs[0]))
    for d, c in enumerate(coefs[1:], start=1):
        pred = pred + F.lit(float(c)) * F.pow(F.col(x).cast("double"), d)
    yv = F.col(y).cast("double")
    row = df.agg(
        F.sum((yv - pred) * (yv - pred)).alias("ss_res"),
        (F.var_pop(yv) * F.count(yv)).alias("ss_tot"),
    ).first()
    return 1.0 - row.ss_res / row.ss_tot


class GroupScatter:
    """Facade mirroring the reference GroupScatter dataclass
    (reference plotting/group_scatter.py:12-116): quantile-bin x, mean y
    per bin, polynomial fit, R², and a matplotlib plot — with every
    statistic computed distributed. Only the FINAL ≤ n_groups-row binned
    frame and the fit coefficients ever reach the driver; ``plot()`` draws
    from those, so rendering cost is O(n_groups) regardless of data size.

    matplotlib is optional (not in every runtime): construction and all
    statistics work without it; only ``plot()`` requires it.
    """

    def __init__(self, df: DataFrame, x: str, y: str, n_groups: int = 25,
                 filter=None, deg: int = 1, method: str = "ntile"):
        if filter is not None:
            df = df.where(filter)
        df = df.where(F.col(x).isNotNull() & F.col(y).isNotNull())
        self._df, self._x, self._y, self.deg = df, x, y, deg
        self.stats = binned_scatter_stats(df, x, y, n_bins=n_groups,
                                          method=method)
        self.regression_coefs = linear_fit(df, x, y, deg=deg)

    @property
    def r_squared(self) -> float:
        return r_squared(self._df, self._x, self._y, self.regression_coefs)

    def to_pandas(self):
        """The binned (bin, x_mean, y_mean, n) frame as pandas —
        ≤ n_groups rows by construction."""
        return self.stats.toPandas()

    def plot(self, ax=None, **plot_kwargs):
        """Scatter of per-bin mean points + the fitted regression curve.
        Requires matplotlib (raises ImportError with guidance if absent)."""
        try:
            import matplotlib.pyplot as plt
        except ImportError as e:  # pragma: no cover - env-dependent
            raise ImportError(
                "GroupScatter.plot needs matplotlib; install it or use "
                ".to_pandas() / .regression_coefs to render elsewhere") from e
        pdf = self.to_pandas().sort_values("x_mean")
        if ax is None:
            _, ax = plt.subplots()
        ax.plot(pdf["x_mean"], pdf["y_mean"], "o", **plot_kwargs)
        xs = pdf["x_mean"].to_numpy()
        ys = sum(c * xs ** d for d, c in enumerate(self.regression_coefs))
        ax.plot(xs, ys, "-")
        return ax
