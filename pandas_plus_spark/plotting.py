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
) -> DataFrame:
    """(bin, x_mean, y_mean, n) with equal-count bins over x.

    ``tiebreak`` columns make the ntile assignment deterministic when x has
    duplicates. NB: a global ntile is a total sort — fine for plot prep; at
    100 TB prefer approxQuantile cutpoints + a bucketing join.
    """
    order = [F.col(x)] + [F.col(c) for c in (tiebreak or [])]
    w = Window.orderBy(*order)
    binned = df.withColumn("bin", F.ntile(n_bins).over(w))
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
