"""Engine-internal utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition when the plan has fewer partitions than the cluster has
    cores. Small single-file parquet inputs arrive as ONE split; any CPU-heavy
    per-row operator (shingling, hashing, vector math) would then run on a
    single core. One cheap round-robin shuffle of the raw rows buys full
    parallelism — the distributed equivalent of the reference's chunked
    thread fan-out (reference core.py:227-229, util.py:190-241)."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
