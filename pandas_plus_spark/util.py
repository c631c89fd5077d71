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


def parallel_filter(df: DataFrame, cond, min_partitions: int | None = None) -> DataFrame:
    """Filter with a CPU-heavy predicate, guaranteeing the predicate runs at
    cluster parallelism.

    ``ensure_parallelism`` alone cannot help a filter: Catalyst pushes
    deterministic predicates through a round-robin repartition down to the
    scan, and a scan over a single-row-group parquet file is one task — the
    whole predicate then evaluates on one core. When (and only when) the
    input has fewer partitions than the cluster has cores, this repartitions
    and wraps the predicate behind a nondeterministic guard
    (``monotonically_increasing_id() >= 0``, always true) so the optimizer
    cannot move it below the exchange. With enough input splits — every real
    cluster scan — the plain pushed-down filter IS the optimal plan (no
    shuffle of to-be-dropped rows), so no repartition and no guard happens.
    """
    from pyspark.sql import functions as F

    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)
        cond = (F.when(F.monotonically_increasing_id() >= 0, cond)
                .otherwise(F.lit(False)))
    return df.filter(cond)


def attach_cached(out: DataFrame, *cached: DataFrame) -> DataFrame:
    """Record the persisted intermediates an operator's result depends on.

    Operators persist frames that both sides of a self-join read (bucket
    entries, gram sets). ``DataFrame.persist`` pins executor storage until an
    explicit ``unpersist`` — Spark's CacheManager is keyed by logical plan and
    never GC-driven — so a long-lived session calling such operators in a loop
    would leak storage memory. The handles ride on the result; call
    :func:`release_cached` once the result is materialized (or no longer
    needed) to free them deterministically."""
    existing = list(getattr(out, "_pps_cached", ()))
    out._pps_cached = existing + list(cached)
    return out


def release_cached(df: DataFrame) -> None:
    """Unpersist every intermediate recorded by :func:`attach_cached`."""
    for f in getattr(df, "_pps_cached", ()):
        try:
            f.unpersist()
        except Exception:  # session already stopped — nothing to free
            pass
    df._pps_cached = []
