"""Sinks — layout-aware writers.

The reference has no I/O layer (SURVEY §2.11); these are the engine's
write-side counterparts to the loaders, encoding the two layout decisions
that matter at 100 TB:

- partitioned writes: directory partitioning on low-cardinality keys means
  later reads with a key predicate scan only matching directories
  (PartitionFilters in the scan — verified in tests).
- bucketed tables: pre-shuffled layout on high-cardinality join/group keys;
  a join or groupBy on the bucket key skips its Exchange entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | str,
    mode: str = "error",
    fmt: str = "parquet",
    max_records_per_file: int | None = None,
) -> None:
    """Directory-partitioned write. Choose ``partition_by`` columns with few
    distinct values (date, category) — one directory per value; a
    high-cardinality partition key creates a small-files explosion."""
    partition_by = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    w = df.write.mode(mode).format(fmt).partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str] | str,
    num_buckets: int,
    sort_by: list[str] | str | None = None,
    mode: str = "error",
) -> None:
    """Bucketed (hive-layout) table write. Joins/aggregations keyed on
    ``bucket_by`` against this table satisfy their distribution requirement
    from the layout — no Exchange. Requires saveAsTable (bucket metadata
    lives in the catalog).

    The input is repartitioned by the bucket key into ``num_buckets``
    partitions first — REQUIRED at scale: ``bucketBy`` writes one file
    per (writer task × bucket), so an unpartitioned 600M-row write from
    ~800 scan tasks produced ~250k files of ~26 KB each (r7 sf100
    measurement: the layout took 19 min to write and every bucketed
    read paid ~800 file-opens per bucket — the "exchange-free" join ran
    1.5x SLOWER than the shuffled formulation it exists to beat).
    Repartition uses the same murmur3 hash family as the bucket id, so
    each task holds exactly one bucket's rows → one file per bucket;
    the shuffle it adds is the one-time build cost, repaid on every
    read. (Same fix shape as Spark's own docs' bucketing guidance.)"""
    bucket_by = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    from pyspark.sql import functions as F
    df = df.repartition(num_buckets, *[F.col(c) for c in bucket_by])
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        sort_by = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def zorder_key(cols, bits: int = 16):
    """Morton (Z-order) interleave of 2+ numeric columns, each rank-scaled
    to ``bits`` bits by the caller (see :func:`write_zordered`, which does
    the scaling). Pure column expressions — shiftleft/or folds."""
    from pyspark.sql import functions as F

    key = F.lit(0).cast("long")
    for b in range(bits):
        for ci, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(
                F.shiftleft(bit, b * len(cols) + ci))
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_by: list[str],
    mode: str = "error",
    bits: int = 8,
    target_files: int | None = None,
) -> None:
    """Z-order-clustered parquet write: rows are range-partitioned and
    sorted by the Morton interleave of the ``zorder_by`` columns, so each
    output file covers a small hyper-rectangle of the key space and its
    parquet min/max footer stats are NARROW on EVERY z-ordered column —
    a later scan filtering on any one of them prunes most files/row-groups
    (the multi-column analog of sorting by a single key, and the layout
    trick behind Delta/Iceberg OPTIMIZE ZORDER).

    Columns are scaled to ``bits`` bits with min/max uniform scaling from
    ONE tiny aggregate pass (driver scalars broadcast into the projection
    — no per-column sort, no window). Heavily skewed columns should be
    pre-transformed (log, rank) before z-ordering — uniform scaling
    degrades toward single-column clustering as skew concentrates bucket
    mass. The write is ``repartitionByRange(zkey)`` +
    ``sortWithinPartitions(zkey)`` — one range exchange, the same cost as
    any sorted write.
    """
    from pyspark.sql import functions as F

    if len(zorder_by) < 2:
        raise ValueError("zorder_by needs >= 2 columns (sort for 1)")
    top = (1 << bits) - 1
    stats = df.agg(*[F.min(c).alias(f"mn_{c}") for c in zorder_by],
                   *[F.max(c).alias(f"mx_{c}") for c in zorder_by]).first()
    work = df
    scaled = []
    for c in zorder_by:
        mn, mx = float(stats[f"mn_{c}"]), float(stats[f"mx_{c}"])
        span = (mx - mn) or 1.0
        s = F.least(F.lit(top), F.greatest(F.lit(0), (
            (F.col(c).cast("double") - mn) / span * top).cast("long")))
        work = work.withColumn(f"__zs_{c}", s)
        scaled.append(F.col(f"__zs_{c}"))
    work = work.withColumn("__zkey", zorder_key(scaled, bits))
    n_files = target_files or max(df.sparkSession.sparkContext.defaultParallelism, 8)
    (work.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey", *[f"__zs_{c}" for c in zorder_by])
        .write.mode(mode).parquet(path))
