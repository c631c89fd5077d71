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
    lives in the catalog)."""
    bucket_by = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        sort_by = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)
