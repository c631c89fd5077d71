"""Format-generic readers: CSV / JSON / ORC / text alongside parquet.

The reference has no I/O layer (columns arrive as in-memory arrays,
reference util.py:633-686); on Spark the ingest format choice dominates
100 TB economics, so these wrappers encode the defaults that matter:

- **Never infer schemas at scale.** ``inferSchema``/JSON sampling is a
  whole extra pass over the data before the real read. Callers must pass
  an explicit schema for CSV/JSON unless they opt into inference for
  interactive exploration.
- **Splittability.** One gzip file = one task regardless of size; prefer
  uncompressed/zstd parquet or many medium CSV files. ``multiLine`` JSON
  is unsplittable by construction — the default here is JSON-lines.
- **Corrupt-record policy is explicit.** PERMISSIVE quietly nulls broken
  rows; pipelines should decide (and we default to keeping the corrupt
  line in ``_corrupt_record`` so dropped data is observable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_FORMATS = ("parquet", "csv", "json", "orc", "text")


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    *,
    infer: bool = False,
    **options,
) -> DataFrame:
    """Read ``path`` in any supported format with scale-safe defaults.

    ``schema`` may be a DDL string ("a LONG, b STRING") or a StructType.
    CSV/JSON without a schema requires ``infer=True`` — an explicit
    opt-in, because inference is a full extra scan of the input.
    """
    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {_FORMATS}, got {fmt!r}")
    if fmt in ("csv", "json") and schema is None and not infer:
        raise ValueError(
            f"{fmt} needs an explicit schema at scale (inference re-scans "
            "the input); pass schema=... or infer=True to opt in")

    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        opts = {"header": "true", "mode": "PERMISSIVE",
                "columnNameOfCorruptRecord": "_corrupt_record"}
        if schema is None:
            opts["inferSchema"] = "true"
        opts.update(options)
        reader = reader.options(**opts)
    elif fmt == "json":
        # JSON-lines (the default) is splittable; multiLine=true is one
        # task per file — callers must opt in knowingly.
        opts = {"mode": "PERMISSIVE",
                "columnNameOfCorruptRecord": "_corrupt_record"}
        opts.update(options)
        reader = reader.options(**opts)
    elif options:
        reader = reader.options(**options)
    return reader.load(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test-corpus table as a temp view for ``spark.sql``
    workflows (mirrors the DuckDB oracle harness, which pre-registers the
    same names)."""
    from .tables import TABLES, load_table

    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
