"""Local-container ingestion: numpy / pandas / Arrow / plain sequences in,
Spark DataFrame with an explicit ROW-ID / ORDER CONTRACT out.

The reference accepts raw arrays for values everywhere (``ArrayType1D``,
reference util.py:24-33) and normalizes any collection into
``(list_of_arrays, names)`` in ``convert_data_to_arr_list_and_keys``
(reference util.py:633-686): a single 1-D array, a sequence of arrays, a
mapping name → array, or a whole 2-D frame; unnamed arrays get synthetic
names ``_arr_0``, ``_arr_1``, … (reference core.py:662-664); lengths must
align (reference ``check_data_inputs_aligned``).

In the reference, *array position* is the implicit row identity that
ordered operators (cumsum/rolling/shift/head) and positional masks
(slices, fancy indexers) address. Spark DataFrames are unordered, so this
facade makes the contract EXPLICIT at ingest: every frame it produces
carries a ``_row_id`` column = the 0-based position of the row in the
input containers. Ordered operators take ``order_by="_row_id"``;
positional masks translate through :mod:`pandas_plus_spark.functions.masks`
(``slice_mask`` / ``index_mask`` / ``bool_array_mask``) into predicates
over the same column.

Scale contract: these constructors ship DRIVER-RESIDENT data (that is what
a local container is) — they exist so code written against the reference
can run unchanged at exploration scale. At corpus scale the same contract
comes from storage: read parquet and either use a natural order column or
stamp ``_row_id`` once with ``functions.ordered.global_row_number`` and
persist.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession

ROW_ID = "_row_id"


def _is_arraylike(x) -> bool:
    return hasattr(x, "__len__") and not isinstance(x, (str, bytes, Mapping))


def _maybe_polars():
    """polars is an OPTIONAL ingestion container (reference util.py:24-33,
    680-682 accepts pl.Series/pl.DataFrame/pl.LazyFrame) — imported lazily
    so the engine has no polars dependency."""
    import sys
    try:
        import polars as pl
        return pl
    except ImportError:
        return sys.modules.get("polars")  # test double, if one is installed


def _to_pandas_series(arr, name: str):
    import pandas as pd

    try:
        import pyarrow as pa
        if isinstance(arr, (pa.Array, pa.ChunkedArray)):
            return arr.to_pandas().rename(name)
    except ImportError:  # pragma: no cover
        pass
    pl = _maybe_polars()
    if pl is not None and isinstance(arr, pl.Series):
        # polars -> arrow -> pandas: zero-copy for numeric columns, and
        # arrow owns the NaN/None -> NULL translation
        return arr.to_arrow().to_pandas().rename(name)
    if isinstance(arr, pd.Series):
        return arr.reset_index(drop=True).rename(name)
    if isinstance(arr, (pd.Index, pd.Categorical)):
        return pd.Series(arr).reset_index(drop=True).rename(name)
    return pd.Series(list(arr) if not hasattr(arr, "dtype") else arr,
                     name=name)


def from_arrays(
    spark: SparkSession,
    data,
    names: Sequence[str] | None = None,
    row_id_col: str = ROW_ID,
    num_partitions: int | None = None,
) -> DataFrame:
    """Build a Spark DataFrame from local 1-D/2-D containers with the
    positional row-id contract attached.

    ``data`` accepts every reference ``ArrayCollection`` form
    (reference core.py:31-33): one 1-D array-like, a sequence of them, a
    mapping ``name → array``, a 2-D numpy array (columns split out), or a
    pandas DataFrame/Series (delegated to :func:`from_pandas`). ``names``
    overrides/provides column names; unnamed arrays get ``_arr_{i}``.
    Raises on misaligned lengths — the reference's eager alignment check.
    """
    import numpy as np
    import pandas as pd

    pl = _maybe_polars()
    if pl is not None and isinstance(data, pl.LazyFrame):
        data = data.collect()
    if pl is not None and isinstance(data, pl.DataFrame):
        return from_pandas(spark, data.to_arrow().to_pandas(),
                           row_id_col=row_id_col,
                           num_partitions=num_partitions)
    if isinstance(data, (pd.DataFrame, pd.Series)):
        return from_pandas(spark, data, row_id_col=row_id_col,
                           num_partitions=num_partitions)
    if isinstance(data, np.ndarray) and data.ndim == 2:
        data = [data[:, j] for j in range(data.shape[1])]

    if isinstance(data, Mapping):
        items = list(data.items())
        arrs = [v for _, v in items]
        inferred = [str(k) for k, _ in items]
    elif _is_arraylike(data) and len(data) > 0 and _is_arraylike(data[0] if not hasattr(data, "iloc") else data.iloc[0]):
        arrs = list(data)
        inferred = [getattr(a, "name", None) or f"_arr_{i}"
                    for i, a in enumerate(arrs)]
    else:  # single 1-D array-like
        arrs = [data]
        inferred = [getattr(data, "name", None) or "_arr_0"]

    if names is not None:
        names = [str(n) for n in names]
        if len(names) != len(arrs):
            raise ValueError(
                f"names has {len(names)} entries for {len(arrs)} arrays")
    else:
        names = inferred

    cols = [_to_pandas_series(a, n) for a, n in zip(arrs, names)]
    lengths = {len(c) for c in cols}
    if len(lengths) > 1:
        raise ValueError(
            f"input arrays are not aligned: lengths {sorted(lengths)} "
            "(reference check_data_inputs_aligned)")
    pdf = pd.concat(cols, axis=1)
    return from_pandas(spark, pdf, row_id_col=row_id_col,
                       num_partitions=num_partitions)


def from_pandas(
    spark: SparkSession,
    pdf,
    row_id_col: str = ROW_ID,
    num_partitions: int | None = None,
) -> DataFrame:
    """pandas DataFrame/Series → Spark DataFrame + positional ``_row_id``.

    The row id is stamped DRIVER-SIDE from the input's positional order
    (not the pandas index — reference semantics are positional), so it is
    exact and survives any downstream re-computation; Arrow handles the
    NaN/NaT → NULL translation (the engine's native-NULL model subsumes
    the reference's sentinel encodings, reference util.py:55-128).
    """
    import pandas as pd

    if isinstance(pdf, pd.Series):
        pdf = pdf.to_frame(pdf.name if pdf.name is not None else "_arr_0")
    if row_id_col in pdf.columns:
        raise ValueError(
            f"input already has a {row_id_col!r} column; pass row_id_col=")
    pdf = pdf.reset_index(drop=True)
    out = pdf.copy()
    out.insert(0, row_id_col, range(len(pdf)))
    sdf = spark.createDataFrame(out)
    if num_partitions:
        sdf = sdf.repartition(num_partitions)
    return sdf
