"""Positional mask helpers: the reference's slice / fancy-indexer / boolean
array mask forms as predicates over a row-id column.

The reference lets every aggregation take ``mask=`` as a boolean array, a
``slice``, or an integer fancy indexer (reference tests/
test_mask_indexing.py:21-335) — all POSITIONAL forms addressing rows by
array index. The engine's documented mapping (groupby/core.py) is "a mask
is a boolean Column"; these helpers make that mapping an API: given the
row-id column established at ingest (``sources.local.from_arrays`` /
``from_pandas``, or a persisted ``global_row_number``), they build the
equivalent predicate Column.

Every helper is pure Column arithmetic — the predicate evaluates map-side
inside whole-stage codegen, exactly like a hand-written filter, so the
mask composes with aggregation pushdown at any scale. ``index_mask`` and
``bool_array_mask`` ship their index set from the driver (an ``isin``
literal list) and are therefore driver-bounded like the reference's fancy
indexers themselves; slice masks are three comparisons regardless of n.

Slice semantics are exactly Python's: ``slice_mask(rid, s, n=n)`` selects
the row ids in ``range(*slice(s.start, s.stop, s.step).indices(n))``,
including negative starts/stops/steps. ``n`` (the frame length) is only
required when a bound is negative or (for negative step) missing — the
cases Python itself cannot resolve without the length.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _rid(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _norm(bound: int | None, n: int | None, name: str) -> int | None:
    if bound is None or bound >= 0:
        return bound
    if n is None:
        raise ValueError(
            f"negative {name} ({bound}) requires n= (the frame length) "
            "to normalize, exactly like Python slicing")
    return bound + n


def slice_mask(
    rid,
    start: int | None = None,
    stop: int | None = None,
    step: int | None = None,
    *,
    n: int | None = None,
) -> Column:
    """Predicate Column selecting rows whose ``rid`` lies in
    ``slice(start, stop, step)`` of a frame of length ``n``.

    Accepts a ``slice`` object as ``start`` (``slice_mask(rid,
    np.s_[100:400:3])``). Supports negative steps and negative bounds
    (both need ``n``). Mirrors ``arr[start:stop:step]`` exactly.
    """
    if isinstance(start, slice):
        if stop is not None or step is not None:
            raise ValueError("pass either a slice object or start/stop/step")
        start, stop, step = start.start, start.stop, start.step
    step = 1 if step is None else step
    if step == 0:
        raise ValueError("slice step cannot be zero")
    r = _rid(rid)

    if n is not None:
        # exact Python semantics for any sign combination
        a, b, s = slice(start, stop, step).indices(n)
        start, stop, step = a, b, s
    elif step > 0:
        start = _norm(start, n, "start") or 0
        stop = _norm(stop, n, "stop")
    else:
        # a negative step without n can't default start (= n-1) — require
        # an explicit non-negative start
        start = _norm(start, n, "start")
        stop = _norm(stop, n, "stop")
        if start is None:
            raise ValueError("negative-step slice without start requires n=")

    if step > 0:
        cond = (r >= start) & ((r - start) % step == 0)
        if stop is not None:
            cond = cond & (r < stop)
        return cond
    cond = (r <= start) & ((F.lit(start) - r) % (-step) == 0)
    if stop is not None:
        cond = cond & (r > stop)
    return cond


def index_mask(rid, indices, *, n: int | None = None) -> Column:
    """Predicate Column for an integer fancy indexer: row selected iff its
    id appears in ``indices``. Negative indices normalize with ``n``.
    Driver-bounded (the index list ships as an ``isin`` literal), like the
    reference's fancy indexers."""
    idx = [int(i) for i in indices]
    norm = [_norm(i, n, "index") for i in idx]
    return _rid(rid).isin(norm)


def bool_array_mask(rid, flags) -> Column:
    """Predicate Column for a positional boolean array: row ``i`` selected
    iff ``flags[i]``. The reference's boolean-array mask form; translated
    as ``index_mask`` over the true positions (driver-bounded)."""
    import numpy as np

    arr = np.asarray(flags)
    if arr.dtype != bool:
        raise TypeError(f"bool_array_mask needs a boolean array, got {arr.dtype}")
    return index_mask(rid, np.flatnonzero(arr).tolist())
