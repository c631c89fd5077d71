"""Custom stateful streaming operators via applyInPandasWithState.

Where ``session_window``/``window`` cover the declarative cases, arbitrary
per-key running state (the streaming analog of the reference's cumulative
kernels, reference numba.py:1613-1674) needs the state-store API. The
pattern here: Arrow-batched per-key state updates, output one row per input
row, state bounded per key.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("event_id", T.LongType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("running_total", T.DoubleType()),
    T.StructField("running_count", T.LongType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("total", T.DoubleType()),
    T.StructField("count", T.LongType()),
])


def _update_running(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    # Vectorized per-batch: running_total = carried_total + cumsum(value),
    # running_count = carried_count + 1..n. The state update is the batch
    # sum/len — no per-row Python loop (Arrow hands us columnar batches;
    # keep them columnar).
    total, count = state.get if state.exists else (0.0, 0)
    import numpy as np

    for pdf in pdfs:
        pdf = pdf.sort_values("event_id")
        out = pdf[["user_id", "event_id", "value"]].copy()
        vals = pdf["value"].to_numpy(dtype="float64")
        running = total + np.cumsum(vals)
        out["running_total"] = running
        out["running_count"] = count + np.arange(1, len(vals) + 1)
        if len(vals):
            # carry the LAST emitted total, not total + vals.sum():
            # np.sum is pairwise-associated and would drift from the
            # sequential accumulation the next batch must continue from
            total = float(running[-1])
            count += len(vals)
        yield out
    state.update((total, count))


def stateful_running_total(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Per-key running total/count over a stream — cumsum with explicit
    state. Output mode must be 'update' or 'append'; state is two scalars
    per key (bounded regardless of stream length)."""
    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            _update_running,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
