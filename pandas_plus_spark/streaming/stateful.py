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
    total, count = state.get if state.exists else (0.0, 0)
    for pdf in pdfs:
        pdf = pdf.sort_values("event_id")
        out = pdf[["user_id", "event_id", "value"]].copy()
        totals, counts = [], []
        for v in pdf["value"]:
            total += float(v)
            count += 1
            totals.append(total)
            counts.append(count)
        out["running_total"] = totals
        out["running_count"] = counts
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
