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


EWM_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("event_id", T.LongType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("ewm", T.DoubleType()),
])

# (num, den) are the adjusted EWM's weighted sums at the last seen row —
# they decay toward a steady state O(1/alpha), so state stays bounded; if
# a null run outlasts double precision they underflow to 0 and last_y
# carries the exact value (the EWM is constant across null runs).
_EWM_STATE_SCHEMA = T.StructType([
    T.StructField("num", T.DoubleType()),
    T.StructField("den", T.DoubleType()),
    T.StructField("last_y", T.DoubleType()),
])


def _ewm_batch(vals, num, den, last_y, r):
    """Vectorized adjusted-EWM continuation over one sorted batch.

    Same decomposition as the batch scan (groupby/core.py _ewm_scan):
    process in chunks short enough that the origin-anchored rescale
    r^-i stays finite, carry (num, den) across chunks. Returns the
    per-row EWM array and the updated (num, den, last_y)."""
    import numpy as np

    n = len(vals)
    out = np.empty(n, dtype="float64")
    # r^-(L-1) ≤ ~1e250 — far under double overflow, and precision loss
    # only affects terms whose true weight is below their own epsilon
    L = max(8, min(4096, int(250.0 / max(1e-12, -np.log10(r)))))
    for s in range(0, n, L):
        x = vals[s:s + L]
        m = len(x)
        nn = ~np.isnan(x)
        w = np.power(r, -np.arange(m, dtype="float64"))
        cz = np.cumsum(np.where(nn, w * np.where(nn, x, 0.0), 0.0))
        cw = np.cumsum(np.where(nn, w, 0.0))
        num_j = cz + r * num
        den_j = cw + r * den
        with np.errstate(invalid="ignore", divide="ignore"):
            y = np.where(den_j > 0.0, num_j / den_j, last_y)
        out[s:s + m] = y
        scale = r ** (m - 1)
        num = scale * num_j[-1]
        den = scale * den_j[-1]
        if den_j[-1] > 0.0:
            last_y = float(y[-1])
    return out, num, den, last_y


def make_ewm_updater(alpha: float, key_col: str = "user_id",
                     order_col: str = "event_id",
                     value_col: str = "value"):
    """Bind alpha/columns into an applyInPandasWithState update fn."""
    r = 1.0 - alpha

    def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        import numpy as np

        num, den, last_y = state.get if state.exists else (0.0, 0.0, None)
        last_y = np.nan if last_y is None else last_y
        for pdf in pdfs:
            pdf = pdf.sort_values(order_col)
            out = pdf[[key_col, order_col, value_col]].copy()
            vals = pdf[value_col].to_numpy(dtype="float64")
            if r == 0.0:
                # alpha=1: the current observation, carried through nulls
                y = np.where(np.isnan(vals), np.nan, vals)
                filled = pd.Series(y).ffill().to_numpy()
                y = np.where(np.isnan(filled), last_y, filled)
                if len(y):
                    last_y = float(y[-1]) if not np.isnan(y[-1]) else last_y
            else:
                y, num, den, last_y = _ewm_batch(vals, num, den, last_y, r)
            out["ewm"] = y
            yield out
        state.update((float(num), float(den),
                      None if pd.isna(last_y) else float(last_y)))

    return _update


def stateful_ewm(events: DataFrame, key_col: str = "user_id",
                 value_col: str = "value", alpha: float = 0.1,
                 order_col: str = "event_id") -> DataFrame:
    """Per-key exponentially weighted mean (adjust=True) over a stream —
    the streaming analog of GroupBy.ewm_mean's scan (groupby/core.py),
    with the chunk carry living in the state store instead of a
    broadcast frame. State is three scalars per key regardless of
    stream length; each micro-batch is one vectorized pass."""
    if not (0.0 < alpha <= 1.0):
        raise ValueError("alpha must be in (0, 1]")
    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            make_ewm_updater(alpha, key_col, order_col, value_col),
            outputStructType=EWM_SCHEMA,
            stateStructType=_EWM_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
