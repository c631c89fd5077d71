"""Structured Streaming analogs of the engine's session/window operators.

The reference's only session-like op is the batch ``group_nearby_members``
(reference core.py:1891-1910). Streams are where that semantics naturally
lives in Spark: ``session_window`` for gap-based sessions, tumbling/sliding
``window`` + watermark for late data. These helpers take a streaming
DataFrame (``spark.readStream...``) and return the transformed streaming
DataFrame; callers pick sink/trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionized_stream(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based sessions per key: the streaming analog of
    ``GroupBy.group_nearby_members`` — state is bounded by the watermark."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col(key_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def windowed_agg_stream(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling (or sliding) windowed aggregation with watermarked late-data
    handling — the streaming face of ``GroupBy(df, [key, window]).agg``."""
    win = (F.window(F.col(ts_col), window, slide) if slide
           else F.window(F.col(ts_col), window))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win, F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"), F.avg("value").alias("avg_value"))
        .select(
            F.col(key_col),
            F.col("window.start").alias("window_start"),
            "n_events",
            "avg_value",
        )
    )


def deduped_stream(
    events: DataFrame,
    id_cols: list[str] | str,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: drop rows whose identity columns repeat within
    the watermark horizon — the streaming analog of ``dedup.exact_dedup``.

    Uses ``dropDuplicatesWithinWatermark``: state holds one entry per
    distinct identity seen inside the watermark and is evicted as the
    watermark advances, so memory is bounded by (arrival rate × horizon),
    never by stream length. For content dedup pass a content hash as the
    identity (hash the body up front; the state store then keys on ~32 bytes,
    not documents)."""
    ids = [id_cols] if isinstance(id_cols, str) else list(id_cols)
    return (
        events.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(ids)
    )

