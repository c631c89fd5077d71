"""Structured Streaming operators: session windows + watermarked aggs,
driven end-to-end with a file source and an in-memory sink."""

import time

import pytest

from pandas_plus_spark.streaming import sessionized_stream, windowed_agg_stream


def _run_to_memory(sdf, name):
    q = (sdf.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    return q


def _events_stream_df(spark):
    # file-source stream over the parquet fixture; the source needs a
    # directory, so symlink the single file into a temp dir. ts arrives as
    # ns-long and is converted exactly as the batch loader does.
    import os
    import tempfile

    import pyspark.sql.functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    d = tempfile.mkdtemp(prefix="events_stream_")
    link = os.path.join(d, "events.parquet")
    if not os.path.exists(link):
        os.symlink("/root/testdata/sf0.001/events.parquet", link)
    static = spark.read.parquet(link)
    sdf = spark.readStream.schema(static.schema).parquet(d)
    if dict(sdf.dtypes).get("ts") == "bigint":
        sdf = sdf.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    else:
        # parquet µs timestamps surface as TIMESTAMP_NTZ, which watermarks
        # reject — cast to TIMESTAMP exactly as the batch events loader does
        # (gap sessions are invariant under the tz shift).
        sdf = sdf.withColumn("ts", F.col("ts").cast("timestamp"))
    return sdf


def test_windowed_agg_stream(spark):
    sdf = _events_stream_df(spark)
    out = windowed_agg_stream(sdf, window="6 hours")
    q = _run_to_memory(out, "win_agg")
    try:
        rows = spark.sql("SELECT * FROM win_agg").collect()
        assert len(rows) > 0
        assert {"event_type", "window_start", "n_events", "avg_value"} <= set(rows[0].asDict())
        total = sum(r["n_events"] for r in rows)
        assert total == spark.read.parquet("/root/testdata/sf0.001/events.parquet").count()
    finally:
        q.stop()


def test_windowed_agg_stream_rocksdb_provider(spark):
    """The RocksDB state-store path (get_spark(rocksdb_state_store=True) at
    corpus scale) runs the same watermarked agg and matches the batch count
    — the replay gates are provider-agnostic."""
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state."
                        "RocksDBStateStoreProvider")
    try:
        sdf = _events_stream_df(spark)
        out = windowed_agg_stream(sdf, window="6 hours")
        q = _run_to_memory(out, "win_agg_rocks")
        try:
            rows = spark.sql("SELECT * FROM win_agg_rocks").collect()
            total = sum(r["n_events"] for r in rows)
            assert total == spark.read.parquet(
                "/root/testdata/sf0.001/events.parquet").count()
        finally:
            q.stop()
    finally:
        if old:
            spark.conf.set(key, old)
        else:
            spark.conf.unset(key)


def test_sessionized_stream(spark):
    sdf = _events_stream_df(spark)
    out = sessionized_stream(sdf, gap="30 minutes")
    q = _run_to_memory(out, "sess_agg")
    try:
        rows = spark.sql("SELECT * FROM sess_agg").collect()
        assert len(rows) > 0
        # sessions never overlap per user and each holds ≥1 event
        assert all(r["n_events"] >= 1 for r in rows)
    finally:
        q.stop()


def test_deduped_stream(spark):
    """dropDuplicatesWithinWatermark drops repeated identities; content-hash
    identity mirrors batch exact_dedup."""
    import pyspark.sql.functions as F
    from pandas_plus_spark.streaming import deduped_stream

    sdf = _events_stream_df(spark)
    # duplicate every event by unioning the stream with itself via a 2x
    # explode, then dedup on event_id
    doubled = sdf.withColumn("__dup", F.explode(F.array(F.lit(0), F.lit(1)))).drop("__dup")
    out = deduped_stream(doubled, "event_id", watermark="10 days")
    q = (out.writeStream.format("memory").queryName("dedup_stream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    try:
        n = spark.sql("SELECT count(*) AS n FROM dedup_stream").collect()[0]["n"]
        n_src = spark.read.parquet("/root/testdata/sf0.001/events.parquet").count()
        assert n == n_src  # every duplicate dropped, every original kept
    finally:
        q.stop()
