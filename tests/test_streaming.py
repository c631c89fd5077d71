"""Structured Streaming operators: session windows + watermarked aggs,
driven end-to-end with a file source and an in-memory sink."""

import time

import pytest

from pandas_plus_spark.streaming import sessionized_stream, windowed_agg_stream
from pandas_plus_spark.util import release_cached


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


class TestNeardupFilteredStream:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        ref = spark.createDataFrame(
            [(100, "the quick brown fox jumps over the lazy dog today"),
             (101, "an entirely unrelated reference document body")],
            "doc_id long, text string")
        new = spark.createDataFrame(
            [(0, "the quick brown fox jumps over the lazy dog today"),   # exact
             (1, "the quick brown fox jumps over the lazy cat today"),   # near
             (2, "completely novel content nothing like the reference"),
             (3, "another fresh document with its own words entirely")],
            "doc_id long, text string")
        return ref, new

    def test_accepted_against_reference_batch(self, corpus):
        ref, new = corpus
        from pandas_plus_spark.streaming import accepted_against_reference
        out = accepted_against_reference(new, ref, "text", "doc_id",
                                         threshold=0.3, num_hashes=16,
                                         bands=8)
        got = {r["doc_id"] for r in out.collect()}
        release_cached(out)
        assert got == {2, 3}

    def test_replay_matches_batch_over_micro_batches(self, spark, corpus, tmp_path):
        # maxFilesPerTrigger=1 forces MULTIPLE micro-batches — each must be
        # filtered against the reference independently
        ref, new = corpus
        from pandas_plus_spark.streaming import (accepted_against_reference,
                                                 neardup_filtered_stream)
        src = str(tmp_path / "src")
        new.repartition(3).write.mode("overwrite").parquet(src)
        stream = (spark.readStream.schema(new.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        out_dir = str(tmp_path / "out")
        batches = []

        def sink(accepted, batch_id):
            batches.append(batch_id)
            accepted.write.mode("append").parquet(out_dir)

        q = (neardup_filtered_stream(stream, ref, "text", "doc_id", sink,
                                     threshold=0.3, num_hashes=16, bands=8)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        assert len(batches) >= 2          # genuinely several micro-batches
        got = {r["doc_id"] for r in
               spark.read.schema(new.schema).parquet(out_dir).collect()}
        want_df = accepted_against_reference(new, ref, "text", "doc_id",
                                             threshold=0.3, num_hashes=16,
                                             bands=8)
        want = {r["doc_id"] for r in want_df.collect()}
        release_cached(want_df)
        assert got == want == {2, 3}

    def test_decontaminated_stream_requires_a_reference(self, spark, corpus,
                                                        tmp_path):
        # r15 advisory: both ref_df and ref_grams None must raise the
        # same clean ValueError the batch operator raises, not an
        # AttributeError from build_ref_grams(None)
        _, new = corpus
        from pandas_plus_spark.streaming import decontaminated_stream
        src = str(tmp_path / "src")
        new.limit(1).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(new.schema).parquet(src)
        with pytest.raises(ValueError, match="ref_df or ref_grams"):
            decontaminated_stream(stream, None, "text", "doc_id",
                                  lambda df, bid: None)


class TestStatefulEwm:
    def test_replay_matches_batch_scan_over_micro_batches(self, spark, tmp_path):
        """stateful_ewm with maxFilesPerTrigger=1: state (num, den, carry)
        must continue across micro-batches so the replay equals the batch
        GroupBy.ewm_mean scan on the full frame — including null rows and
        a null gap spanning batch boundaries."""
        import os
        import numpy as np
        import pandas as pd
        import pyspark.sql.functions as F
        from pandas_plus_spark import GroupBy
        from pandas_plus_spark.streaming import stateful_ewm

        rng = np.random.default_rng(9)
        n = 800
        v = rng.standard_normal(n) * 50
        v[rng.random(n) < 0.2] = np.nan
        v[180:420] = np.nan  # gap spanning micro-batch boundaries
        pdf = pd.DataFrame({
            "user_id": (np.arange(n) % 5).astype("int64"),
            "event_id": np.arange(n, dtype="int64"),
            "value": v})
        sdf = spark.createDataFrame(pdf)
        src = str(tmp_path / "src"); os.makedirs(src)
        # four event-id range slices as separate files; mtimes force the
        # file source to pick them up in event order, one per micro-batch
        import glob
        import shutil
        for i, (lo, hi) in enumerate([(0, 200), (200, 400),
                                      (400, 600), (600, 800)]):
            tmp = str(tmp_path / f"stage_{i}")
            (sdf.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi))
             .coalesce(1).write.mode("overwrite").parquet(tmp))
            part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
            dst = os.path.join(src, f"slice_{i}.parquet")
            shutil.copyfile(part, dst)
            os.utime(dst, (1_700_000_000 + 100 * i,) * 2)
        stream = (spark.readStream.schema(sdf.schema)
                  .option("maxFilesPerTrigger", 1)
                  .option("latestFirst", "false").parquet(src))
        out = stateful_ewm(stream, alpha=0.1)
        q = (out.writeStream.format("memory").queryName("ewm_replay")
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        try:
            got = {r["event_id"]: r["ewm"]
                   for r in spark.sql("SELECT * FROM ewm_replay").collect()}
        finally:
            q.stop()
        assert len(got) == n
        want_df = GroupBy(sdf, "user_id", order_by="event_id").ewm_mean(
            "value", alpha=0.1)
        want = {r["event_id"]: r["value_ewm"] for r in want_df.collect()}
        for eid in want:
            w, g = want[eid], got[eid]
            if w is None:
                assert g is None or pd.isna(g), eid
            else:
                assert g is not None and abs(g - w) <= 1e-9 * max(1.0, abs(w)), \
                    (eid, g, w)
