"""util.lineage_cut (r16): plan truncation for reused intermediates.

Pins the three contracts the optimization relies on:

1. value identity — a cut frame returns exactly the source's rows;
2. plan truncation + deterministic release — the cut frame's plan is a
   LogicalRDD leaf, and release_cached frees the checkpoint blocks;
3. no lint blind spots — plans.lint walks the stashed pre-cut source, so
   anti-patterns BELOW a cut are still reported;

plus the r15 ADVICE regression: _zip_array_key's positional reconstruction
(spark_partition_id + monotonically_increasing_id) stays correct on a
PERSISTED upstream frame with canChangeCachedPlanOutputPartitioning=true
(the engine default since r15) — the cache-layout consistency assumption,
made executable.
"""

import pyspark.sql.functions as F
import pytest

from pandas_plus_spark import util
from pandas_plus_spark.util import attach_cached, lineage_cut, release_cached


class TestLineageCut:
    def test_value_identity_and_leaf_plan(self, spark):
        src = (spark.range(1000)
               .select((F.col("id") % 7).alias("k"), F.col("id").alias("v"))
               .groupBy("k").agg(F.sum("v").alias("s")))
        expected = {(r["k"], r["s"]) for r in src.collect()}
        cut = lineage_cut(src)
        assert {(r["k"], r["s"]) for r in cut.collect()} == expected
        analyzed = cut._jdf.queryExecution().analyzed().toString()
        assert "LogicalRDD" in analyzed, analyzed
        # consumers referencing the cut twice embed the LEAF, not the
        # aggregation subtree
        joined = cut.alias("a").join(cut.alias("b"), "k")
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "Aggregate" not in plan, plan

    def test_release_frees_checkpoint_blocks(self, spark):
        src = spark.range(100).select((F.col("id") * 2).alias("x"))
        cut = lineage_cut(src, eager=True)
        rdd = cut._pps_ckpt_rdd
        assert rdd is not None
        assert rdd.getStorageLevel().useMemory() or \
            rdd.getStorageLevel().useDisk()
        out = attach_cached(spark.range(1).crossJoin(F.broadcast(
            cut.agg(F.sum("x").alias("s")))), cut)
        out.collect()
        release_cached(out)
        lvl = rdd.getStorageLevel()
        assert not lvl.useMemory() and not lvl.useDisk()

    def test_persist_fallback_toggle(self, spark):
        src = spark.range(10)
        old = util._LINEAGE_CUT_ENABLED
        util._LINEAGE_CUT_ENABLED = False
        try:
            out = lineage_cut(src)
            # fallback is the r15 behavior: persist() returns the SAME
            # frame (no plan truncation, no checkpoint handle)
            assert out is src
            assert getattr(out, "_pps_ckpt_rdd", None) is None
        finally:
            util._LINEAGE_CUT_ENABLED = old
            src.unpersist()

    def test_lint_sees_below_the_cut(self, spark):
        from pandas_plus_spark.plans import lint
        slow = F.udf(lambda x: x + 1, "long", useArrow=False)
        bad = spark.range(50).select(slow("id").alias("v"))
        cut = lineage_cut(bad)
        out = attach_cached(cut.groupBy("v").count(), cut)
        # the visible plan is clean (leaf scan) …
        visible = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in visible
        # … but the linter walks the stashed pre-cut source
        codes = {f.code for f in lint(out)}
        assert "row-udf" in codes
        release_cached(out)


class TestZipArrayKeyOnCachedUpstream:
    """r15 ADVICE #2: pid/mid positional reconstruction over a persisted
    upstream frame, with AQE allowed to re-size cached-plan output
    partitioning (the session default). The zip must still align the
    driver array with the frame's physical row order within one boot."""

    def test_values_align_on_persisted_frame(self, spark):
        import pandas as pd

        from pandas_plus_spark.groupby import GroupBy

        pdf = pd.DataFrame({"v": [float(i) for i in range(40)]})
        df = spark.createDataFrame(pdf).repartition(5).persist()
        df.count()  # materialize the cache, pinning its layout
        try:
            # physical row order after the repartition — the order the
            # engine's zip must reproduce
            import numpy as np
            order = [r["v"] for r in df.collect()]
            key = np.array([int(v) % 3 for v in order])
            got = {(r[0], r[1]) for r in
                   GroupBy(df, key).sum("v").collect()}
            expect = {}
            for k, v in zip(key, order):
                expect[k] = expect.get(k, 0.0) + v
            assert got == set(expect.items())
        finally:
            df.unpersist()
