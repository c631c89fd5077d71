"""HLL cardinality sketches: merge stability (union operates on register
state, so merged estimates track the single-pass estimate — bit-equal in
the sparse regime this fixture stays in, within register resolution past
it) and accuracy vs exact countDistinct. These pin the claims the
hll_merge_gate driver query gates at the oracle level."""

import pyspark.sql.functions as F
import pytest

from pandas_plus_spark.functions import sketches


class TestHllSketches:
    def test_merged_equals_single_pass_per_group(self, tables):
        orders = tables["orders"]
        # increment side: one sketch per (priority, slice)
        sliced = orders.withColumn("slice", F.col("o_orderkey") % 4)
        inc = sketches.nunique_sketches(
            sliced, ["o_orderpriority", "slice"], "o_custkey")
        merged = sketches.merge_sketches(inc, "o_orderpriority")
        # single pass over the whole corpus
        single = sketches.merge_sketches(
            sketches.nunique_sketches(orders, "o_orderpriority", "o_custkey"),
            "o_orderpriority")
        m = {r["o_orderpriority"]: r["n_unique"] for r in merged.collect()}
        s = {r["o_orderpriority"]: r["n_unique"] for r in single.collect()}
        # sf0.001: ~150 distinct per group — sketches stay in the sparse/
        # coupon regime, where the union is bit-losslessly exact. (Past the
        # sparse regime Spark's HLL_4/HLL_8 mode transitions make estimates
        # near- rather than bit-identical; the hll_merge_gate driver query
        # pins that tolerance at sf0.01.)
        assert m == s and len(m) > 0

    def test_estimate_accuracy_vs_exact(self, tables):
        orders = tables["orders"]
        est = {r["o_orderpriority"]: r["n_unique"]
               for r in sketches.merge_sketches(
                   sketches.nunique_sketches(
                       orders, "o_orderpriority", "o_custkey"),
                   "o_orderpriority").collect()}
        exact = {r["o_orderpriority"]: r["n"]
                 for r in orders.groupBy("o_orderpriority")
                 .agg(F.countDistinct("o_custkey").alias("n")).collect()}
        assert set(est) == set(exact)
        for k, n in exact.items():
            # lg_k=12 -> ~1.6% relative error; 5% is a safe determinism bound
            assert abs(est[k] - n) <= max(0.05 * n, 2), (k, est[k], n)

    def test_global_rollup_keys_empty(self, tables):
        orders = tables["orders"]
        inc = sketches.nunique_sketches(
            orders.withColumn("slice", F.col("o_orderkey") % 3),
            "slice", "o_custkey")
        row = sketches.merge_sketches(inc, []).first()
        exact = orders.select(
            F.countDistinct("o_custkey").alias("n")).first()["n"]
        assert abs(row["n_unique"] - exact) <= max(0.05 * exact, 2)

    def test_lg_k_mismatch_raises(self, tables):
        orders = tables["orders"]
        a = sketches.nunique_sketches(orders, "o_orderpriority", "o_custkey",
                                      lg_k=12)
        b = sketches.nunique_sketches(orders, "o_orderpriority", "o_custkey",
                                      lg_k=11)
        from py4j.protocol import Py4JJavaError
        from pyspark.errors import PySparkException
        with pytest.raises((Py4JJavaError, PySparkException, Exception)):
            sketches.merge_sketches(a.union(b), "o_orderpriority").collect()

    def test_point_estimate_matches_merge_of_one(self, tables):
        orders = tables["orders"]
        one = sketches.nunique_sketches(orders, "o_orderpriority", "o_custkey")
        pt = {r["o_orderpriority"]: r["est"]
              for r in one.select(
                  "o_orderpriority",
                  sketches.sketch_estimate("sketch").alias("est")).collect()}
        merged = {r["o_orderpriority"]: r["n_unique"]
                  for r in sketches.merge_sketches(
                      one, "o_orderpriority").collect()}
        assert pt == merged
