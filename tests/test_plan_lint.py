"""Plan linter: the scale anti-pattern rules fire on constructed-bad
plans and stay quiet on the engine's own headline queries."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from pandas_plus_spark.plans import (
    assert_scalable, explain_report, lint, plan_stats)


def codes(findings):
    return {f.code for f in findings}


class TestRulesFire:
    def test_cartesian_product_is_error(self, spark):
        a = spark.range(10)
        b = spark.range(10).withColumnRenamed("id", "id2")
        fs = lint(a.crossJoin(b))
        assert "cartesian-product" in codes(fs)
        assert [f for f in fs if f.code == "cartesian-product"][0].severity == "error"
        with pytest.raises(AssertionError, match="cartesian-product"):
            assert_scalable(a.crossJoin(b))

    def test_non_equi_join_is_cartesian(self, spark):
        a = spark.range(10).withColumnRenamed("id", "x")
        b = spark.range(10).withColumnRenamed("id", "y")
        out = a.join(b, F.col("x") < F.col("y"))
        assert "cartesian-product" in codes(lint(out))

    def test_unpartitioned_window_is_single_partition(self, spark):
        df = spark.range(100).withColumn(
            "rn", F.row_number().over(Window.orderBy("id")))
        fs = lint(df)
        assert "single-partition-exchange" in codes(fs)
        # warn severity: passes an errors-only gate, fails the default
        assert_scalable(df, max_severity="error")
        with pytest.raises(AssertionError):
            assert_scalable(df)

    def test_row_udf_flagged_arrow_udf_not(self, spark):
        slow = F.udf(lambda x: x + 1, "long", useArrow=False)
        df = spark.range(10).select(slow("id").alias("v"))
        assert "row-udf" in codes(lint(df))

        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("long")
        def fast(s: pd.Series) -> pd.Series:
            return s + 1

        df2 = spark.range(10).select(fast("id").alias("v"))
        assert "row-udf" not in codes(lint(df2))
        assert plan_stats(df2)["arrow_udfs"] >= 1

    def test_global_sort_of_scan_is_info(self, tables):
        df = tables["lineitem"].orderBy("l_extendedprice")
        fs = lint(df)
        assert "global-sort-of-scan" in codes(fs)
        # info severity: does not fail the default gate
        assert_scalable(df)

    def test_allow_suppresses(self, spark):
        df = spark.range(100).withColumn(
            "rn", F.row_number().over(Window.orderBy("id")))
        assert_scalable(df, allow=("single-partition-exchange",))


class TestStats:
    def test_q1_stats(self, spark):
        import __spark_entry__ as entry_mod
        df = entry_mod.queries()["q1_pricing_summary"](
            spark, "/root/testdata/sf0.001")
        s = plan_stats(df)
        assert s["has_partial_agg"]
        assert s["hash_aggregates"] >= 2
        assert len(s["scans"]) == 1
        # column pruning: the scan reads exactly the referenced columns —
        # the five Q1 columns plus the (l_orderkey, l_linenumber) pair the
        # hash-stability salt derives from (see _q_q1_pricing_summary)
        assert set(s["scans"][0]["columns"]) == {
            "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
            "l_discount", "l_returnflag", "l_linestatus"}
        assert s["scans"][0]["pushed_filters"]

    def test_report_renders(self, tables):
        rep = explain_report(
            tables["lineitem"].groupBy("l_returnflag")
            .agg(F.sum("l_quantity").alias("q")))
        assert "partial_agg=True" in rep
        assert "scan parquet" in rep


class TestEngineQueriesLintClean:
    """The engine's own TPC-H-shape headline plans carry no error- or
    warn-level findings — the PLANS.md audit as an executable gate."""

    @pytest.mark.parametrize("name", [
        "q1_pricing_summary", "q6_forecast", "q3_shipping",
        "q5_local_supplier", "q18_large_orders", "masked_sum",
        "segment_revenue", "global_sample",
    ])
    def test_clean(self, spark, name):
        import __spark_entry__ as entry_mod
        df = entry_mod.queries()[name](spark, "/root/testdata/sf0.001")
        assert_scalable(df)
