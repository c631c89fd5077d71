"""Layout-aware sinks: partition pruning and bucketed exchange elision,
asserted on the physical plans of subsequent reads."""

import tempfile

import pyspark.sql.functions as F

from pandas_plus_spark.sources import write_partitioned, write_bucketed


def test_partitioned_write_prunes_on_read(spark, tables):
    d = tempfile.mkdtemp(prefix="part_sink_") + "/li"
    write_partitioned(tables["lineitem"], d, partition_by="l_returnflag",
                      mode="overwrite")
    back = spark.read.parquet(d).filter(F.col("l_returnflag") == "A")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(l_returnflag" in plan
    assert back.count() == tables["lineitem"].filter("l_returnflag = 'A'").count()


def test_cobucketed_fact_join_has_zero_exchange(spark):
    """The segment_revenue_bucketed layout claim: lineitem⋈orders co-bucketed
    on the order key plans with NO Exchange anywhere on the join — and the
    (segment, orderkey) fine-level agg rides the same layout."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as em
    li_t, ord_t = em._ensure_bucketed_facts(spark, "/root/testdata/sf0.001")
    # at test SF the orders side fits a broadcast, which bypasses bucketing
    # entirely; the layout's value is the 100 TB condition where NEITHER
    # side broadcasts — force that condition for the plan assertion
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(li_t).join(
            spark.table(ord_t), F.col("l_orderkey") == F.col("o_orderkey"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        # fine-level agg keyed on a superset of the bucket key: still no
        # exchange (HashPartitioning(o_orderkey) clusters every group)
        fine = joined.groupBy("o_custkey", "o_orderkey").agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        fplan = fine._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in fplan, fplan
        # and the values equal the plain-parquet join
        from pandas_plus_spark.sources import load_table
        exp = (load_table(spark, "/root/testdata/sf0.001", "lineitem")
               .join(load_table(spark, "/root/testdata/sf0.001", "orders"),
                     F.col("l_orderkey") == F.col("o_orderkey")).count())
        assert joined.count() == exp
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql(f"DROP TABLE IF EXISTS {li_t}")
        spark.sql(f"DROP TABLE IF EXISTS {ord_t}")


def test_bucketed_table_skips_exchange(spark, tables):
    import uuid
    tbl = f"orders_bucketed_{uuid.uuid4().hex[:8]}"
    write_bucketed(tables["orders"], tbl, bucket_by="o_custkey",
                   num_buckets=8, mode="overwrite")
    try:
        agg = spark.table(tbl).groupBy("o_custkey").agg(F.sum("o_totalprice"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        # the groupBy on the bucket key needs NO shuffle
        assert "Exchange hashpartitioning(o_custkey" not in plan
        assert agg.count() == tables["orders"].select("o_custkey").distinct().count()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
