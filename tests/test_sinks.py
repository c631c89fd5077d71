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
