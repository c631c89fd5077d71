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


def test_bucketed_ref_index_exact_join_index_side_shuffle_free(spark):
    """The incremental_dedup_bucketed layout claim: a batch's exact join
    against the BUCKETED stored content-hash index exchanges (and sorts)
    ONLY the batch side — the corpus-sized index side's distribution
    comes from the layout. With broadcast disabled (the 100 TB condition:
    neither a corpus-sized index nor a large batch broadcasts), the plan
    must show exactly one hashpartitioning exchange (the batch's)."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as em
    h_t, b_t, _, _ = em._ensure_ref_index_bucketed(
        spark, "/root/testdata/sf0.001")
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        from pandas_plus_spark.sources import load_table
        batch = (load_table(spark, "/root/testdata/sf0.001", "documents")
                 .filter(F.col("doc_id") % 5 == 0)
                 .select("doc_id",
                         F.sha2(F.col("text").cast("string"), 256)
                         .alias("__h")))
        joined = batch.join(spark.table(h_t), "__h")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan, plan
        import re
        exchanges = re.findall(r"Exchange hashpartitioning\([^)]*\)", plan)
        assert len(exchanges) == 1 and "__h" in exchanges[0], plan
        # index side is SORTED BY __h in the layout: exactly one Sort
        # (the batch side's) feeds the merge join
        assert plan.count("Sort [__h") + plan.count("Sort [_w") <= 2
        # band-entry table likewise answers its (band, bhash) join from
        # the layout
        eb = spark.table(b_t)
        probe = eb.limit(50).select(
            F.col("id").alias("pid"), "band", "bhash")
        bplan = (probe.join(eb, ["band", "bhash"])
                 ._jdf.queryExecution().executedPlan().toString())
        assert "Bucketed: true" in bplan, bplan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql(f"DROP TABLE IF EXISTS {h_t}")
        spark.sql(f"DROP TABLE IF EXISTS {b_t}")


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


def test_zordered_write_narrows_file_stats(spark, tables, tmp_path):
    """Every output file of a z-ordered write must cover a small slice of
    EACH z column's range (parquet footer min/max), so predicates on either
    column can prune most files."""
    import pyarrow.parquet as pq
    from pandas_plus_spark.sources.sinks import write_zordered

    out = str(tmp_path / "z")
    li = tables["lineitem"].select("l_orderkey", "l_partkey", "l_quantity")
    write_zordered(li, out, ["l_orderkey", "l_partkey"], mode="overwrite",
                   target_files=16)

    import glob
    files = sorted(glob.glob(out + "/*.parquet"))
    assert len(files) >= 8
    spans = {c: [] for c in ("l_orderkey", "l_partkey")}
    glo = {c: [None, None] for c in spans}
    for f in files:
        md = pq.read_metadata(f)
        mins = {c: None for c in spans}
        maxs = {c: None for c in spans}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name in spans and col.statistics is not None:
                    st = col.statistics
                    mins[name] = st.min if mins[name] is None else min(mins[name], st.min)
                    maxs[name] = st.max if maxs[name] is None else max(maxs[name], st.max)
        for c in spans:
            assert mins[c] is not None
            spans[c].append(maxs[c] - mins[c])
            glo[c][0] = mins[c] if glo[c][0] is None else min(glo[c][0], mins[c])
            glo[c][1] = maxs[c] if glo[c][1] is None else max(glo[c][1], maxs[c])

    for c in spans:
        full = glo[c][1] - glo[c][0]
        avg_span = sum(spans[c]) / len(spans[c])
        # a random (unclustered) layout gives avg_span ≈ full on BOTH
        # columns; z-order must shrink both substantially
        assert avg_span < 0.55 * full, (c, avg_span, full)

    # round-trip: no row loss, identical content ignoring order
    got = spark.read.parquet(out)
    assert got.count() == li.count()
    assert got.agg(F.sum("l_quantity")).first()[0] == \
        li.agg(F.sum("l_quantity")).first()[0]
