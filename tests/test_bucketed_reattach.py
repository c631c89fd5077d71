"""Cross-session reuse of the bucketed fact layout: a fresh driver
session must RE-REGISTER the on-disk layout (sidecar + CREATE TABLE ...
CLUSTERED BY ... LOCATION) instead of rewriting the fact — the
steady-state contract of `_ensure_bucketed_facts` (at sf100 the rebuild
is ~19 min; the reattach is a DDL statement). Runs two real driver
sessions in subprocesses because the in-memory catalog cannot forget a
managed table without deleting its data."""

import json
import subprocess
import sys

SF = "/root/testdata/sf0.001"

_SESSION = """
import sys, json, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as em
t0 = time.perf_counter()
df = em.queries()["segment_revenue_bucketed"](spark, %r)
rows = sorted(tuple(r) for r in df.collect())
plan = df._jdf.queryExecution().executedPlan().toString()
print("RESULT " + json.dumps({
    "rows": rows,
    "secs": round(time.perf_counter() - t0, 2),
    "bucketed_scan": ("SelectedBucketsCount" in plan) or ("Bucketed: true" in plan),
    "sort_merge": "SortMergeJoin" in plan,
    "external": bool(spark.sql(
        "DESCRIBE TABLE EXTENDED pps_bkt_lineitem_sf0_001"
    ).where("col_name = 'Type'").first()["data_type"] == "EXTERNAL"),
}))
""" % SF


def _run_session() -> dict:
    out = subprocess.run([sys.executable, "-c", _SESSION],
                         capture_output=True, text=True, timeout=600)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise AssertionError(f"no RESULT line:\n{out.stdout}\n{out.stderr}")


def test_bucketed_layout_reattaches_across_sessions():
    first = _run_session()    # builds (or reattaches a prior run's layout)
    second = _run_session()   # MUST reattach: external table, same rows
    assert second["rows"] == first["rows"]
    assert second["bucketed_scan"] and first["bucketed_scan"]
    # the co-bucketed join never degrades to a sort-merge of the fact
    assert not second["sort_merge"] and not first["sort_merge"]
    # the reattached table is EXTERNAL (re-registered files, not rewritten)
    assert second["external"]
