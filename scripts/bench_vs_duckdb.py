#!/usr/bin/env python
"""Engine-vs-DuckDB wall-clock at an arbitrary SF dir — the reproducible
source of BASELINE.md's oracle-priced comparison tables.

Usage: python scripts/bench_vs_duckdb.py SF_DIR [query ...]

Default query set = the headline queries that have a SQL oracle (DuckDB
can only price those). Engine protocol matches bench.py (warm session,
noop sink, caches released); DuckDB runs the oracle_sql() twin on the
same parquet, materializing the FULL result via .arrow() — columnar
transfer, the fair analog of the engine's noop sink. (fetchall() was the
r5.0 protocol; on 6M-row results it measured Python-tuple construction,
~2x the query's own cost, inflating DuckDB by up to 90 s per query.)
Prints one JSON line with per-query (engine_sec, duck_sec) pairs and the
subset totals.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from pandas_plus_spark.session import get_spark  # noqa: E402
from pandas_plus_spark.util import release_cached  # noqa: E402

# Oracle twins for query shapes whose registry entries were folded into
# compound gates by the r10 consolidation (the compounds' oracles cover
# these columns; the bench keeps pricing the original narrow shapes).
FOLDED_SQL = {
    "rolling_sum": """
        SELECT event_id, user_id, value,
               CASE WHEN count(value) OVER w >= 3 THEN sum(value) OVER w END
                 AS value_rolling_sum
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
}


def main() -> None:
    sf_dir = sys.argv[1]
    spark = get_spark(app_name="pps-bench-vs-duckdb")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em
    from bench import HEADLINE, warm_session
    from oracle_harness import duck_connection

    registry, sqls = em.queries(), em.oracle_sql()
    # the stored-index form is pure precomputation — same twin as the fold
    FOLDED_SQL.setdefault("incremental_dedup_indexed",
                          em._sql_incremental_dedup())

    # folded compound gates (r10 consolidation): price the original query
    # shapes via module-level callables for BENCH name continuity; their
    # oracle SQL twins live in FOLDED_SQL below.
    def q(name):
        return registry.get(name) or getattr(em, "_q_" + name)

    names = sys.argv[2:] or [n for n in HEADLINE
                             if n in sqls or n in FOLDED_SQL]
    qs = {n: q(n) for n in names}
    for n in ("group_minmax", "shift"):
        qs.setdefault(n, q(n))
    sqls = {**FOLDED_SQL, **sqls}

    # Warm the engine INFRASTRUCTURE only (JVM C2, Python worker pool,
    # committer) — never a priced plan; see bench.warm_session. The timed
    # pass below still pays every priced plan's own codegen compile + AQE.
    warm_session(spark, sf_dir, qs)
    if "incremental_dedup_indexed" in names:
        q("incremental_dedup_indexed")(spark, sf_dir).write.format(
            "noop").mode("overwrite").save()

    con = duck_connection(sf_dir)
    # symmetric warm on the DuckDB side (negligible, kept for protocol
    # fairness: both engines start their timed pass post-initialization)
    con.sql("SELECT count(*) FROM lineitem").arrow()
    results: dict[str, dict] = {}
    for name in names:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        eng = round(time.perf_counter() - t0, 4)
        release_cached(df)
        t0 = time.perf_counter()
        con.sql(sqls[name]).arrow()
        duck = round(time.perf_counter() - t0, 4)
        results[name] = {"engine": eng, "duck": duck}
        print(f"# {name}: engine {eng:.2f}s duck {duck:.2f}s", file=sys.stderr)
    te = round(sum(r["engine"] for r in results.values()), 2)
    td = round(sum(r["duck"] for r in results.values()), 2)
    print(json.dumps({
        "metric": "engine_vs_duckdb",
        "engine_total": te,
        "duck_total": td,
        "ratio": round(te / td, 3) if td else None,
        "queries": results,
        "sf_dir": sf_dir,
    }))


if __name__ == "__main__":
    main()
