#!/usr/bin/env python
"""Two full bench.py headline passes in ONE boot (VERDICT r9 item 8):
the r9 driver bench moved 52.4 -> 57.8 s while the builder's one-boot
run read 49.6 s on the same query set — a same-boot pair bounds how
much of any cross-round BENCH delta is boot variance vs code. Prints
TWO JSON lines (pass 1 = the driver-comparable single-shot pricing,
pass 2 = the hot-plan re-execution floor) plus a delta summary line.

Usage: python scripts/bench_pair.py [SF_DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = (sys.argv[1] if len(sys.argv) > 1
              else os.environ.get("SPARK_GRAFT_SF_DIR",
                                  "/root/testdata/sf0.1"))
    from pandas_plus_spark.session import get_spark
    from pandas_plus_spark.util import release_cached

    spark = get_spark(app_name="pandas-plus-spark-bench-pair")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    from bench import HEADLINE, warm_session

    registry = entry_mod.queries()

    def q(name):
        return registry.get(name) or getattr(entry_mod, "_q_" + name)

    qs = {name: q(name) for name in HEADLINE}
    qs["group_minmax"] = registry["group_minmax"]
    qs["shift"] = q("shift")
    warm_session(spark, sf_dir, qs)
    q("incremental_dedup_indexed")(spark, sf_dir).write.format("noop").mode(
        "overwrite").save()

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    passes = []
    for pass_no in (1, 2):
        timings: dict[str, float] = {}
        for name in HEADLINE:
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 4)
            release_cached(df)
        passes.append(timings)
        print(json.dumps({
            "metric": f"headline_total_wall_pass{pass_no}",
            "value": round(sum(timings.values()), 4),
            "unit": "sec",
            "queries": timings,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        }), flush=True)
    t1, t2 = (sum(p.values()) for p in passes)
    print(json.dumps({
        "metric": "same_boot_pair_delta",
        "pass1_sec": round(t1, 2),
        "pass2_sec": round(t2, 2),
        "pass2_over_pass1": round(t2 / t1, 3) if t1 else None,
    }))


if __name__ == "__main__":
    main()
