#!/usr/bin/env python
"""Repeat-run a query subset in ONE boot and print the per-query timing
spread — the variance receipt the r16 noise-attribution table needs
(VERDICT r15 item 6: the nine flagged 'regressions' were never re-measured
on one boot before being attributed).

Usage: python scripts/bench_repeat.py [-n ROUNDS] QUERY [QUERY ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.

Protocol: bench.py's warm_session, then ROUNDS (default 6) round-robin
passes over the queries (round-robin, not per-query batches, so slow
drift spreads evenly across queries), noop sink, release_cached after
each run. Prints one JSON line with raw runs + median/min/max.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    rounds = 6
    if args and args[0] == "-n":
        rounds = int(args[1])
        args = args[2:]
    names = args
    if not names:
        raise SystemExit("usage: bench_repeat.py [-n N] QUERY [QUERY ...]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pandas_plus_spark.session import get_spark
    from pandas_plus_spark.util import release_cached

    spark = get_spark(app_name="bench-repeat")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    from bench import warm_session

    registry = entry_mod.queries()

    def q(name):
        return registry.get(name) or getattr(entry_mod, "_q_" + name)

    qs = {name: q(name) for name in names}
    qs["group_minmax"] = registry["group_minmax"]
    qs["shift"] = q("shift")
    warm_session(spark, sf_dir, qs)
    if "incremental_dedup_indexed" in names:
        q("incremental_dedup_indexed")(spark, sf_dir).write.format(
            "noop").mode("overwrite").save()

    runs: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(rounds):
        for name in names:
            spark.sparkContext.setJobDescription(f"repeat:{name}")
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs[name].append(round(time.perf_counter() - t0, 4))
            release_cached(df)
            spark.sparkContext.setJobDescription(None)
    summary = {n: {"median": round(statistics.median(v), 4),
                   "min": min(v), "max": max(v), "runs": v}
               for n, v in runs.items()}
    print(json.dumps({"metric": "bench_repeat", "sf_dir": sf_dir,
                      "rounds": rounds, "queries": summary}, indent=1))


if __name__ == "__main__":
    main()
