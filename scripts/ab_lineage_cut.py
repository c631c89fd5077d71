#!/usr/bin/env python
"""Same-boot interleaved A/B for the r16 lineage-cut change: variant A =
lineage_cut (localCheckpoint), variant B = the r15 persist() fallback
(util._LINEAGE_CUT_ENABLED=False). Runs AB x3 then BA x3 in ONE boot (the
r15 pmod lesson: single-order interleaves manufacture phantom wins — the
later variant always looks better; reversing the order inside the same
boot separates code effect from warm-up drift).

Usage: python scripts/ab_lineage_cut.py [SF_DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["minhash_neardup", "incremental_dedup_indexed",
           "lsh_skew_capped", "lsh_skew_uncapped"]


def main() -> None:
    sf_dir = (sys.argv[1] if len(sys.argv) > 1
              else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    import pandas_plus_spark.util as U
    from pandas_plus_spark.session import get_spark
    from pandas_plus_spark.util import release_cached

    spark = get_spark(app_name="ab-lineage-cut")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    from bench import HEADLINE, warm_session  # noqa: F401

    registry = entry_mod.queries()

    def q(name):
        return registry.get(name) or getattr(entry_mod, "_q_" + name)

    qs = {name: q(name) for name in QUERIES}
    qs["group_minmax"] = registry["group_minmax"]
    qs["shift"] = q("shift")
    warm_session(spark, sf_dir, qs)
    q("incremental_dedup_indexed")(spark, sf_dir).write.format("noop").mode(
        "overwrite").save()

    def run(name, enabled):
        U._LINEAGE_CUT_ENABLED = enabled
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        release_cached(df)
        spark.catalog.clearCache()
        return round(dt, 4)

    out: dict[str, dict[str, list[float]]] = {
        n: {"cut": [], "persist": []} for n in QUERIES}
    for order in ([True, False], [False, True]):
        for _ in range(3):
            for enabled in order:
                key = "cut" if enabled else "persist"
                for n in QUERIES:
                    out[n][key].append(run(n, enabled))
    U._LINEAGE_CUT_ENABLED = True
    med = {n: {k: sorted(v)[len(v) // 2] for k, v in d.items()}
           for n, d in out.items()}
    print(json.dumps({"metric": "ab_lineage_cut", "sf": sf_dir,
                      "medians": med, "raw": out}, indent=1))


if __name__ == "__main__":
    main()
