#!/usr/bin/env python
"""Same-boot interleaved A/B for the WHOLE r16 engine delta that is
toggleable in-process: variant A = r16 (lineage cuts + ewm RANGE-window
carry), variant B = r15 behavior (persist() pins + ewm aggregate+join
carry). Runs AB x3 then BA x3 in ONE boot (r15 pmod lesson: single-order
interleaves manufacture phantom wins; reversing the order inside the same
boot separates code effect from warm-up / host-contention drift).

The capped-LSH aggregate fold and the group_fill sort-share have no
toggle (both variants run the r16 form); both are planning-size /
sort-count structural changes receipted by plan diffs.

Usage: python scripts/ab_r16_engine.py [SF_DIR]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# queries whose plans the toggles change, plus one untouched control
QUERIES = [
    "minhash_neardup", "incremental_dedup_indexed",
    "lsh_skew_capped", "lsh_skew_uncapped",
    "group_rank_scale", "token_budget",
    "unigram_ppl", "bigram_ppl",
    "ewm_mean", "ewm_var_std",
    "q1_pricing_summary",  # control: no toggle touches it
]


def main() -> None:
    sf_dir = (sys.argv[1] if len(sys.argv) > 1
              else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    import pandas_plus_spark.groupby.core as GC
    import pandas_plus_spark.util as U
    from pandas_plus_spark.session import get_spark
    from pandas_plus_spark.util import release_cached

    spark = get_spark(app_name="ab-r16-engine")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    from bench import warm_session

    registry = entry_mod.queries()

    def q(name):
        return registry.get(name) or getattr(entry_mod, "_q_" + name)

    qs = {name: q(name) for name in QUERIES}
    qs["group_minmax"] = registry["group_minmax"]
    qs["shift"] = q("shift")
    warm_session(spark, sf_dir, qs)
    q("incremental_dedup_indexed")(spark, sf_dir).write.format("noop").mode(
        "overwrite").save()

    def run(name, r16):
        U._LINEAGE_CUT_ENABLED = r16
        GC._EWM_CARRY_VIA_WINDOW = r16
        spark.sparkContext.setJobDescription(
            f"ab {name} {'r16' if r16 else 'r15'}")
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        release_cached(df)
        spark.catalog.clearCache()
        return round(dt, 4)

    out: dict[str, dict[str, list[float]]] = {
        n: {"r16": [], "r15": []} for n in QUERIES}
    for order in ([True, False], [False, True]):
        for _ in range(3):
            for r16 in order:
                key = "r16" if r16 else "r15"
                for n in QUERIES:
                    out[n][key].append(run(n, r16))
    U._LINEAGE_CUT_ENABLED = True
    GC._EWM_CARRY_VIA_WINDOW = True
    med = {n: {k: round(statistics.median(v), 4) for k, v in d.items()}
           for n, d in out.items()}
    print(json.dumps({"metric": "ab_r16_engine", "sf": sf_dir,
                      "medians": med, "raw": out}, indent=1))


if __name__ == "__main__":
    main()
