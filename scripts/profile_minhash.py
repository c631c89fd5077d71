#!/usr/bin/env python
"""Per-stage wall-clock decomposition of the minhash_neardup pipeline at
the bench SF (guide §1: isolate where the time goes before touching
anything). Each stage is materialized with the noop sink in sequence;
stage boundaries follow the operator's own structure:

  1. exact-dup collapse   groupBy(text).min(id)
  2. signatures           explode shingles -> k min aggs
  3. band entries         fold+explode (persisted)
  4. candidate pairs      bucket self-join + distinct
  5. full verify          candidate-pruned jaccard join (the whole query)

Stages overlap (5 contains 1-4's work unless persisted), so the numbers
are cumulative evidence, not an additive breakdown. Run standalone:
  python scripts/profile_minhash.py [SF_DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = (sys.argv[1] if len(sys.argv) > 1
              else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    from pandas_plus_spark.session import get_spark
    from pandas_plus_spark.util import release_cached
    from pandas_plus_spark.operators import dedup
    from pandas_plus_spark.sources import load_tables
    from pyspark.sql import functions as F

    spark = get_spark(app_name="profile-minhash")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_tables(spark, sf_dir)["documents"]
    docs.count()  # warm scan

    timings = {}

    def stage(name, fn):
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        return out

    # 1. exact collapse
    collapsed = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    stage("collapse", lambda: noop(collapsed))

    # 2. signatures over the collapsed frame (persist collapse so later
    # stages don't re-pay it)
    coll_p = collapsed.persist()
    coll_p.count()
    sigs = dedup.minhash_signatures(coll_p, "text", "doc_id", 16, 3)
    stage("signatures", lambda: noop(sigs))

    # 3. band entries
    entries = dedup._band_entries(sigs, 8, 16, "xxhash64")
    stage("band_entries", lambda: noop(entries))

    # 4. candidates (includes sigs recompute since entries not persisted
    # here; operator persists internally in the real path)
    cands = dedup.minhash_lsh_candidates(sigs, 8, num_hashes=16)
    stage("candidates", lambda: noop(cands))
    release_cached(cands)
    coll_p.unpersist()

    # 5. full pipeline (the priced query shape)
    full = dedup.minhash_dedup(docs, "text", "doc_id", threshold=0.3,
                               num_hashes=16, bands=8)
    stage("full_pipeline", lambda: noop(full))
    release_cached(full)

    # 5b. hot re-run
    full2 = dedup.minhash_dedup(docs, "text", "doc_id", threshold=0.3,
                                num_hashes=16, bands=8)
    stage("full_pipeline_hot", lambda: noop(full2))
    release_cached(full2)

    print(timings)


if __name__ == "__main__":
    main()
