#!/usr/bin/env python
"""Measure capped-LSH behavior where the cap actually ENGAGES (r8,
VERDICT item 5) — the Zipfian fixture (20% of vectors collapse onto one
all-ones direction, so every hot vector co-buckets in EVERY table).

Three measurements, one warm session, JSON lines to stdout:

1. engagement proof: bucket stats at the semantic-dedup operating point
   (3 planes x 12 tables, cap 16) — n_over_cap buckets, max bucket size.
2. PAIRWISE recall with the cap on vs off (sf0.1 fixture, exact side is
   the all-pairs cosine graph): documents that pair recall inside a
   mega-cluster collapses under the cap BY DESIGN (identical members
   co-bucket in every table, so the multi-table OR cannot rescue a
   sampled-out pair).
3. the metric dedup actually needs — CLUSTER MEMBERSHIP: on the sf1
   fixture (4000-member hot cluster vs cap 16), how many hot members the
   LSH+cap keep-list wrongly keeps, with hub edges (the r8
   capped_pair_candidates path) vs the entry-cap-only form (r7
   behavior, reconstructed inline for the A/B).

Usage: python scripts/lsh_cap_probe.py [SF_DIR_PAIRWISE] [SF_DIR_CLUSTER]
Defaults: /root/testdata/sf0.1 and .scratch/sf1.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pandas_plus_spark.operators import dedup, similarity  # noqa: E402
from pandas_plus_spark.session import get_spark  # noqa: E402
from pandas_plus_spark.sources import load_table  # noqa: E402
from pandas_plus_spark.util import release_cached  # noqa: E402

PLANES, TABLES, CAP, THRESHOLD = 3, 12, 16, 0.30


def skewed(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    hot = F.transform(F.col("embedding"), lambda x: F.lit(1.0))
    cold = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.when(F.col("vec_id") % 5 == 0, hot).otherwise(cold)
        .alias("embedding"))


def bucket_entries(df):
    entries = None
    for t in range(TABLES):
        bt = (similarity.hyperplane_lsh_buckets(
                  df, PLANES, "vec_id", "embedding", table=t, hash_fn="poly")
              .withColumn("table", F.lit(t)))
        entries = bt if entries is None else entries.unionByName(bt)
    return entries.persist()


def old_capped_pairs(entries):
    """r7 behavior: entry cap only, no hub edges — the A/B baseline."""
    capped = dedup._cap_bucket_entries(entries, ["table", "bucket"], CAP)
    a, b = capped.alias("a"), capped.alias("b")
    return (a.join(b, on=["table", "bucket"])
            .where(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct())


def keep_list_from(df, cands):
    out = similarity.semantic_dedup_keep_list(
        df, threshold=THRESHOLD, candidates=cands)
    kept = {r["id"] for r in out.where(F.col("keep")).select("id").collect()}
    release_cached(out)
    return kept


def main() -> None:
    sf_pair = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf_clus = sys.argv[2] if len(sys.argv) > 2 else ".scratch/sf1"
    spark = get_spark(app_name="pps-lsh-cap-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # --- 1 + 3: cluster membership at sf1 (cap engages 250x) ---
    emb = skewed(spark, sf_clus).persist()
    n = emb.count()
    n_hot = emb.where(F.col("vec_id") % 5 == 0).count()
    entries = bucket_entries(emb)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        stats = dedup.lsh_bucket_stats(entries, CAP, ["table", "bucket"])
    print(json.dumps({"probe": "engagement", "sf_dir": sf_clus, "n": n,
                      "n_hot": n_hot, "cap": CAP, **stats}))

    new_cands = dedup.capped_pair_candidates(
        entries, ["table", "bucket"], CAP).distinct()
    old_cands = old_capped_pairs(entries)
    n_new, n_old = new_cands.count(), old_cands.count()
    clique = n_hot * (n_hot - 1) // 2

    kept_new = keep_list_from(emb, new_cands)
    kept_old = keep_list_from(emb, old_cands)
    hot_ids = {r["vec_id"] for r in
               emb.where(F.col("vec_id") % 5 == 0).select("vec_id").collect()}
    print(json.dumps({
        "probe": "cluster_membership", "sf_dir": sf_clus,
        "hot_cluster": n_hot, "hot_clique_pairs": clique,
        "cands_cap_plus_hubs": n_new, "cands_cap_only": n_old,
        "hot_wrongly_kept_cap_plus_hubs": len(kept_new & hot_ids) - 1,
        "hot_wrongly_kept_cap_only": len(kept_old & hot_ids) - 1,
    }))
    release_cached(entries)
    emb.unpersist()

    # --- 2: pairwise recall on/off at the smaller fixture ---
    emb_s = skewed(spark, sf_pair)
    rec_off = similarity.lsh_pair_recall(
        emb_s, THRESHOLD, n_planes=PLANES, n_tables=TABLES,
        hash_fn="poly", max_bucket_size=None).first()
    rec_on = similarity.lsh_pair_recall(
        emb_s, THRESHOLD, n_planes=PLANES, n_tables=TABLES,
        hash_fn="poly", max_bucket_size=CAP).first()
    print(json.dumps({
        "probe": "pairwise_recall", "sf_dir": sf_pair, "cap": CAP,
        "n_exact": rec_off["n_exact"],
        "recall_uncapped": round(rec_off["recall"], 4),
        "recall_capped": round(rec_on["recall"], 4),
    }))


if __name__ == "__main__":
    main()
