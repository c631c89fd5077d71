#!/usr/bin/env python
"""Replicate the driver's sf0.1 testdata N-fold with FK-consistent key
shifts, producing an sf~1 dataset for scaling benchmarks.

Usage: python scripts/make_scaled_data.py SRC_DIR DST_DIR N

Each replica i shifts every key-domain column by i * (domain_max + 1), so
joins fan out exactly as in the source (replica i's orders reference
replica i's customers, etc.). region/nation are shared dimensions and are
NOT replicated (replicated fact rows keep referencing them, as a bigger
cluster would). Document text gets a tiny per-replica prefix so the scaled
corpus is not one giant exact-duplicate class (which would measure the
dedup collapse path, not the pipeline).
"""

from __future__ import annotations

import os
import sys

import duckdb


def main() -> None:
    src, dst, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}/{t}.parquet')")

    # one shift unit per key DOMAIN (shared across tables that reference it)
    unit = {
        "custkey": con.sql("SELECT max(c_custkey)+1 FROM customer").fetchone()[0],
        "suppkey": con.sql("SELECT max(s_suppkey)+1 FROM supplier").fetchone()[0],
        "partkey": con.sql("SELECT max(p_partkey)+1 FROM part").fetchone()[0],
        "orderkey": con.sql("SELECT max(o_orderkey)+1 FROM orders").fetchone()[0],
        "event_id": con.sql("SELECT max(event_id)+1 FROM events").fetchone()[0],
        "user_id": con.sql("SELECT max(user_id)+1 FROM events").fetchone()[0],
        "doc_id": con.sql("SELECT max(doc_id)+1 FROM documents").fetchone()[0],
        "vec_id": con.sql("SELECT max(vec_id)+1 FROM embeddings").fetchone()[0],
    }
    shifts = {  # table -> {column: domain}
        "customer": {"c_custkey": "custkey"},
        "supplier": {"s_suppkey": "suppkey"},
        "part": {"p_partkey": "partkey"},
        "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
        "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey",
                     "l_suppkey": "suppkey"},
        "events": {"event_id": "event_id", "user_id": "user_id"},
        "documents": {"doc_id": "doc_id"},
        "embeddings": {"vec_id": "vec_id"},
    }

    for t in ("region", "nation"):  # shared dims: copy through
        con.sql(f"COPY (SELECT * FROM {t}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        print(t, "copied")

    for t, smap in shifts.items():
        cols = [r[0] for r in con.sql(f"DESCRIBE {t}").fetchall()]
        exprs = []
        for c in cols:
            if c in smap:
                exprs.append(f"{c} + i * {unit[smap[c]]} AS {c}")
            elif t == "documents" and c == "text":
                # suffix every non-final token with the replica number:
                # token counts are unchanged, intra-replica near-dup
                # structure is preserved, but shingle sets are DISJOINT
                # across replicas — a replica-prefix variant left every doc
                # a 10-deep NEAR-dup cluster, which benchmarks the dedup
                # blowup path instead of a 10x corpus.
                exprs.append("CASE WHEN i = 0 THEN text "
                             "ELSE replace(text, ' ', i::VARCHAR || ' ') "
                             "END AS text")
            else:
                exprs.append(c)
        # small row groups so Spark scans SPLIT: the driver's fixtures are
        # single-row-group files (one scan task no matter what); the scaled
        # data should instead look like real multi-split input
        rg = 4096 if t in ("documents", "embeddings") else 100_000
        q = (f"COPY (SELECT {', '.join(exprs)} FROM {t}, range({n}) r(i)) "
             f"TO '{dst}/{t}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE {rg})")
        con.sql(q)
        rows = con.sql(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
        print(t, "->", rows, "rows")


if __name__ == "__main__":
    main()
