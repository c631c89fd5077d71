#!/usr/bin/env python
"""Sharded-Bloom probe at past-dense-broadcast size — the reproducible
source of BASELINE.md's r7 bloom-scale row.

Builds a 2^33-bit (1 GiB dense-equivalent) Bloom bitmap from N_REF
synthetic reference keys WITHOUT ever materializing it on the driver
(the sparse (word, bits) frame stays distributed end-to-end), then
probes N_PROBE present keys and N_PROBE absent keys through
``bloom_might_contain_sharded`` and asserts:

- ZERO false negatives (every present key verdicts True — the contract
  that makes the pre-filter safe in front of an exact join);
- the absent-key false-positive rate is within ~2x of the theoretical
  (1 - e^(-kN/m))^k for the (n_bits, k, N_ref) operating point.

Usage: python scripts/bloom_scale_probe.py [n_bits_log2 [n_ref]]
Prints one JSON line with timings and the measured FP rate.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pandas_plus_spark.session import get_spark  # noqa: E402
from pandas_plus_spark.functions import bloom  # noqa: E402


def main() -> None:
    n_bits = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 33)
    n_ref = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000_000
    n_probe = 1_000_000
    k = 7
    spark = get_spark(app_name="pps-bloom-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # reference keys 0..n_ref-1 hashed to spread; absent keys use a
    # disjoint range so membership is known exactly
    ref = spark.range(n_ref).select(F.col("id").alias("key"))

    t0 = time.perf_counter()
    words = bloom.bloom_build(ref, "key", n_bits, k).persist()
    n_words = words.count()          # materialize the distributed bitmap
    build_s = round(time.perf_counter() - t0, 2)

    present = spark.range(n_probe).select(
        (F.col("id") * (n_ref // n_probe)).alias("key"))       # all in ref
    absent = spark.range(n_probe).select(
        (F.col("id") + 2 * n_ref).alias("key"))                # none in ref

    t0 = time.perf_counter()
    fn = (bloom.bloom_might_contain_sharded(present, "key", words, n_bits, k)
          .where(~F.col("might_contain")).count())
    present_s = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    fp = (bloom.bloom_might_contain_sharded(absent, "key", words, n_bits, k)
          .where(F.col("might_contain")).count())
    absent_s = round(time.perf_counter() - t0, 2)
    words.unpersist()

    fp_rate = fp / n_probe
    theory = (1 - 2.718281828 ** (-k * n_ref / n_bits)) ** k
    assert fn == 0, f"{fn} FALSE NEGATIVES — the Bloom contract is broken"
    assert fp_rate < max(2 * theory, 1e-4), (fp_rate, theory)
    print(json.dumps({
        "metric": "bloom_sharded_scale_probe",
        "n_bits": n_bits,
        "dense_equiv_gib": round(n_bits / 8 / 2**30, 2),
        "n_ref_keys": n_ref,
        "n_sparse_words": n_words,
        "k": k,
        "build_sec": build_s,
        "probe_present_sec": present_s,
        "probe_absent_sec": absent_s,
        "false_negatives": fn,
        "fp_rate": fp_rate,
        "fp_rate_theory": round(theory, 6),
    }))


if __name__ == "__main__":
    main()
