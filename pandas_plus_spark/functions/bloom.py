"""Distributed Bloom filter over a DataFrame column.

The 100 TB pre-filter pattern (reference has no analog; this is the
standard scale move for cross-corpus membership): summarize a reference
set of N keys into an ``n_bits`` bitmap whose size is INDEPENDENT of the
corpus — ``n_bits/8`` bytes total, ~10 bits/key for ~1% false positives
— then probe candidate rows MAP-SIDE against the broadcast bitmap. A
probe never shuffles and never touches the reference corpus; only the
(tiny) surviving fraction proceeds to the exact verification join. False
positives cost a little verify work; false negatives are impossible, so
any exact join downstream keeps results exactly correct.

Spark-first construction, no custom aggregates needed:

- the ``k`` bit positions per key are plain JVM expressions — seeded
  ``xxhash64`` folded per probe (:func:`bloom_positions`), shared by the
  build and probe sides so the hash family always matches;
- the bitmap is built with ``explode`` + ``groupBy(word).agg(bit_or)``:
  a map-side-combining aggregation whose result is at most
  ``n_bits/64`` rows of ``(word, bits)`` — corpus-size-independent;
- the probe is an Arrow-batched pandas UDF over a ``SparkContext``
  broadcast of the dense numpy bitmap: pure map work, vectorized
  ``(bits[word] >> bit) & 1`` per batch.

Driver/bitmap bound: materializing the dense bitmap costs ``n_bits/8``
bytes on the driver and per executor (broadcast) — e.g. 1.25 GB for
1 B keys at 10 bits/key — the Bloom trade by design. The sparse
``(word, bits)`` frame round-trips through parquet like any table, so a
continuously-ingesting pipeline unions new entries in with one more
``bit_or`` pass (Bloom filters OR losslessly).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F


def bloom_positions(col, n_bits: int, k: int) -> Column:
    """``array<long>`` of the ``k`` bit positions of a key — seeded
    ``xxhash64(seed_i, key)`` mod ``n_bits``. The single source of the
    hash family: build and probe both call this, so they can never
    disagree. NULL keys yield a NULL array (treated as "not contained")."""
    col = F.col(col) if isinstance(col, str) else col
    return F.when(
        col.isNotNull(),
        F.array(*[F.pmod(F.xxhash64(F.lit(i), col), F.lit(n_bits))
                  for i in range(k)]))


def bloom_build(df: DataFrame, col, n_bits: int, k: int = 7) -> DataFrame:
    """Build the sparse bitmap: one row per 64-bit word that has any bit
    set — ``(word long, bits long)``, at most ``n_bits/64`` rows.

    One pass over the keys (explode ×k is cheap: two longs per entry),
    partial ``bit_or`` map-side, final frame corpus-size-independent.
    Write it to parquet next to the corpus index and union+re-``bit_or``
    to append new keys incrementally."""
    pos = F.explode(bloom_positions(col, n_bits, k)).alias("__p")
    return (
        df.select(pos)
        .select(F.shiftright("__p", 6).alias("word"),
                # pyspark's shiftleft() wrapper only takes a literal shift;
                # the SQL function accepts any int expression.
                F.expr("shiftleft(1L, cast(__p % 64 as int))").alias("__m"))
        .groupBy("word").agg(F.bit_or("__m").alias("bits"))
    )


def bloom_to_numpy(words_df: DataFrame, n_bits: int) -> np.ndarray:
    """Collect the sparse ``(word, bits)`` frame into the dense int64
    bitmap the probe broadcasts — ``n_bits/8`` bytes, Arrow-columnar
    collect (no Python row objects)."""
    if n_bits % 64:
        raise ValueError("n_bits must be a multiple of 64")
    dense = np.zeros(n_bits // 64, dtype=np.int64)
    pdf = words_df.toPandas()
    dense[pdf["word"].to_numpy(dtype=np.int64)] = pdf["bits"].to_numpy(dtype=np.int64)
    return dense


def bloom_might_contain(
    df: DataFrame, col, dense: np.ndarray, n_bits: int, k: int = 7,
    out_col: str = "might_contain",
) -> DataFrame:
    """Append boolean ``out_col``: True iff every one of the key's ``k``
    bits is set in the bitmap (i.e. the key MIGHT be in the reference
    set; False is definitive absence). Zero-shuffle: positions are
    computed JVM-side, the bitmap ships once per executor as a
    ``SparkContext`` broadcast, and the check is a vectorized numpy
    gather per Arrow batch."""
    bc = df.sparkSession.sparkContext.broadcast(dense)

    @F.pandas_udf("boolean")
    def probe(pos: pd.Series) -> pd.Series:
        bits = bc.value
        if not len(pos):
            return pd.Series([], dtype=bool)
        null = pos.isna()
        # NULL position arrays (NULL keys) probe word 0 harmlessly, then
        # get forced to False below.
        filled = pos.where(~null, other=pd.Series([[0] * k] * len(pos),
                                                  index=pos.index))
        arr = np.asarray(filled.tolist(), dtype=np.int64)
        hit = ((bits[arr >> 6] >> (arr & 63)) & 1).all(axis=1)
        return pd.Series(np.where(null.to_numpy(), False, hit))

    return df.withColumn(out_col, probe(bloom_positions(col, n_bits, k)))
