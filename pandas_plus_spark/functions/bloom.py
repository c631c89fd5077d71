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


def _validate_params(n_bits: int, k: int) -> None:
    """Fail fast on the driver for parameter mistakes that would otherwise
    surface as silent no-ops or opaque executor errors: ``k == 0`` makes
    every probe vacuously True (an empty all() — the pre-filter silently
    disabled while appearing to work), and a tiny / non-word-aligned
    ``n_bits`` breaks the word/bit packing."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k} (k=0 would make every "
                         "probe vacuously True, disabling the filter)")
    if n_bits < 64 or n_bits % 64:
        raise ValueError(f"n_bits must be a positive multiple of 64, got {n_bits}")


def bloom_positions(col, n_bits: int, k: int) -> Column:
    """``array<long>`` of the ``k`` bit positions of a key — seeded
    ``xxhash64(seed_i, key)`` mod ``n_bits``. The single source of the
    hash family: build and probe both call this, so they can never
    disagree. NULL keys yield a NULL array (treated as "not contained")."""
    _validate_params(n_bits, k)
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


def bloom_broadcast(spark, dense: np.ndarray):
    """Broadcast the dense bitmap once for reuse across many probe calls.

    :func:`bloom_might_contain` creates a fresh ``SparkContext`` broadcast
    per call when handed a raw numpy bitmap; in a continuously-ingesting
    loop (one probe per batch, large ``n_bits``) those accumulate on the
    executors until Python GC happens to release the plan closures. For
    that shape, broadcast once with this helper, pass the returned
    ``Broadcast`` to every probe, and ``.unpersist()`` it when the bitmap
    is superseded (e.g. after a ``bit_or`` union absorbs new keys)."""
    return spark.sparkContext.broadcast(dense)


def bloom_might_contain(
    df: DataFrame, col, dense, n_bits: int, k: int = 7,
    out_col: str = "might_contain",
) -> DataFrame:
    """Append boolean ``out_col``: True iff every one of the key's ``k``
    bits is set in the bitmap (i.e. the key MIGHT be in the reference
    set; False is definitive absence). Zero-shuffle: positions are
    computed JVM-side, the bitmap ships once per executor as a
    ``SparkContext`` broadcast, and the check is a vectorized numpy
    gather per Arrow batch.

    ``dense`` is the numpy bitmap from :func:`bloom_to_numpy`, or a
    ``Broadcast`` of it from :func:`bloom_broadcast` — pass the broadcast
    form when probing repeatedly (per-batch loops) so the bitmap ships
    once and its lifecycle is caller-managed.

    Scale ceiling (dense-broadcast form): the bitmap costs ``n_bits/8``
    bytes on the driver and on every executor — ~10 bits/key means ~1.25
    GB per 10⁹ reference keys. Fine to ~10⁹–10¹⁰ keys; beyond that (a
    100 TB-class reference corpus is ~10¹¹ docs → ~125 GB bitmap) the
    bitmap is not broadcastable — use :func:`bloom_might_contain_sharded`,
    which keeps the bitmap distributed and joins the probes to it."""
    _validate_params(n_bits, k)
    from pyspark import Broadcast
    if isinstance(dense, Broadcast):
        bc, arr = dense, dense.value
    else:
        arr = dense
        bc = df.sparkSession.sparkContext.broadcast(dense)
    if arr.size * 64 != n_bits:
        raise ValueError(
            f"dense bitmap has {arr.size} words = {arr.size * 64} bits but "
            f"n_bits={n_bits}; bitmap and hash family must agree (a "
            "mismatch would probe a truncated/shifted bit range)")

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


def bloom_might_contain_sharded(
    df: DataFrame, col, words_df: DataFrame, n_bits: int, k: int = 7,
    out_col: str = "might_contain",
) -> DataFrame:
    """Same contract as :func:`bloom_might_contain` (no false negatives,
    NULL keys → False) but the bitmap stays DISTRIBUTED — the scale path
    past the dense-broadcast ceiling.

    The "shards" are the word-keyed partitions of the sparse ``(word,
    bits)`` frame itself (:func:`bloom_build` output, typically read back
    from parquet): each distinct probe key explodes into its ``k`` ``(word,
    mask)`` probes, those equi-join the sparse frame on ``word`` — Spark
    hash-partitions both sides by word, so every task probes exactly its
    shard of the bitmap, the hash-partition-plus-per-shard-piece plan
    expressed declaratively — and a ``bool_and`` over the key's ``k``
    probes rebuilds the verdict. A word row that doesn't exist means those
    bits are all zero (``coalesce(bits, 0)``), so absence is still
    definitive and no false negatives are possible.

    Cost: two extra shuffles versus the broadcast probe (distinct keys +
    the word join + the join back), in exchange for NO driver
    materialization and NO per-executor bitmap copy — the right trade once
    ``n_bits/8`` outgrows broadcast (≫ ~10¹⁰ reference keys). Probing is
    per DISTINCT key, so duplicated keys cost one probe. Below the
    ceiling, prefer the broadcast probe: it is zero-shuffle. AQE will
    still broadcast the sparse frame here when it is small, so this form
    degrades gracefully at test scale."""
    _validate_params(n_bits, k)
    key = F.col(col) if isinstance(col, str) else col
    probes = (
        df.select(key.alias("__bloom_key"))
        .where(F.col("__bloom_key").isNotNull())
        .distinct()
        .select("__bloom_key",
                F.explode(bloom_positions(F.col("__bloom_key"), n_bits, k))
                .alias("__p"))
        .select("__bloom_key",
                F.shiftright("__p", 6).alias("word"),
                F.expr("shiftleft(1L, cast(__p % 64 as int))").alias("__m"))
    )
    verdicts = (
        probes.join(words_df.select("word", "bits"), "word", "left")
        .groupBy("__bloom_key")
        .agg(F.bool_and(
            F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("__m")) != 0
        ).alias("__bloom_hit"))
    )
    joined = df.join(verdicts, key == F.col("__bloom_key"), "left")
    return (joined
            .withColumn(out_col, F.coalesce(F.col("__bloom_hit"), F.lit(False)))
            .drop("__bloom_key", "__bloom_hit"))
