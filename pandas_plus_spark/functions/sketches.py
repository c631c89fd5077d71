"""Mergeable cardinality sketches (Apache DataSketches HLL via Spark
built-ins).

``GroupBy.nunique(approx=True)`` answers one approximate count-distinct
query in one pass. This module covers the other half of the 100 TB
pattern: **sketch once, merge forever**. Each ingestion increment (day,
source, partition) aggregates its keys into a per-group HLL sketch — a
few-KB binary that round-trips through parquet like any column — and any
later rollup (all days, one source, the whole corpus) is a register-max
union of stored sketches: no rescan of the raw data, ever. HLL unions
operate on SKETCH STATE (register max), so accuracy does not degrade
with the number of increments merged — the merged estimate tracks the
single-pass estimate within register resolution (bit-equal while the
sketches stay in the sparse/coupon regime; within ~1-2% past it, where
Spark's HLL_4 storage and HLL_8 union gadget make mode transitions
order-dependent). The ``hll_merge_gate`` driver query pins merge
stability (merged within 3% of single-pass) and 5%-of-exact accuracy
for both paths; ``tests/test_sketches.py`` pins sparse-regime
bit-equality and the same tolerances.

All JVM expression work (``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``); one map-side-combining exchange per
aggregation, sketch-sized rows on the wire.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Spark's default lgConfigK; one 2^12-register sketch ≈ 2.5 KB dense,
# relative error ≈ 1.04/sqrt(2^12) ≈ 1.6%.
DEFAULT_LG_K = 12


def nunique_sketches(df: DataFrame, keys, col,
                     lg_k: int = DEFAULT_LG_K,
                     sketch_col: str = "sketch") -> DataFrame:
    """One HLL sketch per group over ``col``: ``keys... , sketch binary``.

    The increment-side write: run per ingestion slice, store next to the
    slice (parquet binary column). ``lg_k`` must match across everything
    that will later be merged."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(col, F.lit(lg_k)).alias(sketch_col))


def merge_sketches(df: DataFrame, keys,
                   sketch_col: str = "sketch",
                   estimate_col: str = "n_unique") -> DataFrame:
    """Union stored sketches by group and estimate:
    ``keys..., n_unique long``. The rollup side: input is one row per
    (group, slice), output one row per group — never touches raw data.

    Pass ``keys=[]`` for a global rollup (one output row)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    agg = F.hll_sketch_estimate(
        F.hll_union_agg(sketch_col)).alias(estimate_col)
    if keys:
        return df.groupBy(*keys).agg(agg)
    return df.agg(agg)


def sketch_estimate(sketch: Column | str) -> Column:
    """Point estimate of one stored sketch (no aggregation)."""
    return F.hll_sketch_estimate(sketch)
