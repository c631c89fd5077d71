"""Streaming near-duplicate filtering against a standing reference corpus.

The production shape of continuous ingestion: every micro-batch of newly
crawled documents is deduplicated against the corpus accumulated so far
(exact sha-256 match + MinHash-LSH near match), and only ACCEPTED rows
reach the sink. ``deduped_stream`` (sessions.py) covers exact identity
inside a watermark horizon; this module covers content-level near-dup
against a reference that does not fit in stream state.

Mechanism: the per-batch pipeline is ``operators/dedup.incremental_dedup``
— sha join + band join are stream-vs-static by construction (the reference
side is a static frame / stored index), but the LSH stage also needs a
per-batch ``distinct`` over candidate pairs and an anti-join of the batch
against its own match result, which Structured Streaming cannot express
inside one continuous plan. ``foreachBatch`` is Spark's sanctioned seam
for exactly this (reuse batch operators + multi-step logic per
micro-batch, with the batch id for exactly-once sinks), so the stream
plan stays a plain file/kafka source and ALL dedup logic runs as batch
plans per trigger.

Scale shape per micro-batch: identical to ``incremental_dedup`` with a
stored index — cost proportional to the BATCH (its hashes, signatures,
candidate verifies), never the reference corpus, which is pre-hashed /
pre-banded once (``build_ref_index``) and only ever joined against. In the
production loop the accepted batch's own hashes + band entries are
appended to the stored index between triggers (see
``incremental_dedup_indexed`` in BASELINE.md for the steady-state cost
table); this module keeps the reference FIXED per query lifetime — restart
the query on index refresh.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from ..operators import dedup as _dedup
from ..util import attach_cached, release_cached


def accepted_against_reference(
    batch_df: DataFrame,
    ref_df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_size: int = 3,
    hash_fn: str = "xxhash64",
    ref_index: "_dedup.RefIndex | None" = None,
) -> DataFrame:
    """Batch kernel: the rows of ``batch_df`` that match NOTHING in the
    reference (neither exact sha-256 nor LSH-verified near-dup at
    ``threshold``). All ``batch_df`` columns pass through unchanged."""
    matches = _dedup.incremental_dedup(
        batch_df, ref_df, text_col, id_col, threshold=threshold,
        num_hashes=num_hashes, bands=bands, shingle_size=shingle_size,
        hash_fn=hash_fn, ref_index=ref_index)
    out = batch_df.join(matches.select(id_col), id_col, "left_anti")
    # hand the verify-stage persists to the caller's release point: the
    # anti-join's one materialization is the only consumer per batch
    return attach_cached(out, *getattr(matches, "_pps_cached", ()))


def neardup_filtered_stream(
    stream_df: DataFrame,
    ref_df: DataFrame,
    text_col: str,
    id_col: str,
    sink: Callable[[DataFrame, int], None],
    threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_size: int = 3,
    hash_fn: str = "xxhash64",
    ref_index: "_dedup.RefIndex | None" = None,
):
    """``DataStreamWriter`` filtering a document stream against a standing
    reference corpus; accepted rows are handed to ``sink(accepted_df,
    batch_id)`` per micro-batch (write parquet/Delta, push downstream, …).
    Caller configures trigger/checkpoint and ``.start()``s.

    Pass ``ref_index`` (``build_ref_index`` output, typically read back
    from parquet) so the reference corpus is never re-hashed per batch;
    ``ref_df`` is then only consulted for the text of candidate-matched
    reference docs in the Jaccard verify."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        accepted = accepted_against_reference(
            batch_df, ref_df, text_col, id_col, threshold=threshold,
            num_hashes=num_hashes, bands=bands, shingle_size=shingle_size,
            hash_fn=hash_fn, ref_index=ref_index)
        try:
            sink(accepted, batch_id)
        finally:
            release_cached(accepted)

    return stream_df.writeStream.foreachBatch(_process)


def decontaminated_stream(
    stream_df: DataFrame,
    ref_df: DataFrame | None,
    text_col: str,
    id_col: str,
    sink: Callable[[DataFrame, int], None],
    *,
    k: int = 6,
    hash_fn: str = "xxhash64",
    ref_text_col: str | None = None,
    ref_grams: DataFrame | None = None,
):
    """``DataStreamWriter`` excising benchmark-contaminated spans from a
    document stream (r14 — the streaming twin of
    ``operators/dedup.decontaminate``): each micro-batch's regions whose
    every ``k``-gram occurs in the benchmark are cut, and ``sink``
    receives ``(id_col, clean_text, n_removed)`` rows per batch. Same
    ``foreachBatch`` rationale as :func:`neardup_filtered_stream` — the
    span merge + excision is multi-step batch logic against a STATIC
    reference.

    The benchmark gram set is built ONCE per query lifetime
    (``build_ref_grams``) and persisted, so a micro-batch pays one map
    pass over its own documents plus a semi-join against the standing
    (test-set-sized, AQE-broadcastable) gram frame — cost proportional
    to the BATCH, never the eval suites. Pass ``ref_grams`` (e.g. read
    back from parquet) to share one build across queries; restart the
    query when the eval suites change."""
    if ref_grams is None and ref_df is None:
        raise ValueError("pass ref_df or ref_grams")
    if ref_grams is not None:
        # fail at query SETUP on a stamped-contract mismatch, not at
        # the first micro-batch
        _dedup._check_gram_stamp(ref_grams, k, hash_fn)
    grams = (ref_grams if ref_grams is not None
             else _dedup.build_ref_grams(ref_df, ref_text_col or text_col,
                                         k=k, hash_fn=hash_fn)).persist()

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        out = _dedup.decontaminate(batch_df, None, text_col, id_col,
                                   k=k, hash_fn=hash_fn, ref_grams=grams)
        try:
            sink(out, batch_id)
        finally:
            release_cached(out)

    return stream_df.writeStream.foreachBatch(_process)
