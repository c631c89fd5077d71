"""Hashed-feature linear text classification (fastText-style inference).

Scores a document with a linear model over hashed word-n-gram features:

    score(D) = sigmoid(bias + (1/|G(D)|) · Σ_{g ∈ G(D)} w[h(g) mod dim])

— the inference shape of fastText (Joulin et al. 2016, "Bag of Tricks for
Efficient Text Classification") and of the CCNet / GPT-3-style "does this
look like the reference corpus?" quality filters built on it. Training
happens offline; the weight vector arrives either as a driver-side array
(the production path — it ships to executors as one array literal,
~8 bytes/bucket) or as a deterministic affine pseudo-weight family
(``weights=None``, the test/oracle path, which an independent SQL engine
reproduces term-for-term — the oracle gate prices the full pipeline).

No reference-engine counterpart (pandas-plus has no text operators); this
is part of the prompt-mandated training-data-pipeline surface, same
family as functions/text.py quality_score (hand-tuned heuristic) but with
a learned-model seam.

Scale shape: ZERO shuffles — tokenize → n-gram → hash → fold → sigmoid is
one map-side projection, so cost is proportional to bytes scanned and the
plan is a single stage over the parquet scan (no exchange, no UDF, no
Python). A 1000-executor cluster divides the scan; there is nothing else
to divide.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as tx
from ..functions.text import POLY_MOD, POLY_MUL, let, simple_tokens, word_ngrams
from ..util import ensure_parallelism

# Deterministic pseudo-weight family for the ``weights=None`` path:
#   w(bucket) = ((bucket · KNUTH) mod WPRIME) / WPRIME − 0.5   ∈ [−0.5, 0.5)
# bucket < dim ≤ ~1e6 keeps bucket·KNUTH ≤ ~2.7e15, inside long range under
# ANSI mode; every term is ANSI-SQL-reproducible (see sql_classifier_score
# in __spark_entry__.py).
WEIGHT_KNUTH = 2_654_435_761
WEIGHT_PRIME = 1_000_003


def hashed_ngram_buckets(col, dim: int, ns: tuple[int, ...] = (1, 2)) -> Column:
    """array<long> of feature buckets: poly_hash(gram) mod ``dim`` for every
    word n-gram of the orders in ``ns`` (1 = unigrams = the tokens
    themselves). One linear pass per order over a let-bound token array."""
    def buckets_of(tk: Column) -> Column:
        per_order = []
        for n in ns:
            grams = tk if n == 1 else word_ngrams(tk, n)
            per_order.append(
                F.transform(grams, lambda g: tx.poly_hash(g) % dim))
        out = per_order[0]
        for nxt in per_order[1:]:
            out = F.concat(out, nxt)
        return out

    return let(simple_tokens(col), buckets_of)


def _affine_weight(bucket: Column) -> Column:
    w = (bucket * F.lit(WEIGHT_KNUTH)) % F.lit(WEIGHT_PRIME)
    return w.cast("double") / F.lit(float(WEIGHT_PRIME)) - F.lit(0.5)


def classifier_score(
    df: DataFrame,
    text_col: str,
    id_col: str,
    dim: int = 2048,
    weights: list[float] | None = None,
    bias: float = 0.0,
    ns: tuple[int, ...] = (1, 2),
    threshold: float = 0.5,
) -> DataFrame:
    """(id_col, n_feats, score, keep) — linear-model quality score per doc.

    ``weights``: trained weight vector of length ``dim`` (indexed by
    feature bucket). ``None`` uses the deterministic affine family above —
    reproducible by the SQL oracle, and exercising the exact same plan
    shape as a real model. ``keep = score >= threshold``; documents with no
    features (empty/NULL text) score NULL and keep NULL — the caller
    decides their disposition, as with quality_score.

    The fold accumulates Σw in one interpreted pass over the bucket array;
    everything else is codegen. With a real ``weights`` array the lookup is
    ``element_at`` on an array literal — a constant shipped once per task,
    not a join (dims beyond ~1M buckets should move the weights to a
    broadcast join on bucket id instead; at fastText's default 2M buckets
    × 8 B that literal is still only 16 MB, but the expression-tree
    constant is the simpler plan while it fits)."""
    if weights is not None and len(weights) != dim:
        raise ValueError(f"weights must have length dim={dim}, got {len(weights)}")

    if weights is None:
        def w_of(bucket: Column) -> Column:
            return _affine_weight(bucket)
    else:
        warr = F.lit([float(w) for w in weights])

        def w_of(bucket: Column) -> Column:
            return F.element_at(warr, (bucket + 1).cast("int"))

    def score_of(bk: Column) -> Column:
        n = F.size(bk)
        total = F.aggregate(
            bk, F.lit(0.0),
            lambda acc, b: acc + w_of(b))
        margin = F.lit(float(bias)) + total / n
        return F.when(n > 0, F.lit(1.0) / (F.lit(1.0) + F.exp(-margin)))

    out = ensure_parallelism(df).select(
        F.col(id_col),
        hashed_ngram_buckets(text_col, dim, ns).alias("__bk"),
    ).select(
        id_col,
        F.size("__bk").alias("n_feats"),
        let(F.col("__bk"), score_of).alias("score"),
    )
    return out.select(
        id_col, "n_feats", "score",
        (F.col("score") >= threshold).alias("keep"),
    )
