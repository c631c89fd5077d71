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
from ..functions.text import let, simple_tokens
from ..util import ensure_parallelism

# Deterministic pseudo-weight family for the ``weights=None`` path:
#   w(bucket) = ((bucket · KNUTH) mod WPRIME) / WPRIME − 0.5   ∈ [−0.5, 0.5)
# bucket < dim ≤ ~1e6 keeps bucket·KNUTH ≤ ~2.7e15, inside long range under
# ANSI mode; every term is ANSI-SQL-reproducible (see sql_classifier_score
# in __spark_entry__.py).
WEIGHT_KNUTH = 2_654_435_761
WEIGHT_PRIME = 1_000_003

# fastText's n-gram feature construction: hash each WORD once, then combine
# word hashes for n-grams as h = h·116049371 + h_next (fastText
# dictionary.cc's ``addWordNgrams`` coefficient) — the character pass over
# the text happens exactly once, n-gram features are integer folds over the
# word-hash array. (The first-cut implementation re-hashed every n-gram
# STRING character-by-character, re-scanning ~2× the corpus bytes through
# an interpreted per-char lambda.) Every step stays mod POLY_MOD ≈ 1e9, so
# products are ≤ ~1.2e17 — inside long range under ANSI mode.
NGRAM_COMBINE = 116_049_371


def hashed_ngram_buckets(col, dim: int, ns: tuple[int, ...] = (1, 2)) -> Column:
    """array<long> of feature buckets for every word n-gram of the orders in
    ``ns`` (1 = unigrams): token poly-hashes computed once, n-gram hashes =
    fastText-style integer combine over the hash array, all mod ``dim``."""
    def buckets_of(th: Column) -> Column:
        per_order = []
        for n in ns:
            if n == 1:
                per_order.append(F.transform(th, lambda h: h % dim))
                continue
            count = F.size(th) - F.lit(n - 1)

            # single-arg factory: a 2-arg callable would be bound as the
            # (element, index) lambda form by F.transform
            def make_gram_bucket(_n):
                def gram_bucket(i):
                    acc = F.get(th, i)
                    for k in range(1, _n):
                        acc = (acc * F.lit(NGRAM_COMBINE)
                               + F.get(th, i + k)) % F.lit(tx.POLY_MOD)
                    return acc % dim
                return gram_bucket

            grams = F.transform(F.sequence(F.lit(0), count - 1),
                                make_gram_bucket(n))
            per_order.append(
                F.when(count >= 1, grams)
                .otherwise(F.array().cast("array<long>")))
        out = per_order[0]
        for nxt in per_order[1:]:
            out = F.concat(out, nxt)
        return out

    token_hashes = F.transform(simple_tokens(col), lambda t: tx.poly_hash(t))
    return let(token_hashes, buckets_of)


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
