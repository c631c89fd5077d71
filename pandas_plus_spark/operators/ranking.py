"""Term-weighting / relevance scoring over document tables: TF-IDF and BM25.

Beyond the reference (no string/corpus tooling, SURVEY §2.11); standard
public formulations (Salton & Buckley TF-IDF; Robertson et al. BM25 — the
Okapi formula as published). These are the ranking half of a training-data
pipeline: near-dup thresholds, quality mixes, and retrieval-based filtering
all consume term weights.

100 TB shape:
- ``doc_term_freqs`` explodes tokens map-side; the ONE corpus-sized shuffle
  keys on (doc, term) with map-side partial counts.
- document frequencies and corpus size aggregate down to vocabulary-sized /
  scalar frames, joined back by BROADCAST — the corpus never re-shuffles.
- BM25 filters the exploded terms to the query set BEFORE any shuffle, so a
  k-term query aggregates only matching postings, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as tx
from ..util import attach_cached, ensure_parallelism


def doc_term_freqs(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(id, term, tf) postings: whitespace terms, one row per distinct term
    per document with its in-document count."""
    return (
        ensure_parallelism(docs)
        .select(F.col(id_col), F.explode(tx.simple_tokens(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """Per-(doc, term) TF-IDF: ``tf * (ln((N + 1) / (df + 1)) + 1)``
    (the smoothed idf — never zero, defined for unseen terms).

    Terms with document frequency < ``min_df`` are dropped. Returns
    ``(id_col, term, tf, df, tfidf)``.

    The postings frame feeds two plan branches (document frequencies and
    the score join); Catalyst does not reliably reuse the exchange across
    them (verified: 9 exchanges, no ReusedExchange), so postings are
    persisted — one explode+shuffle instead of two. Release with
    ``util.release_cached`` after materializing.
    """
    postings = doc_term_freqs(docs, id_col, text_col).persist()
    n_docs = docs.select(
        F.count(F.lit(1)).cast("double").alias("__n"))
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if min_df > 1:
        dfreq = dfreq.filter(F.col("df") >= min_df)
    out = (
        postings.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf") * (F.log((F.col("__n") + 1.0) / (F.col("df") + 1.0)) + 1.0))
        .drop("__n")
    )
    return attach_cached(out.select(id_col, "term", "tf", "df", "tfidf"),
                         postings)


def top_terms(docs: DataFrame, k: int, id_col: str = "doc_id",
              text_col: str = "text", min_df: int = 1) -> DataFrame:
    """Top-``k`` TF-IDF terms per document (score desc, term asc tiebreak —
    total order, deterministic across engines). The ranking window partitions
    by document — postings per doc are bounded by doc length, so no
    single-task funnel at any corpus size."""
    from pyspark.sql.window import Window
    scored = tfidf_scores(docs, id_col, text_col, min_df=min_df)
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    out = (scored.withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= k))
    return attach_cached(out, *getattr(scored, "_pps_cached", ()))


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 of each document against a bag of query terms.

    ``score(D) = Σ_t idf(t) · tf(t,D)·(k1+1) / (tf(t,D) + k1·(1−b+b·|D|/avgdl))``
    with ``idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))``.

    Returns ``(id_col, n_terms, bm25)`` for every document (score 0.0 when
    no query term occurs). df/avgdl/N are corpus statistics computed here;
    persist the postings externally to amortize across many queries.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    qset = sorted(set(query_terms))

    lengths = ensure_parallelism(docs).select(
        F.col(id_col), tx.token_count(text_col).alias("n_terms"),
        tx.simple_tokens(text_col).alias("__toks"))
    stats = lengths.select(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.avg("n_terms").alias("__avgdl"))

    # postings restricted to the query terms BEFORE the shuffle
    q_postings = (
        lengths.select(F.col(id_col), F.col("n_terms"),
                       F.explode("__toks").alias("term"))
        .filter(F.col("term").isin(qset))
        .groupBy(id_col, "n_terms", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = q_postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    scored = (
        q_postings.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__idf",
            F.log(1.0 + (F.col("__n") - F.col("df") + 0.5) / (F.col("df") + 0.5)))
        .withColumn(
            "__s",
            F.col("__idf") * F.col("tf") * (k1 + 1.0)
            / (F.col("tf")
               + k1 * (1.0 - b + b * F.col("n_terms") / F.col("__avgdl"))))
    )
    per_doc = scored.groupBy(id_col, "n_terms").agg(F.sum("__s").alias("bm25"))
    # docs with no query-term occurrence: left-join back, score 0
    return (
        lengths.select(id_col, "n_terms")
        .join(per_doc, [id_col, "n_terms"], "left")
        .withColumn("bm25", F.coalesce(F.col("bm25"), F.lit(0.0)))
    )
