"""TF-IDF / BM25 semantics on crafted corpora (oracle gate: tfidf_top_terms,
bm25_rank prove DuckDB parity end-to-end at sf0.01)."""

import math

import pyspark.sql.functions as F
import pytest

from pandas_plus_spark.operators import ranking


@pytest.fixture(scope="module")
def corpus_df(spark):
    rows = [
        (0, "cat dog cat"),
        (1, "dog fish"),
        (2, "cat cat cat bird"),
        (3, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestTfIdf:
    def test_postings(self, corpus_df):
        p = {(r["doc_id"], r["term"]): r["tf"]
             for r in ranking.doc_term_freqs(corpus_df).collect()}
        assert p[(0, "cat")] == 2 and p[(0, "dog")] == 1
        assert p[(2, "cat")] == 3 and p[(2, "bird")] == 1
        assert not any(d == 3 for d, _ in p)  # empty doc → no postings

    def test_scores_formula(self, corpus_df):
        s = {(r["doc_id"], r["term"]): r
             for r in ranking.tfidf_scores(corpus_df).collect()}
        n = 4  # N counts ALL docs, including the empty one
        r = s[(0, "cat")]
        assert r["df"] == 2
        assert r["tfidf"] == pytest.approx(2 * (math.log((n + 1) / (2 + 1)) + 1))
        r = s[(2, "bird")]
        assert r["df"] == 1
        assert r["tfidf"] == pytest.approx(1 * (math.log((n + 1) / (1 + 1)) + 1))

    def test_min_df_drops_rare_terms(self, corpus_df):
        terms = {r["term"] for r in
                 ranking.tfidf_scores(corpus_df, min_df=2).collect()}
        assert terms == {"cat", "dog"}

    def test_top_terms_rank_and_tiebreak(self, corpus_df):
        top = [(r["term"], r["rank"]) for r in
               ranking.top_terms(corpus_df, k=2)
               .filter(F.col("doc_id") == 2).orderBy("rank").collect()]
        # cat: tf=3 rare-ish; bird: tf=1 df=1 — cat scores higher
        assert top[0] == ("cat", 1) and top[1] == ("bird", 2)


class TestBM25:
    def test_formula_single_term(self, corpus_df):
        out = {r["doc_id"]: r["bm25"]
               for r in ranking.bm25_scores(corpus_df, ["cat"]).collect()}
        n, df = 4, 2
        avgdl = (3 + 2 + 4 + 0) / 4
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        k1, b = 1.2, 0.75

        def score(tf, dl):
            return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

        assert out[0] == pytest.approx(score(2, 3))
        assert out[2] == pytest.approx(score(3, 4))
        assert out[1] == 0.0 and out[3] == 0.0

    def test_multi_term_adds(self, corpus_df):
        single = {r["doc_id"]: r["bm25"]
                  for r in ranking.bm25_scores(corpus_df, ["cat"]).collect()}
        single2 = {r["doc_id"]: r["bm25"]
                   for r in ranking.bm25_scores(corpus_df, ["dog"]).collect()}
        both = {r["doc_id"]: r["bm25"]
                for r in ranking.bm25_scores(corpus_df, ["cat", "dog"]).collect()}
        for d in (0, 1, 2, 3):
            assert both[d] == pytest.approx(single[d] + single2[d])

    def test_duplicate_query_terms_count_once(self, corpus_df):
        a = {r["doc_id"]: r["bm25"]
             for r in ranking.bm25_scores(corpus_df, ["cat"]).collect()}
        bbb = {r["doc_id"]: r["bm25"]
               for r in ranking.bm25_scores(corpus_df, ["cat", "cat"]).collect()}
        assert a == bbb

    def test_empty_query_raises(self, corpus_df):
        with pytest.raises(ValueError):
            ranking.bm25_scores(corpus_df, [])


class TestPlans:
    def test_df_and_stats_are_broadcast(self, corpus_df):
        out = ranking.tfidf_scores(corpus_df)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
        assert "SortMergeJoin" not in plan


class TestVocab:
    def test_rank_and_coverage(self, corpus_df):
        v = {r["term"]: r for r in
             ranking.build_vocab(corpus_df).collect()}
        # counts: cat 5 (docs 0,2), dog 2, bird 1, fish 1 — total 9
        assert v["cat"]["rank"] == 1 and v["cat"]["count"] == 5
        assert v["dog"]["rank"] == 2
        # tiebreak count=1: bird before fish
        assert v["bird"]["rank"] == 3 and v["fish"]["rank"] == 4
        assert v["cat"]["cum_frac"] == pytest.approx(5 / 9)
        assert v["fish"]["cum_frac"] == pytest.approx(1.0)

    def test_max_size_and_min_count(self, corpus_df):
        top = ranking.build_vocab(corpus_df, max_size=2).collect()
        assert {r["term"] for r in top} == {"cat", "dog"}
        filt = ranking.build_vocab(corpus_df, min_count=2).collect()
        assert {r["term"] for r in filt} == {"cat", "dog"}
        # cum_frac still covers ALL tokens, so the kept head is < 1.0
        assert max(r["cum_frac"] for r in filt) == pytest.approx(7 / 9)

    def test_oov_rate(self, corpus_df):
        vocab = ranking.build_vocab(corpus_df, max_size=1)  # {cat}
        o = {r["doc_id"]: r for r in
             ranking.oov_rate(corpus_df, vocab).collect()}
        assert o[0]["n_tokens"] == 3 and o[0]["n_oov"] == 1
        assert o[0]["oov_frac"] == pytest.approx(1 / 3)
        assert o[1]["n_oov"] == 2 and o[1]["oov_frac"] == 1.0
        assert o[3]["n_tokens"] == 0 and o[3]["oov_frac"] == 0.0


class TestUnigramLM:
    def test_values_match_manual(self, corpus_df):
        out = {r["doc_id"]: r
               for r in ranking.unigram_lm_score(corpus_df).collect()}
        # corpus counts: cat 5 (2 in doc0 + 3 in doc2), dog 2, fish 1,
        # bird 1 -> total 9
        total = 9.0
        counts = {"cat": 5, "dog": 2, "fish": 1, "bird": 1}
        for doc_id, toks in [(0, ["cat", "dog", "cat"]),
                             (1, ["dog", "fish"]),
                             (2, ["cat", "cat", "cat", "bird"])]:
            h = math.log(total) - sum(math.log(counts[t]) for t in toks) / len(toks)
            assert abs(out[doc_id]["xent"] - h) < 1e-12
            assert abs(out[doc_id]["ppl"] - math.exp(h)) < 1e-9
            assert out[doc_id]["n_tokens"] == len(toks)

    def test_empty_doc_nulls(self, corpus_df):
        out = {r["doc_id"]: r
               for r in ranking.unigram_lm_score(corpus_df).collect()}
        assert out[3]["n_tokens"] == 0
        assert out[3]["xent"] is None and out[3]["ppl"] is None

    def test_rare_token_doc_scores_higher(self, spark):
        rows = [(i, "the quick brown fox jumps the lazy dog the end") for i in range(5)]
        rows.append((99, "zxqv wvut qqqz"))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r["ppl"]
               for r in ranking.unigram_lm_score(df).collect()}
        assert out[99] > out[0]
