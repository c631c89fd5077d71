"""Empty-input edge sweep (reference test strategy: SURVEY §5.9 — empty
inputs, test_core.py:718-739). Every operator must return an empty,
correctly-schemed frame — never crash — when the corpus/frame is empty."""

import pyspark.sql.functions as F
import pytest

from pandas_plus_spark import GroupBy, nanops
from pandas_plus_spark.operators import (
    chunk_dedup_stats, chunk_documents, dedup, exact_dedup,
    incremental_dedup, minhash_dedup, quantize_embeddings, ranking,
    sample_frames, similarity, source_health, weighted_sample_per_group,
)


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string, source string")


@pytest.fixture(scope="module")
def empty_nums(spark):
    return spark.createDataFrame([], "k long, t long, v double")


class TestEmptyGroupBy:
    def test_aggs(self, empty_nums):
        out = GroupBy(empty_nums, "k").agg({
            "s": ("sum", "v"), "d": ("dsum", "v"),
            "sc": ("dsum_scaled", "v"), "m": ("mean", "v"),
            "n": ("size", "")})
        assert out.count() == 0
        assert set(out.columns) == {"k", "s", "d", "sc", "m", "n"}

    def test_ordered_ops(self, empty_nums):
        g = GroupBy(empty_nums, "k", order_by="t")
        assert g.cumsum("v").count() == 0
        assert g.rolling_sum("v", window=3).count() == 0
        assert g.rolling_time("v", on="t", window=10).count() == 0
        assert g.head(2, "v").count() == 0

    def test_nanops(self, empty_nums):
        out = nanops.reduce_frame(empty_nums, {"v": ["sum", "mean", "count"]})
        row = out.collect()
        assert len(row) == 1  # global reduction always yields one row


class TestEmptyCorpusOps:
    def test_dedup_family(self, empty_docs):
        assert exact_dedup(empty_docs, "text", "doc_id").count() == 0
        assert minhash_dedup(empty_docs, "text", "doc_id",
                             num_hashes=8, bands=4).count() == 0
        assert chunk_dedup_stats(empty_docs, "text", "doc_id").count() == 0
        assert incremental_dedup(empty_docs, empty_docs, "text", "doc_id",
                                 num_hashes=8, bands=4).count() == 0

    def test_chunking_sampling_health(self, empty_docs):
        assert chunk_documents(empty_docs, "text", "doc_id",
                               chunk_size=10).count() == 0
        assert weighted_sample_per_group(
            empty_docs.withColumn("w", F.lit(1.0)),
            "source", "w", 3, "doc_id").count() == 0
        assert source_health(empty_docs).count() == 0

    def test_ranking_family(self, empty_docs):
        assert ranking.tfidf_scores(empty_docs).count() == 0
        assert ranking.unigram_lm_score(empty_docs).count() == 0
        assert ranking.build_vocab(empty_docs).count() == 0

    def test_embeddings_and_frames(self, spark, empty_docs):
        emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
        assert quantize_embeddings(emb).count() == 0
        blobs = empty_docs.select("doc_id", F.encode("text", "UTF-8").alias("b"))
        assert sample_frames(blobs, "b", "doc_id").count() == 0
        q = spark.createDataFrame([(0, [1.0, 0.0])],
                                  "vec_id long, embedding array<double>")
        emb_d = spark.createDataFrame([], "vec_id long, embedding array<double>")
        assert similarity.brute_force_knn(emb_d, q, k=3).count() == 0

    def test_dup_clusters_empty_pairs(self, spark):
        pairs = spark.createDataFrame([], "id_a long, id_b long")
        assert dedup.dup_clusters(pairs).count() == 0

    def test_round5_second_wave(self, spark, empty_docs):
        from pandas_plus_spark.operators import classify, packing, sampling
        from pandas_plus_spark.operators.ranking import bigram_lm_score
        from pandas_plus_spark.streaming import accepted_against_reference

        assert classify.classifier_score(
            empty_docs, "text", "doc_id", dim=16).count() == 0
        assert bigram_lm_score(empty_docs).count() == 0
        assert sampling.cap_per_key(empty_docs, "source", 3, "doc_id").count() == 0
        assert sampling.global_sample_n(empty_docs, 10, "doc_id").count() == 0
        lens = empty_docs.select("doc_id", F.length("text").alias("n"))
        assert packing.pack_first_fit(lens, "doc_id", "n", budget=64).count() == 0
        # empty batch against a non-empty reference: nothing accepted,
        # nothing crashes
        ref = spark.createDataFrame([(100, "some reference text here")],
                                    "doc_id long, text string")
        out = accepted_against_reference(empty_docs.select("doc_id", "text"),
                                         ref, "text", "doc_id",
                                         num_hashes=8, bands=4)
        assert out.count() == 0

    def test_pca_rejects_empty(self, spark):
        from pandas_plus_spark.operators.similarity import pca_fit
        emb = spark.createDataFrame([(0, [1.0, 2.0])],
                                    "vec_id long, embedding array<double>")
        with pytest.raises(ValueError, match="at least 2"):
            pca_fit(emb.limit(1).filter("vec_id < 0"), "embedding", k=2)


class TestEmptySelectionOps:
    """Round-7-close selection operators on empty / degenerate inputs."""

    def test_token_budget_empty_and_single(self, spark):
        from pandas_plus_spark.operators import token_budget_sample
        empty = spark.createDataFrame([], "doc_id long, source string, n_tok long")
        assert token_budget_sample(empty, "source", "n_tok", 100,
                                   "doc_id").count() == 0
        one = spark.createDataFrame([(1, "a", 5)],
                                    "doc_id long, source string, n_tok long")
        assert token_budget_sample(one, "source", "n_tok", 100,
                                   "doc_id").count() == 1

    def test_quantile_filter_empty(self, spark):
        from pandas_plus_spark.operators import quantile_threshold_filter
        es = spark.createDataFrame([], "doc_id long, source string, q double")
        assert quantile_threshold_filter(es, "source", "q", 0.5).count() == 0

    def test_leakage_split_empty_pair_graph(self, spark):
        # no near-dup pairs at all: every doc is an isolate and must get
        # exactly its own-id split; output stays exhaustive
        from pandas_plus_spark.operators import leakage_safe_split
        docs = spark.createDataFrame([(1, "a"), (2, "b")],
                                     "doc_id long, text string")
        ep = spark.createDataFrame([], "id_a long, id_b long")
        out = leakage_safe_split(docs, ep, "doc_id",
                                 {"train": 1.0, "test": 1.0}, seed=1)
        assert out.count() == 2
        assert out.where(out.split.isNull()).count() == 0

    def test_grouped_cumsum_empty(self, spark):
        from pandas_plus_spark.functions.ordered import grouped_cumsum
        e = spark.createDataFrame([], "rid long, g string, v double")
        assert grouped_cumsum(e, ["g"], ["rid"], "v").count() == 0


class TestEmptyParitySweep:
    """Round-7 continuation pandas-parity operators on empty inputs."""

    def test_groupby_extras(self, empty_nums):
        g = GroupBy(empty_nums, "k", order_by="t")
        assert g.skew("v").count() == 0
        assert g.kurt("v").count() == 0
        assert g.ngroup().count() == 0
        assert g.ffill("v").count() == 0
        assert g.bfill("v", limit=2).count() == 0
        assert g.ohlc("v").count() == 0
        assert g.describe("v").count() == 0
        assert g.nlargest(3, "v").count() == 0
        assert g.rank("v").count() == 0
        assert g.take([0, -1]).count() == 0
        assert g.corrwith("t", ["v"]).count() == 0
        assert g.expanding().mean("v").count() == 0
        assert g.ewm_mean("v", alpha=0.5).count() == 0

    def test_resample_qcut_duplicated(self, spark, empty_nums):
        ts = spark.createDataFrame([], "k long, ts timestamp, v double")
        assert GroupBy(ts, "k").resample("ts", "1h").sum("v").count() == 0
        from pandas_plus_spark.functions import qcut
        # empty frame: no boundaries survive; all (zero) rows pass through
        assert qcut(empty_nums, "v", q=4).count() == 0
        from pandas_plus_spark.operators import duplicated_flags
        assert duplicated_flags(empty_nums, "k", "t").count() == 0

    def test_round7_close_ops(self, spark, empty_nums):
        from pandas_plus_spark.functions.ordered import (grouped_ffill,
                                                         grouped_row_number,
                                                         grouped_take)
        e = spark.createDataFrame([], "rid long, g string, v double")
        assert grouped_ffill(e, ["g"], ["rid"], "v").count() == 0
        assert grouped_row_number(e, ["g"], ["rid"], size="sz").count() == 0
        assert grouped_take(e, ["g"], ["rid"], [0, -1]).count() == 0
        g = GroupBy(empty_nums, "k", order_by="t")
        assert g.ewm_var("v", alpha=0.5).count() == 0
        assert g.ewm_std("v", alpha=0.5, bias=True).count() == 0
        # alpha=1 special path
        assert g.ewm_mean("v", alpha=1.0).count() == 0


class TestRound9Ops:
    def test_boilerplate_null_and_empty_df(self, spark):
        from pandas_plus_spark.operators.cleaning import remove_boilerplate
        df = spark.createDataFrame([(None,), ("",)], "h string")
        bp = remove_boilerplate(F.col("h"))
        rows = {i: r for i, r in enumerate(
            df.select(bp["text"].alias("t"), bp["n_blocks"].alias("nb"),
                      bp["n_kept"].alias("nk")).collect())}
        # NULL html -> NULL outputs (ANSI size(NULL) = NULL), empty -> 0
        assert rows[0].t is None and rows[0].nb is None
        assert rows[1].t == "" and rows[1].nb == 0 and rows[1].nk == 0
        empty = spark.createDataFrame([], "h string")
        assert empty.select(bp["text"]).count() == 0

    def test_snapshot_diff_empty_sides(self, spark):
        from pandas_plus_spark.operators.corpus import snapshot_diff
        full = spark.createDataFrame([(1, "a")], "id long, t string")
        empty = spark.createDataFrame([], "id long, t string")
        assert dict(snapshot_diff(empty, full, "id", ["t"]).collect()) == \
            {1: "added"}
        assert dict(snapshot_diff(full, empty, "id", ["t"]).collect()) == \
            {1: "removed"}
        assert snapshot_diff(empty, empty, "id", ["t"]).count() == 0

    def test_registrable_domain_empty_df(self, spark):
        from pandas_plus_spark.functions import urls
        empty = spark.createDataFrame([], "h string")
        assert urls.with_registrable_domain(empty, "h", out="d").count() == 0

    def test_rolling_stats_empty(self, spark):
        from pandas_plus_spark.functions.ordered import grouped_rolling_stats
        empty = spark.createDataFrame([], "rid long, g string, v double")
        out = grouped_rolling_stats(empty, ["g"], ["rid"], "v", 5,
                                    stats=(("sum", "s"), ("var", "vv")))
        assert out.count() == 0

    def test_rolling_time_unique_on_empty(self, spark):
        from pandas_plus_spark.functions.ordered import grouped_rolling_time
        empty = spark.createDataFrame([], "g string, t long, v double")
        out = grouped_rolling_time(empty, ["g"], "t", "v", 10,
                                   funcs=("sum", "count"), unique_on=True)
        assert out.count() == 0
