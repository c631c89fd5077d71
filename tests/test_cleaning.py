"""Cleaning operators: PII scan/redact, C4 heuristics, contamination.

The regex rules are written in the Java-regex ∩ RE2 dialect; the oracle gate
(`pii_scan`, `c4_filter`, `contamination` in __spark_entry__) proves
DuckDB-parity end-to-end — these tests pin the SEMANTICS on crafted rows.
"""

import pyspark.sql.functions as F
import pytest

from pandas_plus_spark.operators import cleaning


@pytest.fixture(scope="module")
def pii_df(spark):
    rows = [
        (0, "mail bob.smith+x@example.co.uk or a@b.io today"),
        (1, "server 192.168.0.1 and 10.0.0.255 up"),
        (2, "ssn 123-45-6789 file"),
        (3, "call +1 (555) 123-4567 or 555-123-4567 now"),
        (4, "no pii here at all"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "id long, text string")


def _rows(df):
    return {r["id"]: r for r in df.collect()}


class TestPII:
    def test_counts(self, pii_df):
        sel = [F.col("id")] + [
            c.alias(f"n_{k}") for k, c in cleaning.pii_counts("text").items()]
        d = _rows(pii_df.select(*sel))
        assert d[0]["n_email"] == 2
        assert d[1]["n_ipv4"] == 2
        assert d[2]["n_ssn"] == 1
        assert d[3]["n_phone"] == 2
        assert all(d[4][f"n_{c}"] == 0 for c in cleaning.PII_ORDER)
        assert all(d[5][f"n_{c}"] == 0 for c in cleaning.PII_ORDER)

    def test_redact_order_ssn_before_phone(self, pii_df):
        d = _rows(pii_df.select("id", cleaning.redact_pii("text").alias("r")))
        # an SSN must become <SSN>, not get half-eaten by the phone pattern
        assert d[2]["r"] == "ssn <SSN> file"
        assert d[0]["r"] == "mail <EMAIL> or <EMAIL> today"
        assert d[1]["r"] == "server <IP> and <IP> up"
        assert d[3]["r"] == "call <PHONE> or <PHONE> now"
        assert d[4]["r"] == "no pii here at all"

    def test_redact_subset_categories(self, pii_df):
        d = _rows(pii_df.select(
            "id", cleaning.redact_pii("text", categories=("email",)).alias("r")))
        assert d[1]["r"] == "server 192.168.0.1 and 10.0.0.255 up"
        assert d[0]["r"] == "mail <EMAIL> or <EMAIL> today"


class TestC4:
    def test_line_rules(self, spark):
        text = ("this line has exactly six words.\n"
                "short line.\n"                      # < 5 words → dropped
                "five words but no terminal punct\n"  # no punct → dropped
                "   \n"                               # blank → not a line
                "a second proper line with words!")
        df = spark.createDataFrame([(0, text)], "id long, text string")
        stats = cleaning.c4_line_stats("text", min_words=5)
        r = df.select(
            stats["n_lines"].alias("nl"), stats["n_kept_lines"].alias("nk"),
            F.round(stats["kept_line_frac"], 6).alias("fr"),
            stats["n_sentences"].alias("ns")).collect()[0]
        assert r["nl"] == 4 and r["nk"] == 2
        assert r["fr"] == 0.5
        assert r["ns"] == 3  # two periods + one bang

    def test_flags_and_keep(self, spark):
        rows = [
            (0, "good doc. has three sentences. all fine words here!"),
            (1, "Lorem Ipsum dolor. second. third."),      # lorem → drop
            (2, "code doc { x = 1 }. two. three."),        # brace → drop
            (3, "only one sentence."),                     # < 3 sentences
            (4, "bad phrase doc. second. third."),         # blocklist → drop
        ]
        df = spark.createDataFrame(rows, "id long, text string")
        d = _rows(df.select("id", cleaning.c4_keep(
            "text", min_sentences=3, blocklist=["bad phrase"]).alias("k")))
        assert [d[i]["k"] for i in range(5)] == [True, False, False, False, False]

    def test_empty_doc(self, spark):
        df = spark.createDataFrame([(0, "")], "id long, text string")
        stats = cleaning.c4_line_stats("text")
        r = df.select(stats["n_lines"].alias("nl"),
                      stats["kept_line_frac"].alias("fr"),
                      cleaning.c4_keep("text").alias("k")).collect()[0]
        assert r["nl"] == 0 and r["fr"] is None and r["k"] is False


class TestContamination:
    def test_shared_gram_flags(self, spark):
        docs = spark.createDataFrame(
            [(0, "a b c d e f"), (1, "u v w x y z"), (2, "")],
            "doc_id long, text string")
        bench = spark.createDataFrame(
            [("c d e f g h",), ("zz",)], "text string")
        d = _rows(cleaning.ngram_contamination(docs, bench, n=4)
                  .withColumnRenamed("doc_id", "id"))
        # doc 0 grams: abcd bcde cdef — only "c d e f" is in the benchmark
        assert d[0]["n_grams"] == 3 and d[0]["n_contaminated"] == 1
        assert d[0]["contaminated"] is True
        assert d[0]["contamination_frac"] == pytest.approx(1 / 3)
        assert d[1]["n_contaminated"] == 0 and d[1]["contaminated"] is False
        # empty / too-short docs survive with zero grams, not dropped
        assert d[2]["n_grams"] == 0 and d[2]["contaminated"] is False

    def test_duplicate_grams_counted_once(self, spark):
        docs = spark.createDataFrame(
            [(0, "p q p q p q p q")], "doc_id long, text string")
        bench = spark.createDataFrame([("p q p q",)], "text string")
        r = cleaning.ngram_contamination(docs, bench, n=2).collect()[0]
        # distinct 2-grams: {p q, q p} — both present in benchmark
        assert r["n_grams"] == 2 and r["n_contaminated"] == 2

    def test_xxhash_variant_matches_default(self, spark, tables):
        docs = tables["documents"].limit(300)
        bench = docs.filter(F.col("doc_id") % 11 == 0).select("text")
        a = {r["doc_id"]: (r["n_grams"], r["n_contaminated"])
             for r in cleaning.ngram_contamination(docs, bench, n=5).collect()}
        b = {r["doc_id"]: (r["n_grams"], r["n_contaminated"])
             for r in cleaning.ngram_contamination(
                 docs, bench, n=5, hash_fn="xxhash64").collect()}
        assert a == b

    def test_benchmark_is_broadcast(self, spark, tables):
        docs = tables["documents"]
        bench = docs.filter(F.col("doc_id") % 11 == 0).select("text")
        out = cleaning.ngram_contamination(docs, bench, n=8)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        # the corpus side must not sort-merge-shuffle for the join
        assert "SortMergeJoin" not in plan


class TestQuantileCalibrationDf:
    def test_sample_calibration_close_and_single_pass(self, spark):
        # thresholds from a half-corpus sample select approximately the
        # same rows; with calibration_df the aggregate branch reads the
        # SAMPLE frame, not the filtered frame
        import pyspark.sql.functions as F
        from pandas_plus_spark.functions import text as tx
        from pandas_plus_spark.operators import quantile_threshold_filter
        from pandas_plus_spark.operators.sampling import stratified_sample
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        scored = docs.select("doc_id", "source",
                             tx.quality_score("text").alias("q"))
        full = quantile_threshold_filter(scored, "source", "q", 0.5).count()
        sample = stratified_sample(scored, "source", 0.5, "doc_id", seed=9)
        via_sample = quantile_threshold_filter(
            scored, "source", "q", 0.5, calibration_df=sample).count()
        n = scored.count()
        assert abs(full - via_sample) <= 0.15 * n

    def test_uncalibrated_group_is_dropped_by_contract(self, spark):
        # a group absent from calibration_df has no threshold -> all its
        # rows drop (documented conservative contract, not an accident)
        from pandas_plus_spark.operators import quantile_threshold_filter
        scored = spark.createDataFrame(
            [(1, "a", 0.9), (2, "a", 0.1), (3, "b", 0.5)],
            "doc_id long, source string, q double")
        calib = scored.where("source = 'a'")
        kept = quantile_threshold_filter(scored, "source", "q", 0.5,
                                         calibration_df=calib)
        assert sorted(r.doc_id for r in kept.collect()) == [1]
