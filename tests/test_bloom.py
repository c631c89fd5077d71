"""Distributed Bloom filter (functions/bloom.py) + the bloom-prefiltered
exact cross-corpus dedup (operators/dedup.py exact_match_bloom).

Invariants: zero false negatives by construction (every inserted key
probes True); false-positive rate bounded near the theoretical
(1 - e^{-kn/m})^k; exact_match_bloom's output is IDENTICAL to the plain
exact join (the pre-filter only removes definitive non-members)."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from pandas_plus_spark.functions.bloom import (
    bloom_broadcast, bloom_build, bloom_might_contain,
    bloom_might_contain_sharded, bloom_positions, bloom_to_numpy,
)
from pandas_plus_spark.operators.dedup import exact_match_bloom

N_BITS, K = 1 << 14, 7


@pytest.fixture(scope="module")
def keys_df(spark):
    return spark.range(500).select(
        F.concat(F.lit("key-"), F.col("id")).alias("key"))


@pytest.fixture(scope="module")
def dense(spark, keys_df):
    return bloom_to_numpy(bloom_build(keys_df, "key", N_BITS, K), N_BITS)


class TestBloomFilter:
    def test_build_shape(self, spark, keys_df):
        words = bloom_build(keys_df, "key", N_BITS, K).toPandas()
        assert len(words) <= N_BITS // 64
        assert words["word"].between(0, N_BITS // 64 - 1).all()
        # 500 keys x 7 probes set ~3400 distinct bits of 16384
        total_bits = sum(bin(b & 0xFFFFFFFFFFFFFFFF).count("1")
                         for b in words["bits"])
        assert 2000 < total_bits <= 500 * K

    def test_no_false_negatives(self, spark, keys_df, dense):
        out = bloom_might_contain(keys_df, "key", dense, N_BITS, K)
        assert out.filter(~F.col("might_contain")).count() == 0

    def test_fp_rate_bounded(self, spark, dense):
        probes = spark.range(10_000).select(
            F.concat(F.lit("other-"), F.col("id")).alias("key"))
        fp = (bloom_might_contain(probes, "key", dense, N_BITS, K)
              .filter("might_contain").count())
        # theoretical fp ~ (1 - exp(-7*500/16384))^7 ~ 0.0027%; allow slack
        assert fp < 100

    def test_null_keys_probe_false(self, spark, dense):
        df = spark.createDataFrame(
            [("key-1",), (None,), ("key-2",), (None,)], "key string")
        got = [r["might_contain"] for r in
               bloom_might_contain(df, "key", dense, N_BITS, K)
               .orderBy(F.col("key").asc_nulls_last()).collect()]
        assert got == [True, True, False, False]

    def test_positions_deterministic(self, spark, keys_df):
        a = keys_df.select(bloom_positions("key", N_BITS, K).alias("p")).collect()
        b = keys_df.select(bloom_positions("key", N_BITS, K).alias("p")).collect()
        assert a == b
        assert all(len(r["p"]) == K and all(0 <= x < N_BITS for x in r["p"])
                   for r in a)

    def test_incremental_union_or(self, spark, keys_df):
        """Bloom bitmaps OR losslessly: build over two halves, bit_or the
        sparse frames together == build over the union."""
        h1 = keys_df.limit(250)
        h2 = keys_df.subtract(h1)
        merged = (bloom_build(h1, "key", N_BITS, K)
                  .unionByName(bloom_build(h2, "key", N_BITS, K))
                  .groupBy("word").agg(F.bit_or("bits").alias("bits")))
        np.testing.assert_array_equal(
            bloom_to_numpy(merged, N_BITS), bloom_to_numpy(
                bloom_build(keys_df, "key", N_BITS, K), N_BITS))

    def test_n_bits_validation(self, spark, keys_df):
        with pytest.raises(ValueError):
            bloom_to_numpy(bloom_build(keys_df, "key", N_BITS, K), N_BITS + 7)

    def test_param_validation_fails_fast(self, spark, keys_df, dense):
        # k=0 would make every probe vacuously True — silent filter bypass
        with pytest.raises(ValueError, match="k must be >= 1"):
            bloom_positions("key", N_BITS, 0)
        with pytest.raises(ValueError, match="multiple of 64"):
            bloom_positions("key", 100, K)
        with pytest.raises(ValueError, match="multiple of 64"):
            bloom_build(keys_df, "key", 0, K)
        # bitmap/n_bits mismatch must fail on the driver, not at executor
        # runtime with an opaque IndexError / truncated probe range
        with pytest.raises(ValueError, match="bitmap"):
            bloom_might_contain(keys_df, "key", dense, N_BITS * 2, K)
        with pytest.raises(ValueError, match="bitmap"):
            bloom_might_contain(keys_df, "key", dense[:-2], N_BITS - 64, K)

    def test_prebuilt_broadcast_reused(self, spark, keys_df, dense):
        """Caller-managed broadcast lifecycle: pass a Broadcast, results
        identical, and the same broadcast id serves every probe call."""
        bc = bloom_broadcast(spark, dense)
        try:
            a = bloom_might_contain(keys_df, "key", bc, N_BITS, K)
            b = bloom_might_contain(keys_df, "key", bc, N_BITS, K)
            assert a.filter(~F.col("might_contain")).count() == 0
            assert b.filter(~F.col("might_contain")).count() == 0
        finally:
            bc.unpersist()

    def test_empty_reference(self, spark, keys_df):
        empty = keys_df.filter(F.lit(False))
        dense0 = bloom_to_numpy(bloom_build(empty, "key", N_BITS, K), N_BITS)
        assert not dense0.any()
        out = bloom_might_contain(keys_df, "key", dense0, N_BITS, K)
        assert out.filter("might_contain").count() == 0


class TestShardedProbe:
    """bloom_might_contain_sharded: same verdicts as the dense probe, but
    the bitmap never leaves the cluster (the past-broadcast-ceiling path)."""

    @pytest.fixture(scope="class")
    def words(self, spark, keys_df):
        # unpersist on teardown: a lingering cache entry would substitute
        # InMemoryTableScan into later tests' identical build plans and
        # break their Exchange-count assertions
        w = bloom_build(keys_df, "key", N_BITS, K).persist()
        yield w
        w.unpersist()

    def test_agrees_with_dense_probe(self, spark, keys_df, dense, words):
        # member + non-member mix: verdicts must be bit-identical
        probes = keys_df.unionByName(
            spark.range(2000).select(
                F.concat(F.lit("other-"), F.col("id")).alias("key")))
        d = (bloom_might_contain(probes, "key", dense, N_BITS, K)
             .orderBy("key").collect())
        s = (bloom_might_contain_sharded(probes, "key", words, N_BITS, K)
             .orderBy("key").collect())
        assert [tuple(r) for r in d] == [tuple(r) for r in s]

    def test_no_false_negatives(self, spark, keys_df, words):
        out = bloom_might_contain_sharded(keys_df, "key", words, N_BITS, K)
        assert out.filter(~F.col("might_contain")).count() == 0

    def test_null_and_duplicate_keys(self, spark, words):
        df = spark.createDataFrame(
            [("key-1",), ("key-1",), (None,), ("nope",), ("nope",)],
            "key string")
        out = bloom_might_contain_sharded(df, "key", words, N_BITS, K)
        got = sorted((r["key"] or "", r["might_contain"]) for r in out.collect())
        assert got == [("", False), ("key-1", True), ("key-1", True),
                       ("nope", False), ("nope", False)]

    def test_mismatched_params_fail_fast(self, spark, keys_df, words):
        with pytest.raises(ValueError, match="k must be >= 1"):
            bloom_might_contain_sharded(keys_df, "key", words, N_BITS, 0)

    def test_preserves_other_columns(self, spark, words):
        df = spark.createDataFrame([("key-3", 42), ("zzz", 7)],
                                   "key string, payload int")
        out = bloom_might_contain_sharded(df, "key", words, N_BITS, K)
        assert set(out.columns) == {"key", "payload", "might_contain"}
        rows = {r["key"]: (r["payload"], r["might_contain"])
                for r in out.collect()}
        assert rows == {"key-3": (42, True), "zzz": (7, False)}


class TestExactMatchBloom:
    def test_matches_plain_exact_join(self, spark, tables):
        docs = tables["documents"]
        new_df = docs.filter(F.col("doc_id") % 5 == 0)
        ref_df = docs.filter(F.col("doc_id") % 5 != 0)
        got = exact_match_bloom(new_df, ref_df, "text", "doc_id",
                                n_bits=N_BITS, k=K)
        want = (new_df.alias("n").join(ref_df.alias("r"),
                                       F.col("n.text") == F.col("r.text"))
                .groupBy(F.col("n.doc_id").alias("doc_id"))
                .agg(F.min("r.doc_id").alias("ref_id")))
        assert sorted(map(tuple, got.collect())) == \
            sorted(map(tuple, want.collect()))

    def test_prebuilt_bloom_words(self, spark, tables):
        docs = tables["documents"]
        new_df = docs.filter(F.col("doc_id") % 5 == 0)
        ref_df = docs.filter(F.col("doc_id") % 5 != 0)
        ref_hashed = ref_df.select(
            F.sha2(F.col("text").cast("string"), 256).alias("__h"))
        words = bloom_build(ref_hashed, "__h", N_BITS, K)
        got = exact_match_bloom(new_df, ref_df, "text", "doc_id",
                                n_bits=N_BITS, k=K, bloom_words=words)
        plain = exact_match_bloom(new_df, ref_df, "text", "doc_id",
                                  n_bits=N_BITS, k=K)
        assert sorted(map(tuple, got.collect())) == \
            sorted(map(tuple, plain.collect()))


class TestRefIndexBloom:
    def test_bloom_indexed_incremental_dedup_identical(self, spark, tables):
        from pandas_plus_spark.operators.dedup import (
            build_ref_index, incremental_dedup)
        docs = tables["documents"]
        new_df = docs.filter(F.col("doc_id") % 5 == 0)
        ref_df = docs.filter(F.col("doc_id") % 5 != 0)
        kw = dict(threshold=0.3, num_hashes=8, bands=4, shingle_size=3,
                  hash_fn="poly")
        plain = incremental_dedup(new_df, ref_df, "text", "doc_id", **kw)
        idx = build_ref_index(ref_df, "text", "doc_id", num_hashes=8,
                              bands=4, shingle_size=3, hash_fn="poly",
                              bloom_bits=N_BITS, bloom_k=K)
        assert idx.bloom_words is not None
        bloomed = incremental_dedup(new_df, ref_df, "text", "doc_id",
                                    ref_index=idx, **kw)
        assert sorted(map(tuple, plain.collect())) == \
            sorted(map(tuple, bloomed.collect()))

    def test_no_bloom_by_default(self, spark, tables):
        from pandas_plus_spark.operators.dedup import build_ref_index
        idx = build_ref_index(tables["documents"], "text", "doc_id",
                              num_hashes=8, bands=4)
        assert idx.bloom_words is None


class TestBloomPlanShape:
    def test_probe_is_zero_shuffle(self, spark, keys_df, dense):
        """The probe stage must be pure map work: positions JVM-side,
        bitmap via broadcast, no Exchange anywhere in the plan."""
        out = bloom_might_contain(keys_df, "key", dense, N_BITS, K)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "ArrowEvalPython" in plan  # vectorized, not row-at-a-time

    def test_build_has_single_exchange(self, spark, keys_df):
        """The bitmap build is one partial-agg exchange on the word index
        — map-side bit_or combine, then the final n_bits/64-row frame."""
        words = bloom_build(keys_df, "key", N_BITS, K)
        plan = words._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1
