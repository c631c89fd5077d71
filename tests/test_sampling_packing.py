"""Sampling / splitting / packing / repetition operators.

The oracle gate pins values vs DuckDB; these tests pin the *contracts*:
selection is invariant under repartitioning, splits are exhaustive and
weight-proportional, packed positions are contiguous within a shard, and
repetition signals behave on genuinely multi-line documents.
"""

import pyspark.sql.functions as F
import pytest

from pandas_plus_spark.operators import (
    concat_chunk_pack,
    line_stats,
    repetition_filter,
    sample_per_group,
    split_assign,
    stratified_sample,
    top_ngram_share,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


class TestStratifiedSample:
    def test_partition_layout_invariance(self, docs):
        kept = stratified_sample(docs, "lang", 0.4, "doc_id", seed=1)
        ids = sorted(r.doc_id for r in kept.select("doc_id").collect())
        kept2 = stratified_sample(
            docs.repartition(7, "lang"), "lang", 0.4, "doc_id", seed=1)
        assert sorted(r.doc_id for r in kept2.select("doc_id").collect()) == ids

    def test_dict_drops_unlisted_strata(self, docs):
        kept = stratified_sample(docs, "lang", {"en": 1.0}, "doc_id", seed=1)
        assert kept.select("lang").distinct().collect() == [("en",)]
        n_en = docs.filter(F.col("lang") == "en").count()
        assert kept.count() == n_en  # fraction 1.0 keeps every row

    def test_seed_changes_selection(self, docs):
        a = {r.doc_id for r in
             stratified_sample(docs, "lang", 0.4, "doc_id", seed=1).collect()}
        b = {r.doc_id for r in
             stratified_sample(docs, "lang", 0.4, "doc_id", seed=2).collect()}
        assert a != b

    def test_fraction_roughly_respected(self, docs):
        n = docs.count()
        kept = stratified_sample(docs, "lang", 0.5, "doc_id", seed=3).count()
        assert 0.3 * n < kept < 0.7 * n


class TestSplitAssign:
    def test_exhaustive_and_disjoint(self, docs):
        out = docs.withColumn(
            "split", split_assign("doc_id", {"train": 3, "test": 1}, seed=9))
        counts = dict(out.groupBy("split").count().collect())
        assert set(counts) <= {"train", "test"}
        assert sum(counts.values()) == docs.count()

    def test_weights_proportional(self, docs):
        out = docs.withColumn(
            "split", split_assign("doc_id", {"train": 9, "test": 1}, seed=4))
        counts = dict(out.groupBy("split").count().collect())
        assert counts["train"] > 5 * counts.get("test", 0)

    def test_single_split_is_constant(self, docs):
        out = docs.withColumn("split", split_assign("doc_id", {"all": 1.0}))
        assert out.select("split").distinct().collect() == [("all",)]


class TestSamplePerGroup:
    def test_exact_n_and_determinism(self, docs):
        out = sample_per_group(docs, "lang", 4, "doc_id", seed=2)
        sizes = dict(out.groupBy("lang").count().collect())
        truth = dict(docs.groupBy("lang").count().collect())
        for lang, n in truth.items():
            assert sizes[lang] == min(4, n)
        again = sample_per_group(
            docs.repartition(5), "lang", 4, "doc_id", seed=2)
        assert sorted(map(tuple, out.collect())) == sorted(
            map(tuple, again.collect()))

    def test_n_larger_than_group(self, docs):
        out = sample_per_group(docs, "lang", 10**6, "doc_id", seed=2)
        assert out.count() == docs.count()


class TestConcatChunkPack:
    def _packed(self, docs, budget=128, shards=3):
        withn = docs.select(
            "doc_id", F.size(F.split("text", " +")).cast("long").alias("n"))
        return concat_chunk_pack(
            withn, "doc_id", "n", budget=budget, shards=shards,
            string_key=False)

    def test_stream_is_contiguous_per_shard(self, docs):
        """Reconstructed per-shard streams must tile exactly: each doc starts
        where the previous one ended (chunk_first*budget + offset is the
        running cumsum)."""
        budget = 128
        rows = self._packed(docs, budget).orderBy(
            "shard", "chunk_first", "offset_in_chunk", "doc_id").collect()
        pos = {}
        for r in rows:
            start = r.chunk_first * budget + r.offset_in_chunk
            assert start == pos.get(r.shard, 0), r
            pos[r.shard] = start + r.n
            if r.n > 0:
                assert r.chunk_last == (start + r.n - 1) // budget
            else:
                assert r.chunk_last == r.chunk_first

    def test_offsets_within_budget(self, docs):
        bad = self._packed(docs, 64).filter(
            (F.col("offset_in_chunk") < 0) | (F.col("offset_in_chunk") >= 64)
            | (F.col("chunk_last") < F.col("chunk_first"))
        )
        assert bad.count() == 0

    def test_every_doc_packed_once(self, docs):
        out = self._packed(docs)
        assert out.count() == docs.count()
        assert out.select("doc_id").distinct().count() == docs.count()


class TestRepetition:
    @pytest.fixture(scope="class")
    def rep_docs(self, spark):
        rows = [
            (0, "alpha beta\nalpha beta\ngamma"),          # 1 dup line
            # no dups, long enough that any single 2-gram is under the
            # top-2-gram threshold (tiny docs always trip it: 2/n_tokens)
            (1, " ".join(f"w{i}" for i in range(40)) + "\n"
                + " ".join(f"v{i}" for i in range(40))),
            (2, "x\nx\nx\nx"),                             # 3 dup lines
            (3, "a b a b a b a b"),                        # repeated 2-gram
            (4, ""),                                       # empty doc
            (5, "solo"),                                   # 1 token, no grams
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_line_stats_values(self, rep_docs):
        ls = line_stats("text")
        got = {r.doc_id: r for r in rep_docs.select(
            "doc_id", ls["n_lines"].alias("n_lines"),
            ls["dup_line_frac"].alias("dlf"),
            ls["dup_line_char_frac"].alias("dlcf")).collect()}
        assert got[0].n_lines == 3
        assert got[0].dlf == pytest.approx(1 / 3)
        # 25 chars total (10+10+5), 15 distinct → 10/25 repeated
        assert got[0].dlcf == pytest.approx(10 / 25)
        assert got[1].dlf == 0.0
        assert got[2].dlf == pytest.approx(3 / 4)
        assert got[4].n_lines == 0 and got[4].dlf == 0.0

    def test_top_ngram_share_values(self, rep_docs):
        got = {r.doc_id: r for r in
               top_ngram_share(rep_docs, "doc_id", "text", 2).collect()}
        assert got[3].top_ngram in ("a b", "b a")
        assert got[3].top_ngram_count == 4  # "a b" appears 4×
        assert got[3].top_ngram_token_frac == pytest.approx(8 / 8)
        assert got[5].top_ngram_count == 0
        assert got[5].top_ngram_token_frac == 0.0
        assert got[4].n_tokens == 0

    def test_repetition_filter_drops_repetitive(self, rep_docs):
        kept = {r.doc_id for r in
                repetition_filter(rep_docs, "doc_id", "text").collect()}
        assert 1 in kept and 5 in kept
        assert 2 not in kept      # dup lines way over threshold
        assert 3 not in kept      # top 2-gram covers the whole doc


class TestChunkDocuments:
    @pytest.fixture(scope="class")
    def chunked(self, spark):
        from pandas_plus_spark.operators import chunk_documents
        rows = [
            (0, ""),                      # empty -> one empty chunk
            (1, "a" * 100),               # shorter than chunk_size -> 1 chunk
            (2, "b" * 200),               # exactly chunk_size -> 1 chunk
            (3, "c" * 201),               # one char over -> 2 chunks
            (4, "x" * 500),               # 1 + ceil(300/150) = 3 chunks
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = chunk_documents(df, "text", "doc_id", chunk_size=200, overlap=50)
        return {r["doc_id"]: [] for r in out.collect()} | {
            k: sorted(
                [r for r in out.collect() if r["doc_id"] == k],
                key=lambda r: r["chunk_idx"])
            for k in (0, 1, 2, 3, 4)
        }

    def test_chunk_counts(self, chunked):
        assert [len(chunked[k]) for k in (0, 1, 2, 3, 4)] == [1, 1, 1, 2, 3]

    def test_starts_and_lengths(self, chunked):
        assert [r["chunk_start"] for r in chunked[4]] == [0, 150, 300]
        assert [r["chunk_len"] for r in chunked[4]] == [200, 200, 200]
        assert [r["chunk_len"] for r in chunked[3]] == [200, 51]

    def test_overlap_content(self, spark):
        from pandas_plus_spark.operators import chunk_documents
        text = "".join(chr(65 + (i % 26)) for i in range(400))
        df = spark.createDataFrame([(0, text)], "doc_id long, text string")
        rows = sorted(
            chunk_documents(df, "text", "doc_id", chunk_size=200, overlap=50)
            .collect(), key=lambda r: r["chunk_idx"])
        # each chunk's first 50 chars == previous chunk's last 50
        for prev, cur in zip(rows, rows[1:]):
            assert cur["chunk_text"][:50] == prev["chunk_text"][-50:]
        # full coverage: stitching chunks at stride reconstructs the doc
        rebuilt = rows[0]["chunk_text"] + "".join(r["chunk_text"][50:] for r in rows[1:])
        assert rebuilt == text

    def test_no_shuffle(self, spark):
        from pandas_plus_spark.operators import chunk_documents
        df = spark.range(10).selectExpr("id as doc_id", "repeat('z', 300) as text")
        plan = chunk_documents(df, "text", "doc_id",
                               chunk_size=100, overlap=10)._jdf.queryExecution(
            ).executedPlan().toString()
        assert "Exchange" not in plan

    def test_overlap_ge_chunk_raises(self, spark):
        from pandas_plus_spark.operators import chunk_documents
        df = spark.createDataFrame([(0, "abc")], "doc_id long, text string")
        with pytest.raises(ValueError):
            chunk_documents(df, "text", "doc_id", chunk_size=10, overlap=10)


class TestSourceHealth:
    def test_rollup_values(self, spark):
        from pandas_plus_spark.operators import source_health
        rows = [
            (0, "alpha beta", "web"),
            (1, "alpha beta", "web"),       # exact dup of 0
            (2, "gamma delta", "web"),
            (3, "unique text here", "books"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        out = {r["source"]: r for r in source_health(df).collect()}
        assert out["web"]["n_docs"] == 3
        assert out["web"]["n_distinct"] == 2
        assert abs(out["web"]["dup_frac"] - (1 - 2 / 3)) < 1e-12
        assert abs(out["web"]["avg_chars"] - (10 + 10 + 11) / 3) < 1e-12
        assert out["books"]["n_docs"] == 1
        assert out["books"]["dup_frac"] == 0.0
        assert 0.0 <= out["books"]["avg_quality"] <= 1.0

    def test_no_expand_in_plan(self, spark):
        from pandas_plus_spark.operators import source_health
        df = spark.createDataFrame(
            [(0, "t", "s")], "doc_id long, text string, source string")
        plan = source_health(df)._jdf.queryExecution().executedPlan().toString()
        assert "Expand" not in plan


class TestParallelFilter:
    def test_same_rows_as_plain_filter(self, spark, docs):
        from pandas_plus_spark.util import parallel_filter
        cond = F.length("text") > 500
        a = sorted(r["doc_id"] for r in parallel_filter(docs, cond).collect())
        b = sorted(r["doc_id"] for r in docs.filter(cond).collect())
        assert a == b and len(a) > 0

    def test_repartitions_and_blocks_pushdown_when_undersplit(self, spark, docs):
        from pandas_plus_spark.util import parallel_filter
        out = parallel_filter(docs.coalesce(1), F.length("text") > 500)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # exchange present, and the filter sits ABOVE it (not pushed to scan)
        assert "Exchange RoundRobinPartitioning" in plan
        assert plan.index("Filter") < plan.index("Exchange RoundRobinPartitioning")

    def test_noop_when_already_parallel(self, spark, docs):
        from pandas_plus_spark.util import parallel_filter
        wide = docs.repartition(64)
        plan = parallel_filter(wide, F.length("text") > 500)._jdf.queryExecution(
            ).executedPlan().toString()
        # only the explicit repartition's exchange — no second one, no guard
        assert plan.count("Exchange RoundRobinPartitioning") == 1
        assert "monotonically_increasing_id" not in plan


class TestChunkDocumentsProperty:
    def test_reconstruction_invariant_random(self, spark):
        """Property sweep: for random texts and (chunk_size, overlap) pairs,
        chunk 0 starts at 0, consecutive starts differ by stride, stitching
        chunks at stride reconstructs the document, and every chunk except
        possibly the last has exactly chunk_size chars."""
        import random
        from pandas_plus_spark.operators import chunk_documents
        rng = random.Random(11)
        alphabet = "abcdefg hij"
        cases = []
        did = 0
        for chunk_size, overlap in [(10, 0), (10, 3), (7, 6), (50, 25), (3, 1)]:
            for _ in range(6):
                n = rng.randrange(0, 120)
                cases.append((did, chunk_size, overlap,
                              "".join(rng.choice(alphabet) for _ in range(n))))
                did += 1
        for chunk_size, overlap in sorted({(c, o) for _, c, o, _ in cases}):
            rows = [(d, t) for d, c, o, t in cases
                    if (c, o) == (chunk_size, overlap)]
            df = spark.createDataFrame(rows, "doc_id long, text string")
            out = chunk_documents(df, "text", "doc_id",
                                  chunk_size=chunk_size, overlap=overlap)
            stride = chunk_size - overlap
            by_doc = {}
            for r in out.collect():
                by_doc.setdefault(r["doc_id"], []).append(r)
            texts = dict(rows)
            assert set(by_doc) == set(texts)
            for d, chunks in by_doc.items():
                chunks.sort(key=lambda r: r["chunk_idx"])
                text = texts[d]
                assert chunks[0]["chunk_start"] == 0
                for a, b in zip(chunks, chunks[1:]):
                    assert b["chunk_start"] - a["chunk_start"] == stride
                for r in chunks[:-1]:
                    assert r["chunk_len"] == chunk_size
                rebuilt = chunks[0]["chunk_text"] + "".join(
                    r["chunk_text"][overlap:] for r in chunks[1:])
                assert rebuilt == text
                # never more chunks than needed: the last chunk must start
                # inside the doc (or be the only, possibly empty, chunk)
                if len(chunks) > 1:
                    assert chunks[-1]["chunk_start"] < len(text)


class TestWeightedSamplePerGroup:
    @pytest.fixture(scope="class")
    def weighted_df(self, spark):
        rows = [(i, "g%d" % (i % 3), float(1 + i % 7)) for i in range(300)]
        rows += [(900, "g0", 0.0), (901, "g0", -1.0), (902, "g0", None)]
        return spark.createDataFrame(rows, "id long, g string, w double")

    def test_layout_invariance_and_n(self, weighted_df):
        from pandas_plus_spark.operators.sampling import weighted_sample_per_group
        a = {r["id"] for r in weighted_sample_per_group(
            weighted_df.repartition(2), "g", "w", 5, "id", seed=1).collect()}
        b = {r["id"] for r in weighted_sample_per_group(
            weighted_df.repartition(23, "w"), "g", "w", 5, "id", seed=1).collect()}
        assert a == b and len(a) == 15  # 5 per group, 3 groups

    def test_nonpositive_weights_excluded(self, weighted_df):
        from pandas_plus_spark.operators.sampling import weighted_sample_per_group
        out = {r["id"] for r in weighted_sample_per_group(
            weighted_df, "g", "w", 1000, "id", seed=1).collect()}
        assert not out & {900, 901, 902}
        assert len(out) == 300  # everything else kept when n >= group size

    def test_weight_proportionality(self, spark):
        """Statistical sanity over many seeds: an item with 9x the weight
        must be selected far more often than a 1x item."""
        from pandas_plus_spark.operators.sampling import weighted_sample_per_group
        rows = [(0, "g", 9.0)] + [(i, "g", 1.0) for i in range(1, 10)]
        df = spark.createDataFrame(rows, "id long, g string, w double").persist()
        picks_heavy = picks_light = 0
        for seed in range(40):
            got = {r["id"] for r in weighted_sample_per_group(
                df, "g", "w", 2, "id", seed=seed).collect()}
            picks_heavy += 0 in got
            picks_light += 1 in got
        assert picks_heavy > 25      # 9x item: expected ~2/3+ of draws
        assert picks_heavy > 2 * picks_light


class TestTemperatureMixture:
    def test_alpha_one_keeps_budget_everywhere(self, spark):
        """alpha=1 preserves natural proportions: every source keeps ~frac
        of its rows (deterministic hash, so counts are fixed)."""
        from pandas_plus_spark.operators.sampling import temperature_mixture

        rows = [(i, "big" if i % 10 else "small") for i in range(1000)]
        df = spark.createDataFrame(rows, "id long, src string")
        import pyspark.sql.functions as F

        kept = temperature_mixture(df, "src", "id", alpha=1.0,
                                   budget_frac=0.5, seed=3)
        by = {r["src"]: r["n"] for r in
              kept.groupBy("src").agg(F.count("id").alias("n")).collect()}
        assert 0.4 < by["big"] / 900 < 0.6
        assert by.get("small", 0) <= 100

    def test_low_alpha_upweights_small_sources(self, spark):
        """alpha=0.25 with a tight budget: the small source's keep RATE must
        exceed the big source's (that is the point of temperature mixing)."""
        from pandas_plus_spark.operators.sampling import temperature_mixture

        rows = [(i, "big" if i < 1900 else "small") for i in range(2000)]
        df = spark.createDataFrame(rows, "id long, src string")
        kept = temperature_mixture(df, "src", "id", alpha=0.25,
                                   budget_frac=0.3, seed=5)
        import pyspark.sql.functions as F
        by = {r["src"]: r["n"] for r in
              kept.groupBy("src").agg(F.count("id").alias("n")).collect()}
        rate_big = by.get("big", 0) / 1900
        rate_small = by.get("small", 0) / 100
        assert rate_small > rate_big
        # determinism: same seed, same rows
        again = {r["src"]: r["n"] for r in
                 temperature_mixture(df, "src", "id", alpha=0.25,
                                     budget_frac=0.3, seed=5)
                 .groupBy("src").agg(F.count("id").alias("n")).collect()}
        assert again == by


class TestTemperatureMixtureTokens:
    def test_weight_col_budgets_token_mass(self, spark):
        # two sources, equal row counts, 10x different doc lengths:
        # with alpha=1 + weight_col the keep PROBABILITY must equalize
        # the TOKEN shares (long source keeps ~budget of its mass) —
        # under row-count mass the same call keeps ~budget of ROWS per
        # source instead, so kept-token shares differ materially
        import pyspark.sql.functions as F

        from pandas_plus_spark.operators.sampling import temperature_mixture
        rows = [(i, "long" if i % 2 else "short",
                 1000 if i % 2 else 100) for i in range(4000)]
        df = spark.createDataFrame(rows, "id long, src string, tok long")
        kept = temperature_mixture(df, "src", "id", alpha=1.0,
                                   budget_frac=0.5, seed=7,
                                   weight_col="tok")
        by = {r["src"]: (r["n"], r["t"]) for r in
              kept.groupBy("src").agg(
                  F.count(F.lit(1)).alias("n"),
                  F.sum("tok").alias("t")).collect()}
        # alpha=1 + token mass: every source keeps ~50% of its tokens
        assert 0.42 < by["long"][1] / 2_000_000 < 0.58
        assert 0.42 < by["short"][1] / 200_000 < 0.58
        # determinism across partition layouts
        again = {r["src"]: (r["n"], r["t"]) for r in
                 temperature_mixture(df.repartition(13), "src", "id",
                                     alpha=1.0, budget_frac=0.5, seed=7,
                                     weight_col="tok")
                 .groupBy("src").agg(
                     F.count(F.lit(1)).alias("n"),
                     F.sum("tok").alias("t")).collect()}
        assert again == by


class TestEpochMixture:
    def test_copies_and_fractions(self, spark):
        # e=2.5 -> 2 full copies always + ~half the rows a third copy;
        # e=0.4 -> ~40% of rows once; e=3.0 -> exactly 3 copies;
        # e=0 -> dropped; unlisted source -> default_epochs
        import pyspark.sql.functions as F

        from pandas_plus_spark.operators.sampling import epoch_mixture
        rows = [(i, ["rep", "frac", "full", "gone", "other"][i % 5])
                for i in range(5000)]
        df = spark.createDataFrame(rows, "id long, src string")
        out = epoch_mixture(df, "src", "id",
                            {"rep": 2.5, "frac": 0.4, "full": 3.0,
                             "gone": 0.0}, seed=9)
        by = {(r["src"], r["epoch"]): r["n"] for r in
              out.groupBy("src", "epoch")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
        assert by[("rep", 0)] == by[("rep", 1)] == 1000
        assert 300 < by[("rep", 2)] < 700
        assert 250 < by[("frac", 0)] < 550 and ("frac", 1) not in by
        assert all(by[("full", e)] == 1000 for e in (0, 1, 2))
        assert ("full", 3) not in by
        assert not any(s == "gone" for s, _ in by)
        assert by[("other", 0)] == 1000 and ("other", 1) not in by
        # determinism: identical materialization on a re-run
        again = {(r["src"], r["epoch"]): r["n"] for r in
                 epoch_mixture(df, "src", "id",
                               {"rep": 2.5, "frac": 0.4, "full": 3.0,
                                "gone": 0.0}, seed=9)
                 .groupBy("src", "epoch")
                 .agg(F.count(F.lit(1)).alias("n")).collect()}
        assert again == by
        # the fractional-copy row subset equals the u < frac selection
        # (pure function of the data, not the partition layout)
        re = epoch_mixture(df.repartition(17), "src", "id",
                           {"rep": 2.5, "frac": 0.4, "full": 3.0,
                            "gone": 0.0}, seed=9)
        a = {(r["id"], r["epoch"]) for r in out.collect()}
        b = {(r["id"], r["epoch"]) for r in re.collect()}
        assert a == b

    def test_integer_source_column(self, spark):
        # r15: recipe keys are cast to the source column's own type, so
        # an int domain id matches (no silent string-cast mismatch)
        import pyspark.sql.functions as F

        from pandas_plus_spark.operators.sampling import epoch_mixture
        df = spark.createDataFrame([(i, i % 2) for i in range(100)],
                                   "id long, dom int")
        out = epoch_mixture(df, "dom", "id", {0: 2.0, 1: 0.0}, seed=1)
        by = {r["dom"]: r["n"] for r in out.groupBy("dom")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
        assert by == {0: 100}  # 50 rows x 2 epochs; domain 1 dropped

    def test_epochs_for_target_plan(self, spark):
        import pyspark.sql.functions as F

        from pandas_plus_spark.operators.sampling import epochs_for_target
        rows = [(i, "a" if i < 300 else "b", 10) for i in range(400)]
        df = spark.createDataFrame(rows, "id long, src string, tok long")
        plan = {r["source"]: r for r in epochs_for_target(
            df, "src", "tok", {"a": 0.5, "b": 0.5},
            budget_tokens=4000).collect()}
        assert plan["a"]["n_tokens"] == 3000
        assert abs(plan["a"]["natural_frac"] - 0.75) < 1e-12
        assert abs(plan["a"]["epochs"] - 2000 / 3000) < 1e-12
        assert abs(plan["b"]["epochs"] - 2.0) < 1e-12
        # a source missing from the target gets 0 epochs
        plan2 = {r["source"]: r["epochs"] for r in epochs_for_target(
            df, "src", "tok", {"a": 1.0}, budget_tokens=3000).collect()}
        assert plan2["b"] == 0.0


class TestPackFirstFit:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        import random
        rng = random.Random(3)
        rows = [(i, rng.randint(10, 300)) for i in range(500)]
        rows.append((900, 2048))     # oversize
        return spark.createDataFrame(rows, "doc_id long, n_toks long")

    def test_invariants(self, corpus):
        from pandas_plus_spark.operators.packing import pack_first_fit
        out = pack_first_fit(corpus, "doc_id", "n_toks", budget=512,
                             n_shards=4).collect()
        assert len(out) == corpus.count()
        assert len({r["doc_id"] for r in out}) == len(out)
        packs = {}
        for r in out:
            packs.setdefault(r["pack_id"], []).append(r)
        for members in packs.values():
            if any(m["oversize"] for m in members):
                assert len(members) == 1
            else:
                assert sum(m["n_toks"] for m in members) <= 512
        # FFD fill: every closed pack (non-oversize) holds > 50% on average
        closed = [sum(m["n_toks"] for m in members)
                  for members in packs.values()
                  if not any(m["oversize"] for m in members)]
        assert sum(closed) / (512 * len(closed)) > 0.5

    def test_deterministic(self, corpus):
        from pandas_plus_spark.operators.packing import pack_first_fit
        a = {(r["doc_id"], r["pack_id"]) for r in pack_first_fit(
            corpus, "doc_id", "n_toks", budget=512, n_shards=4).collect()}
        b = {(r["doc_id"], r["pack_id"]) for r in pack_first_fit(
            corpus, "doc_id", "n_toks", budget=512, n_shards=4).collect()}
        assert a == b

    def test_budget_validation(self, corpus):
        from pandas_plus_spark.operators.packing import pack_first_fit
        with pytest.raises(ValueError, match="positive"):
            pack_first_fit(corpus, "doc_id", "n_toks", budget=0)


class TestTokenBudget:
    """token_budget_sample contract: greedy take-in-priority-order — each
    group's selected token total lands in [budget, budget + max_doc), the
    selection is exactly the priority-prefix, and membership is invariant
    under repartitioning."""

    def _withn(self, docs):
        from pandas_plus_spark.functions import text as tx
        return docs.select(
            "doc_id", "source",
            tx.token_count("text").cast("long").alias("n_tok"))

    def test_budget_respected_take_while(self, docs):
        from pandas_plus_spark.operators import token_budget_sample
        withn = self._withn(docs)
        sel = token_budget_sample(withn, "source", "n_tok", budget=500,
                                  key="doc_id", seed=7)
        agg = {r.source: (r.tot, r.mx) for r in
               sel.groupBy("source").agg(
                   F.sum("n_tok").alias("tot"),
                   F.max("n_tok").alias("mx")).collect()}
        for source, (tot, mx) in agg.items():
            assert tot >= 500, source          # budget is filled...
            assert tot - mx < 500, source      # ...with minimal overshoot

    def test_selection_is_priority_prefix(self, docs):
        # every selected row must out-rank every unselected row of its
        # group in (affine_uniform, doc_id) order — no gaps
        from pandas_plus_spark.operators import token_budget_sample
        from pandas_plus_spark.operators.sampling import affine_uniform
        withn = self._withn(docs).withColumn(
            "u", affine_uniform("doc_id", seed=7))
        sel = token_budget_sample(withn, "source", "n_tok", budget=500,
                                  key="doc_id", seed=7)
        picked = {(r.source, r.doc_id) for r in sel.collect()}
        rows = sorted(withn.collect(), key=lambda r: (r.source, r.u, r.doc_id))
        by_src = {}
        for r in rows:
            by_src.setdefault(r.source, []).append(r)
        for source, rs in by_src.items():
            in_prefix = True
            for r in rs:
                member = (source, r.doc_id) in picked
                if not member:
                    in_prefix = False
                assert member == in_prefix or member is False

    def test_partition_layout_invariance(self, docs):
        from pandas_plus_spark.operators import token_budget_sample
        withn = self._withn(docs)
        a = {r.doc_id for r in token_budget_sample(
            withn, "source", "n_tok", 500, "doc_id", seed=7).collect()}
        b = {r.doc_id for r in token_budget_sample(
            withn.repartition(13), "source", "n_tok", 500, "doc_id",
            seed=7, num_partitions=5).collect()}
        assert a == b


class TestLeakageSafeSplit:
    def test_no_cluster_straddles_splits(self, docs, spark):
        from pandas_plus_spark.operators import leakage_safe_split
        from pandas_plus_spark.operators import dedup
        pairs = dedup.ngram_jaccard_pairs(docs, "text", "doc_id",
                                          threshold=0.2)
        out = leakage_safe_split(
            docs, pairs, "doc_id",
            {"train": 8.0, "valid": 1.0, "test": 1.0}, seed=3)
        cl = dedup.dup_clusters(pairs)
        joined = out.join(cl, out.doc_id == cl.id)
        bad = (joined.groupBy("cluster_id")
               .agg(F.countDistinct("split").alias("k"))
               .where(F.col("k") > 1).count())
        assert bad == 0

    def test_exhaustive_and_isolates_match_plain_split(self, docs, spark):
        # docs outside the pair graph must get exactly split_assign(doc_id)
        from pandas_plus_spark.operators import leakage_safe_split
        from pandas_plus_spark.operators import dedup
        weights = {"train": 8.0, "valid": 1.0, "test": 1.0}
        pairs = dedup.ngram_jaccard_pairs(docs, "text", "doc_id",
                                          threshold=0.2)
        out = leakage_safe_split(docs, pairs, "doc_id", weights, seed=3)
        assert out.count() == docs.count()
        assert out.where(F.col("split").isNull()).count() == 0
        graph_ids = {r.id for r in dedup.dup_clusters(pairs).collect()}
        plain = docs.withColumn("split", split_assign("doc_id", weights, 3))
        pm = {r.doc_id: r.split for r in plain.collect()}
        for r in out.collect():
            if r.doc_id not in graph_ids:
                assert r.split == pm[r.doc_id]


class TestQuantileThresholdFilter:
    def test_keeps_top_fraction_exact(self, docs):
        from pandas_plus_spark.operators import quantile_threshold_filter
        from pandas_plus_spark.functions import text as tx
        scored = docs.select("doc_id", "source",
                             tx.quality_score("text").alias("q"))
        kept = quantile_threshold_filter(scored, "source", "q", 0.7)
        tot = {r.source: r.n for r in
               scored.groupBy("source").agg(F.count("*").alias("n")).collect()}
        got = {r.source: r.n for r in
               kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
        for source, n in tot.items():
            # >= ceil(0.3 * n) modulo ties at the threshold
            assert got.get(source, 0) >= int(0.3 * n) - 1, source
            assert got.get(source, 0) <= n

    def test_threshold_out_column_and_min_kept(self, docs):
        from pandas_plus_spark.operators import quantile_threshold_filter
        from pandas_plus_spark.functions import text as tx
        scored = docs.select("doc_id", "source",
                             tx.quality_score("text").alias("q"))
        kept = quantile_threshold_filter(scored, "source", "q", 0.7,
                                         threshold_out="thr")
        assert "thr" in kept.columns
        bad = kept.where(F.col("q") < F.col("thr")).count()
        assert bad == 0

    def test_approx_path_close_to_exact(self, docs):
        from pandas_plus_spark.operators import quantile_threshold_filter
        from pandas_plus_spark.functions import text as tx
        scored = docs.select("doc_id", "source",
                             tx.quality_score("text").alias("q"))
        exact = quantile_threshold_filter(scored, "source", "q", 0.7).count()
        approx = quantile_threshold_filter(
            scored, "source", "q", 0.7, exact=False).count()
        assert abs(exact - approx) <= 0.1 * exact + 5


class TestMaxEqualRunCount:
    def test_matches_struct_fold(self, spark):
        """max_equal_run_count == the struct fold's best_cnt on randomized
        gram arrays (the count-only r10 formulation used by the curation
        gate), including empty and single-element arrays."""
        import random

        from pyspark.sql import functions as F

        from pandas_plus_spark.operators.corpus import (
            _top_gram_run_max, max_equal_run_count)
        rng = random.Random(17)
        vocab = ["a b", "b c", "c d", "d e"]
        rows = [(i, [rng.choice(vocab) for _ in range(rng.randint(0, 12))])
                for i in range(200)]
        rows += [(200, []), (201, ["a b"])]
        df = spark.createDataFrame(rows, "id long, g array<string>")
        got = df.select(
            "id",
            _top_gram_run_max(F.col("g")).getField("best_cnt").alias("f"),
            max_equal_run_count(F.col("g")).alias("b")).collect()
        for r in got:
            assert r.f == r.b, r.id


class TestCacheHandles:
    """The release_cached contract on the new operators: .select()/union
    must not orphan operator-pinned persists (r7-continuation review)."""

    def test_token_budget_query_carries_handles(self, spark):
        import __spark_entry__ as em
        df = em.queries()["token_budget"](spark, "/root/testdata/sf0.001")
        handles = getattr(df, "_pps_cached", ())
        assert handles, "token_budget result lost grouped_cumsum's persist handle"
        from pandas_plus_spark.util import release_cached
        df.count()
        release_cached(df)
        assert all(h.storageLevel.useMemory is False and
                   h.storageLevel.useDisk is False for h in handles)

    def test_leakage_safe_split_propagates_pair_handles(self, spark, docs):
        from pandas_plus_spark.operators import dedup, leakage_safe_split
        pairs = dedup.minhash_dedup(docs, "text", "doc_id", threshold=0.3,
                                    num_hashes=8, bands=4, hash_fn="poly")
        out = leakage_safe_split(docs, pairs.select("id_a", "id_b"), "doc_id",
                                 {"train": 1.0, "test": 1.0}, seed=1)
        # pairs.select stripped them; the operator takes what rides on the
        # frame it was GIVEN — so pass the un-stripped frame to get them
        out2 = leakage_safe_split(docs, pairs, "doc_id",
                                  {"train": 1.0, "test": 1.0}, seed=1)
        assert getattr(out2, "_pps_cached", ())

    def test_filter_groups_facade_with_selection(self, spark, docs):
        # selection-bound facade must not inject values= into filter_groups
        import pyspark.sql.functions as F
        from pandas_plus_spark.groupby.api import DataFrameGroupBy
        gb = DataFrameGroupBy(docs, "source")["n_chars"]
        out = gb.filter_groups(predicate=F.count(F.lit(1)) > 0)
        assert out.count() == docs.count()
