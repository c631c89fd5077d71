"""Dedup and similarity operators, with planted duplicates/near-duplicates."""

import pyspark.sql.functions as F
import pytest

from pandas_plus_spark.operators import dedup, similarity


@pytest.fixture(scope="module")
def planted_docs(spark):
    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "into the green forest near the old river bank every day")
    near = base.replace("green", "dark")  # one token differs → high jaccard
    other = "completely different text about spark shuffles and parquet files here"
    rows = [(0, base), (1, base), (2, near), (3, other)]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestExactDedup:
    def test_groups(self, planted_docs):
        out = dedup.exact_dedup(planted_docs, "text", "doc_id").collect()
        by_keep = {r["keep_id"]: r["n_copies"] for r in out}
        assert by_keep[0] == 2  # docs 0 and 1 identical
        assert by_keep[2] == 1 and by_keep[3] == 1


class TestMinhash:
    def test_finds_planted_neardup(self, planted_docs):
        # default: exact duplicates collapse to a representative first
        pairs = dedup.minhash_dedup(planted_docs, "text", "doc_id",
                                    threshold=0.5, num_hashes=32, bands=16)
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        assert (0, 2) in got          # near dup between representatives
        assert not any(p[0] == 1 or p[1] == 1 for p in got)  # dup collapsed
        assert not any(3 in p for p in got)    # unrelated doc untouched

    def test_finds_planted_neardup_no_prededup(self, planted_docs):
        pairs = dedup.minhash_dedup(planted_docs, "text", "doc_id",
                                    threshold=0.5, num_hashes=32, bands=16,
                                    pre_dedup_exact=False)
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        assert (0, 1) in got          # exact dup reported in raw mode
        assert (0, 2) in got or (1, 2) in got

    def test_signature_shape(self, planted_docs):
        sigs = dedup.minhash_signatures(planted_docs, "text", "doc_id", num_hashes=8)
        row = sigs.first()
        assert len(row["sig"]) == 8
        # identical docs → identical signatures
        d = {r["id"]: tuple(r["sig"]) for r in sigs.collect()}
        assert d[0] == d[1]


class TestHotBucketGuard:
    """Adversarial corpus: many docs landing in the SAME LSH bucket must not
    produce a quadratic candidate set when the guard is on."""

    N = 120
    CAP = 16

    @pytest.fixture(scope="class")
    def hot_sigs(self, spark):
        # identical signatures → every doc shares every band bucket
        return spark.range(self.N).select(
            F.col("id"),
            F.array(*[F.lit(7 * j + 1).cast("long") for j in range(8)])
            .alias("sig"))

    def test_minhash_candidates_bounded(self, hot_sigs):
        capped = dedup.minhash_lsh_candidates(
            hot_sigs, bands=4, num_hashes=8,
            max_bucket_size=self.CAP).count()
        # uncapped would be the full N*(N-1)/2 clique
        clique = self.N * (self.N - 1) // 2
        assert capped < clique
        # per-bucket self-join is bounded by ~cap^2/2 per band
        assert capped <= 4 * self.CAP * self.CAP

    def test_bucket_stats_warns_on_hot_bucket(self, hot_sigs):
        entries = dedup._band_entries(hot_sigs, 4, 8, "xxhash64")
        with pytest.warns(RuntimeWarning, match="max_bucket_size"):
            stats = dedup.lsh_bucket_stats(entries, self.CAP)
        assert stats["n_over_cap"] == 4          # every band is one hot bucket
        assert stats["max_bucket"] == self.N

    def test_bucket_stats_silent_when_healthy(self, hot_sigs):
        import warnings as w
        entries = dedup._band_entries(hot_sigs, 4, 8, "xxhash64")
        with w.catch_warnings():
            w.simplefilter("error")
            stats = dedup.lsh_bucket_stats(entries, self.N + 1)
        assert stats["n_over_cap"] == 0

    def test_minhash_candidates_uncapped_is_clique(self, hot_sigs):
        full = dedup.minhash_lsh_candidates(
            hot_sigs, bands=4, num_hashes=8, max_bucket_size=None).count()
        assert full == self.N * (self.N - 1) // 2

    def test_healthy_corpus_unchanged_by_default_cap(self, planted_docs):
        # default cap far above any bucket here → byte-identical pairs
        sigs = dedup.minhash_signatures(planted_docs, "text", "doc_id",
                                        num_hashes=32)
        base = {(r["id_a"], r["id_b"]) for r in dedup.minhash_lsh_candidates(
            sigs, bands=16, num_hashes=32, max_bucket_size=None).collect()}
        guarded = {(r["id_a"], r["id_b"]) for r in dedup.minhash_lsh_candidates(
            sigs, bands=16, num_hashes=32).collect()}
        assert guarded == base

    def test_simhash_candidates_bounded(self, spark):
        sig_df = spark.range(self.N).select(
            F.col("id"), F.lit(0x1234_5678_9ABC_DEF0).cast("long")
            .alias("simhash"))
        capped = dedup.simhash_candidates(
            sig_df, max_bucket_size=self.CAP).count()
        clique = self.N * (self.N - 1) // 2
        assert capped < clique
        assert capped <= 4 * self.CAP * self.CAP

    def test_capped_hot_bucket_connectivity(self, hot_sigs):
        """Hub edges (dedup.capped_pair_candidates): every member of an
        oversized bucket — including the hash-dropped ones — must appear
        in at least one candidate pair, and the whole cluster must form
        ONE connected component, else a dedup keep-list wrongly keeps
        the sampled-out members. Cost stays far below the clique."""
        pairs = [(r["id_a"], r["id_b"]) for r in dedup.minhash_lsh_candidates(
            hot_sigs, bands=4, num_hashes=8,
            max_bucket_size=self.CAP).collect()]
        covered = {i for p in pairs for i in p}
        assert covered == set(range(self.N))       # no isolated member
        # single component via union-find
        parent = list(range(self.N))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            parent[find(int(a))] = find(int(b))
        assert len({find(i) for i in range(self.N)}) == 1
        # still bounded: sampled clique + linear hub edges << full clique
        assert len(pairs) < self.N * (self.N - 1) // 4

    def test_guard_keeps_recall_on_mixed_corpus(self, spark):
        # 100 boilerplate docs (one hot bucket) + one planted near-dup pair
        # with DISTINCT signatures — the pair must survive the guard because
        # its buckets are small
        hot = spark.range(100).select(
            F.col("id"),
            F.array(*[F.lit(3).cast("long")] * 8).alias("sig"))
        pair = spark.createDataFrame(
            [(1000, [11, 22, 33, 44, 55, 66, 77, 88]),
             (1001, [11, 22, 33, 44, 55, 66, 99, 100])],
            "id long, sig array<long>")
        sigs = hot.union(pair)
        got = {(r["id_a"], r["id_b"])
               for r in dedup.minhash_lsh_candidates(
                   sigs, bands=4, num_hashes=8,
                   max_bucket_size=self.CAP).collect()}
        assert (1000, 1001) in got


class TestHyperplaneHotBucket:
    """Clustered embedding corpus: a tight cluster puts its whole membership
    into ONE (table, bucket) cell in EVERY table (hyperplane buckets depend
    only on projection signs, so identical vectors always co-bucket) — the
    exact shape that made the uncapped candidate join quadratic. The cap
    must bound the candidate set without losing small-bucket pairs."""

    N = 120
    CAP = 16
    TABLES = 4

    @pytest.fixture(scope="class")
    def clustered(self, spark):
        # one tight cluster (identical vectors -> one bucket per table)
        return spark.range(self.N).select(
            F.col("id").alias("vec_id"),
            F.array(F.lit(1.0), F.lit(0.5), F.lit(-0.25), F.lit(0.125))
            .alias("embedding"))

    def test_candidates_bounded_under_cap(self, clustered):
        capped = similarity.lsh_candidate_pairs(
            clustered, n_planes=3, n_tables=self.TABLES,
            max_bucket_size=self.CAP).count()
        clique = self.N * (self.N - 1) // 2
        assert capped < clique
        # each table contributes at most ~cap^2/2 pairs from its one bucket
        assert capped <= self.TABLES * self.CAP * self.CAP

    def test_uncapped_is_clique(self, clustered):
        full = similarity.lsh_candidate_pairs(
            clustered, n_planes=3, n_tables=self.TABLES,
            max_bucket_size=None).count()
        assert full == self.N * (self.N - 1) // 2

    def test_small_bucket_pair_survives_cap(self, spark, clustered):
        # planted identical pair in a different direction: its buckets hold
        # 2 entries, far under the cap -> the pair must remain a candidate
        pair = spark.createDataFrame(
            [(1000, [-1.0, 2.0, 0.5, -3.0]), (1001, [-1.0, 2.0, 0.5, -3.0])],
            "vec_id long, embedding array<double>")
        got = {(r["id_a"], r["id_b"])
               for r in similarity.lsh_candidate_pairs(
                   clustered.union(pair), n_planes=3, n_tables=self.TABLES,
                   max_bucket_size=self.CAP).collect()}
        assert (1000, 1001) in got

    def test_healthy_corpus_unchanged_by_default_cap(self, spark):
        # spread-out corpus, buckets far under the default cap -> the guard
        # is a no-op broadcast and pairs are byte-identical
        import random
        rng = random.Random(7)
        rows = [(i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(60)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        base = {(r["id_a"], r["id_b"]) for r in similarity.lsh_candidate_pairs(
            emb, n_planes=3, n_tables=4, max_bucket_size=None).collect()}
        guarded = {(r["id_a"], r["id_b"]) for r in similarity.lsh_candidate_pairs(
            emb, n_planes=3, n_tables=4).collect()}
        assert guarded == base

    def test_candidate_pairs_single_corpus_scan(self, spark, tmp_path):
        """r15 fusion + r16 lineage-cut pin: lsh_candidate_pairs computes
        EVERY table's bucket in ONE pass over the vector corpus
        (struct-array explode) instead of n_tables hyperplane_lsh_buckets
        scans unioned — and since r16 the entry frame is a lineage cut,
        so the pair plan reads the materialized entries (a LogicalRDD
        leaf), never re-deriving the corpus scan at all. Pinned on the
        PRE-CUT source plan (stashed as _pps_ckpt_src, what the linter
        walks) with a version-tolerant scan count: the parquet relation
        leaf is matched by the format name, not the exact node rendering
        (r15 ADVICE)."""
        path = str(tmp_path / "vecs.parquet")
        spark.range(50).select(
            F.col("id").alias("vec_id"),
            F.array(F.lit(1.0), F.lit(0.5), F.lit(-0.25), F.lit(0.125))
            .alias("embedding")).write.parquet(path)
        vecs = spark.read.parquet(path)
        out = similarity.lsh_candidate_pairs(
            vecs, n_planes=3, n_tables=self.TABLES, max_bucket_size=None)
        try:
            entries = getattr(out, "_pps_cached", ())[0]
            src = getattr(entries, "_pps_ckpt_src", entries)
            src_plan = src._jdf.queryExecution().optimizedPlan().toString()
            n_scans = src_plan.lower().count("parquet")
            assert n_scans == 1, (
                f"expected ONE corpus scan in the entry plan, plan:\n{src_plan}")
            # the pair plan itself must NOT re-derive the corpus scan —
            # both self-join sides read the cut entry frame
            pair_plan = out._jdf.queryExecution().optimizedPlan().toString()
            assert "parquet" not in pair_plan.lower(), (
                f"pair plan re-derives the corpus scan:\n{pair_plan}")
        finally:
            from pandas_plus_spark.util import release_cached
            release_cached(out)

    def test_recommended_planes_contract(self):
        # planes = ceil(log2(n / target)), floored at 1
        assert similarity.recommended_planes(500, 1024) == 1
        assert similarity.recommended_planes(1024, 1024) == 1
        assert similarity.recommended_planes(2048, 1024) == 1
        assert similarity.recommended_planes(4096, 1024) == 2
        assert similarity.recommended_planes(10 ** 9, 1024) == 20
        # 10x corpus -> ~3.3 more planes (expected bucket size constant)
        p1 = similarity.recommended_planes(10 ** 6)
        p10 = similarity.recommended_planes(10 ** 7)
        assert p10 - p1 in (3, 4)


class TestJaccard:
    def test_exact_value(self, spark):
        df = spark.createDataFrame(
            [(0, "a b c d"), (1, "a b c e")], "doc_id long, text string")
        # trigrams: {abc,bcd} vs {abc,bce} → intersection 1, union 3
        out = dedup.ngram_jaccard_pairs(df, "text", "doc_id", threshold=0.0).collect()
        assert len(out) == 1
        assert out[0]["jaccard"] == pytest.approx(1 / 3)


class TestSimhash:
    def test_identical_docs_same_sig(self, planted_docs):
        sigs = dedup.simhash(planted_docs, "text", "doc_id")
        d = {r["id"]: r["simhash"] for r in sigs.collect()}
        assert d[0] == d[1]
        cands = dedup.simhash_candidates(sigs)
        got = {(r["id_a"], r["id_b"]) for r in cands.collect()}
        assert (0, 1) in got


class TestSimilarity:
    @pytest.fixture(scope="class")
    def vecs(self, spark):
        rows = [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0]),   # close to 0
            (2, [0.0, 1.0, 0.0]),   # orthogonal to 0
            (3, [-1.0, 0.0, 0.0]),  # opposite of 0
        ]
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_knn_ranking(self, vecs):
        out = similarity.brute_force_knn(vecs, vecs.where("vec_id = 0"), k=3)
        ranked = [r["neighbor_id"] for r in out.orderBy("rank").collect()]
        assert ranked == [1, 2, 3]

    def test_neardup_threshold(self, vecs):
        pairs = similarity.cosine_neardup_pairs(vecs, threshold=0.9)
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        assert got == {(0, 1)}

    def test_all_pairs_fallback_warns(self, spark, vecs):
        """The silent O(n²) cross-join must announce itself (same
        RuntimeWarning convention as GroupBy.__iter__); the candidates
        form — the scale path — must stay silent."""
        import warnings

        import pytest as _pytest
        with _pytest.warns(RuntimeWarning, match="ALL pairs"):
            similarity.cosine_neardup_pairs(vecs, threshold=0.9)
        with _pytest.warns(RuntimeWarning, match="ALL pairs"):
            similarity.semantic_dedup_keep_list(vecs, threshold=0.9)
        cands = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            similarity.cosine_neardup_pairs(vecs, threshold=0.9,
                                            candidates=cands)
            similarity.lsh_neardup_pairs(vecs, threshold=0.9, n_planes=2,
                                         n_tables=2)

    def test_ivf_knn_recovers_neighbor(self, spark):
        import math
        # 24 vectors on a circle: neighbors are adjacent angles
        rows = [(i, [math.cos(i / 24 * 2 * math.pi), math.sin(i / 24 * 2 * math.pi)])
                for i in range(24)]
        vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = similarity.ivf_knn(vecs, vecs.where("vec_id = 5"), k=2,
                                 n_lists=4, n_probes=2)
        got = [r["neighbor_id"] for r in out.orderBy("rank").collect()]
        assert set(got) == {4, 6}  # adjacent on the circle

    def test_lsh_buckets_deterministic(self, vecs):
        b1 = {r["id"]: r["bucket"] for r in
              similarity.hyperplane_lsh_buckets(vecs, n_planes=8).collect()}
        b2 = {r["id"]: r["bucket"] for r in
              similarity.hyperplane_lsh_buckets(vecs, n_planes=8).collect()}
        assert b1 == b2
        # opposite vectors land in complementary buckets, never the same
        assert b1[0] != b1[3]


class TestMultimodal:
    def test_feature_extraction(self, spark):
        from pandas_plus_spark.operators import multimodal
        df = spark.createDataFrame([(0, "hello world"), (1, "x" * 100)],
                                   "doc_id long, text string")
        blobs = df.select("doc_id", F.encode("text", "UTF-8").alias("blob"))
        out = {r["doc_id"]: r for r in
               multimodal.extract_image_features(blobs, "blob", "doc_id").collect()}
        assert out[0]["width"] == 11 % 640 + 1
        assert out[1]["height"] == (100 * 7) % 480 + 1
        assert out[0]["n_channels"] == 3

    def test_stub_raises_on_empty(self):
        from pandas_plus_spark.operators.multimodal import decode_image_stub
        with pytest.raises(NotImplementedError):
            decode_image_stub(b"")

    def test_real_header_decode_roundtrip(self):
        """PNG/BMP/GIF header parse is REAL: the fixture builders emit
        spec-layout headers, the decoder reads dimensions back from the
        actual container bytes (big-endian PNG, little-endian BMP/GIF,
        color-type channel map)."""
        from pandas_plus_spark.operators.multimodal import (
            bmp_header_bytes, decode_image_header, gif_header_bytes,
            png_header_bytes)
        for w, h in [(1, 1), (300, 200), (12345, 678)]:
            assert decode_image_header(png_header_bytes(w, h, 2)) == {
                "width": w, "height": h, "n_channels": 3}
            assert decode_image_header(png_header_bytes(w, h, 6)) == {
                "width": w, "height": h, "n_channels": 4}
            assert decode_image_header(bmp_header_bytes(w, h, 24)) == {
                "width": w, "height": h, "n_channels": 3}
            assert decode_image_header(bmp_header_bytes(w, h, 32)) == {
                "width": w, "height": h, "n_channels": 4}
        assert decode_image_header(gif_header_bytes(640, 480)) == {
            "width": 640, "height": 480, "n_channels": 3}
        # top-down BMP: negative height decodes to its magnitude
        assert decode_image_header(bmp_header_bytes(10, -20))["height"] == 20

    def test_webp_header_decode(self):
        """WebP decode is a REAL RIFF chunk walk: VP8X 24-bit LE
        canvas-minus-one + alpha flag, lossy VP8 14-bit dims behind the
        keyframe sync code, lossless VP8L packed 28-bit dims + alpha bit
        (with an odd-sized chunk exercising word alignment)."""
        from pandas_plus_spark.operators.multimodal import (
            decode_image_header, webp_header_bytes)
        for w, h in [(1, 1), (640, 480), (16383, 16383)]:
            assert decode_image_header(webp_header_bytes(w, h)) == {
                "width": w, "height": h, "n_channels": 3}
            assert decode_image_header(
                webp_header_bytes(w, h, alpha=True)) == {
                "width": w, "height": h, "n_channels": 4}
            assert decode_image_header(webp_header_bytes(w, h, kind="vp8")) \
                == {"width": w, "height": h, "n_channels": 3}
            assert decode_image_header(
                webp_header_bytes(w, h, alpha=True, kind="vp8l")) == {
                "width": w, "height": h, "n_channels": 4}
        # VP8X canvas reaches beyond the 14-bit bitstream limit
        assert decode_image_header(webp_header_bytes(100000, 5)) == {
            "width": 100000, "height": 5, "n_channels": 3}
        # malformed: bad sync code / bad VP8L signature / truncation
        from pandas_plus_spark.operators.multimodal import _webp_dims
        good = webp_header_bytes(64, 64, kind="vp8")
        assert decode_image_header(good[:14]) is None
        bad_sync = bytearray(good)
        bad_sync[23] = 0x00                  # clobber the 0x9D012A sync
        assert decode_image_header(bytes(bad_sync)) is None
        badl = bytearray(webp_header_bytes(64, 64, kind="vp8l"))
        badl[20] = 0x30                      # clobber the 0x2F signature
        assert decode_image_header(bytes(badl)) is None

    def test_avif_header_decode(self):
        """AVIF decode is a REAL ISO-BMFF walk to meta/iprp/ipco/ispe
        (meta is a FullBox — children start 4 bytes into the payload)."""
        from pandas_plus_spark.operators.multimodal import (
            avif_header_bytes, decode_image_header)
        for w, h in [(1, 1), (1920, 1080), (65536, 4)]:
            assert decode_image_header(avif_header_bytes(w, h)) == {
                "width": w, "height": h, "n_channels": 3}
        good = avif_header_bytes(320, 240)
        assert decode_image_header(good[:20]) is None    # ftyp only
        assert decode_image_header(good[:-6]) is None    # truncated ispe

    def test_jpeg_sof_marker_walk(self):
        """JPEG decode is a REAL SOFn marker-segment scan: APP0 hopped by
        its length field, baseline SOF0 and progressive SOF2 both read,
        grayscale/RGB channel counts from the frame header."""
        from pandas_plus_spark.operators.multimodal import (
            decode_image_header, jpeg_header_bytes)
        for w, h in [(1, 1), (300, 200), (4032, 3024)]:
            assert decode_image_header(jpeg_header_bytes(w, h, 3)) == {
                "width": w, "height": h, "n_channels": 3}
            assert decode_image_header(
                jpeg_header_bytes(w, h, 1, progressive=True)) == {
                "width": w, "height": h, "n_channels": 1}
        # CMYK (4-component) SOF
        assert decode_image_header(
            jpeg_header_bytes(640, 480, 4))["n_channels"] == 4

    def test_jpeg_extra_segments_are_skipped(self):
        """Segments the scanner must walk over by LENGTH, not pattern:
        a COM comment whose payload CONTAINS a fake SOF marker byte pair
        must not be read as a frame header."""
        from pandas_plus_spark.operators.multimodal import (
            decode_image_header, jpeg_header_bytes)
        base = jpeg_header_bytes(123, 45, 3)
        # splice a COM segment (with an embedded fake \xff\xc0) after SOI
        fake_sof = b"\xff\xc0" + (11).to_bytes(2, "big") + bytes([8]) \
            + (9999).to_bytes(2, "big") + (9999).to_bytes(2, "big") + b"\x01"
        com = b"\xff\xfe" + (2 + len(fake_sof)).to_bytes(2, "big") + fake_sof
        spliced = base[:2] + com + base[2:]
        assert decode_image_header(spliced) == {
            "width": 123, "height": 45, "n_channels": 3}

    def test_jpeg_malformed_returns_none(self):
        from pandas_plus_spark.operators.multimodal import (
            decode_image_header, jpeg_header_bytes)
        good = jpeg_header_bytes(300, 200, 3)
        assert decode_image_header(b"\xff\xd8") is None       # bare SOI
        assert decode_image_header(good[:12]) is None         # truncated APP0
        # truncated INSIDE the dims fields (cut 10 of the SOF's 19 bytes;
        # cutting only the trailing component specs leaves dims readable)
        assert decode_image_header(good[:-10]) is None
        # SOS before any SOF: entropy stream, dims unknowable by marker scan
        sos = b"\xff\xd8" + b"\xff\xda" + (2).to_bytes(2, "big") + b"\x00" * 8
        assert decode_image_header(sos) is None
        # lost sync (non-FF where a marker must start)
        assert decode_image_header(b"\xff\xd8" + b"garbage") is None

    def test_text_blobs_never_parse_as_images(self):
        """The fake-dimension fallback is keyed on REAL magic + structure:
        ordinary text — even text starting with 'BM' or 'GIF' — must not
        hit the header parser (the multimodal_image_meta gate depends on
        the fallback values for text blobs)."""
        from pandas_plus_spark.operators.multimodal import (
            decode_image_header, decode_image_stub)
        for s in [b"BM hello world, this is a text document padded out...",
                  b"GIFted children study hard", b"plain old text",
                  b"PNG is a format" + bytes(30)]:
            assert decode_image_header(s) is None
            n = len(s)
            assert decode_image_stub(s)["width"] == n % 640 + 1

    def test_wav_header_roundtrip(self):
        """WAV decode is a REAL RIFF chunk walk: fmt params + data-size
        frame count read from the actual little-endian chunk bytes, JUNK
        chunks (odd size → word-aligned) hopped by declared length."""
        from pandas_plus_spark.operators.multimodal import (
            decode_wav_header, wav_header_bytes, wav_header_bytes_junk)
        for sr, ch, bits, nf in [(8000, 1, 8, 0), (44100, 2, 16, 44100 * 3),
                                 (22050, 2, 16, 1), (16000, 1, 16, 999)]:
            got = decode_wav_header(wav_header_bytes(sr, ch, bits, nf))
            assert got == {
                "sample_rate": sr, "n_channels": ch, "bits_per_sample": bits,
                "n_frames": nf, "duration_ms": nf * 1000.0 / sr}
            got_j = decode_wav_header(wav_header_bytes_junk(sr, ch, bits, nf))
            assert got_j == got

    def test_wav_pcm_roundtrip(self):
        """decode_wav_pcm reads back the EXACT int16 samples wav_pcm_bytes
        wrote — interleaving, channel split, negative values, and the
        declared-data-size bound all byte-real."""
        import numpy as np

        from pandas_plus_spark.operators.multimodal import (
            decode_wav_pcm, wav_pcm_bytes)
        rng = np.random.default_rng(7)
        for ch in (1, 2, 3):
            want = rng.integers(-32768, 32768, size=(41, ch), dtype=np.int16)
            got, sr = decode_wav_pcm(wav_pcm_bytes(22050, want))
            assert sr == 22050
            assert got.shape == (41, ch)
            assert (got == want).all()
        # mono 1-D input
        got, _ = decode_wav_pcm(wav_pcm_bytes(8000, np.array([1, -2, 3])))
        assert got.tolist() == [[1], [-2], [3]]
        # trailing junk beyond the declared data size is ignored
        blob = wav_pcm_bytes(8000, np.array([5, 6])) + b"EXTRA"
        got, _ = decode_wav_pcm(blob)
        assert got.tolist() == [[5], [6]]

    def test_wav_pcm_rejects(self):
        import numpy as np

        from pandas_plus_spark.operators.multimodal import (
            decode_wav_pcm, wav_header_bytes, wav_pcm_bytes)
        assert decode_wav_pcm(None) is None
        assert decode_wav_pcm(b"not audio at all........") is None
        # 8-bit is DECODABLE since r11 — this header-only fixture is
        # rejected for its missing payload (declares 4 frames, carries 0)
        assert decode_wav_pcm(wav_header_bytes(8000, 1, 8, 4)) is None
        # truncated payload: data chunk declares more than is present
        full = wav_pcm_bytes(8000, np.arange(10, dtype=np.int16))
        assert decode_wav_pcm(full[:-4]) is None

    def test_pcm_features_sparkside(self, spark):
        """extract_audio_pcm_features: closed-form square wave (RMS == A,
        peak == A, ZCR == crossings/(n-1)) per channel via mapInPandas."""
        import numpy as np
        import pandas as pd

        from pandas_plus_spark.operators.multimodal import (
            extract_audio_pcm_features, wav_pcm_bytes)
        n, h, amp = 64, 8, 1000
        sq = np.where((np.arange(n) // h) % 2 == 0, amp, -amp)
        const = np.full(n, 7)
        blob = wav_pcm_bytes(16000, np.column_stack([sq, const]))
        df = spark.createDataFrame(
            pd.DataFrame({"id": [1, 2], "blob": [blob, b"junk"]}))
        rows = {(r.id, r.channel): r for r in
                extract_audio_pcm_features(df, "blob", "id").collect()}
        assert set(rows) == {(1, 0), (1, 1)}   # undecodable id 2 dropped
        r0 = rows[(1, 0)]
        assert (r0.sample_rate, r0.n_frames, r0.peak) == (16000, n, amp)
        assert r0.rms == float(amp)
        assert r0.zcr == ((n - 1) // h) / (n - 1)
        r1 = rows[(1, 1)]
        assert (r1.peak, r1.rms, r1.zcr) == (7, 7.0, 0.0)

    def test_wav_malformed_returns_none(self):
        from pandas_plus_spark.operators.multimodal import (
            decode_wav_header, wav_header_bytes)
        assert decode_wav_header(b"") is None
        assert decode_wav_header(b"RIFF1234WAV?") is None     # bad form type
        assert decode_wav_header(b"RIFFxxxxWAVE") is None     # no fmt chunk
        assert decode_wav_header(b"plain text that is long enough") is None
        # zero sample rate / zero block align must not divide-by-zero
        assert decode_wav_header(wav_header_bytes(0, 2, 16, 10)) is None

    def test_mp4_box_walk_roundtrip(self):
        """MP4 decode is a REAL ISO-BMFF box walk: moov→mvhd (timescale,
        duration; v0 AND v1 layouts) and moov→trak→tkhd (16.16
        fixed-point width/height)."""
        from pandas_plus_spark.operators.multimodal import (
            decode_mp4_header, mp4_header_bytes)
        for w, h, dur, ts in [(1920, 1080, 90000, 600), (640, 480, 0, 1000),
                              (1, 1, 7, 90000)]:
            for ver in (0, 1):
                got = decode_mp4_header(mp4_header_bytes(w, h, dur, ts, version=ver))
                assert got == {"width": w, "height": h, "timescale": ts,
                               "duration_ms": dur * 1000.0 / ts}, (ver, got)

    def test_mp4_largesize_and_free_boxes(self):
        """Boxes the walk must handle structurally: a 64-bit largesize
        ftyp (size == 1 escape) and a free box before moov."""
        from pandas_plus_spark.operators.multimodal import (
            decode_mp4_header, mp4_header_bytes)
        base = mp4_header_bytes(320, 240, 5000, 1000)
        ftyp_len = int.from_bytes(base[:4], "big")
        ftyp, moov = base[:ftyp_len], base[ftyp_len:]
        big_ftyp = ((1).to_bytes(4, "big") + b"ftyp"
                    + (16 + len(ftyp) - 8).to_bytes(8, "big") + ftyp[8:])
        free = (16).to_bytes(4, "big") + b"free" + bytes(8)
        assert decode_mp4_header(big_ftyp + free + moov) == {
            "width": 320, "height": 240, "timescale": 1000,
            "duration_ms": 5000.0}

    def test_mp4_malformed_returns_none(self):
        from pandas_plus_spark.operators.multimodal import (
            decode_mp4_header, mp4_header_bytes)
        good = mp4_header_bytes(640, 480, 1000, 1000)
        assert decode_mp4_header(b"") is None
        assert decode_mp4_header(b"\x00\x00\x00\x08ftypisom") is None  # no moov
        assert decode_mp4_header(good[:40]) is None           # truncated moov
        assert decode_mp4_header(b"plain text, definitely not bmff") is None

    def test_av_extract_through_spark(self, spark):
        """The mapInPandas plumbing end-to-end: WAV + MP4 blobs round-trip
        the Arrow boundary; non-parsing blobs yield null feature rows."""
        from pandas_plus_spark.operators.multimodal import (
            extract_audio_features, extract_video_meta, mp4_header_bytes,
            wav_header_bytes)
        wavs = spark.createDataFrame(
            [(0, bytearray(wav_header_bytes(16000, 1, 16, 16000))),
             (1, bytearray(b"not audio at all, just bytes"))],
            "id long, blob binary")
        out = {r["id"]: r for r in
               extract_audio_features(wavs, "blob", "id").collect()}
        assert out[0]["sample_rate"] == 16000 and out[0]["duration_ms"] == 1000.0
        assert out[1]["sample_rate"] is None
        vids = spark.createDataFrame(
            [(0, bytearray(mp4_header_bytes(1280, 720, 2500, 1000))),
             (1, bytearray(b"not video either"))],
            "id long, blob binary")
        vout = {r["id"]: r for r in
                extract_video_meta(vids, "blob", "id").collect()}
        assert vout[0]["width"] == 1280 and vout[0]["duration_ms"] == 2500.0
        assert vout[1]["width"] is None


class TestScaleShapes:
    """Plan-level guarantees from the round-1 verdict: no corpus-sized
    single-task funnels in the ANN paths."""

    @pytest.fixture(scope="class")
    def big_vecs(self, spark):
        import random
        random.seed(7)
        rows = [(i, [random.gauss(0, 1) for _ in range(8)]) for i in range(400)]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>").repartition(8).persist()

    def test_two_stage_topk_matches_single_window(self, big_vecs):
        from pyspark.sql import Window
        q = big_vecs.where("vec_id < 5")
        got = similarity.brute_force_knn(big_vecs, q, k=7)
        # naive single-window reference on the same similarity relation
        sims = got.sparkSession.createDataFrame(
            similarity.brute_force_knn(big_vecs, q, k=10**6)
            .select("query_id", "neighbor_id", "cos_sim").toPandas())
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos_sim").desc(), F.col("neighbor_id"))
        exp = (sims.withColumn("rank", F.row_number().over(w))
               .where(F.col("rank") <= 7))
        g = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in got.collect()}
        e = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in exp.collect()}
        assert g == e

    def test_knn_windows_all_partitioned_by_query(self, big_vecs):
        import re
        out = similarity.brute_force_knn(big_vecs, big_vecs.where("vec_id < 3"), k=5)
        plan = out._jdf.queryExecution().executedPlan().toString()
        specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
        assert specs, "expected window specs in the kNN plan"
        for s in specs:
            assert "query_id" in s, f"global (unpartitioned) window found: {s}"

    def test_ivf_seed_is_take_ordered_not_global_window(self, big_vecs):
        assignments, centroids = similarity.ivf_build(big_vecs, n_lists=4, n_iters=1)
        plan = centroids._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        # the only window in the centroid seed runs on the LIMITed k-row frame
        n = assignments.count()
        assert n == 400
        from pandas_plus_spark.util import release_cached
        release_cached(assignments)

    def test_ann_recall_at_k(self, big_vecs):
        q = big_vecs.where("vec_id < 5")
        rows = similarity.ann_recall_at_k(
            big_vecs, q, k=5, n_lists=4, n_probes=2).collect()
        assert len(rows) == 5
        for r in rows:
            assert r["n_exact"] == 5
            assert 0.0 <= r["recall"] <= 1.0
            assert r["recall"] == r["n_hit"] / r["n_exact"]
        # probing ALL lists makes IVF exhaustive → recall must be exactly 1
        full = similarity.ann_recall_at_k(
            big_vecs, q, k=5, n_lists=4, n_probes=4).collect()
        assert all(r["recall"] == 1.0 for r in full)

    def test_ivf_knn_windows_partitioned(self, big_vecs):
        out = similarity.ivf_knn(big_vecs, big_vecs.where("vec_id < 3"), k=4,
                                 n_lists=4, n_probes=2)
        import re
        plan = out._jdf.queryExecution().executedPlan().toString()
        # final ranking stages: every window over the candidate relation
        # carries the query partition key
        specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
        bad = [s for s in specs
               if "query_id" not in s and "list_id" not in s and "id#" not in s]
        assert not bad, f"unpartitioned windows: {bad}"
        from pandas_plus_spark.util import release_cached
        release_cached(out)


class TestClustersAndKeepList:
    def test_dup_clusters_components(self, spark):
        # two components: {1,2,3} via chain edges, {7,9} — plus 5 isolated
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (7, 9)], "id_a long, id_b long")
        got = {r["id"]: r["cluster_id"]
               for r in dedup.dup_clusters(pairs).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}

    def test_dup_clusters_chain_converges(self, spark):
        # a path graph stresses propagation depth: 0-1-2-...-9
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(9)], "id_a long, id_b long")
        got = {r["id"]: r["cluster_id"]
               for r in dedup.dup_clusters(pairs, n_iters=8).collect()}
        assert set(got.values()) == {0}

    def test_dup_clusters_early_stop(self, spark):
        # shallow graph (all pairs): must converge well under the cap and
        # record how many rounds actually ran
        pairs = spark.createDataFrame(
            [(1, 2), (7, 9), (20, 30)], "id_a long, id_b long")
        out = dedup.dup_clusters(pairs, n_iters=16)
        got = {r["id"]: r["cluster_id"] for r in out.collect()}
        assert got == {1: 1, 2: 1, 7: 7, 9: 7, 20: 20, 30: 20}
        assert out._pps_cc_rounds <= 3  # 1 merge round + 1 fixpoint check

    def test_dup_clusters_cap_warns(self, spark):
        # a 64-deep path cannot converge in 2 rounds even with pointer
        # jumping — the cap must warn, not silently return half-merged labels
        import warnings as w
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(64)], "id_a long, id_b long")
        with pytest.warns(RuntimeWarning, match="cap"):
            dedup.dup_clusters(pairs, n_iters=2).collect()
        # and with the default cap the same graph fully converges silently
        with w.catch_warnings():
            w.simplefilter("error")
            got = dedup.dup_clusters(pairs).collect()
        assert {r["cluster_id"] for r in got} == {0}

    def test_keep_list_planted(self, planted_docs):
        # docs 0,1 identical; 2 near-dup of 0; 3 unrelated
        out = {r["id"]: r["keep"] for r in dedup.dedup_keep_list(
            planted_docs, "text", "doc_id", threshold=0.5,
            num_hashes=32, bands=16).collect()}
        assert out == {0: True, 1: False, 2: False, 3: True}
        # all input ids present exactly once
        assert len(out) == 4

    def test_keep_list_quality_best_member(self, planted_docs):
        # quality_col switches step 4 to best-member selection: docs
        # 0,1 identical text + 2 near-dup form ONE cluster; give the
        # NON-representative exact copy (id 1) the best quality — it,
        # not min-id 0, must be kept
        q = planted_docs.withColumn(
            "q", F.when(F.col("doc_id") == 1, 9.0)
                  .when(F.col("doc_id") == 2, 5.0).otherwise(1.0))
        out = {r["id"]: r["keep"] for r in dedup.dedup_keep_list(
            q, "text", "doc_id", threshold=0.5,
            num_hashes=32, bands=16, quality_col="q").collect()}
        assert out == {0: False, 1: True, 2: False, 3: True}

    def test_keep_list_quality_null_and_ties(self, spark):
        # NULL quality ranks below every score; an all-NULL cluster and
        # a tied cluster both degrade to min-id
        rows = [(10, "aaaa bbbb cccc dddd", None),
                (11, "aaaa bbbb cccc dddd", None),   # all-NULL cluster
                (20, "xxxx yyyy zzzz wwww", 3.0),
                (21, "xxxx yyyy zzzz wwww", 3.0),    # tie -> min id
                (30, "solo text here okay", None)]
        df = spark.createDataFrame(rows, "doc_id long, text string, q double")
        out = {r["id"]: r["keep"] for r in dedup.dedup_keep_list(
            df, "text", "doc_id", threshold=0.5,
            num_hashes=32, bands=16, quality_col="q").collect()}
        assert out == {10: True, 11: False, 20: True, 21: False, 30: True}


class TestVectorUtils:
    def test_l2_normalize(self, spark):
        from pandas_plus_spark.operators.similarity import l2_normalize
        df = spark.createDataFrame([(0, [3.0, 4.0]), (1, [0.0, 0.0])],
                                   "id long, v array<double>")
        got = {r["id"]: r["n"] for r in
               df.select("id", l2_normalize(F.col("v")).alias("n")).collect()}
        assert got[0][0] == pytest.approx(0.6)
        assert got[0][1] == pytest.approx(0.8)
        assert got[1] is None  # zero vector → NULL, not NaN

    def test_group_centroids(self, spark):
        from pandas_plus_spark.operators.similarity import group_centroids
        df = spark.createDataFrame(
            [(0, "a", [1.0, 0.0]), (1, "a", [3.0, 2.0]), (2, "b", [5.0, 5.0])],
            "vec_id long, label string, embedding array<double>")
        got = {r["label"]: r for r in group_centroids(df, "label").collect()}
        assert got["a"]["centroid"] == [2.0, 1.0]
        assert got["a"]["n_vecs"] == 2
        assert got["b"]["centroid"] == [5.0, 5.0] and got["b"]["n_vecs"] == 1

    def test_centroid_similarity(self, spark):
        from pandas_plus_spark.operators.similarity import centroid_similarity
        df = spark.createDataFrame(
            # centroid of "a" = (1, 1): both members at 45°, cos = 1/sqrt(2)... 
            # no: (2,0) vs (1,1) → cos = 2/(2*sqrt(2)) = 1/sqrt(2)
            [(0, "a", [2.0, 0.0]), (1, "a", [0.0, 2.0]), (2, "b", [1.0, 0.0])],
            "vec_id long, label string, embedding array<double>")
        got = {r["vec_id"]: r["cos_centroid"] for r in
               centroid_similarity(df, "label").collect()}
        import math
        assert got[0] == pytest.approx(1 / math.sqrt(2))
        assert got[1] == pytest.approx(1 / math.sqrt(2))
        assert got[2] == pytest.approx(1.0)  # own centroid

    def test_centroids_are_broadcast(self, spark, tables):
        from pandas_plus_spark.operators.similarity import centroid_similarity
        emb = tables["embeddings"].select(
            "vec_id", "label", F.col("embedding").cast("array<double>").alias("embedding"))
        out = centroid_similarity(emb, "label")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


class TestIncrementalDedup:
    @pytest.fixture(scope="class")
    def corpora(self, spark):
        base = "the quick brown fox jumps over the lazy dog again and again today"
        ref_rows = [
            (100, base),
            (101, "completely different reference material about spark engines"),
            (102, "a third reference document with its own unique words"),
        ]
        new_rows = [
            (1, base),                                    # exact dup of 100
            (2, base.replace("today", "tomorrow")),       # near dup of 100
            (3, "novel content sharing nothing with the reference corpus"),
        ]
        mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
        return mk(new_rows), mk(ref_rows)

    def test_matches(self, corpora):
        from pandas_plus_spark.operators import incremental_dedup
        new_df, ref_df = corpora
        out = {r["doc_id"]: r for r in incremental_dedup(
            new_df, ref_df, "text", "doc_id", threshold=0.3,
            num_hashes=8, bands=4).collect()}
        assert out[1]["match_kind"] == "exact" and out[1]["ref_id"] == 100
        assert out[1]["jaccard"] == 1.0
        assert out[2]["match_kind"] == "near" and out[2]["ref_id"] == 100
        assert 0.3 <= out[2]["jaccard"] < 1.0
        assert 3 not in out  # novel doc untouched

    def test_never_ref_x_ref(self, corpora):
        """Candidate generation must be new x ref only: a ref-side dup pair
        must not surface."""
        from pandas_plus_spark.operators import incremental_dedup
        new_df, ref_df = corpora
        ref_plus = ref_df.union(
            ref_df.filter("doc_id = 100").selectExpr("999 as doc_id", "text"))
        out = incremental_dedup(new_df, ref_plus, "text", "doc_id",
                                threshold=0.3, num_hashes=8, bands=4)
        ids = {r["doc_id"] for r in out.collect()}
        assert 999 not in ids and 100 not in ids


class TestQuantizeEmbeddings:
    def test_reconstruction_bounds(self, spark):
        from pandas_plus_spark.operators import quantize_embeddings
        rows = [(0, [1.0, -0.5, 0.25, 0.0]), (1, [0.0, 0.0, 0.0, 0.0]),
                (2, [-2.0, 2.0, 1.0, -1.0])]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
        assert out[0]["maxabs"] == 1.0
        assert out[0]["scale"] == 1.0 / 127
        # max quantization error is scale/2 per dim -> mse <= (scale/2)^2
        assert out[0]["mse"] <= (out[0]["scale"] / 2) ** 2 + 1e-18
        # floor(x+0.5) is half-toward-+inf: 1.0 -> 64 but -1.0 -> -63 at
        # scale 2/127, so the symmetric vector sums to 1, not 0 (the price
        # of a tie rule both engines agree on)
        assert out[2]["q_sum"] == 1
        # zero vector: diagnostics are NULL (nothing to quantize)
        assert out[1]["maxabs"] is None and out[1]["q_sum"] is None

    def test_no_shuffle(self, spark):
        from pandas_plus_spark.operators import quantize_embeddings
        df = spark.createDataFrame([(0, [1.0, 2.0])],
                                   "vec_id long, embedding array<float>")
        plan = quantize_embeddings(df)._jdf.queryExecution(
            ).executedPlan().toString()
        assert "Exchange" not in plan


class TestSampleFrames:
    def test_offsets_and_sigs(self, spark):
        from pandas_plus_spark.operators import sample_frames
        payload = bytes(range(40))  # 40 bytes, span = 32
        df = spark.createDataFrame([(0, bytearray(payload))],
                                   "doc_id long, blob binary")
        rows = sorted(sample_frames(df, "blob", "doc_id",
                                    n_frames=4, frame_bytes=8).collect(),
                      key=lambda r: r["frame_idx"])
        assert [r["byte_offset"] for r in rows] == [0, 10, 21, 32]
        for r in rows:
            off = r["byte_offset"]
            assert r["frame_sig"] == payload[off:off + 8].hex().upper()

    def test_short_blob(self, spark):
        from pandas_plus_spark.operators import sample_frames
        df = spark.createDataFrame([(0, bytearray(b"abc"))],
                                   "doc_id long, blob binary")
        rows = sample_frames(df, "blob", "doc_id",
                             n_frames=3, frame_bytes=8).collect()
        assert len(rows) == 3
        assert all(r["byte_offset"] == 0 for r in rows)
        assert all(r["frame_sig"] == b"abc".hex().upper() for r in rows)


class TestChunkDedupStats:
    def test_boilerplate_prefix_detected(self, spark):
        rows = [(i, ("BOILER " * 40) + f"unique content {i} " * 30)
                for i in range(4)]
        rows += [(10, "completely unique document with no shared chunks at all")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        from pandas_plus_spark.operators import chunk_dedup_stats
        out = {r["doc_id"]: r for r in
               chunk_dedup_stats(df, "text", "doc_id", chunk_size=100).collect()}
        # the 280-char boiler prefix gives at least two phase-aligned
        # duplicate 100-char chunks in each of the 4 docs
        for i in range(4):
            assert out[i]["n_dup_chunks"] >= 2
            assert 0 < out[i]["dup_chunk_frac"] < 1
        assert out[10]["n_dup_chunks"] == 0

    def test_empty_chunks_never_dup(self, spark):
        df = spark.createDataFrame([(0, ""), (1, ""), (2, "x")],
                                   "doc_id long, text string")
        from pandas_plus_spark.operators import chunk_dedup_stats
        out = {r["doc_id"]: r for r in
               chunk_dedup_stats(df, "text", "doc_id").collect()}
        assert out[0]["n_chunks"] == 1 and out[0]["n_dup_chunks"] == 0
        assert out[1]["n_dup_chunks"] == 0


class TestRefIndex:
    def test_prebuilt_index_equals_inline(self, spark, tmp_path):
        base = ("the quick brown fox jumps over the lazy dog again and"
                " again in the morning sun near the river")
        ref_rows = [(100, base), (101, "other reference content entirely here")]
        new_rows = [(1, base), (2, base.replace("morning", "evening")),
                    (3, "nothing in common with anything else at all")]
        mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
        new_df, ref_df = mk(new_rows), mk(ref_rows)
        kw = dict(threshold=0.3, num_hashes=8, bands=4)

        inline = {r["doc_id"]: (r["match_kind"], r["ref_id"]) for r in
                  dedup.incremental_dedup(new_df, ref_df, "text", "doc_id",
                                          **kw).collect()}
        # build index, round-trip through parquet (the production path)
        idx = dedup.build_ref_index(ref_df, "text", "doc_id",
                                    num_hashes=8, bands=4)
        idx.content_hashes.write.mode("overwrite").parquet(str(tmp_path / "ch"))
        idx.band_entries.write.mode("overwrite").parquet(str(tmp_path / "be"))
        stored = dedup.RefIndex(
            spark.read.parquet(str(tmp_path / "ch")),
            spark.read.parquet(str(tmp_path / "be")))
        via_idx = {r["doc_id"]: (r["match_kind"], r["ref_id"]) for r in
                   dedup.incremental_dedup(new_df, ref_df, "text", "doc_id",
                                           ref_index=stored, **kw).collect()}
        assert inline == via_idx
        assert via_idx[1] == ("exact", 100)
        assert via_idx[2][0] == "near"
        assert 3 not in via_idx

    def test_ref_side_never_rehashed_with_index(self, spark):
        """With a stored index the plan must not shingle/hash the reference
        text — only the new batch's."""
        ref_df = spark.createDataFrame([(100, "a b c d e f g")],
                                       "doc_id long, text string")
        new_df = spark.createDataFrame([(1, "h i j k l m n")],
                                       "doc_id long, text string")
        idx = dedup.build_ref_index(ref_df, "text", "doc_id",
                                    num_hashes=8, bands=4)
        # materialize to plain frames so the index's lineage is opaque
        stored = dedup.RefIndex(
            spark.createDataFrame(idx.content_hashes.toPandas()),
            spark.createDataFrame(idx.band_entries.toPandas()))
        out = dedup.incremental_dedup(new_df, ref_df, "text", "doc_id",
                                      threshold=0.3, num_hashes=8, bands=4,
                                      ref_index=stored)
        out.collect()


class TestSemanticKeepList:
    def test_clusters_and_singletons(self, spark):
        """Two near-identical vector pairs + one isolate: keep = cluster
        minimum; the isolate keeps itself. Transitive chains collapse to
        one keeper."""
        from pandas_plus_spark.operators.similarity import semantic_dedup_keep_list

        rows = [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.999, 0.01, 0.0]),   # ~1.0 cos with 1
            (3, [0.0, 1.0, 0.0]),      # isolate
            (4, [0.0, 0.707, 0.707]),  # ~0.707 cos with 3 (below 0.9)
            (5, [0.01, 0.999, 0.0]),   # ~1.0 cos with 3
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        keep = {r["id"]: r["keep"]
                for r in semantic_dedup_keep_list(df, threshold=0.9).collect()}
        assert keep == {1: True, 2: False, 3: True, 4: True, 5: False}

    def test_all_isolates_all_kept(self, spark):
        from pandas_plus_spark.operators.similarity import semantic_dedup_keep_list

        df = spark.createDataFrame(
            [(i, [float(i == j) for j in range(4)]) for i in range(4)],
            "vec_id long, embedding array<double>")
        out = semantic_dedup_keep_list(df, threshold=0.5).collect()
        assert len(out) == 4 and all(r["keep"] for r in out)


class TestSemanticContamination:
    def test_flags_planted_match(self, spark):
        from pandas_plus_spark.operators.similarity import semantic_contamination
        bench = spark.createDataFrame(
            [(1000, [1.0, 0.0, 0.0]), (1001, [0.0, 1.0, 0.0])],
            "vec_id long, embedding array<double>")
        corpus = spark.createDataFrame(
            [(0, [0.999, 0.01, 0.0]),     # ~bench 1000
             (1, [0.0, 0.0, 1.0]),        # orthogonal to both
             (2, [0.0, 2.0, 0.0])],       # scaled copy of bench 1001
            "vec_id long, embedding array<double>")
        got = {r["vec_id"]: r for r in semantic_contamination(
            corpus, bench, threshold=0.95).collect()}
        assert len(got) == 3
        assert got[0]["contaminated"] and got[0]["nearest_bench_id"] == 1000
        assert not got[1]["contaminated"]
        assert got[2]["contaminated"] and got[2]["nearest_bench_id"] == 1001
        assert got[2]["max_sim"] == pytest.approx(1.0)

    def test_tie_breaks_to_smaller_bench_id(self, spark):
        from pandas_plus_spark.operators.similarity import semantic_contamination
        bench = spark.createDataFrame(
            [(7, [1.0, 0.0]), (3, [2.0, 0.0])],   # identical directions
            "vec_id long, embedding array<double>")
        corpus = spark.createDataFrame([(0, [5.0, 0.0])],
                                       "vec_id long, embedding array<double>")
        row = semantic_contamination(corpus, bench, threshold=0.5).first()
        assert row["nearest_bench_id"] == 3


class TestContainmentAndCanonical:
    def test_containment_catches_subdocument(self, spark):
        big = "a b c d e f g h i j k l m n o p"
        sub = "a b c d e f"           # contained prefix
        df = spark.createDataFrame([(0, big), (1, sub)],
                                   "doc_id long, text string")
        cont = dedup.ngram_jaccard_pairs(df, "text", "doc_id", threshold=0.9,
                                         metric="containment").collect()
        assert len(cont) == 1 and cont[0]["containment"] == pytest.approx(1.0)
        # symmetric jaccard under-scores the same pair
        jac = dedup.ngram_jaccard_pairs(df, "text", "doc_id",
                                        threshold=0.0).collect()
        assert jac[0]["jaccard"] < 0.5

    def test_bad_metric_raises(self, spark):
        df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
        with pytest.raises(ValueError, match="metric"):
            dedup.ngram_jaccard_pairs(df, "text", "doc_id", 0.5,
                                      metric="dice")

    def test_canonical_collapses_case_and_whitespace(self, spark):
        from pandas_plus_spark.functions.text import normalize_text
        df = spark.createDataFrame(
            [(0, "Hello   World"), (1, "hello world"), (2, " HELLO\tWORLD "),
             (3, "different")],
            "doc_id long, text string")
        canon = df.select("doc_id", normalize_text("text").alias("text"))
        out = {r["keep_id"]: r["n_copies"]
               for r in dedup.exact_dedup(canon, "text", "doc_id").collect()}
        assert out == {0: 3, 3: 1}


class TestIvfIndex:
    def test_stored_index_equals_inline(self, spark, tmp_path):
        import numpy as np
        rng = np.random.RandomState(11)
        X = rng.randn(200, 8)
        rows = [(i, [float(x) for x in X[i]]) for i in range(len(X))]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        idx = similarity.ivf_build_index(emb, n_lists=8)
        a_p, c_p = str(tmp_path / "a"), str(tmp_path / "c")
        idx.assignments.write.parquet(a_p)
        idx.centroids.write.parquet(c_p)
        stored = similarity.IvfIndex(spark.read.parquet(a_p),
                                     spark.read.parquet(c_p))
        q = emb.where("vec_id < 5")
        inline = {(r["query_id"], r["rank"]): r["neighbor_id"]
                  for r in similarity.ivf_knn(emb, q, k=4, n_lists=8).collect()}
        via_idx = {(r["query_id"], r["rank"]): r["neighbor_id"]
                   for r in similarity.ivf_knn(emb, q, k=4,
                                               index=stored).collect()}
        assert inline == via_idx and len(inline) == 20


class TestDuplicatedSpans:
    """Exact-substring (span-granular) dedup: duplicated_spans."""

    @pytest.fixture(scope="class")
    def span_docs(self, spark):
        # docs 0 and 1 share an 8-token boilerplate block at different
        # offsets; doc 2 is unrelated; doc 3 shares a second, separate
        # 6-token block with doc 0 (two disjoint spans in doc 0).
        block_a = "all rights reserved contact us for more information"  # 8 tokens
        block_b = "subscribe to our newsletter right now"               # 6 tokens
        rows = [
            (0, f"unique opening words here {block_a} middle filler text {block_b}"),
            (1, f"{block_a} and then a totally different continuation follows"),
            (2, "nothing here repeats anywhere else in this tiny corpus at all"),
            (3, f"some other prefix tokens {block_b} trailing ending part"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_finds_planted_spans(self, span_docs):
        out = dedup.duplicated_spans(span_docs, "text", "doc_id", k=6)
        spans = {}
        for r in out.collect():
            spans.setdefault(r["doc_id"], []).append(
                (r["span_start"], r["span_end"]))
        # doc 0: block_a at tokens [4, 12), block_b at [15, 21)
        assert sorted(spans[0]) == [(4, 12), (15, 21)]
        # doc 1: block_a at [0, 8); doc 3: block_b at [4, 10)
        assert spans[1] == [(0, 8)]
        assert spans[3] == [(4, 10)]
        assert 2 not in spans  # nothing in doc 2 repeats

    def test_hash_families_agree(self, span_docs):
        a = sorted(map(tuple, dedup.duplicated_spans(
            span_docs, "text", "doc_id", k=6, hash_fn="poly").collect()))
        b = sorted(map(tuple, dedup.duplicated_spans(
            span_docs, "text", "doc_id", k=6, hash_fn="xxhash64").collect()))
        assert a == b and len(a) == 4

    def test_min_df_3_drops_pairwise_repeats(self, span_docs):
        out = dedup.duplicated_spans(span_docs, "text", "doc_id", k=6,
                                     min_df=3)
        assert out.count() == 0  # every planted block is in exactly 2 docs

    def test_short_and_empty_docs(self, spark):
        df = spark.createDataFrame(
            [(0, "too short"), (1, ""), (2, None), (3, "also too short")],
            "doc_id long, text string")
        assert dedup.duplicated_spans(df, "text", "doc_id", k=6).count() == 0
        empty = df.filter(F.lit(False))
        out = dedup.duplicated_spans(empty, "text", "doc_id", k=6)
        assert out.count() == 0
        assert out.columns == ["doc_id", "span_start", "span_end", "n_grams"]

    def test_k_validation(self, span_docs):
        with pytest.raises(ValueError):
            dedup.duplicated_spans(span_docs, "text", "doc_id", k=0)

    def test_contaminated_spans_cross_corpus(self, spark, span_docs):
        # benchmark = block_a verbatim (plus noise); only block_a spans
        # of the corpus are flagged, at the right offsets, regardless of
        # how often they repeat WITHIN the corpus
        ref = spark.createDataFrame(
            [(100, "all rights reserved contact us for more information"),
             (101, "benchmark question unrelated to anything here")],
            "doc_id long, text string")
        out = {}
        spans = dedup.contaminated_spans(span_docs, ref, "text", "doc_id",
                                         k=6)
        for r in spans.collect():
            out.setdefault(r["doc_id"], []).append(
                (r["span_start"], r["span_end"]))
        assert out == {0: [(4, 12)], 1: [(0, 8)]}
        # hash families agree
        a = sorted(map(tuple, dedup.contaminated_spans(
            span_docs, ref, "text", "doc_id", k=6,
            hash_fn="poly").collect()))
        b = sorted(map(tuple, spans.collect()))
        assert a == b
        with pytest.raises(ValueError):
            dedup.contaminated_spans(span_docs, ref, "text", "doc_id", k=0)

    def test_decontaminate_composed(self, spark, span_docs):
        # end-to-end: block_b is the benchmark; docs 0 and 3 lose it,
        # everything else passes through unchanged
        ref = spark.createDataFrame(
            [(7, "subscribe to our newsletter right now")],
            "doc_id long, text string")
        out = {r["doc_id"]: (r["clean_text"], r["n_removed"])
               for r in dedup.decontaminate(
                   span_docs, ref, "text", "doc_id", k=6).collect()}
        assert out[0] == (
            "unique opening words here all rights reserved contact us "
            "for more information middle filler text", 6)
        assert out[3] == ("some other prefix tokens trailing ending part", 6)
        assert out[1][1] == 0 and out[2][1] == 0

    def test_contaminated_ref_text_col(self, spark, span_docs):
        # benchmark text under a different column name
        ref = spark.createDataFrame(
            [(7, "subscribe to our newsletter right now")],
            "doc_id long, question string")
        spans = dedup.contaminated_spans(span_docs, ref, "text", "doc_id",
                                         k=6, ref_text_col="question")
        got = {(r["doc_id"], r["span_start"], r["span_end"])
               for r in spans.collect()}
        assert got == {(0, 15, 21), (3, 4, 10)}

    def test_ref_grams_precomputed_equivalent(self, spark, span_docs):
        # a persisted build_ref_grams frame must give the same spans as
        # passing the ref corpus directly (the standing-index form the
        # streaming twin reuses per micro-batch); ref then being None is
        # fine, and passing neither raises
        ref = spark.createDataFrame(
            [(7, "subscribe to our newsletter right now")],
            "doc_id long, text string")
        grams = dedup.build_ref_grams(ref, "text", k=6).persist()
        a = sorted(map(tuple, dedup.contaminated_spans(
            span_docs, None, "text", "doc_id", k=6,
            ref_grams=grams).collect()))
        b = sorted(map(tuple, dedup.contaminated_spans(
            span_docs, ref, "text", "doc_id", k=6).collect()))
        grams.unpersist()
        assert a == b and len(a) == 2
        with pytest.raises(ValueError, match="ref"):
            dedup.contaminated_spans(span_docs, None, "text", "doc_id")

    def test_ref_gram_join_not_statically_broadcast(self, spark, span_docs):
        # r14: the ref gram set comes from an explode, whose Catalyst
        # size estimate is ~pre-explode bytes — a parquet-backed ref
        # above the bound must take a shuffle semi-join (broadcasting a
        # 100 TB eval corpus's grams is a driver OOM); a tiny inline
        # ref keeps the broadcast
        import os
        import tempfile
        d = tempfile.mkdtemp()
        p = os.path.join(d, "bigref.parquet")
        spark.range(150_000).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", *[
                F.concat(F.lit(f"w{j}t"), F.col("id").cast("string"))
                for j in range(12)]).alias("text")
        ).write.mode("overwrite").parquet(p)
        bigref = spark.read.parquet(p)
        spans = dedup.contaminated_spans(span_docs, bigref, "text",
                                         "doc_id", k=6)
        plan = spans._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" not in plan, plan[:1500]
        # a tiny FILE-BACKED ref (accurate small estimate) keeps the
        # broadcast; an inline createDataFrame ref reports the
        # unknown-size sentinel and conservatively shuffles — both by
        # design
        p2 = os.path.join(d, "tinyref.parquet")
        spark.createDataFrame(
            [(7, "subscribe to our newsletter right now")],
            "doc_id long, text string").write.mode("overwrite").parquet(p2)
        spans2 = dedup.contaminated_spans(span_docs, spark.read.parquet(p2),
                                          "text", "doc_id", k=6)
        plan2 = spans2._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" in plan2

    def test_persisted_ref_grams_not_statically_broadcast(self, spark,
                                                          span_docs):
        # r15 advisory: a build_ref_grams frame that was merely
        # persist()ed keeps the explode+distinct lineage in its ANALYZED
        # plan (cache substitution happens after analysis), so its
        # stats pass through the pre-explode estimate — the worst-case
        # gram-bytes factor must gate the static broadcast, not the
        # persist. A big parquet-backed ref's PERSISTED gram frame must
        # therefore shuffle; the same grams MATERIALIZED to parquet
        # (accurate small-file estimate when genuinely small) may
        # broadcast.
        import os
        import tempfile
        d = tempfile.mkdtemp()
        p = os.path.join(d, "bigref2.parquet")
        spark.range(150_000).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", *[
                F.concat(F.lit(f"u{j}q"), F.col("id").cast("string"))
                for j in range(12)]).alias("text")
        ).write.mode("overwrite").parquet(p)
        grams = dedup.build_ref_grams(spark.read.parquet(p), "text",
                                      k=6).persist()
        try:
            spans = dedup.contaminated_spans(span_docs, None, "text",
                                             "doc_id", k=6,
                                             ref_grams=grams)
            plan = spans._jdf.queryExecution().executedPlan().toString()
            assert "BroadcastExchange" not in plan, plan[:1500]
        finally:
            grams.unpersist()
        # materialized tiny standing index: accurate scan estimate,
        # broadcast restored
        p3 = os.path.join(d, "tinygrams.parquet")
        dedup.build_ref_grams(
            spark.createDataFrame(
                [(7, "subscribe to our newsletter right now")],
                "doc_id long, text string"),
            "text", k=6).write.mode("overwrite").parquet(p3)
        spans3 = dedup.contaminated_spans(
            span_docs, None, "text", "doc_id", k=6,
            ref_grams=spark.read.parquet(p3))
        plan3 = spans3._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" in plan3

    def test_contamination_report_multi_suite(self, spark):
        # r15: a document overlapping grams from TWO suites is reported
        # under both (the report answers per-suite safety, not distinct
        # dirty tokens); clean docs emit no row
        ref = spark.createDataFrame(
            [("mmlu", "alpha beta gamma delta epsilon zeta"),
             ("gsm", "one two three four five six seven"),
             ("gsm", "alpha beta gamma delta epsilon zeta")],  # shared quote
            "suite string, text string")
        corpus = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta trailing words"),
             (2, "intro one two three four five six seven"),
             (3, "nothing from any benchmark suite in here at all")],
            "doc_id long, text string")
        rows = {(r["doc_id"], r["suite"]):
                (r["n_spans"], r["contaminated_tokens"])
                for r in dedup.contamination_report(
                    corpus, ref, "text", "doc_id", k=6).collect()}
        # doc 1's quote lives in BOTH suites -> two rows
        assert rows[(1, "mmlu")] == (1, 6)
        assert rows[(1, "gsm")] == (1, 6)
        assert rows[(2, "gsm")] == (1, 7)
        assert (2, "mmlu") not in rows
        assert not any(d == 3 for d, _ in rows)

    def test_contamination_stats_and_drop(self, spark):
        # r15: per-doc accounting + the whole-document drop policy.
        # doc 0: fully contaminated (ref quote only); doc 1: half; doc
        # 2: clean. threshold picks survivors; threshold=0 drops ANY
        # flagged doc but keeps clean ones.
        ref = spark.createDataFrame(
            [(0, "alpha beta gamma delta epsilon zeta eta theta")],
            "doc_id long, text string")
        corpus = spark.createDataFrame(
            [(10, "alpha beta gamma delta epsilon zeta eta theta"),
             (11, "alpha beta gamma delta epsilon zeta eta theta "
                  "own words here that are not in the ref at all"),
             (12, "completely clean document nothing shared anywhere")],
            "doc_id long, text string")
        stats = {r["doc_id"]: (r["n_tokens"], r["contaminated_tokens"])
                 for r in dedup.contamination_stats(
                     corpus, ref, "text", "doc_id", k=6).collect()}
        assert stats[10] == (8, 8)
        assert stats[11][0] == 19 and stats[11][1] == 8
        assert stats[12] == (6, 0)
        kept = {r["doc_id"] for r in dedup.decontaminate_drop(
            corpus, ref, "text", "doc_id", threshold=0.5, k=6).collect()}
        assert kept == {11, 12}
        kept0 = {r["doc_id"] for r in dedup.decontaminate_drop(
            corpus, ref, "text", "doc_id", threshold=0.0, k=6).collect()}
        assert kept0 == {12}
        import pytest as _pt
        with _pt.raises(ValueError, match="threshold"):
            dedup.decontaminate_drop(corpus, ref, "text", "doc_id",
                                     threshold=1.5)

    def test_ref_grams_stamp_enforced(self, spark, span_docs, tmp_path):
        # r15: build_ref_grams stamps k/hash_fn as __g column metadata
        # (parquet round-trip preserved); consumers raise on mismatch
        # instead of silently mis-flagging, and unstamped frames pass
        import pytest as _pt
        ref = spark.createDataFrame(
            [(7, "subscribe to our newsletter right now")],
            "doc_id long, text string")
        grams = dedup.build_ref_grams(ref, "text", k=6)
        # matching contract works end-to-end
        ok = dedup.contaminated_spans(span_docs, None, "text", "doc_id",
                                      k=6, ref_grams=grams)
        ok.collect()
        with _pt.raises(ValueError, match="k=6"):
            dedup.contaminated_spans(span_docs, None, "text", "doc_id",
                                     k=7, ref_grams=grams)
        with _pt.raises(ValueError, match="hash_fn"):
            dedup.contaminated_spans(span_docs, None, "text", "doc_id",
                                     k=6, hash_fn="poly", ref_grams=grams)
        # the stamp survives a parquet write/read round-trip
        p = str(tmp_path / "grams.parquet")
        grams.write.mode("overwrite").parquet(p)
        back = spark.read.parquet(p)
        with _pt.raises(ValueError, match="rebuild"):
            dedup.contaminated_spans(span_docs, None, "text", "doc_id",
                                     k=5, ref_grams=back)
        dedup.contaminated_spans(span_docs, None, "text", "doc_id",
                                 k=6, ref_grams=back).collect()
        # hand-built (unstamped) gram frames are accepted unchecked
        hand = grams.select(F.col("__g").cast("long").alias("__g"))
        dedup.contaminated_spans(span_docs, None, "text", "doc_id",
                                 k=7, ref_grams=hand).collect()
        # the streaming twin validates at query SETUP
        from pandas_plus_spark.streaming import decontaminated_stream
        src = str(tmp_path / "src")
        span_docs.limit(1).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(span_docs.schema).parquet(src)
        with _pt.raises(ValueError, match="rebuild"):
            decontaminated_stream(stream, None, "text", "doc_id",
                                  lambda df, bid: None, k=7,
                                  ref_grams=grams)

    def test_excise_spans(self, span_docs):
        spans = dedup.duplicated_spans(span_docs, "text", "doc_id", k=6)
        out = {r["doc_id"]: (r["clean_text"], r["n_removed"])
               for r in dedup.excise_spans(
                   span_docs, spans, "text", "doc_id").collect()}
        assert len(out) == 4
        # doc 0 loses both blocks (8 + 6 tokens), keeps the filler
        assert out[0] == (
            "unique opening words here middle filler text", 14)
        assert out[1] == (
            "and then a totally different continuation follows", 8)
        # unflagged doc passes through byte-identical (not re-tokenized)
        assert out[2] == (
            "nothing here repeats anywhere else in this tiny corpus at all", 0)
        assert out[3] == ("some other prefix tokens trailing ending part", 6)

    def test_excise_empty_spans(self, span_docs):
        no_spans = dedup.duplicated_spans(span_docs, "text", "doc_id",
                                          k=6, min_df=3)
        out = dedup.excise_spans(span_docs, no_spans, "text", "doc_id")
        assert out.filter(F.col("n_removed") != 0).count() == 0
        texts = {r["doc_id"]: r["clean_text"] for r in out.collect()}
        orig = {r["doc_id"]: r["text"] for r in span_docs.collect()}
        assert texts == orig


class TestExactSubstringSpans:
    """Arbitrary-length ExactSubstr spans (r12): winnowing anchors +
    bidirectional extension recover PLANTED shared substrings exactly."""

    def _planted(self, spark, n_pairs=20, min_len=12):
        rows = []
        for i in range(n_pairs):
            m = min_len + i % 7
            planted = [f"p{i}x{j}" for j in range(m)]
            for d in (2 * i, 2 * i + 1):
                toks = ([f"f{d}x{j}" for j in range(3 + d % 5)] + planted
                        + [f"g{d}x{j}" for j in range(4 + d % 3)])
                rows.append((d, " ".join(toks)))
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_planted_spans_recovered_exactly(self, spark):
        docs = self._planted(spark)
        for hf in ("xxhash64", "poly"):
            out = dedup.exact_substring_spans(
                docs, "text", "doc_id", min_len=12, k=6, hash_fn=hf)
            got = {r.doc_id: (r.span_start, r.span_end)
                   for r in out.collect()}
            from pandas_plus_spark.util import release_cached
            release_cached(out)
            assert len(got) == 40, hf
            for i in range(20):
                m = 12 + i % 7
                for d in (2 * i, 2 * i + 1):
                    a = 3 + d % 5
                    assert got[d] == (a, a + m), (hf, d)

    def test_below_min_len_not_flagged(self, spark):
        # an 8-token shared run under min_len=12 must not appear, and
        # neither must a doc with no cross-doc repetition at all
        rows = [
            (0, " ".join([f"a{j}" for j in range(6)]
                         + [f"q{j}" for j in range(8)] + ["t0"])),
            (1, " ".join([f"b{j}" for j in range(3)]
                         + [f"q{j}" for j in range(8)] + ["t1"])),
            (2, " ".join(f"u{j}" for j in range(40))),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = dedup.exact_substring_spans(docs, "text", "doc_id",
                                          min_len=12, k=6)
        assert out.count() == 0

    def test_min_len_boundary_and_three_way(self, spark):
        # exactly min_len tokens shared -> flagged (the winnowing
        # guarantee bound); a run shared by THREE docs flags all three
        run = [f"r{j}" for j in range(12)]
        rows = [(d, " ".join([f"h{d}x{j}" for j in range(2 + d)]
                             + run + [f"e{d}x{j}" for j in range(3)]))
                for d in range(3)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = dedup.exact_substring_spans(docs, "text", "doc_id",
                                          min_len=12, k=6)
        got = {r.doc_id: (r.span_start, r.span_end) for r in out.collect()}
        assert got == {0: (2, 14), 1: (3, 15), 2: (4, 16)}

    def test_overlapping_matches_merge_maximal(self, spark):
        # doc 0 shares its FULL 20-token run; docs 1 and 2 each carry a
        # 14-token half (overlapping by 8 in doc 0) -> doc 0 must report
        # ONE merged maximal span covering the union
        run = [f"s{j}" for j in range(20)]
        rows = [
            (0, " ".join(["z00"] + run + ["z01"])),
            (1, " ".join([f"k1x{j}" for j in range(4)] + run[:14])),
            (2, " ".join(run[6:] + [f"k2x{j}" for j in range(5)])),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = dedup.exact_substring_spans(docs, "text", "doc_id",
                                          min_len=12, k=6)
        got = {r.doc_id: (r.span_start, r.span_end) for r in out.collect()}
        assert got[0] == (1, 21)
        assert got[1] == (4, 18)
        assert got[2] == (0, 14)

    def test_excision_composes(self, spark):
        docs = self._planted(spark, n_pairs=3)
        spans = dedup.exact_substring_spans(docs, "text", "doc_id",
                                            min_len=12, k=6)
        out = {r.doc_id: r.n_removed
               for r in dedup.excise_spans(docs, spans, "text",
                                           "doc_id").collect()}
        for i in range(3):
            m = 12 + i % 7
            assert out[2 * i] == m and out[2 * i + 1] == m

    def test_hot_anchor_recall_via_hub_edges(self, spark):
        """Adversarial hot-anchor fixture (VERDICT r12 item 4): ONE
        boilerplate sentence is every document's only duplicated
        content, so all of the span's anchors land in the SAME oversized
        bucket. The cap alone collapses doc-level recall to ~cap/b
        (measured 7.4% at b=10k/cap=256, BASELINE.md r13); the hub edges
        must keep it at 1.0, with the planted rare pair untouched and no
        false spans anywhere."""
        n = 600
        s_run = [f"b{j}" for j in range(15)]
        rows = []
        for i in range(n):
            toks = ([f"u{i}x{j}" for j in range(5)] + s_run
                    + [f"u{i}y{j}" for j in range(3)])
            if i < 2:  # one planted rare pair, healthy bucket
                toks += [f"p0q{j}" for j in range(14)]
            rows.append((i, " ".join(toks)))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = dedup.exact_substring_spans(
            docs, "text", "doc_id", min_len=12, k=6,
            max_bucket_size=32)
        got = {}
        for r in out.collect():
            got.setdefault(r.doc_id, []).append(
                (r.span_start, r.span_end))
        from pandas_plus_spark.util import release_cached
        release_cached(out)
        assert len(got) == n          # EVERY doc reports the hot span
        for i in range(n):
            want = [(5, 20)]
            if i < 2:
                want.append((23, 37))
            assert sorted(got[i]) == want, i

    def test_validation_and_empty(self, spark):
        docs = spark.createDataFrame([(0, ""), (1, None)],
                                     "doc_id long, text string")
        out = dedup.exact_substring_spans(docs, "text", "doc_id")
        assert out.count() == 0
        assert out.columns == ["doc_id", "span_start", "span_end"]
        with pytest.raises(ValueError):
            dedup.exact_substring_spans(docs, "text", "doc_id",
                                        min_len=4, k=6)
        with pytest.raises(ValueError):
            dedup.exact_substring_spans(docs, "text", "doc_id",
                                        hash_fn="md5")

    def test_random_corpora_match_brute_force(self, spark):
        """Property sweep: on small random corpora over a TINY alphabet
        (dense incidental repeats — the adversarial case for anchor
        selection and interval merge), the operator must equal the
        brute-force union of all maximal cross-doc matching intervals
        of length >= min_len, merged with the same touching rule."""
        import numpy as np

        def brute(docs, min_len):
            marks = {d: [] for d, _ in docs}
            toks = {d: t.split() for d, t in docs}
            for da, ta in toks.items():
                for db, tb in toks.items():
                    if da == db:
                        continue
                    for i in range(len(ta)):
                        for j in range(len(tb)):
                            # maximal: not extendable left
                            if i and j and ta[i - 1] == tb[j - 1]:
                                continue
                            m = 0
                            while (i + m < len(ta) and j + m < len(tb)
                                   and ta[i + m] == tb[j + m]):
                                m += 1
                            if m >= min_len:
                                marks[da].append((i, i + m))
            out = {}
            for d, iv in marks.items():
                merged = []
                for s, e in sorted(set(iv)):
                    if merged and s <= merged[-1][1]:
                        merged[-1] = (merged[-1][0],
                                      max(merged[-1][1], e))
                    else:
                        merged.append((s, e))
                if merged:
                    out[d] = merged
            return out

        rng = np.random.RandomState(29)
        min_len = 12
        for case in range(6):
            n_docs, length = 6, 40 + 5 * case
            alpha = 6 + case % 3
            rows = []
            for d in range(n_docs):
                t = [f"w{rng.randint(alpha)}" for _ in range(length)]
                rows.append((d, " ".join(t)))
            # plant one guaranteed long run in a random doc pair
            src, dst = (int(x) for x in
                        rng.choice(n_docs, 2, replace=False))
            run = rows[src][1].split()[5:5 + min_len + 3]
            td = rows[dst][1].split()
            pos = rng.randint(len(td) - len(run))
            td[pos:pos + len(run)] = run
            rows[dst] = (dst, " ".join(td))
            df = spark.createDataFrame(rows, "doc_id long, text string")
            out = dedup.exact_substring_spans(
                df, "text", "doc_id", min_len=min_len, k=6)
            got = {}
            for r in out.collect():
                got.setdefault(r.doc_id, []).append(
                    (r.span_start, r.span_end))
            release_cached_ = __import__(
                "pandas_plus_spark.util", fromlist=["release_cached"]
            ).release_cached
            release_cached_(out)
            got = {d: sorted(v) for d, v in got.items()}
            assert got == brute(rows, min_len), f"case {case}"


class TestPerceptualHash:
    """REAL BMP pixel decode + aHash/dHash + banded Hamming pairs."""

    def test_decode_pins_spec_details(self):
        """Asymmetric pattern pins bottom-up row order, BGR order and
        stride padding (W=5 -> 16-byte rows); the top-down variant must
        decode identically."""
        import numpy as np
        from pandas_plus_spark.operators.multimodal import (
            bmp_pixel_bytes, decode_bmp_pixels)

        def fn(x, y):
            return ((7 * x + 13 * y + 3) % 256, (x + 1) % 256, (y + 2) % 256)

        px = decode_bmp_pixels(bmp_pixel_bytes(5, 3, fn))
        assert px.shape == (3, 5, 3)
        for y in range(3):
            for x in range(5):
                assert tuple(px[y, x]) == fn(x, y), (x, y)
        px2 = decode_bmp_pixels(bmp_pixel_bytes(5, 3, fn, top_down=True))
        assert (px2 == px).all()

    def test_decode_rejects_non_pixel_bmps(self):
        from pandas_plus_spark.operators.multimodal import (
            bmp_header_bytes, decode_bmp_pixels)
        # header-only fixture (no pixel data) must return None, not junk
        assert decode_bmp_pixels(bmp_header_bytes(10, 10)) is None
        assert decode_bmp_pixels(b"BM" + bytes(20)) is None
        assert decode_bmp_pixels(b"nope") is None

    def test_hashes_brightness_invariant_and_sensitive(self):
        from pandas_plus_spark.operators.multimodal import (
            ahash64, bmp_pixel_bytes, decode_bmp_pixels, dhash64)

        def grad(c):
            return lambda x, y: (((3 * x + 5 * y) % 200 + c),) * 3

        base = decode_bmp_pixels(bmp_pixel_bytes(32, 20, grad(10)))
        shifted = decode_bmp_pixels(bmp_pixel_bytes(32, 20, grad(50)))
        assert ahash64(base) == ahash64(shifted)
        assert dhash64(base) == dhash64(shifted)
        flipped = decode_bmp_pixels(bmp_pixel_bytes(
            32, 20, lambda x, y: (((3 * (31 - x) + 5 * y) % 200 + 10),) * 3))
        assert dhash64(base) != dhash64(flipped)
        # signed 64-bit range
        for h in (ahash64(base), dhash64(base)):
            assert -(1 << 63) <= h < (1 << 63)

    def test_hamming_pairs(self, spark):
        from pandas_plus_spark.operators.dedup import hamming_pairs
        rows = [
            (1, 0x0F0F0F0F0F0F0F0F),
            (2, 0x0F0F0F0F0F0F0F0E),   # distance 1 from id 1
            (3, -1),                    # 0xFFFF... distance 32 from id 1
            (4, None),                  # undecodable: excluded
            (5, 0x0F0F0F0F0F0F0F0F),   # identical to id 1
        ]
        df = spark.createDataFrame(rows, "id long, h long")
        got = {(r.id_a, r.id_b): r.hamming
               for r in hamming_pairs(df, "h", "id", max_dist=6).collect()}
        assert got == {(1, 2): 1, (1, 5): 0, (2, 5): 1}

    def test_png_pixel_roundtrip_all_filters(self):
        """decode_png_pixels reconstructs the EXACT source pixels through
        zlib + each of the five PNG filter types, for RGB/RGBA/gray."""
        import numpy as np

        from pandas_plus_spark.operators.multimodal import (
            decode_png_pixels, png_pixel_bytes)
        rng = np.random.default_rng(11)
        arr = rng.integers(0, 256, size=(13, 9, 3))

        def fn(x, y):
            return tuple(int(v) for v in arr[y, x])

        for filt in (0, 1, 2, 3, 4, None):      # None cycles all five
            px = decode_png_pixels(png_pixel_bytes(9, 13, fn, filters=filt))
            assert (px == arr).all(), filt
        # RGBA decodes to RGB (alpha dropped); gray replicates channels
        assert (decode_png_pixels(
            png_pixel_bytes(9, 13, fn, color_type=6, filters=4)) == arr).all()
        gray = (arr.astype(np.int64).sum(axis=2) // 3)[:, :, None]
        assert (decode_png_pixels(
            png_pixel_bytes(9, 13, fn, color_type=0, filters=3))
            == gray.repeat(3, 2)).all()

    def test_png_rejects_unsupported(self):
        from pandas_plus_spark.operators.multimodal import (
            decode_png_pixels, png_header_bytes)
        assert decode_png_pixels(None) is None
        assert decode_png_pixels(b"nope") is None
        assert decode_png_pixels(b"\x89PNG\r\n\x1a\njunkjunk") is None
        # header-only fixture (no IDAT) is not pixel-decodable
        assert decode_png_pixels(png_header_bytes(8, 8)) is None

    def test_png_bmp_same_pixels_same_hashes(self):
        """The two REAL pixel paths agree: the same pixel function
        encoded as BMP and as PNG decodes to identical arrays and
        identical perceptual hashes — so PNG copies dedup against BMP
        originals at Hamming distance 0."""
        from pandas_plus_spark.operators.multimodal import (
            ahash64, bmp_pixel_bytes, decode_bmp_pixels,
            decode_image_pixels, dhash64, png_pixel_bytes)

        def grad(x, y):
            v = (3 * x + 5 * y) % 200 + 10
            return (v, v, v)

        b = decode_bmp_pixels(bmp_pixel_bytes(32, 20, grad))
        p = decode_image_pixels(png_pixel_bytes(32, 20, grad))
        assert (b == p).all()
        assert ahash64(b) == ahash64(p)
        assert dhash64(b) == dhash64(p)

    def test_avi_walk_roundtrip(self):
        """decode_avi_frames returns the EXACT frame payload boundaries
        through the RIFF list tree, including odd-size word alignment."""
        from pandas_plus_spark.operators.multimodal import (
            avi_mjpeg_bytes, decode_avi_frames, jpeg_header_bytes)
        frames = [jpeg_header_bytes(32, 24) + b"x" * (i % 3)
                  for i in range(5)]
        blob = avi_mjpeg_bytes(32, 24, frames, us_per_frame=40000)
        got = decode_avi_frames(blob)
        assert (got["width"], got["height"]) == (32, 24)
        assert got["n_frames"] == 5 and got["us_per_frame"] == 40000
        for (off, sz), f in zip(got["frames"], frames):
            assert blob[off:off + sz] == f
        assert decode_avi_frames(b"RIFFxxxxWAVE") is None
        assert decode_avi_frames(None) is None

    def test_sample_avi_frames_sparkside(self, spark):
        """sample_avi_frames: true frame boundaries, evenly spaced
        schedule, real JPEG dims from the extracted payload, hex-md5
        signature; undecodable blobs dropped."""
        import hashlib

        import pandas as pd

        from pandas_plus_spark.operators.multimodal import (
            avi_mjpeg_bytes, jpeg_header_bytes, sample_avi_frames)
        frames = [jpeg_header_bytes(160, 120) + f"f{i}".encode()
                  for i in range(7)]
        blob = avi_mjpeg_bytes(160, 120, frames)
        df = spark.createDataFrame(
            pd.DataFrame({"id": [1, 2], "blob": [blob, b"junk"]}))
        rows = {r.frame_idx: r for r in
                sample_avi_frames(df, "blob", "id", n_frames=3).collect()}
        assert set(rows) == {0, 3, 6}          # floor(i*6/2)
        for fi, r in rows.items():
            assert r.id == 1
            assert (r.jpeg_width, r.jpeg_height) == (160, 120)
            assert r.n_bytes == len(frames[fi])
            assert blob[r.byte_offset:r.byte_offset + r.n_bytes] == frames[fi]
            assert r.frame_sig == hashlib.md5(
                frames[fi].hex().upper().encode()).hexdigest()

    def test_gif_pixel_roundtrip(self):
        """decode_gif_pixels reconstructs the EXACT source pixels through
        the variable-width LZW stream (dictionary growth, KwKwK,
        sub-block framing) for both scan orders."""
        import numpy as np

        from pandas_plus_spark.operators.multimodal import (
            decode_gif_pixels, gif_pixel_bytes)
        rng = np.random.default_rng(13)
        vals = rng.integers(0, 256, size=11)
        arr = np.array(vals[rng.integers(0, 11, size=(17, 9))],
                       dtype=np.uint8)
        arr3 = np.stack([arr, (arr * 3) % 256, 255 - arr], axis=2)

        def fn(x, y):
            return tuple(int(v) for v in arr3[y, x])

        for interlace in (False, True):
            px = decode_gif_pixels(
                gif_pixel_bytes(9, 17, fn, interlace=interlace))
            assert (px == arr3).all(), interlace
        # large image: width escalation past the initial code size
        big = (np.add.outer(np.arange(60) * 7,
                            np.arange(70) * 13) % 251).astype(np.uint8)
        px = decode_gif_pixels(gif_pixel_bytes(
            70, 60, lambda x, y: (int(big[y, x]),) * 3))
        assert (px[:, :, 0] == big).all()

    def test_gif_rejects(self):
        from pandas_plus_spark.operators.multimodal import (
            decode_gif_pixels, gif_header_bytes)
        assert decode_gif_pixels(None) is None
        assert decode_gif_pixels(b"GIF8") is None
        assert decode_gif_pixels(b"notagif.........") is None
        # header-only fixture (no image data) is not pixel-decodable
        assert decode_gif_pixels(gif_header_bytes(8, 8)) is None

    def test_gif_bmp_same_pixels_same_hashes(self):
        from pandas_plus_spark.operators.multimodal import (
            ahash64, bmp_pixel_bytes, decode_bmp_pixels,
            decode_image_pixels, dhash64, gif_pixel_bytes)

        def grad(x, y):
            v = (3 * x + 5 * y) % 200 + 10
            return (v, v, v)

        b = decode_bmp_pixels(bmp_pixel_bytes(32, 20, grad))
        g = decode_image_pixels(gif_pixel_bytes(32, 20, grad,
                                                interlace=True))
        assert (b == g).all()
        assert ahash64(b) == ahash64(g) and dhash64(b) == dhash64(g)

    def test_hamming_pairs_recall_contract(self, spark):
        """Distance 4-6 pairs whose differing bits touch EVERY 16-bit band
        must still be found: the default banding derives from max_dist
        (7 bands of 9 bits for max_dist=6), so by pigeonhole one band is
        clean. The old fixed 16-bit banding (4 bands) missed these."""
        import warnings

        from pandas_plus_spark.operators.dedup import hamming_pairs
        # 5 differing bits, at least one in each 16-bit quadrant
        h2 = (1 << 2) | (1 << 18) | (1 << 34) | (1 << 50) | (1 << 60)
        df = spark.createDataFrame([(1, 0), (2, h2)], "id long, h long")
        got = {(r.id_a, r.id_b): r.hamming
               for r in hamming_pairs(df, "h", "id", max_dist=6).collect()}
        assert got == {(1, 2): 5}
        # explicit under-banding warns and (here) misses the pair
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            lossy = hamming_pairs(df, "h", "id", max_dist=6,
                                  band_bits=16).collect()
        assert any("guarantee recall" in str(x.message) for x in w)
        assert lossy == []

    def test_extract_hashes_sparkside(self, spark):
        import pandas as pd
        from pandas_plus_spark.operators.multimodal import (
            ahash64, bmp_pixel_bytes, decode_bmp_pixels, dhash64,
            extract_perceptual_hashes)
        blob = bmp_pixel_bytes(16, 12, lambda x, y: ((x * y) % 251,) * 3)
        df = spark.createDataFrame(
            pd.DataFrame({"id": [1, 2], "blob": [blob, b"junk"]}))
        got = {r.id: (r.ahash, r.dhash) for r in
               extract_perceptual_hashes(df, "blob", "id").collect()}
        px = decode_bmp_pixels(blob)
        assert got[1] == (ahash64(px), dhash64(px))
        assert got[2] == (None, None)


class TestJpegCodec:
    """REAL baseline JPEG: encoder fixtures, full entropy decode, and the
    independence checks that pin the codec to the public spec rather than
    to itself (hardcoded zigzag, test-side IDCT)."""

    # ITU-T T.81 Figure A.6, transcribed as a literal so the module's
    # derived walk is checked against the spec, not against itself.
    SPEC_ZIGZAG = [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]

    def test_zigzag_matches_spec_table(self):
        from pandas_plus_spark.operators.multimodal import _JPEG_ZZ
        got = [r * 8 + c for r, c in _JPEG_ZZ]
        assert got == self.SPEC_ZIGZAG

    def test_block_constant_roundtrip_exact_all_modes(self):
        """Gray-valued images constant within each 8x8 block roundtrip
        bit-exactly (quantized DC = v - 128 under the flat table; chroma
        is exactly 128 so 4:2:0 subsampling is lossless too)."""
        import numpy as np
        from pandas_plus_spark.operators.multimodal import (
            decode_jpeg_pixels, jpeg_pixel_bytes)

        def fn(x, y):
            v = (5 * 8 * (x // 8) + 3 * 8 * (y // 8)) % 200 + 10
            return (v, v, v)

        exp = np.array([[fn(x, y) for x in range(32)] for y in range(20)],
                       dtype=np.uint8)
        for mode in ("gray", "444", "420"):
            px = decode_jpeg_pixels(jpeg_pixel_bytes(32, 20, fn, mode=mode))
            assert px is not None and (px == exp).all(), mode

    def test_restart_markers_roundtrip(self):
        """DRI + RSTn: byte-aligned padding, marker sequence n mod 8,
        DC predictor reset — all exercised by a 4x3-block gray image
        with a 2-MCU restart interval."""
        import numpy as np
        from pandas_plus_spark.operators.multimodal import (
            decode_jpeg_pixels, jpeg_pixel_bytes)

        def fn(x, y):
            v = (40 * (x // 8) + 24 * (y // 8)) % 230 + 10
            return (v, v, v)

        exp = np.array([[fn(x, y)[0] for x in range(32)]
                        for y in range(24)], dtype=np.uint8)
        blob = jpeg_pixel_bytes(32, 24, fn, mode="gray",
                                restart_interval=2)
        assert blob.count(b"\xff\xd0") >= 1      # markers actually present
        px = decode_jpeg_pixels(blob)
        assert px is not None and (px[:, :, 0] == exp).all()

    def test_coefficient_level_against_independent_idct(self):
        """Random quantized coefficients -> encoder entropy stream ->
        decoder, compared against an IDCT computed HERE with explicit
        cosine loops (no shared matrix helper): a Huffman, zigzag,
        EXTEND-sign, ZRL/EOB, dequant or stuffing bug in either
        direction breaks the equality."""
        import math

        import numpy as np
        from pandas_plus_spark.operators.multimodal import (
            JPEG_QUANT_FLAT, decode_jpeg_pixels, jpeg_from_quantized)
        rng = np.random.RandomState(42)
        blocks = rng.randint(-70, 70, size=(6, 64))
        blocks[:, 0] = rng.randint(-120, 120, size=6)
        blocks[0, 1:] = 0                        # DC-only block (pure EOB)
        blocks[1, 1:40] = 0                      # long zero run (ZRL path)
        blob = jpeg_from_quantized([list(b) for b in blocks], 3, 2)
        px = decode_jpeg_pixels(blob)
        assert px is not None and px.shape == (16, 24, 3)

        def cu(u):
            return math.sqrt(0.5) if u == 0 else 1.0

        for bi, coef in enumerate(blocks):
            by, bx = divmod(bi, 3)
            S = np.zeros((8, 8))
            for j, zz in enumerate(self.SPEC_ZIGZAG):
                S[zz // 8][zz % 8] = coef[j] * JPEG_QUANT_FLAT[j]
            # T.81 A.3.3: s_yx = 1/4 sum_u sum_v C(u)C(v) S_vu
            #   cos((2x+1)u pi/16) cos((2y+1)v pi/16)
            # u = horizontal frequency = S's COLUMN index, pairs with x.
            for y in range(8):
                for x in range(8):
                    acc = 0.0
                    for u in range(8):
                        for v in range(8):
                            acc += (cu(u) * cu(v) * S[v][u]
                                    * math.cos((2 * x + 1) * u
                                               * math.pi / 16)
                                    * math.cos((2 * y + 1) * v
                                               * math.pi / 16))
                    want = min(max(round(acc / 4 + 128), 0), 255)
                    assert px[by * 8 + y, bx * 8 + x, 0] == want, (bi, y, x)

    def test_byte_stuffing_occurs_and_decodes(self):
        """Coefficient patterns that force 0xFF bytes into the entropy
        stream must be stuffed (FF 00) and decode back exactly."""
        import numpy as np
        from pandas_plus_spark.operators.multimodal import (
            decode_jpeg_pixels, jpeg_from_quantized)
        rng = np.random.RandomState(3)
        found = False
        for trial in range(30):
            blocks = rng.randint(-200, 200, size=(4, 64))
            blob = jpeg_from_quantized([list(b) for b in blocks], 2, 2)
            scan = blob[blob.rindex(b"\xff\xda"):]
            if b"\xff\x00" in scan:
                found = True
                assert decode_jpeg_pixels(blob) is not None
        assert found

    def test_lossy_roundtrip_bounded_and_rejects(self):
        """Smooth non-block-constant images survive the default table
        within quantization error; progressive/truncated/header-only
        streams return None instead of junk."""
        import math

        import numpy as np
        from pandas_plus_spark.operators.multimodal import (
            decode_jpeg_pixels, jpeg_header_bytes, jpeg_pixel_bytes)

        def smooth(x, y):
            v = int(128 + 100 * math.sin(x / 5.0) * math.cos(y / 7.0))
            return (v, v, v)

        blob = jpeg_pixel_bytes(40, 24, smooth, mode="420")
        px = decode_jpeg_pixels(blob)
        exp = np.array([[smooth(x, y)[0] for x in range(40)]
                        for y in range(24)], dtype=np.float64)
        assert np.abs(px[:, :, 0].astype(float) - exp).max() <= 24
        assert decode_jpeg_pixels(None) is None
        assert decode_jpeg_pixels(b"\xff\xd8\xff\xd9") is None
        # header-only fixture (no scan) and progressive SOF2 both bail
        assert decode_jpeg_pixels(jpeg_header_bytes(16, 16)) is None
        assert decode_jpeg_pixels(
            jpeg_header_bytes(16, 16, progressive=True)) is None
        assert decode_jpeg_pixels(blob[:len(blob) // 2]) is None

    def test_jpeg_bmp_same_pixels_same_hashes(self):
        """The fourth REAL pixel path agrees with the other three on
        block-constant content: BMP/PNG/GIF/JPEG encodings of the same
        snapped gradient produce identical arrays and hashes — the
        property the extended image_phash_dedup gate value-checks."""
        from pandas_plus_spark.operators.multimodal import (
            ahash64, bmp_pixel_bytes, decode_bmp_pixels,
            decode_image_pixels, dhash64, jpeg_pixel_bytes)

        def grad(x, y):
            v = (3 * 8 * (x // 8) + 5 * 8 * (y // 8)) % 200 + 10
            return (v, v, v)

        b = decode_bmp_pixels(bmp_pixel_bytes(32, 20, grad))
        for mode in ("gray", "444", "420"):
            j = decode_image_pixels(jpeg_pixel_bytes(32, 20, grad,
                                                     mode=mode))
            assert (b == j).all(), mode
            assert ahash64(b) == ahash64(j) and dhash64(b) == dhash64(j)


class TestMp4FrameWalk:
    """REAL MP4 frame sampling: stsz/stco/stsc sample-table arithmetic."""

    def test_mp4_walk_roundtrip_exact(self):
        """decode_mp4_frames returns the EXACT frame payload boundaries
        through the sample tables, for variable-size frames and every
        chunking shape (1-per-chunk, all-in-one, ragged trailing run)."""
        from pandas_plus_spark.operators.multimodal import (
            decode_mp4_frames, jpeg_header_bytes, mp4_mjpeg_bytes)
        frames = [jpeg_header_bytes(64, 48) + b"x" * (i % 5)
                  for i in range(7)]
        for spc in (1, 3, 4, 7, 100):
            blob = mp4_mjpeg_bytes(64, 48, frames, samples_per_chunk=spc)
            got = decode_mp4_frames(blob)
            assert (got["width"], got["height"]) == (64, 48), spc
            assert got["n_frames"] == 7
            assert got["us_per_frame"] == 40000   # 40 ticks @ 1000 Hz
            for (off, sz), f in zip(got["frames"], frames):
                assert blob[off:off + sz] == f, spc

    def test_mp4_walk_rejects(self):
        from pandas_plus_spark.operators.multimodal import (
            decode_mp4_frames, decode_video_frames, mp4_header_bytes)
        assert decode_mp4_frames(None) is None
        assert decode_mp4_frames(b"0123456789abcdef") is None
        # header-only fixture (moov without mdia/stbl) has no sample
        # tables -> not frame-walkable
        assert decode_mp4_frames(mp4_header_bytes(64, 48, 1000)) is None
        assert decode_video_frames(b"RIFF\x04\x00\x00\x00WAVE") is None


    def test_mp4_co64_and_fixed_stsz_variants(self):
        """The walker reads both chunk-offset widths (stco/co64) and
        both stsz forms (per-sample list / constant sample size)."""
        import pytest

        from pandas_plus_spark.operators.multimodal import (
            decode_mp4_frames, jpeg_header_bytes, mp4_mjpeg_bytes)
        frames = [jpeg_header_bytes(32, 24) + b"PAY-%02d" % i
                  for i in range(6)]                  # equal 45-byte frames
        for kw in ({"wide_offsets": True}, {"fixed_size_stsz": True},
                   {"wide_offsets": True, "fixed_size_stsz": True}):
            blob = mp4_mjpeg_bytes(32, 24, frames, **kw)
            got = decode_mp4_frames(blob)
            assert got is not None and got["n_frames"] == 6, kw
            for (off, sz), f in zip(got["frames"], frames):
                assert blob[off:off + sz] == f, kw
        ragged = [jpeg_header_bytes(32, 24) + b"x" * i for i in range(3)]
        with pytest.raises(ValueError):
            mp4_mjpeg_bytes(32, 24, ragged, fixed_size_stsz=True)

    def test_sample_video_frames_dispatches_both_containers(self, spark):
        """One sample_video_frames call over a mixed AVI + MP4 + junk
        frame: both real walks engage, schedules and signatures match,
        junk contributes no rows."""
        import hashlib

        import pandas as pd

        from pandas_plus_spark.operators.multimodal import (
            avi_mjpeg_bytes, jpeg_header_bytes, mp4_mjpeg_bytes,
            sample_video_frames)
        frames = [jpeg_header_bytes(160, 120) + f"f{i}".encode()
                  for i in range(7)]
        avi = avi_mjpeg_bytes(160, 120, frames)
        mp4 = mp4_mjpeg_bytes(160, 120, frames)
        df = spark.createDataFrame(pd.DataFrame(
            {"id": [1, 2, 3], "blob": [avi, mp4, b"junk" * 5]}))
        rows = [(r.id, r.frame_idx, r.byte_offset) for r in
                sample_video_frames(df, "blob", "id", n_frames=3)
                .orderBy("id", "frame_idx").collect()]
        assert [r[0] for r in rows] == [1, 1, 1, 2, 2, 2]
        assert [r[1] for r in rows] == [0, 3, 6, 0, 3, 6]
        got = {(r.id, r.frame_idx): r for r in
               sample_video_frames(df, "blob", "id", n_frames=3).collect()}
        for src, blob in ((1, avi), (2, mp4)):
            for fi in (0, 3, 6):
                r = got[(src, fi)]
                payload = blob[r.byte_offset:r.byte_offset + r.n_bytes]
                assert payload == frames[fi]
                assert (r.jpeg_width, r.jpeg_height) == (160, 120)
                assert r.frame_sig == hashlib.md5(
                    payload.hex().upper().encode()).hexdigest()


class TestJpegProgressive:
    """Progressive (SOF2) JPEG: spectral selection + successive
    approximation, both directions. The load-bearing property: the
    progressive form re-encodes the SAME quantized coefficients, so its
    decode must be BIT-IDENTICAL to the baseline decode — any EOB-run,
    correction-bit, point-transform or scan-script bug breaks equality."""

    def test_block_constant_exact_all_modes(self):
        import numpy as np
        from pandas_plus_spark.operators.multimodal import (
            decode_jpeg_pixels, jpeg_pixel_bytes)

        def fn(x, y):
            v = (5 * 8 * (x // 8) + 3 * 8 * (y // 8)) % 200 + 10
            return (v, v, v)

        exp = np.array([[fn(x, y) for x in range(32)] for y in range(20)],
                       dtype=np.uint8)
        for mode in ("gray", "444", "420"):
            px = decode_jpeg_pixels(jpeg_pixel_bytes(
                32, 20, fn, mode=mode, progressive=True))
            assert px is not None and (px == exp).all(), mode

    def test_coefficient_fuzz_progressive_equals_baseline(self):
        """Random sparse/dense coefficient blocks: the progressive
        stream must decode to exactly the baseline pixels (EOB runs
        spanning blocks, ZRL-with-correction-bits, newly-significant
        insertion, negative DC refinement all covered by the draws)."""
        import numpy as np
        from pandas_plus_spark.operators.multimodal import (
            decode_jpeg_pixels, jpeg_from_quantized)
        rng = np.random.RandomState(99)
        for trial in range(15):
            by, bx = rng.randint(1, 5), rng.randint(1, 5)
            blocks = rng.randint(-300, 300, size=(by * bx, 64))
            blocks = blocks * (rng.rand(by * bx, 64) < rng.rand())
            base = decode_jpeg_pixels(jpeg_from_quantized(
                [list(b) for b in blocks], bx, by))
            prog = decode_jpeg_pixels(jpeg_from_quantized(
                [list(b) for b in blocks], bx, by, progressive=True))
            assert prog is not None and (prog == base).all(), trial

    def test_pixel_images_all_modes_odd_dims(self):
        """Noise images at non-8-multiple dims: the non-interleaved
        component grids (ceil of COMPONENT dims, not the MCU-padded
        store grid) must line up between encoder and decoder."""
        import numpy as np
        from pandas_plus_spark.operators.multimodal import (
            decode_jpeg_pixels, jpeg_pixel_bytes)
        rng = np.random.RandomState(5)
        arr = rng.randint(0, 256, size=(21, 13, 3))

        def fn(x, y):
            return tuple(int(v) for v in arr[y, x])

        for mode in ("gray", "444", "420"):
            b1 = decode_jpeg_pixels(jpeg_pixel_bytes(13, 21, fn, mode=mode))
            b2 = decode_jpeg_pixels(jpeg_pixel_bytes(
                13, 21, fn, mode=mode, progressive=True))
            assert b2 is not None and (b1 == b2).all(), mode

    def test_progressive_is_sof2_and_restart_rejected(self):
        from pandas_plus_spark.operators.multimodal import jpeg_pixel_bytes
        import pytest

        blob = jpeg_pixel_bytes(16, 16, lambda x, y: (50, 50, 50),
                                progressive=True)
        assert b"\xff\xc2" in blob and b"\xff\xc0" not in blob
        assert blob.count(b"\xff\xda") >= 6       # multi-scan script
        with pytest.raises(ValueError):
            jpeg_pixel_bytes(16, 16, lambda x, y: (0, 0, 0),
                             progressive=True, restart_interval=2)



class TestDecodeRobustness:
    """Decoders run inside mapInPandas over UNTRUSTED corpus bytes — an
    uncaught exception kills the Spark task and a corrupt size field
    must not become a memory bomb. Contract: every decode returns a
    value or None, never raises, and never allocates from unvalidated
    declared dimensions."""

    def test_mutation_fuzz_never_raises(self):
        import numpy as np

        from pandas_plus_spark.operators import multimodal as mm

        def fn(x, y):
            v = (3 * x + 5 * y) % 200 + 10
            return (v, v, v)

        from pandas_plus_spark.operators.pdftext import (extract_pdf_text,
                                                         pdf_bytes)
        pdf_pages = [["Doc 1 page 0 line 0", "see (ref 1) \\ end"],
                     ["second page line", "more"]]
        seeds = [
            mm.bmp_pixel_bytes(16, 12, fn),
            mm.png_pixel_bytes(16, 12, fn),
            mm.gif_pixel_bytes(16, 12, fn),
            mm.jpeg_pixel_bytes(16, 12, fn, mode="420"),
            mm.jpeg_pixel_bytes(16, 12, fn, mode="444", progressive=True),
            mm.avi_mjpeg_bytes(32, 24, [mm.jpeg_header_bytes(32, 24)
                                        for _ in range(4)]),
            mm.mp4_mjpeg_bytes(32, 24, [mm.jpeg_header_bytes(32, 24)
                                        for _ in range(4)]),
            mm.wav_header_bytes(8000, 1, 16, 100),
            # r12: the PDF extractor walks far more attacker-controlled
            # structure now (object graph, font dicts, CMap streams)
            pdf_bytes(pdf_pages),
            pdf_bytes(pdf_pages, tounicode="bytes1"),
            pdf_bytes(pdf_pages, tounicode="wide2"),
        ]
        rng = np.random.RandomState(7)
        for seed in seeds:
            for t in range(60):
                b = bytearray(seed)
                for _ in range(rng.randint(1, 8)):
                    b[rng.randint(len(b))] = rng.randint(256)
                if t % 3 == 0:
                    b = b[:rng.randint(1, len(b) + 1)]
                blob = bytes(b)
                mm.decode_image_pixels(blob)      # must not raise
                mm.decode_video_frames(blob)
                mm.decode_wav_header(blob)
                mm.decode_image_header(blob)
                extract_pdf_text(blob)

    def test_fractional_subsampling_rejected_not_crashed(self):
        """r12 advisor fix: spec-legal non-integer sampling ratios
        (Y=3x3 with C=2x2) previously crashed _jpeg_render with a numpy
        broadcast error mid-mapInPandas; libjpeg rejects fractional
        sampling, and so do we — decode returns None, never raises."""
        from pandas_plus_spark.operators import multimodal as mm
        blob = bytearray(mm.jpeg_pixel_bytes(
            24, 24, lambda x, y: (60, 60, 60), mode="420"))
        i = blob.index(b"\xff\xc0")
        blob[i + 11] = 0x33                      # Y sampling 3x3
        blob[i + 14] = 0x22                      # Cb 2x2
        blob[i + 17] = 0x22                      # Cr 2x2
        assert mm.decode_jpeg_pixels(bytes(blob)) is None
        assert mm.decode_image_pixels(bytes(blob)) is None

    def test_declared_size_bombs_rejected(self):
        """A 65500x65500 SOF or a 2^31-sample fixed stsz must return
        None fast instead of allocating gigabytes."""
        import time

        from pandas_plus_spark.operators import multimodal as mm
        jb = bytearray(mm.jpeg_pixel_bytes(
            16, 12, lambda x, y: (9, 9, 9), mode="420"))
        i = jb.index(b"\xff\xc0")
        jb[i + 5:i + 9] = (65500).to_bytes(2, "big") * 2
        t0 = time.perf_counter()
        assert mm.decode_jpeg_pixels(bytes(jb)) is None
        m4 = bytearray(mm.mp4_mjpeg_bytes(
            32, 24, [mm.jpeg_header_bytes(32, 24)] * 4,
            fixed_size_stsz=True))
        i = m4.index(b"stsz")
        m4[i + 12:i + 16] = (0x7FFFFFFF).to_bytes(4, "big")
        assert mm.decode_mp4_frames(bytes(m4)) is None
        assert time.perf_counter() - t0 < 1.0


class TestPcmWidths:
    """decode_wav_pcm across every self-describing PCM width (r11 —
    previously 16-bit only), plus the WAVE_FORMAT_EXTENSIBLE wrapper."""

    def test_all_widths_roundtrip_exact(self):
        import numpy as np

        from pandas_plus_spark.operators.multimodal import (
            decode_wav_pcm, wav_pcm_bytes)
        i = np.arange(216)
        cases = [
            ((i * 5 + 103) % 256 - 128, dict(bits=8), "int16"),
            ((i * 7) % 3000 - 1500, dict(bits=16), "int16"),
            ((i * 4 * 997) % (2 * 104144) - 104144, dict(bits=24),
             "int32"),                           # beyond 16-bit range
            (np.where((i // 9) % 2 == 0, 50000130, -50000130),
             dict(bits=32), "int32"),
            (((i * 5) % 129) / 64.0 - 1.0, dict(bits=32, float_fmt=True),
             "float64"),
            (((i * 3) % 129) / 64.0 - 1.0, dict(bits=64, float_fmt=True),
             "float64"),
        ]
        for s, kw, dt in cases:
            arr, sr = decode_wav_pcm(wav_pcm_bytes(8000, s, **kw))
            assert sr == 8000 and str(arr.dtype) == dt, kw
            assert (arr[:, 0] == s).all(), kw

    def test_extensible_wrapper_and_rejects(self):
        """WAVE_FORMAT_EXTENSIBLE (0xFFFE) resolves the effective code
        from the SubFormat GUID head; compressed formats and truncated
        payloads return None."""
        import numpy as np

        from pandas_plus_spark.operators.multimodal import (
            decode_wav_pcm, wav_header_bytes, wav_pcm_bytes)
        i = np.arange(64)
        s = (i * 7) % 2000 - 1000
        base = wav_pcm_bytes(16000, s, bits=16)
        # rebuild with an extensible fmt chunk (16 base + 24 extension)
        ext = (b"fmt " + (40).to_bytes(4, "little")
               + (0xFFFE).to_bytes(2, "little")
               + (1).to_bytes(2, "little") + (16000).to_bytes(4, "little")
               + (32000).to_bytes(4, "little") + (2).to_bytes(2, "little")
               + (16).to_bytes(2, "little")
               + (22).to_bytes(2, "little") + (16).to_bytes(2, "little")
               + (4).to_bytes(4, "little")
               + (1).to_bytes(2, "little")      # SubFormat head: PCM
               + b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71")
        data = b"data" + (128).to_bytes(4, "little") \
            + base[-128:]
        body = b"WAVE" + ext + data
        blob = b"RIFF" + len(body).to_bytes(4, "little") + body
        arr, sr = decode_wav_pcm(blob)
        assert sr == 16000 and (arr[:, 0] == s).all()
        # compressed format code (e.g. 85 = MP3) -> None
        mp3ish = bytearray(base)
        mp3ish[20:22] = (85).to_bytes(2, "little")
        assert decode_wav_pcm(bytes(mp3ish)) is None
        # declared frames but no payload (the gate's every-11th doc)
        assert decode_wav_pcm(wav_header_bytes(8000, 1, 8, 16)) is None

    def test_extractor_float_and_wide_paths(self, spark):
        """Float PCM flows through the float64 path (fractional peak);
        32-bit int stays on the exact int64 path."""
        import numpy as np
        import pandas as pd

        from pandas_plus_spark.operators.multimodal import (
            extract_audio_pcm_features, wav_pcm_bytes)
        i = np.arange(128)
        sf = ((i * 5) % 129) / 64.0 - 1.0
        si = np.where((i // 4) % 2 == 0, 50000000, -50000000)
        df = spark.createDataFrame(pd.DataFrame({
            "id": [1, 2],
            "blob": [wav_pcm_bytes(8000, sf, bits=32, float_fmt=True),
                     wav_pcm_bytes(8000, si, bits=32)]}))
        rows = {r.id: r for r in
                extract_audio_pcm_features(df, "blob", "id").collect()}
        assert abs(rows[1].peak - max(abs(sf))) < 1e-15
        assert rows[1].rms == float(np.sqrt(np.dot(sf, sf) / 128))
        assert rows[2].peak == 50000000.0
        assert rows[2].rms == 50000000.0         # square wave: rms == A


class TestFuzzyDedupKeepList:
    def test_transitive_chain_keeps_one(self, spark):
        # abcd ~ abce ~ abcf form a chain (pairwise some are ed 1, the
        # chain collapses transitively); zzzz is a singleton; exact
        # copies keep only their min id; a NULL-key group keeps one
        rows = [(1, "abcd"), (2, "abce"), (3, "abcf"), (4, "zzzz"),
                (5, "abcd"), (6, None), (7, None)]
        df = spark.createDataFrame(rows, "id long, k string")
        out = {r.id: r.keep
               for r in dedup.fuzzy_dedup_keep_list(df, "k", "id").collect()}
        assert out == {1: True, 2: False, 3: False, 4: True,
                       5: False, 6: True, 7: False}

    def test_quality_best_member(self, spark):
        # the fuzzy chain 1~2~3 is one cluster: keep the best-quality
        # member (3), not min id; the exact copy with the top score (5,
        # copy of key 'abcd') wins over its representative if scored
        # higher — here rep 1 has q=2 < copy 5's q=4 < member 3's q=7
        rows = [(1, "abcd", 2.0), (2, "abce", 1.0), (3, "abcf", 7.0),
                (4, "zzzz", 0.0), (5, "abcd", 4.0), (6, None, 9.0),
                (7, None, 1.0)]
        df = spark.createDataFrame(rows, "id long, k string, q double")
        out = {r.id: r.keep
               for r in dedup.fuzzy_dedup_keep_list(
                   df, "k", "id", quality_col="q").collect()}
        assert out == {1: False, 2: False, 3: True, 4: True,
                       5: False, 6: True, 7: False}

    def test_block_on_scopes_collapse(self, spark):
        rows = [(1, "abc", "h1"), (2, "abd", "h1"), (3, "abd", "h2")]
        df = spark.createDataFrame(rows, "id long, k string, host string")
        out = {r.id: r.keep
               for r in dedup.fuzzy_dedup_keep_list(
                   df, "k", "id", block_on="host").collect()}
        # 1~2 same host collapse; 3 is alone in h2
        assert out == {1: True, 2: False, 3: True}

    def test_matches_brute_force_components(self, spark):
        import numpy as np
        rng = np.random.RandomState(5)
        alpha = "ab"
        rows = [(i, "".join(alpha[rng.randint(2)]
                            for _ in range(rng.randint(1, 5))))
                for i in range(40)]
        df = spark.createDataFrame(rows, "id long, k string")
        out = {r.id: r.keep
               for r in dedup.fuzzy_dedup_keep_list(df, "k", "id").collect()}

        def ed(a, b):
            dp = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                prev, dp[0] = dp[0], i
                for j, cb in enumerate(b, 1):
                    prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                             prev + (ca != cb))
            return dp[len(b)]

        # union-find over brute-force ed<=1 pairs
        parent = {i: i for i, _ in rows}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for i, a in rows:
            for j, b in rows:
                if i < j and ed(a, b) <= 1:
                    ra, rb = find(i), find(j)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        want = {i: find(i) == i for i, _ in rows}
        assert out == want
