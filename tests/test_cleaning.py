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


class TestBoilerplate:
    """remove_boilerplate: block segmentation, link-density, entity decode."""

    def _run(self, spark, html, **kw):
        from pandas_plus_spark.operators.cleaning import remove_boilerplate
        df = spark.createDataFrame([(html,)], "h string")
        bp = remove_boilerplate(F.col("h"), **kw)
        return df.select(bp["text"].alias("t"), bp["n_blocks"].alias("nb"),
                         bp["n_kept"].alias("nk")).first()

    def test_nav_and_footer_dropped_body_kept(self, spark):
        html = ('<div><a href="/">Home</a> <a href="/a">About</a></div>'
                '<p>This paragraph is long enough to be kept as real body '
                'prose by the classifier.</p>'
                '<div class="f"><a href="/t">Terms</a></div>')
        r = self._run(spark, html)
        assert r.t.startswith("This paragraph is long enough")
        assert r.nb == 3 and r.nk == 1

    def test_entities_and_whitespace_normalized(self, spark):
        html = ("<p>Fish &amp; chips &lt;with&gt;   salt &quot;daily&quot; "
                "&#39;fresh&#39;&nbsp;today — a sentence long enough to "
                "stay.</p>")
        r = self._run(spark, html)
        assert "Fish & chips <with> salt \"daily\" 'fresh' today" in r.t
        assert "  " not in r.t

    def test_link_density_threshold(self, spark):
        # exactly at the threshold stays (<=), just above goes
        body = "x" * 70
        at = f'<p><a href="/">{"y" * 21}</a>{body}</p>'      # 21/91 < 0.3
        over = f'<p><a href="/">{"y" * 40}</a>{body[:40]}</p>'  # 40/80 = 0.5
        assert self._run(spark, at).nk == 1
        assert self._run(spark, over).nk == 0

    def test_br_and_case_insensitive_tags(self, spark):
        html = ("<P>First block of prose that is clearly long enough to "
                "keep.<BR/>Second block also clearly long enough to be "
                "kept around.</P>")
        r = self._run(spark, html)
        assert r.nb == 2 and r.nk == 2
        assert "First block" in r.t and "Second block" in r.t

    def test_no_block_tags_whole_doc_one_block(self, spark):
        r = self._run(spark, "just a plain string of sufficient length to "
                             "pass the minimum character threshold")
        assert r.nb == 1 and r.nk == 1

    def test_empty_and_markup_only(self, spark):
        assert self._run(spark, "").nb == 0
        r = self._run(spark, "<div><p></p></div>")
        assert r.nb == 0 and r.nk == 0 and r.t == ""

    def test_duckdb_twin_matches(self, spark):
        """sql_remove_boilerplate reproduces the engine on messy input."""
        import duckdb
        from pandas_plus_spark.operators.cleaning import (
            remove_boilerplate, sql_remove_boilerplate)
        htmls = [
            '<div><a href="/">Home</a> | <a href="/x">X</a></div>'
            '<h1>T</h1><p>Body paragraph number one with plenty of '
            'characters to stay in.</p><ul><li>short</li><li>'
            'A list item that happens to be long enough to stay too.'
            '</li></ul><div><a href="/t">Terms</a></div>',
            '<P>Fish &amp; chips&nbsp;&quot;daily&quot; and a tail long '
            'enough to keep this block.</P><BR>short tail',
        ]
        df = spark.createDataFrame([(h,) for h in htmls], "h string")
        bp = remove_boilerplate(F.col("h"))
        got = [(r.t, r.nb, r.nk) for r in df.select(
            bp["text"].alias("t"), bp["n_blocks"].alias("nb"),
            bp["n_kept"].alias("nk")).collect()]
        twins = sql_remove_boilerplate("h")
        con = duckdb.connect()
        want = []
        for h in htmls:
            con.execute("CREATE OR REPLACE TABLE t AS SELECT ? AS h", [h])
            want.append(tuple(con.execute(
                f"SELECT {twins['text']}, {twins['n_blocks']}, "
                f"{twins['n_kept']} FROM t").fetchone()))
        assert [(t, int(nb), int(nk)) for t, nb, nk in got] == \
            [(t, int(nb), int(nk)) for t, nb, nk in want]


class TestSnapshotDiff:
    def test_statuses(self, spark):
        from pandas_plus_spark.operators.corpus import snapshot_diff
        old = spark.createDataFrame(
            [(1, "a", "en"), (2, "b", "en"), (3, "c", "de"), (4, "d", "fr")],
            "id long, text string, lang string")
        new = spark.createDataFrame(
            [(1, "a", "en"), (2, "B", "en"), (5, "e", "es")],
            "id long, text string, lang string")
        got = dict(snapshot_diff(old, new, "id", ["text", "lang"])
                   .collect())
        assert got == {1: "unchanged", 2: "changed", 3: "removed",
                       4: "removed", 5: "added"}

    def test_null_vs_empty_and_column_boundaries(self, spark):
        from pandas_plus_spark.operators.corpus import snapshot_diff
        old = spark.createDataFrame(
            [(1, None, "x"), (2, "ab", "c")],
            "id long, a string, b string")
        new = spark.createDataFrame(
            [(1, "", "x"), (2, "a", "bc")],
            "id long, a string, b string")
        got = dict(snapshot_diff(old, new, "id", ["a", "b"]).collect())
        # NULL != empty string; ("ab","c") != ("a","bc") thanks to the
        # unit separator — both must read as changed
        assert got == {1: "changed", 2: "changed"}


class TestPdfText:
    """PDF text-layer extraction: object walk, FlateDecode, full string
    syntax, show operators, canonicalization."""

    def test_all_show_forms_extract_exactly(self):
        from pandas_plus_spark.operators.pdftext import (extract_pdf_text,
                                                         pdf_bytes)
        pages = [["Doc 1 page 0 line 0", "Has (parens) \\ backslash"],
                 ["Page two line", "Kerned pair line"]]
        exp = "\n".join(ln for pg in pages for ln in pg)
        for kw in ({}, {"compress": False}, {"use_hex": True},
                   {"use_tj_array": True},
                   {"use_hex": True, "use_tj_array": True}):
            got = extract_pdf_text(pdf_bytes(pages, **kw))
            assert got["text"] == exp, kw
            assert got["n_pages"] == 2 and got["n_objects"] == 7, kw

    def test_string_syntax_corners(self):
        """Nested parens, octal escapes, line continuations, hex with
        odd digit count and embedded whitespace — the spec string forms
        a hand-assembled content stream exercises directly."""
        from pandas_plus_spark.operators.pdftext import _pdf_stream_text
        data = (b"BT (a (nested) b) Tj "
                b"(\\110\\151!) Tj "                 # octal: Hi!
                b"(cont\\\ninued) Tj "               # line continuation
                b"<4 86 9> Tj "                      # 'Hi' odd hex + ws
                b"[(x) -120 (y) 3 (z)] TJ ET")
        assert _pdf_stream_text(data).replace("\n", "") \
            == "a (nested) bHi!continuedHixyz"

    def test_rejects_and_degrades(self):
        from pandas_plus_spark.operators.pdftext import (extract_pdf_text,
                                                         pdf_bytes)
        assert extract_pdf_text(None) is None
        assert extract_pdf_text(b"not a pdf at all") is None
        assert extract_pdf_text(b"%PDF-1.4\njunk") is None  # no objects
        blob = pdf_bytes([["only line"]])
        # corrupt the deflate payload: stream skipped, no crash
        broken = bytearray(blob)
        i = blob.index(b"stream\n") + 10
        broken[i:i + 4] = b"\x00\x00\x00\x00"
        got = extract_pdf_text(bytes(broken))
        assert got is not None and got["text"] == ""

    def test_tounicode_cmap_decode(self):
        """r12: show strings in custom code spaces recover the text only
        through the embedded /ToUnicode CMap — 1-byte scrambled codes,
        2-byte wide codes, both with Flate-compressed CMap streams."""
        from pandas_plus_spark.operators.pdftext import (extract_pdf_text,
                                                         pdf_bytes)
        pages = [["Doc 9 page 0 line 0", "see (ref 9) \\ end on page 0"],
                 ["Another page here", "with a second line"]]
        exp = "\n".join(ln for pg in pages for ln in pg)
        for mode in ("bytes1", "wide2"):
            got = extract_pdf_text(pdf_bytes(pages, tounicode=mode))
            assert got["text"] == exp, mode
            assert got["n_pages"] == 2
        # WITHOUT CMap awareness the bytes1 stream is garbage — prove the
        # scramble is real by checking the raw latin-1 read differs
        blob = pdf_bytes(pages, tounicode="bytes1")
        got_nofont = extract_pdf_text(
            blob.replace(b"/ToUnicode", b"/XoUnicode"))
        assert got_nofont["text"] != exp

    def test_tounicode_spec_corners(self):
        """bfrange increment semantics, multi-code-unit (ligature)
        destinations, array-form bfrange, unmapped codes -> U+FFFD,
        indirect /Resources objects."""
        from pandas_plus_spark.operators.pdftext import (_decode_show,
                                                         _parse_tounicode)
        cm = (b"begincodespacerange <00> <ff> endcodespacerange\n"
              b"1 beginbfrange <41> <43> <0061> endbfrange\n"
              b"1 beginbfchar <50> <006600660069> endbfchar\n"
              b"1 beginbfrange <60> <61> [<0058> <0059>] endbfrange\n")
        width, m = _parse_tounicode(cm)
        assert width == 1
        assert (m[0x41], m[0x42], m[0x43]) == ("a", "b", "c")
        assert m[0x50] == "ffi"                  # ligature, 3 units
        assert (m[0x60], m[0x61]) == ("X", "Y")  # array form
        assert _decode_show(b"\x41\x99\x50", (width, m)) == "a�ffi"
        # 2-byte width from the codespace
        w2, m2 = _parse_tounicode(
            b"begincodespacerange <0000> <ffff> endcodespacerange\n"
            b"1 beginbfchar <0404> <0041> endbfchar\n")
        assert w2 == 2 and m2[0x0404] == "A"
        assert _decode_show(b"\x04\x04\x04\x04", (w2, m2)) == "AA"

    def test_indirect_resources_font_resolution(self):
        """A page whose /Resources is an INDIRECT object (common in real
        PDFs; the fixture generator always inlines) must still resolve
        its font's ToUnicode CMap through the extra hop."""
        import zlib

        from pandas_plus_spark.operators.pdftext import (
            extract_pdf_text, tounicode_cmap_bytes)
        cm = zlib.compress(tounicode_cmap_bytes(
            {(ord(c) + 13) % 256: c for c in "Helo"}, width=1))
        codes = bytes((ord(c) + 13) % 256 for c in "Hello")
        content = (b"BT /F9 12 Tf 72 720 Td <" + codes.hex().encode()
                   + b"> Tj ET")
        objs = [
            b"<< /Length " + str(len(content)).encode()
            + b" >>\nstream\n" + content + b"\nendstream",
            b"<< /Filter /FlateDecode /Length " + str(len(cm)).encode()
            + b" >>\nstream\n" + cm + b"\nendstream",
            b"<< /Type /Font /Subtype /Type1 /ToUnicode 2 0 R "
            b"/BaseFont /Helvetica >>",
            b"<< /Font << /F9 3 0 R >> >>",       # indirect resources
            b"<< /Type /Page /Parent 6 0 R /MediaBox [0 0 612 792] "
            b"/Contents 1 0 R /Resources 4 0 R >>",
            b"<< /Type /Pages /Kids [5 0 R] /Count 1 >>",
            b"<< /Type /Catalog /Pages 6 0 R >>",
        ]
        blob = bytearray(b"%PDF-1.4\n")
        for i, body in enumerate(objs):
            blob += (str(i + 1).encode() + b" 0 obj\n" + body
                     + b"\nendobj\n")
        blob += b"trailer\n<< /Size 8 /Root 7 0 R >>\n%%EOF\n"
        got = extract_pdf_text(bytes(blob))
        assert got["text"] == "Hello" and got["n_pages"] == 1

    def test_sparkside_extraction(self, spark):
        import pandas as pd

        from pandas_plus_spark.operators.pdftext import (
            extract_pdf_text_features, pdf_bytes)
        df = spark.createDataFrame(pd.DataFrame({
            "id": [1, 2],
            "blob": [pdf_bytes([["alpha", "beta"], ["gamma"]]),
                     b"not a pdf"]}))
        rows = extract_pdf_text_features(df, "blob", "id").collect()
        assert len(rows) == 1
        assert rows[0].text == "alpha\nbeta\ngamma"
        assert rows[0].n_pages == 2
