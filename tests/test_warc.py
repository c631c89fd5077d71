"""WARC ingestion (sources/warc.py): record-grammar walk, gzip members,
HTTP payload split, tag-strip text extraction, and the binaryFile read
path end to end."""

import gzip

import pytest

from pandas_plus_spark.sources.warc import (
    gunzip_members, parse_warc_records, read_warc, strip_html,
    warc_record_bytes)


HTML = ("<html><head><title>T</title><style>p{color:red}</style></head>"
        "<body><h1>Head</h1><p>one &amp; two</p>"
        "<script>var x = '<p>not text</p>';</script></body></html>")


class TestParser:
    def test_single_response_record(self):
        rec = parse_warc_records(warc_record_bytes(
            "http://ex.com/a", "2024-02-03T04:05:06Z", HTML,
            record_id="<urn:uuid:42>"))
        assert len(rec) == 1
        r = rec[0]
        assert r["warc_type"] == "response"
        assert r["record_id"] == "<urn:uuid:42>"
        assert r["target_uri"] == "http://ex.com/a"
        assert r["warc_date"] == "2024-02-03T04:05:06Z"
        assert r["http_status"] == 200
        assert r["content_type"] == "text/html"
        assert r["n_payload_bytes"] == len(HTML.encode())
        # style/script subtrees dropped, entity unescaped, whitespace collapsed
        assert r["text"] == "T Head one & two"

    def test_multi_record_file_and_plain_text(self):
        blob = (warc_record_bytes("http://a", "2024-01-01T00:00:00Z", HTML)
                + warc_record_bytes("http://b", "2024-01-02T00:00:00Z",
                                    "tab\tand  spaces", status=301,
                                    content_type="text/plain"))
        recs = parse_warc_records(blob)
        assert [r["target_uri"] for r in recs] == ["http://a", "http://b"]
        assert recs[1]["http_status"] == 301
        assert recs[1]["text"] == "tab and spaces"

    def test_gzip_members_concatenated(self):
        """Common Crawl layout: every record its own gzip member."""
        blob = (warc_record_bytes("http://a", "2024-01-01T00:00:00Z", HTML,
                                  gzip_member=True)
                + warc_record_bytes("http://b", "2024-01-02T00:00:00Z",
                                    "<i>x</i>", gzip_member=True))
        recs = parse_warc_records(blob)
        assert [r["target_uri"] for r in recs] == ["http://a", "http://b"]
        assert recs[1]["text"] == "x"
        # inflate helper round-trips the plain bytes
        plain = warc_record_bytes("http://a", "2024-01-01T00:00:00Z", HTML)
        assert gunzip_members(gzip.compress(plain, mtime=0)) == plain

    def test_truncated_and_garbage_inputs(self):
        good = warc_record_bytes("http://a", "2024-01-01T00:00:00Z", HTML)
        assert parse_warc_records(b"") == []
        assert parse_warc_records(b"not a warc at all") == []
        # payload cut mid-body: the complete record before it still parses
        two = good + warc_record_bytes(
            "http://b", "2024-01-02T00:00:00Z", HTML)
        recs = parse_warc_records(two[:-60])
        assert len(recs) == 1 and recs[0]["target_uri"] == "http://a"
        # header block never terminates
        assert parse_warc_records(b"WARC/1.0\r\nWARC-Type: response\r\n") == []

    def test_non_response_record_passthrough(self):
        """warcinfo/request records keep metadata, no HTTP parse."""
        body = b"software: test\r\n"
        hdr = ("WARC/1.0\r\nWARC-Type: warcinfo\r\n"
               "WARC-Record-ID: <urn:uuid:i>\r\n"
               f"Content-Type: application/warc-fields\r\n"
               f"Content-Length: {len(body)}\r\n\r\n").encode()
        recs = parse_warc_records(hdr + body + b"\r\n\r\n")
        assert len(recs) == 1
        assert recs[0]["warc_type"] == "warcinfo"
        assert recs[0]["http_status"] is None
        assert recs[0]["text"] is None
        assert recs[0]["n_payload_bytes"] == len(body)

    def test_strip_html_is_deterministic_seam(self):
        assert strip_html("<p>a</p><p>b</p>") == "a b"
        assert strip_html("no tags") == "no tags"
        assert strip_html("&lt;kept&gt; &quot;q&quot;") == '<kept> "q"'


class TestReadWarc:
    def test_binaryfile_end_to_end(self, spark, tmp_path):
        """read_warc over real files: one task per file, gzip + plain
        mixed across files, rows keyed by file path + record_idx."""
        d = tmp_path / "warcs"
        d.mkdir()
        (d / "a.warc").write_bytes(
            warc_record_bytes("http://a/1", "2024-01-01T00:00:00Z", HTML)
            + warc_record_bytes("http://a/2", "2024-01-01T00:00:01Z",
                                "<p>two</p>"))
        (d / "b.warc.gz").write_bytes(
            warc_record_bytes("http://b/1", "2024-01-02T00:00:00Z",
                              "<p>three</p>", gzip_member=True))
        out = read_warc(spark, str(d)).collect()
        by_uri = {r["target_uri"]: r for r in out}
        assert set(by_uri) == {"http://a/1", "http://a/2", "http://b/1"}
        assert by_uri["http://a/2"]["record_idx"] == 1
        assert by_uri["http://b/1"]["text"] == "three"
        assert by_uri["http://a/1"]["path"].endswith("a.warc")


@pytest.mark.usefixtures("spark")
class TestWarcGate:
    def test_registry_query_shape(self, spark):
        import __spark_entry__ as em
        df = em.queries()["warc_ingest"](spark, "/root/testdata/sf0.001")
        rows = df.collect()
        assert len(rows) > 0
        r = {row["doc_id"]: row for row in rows}
        for did, row in r.items():
            assert row["target_uri"].endswith(f"/doc/{did}")
            assert row["http_status"] == (404 if did % 9 == 0 else 200)
