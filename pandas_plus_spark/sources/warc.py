"""WARC (Web ARChive) ingestion — the entry format of crawl-based
training-data pipelines (Common Crawl publishes WARC; ISO 28500).

The reference engine has no I/O layer at all (columns arrive as arrays,
reference util.py:633-686); this is the beyond-reference ingest seam a
100 TB text pipeline actually starts from. Everything here is
dependency-free byte arithmetic on the published format (same policy as
the WAV/MP4 header decoders in ``operators/multimodal.py``):

- a WARC file is a sequence of records: a ``WARC/1.x`` version line,
  CRLF-separated headers, ``\\r\\n\\r\\n``, ``Content-Length`` payload
  bytes, ``\\r\\n\\r\\n`` terminator;
- Common Crawl gzips each record as its OWN gzip member and
  concatenates them — ``zlib`` inflates members in a loop (stdlib only);
- ``response`` records carry an HTTP message as payload: status line,
  headers, body — split and surfaced as typed columns;
- text extraction for ``text/html`` bodies is a deterministic tag-strip
  (whitespace-normalized), NOT a browser: the real pipeline swaps in a
  proper extractor at the same seam (column contract unchanged).

Scale shape: ``read_warc`` uses Spark's ``binaryFile`` source — one task
per WARC file, whole-file memory per task, which matches how crawls are
published (~1 GB per file; Common Crawl segments). Parsing is map-side
mapInPandas (Arrow batches of file blobs), no shuffle; downstream rows
carry the extracted text/payload, so only useful bytes leave the task.
For multi-GB monolithic archives, split on the uncompressed
``WARC/1.0\\r\\n`` magic per byte-range before parsing — the record
grammar is self-synchronizing; that variant plugs into the same
``parse_warc_records``.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType([
    T.StructField("record_idx", T.IntegerType()),    # position in the file
    T.StructField("warc_type", T.StringType()),
    T.StructField("record_id", T.StringType()),
    T.StructField("target_uri", T.StringType()),
    T.StructField("warc_date", T.StringType()),
    T.StructField("http_status", T.IntegerType()),
    T.StructField("content_type", T.StringType()),   # of the HTTP body
    T.StructField("n_payload_bytes", T.LongType()),
    T.StructField("text", T.StringType()),            # tag-stripped body
])


def gunzip_members(blob: bytes) -> bytes:
    """Inflate a concatenation of gzip members (the WARC convention:
    one member per record) into one byte string. Plain stdlib zlib;
    raises on corrupt streams like gzip would."""
    out = []
    d = zlib.decompressobj(wbits=47)          # gzip wrapper
    data = blob
    while data:
        out.append(d.decompress(data))
        if d.eof:
            data = d.unused_data.lstrip(b"\x00")
            d = zlib.decompressobj(wbits=47)
        else:
            break
    return b"".join(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if b":" not in line:
            continue
        k, v = line.split(b":", 1)
        headers[k.strip().lower().decode("latin-1")] = (
            v.strip().decode("latin-1"))
    return headers


def strip_html(body: str) -> str:
    """Deterministic tag-strip: drop <script>/<style> subtrees, remove
    tags, unescape the five core entities, collapse whitespace. The
    text-extraction SEAM — swap for trafilatura/readability in a real
    deployment; the column contract is unchanged."""
    import re
    body = re.sub(r"(?is)<(script|style)\b.*?</\1\s*>", " ", body)
    body = re.sub(r"(?s)<[^>]*>", " ", body)
    for ent, ch in ((" &amp; ", " & "), ("&amp;", "&"), ("&lt;", "<"),
                    ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'")):
        body = body.replace(ent, ch)
    return " ".join(body.split())


def parse_warc_records(blob: bytes) -> list[dict]:
    """Parse one WARC file's bytes (gzipped-members or plain) into a list
    of record dicts matching :data:`WARC_SCHEMA` (minus ``record_idx``).
    Tolerant walk: a record with a malformed header block or truncated
    payload stops the parse (returns what was read) rather than raising —
    crawl files do truncate."""
    if blob[:2] == b"\x1f\x8b":
        blob = gunzip_members(blob)
    records: list[dict] = []
    i, n = 0, len(blob)
    while i < n:
        # skip inter-record CRLFs
        while i < n and blob[i:i + 2] == b"\r\n":
            i += 2
        if i >= n:
            break
        if not blob[i:i + 5] == b"WARC/":
            break                                   # lost sync
        hdr_end = blob.find(b"\r\n\r\n", i)
        if hdr_end < 0:
            break
        headers = _parse_headers(blob[i:hdr_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        payload = blob[hdr_end + 4:hdr_end + 4 + length]
        if len(payload) < length:
            break                                   # truncated record
        i = hdr_end + 4 + length
        rec = {
            "warc_type": headers.get("warc-type"),
            "record_id": headers.get("warc-record-id"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "http_status": None,
            "content_type": headers.get("content-type"),
            "n_payload_bytes": len(payload),
            "text": None,
        }
        if (rec["warc_type"] == "response"
                and payload[:5] in (b"HTTP/",)):
            http_end = payload.find(b"\r\n\r\n")
            if http_end >= 0:
                status_line = payload[:payload.find(b"\r\n")]
                parts = status_line.split(b" ")
                if len(parts) >= 2 and parts[1].isdigit():
                    rec["http_status"] = int(parts[1])
                http_headers = _parse_headers(payload[:http_end])
                body = payload[http_end + 4:]
                ctype = http_headers.get("content-type", "")
                rec["content_type"] = ctype
                rec["n_payload_bytes"] = len(body)
                if ctype.split(";")[0].strip() in ("text/html", "text/plain"):
                    text = body.decode("utf-8", errors="replace")
                    rec["text"] = (strip_html(text)
                                   if "html" in ctype else
                                   " ".join(text.split()))
        records.append(rec)
    return records


def extract_warc_records(df: DataFrame, blob_col: str,
                         id_col: str) -> DataFrame:
    """Parse a BINARY column of WARC file bytes into typed record rows —
    the mapInPandas seam shared by :func:`read_warc` and fixture-driven
    gates. One output row per record; map-side only, no shuffle."""
    out_schema = T.StructType(
        [T.StructField(id_col, df.schema[id_col].dataType)]
        + list(WARC_SCHEMA.fields))
    cols = [f.name for f in WARC_SCHEMA.fields]

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, blob in zip(pdf[id_col], pdf[blob_col]):
                for idx, rec in enumerate(parse_warc_records(bytes(blob))):
                    rec = {"record_idx": idx, **rec}
                    rows.append([rid] + [rec[c] for c in cols])
            yield pd.DataFrame(rows, columns=[id_col] + cols)

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(
        parse, schema=out_schema)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read WARC file(s) into typed record rows: ``(path, record_idx,
    warc_type, record_id, target_uri, warc_date, http_status,
    content_type, n_payload_bytes, text)``. One task per file
    (``binaryFile`` — the Common Crawl ~1 GB-per-file layout); gzipped
    record members handled transparently."""
    files = (spark.read.format("binaryFile").load(path)
             .select(F.col("path"), F.col("content")))
    return extract_warc_records(files, "content", "path")


def warc_record_bytes(uri: str, date: str, html_body: str,
                      status: int = 200, gzip_member: bool = False,
                      content_type: str = "text/html",
                      record_id: str = "<urn:uuid:0>") -> bytes:
    """Build one spec-layout WARC response record (optionally as its own
    gzip member, the Common Crawl convention) — the deterministic fixture
    generator for gates/tests."""
    body = html_body.encode("utf-8")
    http = (f"HTTP/1.1 {status} OK\r\nContent-Type: {content_type}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode("latin-1") + body
    warc_hdr = ("WARC/1.0\r\n"
                "WARC-Type: response\r\n"
                f"WARC-Record-ID: {record_id}\r\n"
                f"WARC-Date: {date}\r\n"
                f"WARC-Target-URI: {uri}\r\n"
                "Content-Type: application/http; msgtype=response\r\n"
                f"Content-Length: {len(http)}\r\n\r\n").encode("latin-1")
    rec = warc_hdr + http + b"\r\n\r\n"
    if gzip_member:
        import gzip as _gzip
        rec = _gzip.compress(rec, mtime=0)
    return rec
