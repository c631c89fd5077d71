"""sitemap.xml ingestion for crawl-curation pipelines.

Sitemaps are the third leg of the crawl front door (WARC bodies,
robots.txt compliance, sitemap URL discovery — reference parity: none,
beyond-reference crawl plumbing). Handles both document kinds —
``<urlset>`` leaves with per-URL ``loc``/``lastmod``/``changefreq``/
``priority`` and ``<sitemapindex>`` nodes whose ``<sitemap><loc>``
children point at further sitemaps — plus the gzipped form
(``sitemap.xml.gz``, detected by magic, inflated with stdlib zlib).
Parsing is tolerant tag-scanning rather than strict XML: real-world
sitemaps routinely carry encoding quirks and stray bytes that break
conforming parsers, and the four fields live in flat, unambiguous tags.

Scale shape: sitemap files are small (spec caps one file at 50k URLs /
50 MB) and independent — pure Arrow-batched map work over a blob
column, no shuffle; the fan-out of a sitemapindex is just more rows.
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_ENTRY_RE = re.compile(rb"<(url|sitemap)\b[^>]*>(.*?)</\1>", re.S)
_FIELD_RE = {
    "loc": re.compile(rb"<loc[^>]*>\s*(.*?)\s*</loc>", re.S),
    "lastmod": re.compile(rb"<lastmod[^>]*>\s*(.*?)\s*</lastmod>", re.S),
    "changefreq": re.compile(
        rb"<changefreq[^>]*>\s*(.*?)\s*</changefreq>", re.S),
    "priority": re.compile(rb"<priority[^>]*>\s*(.*?)\s*</priority>", re.S),
}
_XML_UNESCAPE = [(b"&lt;", b"<"), (b"&gt;", b">"), (b"&quot;", b'"'),
                 (b"&apos;", b"'"), (b"&amp;", b"&")]  # &amp; LAST


def _unescape(raw: bytes) -> str:
    for ent, ch in _XML_UNESCAPE:
        raw = raw.replace(ent, ch)
    return raw.decode("utf-8", "replace")


def parse_sitemap(blob: bytes) -> list[dict] | None:
    """Parse one sitemap blob (plain or gzipped XML) into entry dicts:
    ``{kind: 'url'|'sitemap', loc, lastmod, changefreq, priority}`` —
    ``kind='sitemap'`` rows are a sitemapindex's children (the URLs of
    FURTHER sitemaps to fetch). Returns None for non-sitemap bytes."""
    if blob is None or len(blob) < 10:
        return None
    if blob[:2] == b"\x1f\x8b":                  # gzipped sitemap.xml.gz
        try:
            blob = zlib.decompress(blob, wbits=47)
        except zlib.error:
            return None
    if b"<urlset" not in blob and b"<sitemapindex" not in blob:
        return None
    out = []
    for m in _ENTRY_RE.finditer(blob):
        kind = m.group(1).decode()
        body = m.group(2)
        fields = {}
        for name, rx in _FIELD_RE.items():
            fm = rx.search(body)
            fields[name] = _unescape(fm.group(1)) if fm else None
        if fields["loc"] is None:
            continue                             # entry without a URL
        prio = None
        if fields["priority"] is not None:
            try:
                prio = float(fields["priority"])
            except ValueError:
                prio = None
        out.append({"kind": kind, "loc": fields["loc"],
                    "lastmod": fields["lastmod"],
                    "changefreq": fields["changefreq"],
                    "priority": prio})
    return out


SITEMAP_ENTRY_SCHEMA = T.StructType([
    T.StructField("kind", T.StringType()),
    T.StructField("loc", T.StringType()),
    T.StructField("lastmod", T.StringType()),
    T.StructField("changefreq", T.StringType()),
    T.StructField("priority", T.DoubleType()),
])


def extract_sitemap_entries(df: DataFrame, blob_col: str,
                            id_col: str) -> DataFrame:
    """(id, kind, loc, lastmod, changefreq, priority) — one row per
    sitemap entry — via Arrow-batched mapInPandas. Map-side only, no
    shuffle; non-sitemap blobs contribute no rows. Feed ``kind =
    'sitemap'`` rows back into the fetcher to walk a sitemapindex."""
    out_schema = T.StructType(
        [T.StructField(id_col, df.schema[id_col].dataType)]
        + list(SITEMAP_ENTRY_SCHEMA.fields))
    cols = [id_col] + [f.name for f in SITEMAP_ENTRY_SCHEMA.fields]

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, b in zip(pdf[id_col], pdf[blob_col]):
                got = parse_sitemap(bytes(b)) if b is not None else None
                if got is None:
                    continue
                for e in got:
                    rows.append((rid, e["kind"], e["loc"], e["lastmod"],
                                 e["changefreq"], e["priority"]))
            yield pd.DataFrame(rows, columns=cols)

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(
        parse, schema=out_schema)


def sitemap_bytes(urls: list[dict] | list[str], *, index: bool = False,
                  gzipped: bool = False) -> bytes:
    """Deterministic sitemap fixture: ``urls`` entries are dicts with
    ``loc`` (+ optional lastmod/changefreq/priority) or bare URL
    strings; ``index=True`` emits a ``<sitemapindex>`` of ``<sitemap>``
    children instead of a ``<urlset>``. XML-escapes locs; ``gzipped``
    wraps the document as sitemap.xml.gz."""
    root = "sitemapindex" if index else "urlset"
    child = "sitemap" if index else "url"

    def esc(s: str) -> str:
        return (s.replace("&", "&amp;").replace("<", "&lt;")
                 .replace(">", "&gt;"))

    parts = ['<?xml version="1.0" encoding="UTF-8"?>',
             f'<{root} xmlns="http://www.sitemaps.org/schemas/'
             f'sitemap/0.9">']
    for u in urls:
        if isinstance(u, str):
            u = {"loc": u}
        parts.append(f"  <{child}>")
        parts.append(f"    <loc>{esc(u['loc'])}</loc>")
        for k in ("lastmod", "changefreq", "priority"):
            if u.get(k) is not None:
                parts.append(f"    <{k}>{u[k]}</{k}>")
        parts.append(f"  </{child}>")
    parts.append(f"</{root}>")
    doc = "\n".join(parts).encode("utf-8")
    if gzipped:
        co = zlib.compressobj(wbits=31)          # gzip wrapper
        return co.compress(doc) + co.flush()
    return doc
