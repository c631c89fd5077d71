"""PDF text extraction for document-corpus pipelines.

PDFs are a major training-corpus source; the text layer of a
non-scanned PDF is extractable with pure byte arithmetic + stdlib zlib
(reference parity: none — beyond-reference document plumbing, same
family as the WARC/boilerplate work). The extractor walks the object
graph linearly (``N G obj … endobj`` — robust even when the xref table
is stale, which is common in incrementally-updated files), inflates
``/FlateDecode`` streams, tokenizes content streams with the full
string syntax (nested parens, ``\\``-escapes, octal codes, line
continuations, hex strings), and assembles text from the show operators
``Tj``/``TJ``/``'``/``"`` with line breaks from ``Td``/``TD`` (y-moves),
``T*`` and ``ET``. Bytes decode as Latin-1 (≈ PDFDocEncoding for the
printable range — custom font CMaps/ToUnicode tables are the documented
limit, like every no-font-table extractor).

Text is CANONICALIZED deterministically — lines stripped, empties
dropped, joined with ``\\n`` — so a SQL oracle can rebuild the expected
output closed-form from fixture arithmetic.

Scale shape: pure map-side Arrow-batched work over the blob column, no
shuffle — identical distribution profile to the image/audio/video
decoders in ``operators/multimodal``.
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_WS = b" \t\r\n\x0c\x00"
_DELIM = b"()<>[]{}/%"
_ESC = {0x6E: b"\n", 0x72: b"\r", 0x74: b"\t", 0x62: b"\b", 0x66: b"\f",
        0x28: b"(", 0x29: b")", 0x5C: b"\\"}

#: Inflated streams larger than this are skipped — a tiny corrupt
#: deflate payload can legally declare a huge output (zip-bomb shape).
_PDF_MAX_STREAM = 64 << 20


def _pdf_tokens(data: bytes):
    """Tokenize a content stream: yields ('str', bytes) for literal and
    hex strings, ('num', float), ('name', bytes), ('op', bytes) for
    array/dict delimiters, ('kw', bytes) for operator keywords."""
    i, n = 0, len(data)
    while i < n:
        c = data[i]
        if c in _WS:
            i += 1
            continue
        if c == 0x25:                            # % comment to EOL
            while i < n and data[i] not in b"\r\n":
                i += 1
            continue
        if c == 0x28:                            # (literal string)
            i += 1
            depth = 1
            buf = bytearray()
            while i < n and depth:
                ch = data[i]
                if ch == 0x5C:                   # backslash escape
                    i += 1
                    if i >= n:
                        break
                    e = data[i]
                    if e in _ESC:
                        buf += _ESC[e]
                        i += 1
                    elif 0x30 <= e <= 0x37:      # octal, up to 3 digits
                        o = k = 0
                        while k < 3 and i < n and 0x30 <= data[i] <= 0x37:
                            o = o * 8 + data[i] - 0x30
                            i += 1
                            k += 1
                        buf.append(o & 0xFF)
                    elif e in b"\r\n":           # line continuation
                        i += 1
                        if e == 0x0D and i < n and data[i] == 0x0A:
                            i += 1
                    else:                        # \x = x per spec
                        buf.append(e)
                        i += 1
                elif ch == 0x28:
                    depth += 1
                    buf.append(ch)
                    i += 1
                elif ch == 0x29:
                    depth -= 1
                    if depth:
                        buf.append(ch)
                    i += 1
                else:
                    buf.append(ch)
                    i += 1
            yield ("str", bytes(buf))
        elif c == 0x3C and data[i + 1:i + 2] == b"<":
            yield ("op", b"<<")
            i += 2
        elif c == 0x3C:                          # <hex string>
            j = data.find(b">", i)
            if j < 0:
                return
            hx = re.sub(rb"[^0-9A-Fa-f]", b"", data[i + 1:j])
            if len(hx) % 2:
                hx += b"0"
            try:
                yield ("str", bytes.fromhex(hx.decode("ascii")))
            except ValueError:
                pass
            i = j + 1
        elif c == 0x3E and data[i + 1:i + 2] == b">":
            yield ("op", b">>")
            i += 2
        elif c == 0x2F:                          # /Name
            j = i + 1
            while j < n and data[j] not in _WS and data[j] not in _DELIM:
                j += 1
            yield ("name", data[i:j])
            i = j
        elif c in b"[]{}>":
            yield ("op", bytes([c]))
            i += 1
        else:                                    # number or keyword
            j = i
            while j < n and data[j] not in _WS and data[j] not in _DELIM:
                j += 1
            tok = data[i:j] or bytes([c])
            i = max(j, i + 1)
            try:
                yield ("num", float(tok))
            except ValueError:
                yield ("kw", tok)


def _pdf_stream_text(data: bytes) -> str:
    """Assemble show-operator text from one decoded content stream."""
    parts: list[str] = []
    stack: list = []
    in_text = False
    for kind, val in _pdf_tokens(data):
        if kind == "kw":
            if val == b"BT":
                in_text = True
            elif val == b"ET":
                in_text = False
                parts.append("\n")
            elif in_text:
                if val == b"Tj" and stack and isinstance(stack[-1], bytes):
                    parts.append(stack[-1].decode("latin-1"))
                elif val == b"TJ" and stack and isinstance(stack[-1], list):
                    parts.append(b"".join(
                        x for x in stack[-1]
                        if isinstance(x, bytes)).decode("latin-1"))
                elif val in (b"'", b'"') and stack \
                        and isinstance(stack[-1], bytes):
                    parts.append("\n" + stack[-1].decode("latin-1"))
                elif val in (b"Td", b"TD") and len(stack) >= 2 \
                        and isinstance(stack[-1], float) \
                        and stack[-1] != 0.0:
                    parts.append("\n")           # y moved: new line
                elif val == b"T*":
                    parts.append("\n")
            stack = []
        elif kind == "op":
            if val == b"[":
                stack.append("[")
            elif val == b"]":
                arr: list = []
                while stack and stack[-1] != "[":
                    arr.append(stack.pop())
                if stack:
                    stack.pop()
                arr.reverse()
                stack.append(arr)
        else:
            stack.append(val)
    return "".join(parts)


def extract_pdf_text(blob: bytes) -> dict | None:
    """Extract the text layer of a PDF — ``{text, n_pages, n_objects}``
    with ``text`` canonicalized (stripped non-empty lines joined by
    newline) — or None for non-PDF blobs / no decodable content.
    Objects are walked in DOCUMENT order (no xref trust); streams
    inflate via /FlateDecode when declared, pass through when raw, and
    are skipped for unsupported filters. Only streams containing a
    ``BT`` text block are parsed for show operators."""
    if blob is None or len(blob) < 8 or not blob.startswith(b"%PDF-"):
        return None
    texts: list[str] = []
    n_objects = 0
    for m in re.finditer(rb"(?:^|[\r\n\s])(\d+)\s+(\d+)\s+obj\b", blob):
        n_objects += 1
        start = m.end()
        end = blob.find(b"endobj", start)
        if end < 0:
            end = len(blob)
        body = blob[start:end]
        sm = re.search(rb"stream(?:\r\n|\n|\r)", body)
        if sm is None:
            continue
        head = body[:sm.start()]
        raw = body[sm.end():]
        lm = re.search(rb"/Length\s+(\d+)\b", head)
        if lm is not None and int(lm.group(1)) <= len(raw):
            raw = raw[:int(lm.group(1))]
        else:
            es = raw.rfind(b"endstream")
            if es >= 0:
                raw = raw[:es].rstrip(b"\r\n")
        if b"/FlateDecode" in head:
            try:
                d = zlib.decompressobj()
                data = d.decompress(raw, _PDF_MAX_STREAM)
                if d.unconsumed_tail:
                    continue                     # zip-bomb shape: skip
            except zlib.error:
                continue
        elif b"/Filter" in head:
            continue                             # unsupported filter
        else:
            data = raw
        if b"BT" in data:
            t = _pdf_stream_text(data)
            if t.strip():
                texts.append(t)
    if n_objects == 0:
        return None
    n_pages = len(re.findall(rb"/Type\s*/Page(?![a-zA-Z])", blob))
    lines = [ln.strip() for ln in "".join(texts).splitlines()]
    return {"text": "\n".join(ln for ln in lines if ln),
            "n_pages": n_pages, "n_objects": n_objects}


PDF_TEXT_SCHEMA = T.StructType([
    T.StructField("text", T.StringType()),
    T.StructField("n_pages", T.IntegerType()),
    T.StructField("n_objects", T.IntegerType()),
])


def extract_pdf_text_features(df: DataFrame, blob_col: str,
                              id_col: str) -> DataFrame:
    """(id, text, n_pages, n_objects) from PDF blobs via Arrow-batched
    mapInPandas — map-side only, no shuffle, blob never carried
    downstream; non-PDF / undecodable blobs contribute no rows."""
    out_schema = T.StructType(
        [T.StructField(id_col, df.schema[id_col].dataType)]
        + list(PDF_TEXT_SCHEMA.fields))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, b in zip(pdf[id_col], pdf[blob_col]):
                got = extract_pdf_text(bytes(b)) if b is not None else None
                if got is None:
                    continue
                rows.append((rid, got["text"], got["n_pages"],
                             got["n_objects"]))
            yield pd.DataFrame(rows, columns=[id_col, "text", "n_pages",
                                              "n_objects"])

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(
        parse, schema=out_schema)


# --------------------------------------------------------------------- #
# Fixture generator
# --------------------------------------------------------------------- #

def pdf_bytes(pages: list[list[str]], *, compress: bool = True,
              use_hex: bool = False, use_tj_array: bool = False) -> bytes:
    """Complete spec-layout PDF (catalog → pages → page → FlateDecode
    content streams, valid xref table + trailer) whose text layer is
    ``pages`` (a list of line-lists). ``use_hex`` shows the first line
    of each page as a hex string; ``use_tj_array`` shows the second via
    a kerned TJ array — both real-world show forms the extractor must
    read. Parens/backslashes in lines are escaped per spec."""

    def esc(s: str) -> bytes:
        return (s.replace("\\", "\\\\").replace("(", "\\(")
                 .replace(")", "\\)")).encode("latin-1")

    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)                         # 1-based object number

    npg = len(pages)
    page_nums = []
    content_nums = []
    for lines in pages:
        ops = [b"BT /F1 12 Tf 72 720 Td"]
        for li, line in enumerate(lines):
            if li > 0:
                ops.append(b"0 -14 Td")
            if use_hex and li == 0:
                ops.append(b"<" + line.encode("latin-1").hex().encode()
                           + b"> Tj")
            elif use_tj_array and li == 1 and len(line) > 2:
                cut = len(line) // 2
                ops.append(b"[(" + esc(line[:cut]) + b") -120 ("
                           + esc(line[cut:]) + b")] TJ")
            else:
                ops.append(b"(" + esc(line) + b") Tj")
        ops.append(b"ET")
        content = b"\n".join(ops)
        if compress:
            content = zlib.compress(content)
            filt = b"/Filter /FlateDecode "
        else:
            filt = b""
        content_nums.append(add(
            b"<< " + filt + b"/Length " + str(len(content)).encode()
            + b" >>\nstream\n" + content + b"\nendstream"))
    font_num = add(b"<< /Type /Font /Subtype /Type1 "
                   b"/BaseFont /Helvetica >>")
    pages_num = len(objs) + npg + 1              # placed after page objs
    for cn in content_nums:
        page_nums.append(add(
            b"<< /Type /Page /Parent " + str(pages_num).encode()
            + b" 0 R /MediaBox [0 0 612 792] /Contents "
            + str(cn).encode() + b" 0 R /Resources << /Font << /F1 "
            + str(font_num).encode() + b" 0 R >> >> >>"))
    kids = b" ".join(str(p).encode() + b" 0 R" for p in page_nums)
    real_pages_num = add(b"<< /Type /Pages /Kids [" + kids
                         + b"] /Count " + str(npg).encode() + b" >>")
    assert real_pages_num == pages_num
    catalog_num = add(b"<< /Type /Catalog /Pages "
                      + str(pages_num).encode() + b" 0 R >>")
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs):
        offsets.append(len(out))
        out += (str(i + 1).encode() + b" 0 obj\n" + body + b"\nendobj\n")
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += ("%010d 00000 n \n" % off).encode()
    out += (b"trailer\n<< /Size " + str(len(objs) + 1).encode()
            + b" /Root " + str(catalog_num).encode() + b" 0 R >>\n"
            + b"startxref\n" + str(xref_at).encode() + b"\n%%EOF\n")
    return bytes(out)
