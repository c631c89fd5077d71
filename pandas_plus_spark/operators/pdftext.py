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
``T*`` and ``ET``. Show strings decode through the active font's
``/ToUnicode`` CMap when the font embeds one (r12 — bfchar/bfrange,
1- and 2-byte code spaces, multi-code-unit destinations; resolved page
→ resources → font → CMap stream through the object graph); fonts
without a CMap fall back to Latin-1 (≈ PDFDocEncoding for the printable
range). The remaining documented limit is fonts with NEITHER a
ToUnicode CMap nor a standard encoding (pure glyph-id Type3/CID fonts
without the table), which no table-free extractor can decode.

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


def _parse_tounicode(data: bytes):
    """Parse a /ToUnicode CMap stream (PDF 32000 §9.10.3) into
    ``(code_width_bytes, {code: str})``. Handles ``begincodespacerange``
    (fixes the code byte width), ``beginbfchar`` pairs, and
    ``beginbfrange`` in both forms — incrementing destination (last
    UTF-16 code unit advances across the range, the spec rule) and
    explicit destination array. Destination hex strings are UTF-16BE
    and may be multi-code-unit (ligatures map to several characters)."""
    width = None
    cmap: dict[int, str] = {}
    toks = list(_pdf_tokens(data))
    n = len(toks)
    i = 0

    def u16(b: bytes) -> str:
        return b.decode("utf-16-be", "replace")

    while i < n:
        kind, val = toks[i]
        if kind == "kw" and val == b"begincodespacerange":
            j = i + 1
            while j < n and toks[j][1] != b"endcodespacerange":
                if toks[j][0] == "str" and width is None and toks[j][1]:
                    width = len(toks[j][1])
                j += 1
            i = j
        elif kind == "kw" and val == b"beginbfchar":
            j = i + 1
            pair: list[bytes] = []
            while j < n and toks[j][1] != b"endbfchar":
                if toks[j][0] == "str":
                    pair.append(toks[j][1])
                    if len(pair) == 2:
                        src, dst = pair
                        if width is None and src:
                            width = len(src)
                        cmap[int.from_bytes(src, "big")] = u16(dst)
                        pair = []
                j += 1
            i = j
        elif kind == "kw" and val == b"beginbfrange":
            j = i + 1
            trip: list[bytes] = []
            while j < n and toks[j][1] != b"endbfrange":
                tk, tv = toks[j]
                if tk == "str":
                    trip.append(tv)
                    if len(trip) == 3:
                        lo = int.from_bytes(trip[0], "big")
                        hi = int.from_bytes(trip[1], "big")
                        dst = trip[2]
                        if width is None and trip[0]:
                            width = len(trip[0])
                        if len(dst) >= 2:
                            tail = int.from_bytes(dst[-2:], "big")
                            prefix = dst[:-2]
                            for c in range(lo, min(hi, lo + 0xFFFF) + 1):
                                cmap[c] = u16(
                                    prefix
                                    + ((tail + c - lo) & 0xFFFF)
                                    .to_bytes(2, "big"))
                        trip = []
                elif tk == "op" and tv == b"[" and len(trip) == 2:
                    lo = int.from_bytes(trip[0], "big")
                    if width is None and trip[0]:
                        width = len(trip[0])
                    k = j + 1
                    idx = 0
                    while k < n and toks[k][1] != b"]":
                        if toks[k][0] == "str":
                            cmap[lo + idx] = u16(toks[k][1])
                            idx += 1
                        k += 1
                    j = k
                    trip = []
                j += 1
            i = j
        i += 1
    if width is None:
        width = 1
    return width, cmap


def _decode_show(b: bytes, font) -> str:
    """Decode one show-string: through the current font's ToUnicode CMap
    when it has one (codes of the CMap's byte width; unmapped codes
    become U+FFFD per the spec's 'conforming reader may substitute'
    note), Latin-1 otherwise (≈ PDFDocEncoding for the printable
    range)."""
    if font is None:
        return b.decode("latin-1")
    width, cmap = font
    end = len(b) - (len(b) % width)
    return "".join(
        cmap.get(int.from_bytes(b[i:i + width], "big"), "�")
        for i in range(0, end, width))


def _pdf_stream_text(data: bytes, fonts: dict | None = None) -> str:
    """Assemble show-operator text from one decoded content stream.
    ``fonts`` maps resource names (``b"/F1"``) to parsed ToUnicode
    CMaps; the ``Tf`` operator switches the active font, and show
    strings decode through it (:func:`_decode_show`)."""
    parts: list[str] = []
    stack: list = []
    in_text = False
    cur_font = None
    for kind, val in _pdf_tokens(data):
        if kind == "kw":
            if val == b"BT":
                in_text = True
            elif val == b"ET":
                in_text = False
                parts.append("\n")
            elif val == b"Tf" and len(stack) >= 2 \
                    and isinstance(stack[-2], bytes) \
                    and stack[-2][:1] == b"/":
                cur_font = (fonts or {}).get(stack[-2])
            elif in_text:
                if val == b"Tj" and stack and isinstance(stack[-1], bytes):
                    parts.append(_decode_show(stack[-1], cur_font))
                elif val == b"TJ" and stack and isinstance(stack[-1], list):
                    parts.append("".join(
                        _decode_show(x, cur_font) for x in stack[-1]
                        if isinstance(x, bytes)))
                elif val in (b"'", b'"') and stack \
                        and isinstance(stack[-1], bytes):
                    parts.append("\n" + _decode_show(stack[-1], cur_font))
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


def _object_stream_data(body: bytes):
    """(head, data | None) for one object body: the dict before the
    stream keyword and the decoded stream bytes — None when the object
    has no stream or it is undecodable (unsupported filter, corrupt or
    zip-bomb-shaped deflate)."""
    sm = re.search(rb"stream(?:\r\n|\n|\r)", body)
    if sm is None:
        return body, None
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
                return head, None                # zip-bomb shape: skip
        except zlib.error:
            return head, None
    elif b"/Filter" in head:
        return head, None                        # unsupported filter
    else:
        data = raw
    return head, data


def extract_pdf_text(blob: bytes) -> dict | None:
    """Extract the text layer of a PDF — ``{text, n_pages, n_objects}``
    with ``text`` canonicalized (stripped non-empty lines joined by
    newline) — or None for non-PDF blobs / no decodable content.
    Objects are walked in DOCUMENT order (no xref trust; a later
    duplicate object number wins, matching incremental-update
    semantics); streams inflate via /FlateDecode when declared, pass
    through when raw, and are skipped for unsupported filters. Only
    streams containing a ``BT`` text block are parsed for show
    operators.

    Embedded-font character mapping (r12 — closes the r11 documented
    limit): fonts carrying ``/ToUnicode`` CMaps are resolved through
    the object graph (page → ``/Resources`` inline or indirect →
    ``/Font`` dict → font object → CMap stream), and each page's
    content streams decode their show strings through the font the
    ``Tf`` operator selects. Fonts without a CMap keep the Latin-1
    fallback."""
    if blob is None or len(blob) < 8 or not blob.startswith(b"%PDF-"):
        return None
    order: list[int] = []
    objs: dict[int, bytes] = {}
    for m in re.finditer(rb"(?:^|[\r\n\s])(\d+)\s+(\d+)\s+obj\b", blob):
        start = m.end()
        end = blob.find(b"endobj", start)
        if end < 0:
            end = len(blob)
        order.append(int(m.group(1)))
        objs[int(m.group(1))] = blob[start:end]  # later duplicate wins
    n_objects = len(order)
    if n_objects == 0:
        return None
    # font objects -> parsed ToUnicode CMaps
    font_cmaps: dict[int, tuple] = {}
    for num, body in objs.items():
        if not re.search(rb"/Type\s*/Font(?![a-zA-Z])", body):
            continue
        tm = re.search(rb"/ToUnicode\s+(\d+)\s+\d+\s+R", body)
        if tm is None or int(tm.group(1)) not in objs:
            continue
        _h, data = _object_stream_data(objs[int(tm.group(1))])
        if data is not None:
            font_cmaps[num] = _parse_tounicode(data)
    # page objects -> {content obj: {resource name: cmap}}
    content_fonts: dict[int, dict] = {}
    for num, body in objs.items():
        if not re.search(rb"/Type\s*/Page(?![a-zA-Z])", body):
            continue
        res = body
        rm = re.search(rb"/Resources\s+(\d+)\s+\d+\s+R", body)
        if rm is not None and int(rm.group(1)) in objs:
            res = objs[int(rm.group(1))]
        fonts: dict[bytes, tuple] = {}
        fm = re.search(rb"/Font\s*<<(.*?)>>", res, re.S)
        if fm is not None:
            for nm, fnum in re.findall(rb"/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R",
                                       fm.group(1)):
                cm = font_cmaps.get(int(fnum))
                if cm is not None:
                    fonts[b"/" + nm] = cm
        if not fonts:
            continue
        cm_ = re.search(rb"/Contents\s*\[(.*?)\]", body, re.S)
        refs = (re.findall(rb"(\d+)\s+\d+\s+R", cm_.group(1)) if cm_
                else re.findall(rb"/Contents\s+(\d+)\s+\d+\s+R", body))
        for r in refs:
            content_fonts[int(r)] = fonts
    texts: list[str] = []
    seen: set[int] = set()
    for num in order:
        if num in seen:
            continue
        seen.add(num)
        _head, data = _object_stream_data(objs[num])
        if data is not None and b"BT" in data:
            t = _pdf_stream_text(data, content_fonts.get(num))
            if t.strip():
                texts.append(t)
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

def tounicode_cmap_bytes(entries: dict[int, str], width: int = 1) -> bytes:
    """A spec-skeleton ToUnicode CMap stream body: codespace range of
    ``width`` bytes, contiguous runs emitted as incrementing
    ``bfrange`` rows, the rest as ``bfchar`` blocks of ≤ 100 (the spec
    block cap). Destinations are UTF-16BE hex and may be multi-unit."""
    hx = "%0" + str(2 * width) + "x"
    lines = [b"/CIDInit /ProcSet findresource begin",
             b"12 dict begin", b"begincmap",
             b"1 begincodespacerange",
             ("<" + hx % 0 + "> <" + hx % ((1 << 8 * width) - 1) + ">")
             .encode(), b"endcodespacerange"]
    # contiguous single-unit runs -> bfrange; everything else -> bfchar
    items = sorted(entries.items())
    runs: list[tuple[int, int, str]] = []
    chars: list[tuple[int, str]] = []
    i = 0
    while i < len(items):
        c0, s0 = items[i]
        j = i
        if len(s0) == 1:
            while (j + 1 < len(items) and len(items[j + 1][1]) == 1
                   and items[j + 1][0] == items[j][0] + 1
                   and ord(items[j + 1][1]) == ord(items[j][1]) + 1):
                j += 1
        if j > i:
            runs.append((c0, items[j][0], s0))
        else:
            chars.append((c0, s0))
        i = j + 1

    def udst(s: str) -> str:
        return "<" + s.encode("utf-16-be").hex() + ">"

    if runs:
        lines.append(str(len(runs)).encode() + b" beginbfrange")
        for lo, hi, s in runs:
            lines.append(("<" + hx % lo + "> <" + hx % hi + "> "
                          + udst(s)).encode())
        lines.append(b"endbfrange")
    for k in range(0, len(chars), 100):
        blk = chars[k:k + 100]
        lines.append(str(len(blk)).encode() + b" beginbfchar")
        for c, s in blk:
            lines.append(("<" + hx % c + "> " + udst(s)).encode())
        lines.append(b"endbfchar")
    lines += [b"endcmap", b"end", b"end"]
    return b"\n".join(lines)


def pdf_bytes(pages: list[list[str]], *, compress: bool = True,
              use_hex: bool = False, use_tj_array: bool = False,
              tounicode: str | None = None) -> bytes:
    """Complete spec-layout PDF (catalog → pages → page → FlateDecode
    content streams, valid xref table + trailer) whose text layer is
    ``pages`` (a list of line-lists). ``use_hex`` shows the first line
    of each page as a hex string; ``use_tj_array`` shows the second via
    a kerned TJ array — both real-world show forms the extractor must
    read. Parens/backslashes in lines are escaped per spec.

    ``tounicode`` (r12) embeds a /ToUnicode CMap in the font and writes
    every show string in the font's CUSTOM code space, so only a
    CMap-aware extractor recovers the text: ``"bytes1"`` = 1-byte codes
    ``(ord + 13) % 256`` mapped back via bfchar/bfrange rows;
    ``"wide2"`` = 2-byte codes ``0x0400 + ord`` mapped by one
    incrementing bfrange. Show strings are hex-form in both modes."""

    def esc(s: str) -> bytes:
        return (s.replace("\\", "\\\\").replace("(", "\\(")
                 .replace(")", "\\)")).encode("latin-1")

    if tounicode not in (None, "bytes1", "wide2"):
        raise ValueError(tounicode)

    def encode_codes(s: str) -> bytes:
        if tounicode == "bytes1":
            return bytes((ord(ch) + 13) % 256 for ch in s)
        return b"".join((0x0400 + ord(ch)).to_bytes(2, "big") for ch in s)

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
            if tounicode is not None:
                ops.append(b"<" + encode_codes(line).hex().encode()
                           + b"> Tj")
            elif use_hex and li == 0:
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
    tu_ref = b""
    if tounicode is not None:
        if tounicode == "bytes1":
            used = {ch for lines in pages for line in lines for ch in line}
            cm = tounicode_cmap_bytes(
                {(ord(ch) + 13) % 256: ch for ch in used}, width=1)
        else:
            cm = tounicode_cmap_bytes(
                {0x0400 + c: chr(c) for c in range(0x20, 0x7F)}, width=2)
        zcm = zlib.compress(cm)
        cm_num = add(b"<< /Filter /FlateDecode /Length "
                     + str(len(zcm)).encode() + b" >>\nstream\n" + zcm
                     + b"\nendstream")
        tu_ref = b"/ToUnicode " + str(cm_num).encode() + b" 0 R "
    font_num = add(b"<< /Type /Font /Subtype /Type1 " + tu_ref
                   + b"/BaseFont /Helvetica >>")
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
