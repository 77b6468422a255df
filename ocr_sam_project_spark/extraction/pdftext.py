"""Minimal PDF text-layer extractor — pure stdlib (re + zlib).

The reference slices PDFs into per-page text via PyPDF2
(/root/reference/src/services/pdf_service.py:36-118, :120-150); this
container ships no PDF library, so the rebuild implements exactly the
subset that pipeline needs:

* cross-reference-free object scan (``N G obj ... endobj``),
* FlateDecode (zlib) and raw content streams,
* BT/ET text blocks with the Tj / ' / " / TJ show operators
  (literal ``(...)`` strings incl. escapes + nesting, ``<hex>`` strings),
* page order from the /Pages tree (/Kids, depth-first), falling back to
  object-number order when the tree is unparseable.

Deliberately NOT a general renderer: no encryption, no object streams
(/ObjStm), no CMap/ToUnicode (string bytes decode latin-1), no incremental
updates.  Anything outside the subset yields [] and the caller falls back
to the row's pre-extracted ``text`` column (the Common-Crawl-style input
always carries one — BASELINE.json input_hint), so malformed PDFs can
never take down an executor.
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?endstream", re.S)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_PAGES_KIDS_RE = re.compile(rb"/Kids\s*\[(.*?)\]", re.S)
_CONTENTS_RE = re.compile(rb"/Contents\s*(\[(?:[^\]]*)\]|\d+\s+\d+\s+R)", re.S)

# text-block operators that imply a line break before the next shown string
_NEWLINE_OPS = (b"Td", b"TD", b"T*")


def extract_pages(pdf_bytes: bytes) -> list[str]:
    """%PDF bytes -> one text string per page (PyPDF2 page-slicing analog).
    Returns [] when the document is outside the supported subset."""
    try:
        objs = _scan_objects(pdf_bytes)
        if not objs:
            return []
        page_nums = _page_order(objs)
        if not page_nums:
            return []
        out: list[str] = []
        for num in page_nums:
            body = objs[num]
            content = b"".join(
                _object_stream(objs.get(ref, b"")) for ref in _content_refs(body)
            )
            out.append(_text_from_content(content))
        return out if any(p.strip() for p in out) else []
    except Exception:
        return []  # malformed -> caller falls back to the text column


_OBJ_HEADER_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")
_STREAM_START_RE = re.compile(rb"stream\r?\n")
# the negative lookahead rejects INDIRECT length references (`/Length 6 0 R`)
# — naively capturing the object number as a byte count mis-slices the
# stream; with no direct /Length the object is out-of-subset and the page
# degrades to the text-column fallback instead of emitting garbage.
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)\b(?!\s+\d+\s+R\b)")


def _scan_objects(pdf: bytes) -> dict[int, bytes]:
    """Incremental scan that never regexes THROUGH stream data: compressed
    bytes can contain fake `endobj`/`endstream` sequences, so each stream is
    skipped via its dict's /Length before searching for the object end."""
    objs: dict[int, bytes] = {}
    pos = 0
    while True:
        m = _OBJ_HEADER_RE.search(pdf, pos)
        if not m:
            return objs
        start = m.end()
        sm = _STREAM_START_RE.search(pdf, start)
        em = pdf.find(b"endobj", start)
        if sm is not None and (em == -1 or sm.start() < em):
            lm = _LENGTH_RE.search(pdf, start, sm.start())
            if lm:
                data_end = sm.end() + int(lm.group(1))
                em = pdf.find(b"endobj", data_end)
            else:  # no /Length: out of subset, take the nearest endobj
                em = pdf.find(b"endobj", sm.end())
        end = em if em != -1 else len(pdf)
        objs[int(m.group(1))] = pdf[start:end]
        pos = end + 6 if em != -1 else len(pdf)


def _page_order(objs: dict[int, bytes]) -> list[int]:
    """Depth-first /Pages-tree order; object-number order as fallback."""
    pages = {n for n, b in objs.items() if _is_page(b)}
    roots = [n for n, b in objs.items() if b"/Type" in b and b"/Pages" in b and b"/Parent" not in b]
    ordered: list[int] = []

    def walk(num: int, depth: int = 0) -> None:
        if depth > 32:  # cycle guard
            return
        body = objs.get(num, b"")
        if num in pages:
            if num not in ordered:
                ordered.append(num)
            return
        m = _PAGES_KIDS_RE.search(body)
        if m:
            for ref in _REF_RE.finditer(m.group(1)):
                walk(int(ref.group(1)), depth + 1)

    for r in roots:
        walk(r)
    if set(ordered) == pages and ordered:
        return ordered
    return sorted(pages)


def _is_page(body: bytes) -> bool:
    m = re.search(rb"/Type\s*/Page\b(?!s)", body)
    return m is not None


def _content_refs(page_body: bytes) -> list[int]:
    m = _CONTENTS_RE.search(page_body)
    if not m:
        return []
    return [int(r.group(1)) for r in _REF_RE.finditer(m.group(1))]


def _object_stream(body: bytes) -> bytes:
    sm = _STREAM_START_RE.search(body)
    if not sm:
        return b""
    lm = _LENGTH_RE.search(body, 0, sm.start())
    if lm:
        data = body[sm.end() : sm.end() + int(lm.group(1))]
    else:
        m = _STREAM_RE.search(body)
        if not m:
            return b""
        data = m.group(1)
    if b"/FlateDecode" in body[: sm.start()]:
        try:
            return zlib.decompress(data)
        except zlib.error:
            # trailing \r/\n ambiguity: retry with stripped tail bytes
            try:
                return zlib.decompress(data.rstrip(b"\r\n"))
            except zlib.error:
                return b""
    return data


def _text_from_content(content: bytes) -> str:
    """Collect shown strings from BT..ET blocks; Td/TD/T* and the '/" ops
    start a new line (the PyPDF2 extract_text convention our fixtures pin).

    Single-pass tokenizer over the whole stream — strings are consumed
    BEFORE operator matching, so 'BT'/'ET'/'Tj' byte sequences inside shown
    text (e.g. 'CAFETERIA') can never be mistaken for operators (a naive
    BT(.*?)ET block regex truncates exactly there)."""
    parts: list[str] = []
    line_open = False
    pending: list[str] = []  # strings seen since the last operator
    depth = 0  # BT nesting

    def emit(newline: bool) -> None:
        nonlocal line_open
        if pending:
            if newline and line_open:
                parts.append("\n")
            parts.append("".join(pending))
            line_open = True
            pending.clear()
        elif newline and line_open:
            parts.append("\n")

    i = 0
    n = len(content)
    while i < n:
        c = content[i : i + 1]
        if c == b"(":
            s, i = _literal_string(content, i)
            if depth > 0:
                pending.append(s)
        elif c == b"<" and content[i : i + 2] != b"<<":
            s, i = _hex_string(content, i)
            if depth > 0:
                pending.append(s)
        elif c == b"<":  # dictionary: skip the '<<'
            i += 2
        elif c.isalpha() or c in (b"'", b'"', b"*"):
            m = re.match(rb"[A-Za-z'\"*]+", content[i:])
            op = m.group(0)
            i += len(op)
            if op == b"BT":
                depth += 1
            elif op == b"ET":
                emit(newline=False)
                depth = max(depth - 1, 0)
            elif depth == 0:
                pending.clear()
            elif op in (b"Tj", b"TJ"):
                emit(newline=False)
            elif op in (b"'", b'"'):
                emit(newline=True)
            elif op in _NEWLINE_OPS:
                # positioning op: a new line starts at the next shown string
                if line_open:
                    parts.append("\n")
                    line_open = False
                pending.clear()
        else:
            i += 1
    emit(newline=False)
    text = "".join(parts)
    # PDF pages end without trailing breaks; normalize stray CRs
    return text.replace("\r\n", "\n").replace("\r", "\n").strip("\n")


_ESCAPES = {
    b"n": "\n", b"r": "\r", b"t": "\t", b"b": "\b", b"f": "\f",
    b"(": "(", b")": ")", b"\\": "\\",
}


def _literal_string(buf: bytes, start: int) -> tuple[str, int]:
    """Parse a `(...)` literal starting at buf[start] == '('.
    Handles nesting, backslash escapes and octal codes."""
    out: list[str] = []
    depth = 0
    i = start
    n = len(buf)
    while i < n:
        c = buf[i : i + 1]
        if c == b"\\":
            nxt = buf[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
            elif nxt.isdigit():
                m = re.match(rb"[0-7]{1,3}", buf[i + 1 :])
                out.append(chr(int(m.group(0), 8)))
                i += 1 + len(m.group(0))
            else:
                i += 2  # line continuation / unknown escape: drop
        elif c == b"(":
            depth += 1
            if depth > 1:
                out.append("(")
            i += 1
        elif c == b")":
            depth -= 1
            if depth == 0:
                return "".join(out), i + 1
            out.append(")")
            i += 1
        else:
            out.append(c.decode("latin-1"))
            i += 1
    return "".join(out), n


def _hex_string(buf: bytes, start: int) -> tuple[str, int]:
    end = buf.index(b">", start)
    hx = re.sub(rb"\s", b"", buf[start + 1 : end])
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii")).decode("latin-1"), end + 1
