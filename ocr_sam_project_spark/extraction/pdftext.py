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

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", re.S)
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


def _scan_objects(pdf: bytes) -> dict[int, bytes]:
    return {int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(pdf)}


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
    m = _STREAM_RE.search(body)
    if not m:
        return b""
    data = m.group(1)
    if b"/FlateDecode" in body.split(b"stream", 1)[0]:
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
    start a new line (the PyPDF2 extract_text convention our fixtures pin)."""
    parts: list[str] = []
    for block in re.findall(rb"BT(.*?)ET", content, re.S):
        line_open = False
        i = 0
        n = len(block)
        pending: list[str] = []  # strings seen since the last operator

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
                line_open = True

        while i < n:
            c = block[i : i + 1]
            if c == b"(":
                s, i = _literal_string(block, i)
                pending.append(s)
            elif c == b"<" and block[i : i + 2] != b"<<":
                s, i = _hex_string(block, i)
                pending.append(s)
            elif c == b"<":  # dictionary: skip
                i += 2
            elif c.isalpha() or c in (b"'", b'"', b"*"):
                m = re.match(rb"[A-Za-z'\"*]+", block[i:])
                op = m.group(0)
                i += len(op)
                if op == b"Tj":
                    emit(newline=False)
                elif op in (b"'", b'"'):
                    emit(newline=True)
                elif op == b"TJ":
                    emit(newline=False)
                elif op in _NEWLINE_OPS:
                    # positioning op: pending strings (there should be none)
                    # flush, and the next shown string begins a new line
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
