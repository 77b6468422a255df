"""Multi-document segmentation E1-E4 — pure Python.

The reference splits one uploaded PDF into N oficios
(src/services/pdf_service.py:36-223): find separator pages (short pages
containing one of six marker substrings), slice page ranges between them
(plus the trailing segment after the last separator), else fall back to a
fixed pages-per-document split that skips a leading config page.  We keep
those semantics verbatim over a list of *text* pages (the PDF text layer):
pages are the '\\f'-separated chunks of the raw document text.

Byte-identity contract: a segment's extracted text is the whitespace-
normalized text of its pages joined with '\\n' (same normalization as the
HTML block path, so downstream extractors see one uniform text shape).
"""

from __future__ import annotations

from typing import NamedTuple

from . import patterns as P

PAGE_BREAK = "\f"


class Segment(NamedTuple):
    seg_no: int        # 1-based oficio_number (W2, pdf_service.py:110-171)
    page_start: int    # 0-based inclusive
    page_end: int      # 0-based exclusive
    text: str          # normalized segment text


def split_pages(raw_text: str) -> list[str]:
    """Split raw document text into pages on form-feed."""
    return raw_text.split(PAGE_BREAK)


def is_separator_page(page_text: str) -> bool:
    """F2 — page contains a separator marker AND is short
    (pdf_service.py:69-104: substring check on lowered text, len<200)."""
    low = page_text.lower()
    if len(low.strip()) >= P.SEPARATOR_MAX_LEN:
        return False
    return any(marker in low for marker in P.SEPARATOR_SUBSTRINGS)


def has_config_page(pages: list[str]) -> bool:
    """F3 — first page is a config sheet (pdf_service.py:209-223): only when
    the document has >=2 pages and page 0 mentions a config keyword."""
    if len(pages) < 2:
        return False
    low = pages[0].lower()
    return any(kw in low for kw in P.CONFIG_KEYWORDS)


def _normalize_segment(pages: list[str], start: int, end: int) -> str:
    parts = []
    for p in pages[start:end]:
        t = " ".join(p.split())
        if t:
            parts.append(t)
    return "\n".join(parts)


def split_by_separators(pages: list[str], separators: list[int]) -> list[Segment]:
    """E2 — one segment per separator (pages before it), plus the trailing
    segment after the last separator (pdf_service.py:106-147)."""
    segments: list[Segment] = []
    seg_no = 1
    for i, sep in enumerate(separators):
        start = 0 if i == 0 else separators[i - 1] + 1
        end = sep
        if end > start:
            segments.append(Segment(seg_no, start, end, _normalize_segment(pages, start, end)))
            seg_no += 1
    if separators and separators[-1] + 1 < len(pages):
        start = separators[-1] + 1
        end = len(pages)
        if end > start:
            segments.append(Segment(seg_no, start, end, _normalize_segment(pages, start, end)))
    return segments


def split_fixed(pages: list[str], pages_per_doc: int = 1) -> list[Segment]:
    """E3 — fixed-size fallback split, skipping a leading config page
    (pdf_service.py:149-177)."""
    segments: list[Segment] = []
    start = 1 if has_config_page(pages) else 0
    seg_no = 1
    cur = start
    total = len(pages)
    step = max(1, pages_per_doc)
    while cur < total:
        end = min(cur + step, total)
        segments.append(Segment(seg_no, cur, end, _normalize_segment(pages, cur, end)))
        cur = end
        seg_no += 1
    return segments


def segment_document(raw_text: str, pages_per_doc: int = 1) -> list[Segment]:
    """E1 — split driver: separator split when separators exist, else the
    fixed-size fallback (pdf_service.py:36-67)."""
    pages = split_pages(raw_text)
    separators = [i for i, p in enumerate(pages) if is_separator_page(p)]
    if separators:
        segs = split_by_separators(pages, separators)
        if segs:
            return segs
    return split_fixed(pages, pages_per_doc)
