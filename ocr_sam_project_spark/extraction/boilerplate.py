"""HTML main-content extraction (boilerplate strip) — pure Python.

This is the web-payload analog of the reference's PDF split/text stage
(E1-E4, src/services/pdf_service.py:36-223): one raw `html` blob -> the
main-content text.  Per the north_rule it is a deterministic DOM heuristic:

1. parse with the stdlib ``html.parser`` (no external deps),
2. prune a tag blacklist (script/style/nav/header/footer/aside/form/...),
3. cut the DOM into text blocks at block-level tags,
4. score each block by link density (chars inside <a> / total chars),
5. keep non-empty blocks with link density < LINK_DENSITY_MAX,
6. join kept blocks with a single '\\n'; block text is whitespace-collapsed.

The output is the byte-identical `extracted_text` contract: fully
deterministic, no locale, no randomness, stable block order (document order).
Spans emitted by downstream extractors are offsets into this exact string.
"""

from __future__ import annotations

from html import unescape
from html.parser import HTMLParser
from typing import NamedTuple

# Ancestors whose entire subtree is boilerplate by construction.
BLACKLIST: frozenset[str] = frozenset(
    {
        "script", "style", "noscript", "template", "head", "nav", "header",
        "footer", "aside", "form", "button", "select", "option", "iframe",
        "svg", "figure", "figcaption",
    }
)

# Tags that terminate the current text block.
BLOCK_TAGS: frozenset[str] = frozenset(
    {
        "p", "div", "section", "article", "main", "body", "li", "ul", "ol",
        "h1", "h2", "h3", "h4", "h5", "h6", "table", "tr", "td", "th",
        "blockquote", "pre", "br", "hr", "dl", "dt", "dd",
    }
)

VOID_TAGS: frozenset[str] = frozenset({"br", "hr", "img", "input", "meta", "link"})

LINK_DENSITY_MAX = 0.34


class Block(NamedTuple):
    text: str       # whitespace-collapsed, stripped
    link_chars: int
    total_chars: int

    @property
    def link_density(self) -> float:
        return self.link_chars / self.total_chars if self.total_chars else 1.0


class _BlockParser(HTMLParser):
    """Single-pass SAX-style block builder."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[Block] = []
        self._buf: list[str] = []
        self._link_chars = 0
        self._total_chars = 0
        self._black_depth = 0
        self._link_depth = 0

    # -- tag events ---------------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in BLACKLIST:
            self._black_depth += 1
            return
        if tag in BLOCK_TAGS:
            self._flush()
        if tag == "a":
            self._link_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in BLACKLIST:
            if self._black_depth > 0:
                self._black_depth -= 1
            return
        if tag in BLOCK_TAGS and tag not in VOID_TAGS:
            self._flush()
        if tag == "a" and self._link_depth > 0:
            self._link_depth -= 1

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in BLOCK_TAGS:
            self._flush()

    # -- text ---------------------------------------------------------------
    def handle_data(self, data: str) -> None:
        if self._black_depth > 0 or not data:
            return
        self._buf.append(data)
        n = len(data.strip())
        self._total_chars += n
        if self._link_depth > 0:
            self._link_chars += n

    # -- block assembly -----------------------------------------------------
    def _flush(self) -> None:
        raw = "".join(self._buf)
        text = " ".join(raw.split())
        if text:
            self.blocks.append(Block(text, self._link_chars, self._total_chars))
        self._buf = []
        self._link_chars = 0
        self._total_chars = 0

    def close(self) -> None:  # flush trailing text
        super().close()
        self._flush()


def extract_blocks(html: str) -> list[Block]:
    """Parse HTML into candidate text blocks (document order)."""
    p = _BlockParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        # malformed HTML: return whatever was parsed before the failure —
        # never raise from inside an Arrow batch (quarantine handles truly
        # unusable rows upstream).
        p._flush()
    return p.blocks


def extract_main_text(html: str) -> str:
    """Boilerplate-strip: keep low-link-density blocks, join with '\\n'.

    This string is the byte-identical-per-url contract.
    """
    kept = [
        b.text
        for b in extract_blocks(html)
        if b.total_chars > 0 and b.link_density < LINK_DENSITY_MAX
    ]
    return "\n".join(kept)


def decode_html(html_bytes: bytes) -> str:
    """Deterministic bytes -> str: UTF-8 with replacement (never throws)."""
    return html_bytes.decode("utf-8", errors="replace")
