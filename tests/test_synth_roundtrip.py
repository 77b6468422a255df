"""Byte-identity contract (pure Python): for every synthetic page, the
extractor must reproduce the generator's embedded main content EXACTLY
(per url+seg_no).  The golden text is derived from the construction, not
from the extractor — the test is not circular."""

from ocr_sam_project_spark.extraction.document import extract_document
from ocr_sam_project_spark.sources.synth import make_pages

N = 400


def test_byte_identical_extraction_roundtrip():
    pages = make_pages(N, seed=42)
    checked = 0
    for p in pages:
        if not p.golden:
            continue
        recs = extract_document(p.url, p.html, p.text, p.lang)
        got = {r["seg_no"]: r["extracted_text"] for r in recs}
        for seg_no, expected in p.golden:
            assert seg_no in got, (p.url, seg_no, sorted(got))
            assert got[seg_no] == expected, (
                p.url,
                seg_no,
                got[seg_no][:200],
                expected[:200],
            )
            # byte-level, not just str equality
            assert got[seg_no].encode("utf-8") == expected.encode("utf-8")
            checked += 1
    assert checked > N  # every content page + every pdf segment was compared


def test_generator_is_deterministic():
    a = make_pages(50, seed=42)
    b = make_pages(50, seed=42)
    assert [(p.url, p.html, p.text, p.lang, p.golden) for p in a] == [
        (p.url, p.html, p.text, p.lang, p.golden) for p in b
    ]


def test_generator_covers_all_16_types_and_paths():
    pages = make_pages(300, seed=42)
    langs = {p.lang for p in pages}
    assert "en" in langs and "es" in langs
    pdfish = [p for p in pages if p.html.startswith(b"%PDF")]
    assert len(pdfish) >= 10
    multi = [p for p in pdfish if len(p.golden) > 1]
    assert multi, "pdf pages must contain multi-document splits"
    quarantine = [p for p in pages if not p.golden]
    assert quarantine, "generator must emit quarantine rows"
