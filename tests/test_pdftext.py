"""Minimal-PDF byte-stream parsing (extraction.pdftext) — hand-built PDFs
with plain and FlateDecode streams, /Pages-tree ordering, fallback rules."""

from __future__ import annotations

import zlib

from ocr_sam_project_spark.extraction import pdftext
from ocr_sam_project_spark.extraction.document import extract_document


def _content(lines: list[str]) -> bytes:
    ops = b"BT /F1 12 Tf "
    for j, ln in enumerate(lines):
        esc = ln.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        if j > 0:
            ops += b"0 -14 Td "
        ops += b"(" + esc.encode("latin-1") + b") Tj "
    return ops + b"ET"


def mini_pdf(pages: list[list[str]], flate: bool = False) -> bytes:
    """Build a classic (xref-less-scannable) PDF: catalog -> pages -> kids."""
    objs: list[bytes] = []
    kid_refs = []
    next_num = 3
    page_objs = []
    for lines in pages:
        page_num, cont_num = next_num, next_num + 1
        next_num += 2
        kid_refs.append(f"{page_num} 0 R".encode())
        page_objs.append(
            (page_num, b"<< /Type /Page /Parent 2 0 R /Contents "
             + f"{cont_num} 0 R".encode() + b" >>")
        )
        raw = _content(lines)
        data, filt = (zlib.compress(raw), b" /Filter /FlateDecode") if flate else (raw, b"")
        page_objs.append(
            (cont_num, b"<< /Length " + str(len(data)).encode() + filt
             + b" >>\nstream\n" + data + b"\nendstream")
        )
    body = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [" + b" ".join(kid_refs)
         + b"] /Count " + str(len(pages)).encode() + b" >>"),
        *page_objs,
    ]
    out = b"%PDF-1.4\n"
    for num, payload in body:
        out += f"{num} 0 obj\n".encode() + payload + b"\nendobj\n"
    return out + b"%%EOF\n"


def test_plain_stream_two_pages():
    pdf = mini_pdf([["Oficio No. JE-1-2025", "linea dos"], ["pagina dos"]])
    assert pdftext.extract_pages(pdf) == [
        "Oficio No. JE-1-2025\nlinea dos",
        "pagina dos",
    ]


def test_flate_stream_and_escapes():
    pdf = mini_pdf([["monto (B/. 1,500.00)", r"ruta C:\temp"]], flate=True)
    assert pdftext.extract_pages(pdf) == ["monto (B/. 1,500.00)\nruta C:\\temp"]


def test_kids_order_beats_object_order():
    # swap Kids order relative to object numbers
    pdf = mini_pdf([["primera"], ["segunda"]])
    swapped = pdf.replace(b"/Kids [3 0 R 5 0 R]", b"/Kids [5 0 R 3 0 R]")
    assert pdftext.extract_pages(swapped) == ["segunda", "primera"]


def test_indirect_length_does_not_misslice():
    """`/Length 6 0 R` (an indirect reference) must NOT be read as a 6-byte
    stream length — naively doing so slices the stream mid-way and emits
    garbage partial text.  An indirect /Length is out-of-subset: the object
    scan falls back to the nearest endobj, which still frames a PLAIN-text
    stream correctly (compressed ones fail zlib and degrade to [])."""
    pdf = mini_pdf([["contenido legible de la pagina"]])
    raw_len = b"/Length " + str(len(_content(["contenido legible de la pagina"]))).encode()
    hacked = pdf.replace(raw_len, b"/Length 6 0 R /Foo")
    assert raw_len in pdf and b"/Length 6 0 R" in hacked
    # plain stream + nearest-endobj fallback -> full text, not a 6-byte slice
    assert pdftext.extract_pages(hacked) == ["contenido legible de la pagina"]


def test_garbage_pdf_yields_empty():
    assert pdftext.extract_pages(b"%PDF-1.4 synthetic-text-layer") == []
    assert pdftext.extract_pages(b"%PDF-1.4\n1 0 obj << >>\nendobj\n") == []


def test_document_pdf_branch_parses_real_bytes():
    """extract_document on real PDF bytes: separator page splits oficios
    exactly like the text-layer path (pdf_service.py:79-118 semantics)."""
    pdf = mini_pdf(
        [
            ["Oficio No. JE-1-2025 se decreta el secuestro civil de los bienes"],
            ["SEPARADOR DE OFICIOS", "====================="],
            ["Oficio No. JE-2-2025 se autoriza el allanamiento del inmueble"],
        ]
    )
    recs = extract_document("pdf://real", pdf, None, "es")
    texts = [(r["seg_no"], r["extracted_text"]) for r in recs]
    assert texts == [
        (1, "Oficio No. JE-1-2025 se decreta el secuestro civil de los bienes"),
        (2, "Oficio No. JE-2-2025 se autoriza el allanamiento del inmueble"),
    ]
    assert [r["doc_type"] for r in recs] == ["secuestro_civil", "allanamiento"]


def test_document_pdf_branch_falls_back_to_text_layer():
    """Fake %PDF bytes (the synthetic corpus shape) -> text column layer."""
    recs = extract_document(
        "pdf://fake",
        b"%PDF-1.4 synthetic-text-layer",
        "Oficio No. JE-9-2025 se decreta formal embargo sobre las cuentas",
        "es",
    )
    assert len(recs) == 1
    assert recs[0]["doc_type"] == "embargo"
