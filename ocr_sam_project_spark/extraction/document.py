"""Per-document extraction orchestrator — pure Python, the unit of work the
Spark Arrow stage applies to every row.

Mirrors the reference's entry point B (SURVEY.md §3.2) with the OCR black box
replaced by deterministic parsing:

  sniff (PDF-text vs HTML) -> segment (E1-E4 / boilerplate strip) ->
  classify (C1) -> extract fields + BOTH person-source candidates with spans
  (X1-X7) -> validate+score on primary (X3) -> confidence (C4) -> urgency
  (C3) -> keywords.  The X8 enrichment merge, monto_total (A1), and priority
  (C2) are native Spark expressions in pipeline.stages.enrich_stage.

Never raises: unusable rows come back as a single segment with error set
(the DLQ/quarantine analog, template.yaml:88-90 -> error column).
"""

from __future__ import annotations

from typing import Any, Optional

from . import boilerplate, classifier, extractors, pdftext, segmentation
from .normalizers import parse_date_es
from .validators import validate_count

PDF_MAGIC = b"%PDF"
MIN_HTML_BYTES = 16          # validators.py:19-20 analog (1KB-50MB envelope,
MAX_HTML_BYTES = 50_000_000  # scaled down for web pages: reject empty/huge)


def extract_document(
    url: str,
    html_bytes: Optional[bytes],
    text: Optional[str],
    lang: Optional[str],
    pages_per_doc: int = 1,
) -> list[dict[str, Any]]:
    """One input page -> 1..N extracted segment records.

    Returns a list of flat dicts matching pipeline.schema.RAW_EXTRACTION_SCHEMA.
    """
    try:
        segments, declared = _segment(html_bytes, text, pages_per_doc)
    except Exception as e:  # defensive: quarantine, never throw in executor
        return [_error_record(url, lang, f"segmentation_error: {e}")]

    if not segments:
        return [_error_record(url, lang, "empty_document")]

    # declared-count validation (±10%-or-1 tolerance, validators.py:49-91;
    # driver step §3.1-6): stamped on every segment of the upload.
    count_valid = validate_count(len(segments), declared).success

    out: list[dict[str, Any]] = []
    for seg_no, seg_text in segments:
        try:
            rec = _extract_segment(url, seg_no, seg_text, lang)
        except Exception as e:
            rec = _error_record(url, lang, f"extraction_error: {e}")
            rec["seg_no"] = seg_no
        rec["declared_count"] = declared
        rec["count_valid"] = bool(count_valid)
        out.append(rec)
    return out


def _segment(
    html_bytes: Optional[bytes], text: Optional[str], pages_per_doc: int
) -> tuple[list[tuple[int, str]], int]:
    """Choose the PDF-text split path or the HTML boilerplate path.
    Returns (segments, declared_count) — declared_count comes from the X5
    config-page metadata on the multi-document path, 0 elsewhere
    (0 = auto-process, validators.py:63-68)."""
    if html_bytes is not None and len(html_bytes) >= MIN_HTML_BYTES:
        if len(html_bytes) > MAX_HTML_BYTES:
            raise ValueError("document exceeds size envelope")
        if html_bytes.startswith(PDF_MAGIC):
            # PDF path (E1-E4): parse the actual byte stream when it is a
            # real PDF (pdftext — the PyPDF2 page-slicing analog,
            # pdf_service.py:120-150); else fall back to the pre-extracted
            # text column's \f-separated page layer.
            pdf_pages = pdftext.extract_pages(html_bytes)
            layer = "\f".join(pdf_pages) if pdf_pages else (text or "")
            segs = segmentation.segment_document(layer, pages_per_doc)
            return [(s.seg_no, s.text) for s in segs if s.text], _declared(layer)
        html = boilerplate.decode_html(html_bytes)
        if "<" in html:
            main = boilerplate.extract_main_text(html)
            return ([(1, main)] if main else []), 0
    # no usable html column: fall back to raw text (single segment)
    if text and text.strip():
        segs = segmentation.segment_document(text, pages_per_doc)
        return [(s.seg_no, s.text) for s in segs if s.text], _declared(text)
    return [], 0


def _declared(raw_text: str) -> int:
    """cantidad_oficios from the config page (X5), if one exists."""
    pages = segmentation.split_pages(raw_text)
    if not segmentation.has_config_page(pages):
        return 0
    meta = extractors.extract_metadata(pages[0])
    return int(meta.get("cantidad_oficios_declarada", 0))


def _extract_segment(url: str, seg_no: int, seg_text: str, lang: Optional[str]) -> dict[str, Any]:
    doc_type = classifier.classify(seg_text, lang)
    fields = extractors.extract_fields(seg_text)

    # X8 inputs: primary = strict structured-table parse (the
    # structured_data.lista_clientes analog); fallback = loose X7 text regex
    # (post_ocr_validator.py:98-138).  The conditional injection itself is a
    # native Spark stage (pipeline.stages.enrich_stage) — this function only
    # emits both candidate lists plus the persons_expected signal.
    persons_primary = extractors.extract_persons_structured(seg_text)
    persons_fallback = extractors.extract_persons(seg_text)
    expected = extractors.should_have_persons(seg_text)

    by_field = {r["field"]: r["value"] for r in reversed(fields)}  # first wins
    numero_oficio = by_field.get("numero_oficio")
    fecha_raw = by_field.get("date_es") or by_field.get("fecha_emision")
    fecha_iso = parse_date_es(fecha_raw) if fecha_raw else None

    # X3 scores the PRIMARY structured output, as the reference's OCR service
    # scores its own structured_data (ocr_service.py:726-827) — enrichment
    # later injects fallback persons without re-scoring.
    val = extractors.validate_extraction(numero_oficio, fecha_raw, persons_primary)
    conf = classifier.confidence(
        has_structured=bool(persons_primary or fields),
        has_text=bool(seg_text),
        validation_score=val["confidence_score"] if (val["valid_count"] + val["invalid_count"]) else None,
    )
    keywords = extractors.find_keywords(seg_text)

    return {
        "url": url,
        "seg_no": seg_no,
        "doc_type": doc_type.tipo,
        "tramite": doc_type.tramite,
        "departamento": doc_type.departamento,
        "extracted_text": seg_text,
        "numero_oficio": numero_oficio,
        "fecha": fecha_iso,
        "autoridad": by_field.get("autoridad"),
        "fields": fields,
        "personas_primary": persons_primary,
        "personas_fallback": persons_fallback,
        "observaciones": "",
        "palabras_clave": keywords,
        "validation_score": val["confidence_score"],
        "validation_passed": bool(val["validation_passed"]),
        "persons_expected": bool(expected),
        "confianza": conf,
        "urgente": classifier.requires_urgent_action(doc_type.tipo),
        "error": None,
    }


def _error_record(url: str, lang: Optional[str], error: str) -> dict[str, Any]:
    return {
        "url": url,
        "seg_no": 1,
        "doc_type": "unknown",
        "tramite": "Desconocido",
        "departamento": "Desconocido",
        "extracted_text": "",
        "numero_oficio": None,
        "fecha": None,
        "autoridad": None,
        "fields": [],
        "personas_primary": [],
        "personas_fallback": [],
        "observaciones": "",
        "palabras_clave": [],
        "validation_score": 0.0,
        "validation_passed": False,
        "persons_expected": False,
        "confianza": "baja",
        "urgente": False,
        "declared_count": 0,
        "count_valid": False,
        "error": error,
    }
