"""Unit tests for the pure extraction layer: patterns, classifier,
segmentation, boilerplate strip, extractors (no Spark)."""

import pytest

from ocr_sam_project_spark.extraction import (
    boilerplate,
    classifier,
    extractors,
    patterns as P,
    segmentation,
)
from ocr_sam_project_spark.extraction.document import extract_document


# --------------------------------------------------------------------------
# X1 pattern bank (ocr_service.py:746-753): match / non-match pairs
# --------------------------------------------------------------------------
@pytest.mark.parametrize(
    "field,good,bad",
    [
        ("cedula", "8-947-865", "88-94722-86555"),
        ("cedula", "1-123-4567", "abc"),
        ("ruc", "123-456789-12", "no digits"),
        ("oficio_number", "JE-1234-2025", "XX-1"),
        ("oficio_number", "No. 482", "numero"),
        ("phone", "226-7788", "22-33"),
        ("money", "B/. 1,500.00", "1500"),
        ("money", "B/.467.50", "$467"),
        ("date_es", "23 de mayo de 2025", "23/05/2025"),
    ],
)
def test_panama_patterns(field, good, bad):
    assert P.PANAMA[field].search(good), (field, good)
    assert not P.PANAMA[field].search(bad), (field, bad)


# --------------------------------------------------------------------------
# C1 classifier — all 16 types route correctly; unknown paths
# --------------------------------------------------------------------------
TYPE_SAMPLES = {
    "secuestro_civil": "se decreta el secuestro civil de los bienes",
    "aprehension": "se ordena la aprehensión de los fondos",
    "traslado_fondos": "solicitud de traslado de fondos aprehendidos",
    "levantamiento": "se ordena el levantamiento de la medida",
    "embargo": "se decreta formal embargo sobre las cuentas",
    "adjudicacion_sucesion": "adjudicación en proceso de sucesión de bienes",
    "investigacion_sucesion": "dentro del proceso de sucesión se investiga",
    "solo_notificacion": "la presente es de solo notificación",
    "citacion": "se cita mediante citación formal a comparecer",
    "investigacion_civil": "en la investigación civil que se adelanta",
    "investigacion_familia": "en la investigación de familia en curso",
    "investigacion_penal": "dentro de la investigación penal se ordena",
    "informacion_clientes": "solicitud de información de clientes",
    "inspeccion_ocular": "se practicará inspección ocular",
    "allanamiento": "se autoriza el allanamiento del inmueble",
    "diligencia_exhibitoria": "se decreta diligencia exhibitoria",
}


@pytest.mark.parametrize("tipo,text", list(TYPE_SAMPLES.items()))
def test_classify_each_type(tipo, text):
    assert classifier.classify(text).tipo == tipo


def test_classify_unknown():
    assert classifier.classify("texto sin palabras clave").tipo == "unknown"
    assert classifier.classify("", "es").tipo == "unknown"
    assert classifier.classify(None).tipo == "unknown"
    # non-Spanish gate
    assert classifier.classify("embargo something", "en").tipo == "unknown"


def test_taxonomy_mapping():
    # spot-check (tramite, departamento) pairs from ocr_service.py:305-321
    t = classifier.BY_TIPO["embargo"]
    assert (t.tramite, t.departamento) == ("Embargos", "Civil")
    t = classifier.BY_TIPO["allanamiento"]
    assert (t.tramite, t.departamento) == ("Investigaciones", "Penal")
    t = classifier.BY_TIPO["citacion"]
    assert (t.tramite, t.departamento) == ("Citaciones", "Civil")
    assert len(classifier.TAXONOMY) == 16


# --------------------------------------------------------------------------
# C2/C3/C4 (crm_integrator/app.py:404-447; ocr_service.py:629-638)
# --------------------------------------------------------------------------
def test_priority():
    assert classifier.priority("embargo", 0.0) == "High"
    assert classifier.priority("solo_notificacion", 60000.0) == "High"
    assert classifier.priority("solo_notificacion", 20000.0) == "Medium"
    assert classifier.priority("solo_notificacion", 10000.0) == "Medium"
    assert classifier.priority(None, 0.0) == "Medium"
    # accent-free slugs still match the accented keyword list
    assert classifier.priority("aprehension", 0.0) == "High"
    assert classifier.priority("citacion", 0.0) == "High"


def test_urgency():
    assert classifier.requires_urgent_action("levantamiento")
    assert not classifier.requires_urgent_action("solo_notificacion")


def test_confidence():
    assert classifier.confidence(True, True) == "alta"
    assert classifier.confidence(False, True) == "media"
    assert classifier.confidence(False, False) == "baja"
    assert classifier.confidence(False, True, validation_score=0.9) == "alta"
    assert classifier.confidence(True, True, validation_score=0.3) == "baja"


# --------------------------------------------------------------------------
# E1-E4 segmentation (pdf_service.py:36-223)
# --------------------------------------------------------------------------
def test_separator_page_predicate():
    assert segmentation.is_separator_page("SEPARADOR DE OFICIOS")
    assert segmentation.is_separator_page("=== fin ===")
    # long pages never count as separators even with the marker (len>=200)
    assert not segmentation.is_separator_page("separador " + "x" * 300)
    assert not segmentation.is_separator_page("página normal de contenido")


def test_separator_split_with_trailing_segment():
    pages = ["doc uno pagina uno", "doc uno pagina dos", "===", "doc dos", "===", "doc tres"]
    segs = segmentation.segment_document("\f".join(pages))
    assert [(s.seg_no, s.page_start, s.page_end) for s in segs] == [
        (1, 0, 2), (2, 3, 4), (3, 5, 6),
    ]
    assert segs[0].text == "doc uno pagina uno\ndoc uno pagina dos"
    assert segs[2].text == "doc tres"


def test_separator_split_no_trailing():
    pages = ["contenido a", "===", "contenido b", "==="]
    segs = segmentation.segment_document("\f".join(pages))
    assert [(s.seg_no, s.page_start, s.page_end) for s in segs] == [(1, 0, 1), (2, 2, 3)]


def test_fixed_split_skips_config_page():
    pages = ["empresa: ACME\ncantidad_oficios: 2", "doc uno", "doc dos"]
    segs = segmentation.segment_document("\f".join(pages))
    # no separators -> fixed split; first page is config -> skipped
    assert [(s.seg_no, s.page_start, s.page_end) for s in segs] == [(1, 1, 2), (2, 2, 3)]


def test_fixed_split_single_page_doc():
    segs = segmentation.segment_document("solo una pagina")
    assert len(segs) == 1 and segs[0].text == "solo una pagina"


# --------------------------------------------------------------------------
# boilerplate strip
# --------------------------------------------------------------------------
def test_boilerplate_strip_keeps_main_drops_chrome():
    html = """<html><head><title>T</title><script>x()</script></head><body>
    <header>Portal <a href="/a">uno</a></header>
    <nav><a href="/b">menu</a></nav>
    <div>Vea: <a href="/c">enlace uno largo</a> <a href="/d">enlace dos largo</a></div>
    <article><p>Primer párrafo del contenido principal.</p>
    <p>Segundo párrafo con más texto útil.</p></article>
    <footer>© 2025 <a href="/e">términos</a></footer>
    </body></html>"""
    out = boilerplate.extract_main_text(html)
    assert out == "Primer párrafo del contenido principal.\nSegundo párrafo con más texto útil."


def test_boilerplate_link_density_rejects_linky_block():
    html = '<body><div><a href="/x">solo enlaces aqui</a> <a href="/y">y mas enlaces</a></div><p>texto real sin enlaces de verdad</p></body>'
    assert boilerplate.extract_main_text(html) == "texto real sin enlaces de verdad"


def test_boilerplate_never_raises_on_garbage():
    assert isinstance(boilerplate.extract_main_text("<<<>>>&&&"), str)
    assert boilerplate.extract_main_text("") == ""


# --------------------------------------------------------------------------
# X5 metadata (metadata_service.py:49-123)
# --------------------------------------------------------------------------
def test_metadata_extraction():
    text = "Empresa: Banco Uno\ncantidad_oficios: 7\norigen: Colón\nobservaciones: lote x\nfecha: 01/02/2025\noperador: ana"
    m = extractors.extract_metadata(text)
    # Reference quirk kept for parity: metadata_service.py:53 flattens
    # newlines to spaces BEFORE applying `([^\n\r]+)` captures, so free-text
    # fields run to end-of-document.  Pinned, not fixed.
    assert m["empresa"].startswith("banco uno")
    assert m["cantidad_oficios_declarada"] == 7
    assert m["origen"].startswith("colón")
    assert m["extraction_success"] is True
    assert m["extracted_fields_count"] == 6


def test_metadata_defaults():
    m = extractors.extract_metadata("pagina sin encabezados")
    assert m["empresa"] == "No especificado"
    assert m["cantidad_oficios_declarada"] == 0
    assert m["extraction_success"] is False


def test_metadata_alternative_patterns():
    m = extractors.extract_metadata("cliente: ACME\ntotal_oficios: 3")
    assert m["empresa"].startswith("acme")
    assert m["cantidad_oficios_declarada"] == 3


# --------------------------------------------------------------------------
# X6/X7 person extraction (post_ocr_validator.py:72-138)
# --------------------------------------------------------------------------
WORKED_EXAMPLE = "146-2025 | MINI SUPER AYACUCHO/RICARDO QIU ZHANG | 8-947-865, D.V. 86 | 467.50"


def test_should_have_persons():
    assert extractors.should_have_persons("N° Exp. | Agente Económico | R.U.C. | Monto B/.")
    assert extractors.should_have_persons("lista: 8-123-456 por 1,500.00")
    assert not extractors.should_have_persons("texto normal sin indicadores")


def test_person_row_worked_example():
    # the verbatim worked example from ocr_service.py:349-366
    persons = extractors.extract_persons(WORKED_EXAMPLE)
    assert len(persons) == 1
    p = persons[0]
    assert p["nombre_completo"] == "MINI SUPER AYACUCHO/RICARDO QIU ZHANG"
    assert p["numero_identificacion"].startswith("8-947-865")
    assert p["monto_numerico"] == 467.50
    assert p["secuencia"] == 1
    # span points back into the text
    assert WORKED_EXAMPLE[p["start"]:p["end"]].startswith("MINI SUPER")


def test_person_rows_multi():
    text = "MARIA GONZALEZ PEREZ | 8-111-222 | 1,500.00\nJOSE RAMIREZ | 2-333-444 | 250.75"
    persons = extractors.extract_persons(text)
    assert [p["secuencia"] for p in persons] == [1, 2]
    assert extractors.monto_total(persons) == pytest.approx(1750.75)


# --------------------------------------------------------------------------
# X3 validation scoring (ocr_service.py:726-827)
# --------------------------------------------------------------------------
def test_validation_scoring():
    persons = [{"nombre_completo": "A B", "numero_identificacion": "8-111-222"}]
    v = extractors.validate_extraction("JE-123-2025", "23 de mayo de 2025", persons)
    # valid: numero_oficio, fecha, clientes_validos, total_clientes -> 4/4
    assert v["confidence_score"] == 1.0 and v["validation_passed"]

    v = extractors.validate_extraction("bad!", "not a date", persons)
    # valid: clientes_validos, total_clientes (2) vs invalid oficio+fecha (2)
    assert v["confidence_score"] == 0.5 and not v["validation_passed"]


def test_validation_invalid_cedula_counts_against():
    persons = [{"nombre_completo": "A", "numero_identificacion": "no-id"}]
    v = extractors.validate_extraction("JE-1-2025", None, persons)
    # valid: oficio, clientes_validos(0), total_clientes -> 3; invalid: cedula_A -> 1
    assert v["confidence_score"] == pytest.approx(0.75)


# --------------------------------------------------------------------------
# end-to-end single document (pure python path)
# --------------------------------------------------------------------------
def test_extract_document_html_path():
    html = (
        "<html><body><nav><a href='/'>x</a></nav>"
        "<article><p>Oficio No. JE-482-2025</p>"
        "<p>Juzgado Primero de lo Civil. Panamá, 23 de mayo de 2025.</p>"
        "<p>Se decreta formal embargo sobre las cuentas.</p>"
        f"<p>{WORKED_EXAMPLE}</p></article></body></html>"
    ).encode()
    recs = extract_document("u1", html, None, "es")
    assert len(recs) == 1
    r = recs[0]
    assert r["doc_type"] == "embargo"
    assert r["numero_oficio"] == "JE-482-2025"
    assert r["fecha"] == "2025-05-23"
    assert r["autoridad"].lower().startswith("juzgado primero")
    # raw record carries BOTH person-source candidates (X8 merges Spark-side)
    assert len(r["personas_primary"]) == 1
    assert r["personas_primary"][0]["monto_numerico"] == 467.5
    assert len(r["personas_fallback"]) == 1
    assert r["urgente"]
    assert r["error"] is None
    # spans index into extracted_text
    f0 = next(f for f in r["fields"] if f["field"] == "numero_oficio")
    assert r["extracted_text"][f0["start"]:f0["end"]] == "JE-482-2025"


def test_extract_document_pdf_path_splits():
    pages = [
        "empresa: ACME\ncantidad_oficios: 2",
        "Oficio No. JE-1-2025 se decreta el secuestro civil",
        "SEPARADOR DE OFICIOS",
        "Oficio No. JE-2-2025 citación formal a comparecer",
    ]
    recs = extract_document("u2", b"%PDF-1.4 x", "\f".join(pages), "es")
    assert [r["seg_no"] for r in recs] == [1, 2]
    assert recs[0]["doc_type"] == "secuestro_civil"
    assert recs[1]["doc_type"] == "citacion"


def test_extract_document_declared_count_validation():
    # declared 2, extracted 2 -> valid
    pages = [
        "empresa: ACME\ncantidad_oficios: 2",
        "Oficio No. JE-1-2025 embargo",
        "SEPARADOR DE OFICIOS",
        "Oficio No. JE-2-2025 citación",
    ]
    recs = extract_document("u", b"%PDF-1.4 x", "\f".join(pages), "es")
    assert all(r["declared_count"] == 2 and r["count_valid"] for r in recs)

    # declared 9, extracted 2 -> outside ±10%-or-1 tolerance
    pages[0] = "empresa: ACME\ncantidad_oficios: 9"
    recs = extract_document("u", b"%PDF-1.4 x", "\f".join(pages), "es")
    assert all(r["declared_count"] == 9 and not r["count_valid"] for r in recs)

    # no config page -> declared 0 -> auto-process passes
    recs = extract_document("u", b"%PDF-1.4 x", "doc uno\fSEPARADOR DE OFICIOS\fdoc dos", "es")
    assert all(r["declared_count"] == 0 and r["count_valid"] for r in recs)


def test_extract_document_quarantine():
    recs = extract_document("u3", b"", "", "es")
    assert len(recs) == 1 and recs[0]["error"] == "empty_document"


def test_extract_document_never_raises_on_garbage():
    recs = extract_document("u4", bytes(range(256)), None, "es")
    assert isinstance(recs, list) and recs
