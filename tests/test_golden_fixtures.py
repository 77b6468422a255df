"""End-to-end golden fixture suite (FIXTURES.md §2): hand-authored pages with
hand-computed expected extractions, run through the REAL Spark pipeline.
The expected JSONs are written by hand from reference semantics — an oracle
independent of the extractor code."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from ocr_sam_project_spark.pipeline.schema import PAGES_SCHEMA
from ocr_sam_project_spark.pipeline.stages import extract_stage

HERE = os.path.dirname(os.path.abspath(__file__))
FIX = os.path.join(HERE, "fixtures")


@pytest.fixture(scope="module", autouse=True)
def _built():
    from tests.fixtures.make_fixtures import write_all

    write_all()


def _expected() -> dict[str, dict]:
    out = {}
    for path in glob.glob(os.path.join(FIX, "expected", "*.json")):
        with open(path) as f:
            e = json.load(f)
        out[e["url"]] = e
    return out


@pytest.fixture(scope="module")
def results(spark, _built):
    import datetime

    rows = []
    ts = datetime.datetime(2025, 1, 1)
    for path in glob.glob(os.path.join(FIX, "pages", "*.html")):
        name = os.path.splitext(os.path.basename(path))[0]
        with open(path, "rb") as f:
            html = f.read()
        exp = json.load(open(os.path.join(FIX, "expected", name + ".json")))
        rows.append((f"fixture://{name}", ts, html, None, exp["lang"]))
    for path in glob.glob(os.path.join(FIX, "pages", "*.txt")):
        name = os.path.splitext(os.path.basename(path))[0]
        with open(path) as f:
            text = f.read()
        exp = json.load(open(os.path.join(FIX, "expected", name + ".json")))
        rows.append((f"fixture://{name}", ts, b"%PDF-1.4 fixture", text, exp["lang"]))
    # quarantine row
    rows.append(("fixture://quarantine_empty", ts, b"", "", "es"))
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)
    df = extract_stage(pages)
    by_url: dict[str, list] = {}
    for r in df.collect():
        by_url.setdefault(r.url, []).append(r)
    for segs in by_url.values():
        segs.sort(key=lambda r: r.seg_no)
    return by_url


def test_every_fixture_covered(results):
    exp = _expected()
    for url in exp:
        assert url in results, f"no extraction rows for {url}"


@pytest.mark.parametrize(
    "name",
    ["embargo_worked_example", "citacion_simple", "sucesion_four_token_name", "english_unknown"],
)
def test_html_fixture_golden(results, name):
    url = f"fixture://{name}"
    exp = json.load(open(os.path.join(FIX, "expected", name + ".json")))
    segs = results[url]
    assert len(segs) == exp["seg_count"]
    r = segs[0]
    # THE contract: byte-identical extracted text
    assert r.extracted_text == exp["extracted_text"]
    assert r.extracted_text.encode("utf-8") == exp["extracted_text"].encode("utf-8")
    assert r.doc_type == exp["doc_type"]
    assert r.tramite == exp["tramite"]
    assert r.departamento == exp["departamento"]
    assert r.numero_oficio == exp["numero_oficio"]
    assert r.fecha == exp["fecha"]
    assert r.autoridad == exp["autoridad"]
    assert r.priority == exp["priority"]
    assert bool(r.urgente) == exp["urgente"]
    assert bool(r.validation_passed) == exp["validation_passed"]
    assert float(r.monto_total) == exp["monto_total"]
    got_personas = [
        {
            "secuencia": p.secuencia,
            "nombre_completo": p.nombre_completo,
            "numero_identificacion": p.numero_identificacion,
            "monto_numerico": p.monto_numerico,
        }
        for p in (r.personas or [])
    ]
    assert got_personas == exp["personas"]
    assert r.error is None


def test_pdf_fixture_split_golden(results):
    exp = json.load(open(os.path.join(FIX, "expected", "pdf_multidoc_split.json")))
    segs = results["fixture://pdf_multidoc_split"]
    assert len(segs) == len(exp["segments"])
    for got, want in zip(segs, exp["segments"]):
        assert got.seg_no == want["seg_no"]
        assert got.extracted_text == want["extracted_text"]
        assert got.doc_type == want["doc_type"]


def test_quarantine_fixture(results):
    segs = results["fixture://quarantine_empty"]
    assert len(segs) == 1 and segs[0].error == "empty_document"
