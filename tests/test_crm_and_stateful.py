"""Tests for the CRM-stage projections and the stateful streaming lineage."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def extractions(spark, pages_parquet):
    from ocr_sam_project_spark.pipeline.stages import extract_stage

    df = extract_stage(spark.read.parquet(pages_parquet))
    df.cache()
    df.count()
    return df


def test_cases_projection_shapes_and_rules(extractions):
    from ocr_sam_project_spark.pipeline.crm import cases_projection

    cases = cases_projection(extractions)
    rows = cases.collect()
    assert rows
    for r in rows:
        assert len(r.asunto) <= 100
        assert len(r.texto_completo) <= 4000
        assert 0.0 <= r.monto_total <= 999999999.0
        # N5 gate: fecha_emision is ISO or the sentinel
        assert r.fecha_emision == "1900-01-01" or len(r.fecha_emision) == 10
        assert r.prioridad in ("High", "Medium", "Low")
    # urgent types got High priority
    urg = cases.filter(F.col("tipo_oficio_detectado") == "embargo").select("prioridad").distinct().collect()
    assert [r.prioridad for r in urg] == ["High"]


def test_case_entities_use_v2_name_convention(extractions):
    from ocr_sam_project_spark.pipeline.crm import case_entities_projection

    ents = case_entities_projection(extractions)
    row = (
        ents.filter(F.size(F.split(F.col("nombre_completo"), " ")) >= 4)
        .select("nombre_completo", "apellido_paterno", "apellido_materno")
        .first()
    )
    assert row is not None
    toks = row.nombre_completo.split()
    assert row.apellido_paterno == toks[-2]  # v2 (crm_integrator/app.py:389-393)
    assert row.apellido_materno == toks[-1]


def test_stateful_running_lineage(spark, tmp_path):
    from ocr_sam_project_spark.pipeline.schema import PAGES_SCHEMA
    from ocr_sam_project_spark.pipeline.stages import extract_stage
    from ocr_sam_project_spark.sources.io import write_pages_parquet
    from ocr_sam_project_spark.streaming.stateful import running_lineage
    from ocr_sam_project_spark.streaming.stream_job import read_pages_stream

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    write_pages_parquet(f"{in_dir}/a.parquet", n=80, seed=42)
    write_pages_parquet(f"{in_dir}/b.parquet", n=40, seed=9)

    num_parts = 4
    pages = read_pages_stream(spark, in_dir, max_files_per_trigger=1)
    lineage = running_lineage(extract_stage(pages), num_parts=num_parts)
    q = (
        lineage.writeStream.format("memory")
        .queryName("lineage_updates")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # last update per part must equal the batch-computed totals
    updates = spark.sql(
        "SELECT * FROM lineage_updates"
    )
    # final state = max counters per part (counters are monotone)
    final = (
        updates.groupBy("part_id")
        .agg(F.max("segments").alias("segments"), F.max("errors").alias("errors"),
             F.max("docs").alias("docs"))
        .collect()
    )
    batch = extract_stage(spark.read.parquet(in_dir)).withColumn(
        "part_id", F.pmod(F.xxhash64(F.col("url")), F.lit(num_parts)).cast("int")
    )
    expected = {
        r.part_id: (r.docs, r.segments, r.errors)
        for r in batch.groupBy("part_id")
        .agg(
            # docs = seg_no==1 rows (exact doc counter; matches the
            # state-free streaming semantics)
            F.sum(F.when(F.col("seg_no") == 1, 1).otherwise(0)).alias("docs"),
            F.count("*").alias("segments"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("errors"),
        )
        .collect()
    }
    got = {r.part_id: (r.docs, r.segments, r.errors) for r in final}
    assert got == expected
    # statuses derived
    statuses = {r.status for r in updates.select("status").distinct().collect()}
    assert statuses <= {"queued", "completed", "partial_completion", "error", "processing"}


def test_x8_enrichment_injection_cases(spark):
    """Pin the reference's merge cases (post_ocr_validator.py:140-218):
    inject fallback persons iff expected & primary empty & fallback found;
    always rebuild n_personas/monto_total from the merged list; append the
    ADVERTENCIA warning only on injection."""
    from ocr_sam_project_spark.pipeline.stages import (
        ENRICHMENT_WARNING_TEXT,
        enrich_stage,
    )
    from ocr_sam_project_spark.pipeline.schema import RAW_EXTRACTION_SCHEMA

    def rec(url, primary, fallback, expected):
        def p(seq, monto):
            return {
                "secuencia": seq, "nombre_completo": "NOMBRE X",
                "numero_identificacion": "8-111-222", "monto": str(monto),
                "monto_numerico": float(monto), "start": 0, "end": 10,
            }
        return {
            "url": url, "seg_no": 1, "doc_type": "embargo",
            "tramite": "Embargos", "departamento": "Civil",
            "extracted_text": "t", "numero_oficio": None, "fecha": None,
            "autoridad": None, "fields": [],
            "personas_primary": [p(1, m) for m in primary],
            "personas_fallback": [p(1, m) for m in fallback],
            "observaciones": "", "palabras_clave": [],
            "validation_score": 0.0, "validation_passed": False,
            "persons_expected": expected, "confianza": "baja",
            "urgente": False, "declared_count": 0, "count_valid": True,
            "error": None,
        }

    raw = spark.createDataFrame(
        [
            rec("inject", [], [250.5, 100.0], True),        # -> injected
            rec("primary_wins", [467.5], [999.0], True),    # primary kept
            rec("not_expected", [], [250.5], False),        # loose match ignored
            rec("nothing_found", [], [], True),             # expected but none
            rec("big_monto", [60000.0], [], False),         # priority High by amount
        ],
        RAW_EXTRACTION_SCHEMA,
    )
    out = {r.url: r for r in enrich_stage(raw).collect()}

    r = out["inject"]
    assert r.enrichment_warning and r.n_personas == 2
    assert r.monto_total == 350.5
    assert r.observaciones == ENRICHMENT_WARNING_TEXT
    assert [p.monto_numerico for p in r.personas] == [250.5, 100.0]

    r = out["primary_wins"]
    assert not r.enrichment_warning and r.n_personas == 1
    assert r.monto_total == 467.5 and r.observaciones == ""

    r = out["not_expected"]
    assert not r.enrichment_warning and r.n_personas == 0
    assert r.monto_total == 0.0 and r.observaciones == ""

    r = out["nothing_found"]
    assert not r.enrichment_warning and r.n_personas == 0

    assert out["big_monto"].priority == "High"   # 60000 > 50000 threshold
    assert out["inject"].priority == "Medium"
