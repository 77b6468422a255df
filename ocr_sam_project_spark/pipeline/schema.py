"""Fixed StructType schemas end-to-end (SURVEY.md §1.3).

The reference is schema-less (dicts); the rebuild declares every table shape
so Catalyst can prune/push down and Arrow batches are typed.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Input (BASELINE.json input_hint — authoritative).
PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

# (field, value, span) — span offsets into extracted_text (FIXTURES.md §2).
FIELD_STRUCT = StructType(
    [
        StructField("field", StringType(), False),
        StructField("value", StringType(), True),
        StructField("start", IntegerType(), True),
        StructField("end", IntegerType(), True),
    ]
)

# persona item — ocr_service.py:209-270 item shape, trimmed to what the
# deterministic extractor X7 produces (+span).
PERSONA_STRUCT = StructType(
    [
        StructField("secuencia", IntegerType(), False),
        StructField("nombre_completo", StringType(), True),
        StructField("numero_identificacion", StringType(), True),
        StructField("monto", StringType(), True),
        StructField("monto_numerico", DoubleType(), True),
        StructField("start", IntegerType(), True),
        StructField("end", IntegerType(), True),
    ]
)

# Raw per-segment extraction as emitted by the Arrow (mapInPandas) stage:
# TWO person sources (primary structured parse vs X7 loose-text fallback) —
# X8's conditional injection merges them Spark-side (stages.enrich_stage),
# mirroring post_ocr_validator.enrich_ocr_result (reference :140-218).
RAW_EXTRACTION_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("seg_no", IntegerType(), False),
        StructField("doc_type", StringType(), True),
        StructField("tramite", StringType(), True),
        StructField("departamento", StringType(), True),
        StructField("extracted_text", StringType(), True),
        StructField("numero_oficio", StringType(), True),
        StructField("fecha", StringType(), True),
        StructField("autoridad", StringType(), True),
        StructField("fields", ArrayType(FIELD_STRUCT), True),
        StructField("personas_primary", ArrayType(PERSONA_STRUCT), True),
        StructField("personas_fallback", ArrayType(PERSONA_STRUCT), True),
        StructField("observaciones", StringType(), True),
        StructField("palabras_clave", ArrayType(StringType()), True),
        StructField("validation_score", DoubleType(), True),
        StructField("validation_passed", BooleanType(), True),
        StructField("persons_expected", BooleanType(), True),
        StructField("confianza", StringType(), True),
        StructField("urgente", BooleanType(), True),
        # declared-count validation (validators.py:49-91): cantidad_oficios
        # from the config page vs actual segment count, ±10%-or-1 tolerance
        StructField("declared_count", IntegerType(), True),
        StructField("count_valid", BooleanType(), True),
        StructField("error", StringType(), True),
    ]
)

# One row per extracted document segment (the `extractions` table) —
# post-enrichment: merged personas + recomputed rollups.
EXTRACTION_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("seg_no", IntegerType(), False),
        StructField("doc_type", StringType(), True),
        StructField("tramite", StringType(), True),
        StructField("departamento", StringType(), True),
        StructField("extracted_text", StringType(), True),
        StructField("numero_oficio", StringType(), True),
        StructField("fecha", StringType(), True),
        StructField("autoridad", StringType(), True),
        StructField("fields", ArrayType(FIELD_STRUCT), True),
        StructField("personas", ArrayType(PERSONA_STRUCT), True),
        StructField("n_personas", IntegerType(), True),
        StructField("monto_total", DoubleType(), True),
        StructField("palabras_clave", ArrayType(StringType()), True),
        StructField("observaciones", StringType(), True),
        StructField("validation_score", DoubleType(), True),
        StructField("validation_passed", BooleanType(), True),
        StructField("persons_expected", BooleanType(), True),
        StructField("enrichment_warning", BooleanType(), True),
        StructField("confianza", StringType(), True),
        StructField("priority", StringType(), True),
        StructField("urgente", BooleanType(), True),
        # declared-count validation (validators.py:49-91): cantidad_oficios
        # from the config page vs actual segment count, ±10%-or-1 tolerance
        StructField("declared_count", IntegerType(), True),
        StructField("count_valid", BooleanType(), True),
        StructField("error", StringType(), True),
    ]
)

# Lineage table (replaces DynamoDB job/batch state, template.yaml:140-205).
LINEAGE_SCHEMA = StructType(
    [
        StructField("part_id", IntegerType(), False),
        StructField("status", StringType(), False),
        StructField("docs_in", LongType(), True),
        StructField("segments_out", LongType(), True),
        StructField("errors", LongType(), True),
        # docs removed by the optional pre-extract dedup stage (0 when off):
        # at 100 TB you dedup BEFORE paying Python extraction, and the
        # dropped counts must be auditable per partition
        StructField("dups_dropped", LongType(), True),
        # pages removed by the optional url-canonicalization tier (the
        # cheapest dedup: runs before any text is even read) and PII
        # strings redacted by the optional post-extract scrub tier —
        # both 0 when their tier is off
        StructField("url_dups_dropped", LongType(), True),
        # pages refused admission by the optional domain-blocklist tier
        # (UT1-style suffix match on the url host; 0 when off)
        StructField("blocked_dropped", LongType(), True),
        StructField("pii_redactions", LongType(), True),
        StructField("run_id", StringType(), True),
        StructField("updated_at", TimestampType(), True),
    ]
)

# Metrics table (replaces CloudWatch custom metrics, K6).
METRICS_SCHEMA = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("metric", StringType(), False),
        StructField("value", DoubleType(), True),
        StructField("updated_at", TimestampType(), True),
    ]
)
