"""Final sink projections — the CRM-integration stage (entry point C,
SURVEY.md §3.3) collapsed into declarative column expressions.

The reference's crm_integrator maps each extraction result to a ~20-field
case payload plus one record per person (crm_integrator/app.py:225-360,
:454-523, :906-956).  Here that is a pure projection over the extractions
table — no HTTP sink; the output is the `cases` / `case_entities` tables.

All normalizers are the native-column twins of N1-N8:
  safe_string (N6)  -> trim / NUL+CR strip / LF->space / truncate with '...'
  safe_date   (N5)  -> only already-ISO passes, else sentinel 1900-01-01
  money clamp (N3)  -> [0, 999999999]
  name split  (N8)  -> the CRM-stage convention (differs from N7!)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DATE_SENTINEL = "1900-01-01"


def safe_string(col: Column, default: str = "", max_length: int | None = None) -> Column:
    s = F.regexp_replace(F.trim(col.cast("string")), "\x00|\r", "")
    s = F.trim(F.regexp_replace(s, "\n", " "))
    out = F.when(col.isNull() | (s == "") | s.isin("null", "None", "No especificado"), F.lit(default)).otherwise(s)
    if max_length is not None:
        out = F.when(
            F.length(out) > max_length,
            F.concat(F.substring(out, 1, max_length - 3), F.lit("...")),
        ).otherwise(out)
    return out


def safe_date(col: Column) -> Column:
    return F.when(
        col.isNotNull() & col.cast("string").rlike(r"^\d{4}-\d{2}-\d{2}$"),
        col.cast("string"),
    ).otherwise(F.lit(DATE_SENTINEL))


def clamp_money(col: Column) -> Column:
    d = F.coalesce(col.cast("double"), F.lit(0.0))
    return F.least(F.greatest(d, F.lit(0.0)), F.lit(999999999.0))


def cases_projection(extractions: DataFrame) -> DataFrame:
    """One row per extracted document -> the case payload
    (crm_integrator/app.py:267-308 shape, sans the OData plumbing)."""
    ok = extractions.filter(F.col("error").isNull())
    return ok.select(
        F.concat_ws("#", F.col("url"), F.col("seg_no").cast("string")).alias("case_id"),
        safe_string(F.col("doc_type"), default="unknown", max_length=50).alias("tipo_oficio_detectado"),
        safe_string(F.col("tramite"), max_length=50).alias("tramite"),
        safe_string(F.col("departamento"), max_length=50).alias("departamento"),
        F.col("confianza").alias("nivel_confianza"),
        F.col("priority").alias("prioridad"),
        F.col("urgente"),
        safe_string(F.col("numero_oficio"), max_length=50).alias("numero_oficio"),
        safe_date(F.col("fecha")).alias("fecha_emision"),
        safe_string(F.col("autoridad"), max_length=250).alias("autoridad_emisora"),
        # asunto: first 100 chars of the text (ocr_processor/app.py:643)
        safe_string(F.substring(F.col("extracted_text"), 1, 100), max_length=100).alias("asunto"),
        # texto_completo truncated to 4000 (crm_integrator/app.py:294)
        F.substring(F.col("extracted_text"), 1, 4000).alias("texto_completo"),
        clamp_money(F.col("monto_total")).alias("monto_total"),
        F.col("n_personas").alias("personas_count"),
        # X8 surface: carries the ADVERTENCIA fallback-injection warning
        # (post_ocr_validator.py:162) into the case sink.
        safe_string(F.col("observaciones"), max_length=500).alias("observaciones"),
        F.col("validation_score"),
        F.col("validation_passed"),
        F.col("palabras_clave"),
    )


def case_entities_projection(extractions: DataFrame) -> DataFrame:
    """One row per extracted person -> the person-record payload using the
    CRM-stage (v2) name-split convention (crm_integrator/app.py:389-393,
    :917-937)."""
    from .stages import entities_long

    e = entities_long(extractions.filter(F.col("error").isNull()))
    return e.select(
        F.concat_ws("#", F.col("url"), F.col("seg_no").cast("string")).alias("case_id"),
        F.col("secuencia"),
        safe_string(F.col("nombre_completo"), max_length=250).alias("nombre_completo"),
        F.col("nombre"),
        F.col("nombre_segundo_v2").alias("nombre_segundo"),
        F.col("apellido_paterno_v2").alias("apellido_paterno"),
        F.col("apellido_materno_v2").alias("apellido_materno"),
        safe_string(F.col("numero_identificacion"), max_length=50).alias("identificacion"),
        clamp_money(F.col("monto_numerico")).alias("monto"),
        F.col("span_start"),
        F.col("span_end"),
    )
