"""Compiled regex banks (pure Python, no Spark).

Semantics pinned from the reference (file:line cites into /root/reference):

* PANAMA        — 6-pattern Panamanian bank, src/services/ocr_service.py:745-753
* TABLE_INDICATORS — 10 person-table sniffers, src/services/post_ocr_validator.py:77-89
* PERSON_ROW    — table-row person extractor, src/services/post_ocr_validator.py:108
* BASIC_INFO    — fallback info extractors, src/ocr_processor/app.py:555-573
* METADATA      — first-page metadata bank, src/services/metadata_service.py:56-87
* SEPARATORS    — separator-page patterns, src/services/pdf_service.py:79-86
* CONFIG_KEYWORDS — config-page sniff, src/services/pdf_service.py:215

All patterns are compiled once at module import (the reference recompiles per
call — ocr_service.py:829-836 — which we deliberately fix; see SURVEY.md §4).

Every regex here must stay expressible in BOTH Java regex (Spark ``rlike`` /
``regexp_extract``) and RE2 (DuckDB oracle) so queries() / oracle_sql() twins
agree; avoid backrefs and lookbehind.
"""

from __future__ import annotations

import re

# --- Panamanian pattern bank (ocr_service.py:746-753) ----------------------
PANAMA_SRC: dict[str, str] = {
    "cedula": r"\b\d{1,2}-\d{1,4}-\d{1,4}\b",
    "ruc": r"\b\d{1,3}-\d{1,6}-\d{1,2}-?\d{0,2}\b",
    "oficio_number": r"\b(?:JE-|DJ-|No\.?)\s*\d{1,6}(?:-\d{4})?\b",
    "phone": r"\b\d{3}-\d{4}\b",
    "money": r"\bB/\.?\s*[\d,]+\.?\d{0,2}\b",
    "date_es": r"\b\d{1,2}\s+de\s+\w+\s+de\s+\d{4}\b",
}
PANAMA: dict[str, re.Pattern[str]] = {
    k: re.compile(v, re.IGNORECASE) for k, v in PANAMA_SRC.items()
}

# --- person-table indicators (post_ocr_validator.py:77-89) -----------------
TABLE_INDICATOR_SRC: list[str] = [
    r"agente\s+económico",
    r"empleador",
    r"n[°º]\s*exp",
    r"r\.?u\.?c\.?",
    r"c\.?i\.?p\.?",
    r"monto\s+b/",
    r"\|\s*nombre",
    r"tabla.*persona",
    r"listado.*cliente",
    r"\d+-\d+-\d+.*\d+[,\.]\d+",  # cedula + amount on one line
]
TABLE_INDICATORS: list[re.Pattern[str]] = [
    re.compile(p, re.IGNORECASE) for p in TABLE_INDICATOR_SRC
]

# --- table-row person extractor (post_ocr_validator.py:108) ----------------
# name | identification | amount   e.g.
# "MINI SUPER AYACUCHO/RICARDO QIU ZHANG | 8-947-865, D.V. 86 | 467.50"
PERSON_ROW_SRC = (
    r"([A-ZÁ-Ú][A-ZÁ-Ú\s\.,/]+)\s*\|?\s*(\d+-\d+-\d+[^\|]*)\s*\|?\s*([\d,]+\.?\d*)"
)
PERSON_ROW: re.Pattern[str] = re.compile(PERSON_ROW_SRC, re.MULTILINE)

# strict variant: pipes REQUIRED — the primary structured-table parse (the
# analog of the OCR service's structured_data.lista_clientes rows, which the
# reference extracts from well-formed `name | id | amount` table layouts,
# ocr_service.py:331-366).  X8 injects the loose PERSON_ROW fallback only
# when this primary parse finds nothing but the table indicators fire
# (post_ocr_validator.py:178-218).
PERSON_ROW_STRICT_SRC = (
    r"([A-ZÁ-Ú][A-ZÁ-Ú\s\.,/]+)\s*\|\s*(\d+-\d+-\d+[^\|]*)\s*\|\s*([\d,]+\.?\d*)"
)
PERSON_ROW_STRICT: re.Pattern[str] = re.compile(PERSON_ROW_STRICT_SRC, re.MULTILINE)

# --- basic-info fallback extractors (ocr_processor/app.py:555-573) ---------
BASIC_OFICIO_SRC = r"(?:oficio|no\.?)\s*:?\s*([A-Za-z0-9\-]+)"
BASIC_OFICIO: re.Pattern[str] = re.compile(BASIC_OFICIO_SRC, re.IGNORECASE)
BASIC_AUTORIDAD_SRC: list[str] = [
    r"(juzgado [^\.]+)",
    r"(tribunal [^\.]+)",
    r"(ministerio [^\.]+)",
]
BASIC_AUTORIDAD: list[re.Pattern[str]] = [
    re.compile(p, re.IGNORECASE) for p in BASIC_AUTORIDAD_SRC
]
BASIC_DATE_SRC = r"(\d{1,2}[\/\-]\d{1,2}[\/\-]\d{4})"
BASIC_DATE: re.Pattern[str] = re.compile(BASIC_DATE_SRC)

# --- first-page metadata bank (metadata_service.py:56-87) ------------------
# first matching alternative wins, per field.
METADATA_SRC: dict[str, list[str]] = {
    "empresa": [
        r"empresa:\s*([^\n\r]+)",
        r"cliente:\s*([^\n\r]+)",
        r"organizacion:\s*([^\n\r]+)",
    ],
    "cantidad_oficios": [
        r"cantidad_oficios:\s*(\d+)",
        r"cantidad:\s*(\d+)",
        r"total_oficios:\s*(\d+)",
        r"oficios:\s*(\d+)",
    ],
    "origen": [
        r"origen:\s*([^\n\r]+)",
        r"provincia:\s*([^\n\r]+)",
        r"ubicacion:\s*([^\n\r]+)",
    ],
    "observaciones": [
        r"observaciones:\s*([^\n\r]+)",
        r"comentarios:\s*([^\n\r]+)",
        r"notas:\s*([^\n\r]+)",
    ],
    "fecha": [r"fecha:\s*([^\n\r]+)", r"date:\s*([^\n\r]+)"],
    "operador": [
        r"operador:\s*([^\n\r]+)",
        r"usuario:\s*([^\n\r]+)",
        r"procesado_por:\s*([^\n\r]+)",
    ],
}
METADATA: dict[str, list[re.Pattern[str]]] = {
    k: [re.compile(p, re.IGNORECASE) for p in pats]
    for k, pats in METADATA_SRC.items()
}

# --- separator / config pages (pdf_service.py:79-86, :215) ------------------
# substring containment (not regex) in the reference; keep as plain strings.
SEPARATOR_SUBSTRINGS: list[str] = [
    "separador de oficios",
    "=====================",
    "separador",
    "divisor",
    "---",
    "===",
]
SEPARATOR_MAX_LEN = 200  # pdf_service.py:93 — separator pages are short

CONFIG_KEYWORDS: list[str] = ["cantidad_oficios", "empresa", "configuración", "lote"]

# --- generic value extractors (shared/utils.py:113-150) --------------------
CURRENCY_SRC: list[str] = [
    r"\$[\d,]+\.?\d*",
    r"[\d,]+\.?\d*\s*pesos",
    r"[\d,]+\.?\d*\s*usd",
]
CURRENCY: list[re.Pattern[str]] = [re.compile(p, re.IGNORECASE) for p in CURRENCY_SRC]

GENERIC_DATE_SRC: list[str] = [
    r"\d{1,2}/\d{1,2}/\d{4}",
    r"\d{4}-\d{1,2}-\d{1,2}",
    r"\d{1,2}-\d{1,2}-\d{4}",
]
GENERIC_DATE: list[re.Pattern[str]] = [re.compile(p) for p in GENERIC_DATE_SRC]

NUMBERS: re.Pattern[str] = re.compile(r"\d+")
