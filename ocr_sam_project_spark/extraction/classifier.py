"""Document-type classifier C1-C4 (pure Python, no Spark).

The reference delegates classification to an LLM prompt listing 16 Panamanian
oficio types, each mapped to (tramite, departamento)
(src/services/ocr_service.py:305-321 and :684-702).  Per the north_star the
rebuild replaces that black box with a deterministic keyword/regex router:
each type gets an ordered keyword list; the type with the highest weighted
keyword hit count wins; ties break on the smaller type id.  Documents with no
hits (or non-Spanish pages) classify to 'unknown'.

C2 priority routing and C3 urgency keywords are pinned verbatim from
src/crm_integrator/app.py:404-447; C4 confidence from
src/services/ocr_service.py:629-638.
"""

from __future__ import annotations

import re
from typing import NamedTuple, Optional


class DocType(NamedTuple):
    id: int
    tipo: str
    tramite: str
    departamento: str
    keywords: tuple[str, ...]  # lowercase substrings, most specific first


# The 16-type taxonomy (ocr_service.py:305-321).  `tipo` is a stable
# machine slug; `keywords` are the discriminative phrases a deterministic
# router matches on (derived from the type names + domain phrasing in the
# reference prompt; multi-word keywords score double — see classify()).
TAXONOMY: tuple[DocType, ...] = (
    DocType(1, "secuestro_civil", "Secuestros", "Civil",
            ("secuestro civil", "secuestro")),
    DocType(2, "aprehension", "Secuestros", "Civil",
            ("aprehensión", "aprehension", "aprehendido")),
    DocType(3, "traslado_fondos", "Secuestros", "Civil",
            ("traslado de fondos", "fondos aprehendidos")),
    DocType(4, "levantamiento", "Levantamientos", "Civil",
            ("levantamiento",)),
    DocType(5, "embargo", "Embargos", "Civil",
            ("embargo", "embargar", "embargado")),
    DocType(6, "adjudicacion_sucesion", "Juicios de Sucesión", "Civil",
            ("adjudicación en proceso de sucesión", "adjudicación", "adjudicacion")),
    DocType(7, "investigacion_sucesion", "Juicios de Sucesión", "Civil",
            ("investigación de proceso de sucesión", "proceso de sucesión",
             "proceso de sucesion", "sucesión", "sucesion")),
    DocType(8, "solo_notificacion", "Citaciones", "Civil",
            ("solo notificación", "notificación", "notificacion")),
    DocType(9, "citacion", "Citaciones", "Civil",
            ("citación", "citacion", "comparecer")),
    DocType(10, "investigacion_civil", "Investigaciones", "Penal",
            ("investigación civil", "investigacion civil")),
    DocType(11, "investigacion_familia", "Investigaciones", "Penal",
            ("investigación de familia", "investigacion de familia", "familia")),
    DocType(12, "investigacion_penal", "Investigaciones", "Penal",
            ("investigación penal", "proceso penal", "investigacion penal")),
    DocType(13, "informacion_clientes", "Investigaciones", "Penal",
            ("información de clientes", "informacion de clientes",
             "solicitud de información", "solicitud de informacion")),
    DocType(14, "inspeccion_ocular", "Investigaciones", "Penal",
            ("inspección ocular", "inspeccion ocular")),
    DocType(15, "allanamiento", "Investigaciones", "Penal",
            ("allanamiento", "allanar")),
    DocType(16, "diligencia_exhibitoria", "Investigaciones", "Penal",
            ("diligencia exhibitoria", "exhibitoria")),
)

UNKNOWN = DocType(0, "unknown", "Desconocido", "Desconocido", ())

BY_TIPO: dict[str, DocType] = {t.tipo: t for t in TAXONOMY}

# C2/C3 high-priority & urgency keyword list (crm_integrator/app.py:411-414).
HIGH_PRIORITY_KEYWORDS: tuple[str, ...] = (
    "secuestro", "embargo", "aprehensión", "allanamiento", "citación", "levantamiento",
)
PRIORITY_HIGH_AMOUNT = 50000.0  # crm_integrator/app.py:422
PRIORITY_MEDIUM_AMOUNT = 10000.0  # crm_integrator/app.py:424


def classify(text: Optional[str], lang: Optional[str] = None) -> DocType:
    """C1 — deterministic keyword router over the 16-type taxonomy.

    Scoring: each keyword occurrence counts once per keyword; multi-word
    keywords weigh 2 (more specific).  Highest score wins; ties break on the
    smaller type id (stable).  Non-Spanish pages and no-hit pages -> unknown.
    """
    if not text:
        return UNKNOWN
    if lang is not None and lang != "es":
        return UNKNOWN
    low = text.lower()
    best: DocType = UNKNOWN
    best_score = 0
    for t in TAXONOMY:
        score = 0
        for kw in t.keywords:
            if kw in low:
                score += 2 if " " in kw else 1
        if score > best_score:
            best, best_score = t, score
    return best


def priority(tipo_oficio: Optional[str], monto_total: float) -> str:
    """C2 — High if the type name contains a high-priority keyword; else by
    amount thresholds (crm_integrator/app.py:404-430).  Default Medium."""
    tipo = (tipo_oficio or "").lower()
    if any(kw in tipo for kw in _normalized_priority_keywords()):
        return "High"
    if monto_total > PRIORITY_HIGH_AMOUNT:
        return "High"
    if monto_total > PRIORITY_MEDIUM_AMOUNT:
        return "Medium"
    return "Medium"


def requires_urgent_action(tipo_oficio: Optional[str]) -> bool:
    """C3 — same keyword list as C2, boolean (crm_integrator/app.py:432-447)."""
    tipo = (tipo_oficio or "").lower()
    return any(kw in tipo for kw in _normalized_priority_keywords())


def _normalized_priority_keywords() -> tuple[str, ...]:
    # our machine slugs are accent-free (`aprehension`, `citacion`); match the
    # reference's accented keyword list against both spellings.
    return HIGH_PRIORITY_KEYWORDS + ("aprehension", "citacion")


def confidence(has_structured: bool, has_text: bool,
               validation_score: Optional[float] = None) -> str:
    """C4 — high if structured+text, medium if text only, low otherwise;
    overridden by validation score (>=0.7 -> high, <0.5 -> low)
    (ocr_service.py:629-638)."""
    if has_structured and has_text:
        level = "alta"
    elif has_text:
        level = "media"
    else:
        level = "baja"
    if validation_score is not None:
        if validation_score >= 0.7:
            level = "alta"
        elif validation_score < 0.5:
            level = "baja"
    return level
