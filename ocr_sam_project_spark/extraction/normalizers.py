"""Scalar normalizers N1-N14 (pure Python, no Spark).

Semantics pinned from the reference (cites into /root/reference):

* clean_value          N1  src/ocr_processor/app.py:526-537
* clean_text           N2  src/shared/utils.py:67-79
* parse_money          N3  src/ocr_processor/app.py:487-495 (unclamped) and
                           src/crm_integrator/app.py:476-491 (clamped variant)
* parse_date_es        N4  src/crm_integrator/app.py:692-742
* safe_date_gate       N5  src/crm_integrator/app.py:466-474
* safe_string          N6  src/crm_integrator/app.py:233-242,454-464
* split_name_v1        N7  src/ocr_processor/app.py:478-503
* split_name_v2        N8  src/crm_integrator/app.py:389-393 (DIVERGES from v1
                           for >=3 tokens; both are kept, fixtures pin both)
* normalize_company    N9  src/shared/utils.py:87-97
* extract_currency     N10 src/shared/utils.py:113-131
* extract_date         N11 src/shared/utils.py:133-150
* extract_numbers      N12 src/shared/utils.py:81-85
* truncate             N13 src/crm_integrator/app.py:294 etc.

Determinism rules: no wall-clock, no locale, no randomness anywhere.
"""

from __future__ import annotations

import re
from datetime import datetime
from typing import Any, Optional

from . import patterns as P

DATE_SENTINEL = "1900-01-01"  # crm_integrator/app.py:695
MONEY_CLAMP_MAX = 999999999.0  # crm_integrator/app.py:485-488

_WS = re.compile(r"\s+")
_NONBASIC = re.compile(r"[^\w\s.,;:!?()-]")
_ISO_DATE = re.compile(r"^\d{4}-\d{2}-\d{2}$")
_NON_DATE_CHARS = re.compile(r"[^\d\/\-\.]")
_COMPANY_PREFIX = re.compile(
    r"^(s\.?a\.?|s\.?r\.?l\.?|ltda\.?|inc\.?|corp\.?)\s*", re.IGNORECASE
)
_COMPANY_SUFFIX = re.compile(
    r"\s+(s\.?a\.?|s\.?r\.?l\.?|ltda\.?|inc\.?|corp\.?)$", re.IGNORECASE
)

# Spanish month map — crm_integrator/app.py:706-710 (kept a dict; never
# strptime-with-locale, per SURVEY.md §7 determinism risk register).
MESES: dict[str, str] = {
    "enero": "01",
    "febrero": "02",
    "marzo": "03",
    "abril": "04",
    "mayo": "05",
    "junio": "06",
    "julio": "07",
    "agosto": "08",
    "septiembre": "09",
    "octubre": "10",
    "noviembre": "11",
    "diciembre": "12",
}

_NUMERIC_DATE_FORMATS = ["%d/%m/%Y", "%d-%m-%Y", "%d.%m.%Y", "%Y-%m-%d", "%d/%m/%y", "%d-%m-%y"]


def clean_value(value: Any) -> str:
    """N1 — None/'null' -> ''; numbers -> str; strings stripped."""
    if value is None or value == "null":
        return ""
    if isinstance(value, bool):
        return str(value)
    if isinstance(value, (int, float)):
        return str(value)
    if isinstance(value, str):
        return value.strip()
    return str(value).strip()


def clean_text(text: Optional[str]) -> str:
    """N2 — collapse whitespace, drop chars outside [\\w\\s.,;:!?()-], strip.

    Idempotent (property-tested): clean_text(clean_text(x)) == clean_text(x).
    """
    if not text:
        return ""
    text = _WS.sub(" ", text)
    text = _NONBASIC.sub("", text)
    return text.strip()


def parse_money(value: Any, default: float = 0.0, clamp: bool = False) -> float:
    """N3 — strip 'B/.' and ',' then float; default on failure.

    clamp=True applies the CRM-stage bounds [0, 999999999]
    (crm_integrator/app.py:485-488); clamp=False is the OCR-stage variant
    (ocr_processor/app.py:487-495) which passes negatives through.
    """
    try:
        if value is None or str(value).strip() in ("", "null", "None"):
            return default
        s = str(value).replace("B/.", "").replace(",", "").strip()
        if not s:
            return default
        n = float(s)
        if clamp:
            if n < 0:
                return 0.0
            if n > MONEY_CLAMP_MAX:
                return MONEY_CLAMP_MAX
        return n
    except (ValueError, TypeError):
        return default


def parse_date_es(date_str: Optional[str], nullable: bool = False) -> Optional[str]:
    """N4 — Spanish long-form or numeric date -> 'YYYY-MM-DD'.

    '23 de mayo de 2025' via MESES map (day zfill'd); else strip non-[\\d/-.]
    and try 6 numeric formats; unparseable -> sentinel 1900-01-01 (or None if
    nullable).  Mirrors crm_integrator/app.py:692-742 exactly, including the
    quirk that the *original* string (not the cleaned one) feeds the
    char-strip step.
    """
    fail = None if nullable else DATE_SENTINEL
    if not date_str or str(date_str) in ("No especificado", "No especificada", "", "null", "None"):
        return fail
    date_clean = str(date_str).strip()
    if " de " in date_clean.lower():
        parts = date_clean.lower().split()
        if len(parts) >= 5 and parts[1] == "de" and parts[3] == "de":
            dia = parts[0].zfill(2)
            mes = MESES.get(parts[2])
            anio = parts[4]
            if mes and anio.isdigit():
                return f"{anio}-{mes}-{dia}"
    digits = _NON_DATE_CHARS.sub("", str(date_str))
    if not digits:
        return fail
    for fmt in _NUMERIC_DATE_FORMATS:
        try:
            return datetime.strptime(digits, fmt).strftime("%Y-%m-%d")
        except ValueError:
            continue
    return fail


def safe_date_gate(date_str: Any) -> str:
    """N5 — pass only already-ISO dates, else sentinel (app.py:466-474)."""
    if not date_str or str(date_str) in ("No especificado", "No especificada", "", "null", "None"):
        return DATE_SENTINEL
    if _ISO_DATE.match(str(date_str)):
        return str(date_str)
    return DATE_SENTINEL


def safe_string(value: Any, default: str = "", max_length: Optional[int] = None) -> str:
    """N6 — default-fill, strip, drop NUL/CR, LF->space, truncate with '...'."""
    if value is None or str(value).strip() in ("", "null", "None", "No especificado"):
        return default
    s = str(value).strip()
    s = s.replace("\x00", "").replace("\r", "").replace("\n", " ")
    if max_length and len(s) > max_length:
        s = s[: max_length - 3] + "..."
    return s


def split_name_v1(nombre_completo: str) -> dict[str, str]:
    """N7 — OCR-stage convention (ocr_processor/app.py:500-503):
    [0]=nombre, [1]=apellido_paterno, [2]=apellido_materno, [3:]=nombre_segundo.
    """
    t = nombre_completo.split()
    return {
        "nombre": t[0] if t else "",
        "apellido_paterno": t[1] if len(t) > 1 else "",
        "apellido_materno": t[2] if len(t) > 2 else "",
        "nombre_segundo": " ".join(t[3:]) if len(t) > 3 else "",
    }


def split_name_v2(nombre_completo: str) -> dict[str, str]:
    """N8 — CRM-stage convention (crm_integrator/app.py:389-393), which
    DISAGREES with v1 for >=3 tokens:
    [0]=nombre, [1:-2]=nombre_segundo (only if >3 tokens),
    [-2]=apellido_paterno (if >=2), [-1]=apellido_materno (if >=3).
    """
    t = nombre_completo.split()
    return {
        "nombre": t[0] if t else "",
        "nombre_segundo": " ".join(t[1:-2]) if len(t) > 3 else "",
        "apellido_paterno": t[-2] if len(t) >= 2 else "",
        "apellido_materno": t[-1] if len(t) >= 3 else "",
    }


def normalize_company(name: Optional[str]) -> str:
    """N9 — strip corporate prefix/suffix, title-case (utils.py:87-97)."""
    if not name:
        return "No especificado"
    name = _COMPANY_PREFIX.sub("", name)
    name = _COMPANY_SUFFIX.sub("", name)
    return name.strip().title()


def extract_currency(text: Optional[str]) -> str:
    """N10 — first $-amount / pesos / usd match, else stripped passthrough."""
    if not text:
        return ""
    for pat in P.CURRENCY:
        m = pat.findall(text)
        if m:
            return m[0]
    return text.strip()


def extract_date(text: Optional[str]) -> Optional[str]:
    """N11 — first d/m/Y, Y-m-d or d-m-Y occurrence, else None."""
    if not text:
        return None
    for pat in P.GENERIC_DATE:
        m = pat.findall(text)
        if m:
            return m[0]
    return None


def extract_numbers(text: Optional[str]) -> list[int]:
    """N12 — findall(\\d+) as ints."""
    if not text:
        return []
    return [int(n) for n in P.NUMBERS.findall(text)]


def truncate(text: Optional[str], n: int) -> str:
    """N13 — plain prefix truncation (texto_completo[:4000] etc.)."""
    return (text or "")[:n]
