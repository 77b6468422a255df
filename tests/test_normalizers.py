"""Unit tests for normalizers N1-N14 — vectors pinned from reference behavior
(FIXTURES.md §5; cites into /root/reference)."""

import pytest

from ocr_sam_project_spark.extraction import normalizers as N


# --- N3 money (ocr_processor/app.py:487-495; crm_integrator/app.py:476-491) ---
@pytest.mark.parametrize(
    "raw,expected",
    [
        ("B/. 1,500.00", 1500.0),
        ("B/.467.50", 467.5),
        ("467.50", 467.5),
        ("1,234,567.89", 1234567.89),
        ("", 0.0),
        (None, 0.0),
        ("null", 0.0),
        ("None", 0.0),
        ("garbage", 0.0),
        (42, 42.0),
    ],
)
def test_parse_money(raw, expected):
    assert N.parse_money(raw) == expected


def test_parse_money_clamp():
    # crm_integrator/app.py:485-488: clamp [0, 999999999]
    assert N.parse_money("-5", clamp=True) == 0.0
    assert N.parse_money("-5", clamp=False) == -5.0
    assert N.parse_money("9999999999", clamp=True) == 999999999.0
    assert N.parse_money("9999999999", clamp=False) == 9999999999.0


# --- N4 dates (crm_integrator/app.py:692-742) ---
@pytest.mark.parametrize(
    "raw,expected",
    [
        ("23 de mayo de 2025", "2025-05-23"),
        ("1 de enero de 2024", "2024-01-01"),
        ("5 de diciembre de 1999", "1999-12-05"),
        ("23/05/2025", "2025-05-23"),
        ("23-05-2025", "2025-05-23"),
        ("23.05.2025", "2025-05-23"),
        ("2025-05-23", "2025-05-23"),
        ("23/05/25", "2025-05-23"),
        ("garbage", "1900-01-01"),
        ("", "1900-01-01"),
        (None, "1900-01-01"),
        ("No especificado", "1900-01-01"),
        ("99 de otromes de 2025", "1900-01-01"),
    ],
)
def test_parse_date_es(raw, expected):
    assert N.parse_date_es(raw) == expected


def test_parse_date_es_nullable():
    assert N.parse_date_es("garbage", nullable=True) is None
    assert N.parse_date_es("23 de mayo de 2025", nullable=True) == "2025-05-23"


def test_safe_date_gate():
    # crm_integrator/app.py:466-474: only already-ISO passes
    assert N.safe_date_gate("2025-05-23") == "2025-05-23"
    assert N.safe_date_gate("23/05/2025") == "1900-01-01"
    assert N.safe_date_gate(None) == "1900-01-01"


# --- N7 vs N8 name split divergence (FIXTURES.md §5) ---
@pytest.mark.parametrize(
    "name,v1,v2",
    [
        (
            "MARIA",
            {"nombre": "MARIA", "apellido_paterno": "", "apellido_materno": "", "nombre_segundo": ""},
            {"nombre": "MARIA", "apellido_paterno": "", "apellido_materno": "", "nombre_segundo": ""},
        ),
        (
            "MARIA GONZALEZ",
            {"nombre": "MARIA", "apellido_paterno": "GONZALEZ", "apellido_materno": "", "nombre_segundo": ""},
            {"nombre": "MARIA", "apellido_paterno": "MARIA", "apellido_materno": "", "nombre_segundo": ""},
        ),
        (
            "MARIA GONZALEZ PEREZ",
            {"nombre": "MARIA", "apellido_paterno": "GONZALEZ", "apellido_materno": "PEREZ", "nombre_segundo": ""},
            {"nombre": "MARIA", "apellido_paterno": "GONZALEZ", "apellido_materno": "PEREZ", "nombre_segundo": ""},
        ),
        (
            # >=4 tokens: the two reference conventions DISAGREE
            "MARIA ELENA GONZALEZ PEREZ",
            {"nombre": "MARIA", "apellido_paterno": "ELENA", "apellido_materno": "GONZALEZ", "nombre_segundo": "PEREZ"},
            {"nombre": "MARIA", "apellido_paterno": "GONZALEZ", "apellido_materno": "PEREZ", "nombre_segundo": "ELENA"},
        ),
        (
            "MARIA ELENA DEL CARMEN GONZALEZ PEREZ",
            {"nombre": "MARIA", "apellido_paterno": "ELENA", "apellido_materno": "DEL", "nombre_segundo": "CARMEN GONZALEZ PEREZ"},
            {"nombre": "MARIA", "apellido_paterno": "GONZALEZ", "apellido_materno": "PEREZ", "nombre_segundo": "ELENA DEL CARMEN"},
        ),
    ],
)
def test_name_split_conventions(name, v1, v2):
    assert N.split_name_v1(name) == v1
    assert N.split_name_v2(name) == v2


# --- N2 clean_text (utils.py:67-79) ---
def test_clean_text():
    assert N.clean_text("  hola\t\nmundo  ") == "hola mundo"
    assert N.clean_text("a@#b$c") == "abc"
    assert N.clean_text("keep .,;:!?()- these") == "keep .,;:!?()- these"
    assert N.clean_text("") == ""
    assert N.clean_text(None) == ""


def test_clean_text_idempotent_on_clean_inputs():
    for s in ["  a  b  ", "x@y", "ya limpio", "", "a\n\nb\tc"]:
        once = N.clean_text(s)
        assert N.clean_text(once) == once


def test_clean_text_reference_quirk_not_idempotent():
    # utils.py:67-79 collapses whitespace BEFORE removing special chars, so
    # one pass can leave a double space.  Pinned, not fixed (parity).
    assert N.clean_text("0 <\r0") == "0  0"
    assert N.clean_text(N.clean_text("0 <\r0")) == "0 0"


# --- N1 clean_value (ocr_processor/app.py:526-537) ---
def test_clean_value():
    assert N.clean_value(None) == ""
    assert N.clean_value("null") == ""
    assert N.clean_value(3) == "3"
    assert N.clean_value(2.5) == "2.5"
    assert N.clean_value("  x  ") == "x"


# --- N6 safe_string (crm_integrator/app.py:454-464) ---
def test_safe_string():
    assert N.safe_string(None, default="d") == "d"
    assert N.safe_string("null") == ""
    assert N.safe_string("a\x00b\rc\nd") == "abc d"
    long = "x" * 20
    assert N.safe_string(long, max_length=10) == "x" * 7 + "..."


# --- N9 company (utils.py:87-97) ---
def test_normalize_company():
    assert N.normalize_company("ACME S.A.") == "Acme"
    assert N.normalize_company("s.r.l. ACME") == "Acme"
    assert N.normalize_company("") == "No especificado"
    assert N.normalize_company("Tienda La Esquina LTDA") == "Tienda La Esquina"


# --- N10-N12 (utils.py:113-150, :81-85) ---
def test_extract_currency():
    assert N.extract_currency("pague $1,234.56 hoy") == "$1,234.56"
    assert N.extract_currency("monto 500 pesos netos") == "500 pesos"
    assert N.extract_currency("sin moneda") == "sin moneda"
    assert N.extract_currency("") == ""


def test_extract_date():
    assert N.extract_date("el 23/05/2025 a las") == "23/05/2025"
    assert N.extract_date("iso 2025-05-23 ok") == "2025-05-23"
    assert N.extract_date("guiones 23-05-2025") == "23-05-2025"
    assert N.extract_date("nada") is None


def test_extract_numbers():
    assert N.extract_numbers("a1 b22 c333") == [1, 22, 333]
    assert N.extract_numbers("") == []


def test_truncate():
    assert N.truncate("abcdef", 4) == "abcd"
    assert N.truncate(None, 4) == ""
