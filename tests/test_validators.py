"""Unit tests for validators (validators.py:16-91 semantics)."""

import pytest

from ocr_sam_project_spark.extraction.validators import (
    MIN_FILE_SIZE,
    validate_count,
    validate_document_content,
)


def test_pdf_envelope():
    ok = b"%PDF-1.4 " + b"x" * MIN_FILE_SIZE + b" %%EOF"
    assert validate_document_content(ok).success
    assert not validate_document_content(b"%PDF tiny").success  # too small
    no_eof = b"%PDF-1.4 " + b"x" * MIN_FILE_SIZE
    assert not validate_document_content(no_eof).success  # missing %%EOF
    big = b"%PDF-" + b"x" * (50 * 1024 * 1024 + 1)
    assert not validate_document_content(big).success


def test_html_envelope():
    html = b"<html>" + b"x" * MIN_FILE_SIZE + b"</html>"
    assert validate_document_content(html).success
    garbage = bytes(range(128, 256)) * 16  # no '<' byte anywhere
    assert not validate_document_content(garbage).success


@pytest.mark.parametrize(
    "extracted,declared,ok,warn",
    [
        (0, 5, False, False),     # nothing extracted
        (7, 0, True, True),       # auto-process branch
        (5, 5, True, False),      # exact
        (10, 11, True, True),     # diff 1 <= tol max(1, int(1.1))=1
        (12, 10, False, False),   # diff 2 > tol 1
        (22, 20, True, True),     # diff 2 <= tol int(2.0)=2
        (23, 20, False, False),   # diff 3 > tol 2
        (2, 1, True, True),       # min-tolerance-1 branch
        (3, 1, False, False),
    ],
)
def test_count_tolerance(extracted, declared, ok, warn):
    r = validate_count(extracted, declared)
    assert r.success == ok
    assert (r.warning is not None) == warn
