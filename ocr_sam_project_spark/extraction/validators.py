"""Input/count validators — pure Python (reference: src/shared/validators.py).

* validate_document_content — F1 size/envelope/header checks
  (validators.py:22-44), generalized to the web payload: PDF path keeps the
  %PDF- header + %%EOF contract; HTML path checks for markup.
* validate_count — split-count vs declared-count with the 10%-or-minimum-1
  tolerance state machine (validators.py:49-91), kept verbatim including the
  zero-declared auto-process branch.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

MAX_FILE_SIZE = 50 * 1024 * 1024  # validators.py:19
MIN_FILE_SIZE = 1024              # validators.py:20


class ValidationResult(NamedTuple):
    success: bool
    error: Optional[str] = None
    warning: Optional[str] = None


def validate_document_content(content: bytes) -> ValidationResult:
    """F1 — size envelope + structural header checks."""
    if len(content) > MAX_FILE_SIZE:
        return ValidationResult(False, f"document too large: {len(content)} bytes")
    if len(content) < MIN_FILE_SIZE:
        return ValidationResult(False, f"document too small: {len(content)} bytes")
    if content.startswith(b"%PDF-"):
        if b"%%EOF" not in content:
            return ValidationResult(False, "invalid PDF: missing EOF marker")
        return ValidationResult(True)
    if b"<" in content[:4096]:
        return ValidationResult(True)
    return ValidationResult(False, "unrecognized document payload")


def validate_count(extracted: int, declared: int) -> ValidationResult:
    """±10% (min 1) count tolerance — validators.py:49-91 verbatim:

    * extracted == 0           -> fail
    * declared == 0            -> pass with auto-process warning
    * exact match              -> pass
    * |diff| <= max(1, int(declared*0.1)) -> pass with warning
    * else                     -> fail
    """
    if extracted == 0:
        return ValidationResult(False, "no documents extracted")
    if declared == 0:
        return ValidationResult(True, warning=f"no declared count, processing {extracted}")
    if extracted == declared:
        return ValidationResult(True)
    tolerance = max(1, int(declared * 0.1))
    difference = abs(extracted - declared)
    if difference <= tolerance:
        return ValidationResult(True, warning=f"difference {difference} within tolerance {tolerance}")
    return ValidationResult(
        False,
        f"difference exceeds tolerance: declared {declared}, extracted {extracted} "
        f"(difference {difference}, tolerance {tolerance})",
    )
