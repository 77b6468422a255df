"""Property-based tests (hypothesis) for the normalizers — SURVEY.md §5
item 4: idempotence, totality (never throws), round-trips."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_sam_project_spark.extraction import normalizers as N
from ocr_sam_project_spark.extraction.document import extract_document

TEXTY = st.text(max_size=300)


@given(TEXTY)
@settings(max_examples=200, deadline=None)
def test_clean_text_idempotent_from_second_pass(s):
    # Reference quirk kept for parity (utils.py:67-79): whitespace collapses
    # BEFORE special-char removal, so removal can leave a double space and
    # one pass is NOT idempotent ('0 <\r0' -> '0  0' -> '0 0').  From the
    # second application on, the function is a fixpoint.
    twice = N.clean_text(N.clean_text(s))
    assert N.clean_text(twice) == twice


@given(st.one_of(st.none(), TEXTY, st.floats(allow_nan=False), st.integers()))
@settings(max_examples=200, deadline=None)
def test_parse_money_total_and_clamped(v):
    out = N.parse_money(v, clamp=True)
    assert isinstance(out, float)
    assert 0.0 <= out <= N.MONEY_CLAMP_MAX


@given(st.one_of(st.none(), TEXTY))
@settings(max_examples=200, deadline=None)
def test_parse_date_never_throws_and_shape(s):
    out = N.parse_date_es(s)
    assert out is not None
    assert len(out) == 10 and out[4] == "-" and out[7] == "-"


@given(st.floats(min_value=0, max_value=1e8, allow_nan=False))
@settings(max_examples=100, deadline=None)
def test_money_roundtrip(x):
    x = round(x, 2)
    assert N.parse_money(f"B/. {x:,.2f}") == x


@given(TEXTY)
@settings(max_examples=100, deadline=None)
def test_safe_string_respects_max_length(s):
    out = N.safe_string(s, max_length=20)
    assert len(out) <= 20


@given(st.text(max_size=30))
@settings(max_examples=100, deadline=None)
def test_split_names_total(s):
    for fn in (N.split_name_v1, N.split_name_v2):
        d = fn(s)
        assert set(d) == {"nombre", "apellido_paterno", "apellido_materno", "nombre_segundo"}


@given(st.binary(max_size=400), st.one_of(st.none(), st.text(max_size=400)))
@settings(max_examples=100, deadline=None)
def test_extract_document_never_throws(html, text):
    recs = extract_document("u", html, text, "es")
    assert isinstance(recs, list) and len(recs) >= 1
    for r in recs:
        assert isinstance(r["seg_no"], int)
        # spans always index into extracted_text
        for f in r["fields"]:
            assert r["extracted_text"][f["start"]:f["end"]] == f["value"]


def _bloom_positions_py(fp: str, m_bits: int, k: int) -> list[int]:
    """Pure-python twin of dedup.bloom_positions (same md5[:14] % m math)."""
    import hashlib

    return [
        int(hashlib.md5(f"{fp}:{j}".encode()).hexdigest()[:14], 16) % m_bits
        for j in range(k)
    ]


@given(
    st.sets(st.text(min_size=1, max_size=24), min_size=1, max_size=60),
    st.sampled_from([64, 256, 4096]),
)
@settings(max_examples=60, deadline=None)
def test_bloom_membership_never_false_negative(fps, m_bits):
    """Structural invariant of the Bloom admission tier, over arbitrary
    fingerprint sets and filter sizes (including absurdly undersized ones):
    every inserted fp ALWAYS probes positive.  Mirrors bloom_build/
    bloom_hit's exact hash math (md5[:14 hex] % m, ':j' salts, k=4)."""
    k = 4
    words = [0] * ((m_bits + 63) // 64)
    for fp in fps:
        for p in _bloom_positions_py(fp, m_bits, k):
            words[p >> 6] |= 1 << (p & 63)
    for fp in fps:
        assert all(
            (words[p >> 6] >> (p & 63)) & 1
            for p in _bloom_positions_py(fp, m_bits, k)
        )
