"""Text-analysis operators for a large-scale training-data pipeline:
language-ID, quality scoring, token counting, document fingerprinting.

All implemented with native ``pyspark.sql.functions`` (JVM-side, whole-stage
codegen — zero Python in the hot path) so they stream through a 100 TB scan
as narrow projections.  Each has an exact ANSI-SQL twin in queries.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword heuristic
# language identifier.  Deliberately small & frozen: the oracle SQL twin
# embeds the same lists literally.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "los"),
    "fr": ("le", "la", "les", "et", "des"),
    "de": ("der", "die", "und", "das", "ist"),
}

STOPWORDS_EN = ("the", "a", "of", "to", "and", "in", "is", "it", "for", "on")


def tokens(col: Column) -> Column:
    """Whitespace tokenization (the reference's name-split primitive N7/N8
    generalized)."""
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column) -> Column:
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(F.size(tokens(col)))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish subword proxy: count maximal runs of word chars, digits, or
    single punctuation — a deterministic stand-in for a real BPE vocab."""
    return F.size(F.regexp_extract_all(col, F.lit(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]"), 0))


def lang_scores(col: Column) -> dict[str, Column]:
    """Per-language marker-hit counts over the distinct token set."""
    toks = F.array_distinct(tokens(F.lower(col)))
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in LANG_MARKERS.items()
    }


def lang_id(col: Column) -> Column:
    """Heuristic language id: argmax of marker hits; 'und' when all zero.
    Ties break in the fixed LANG_MARKERS order (en, es, fr, de)."""
    scores = lang_scores(col)
    best = F.lit("und")
    best_score = F.lit(0)
    # fold in reverse so earlier languages win ties with strict '>' applied
    # when overriding later ones
    for lang in reversed(list(scores)):
        s = scores[lang]
        best = F.when(s >= F.greatest(best_score, F.lit(1)), F.lit(lang)).otherwise(best)
        best_score = F.greatest(best_score, s)
    return best


def punct_ratio(col: Column) -> Column:
    n = F.length(col)
    p = F.size(F.regexp_extract_all(col, F.lit(r"[.,;:!?()\-]"), 0))
    return F.when(n > 0, p.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_ratio(col: Column) -> Column:
    toks = tokens(F.lower(col))
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS_EN)))
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality score: length band + stopword presence −
    punctuation excess.  Frozen formula (oracle twin in queries.py):

        0.4 * min(len/500, 1) + 0.4 * min(stopword_ratio*5, 1)
        + 0.2 * (1 - min(punct_ratio*10, 1))
    """
    len_part = F.least(F.length(col).cast("double") / F.lit(500.0), F.lit(1.0))
    stop_part = F.least(stopword_ratio(col) * 5.0, F.lit(1.0))
    punct_part = F.lit(1.0) - F.least(punct_ratio(col) * 10.0, F.lit(1.0))
    return F.round(0.4 * len_part + 0.4 * stop_part + 0.2 * punct_part, 6)


def repetition_stats(df, text_col: str = "text"):
    """Token-repetition quality signals (C4/Gopher-style filters): the
    duplicate-token fraction (1 − distinct/total) and the adjacent-repeat
    fraction (share of consecutive equal-token positions).  High values on
    web pages mark boilerplate, keyword stuffing, and generator loops —
    standard pre-training drop rules.

    Narrow per-row codegen: the token array is materialized ONCE as a
    column (HOF lambdas re-evaluate captured subtrees per element — the
    round-2 lesson), every stat derives from it, no shuffle, no Python.
    Adjacent comparison zips the array with its own tail (explicit slice
    length, zero when n<=1); zip_with pads the longer side with null and
    null==x is never true, so the final padded slot never counts."""
    toks_expr = tokens(F.lower(F.col(text_col)))
    out = df.withColumn("_rep_toks", toks_expr)
    t = F.col("_rep_toks")
    n = F.size(t)
    empty = F.length(F.trim(F.col(text_col))) == 0
    n_tokens = F.when(empty, F.lit(0)).otherwise(n)
    dup_frac = F.when(
        n_tokens > 0,
        F.lit(1.0) - F.size(F.array_distinct(t)).cast("double") / n.cast("double"),
    ).otherwise(F.lit(0.0))
    tail = F.slice(t, 2, F.greatest(n - 1, F.lit(0)))
    adj_hits = F.size(F.filter(F.zip_with(t, tail, lambda a, b: a == b), lambda x: x))
    adj_frac = F.when(
        n_tokens >= 2, adj_hits.cast("double") / (n - 1).cast("double")
    ).otherwise(F.lit(0.0))
    return out.select(
        *df.columns,
        n_tokens.alias("n_tokens"),
        F.round(dup_frac, 6).alias("dup_token_frac"),
        F.round(adj_frac, 6).alias("adjacent_repeat_frac"),
    )


def normalize_for_fingerprint(col: Column) -> Column:
    """Deterministic canonical form: lowercase, collapse whitespace, strip."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of the canonical form.  md5 (not xxhash64)
    so the DuckDB oracle can reproduce it bit-for-bit."""
    return F.md5(normalize_for_fingerprint(col))


def with_winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    out_col: str = "winnow_fps",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003):
    rolling hash over character k-grams of the canonical text, keep the MIN
    hash of every w-wide window, distinct.  Robust to local edits — two
    documents sharing any k-gram run of length >= k+w-1 share a fingerprint.

    Shape matters for cost: the gram-hash array is materialized as a real
    column and the window mins are a FOLD of zip_with over w-1 shifted
    suffixes — no array-valued subexpression is referenced inside a lambda
    body (a higher-order-function lambda re-evaluates its body subtrees per
    element, which turns the naive slice-in-transform form O(n^2) per row).
    One narrow pass, no shuffle; hashes via the md5-portable hash64 so the
    DuckDB oracle twin is exact.  Adds `out_col` array<bigint>."""
    s = F.col("_wf_s")
    n_grams = F.greatest(F.length(s) - (k - 1), F.lit(1))
    hashes = F.transform(
        F.sequence(F.lit(1), n_grams), lambda i: hash64(s.substr(i, F.lit(k)))
    )
    h = F.col("_wf_h")
    # min over sliding w-window = fold of element-wise least over shifted
    # suffixes; zip_with truncates to the shorter side only after we slice
    # to the n_win full windows (least() skips the null padding).
    m = h
    for t in range(1, w):
        # NB: slice length must be size(h), not Int.MaxValue — start+maxint
        # overflows int inside the codegen'd slice and yields an empty array
        m = F.zip_with(m, F.slice(h, t + 1, F.size(h)), lambda x, y: F.least(x, y))
    n_win = F.size(h) - (w - 1)
    fps = F.when(n_win <= 0, F.array_distinct(F.array(F.array_min(h)))).otherwise(
        F.array_distinct(F.slice(m, 1, F.greatest(n_win, F.lit(1))))
    )
    return (
        df.withColumn("_wf_s", normalize_for_fingerprint(F.col(text_col)))
        .withColumn("_wf_h", hashes)
        .withColumn(out_col, fps)
        .drop("_wf_s", "_wf_h")
    )


def hash64(col: Column) -> Column:
    """Portable 56-bit integer hash both engines compute identically:
    first 14 hex chars of md5, base-16 -> bigint.
    (Spark xxhash64 and DuckDB hash() are engine-specific; md5 is the
    common denominator.  Used by minhash/simhash oracles; the scale path
    can swap in xxhash64 for speed without changing semantics.)"""
    return F.conv(F.substring(F.md5(col), 1, 14), 16, 10).cast("bigint")


def with_textstats(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    return df.select(
        "*",
        token_count(c).alias("n_tokens"),
        bpe_ish_token_count(c).alias("n_subwords"),
        lang_id(c).alias("lang_guess"),
        F.round(stopword_ratio(c), 6).alias("stopword_ratio"),
        F.round(punct_ratio(c), 6).alias("punct_ratio"),
        quality_score(c).alias("quality"),
        fingerprint(c).alias("fp"),
    )
