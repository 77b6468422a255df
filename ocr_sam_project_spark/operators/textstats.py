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


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher rule-bank document filter (Rae et al. 2021, table A1) — the
    classic heuristic battery quality_score doesn't express: word-count
    band, mean word length band, symbol-to-word ratio, alphabetic-word
    fraction, bullet/ellipsis line fractions, and the >=2-stopword
    requirement, plus the composite `passes_gopher` verdict with the
    published thresholds (50 <= words <= 100k, 3 <= mean_len <= 10,
    symbols < 0.1, alpha > 0.8, bullets < 0.9, ellipsis < 0.3,
    stopword hits >= 2).  Empty docs: zero counts, NULL ratios, fails.

    Scale shape (100 TB): entirely narrow native codegen — one split per
    row materialized ONCE into token/line arrays (the winnowing lesson:
    anything referenced inside a HOF lambda re-evaluates per element),
    every stat an array fold over them; no shuffle, no UDF.  All ratios
    rounded to 6 dp so SQL twins compare the identical doubles."""
    out = df.withColumn("_w", F.split(F.trim(F.col(text_col)), r"\s+")).withColumn(
        "_wl", F.transform(F.col("_w"), lambda w: F.lower(w))
    ).withColumn("_ln", F.split(F.col(text_col), "\n"))
    n_words = F.when(
        F.length(F.trim(F.col(text_col))) == 0, F.lit(0)
    ).otherwise(F.size("_w")).cast("long")
    n_lines = F.size("_ln").cast("long")
    # total non-ws chars / n_words — cheaper than a per-word length fold
    char_sum = F.length(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", ""))
    alpha_words = F.size(F.filter(F.col("_w"), lambda w: w.rlike("[A-Za-z]")))
    symbols = (
        F.length(F.col(text_col))
        - F.length(F.regexp_replace(F.col(text_col), "#", ""))
    ) + F.size(F.expr(f"regexp_extract_all({text_col}, '(\\\\.\\\\.\\\\.|…)', 0)"))
    bullet_lines = F.size(
        F.filter(F.col("_ln"), lambda l: F.trim(l).rlike("^[-*•]"))
    )
    ellipsis_lines = F.size(
        F.filter(F.col("_ln"), lambda l: F.trim(l).rlike("(\\.\\.\\.|…)$"))
    )
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            lambda s: F.array_contains(F.col("_wl"), s),
        )
    )
    nz = n_words > 0
    mean_wl = F.when(nz, F.round(char_sum.cast("double") / n_words, 6))
    sym_r = F.when(nz, F.round(symbols.cast("double") / n_words, 6))
    alpha_f = F.when(nz, F.round(alpha_words.cast("double") / n_words, 6))
    bullet_f = F.round(bullet_lines.cast("double") / n_lines, 6)
    ellipsis_f = F.round(ellipsis_lines.cast("double") / n_lines, 6)
    passes = (
        nz
        & n_words.between(50, 100_000)
        & mean_wl.between(3.0, 10.0)
        & (sym_r < 0.1)
        & (alpha_f > 0.8)
        & (bullet_f < 0.9)
        & (ellipsis_f < 0.3)
        & (stop_hits >= 2)
    )
    return out.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        sym_r.alias("symbol_word_ratio"),
        alpha_f.alias("alpha_word_frac"),
        bullet_f.alias("bullet_line_frac"),
        ellipsis_f.alias("ellipsis_line_frac"),
        stop_hits.cast("long").alias("stopword_hits"),
        F.coalesce(passes, F.lit(False)).alias("passes_gopher"),
    )
