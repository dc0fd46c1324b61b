"""Text-analysis column expressions for document pipelines (SURVEY §7.4).

Everything here is a JVM-side built-in expression (split / transform /
filter / aggregate higher-order functions) — no Python UDFs — so the hot path
stays inside whole-stage codegen and scales linearly with input bytes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Default English stopword sample used by stopword_ratio / quality_score.
STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "is", "it", "for")

#: Punctuation class counted by punct_ratio — spelled out so the regex means
#: the same thing under Java regex (Spark) and RE2 (DuckDB oracle).
PUNCT_CLASS = r"[.,!?;:'\"()\[\]{}-]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization → array<string>; empty text → empty array."""
    return F.when(F.length(F.trim(text)) == 0, F.array().cast("array<string>")).otherwise(
        F.split(F.trim(text), r"\s+")
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def char_count(text: Column) -> Column:
    return F.length(text)


def avg_token_len(text: Column) -> Column:
    """Mean token length = non-whitespace chars / token count (NULL if empty)."""
    non_ws = F.length(F.regexp_replace(text, r"\s", ""))
    return non_ws / F.nullif(token_count(text), F.lit(0))


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars (NULL for empty text)."""
    return F.regexp_count(text, F.lit(PUNCT_CLASS)) / F.nullif(
        F.length(text), F.lit(0)
    )


def stopword_ratio(text: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    """Fraction of tokens that are stopwords (NULL for empty text)."""
    toks = tokens(F.lower(text))
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return n_stop / F.nullif(F.size(toks), F.lit(0))


def quality_score(text: Column) -> Column:
    """Heuristic [0,1] quality score from length / punctuation / stopwords.

    The weights mirror common pretraining-data filters (length in a sane
    band, some stopwords present, punctuation not dominating); deterministic
    arithmetic only, so it is oracle-checkable.
    """
    n_tok = token_count(text)
    len_ok = F.when((n_tok >= 5) & (n_tok <= 100000), 1.0).otherwise(0.0)
    stop_r = F.coalesce(stopword_ratio(text), F.lit(0.0))
    punct_r = F.coalesce(punct_ratio(text), F.lit(0.0))
    score = (
        0.4 * len_ok
        + 0.4 * F.least(stop_r * F.lit(4.0), F.lit(1.0))
        + 0.2 * (1.0 - F.least(punct_r * F.lit(5.0), F.lit(1.0)))
    )
    return F.round(score, 6)


#: BPE-style pre-tokenization pattern (GPT-2-family shape, simplified to
#: the regex subset Java (Spark) and RE2 (DuckDB oracle) agree on): a
#: token is an optional leading space + a letter run, digit run, or
#: punctuation run. Subword merges happen AFTER this split in a real BPE,
#: so this count upper-bounds-approximates "BPE tokens before merges" —
#: the quantity pretraining-data pipelines budget on.
BPE_SPLIT_PATTERN = r" ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9]+"


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-style pre-tokens over the lowercased text."""
    return F.regexp_count(F.lower(text), F.lit(BPE_SPLIT_PATTERN))


#: symbols the Gopher symbol-to-word rule counts (hash marks + ellipses)
SYMBOL_PATTERN = r"#|\.\.\."

#: a line "is a bullet" if it starts with -, *, or • after optional space
BULLET_PATTERN = r"^\s*[-*•]"


def alpha_word_frac(text: Column) -> Column:
    """Fraction of words containing at least one ASCII letter (NULL if empty)."""
    toks = tokens(text)
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-zA-Z]")))
    return n_alpha / F.nullif(F.size(toks), F.lit(0))


def distinct_stopword_count(
    text: Column, stopwords: tuple[str, ...] = STOPWORDS
) -> Column:
    """How many DISTINCT stopwords appear (the Gopher ≥2-stopwords rule)."""
    toks = F.array_distinct(tokens(F.lower(text)))
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.array_intersect(toks, stop_arr))


def symbol_word_ratio(text: Column) -> Column:
    """(# of '#' or '...' occurrences) / word count (NULL if empty)."""
    return F.regexp_count(text, F.lit(SYMBOL_PATTERN)) / F.nullif(
        token_count(text), F.lit(0)
    )


def bullet_line_frac(text: Column) -> Column:
    """Fraction of lines that start with a bullet marker (NULL if no text)."""
    lines = F.split(text, "\n")
    n_bullet = F.size(F.filter(lines, lambda l: l.rlike(BULLET_PATTERN)))
    return n_bullet / F.nullif(F.size(lines), F.lit(0))


def gopher_flags(text: Column) -> dict[str, Column]:
    """Gopher-style quality-filter rule columns (Rae et al. 2021 §A1.1).

    Returns measures, per-rule booleans (NULL-safe: an empty doc fails
    closed), and ``keep`` = AND of all rules. Pure built-in expressions —
    filtering 100 TB is one projection with zero shuffles, and every
    threshold is visible in the output for audit.
    """
    n_words = token_count(text)
    mean_len = avg_token_len(text)
    sym = symbol_word_ratio(text)
    alpha = alpha_word_frac(text)
    n_stop = distinct_stopword_count(text)
    bullets = bullet_line_frac(text)

    def ok(c: Column) -> Column:
        return F.coalesce(c, F.lit(False))

    flags = {
        "flag_word_count": ok((n_words >= 50) & (n_words <= 100_000)),
        "flag_mean_word_len": ok((mean_len >= 3.0) & (mean_len <= 10.0)),
        "flag_symbol_ratio": ok(sym <= 0.1),
        "flag_alpha_words": ok(alpha >= 0.8),
        "flag_stopwords": ok(n_stop >= 2),
        "flag_bullets": ok(bullets <= 0.9),
    }
    keep = F.lit(True)
    for c in flags.values():
        keep = keep & c
    return {
        "n_words": n_words,
        "mean_word_len": mean_len,
        "symbol_ratio": sym,
        "alpha_word_frac": alpha,
        "n_distinct_stopwords": n_stop,
        "bullet_line_frac": bullets,
        **flags,
        "keep": keep,
    }


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapsed whitespace."""
    return F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))


def fingerprint(text: Column) -> Column:
    """Deterministic 128-bit content fingerprint of the normalized text."""
    return F.md5(normalize_text(text))


def char_shingles_from(t: Column, n: int = 5) -> Column:
    """Distinct character n-grams of an ALREADY-MATERIALIZED string column.

    ``t`` must be a plain column reference (not a nested expression): it is
    referenced once per output element inside the lambda, and Catalyst
    re-evaluates nested expressions per element — O(len²) if you inline
    ``normalize_text`` here. Materialize first (see dedup._with_shingles).
    Short texts (< n chars) yield the whole text as a single shingle.
    """
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(t) - (n - 1), F.lit(1))),
            lambda i: t.substr(i, F.lit(n)),
        )
    )


def token_shingles_from(toks: Column, n: int = 3) -> Column:
    """Distinct word n-grams from an ALREADY-MATERIALIZED array column.

    Same per-element re-evaluation caveat as char_shingles_from: pass a
    bound column, not the tokenization expression itself.
    """
    k = F.size(toks)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(k - (n - 1), F.lit(1))),
            lambda i: F.concat_ws(
                " ", *[F.try_element_at(toks, i + j) for j in range(n)]
            ),
        )
    )


def char_shingles(text: Column, n: int = 5) -> Column:
    """Distinct character n-grams of the normalized text.

    Convenience form for row-at-a-time use (tests, small frames). For bulk
    corpora use char_shingles_from on a materialized normalized column —
    this inline form re-normalizes per element.
    """
    return char_shingles_from(normalize_text(text), n)


def token_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams of the normalized text (see char_shingles note)."""
    return token_shingles_from(tokens(normalize_text(text)), n)
