"""Text-analysis column builders: tokenization, counting, fingerprinting,
quality scoring, language ID.

Everything here is a pure Column expression over built-in functions —
whole-stage-codegen'd, shuffle-free, scales linearly with the scan. Every
builder has an exact DuckDB-SQL equivalent (see queries/pipeline.py) so the
operators are oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Whitespace tokenization — identical semantics to DuckDB
# string_split_regex(trim(x), '\s+').
_WS = r"\s+"


def tokens(c: Column | str) -> Column:
    return F.split(F.trim(c), _WS)


def token_count(c: Column | str) -> Column:
    return F.size(tokens(c))


# BPE-ish subword segmentation: alphabetic runs, digit runs, and single
# non-space symbols — the pre-tokenization split every BPE/GPT-style
# tokenizer applies before merges. Pure char-classes, so Java regex
# (Spark) and RE2 (DuckDB) agree exactly.
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_tokens(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.regexp_extract_all(col, F.lit(BPE_PATTERN), 0)


def bpe_token_count(c: Column | str) -> Column:
    return F.size(bpe_tokens(c))


def bigrams(t: Column | str) -> Column:
    """Adjacent-token pairs of a token array, as ``'w1 w2'`` strings.

    Branch-free: two slices clamped to the same length ``n-1`` are zipped
    (equal lengths, so ``zip_with`` never null-pads); a single-token or
    empty document yields an empty list. No ``when()`` wrapper around the
    HOF — that would force the interpreted path (Spark 4 ANSI gotcha).
    DuckDB equivalent:
    ``list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])``.
    """
    t = F.col(t) if isinstance(t, str) else t
    n1 = F.greatest(F.size(t) - F.lit(1), F.lit(0))
    return F.zip_with(
        F.slice(t, F.lit(1), n1),
        F.slice(t, F.lit(2), n1),
        lambda a, b: F.concat_ws(" ", a, b),
    )


def fingerprint(c: Column | str) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized, lowercased
    text. Stable across engines (md5 hex is canonical)."""
    return F.md5(F.lower(F.regexp_replace(c, _WS, " ")).cast("binary"))


def _count_matching(c: Column | str, char_class: str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.length(col) - F.length(F.regexp_replace(col, char_class, ""))


def punct_ratio(c: Column | str) -> Column:
    return _count_matching(c, "[.,;:!?]") / F.greatest(F.length(c), F.lit(1))


def digit_ratio(c: Column | str) -> Column:
    return _count_matching(c, "[0-9]") / F.greatest(F.length(c), F.lit(1))


def mean_token_len(c: Column | str) -> Column:
    t = tokens(c)
    total = F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
    return total / F.greatest(F.size(t), F.lit(1))


# Tiny per-language stopword lists for the heuristic language ID.
# Deterministic and SQL-expressible; priority order breaks ties.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es": ("el", "la", "de", "que", "y", "los", "un", "es"),
    "fr": ("le", "la", "les", "des", "et", "un", "une", "est"),
    "zh": ("de", "le", "shi", "wo", "bu", "zai", "you", "he"),
}
_LANG_PRIORITY = ("en", "de", "es", "fr", "zh")


def stopword_hits(c: Column | str, lang: str) -> Column:
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(F.array_distinct(tokens(c)), words))


def stopword_ratio(c: Column | str, lang: str = "en") -> Column:
    t = tokens(c)
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(t, lambda x: F.array_contains(words, x)))
    return hits / F.greatest(F.size(t), F.lit(1))


def lang_id(c: Column | str) -> Column:
    """Heuristic language ID: distinct-token hits against each language's
    stopword list; argmax with fixed priority order (en>de>es>fr>zh),
    'und' (undetermined) when no list scores a hit."""
    scores = {lang: stopword_hits(c, lang) for lang in _LANG_PRIORITY}
    best = F.greatest(*scores.values())
    out = F.lit("und")
    # Build the CASE chain in reverse priority so earlier langs win ties.
    for lang in reversed(_LANG_PRIORITY):
        out = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(out)
    return out


def quality_score(c: Column | str) -> Column:
    """Composite quality score in [0,1]: rewards reasonable length and
    stopword density, penalizes punctuation/digit noise. Deterministic
    fixed-order double arithmetic (same expression shape as the oracle)."""
    len_score = F.least(token_count(c) / F.lit(100.0), F.lit(1.0))
    return (
        F.lit(0.4) * len_score
        + F.lit(0.2) * (F.lit(1.0) - punct_ratio(c))
        + F.lit(0.2) * (F.lit(1.0) - digit_ratio(c))
        + F.lit(0.2) * stopword_ratio(c, "en")
    )
