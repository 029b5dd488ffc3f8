"""Text-analysis operators for large-scale training-data pipelines.

All pure JVM expressions (whole-stage codegen; no Python in the hot
path), designed so a DuckDB oracle can express the identical formula:

* token counting (whitespace tokenization);
* n-gram-marker language ID (stopword-occurrence scoring);
* quality scoring (length / punctuation / stopword ratios);
* document fingerprinting (md5 of whitespace-normalized text).

Counting trick used throughout: occurrences of a literal `pat` in `s` =
(len(s) - len(replace(s, pat, ''))) / len(pat) — exact integer
arithmetic, identical in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# marker stopwords per language (padded-space matching)
LANG_MARKERS = {
    "en": ["the", "and", "a", "of"],
    "es": ["el", "la", "de", "que"],
    "de": ["der", "die", "und", "das"],
    "fr": ["le", "la", "et", "les"],
}
LANG_ORDER = ["en", "es", "de", "fr"]  # deterministic tie-break order

STOPWORDS_EN = ["the", "a", "and", "of", "to", "in", "is"]


def norm_ws(col: Column) -> Column:
    """Collapse whitespace runs to single spaces + trim."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def token_count(col: Column) -> Column:
    t = norm_ws(col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, " "))
    )


def occurrences(col: Column, word: str) -> Column:
    """Count of ` word ` in the space-padded, ws-normalized text."""
    s = F.concat(F.lit(" "), norm_ws(col), F.lit(" "))
    pat = f" {word} "
    return (
        (F.length(s) - F.length(F.replace(s, F.lit(pat), F.lit(""))))
        / F.lit(len(pat))
    ).cast("long")


def lang_scores(col: Column) -> dict[str, Column]:
    return {
        lang: sum(occurrences(col, w) for w in words).alias(f"score_{lang}")
        for lang, words in LANG_MARKERS.items()
    }


def lang_id(col: Column) -> Column:
    """argmax language with deterministic tie-break (LANG_ORDER); 'und'
    when no marker hits at all."""
    scores = lang_scores(col)
    best = F.greatest(*[scores[lang] for lang in LANG_ORDER])
    expr = F.lit("und")
    # build reversed so earlier langs win ties
    for lang in reversed(LANG_ORDER):
        expr = F.when(
            (scores[lang] == best) & (best > 0), F.lit(lang)
        ).otherwise(expr)
    return expr


def punct_count(col: Column) -> Column:
    return F.length(col) - F.length(F.regexp_replace(col, r"[^a-zA-Z0-9\s]", ""))


def stopword_hits(col: Column) -> Column:
    return sum(occurrences(col, w) for w in STOPWORDS_EN)


def quality_score(col: Column) -> Column:
    """Composite in [0,1]: length saturation + stopword density -
    punctuation density. Exact decimal arithmetic, rounded to 6dp."""
    words = token_count(col).cast("decimal(18,6)")
    chars = F.greatest(F.length(col), F.lit(1)).cast("decimal(18,6)")
    stop = stopword_hits(col).cast("decimal(18,6)")
    punct = punct_count(col).cast("decimal(18,6)")
    len_term = F.least(F.round(words / F.lit(200).cast("decimal(18,6)"), 6), F.lit(1).cast("decimal(18,6)"))
    stop_term = F.least(
        F.round(stop * 10 / F.greatest(words, F.lit(1).cast("decimal(18,6)")), 6),
        F.lit(1).cast("decimal(18,6)"),
    )
    punct_term = F.round(punct / chars, 6)
    score = F.round(
        len_term * F.lit("0.4").cast("decimal(18,6)")
        + stop_term * F.lit("0.4").cast("decimal(18,6)")
        + (F.lit(1).cast("decimal(18,6)") - punct_term) * F.lit("0.2").cast("decimal(18,6)"),
        6,
    )
    return score.cast("double")


def fingerprint(col: Column) -> Column:
    """md5 of lowercased, whitespace-normalized text — the exact-dedup key."""
    return F.md5(F.encode(F.lower(norm_ws(col)), "UTF-8"))


def clean_thm_col(col: Column) -> Column:
    """JVM twin of ``functions.text.clean_thm`` (F8 — the reference's
    theorem-text cleaner, thm_similarity/thmtools.py:64-70): lowercase,
    strip latex commands, space-pad operators and digit runs, collapse
    every other character run to a single space. Tested byte-identical
    to the Python function (tests/test_text_functions.py)."""
    s = F.lower(col)
    s = F.regexp_replace(
        s, r"\\[a-z]*(begin|end|cite|label|footnote|ref)[a-z]*\{[\w\s,\*:-]+\}(\[[^\]]+\])?", " "
    )
    s = F.regexp_replace(s, r"([\+\*\^<>=_-])", r" $1 ")
    s = F.regexp_replace(s, r"([0-9]+)", r" $1 ")
    s = F.regexp_replace(s, r"[^a-z0-9<>=\+\*\^_-]+", " ")
    return s
