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


def occurrences_padded(padded: Column, word: str) -> Column:
    """``occurrences`` over a PRE-COMPUTED padded+normalized column —
    same arithmetic, but the caller pays the whitespace regex once per
    row instead of once per stopword (see text_stats_columns)."""
    pat = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(pat), F.lit(""))))
        / F.lit(len(pat))
    ).cast("long")


def _text_counts_udf():
    """Arrow-batched twin of the n_tokens / n_punct / stop_hits count
    expressions, fused into ONE pass over the pre-normalized column
    (guide §4.2). The JVM form pays ~9 full-string scans per row (7
    stopword ``replace`` rebuilds + the punct regex + the token split);
    this kernel is 8 ``pc.count_substring`` calls and one RE2 count per
    batch, no string rebuilt anywhere.

    Exact-parity notes (each is pinned by the text_stats oracle hash):

    * ``count_substring`` counts non-overlapping matches left-to-right —
      the same greedy skip ``replace``-based counting performs (verified
      on the self-overlapping ``' the the '`` case: both count 1);
    * punct is counted over NORM, not the raw text: whitespace
      normalization only rewrites whitespace, and the counted class
      ``[^a-zA-Z0-9\\s]`` excludes whitespace entirely, so the count is
      unchanged — and Java's ``\\s`` is spelled out as the ASCII set
      ``[ \\t\\n\\x0b\\f\\r]`` (RE2's ``\\s`` lacks ``\\x0b``);
    * n_tokens = spaces + 1 on the normalized string (runs already
      collapsed, ends trimmed), 0 for empty — identical to
      ``size(split(norm, ' '))`` under the empty-guard."""
    import pandas as pd
    from pyspark.sql import types as T

    out_t = T.StructType(
        [
            T.StructField("n_tokens", T.IntegerType()),
            T.StructField("n_punct", T.LongType()),
            T.StructField("stop_hits", T.LongType()),
        ]
    )

    def counts(norm):
        import pyarrow as pa
        import pyarrow.compute as pc

        arr = pa.Array.from_pandas(norm)
        spaces = pc.count_substring(arr, " ")
        n_tokens = pc.if_else(
            pc.equal(pc.utf8_length(arr), 0),
            pa.scalar(0, pa.int32()),
            pc.add(spaces, 1),
        )
        pad = pa.nulls(len(arr), pa.string()).fill_null(" ")
        padded = pc.binary_join_element_wise(pad, arr, pad, "")
        stop = None
        for w in STOPWORDS_EN:
            c = pc.count_substring(padded, f" {w} ")
            stop = c if stop is None else pc.add(stop, c)
        n_punct = pc.count_substring_regex(arr, "[^a-zA-Z0-9 \t\n\x0b\f\r]")
        return pd.DataFrame(
            {
                "n_tokens": n_tokens.to_pandas(),
                "n_punct": pc.cast(n_punct, pa.int64()).to_pandas(),
                "stop_hits": pc.cast(stop, pa.int64()).to_pandas(),
            }
        )

    # no type hints on purpose: the hint-inference path does not accept
    # the Series -> DataFrame (struct-returning) scalar form
    return F.pandas_udf(counts, out_t)


def text_stats_columns_from_counts(
    text: Column, norm: Column, n_tokens: Column, n_punct: Column, stop_hits: Column
) -> dict[str, Column]:
    """The q_text_stats output map over PRE-COMPUTED count columns (the
    Arrow kernel above): the md5 fingerprint and the exact-decimal
    quality composite stay in the JVM — bit-identical formulas to
    ``text_stats_columns``, fed by counts instead of re-deriving them."""
    fp = F.md5(F.encode(F.lower(norm), "UTF-8"))
    words_d = n_tokens.cast("decimal(18,6)")
    chars_d = F.greatest(F.length(text), F.lit(1)).cast("decimal(18,6)")
    stop_d = stop_hits.cast("decimal(18,6)")
    punct_d = n_punct.cast("decimal(18,6)")
    len_term = F.least(
        F.round(words_d / F.lit(200).cast("decimal(18,6)"), 6),
        F.lit(1).cast("decimal(18,6)"),
    )
    stop_term = F.least(
        F.round(stop_d * 10 / F.greatest(words_d, F.lit(1).cast("decimal(18,6)")), 6),
        F.lit(1).cast("decimal(18,6)"),
    )
    punct_term = F.round(punct_d / chars_d, 6)
    quality = F.round(
        len_term * F.lit("0.4").cast("decimal(18,6)")
        + stop_term * F.lit("0.4").cast("decimal(18,6)")
        + (F.lit(1).cast("decimal(18,6)") - punct_term) * F.lit("0.2").cast("decimal(18,6)"),
        6,
    ).cast("double")
    return {
        "n_tokens": n_tokens,
        "n_punct": n_punct,
        "stop_hits": stop_hits,
        "fp": fp,
        "quality": quality,
    }


def text_stats_columns(text: Column, norm: Column, padded: Column) -> dict[str, Column]:
    """The q_text_stats output expressions, factored over pre-computed
    ``norm`` = norm_ws(text) and ``padded`` = ' ' || norm || ' ' columns.

    Identical formulas (and bit-identical values) to token_count /
    stopword_hits / punct_count / fingerprint / quality_score over the
    raw text — but the caller materializes norm/padded ONCE in an inner
    projection. Catalyst's CollapseProject declines to merge projections
    that would duplicate non-cheap expressions, so the two-step select
    keeps one regexp_replace per row where the single-projection form
    evaluated the \\s+ scan ~19x (codegen subexpression elimination does
    not reach across the when/least/greatest branches these formulas
    nest it in — measured 3.5x on the full documents table)."""
    n_tokens = F.when(F.length(norm) == 0, F.lit(0)).otherwise(
        F.size(F.split(norm, " "))
    )
    stop = sum(occurrences_padded(padded, w) for w in STOPWORDS_EN)
    punct = F.length(text) - F.length(F.regexp_replace(text, r"[^a-zA-Z0-9\s]", ""))
    fp = F.md5(F.encode(F.lower(norm), "UTF-8"))
    words_d = n_tokens.cast("decimal(18,6)")
    chars_d = F.greatest(F.length(text), F.lit(1)).cast("decimal(18,6)")
    stop_d = stop.cast("decimal(18,6)")
    punct_d = punct.cast("decimal(18,6)")
    len_term = F.least(
        F.round(words_d / F.lit(200).cast("decimal(18,6)"), 6),
        F.lit(1).cast("decimal(18,6)"),
    )
    stop_term = F.least(
        F.round(stop_d * 10 / F.greatest(words_d, F.lit(1).cast("decimal(18,6)")), 6),
        F.lit(1).cast("decimal(18,6)"),
    )
    punct_term = F.round(punct_d / chars_d, 6)
    quality = F.round(
        len_term * F.lit("0.4").cast("decimal(18,6)")
        + stop_term * F.lit("0.4").cast("decimal(18,6)")
        + (F.lit(1).cast("decimal(18,6)") - punct_term) * F.lit("0.2").cast("decimal(18,6)"),
        6,
    ).cast("double")
    return {
        "n_tokens": n_tokens,
        "n_punct": punct.cast("long"),
        "stop_hits": stop,
        "fp": fp,
        "quality": quality,
    }


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
