"""Gopher quality rules (Rae et al., "Scaling Language Models:
Methods, Analysis & Insights from Training Gopher", 2021, §A1.1).

The published heuristic filter battery for web-scale training text,
expressed as one ordered reason-code chain — the same first-match-
wins CASE discipline as the silver quarantine (SURVEY §2 P5), so a
document failing several rules reports the FIRST failure only and
the reason distribution is stable and auditable.

Every rule is a pure Column expression (JVM, codegen) over the raw
space-split tokens; nothing here shuffles. Thresholds are the
paper's; override per-corpus via the keyword arguments.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .text import QUALITY_STOPWORDS, dup_ngram_fraction

# ordered (code, predicate-builder) chain — the order IS the contract
GOPHER_REASONS = (
    "TOO_FEW_WORDS",
    "TOO_MANY_WORDS",
    "BAD_MEAN_WORD_LENGTH",
    "HIGH_SYMBOL_RATIO",
    "LOW_ALPHA_FRACTION",
    "TOO_FEW_STOPWORDS",
    "HIGH_DUP_2GRAM",
)


def gopher_reason(
    col: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_fraction: float = 0.8,
    min_stopword_hits: int = 2,
    max_dup_2gram: float = 0.4,
    stopwords: list[str] | None = None,
) -> Column:
    """First failing Gopher rule's code, or NULL when the document
    passes all rules.

    Rules (paper thresholds): word count in [50, 100k]; mean word
    length in [3, 10]; '#'/'…'-style symbol-to-word ratio ≤ 0.1; ≥80%
    of words contain an alphabetic character; at least 2 stopword
    occurrences; duplicate word-2-gram fraction ≤ 0.4 (the repetition
    family's document-level cut)."""
    stops = stopwords if stopwords is not None else QUALITY_STOPWORDS
    # fail CLOSED on NULL text: a null would make every predicate
    # three-valued-NULL and fall through to the pass verdict; the
    # empty string tokenizes to [''] (1 word) and fails TOO_FEW_WORDS
    col = F.coalesce(col, F.lit(""))
    toks = F.split(col, " ")
    n = F.size(toks)
    nd = n.cast("double")
    # mean word length over the raw tokens (left as an exact ratio of
    # integer-valued doubles — both engines divide identically)
    total_len = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    ).cast("double")
    mean_len = total_len / nd
    symbols = (
        F.size(F.regexp_extract_all(col, F.lit(r"#|\.\.\."), 0)).cast("double")
    )
    alpha_words = F.size(
        F.filter(toks, lambda t: t.rlike("[a-zA-Z]"))
    ).cast("double")
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(stops)))

    return (
        F.when(n < min_words, GOPHER_REASONS[0])
        .when(n > max_words, GOPHER_REASONS[1])
        .when(
            (mean_len < min_mean_word_len) | (mean_len > max_mean_word_len),
            GOPHER_REASONS[2],
        )
        .when(symbols / nd > max_symbol_ratio, GOPHER_REASONS[3])
        .when(alpha_words / nd < min_alpha_fraction, GOPHER_REASONS[4])
        .when(stop_hits < min_stopword_hits, GOPHER_REASONS[5])
        .when(dup_ngram_fraction(col, 2) > max_dup_2gram, GOPHER_REASONS[6])
        .otherwise(F.lit(None).cast("string"))
    )
