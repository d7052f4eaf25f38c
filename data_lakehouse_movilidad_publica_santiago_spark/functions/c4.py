"""C4 cleaning heuristics (Raffel et al., "Exploring the Limits of
Transfer Learning with a Unified Text-to-Text Transformer", 2020,
§2.2 — the published rule battery behind the Colossal Clean Crawled
Corpus).

Two levels, exactly as published:

- LINE filters (applied first, independently per line): keep a line
  only if it ends in a terminal punctuation mark, has at least
  ``min_words_per_line`` words, and does not mention "javascript".
- PAGE filters (ordered reason-code chain, same first-match-wins
  discipline as the Gopher battery and the silver quarantine): drop
  the page when it contains "lorem ipsum", a curly brace, any
  blocklisted word, or — after line filtering — fewer than
  ``min_sentences`` sentences.

Everything is a pure Column expression (JVM, codegen) over the raw
text; nothing here shuffles. The paper's blocklist is the public
"List of Dirty, Naughty, Obscene..." word list, which deployments
pass in via ``blocklist``; the default here is a tiny neutral
placeholder so the rule is exercised without shipping that list.

Complements ``functions/gopher.py`` (Rae et al. 2021): C4 is
line-then-page structural cleaning, Gopher is token-statistics
screening; production corpus builds typically run both.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ordered page-level reason chain — the order IS the contract
C4_REASONS = (
    "LOREM_IPSUM",
    "CURLY_BRACE",
    "BLOCKLIST_WORD",
    "TOO_FEW_SENTENCES",
)

# stand-in for the paper's public blocklist (supplied per-deployment)
C4_DEFAULT_BLOCKLIST = ("badword",)

_TERMINALS = (".", "!", "?", '"')


def c4_kept_lines(col: Column, min_words_per_line: int = 3) -> Column:
    """Array of lines surviving the C4 LINE filters: ends in terminal
    punctuation ('.', '!', '?', '"'), ≥ ``min_words_per_line`` words,
    and no (case-insensitive) "javascript" mention."""
    col = F.coalesce(col, F.lit(""))

    def _keep(ln: Column) -> Column:
        last = F.right(F.rtrim(ln), F.lit(1))
        n_words = F.size(
            F.filter(F.split(F.trim(ln), " "), lambda w: w != "")
        )
        return (
            last.isin(*_TERMINALS)
            & (n_words >= min_words_per_line)
            & ~F.contains(F.lower(ln), F.lit("javascript"))
        )

    return F.filter(F.split(col, "\n"), _keep)


def c4_reason(
    col: Column,
    min_sentences: int = 5,
    min_words_per_line: int = 3,
    blocklist: tuple[str, ...] | None = None,
) -> Column:
    """First failing C4 PAGE rule's code, or NULL when the page
    passes. Sentence count = terminal punctuation marks across the
    lines that survive the line filters (the paper splits retained
    text into sentences; counting terminators is the expression-only
    equivalent for well-punctuated text)."""
    words = blocklist if blocklist is not None else C4_DEFAULT_BLOCKLIST
    # fail CLOSED on NULL text, same discipline as gopher_reason
    col = F.coalesce(col, F.lit(""))
    kept = c4_kept_lines(col, min_words_per_line)
    n_sentences = F.size(
        F.regexp_extract_all(F.array_join(kept, "\n"), F.lit(r"[.!?]"), 0)
    )
    # empty blocklist = rule disabled (not "everything blocked")
    has_blocked = (
        F.exists(F.split(F.lower(col), r"\s+"), lambda w: w.isin(*words))
        if words
        else F.lit(False)
    )
    return (
        F.when(F.contains(F.lower(col), F.lit("lorem ipsum")), C4_REASONS[0])
        .when(F.contains(col, F.lit("{")), C4_REASONS[1])
        .when(has_blocked, C4_REASONS[2])
        .when(n_sentences < min_sentences, C4_REASONS[3])
        .otherwise(F.lit(None).cast("string"))
    )
