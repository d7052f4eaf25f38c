"""Text-analysis expression library (beyond-reference: the
LLM-training-data operators required by BASELINE.json's north star).

Everything here is a pure Column expression (JVM-side, codegen'd) so
it scales to 100 TB of documents without Python in the hot path, and
each formula is simple enough to re-express in ANSI SQL for the
DuckDB differential oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_text(col: Column) -> Column:
    """Lowercase, strip non-alphanumerics to spaces, collapse runs,
    trim — the canonical form for hashing/fingerprinting."""
    lowered = F.lower(col)
    cleaned = F.regexp_replace(lowered, "[^a-z0-9]+", " ")
    return F.trim(cleaned)


def tokens(col: Column) -> Column:
    """Whitespace tokens of the normalized text (array<string>)."""
    return F.split(normalize_text(col), " ")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token estimate: count of maximal runs of letters,
    digits, or single non-space symbols — the standard 'GPT-style
    tokenizer ≈ words + punctuation' approximation."""
    return F.size(
        F.regexp_extract_all(F.lower(col), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)
    )


def word_shingles(col: Column, k: int = 3) -> Column:
    """Distinct word k-grams (array<string>) for Jaccard/MinHash.
    Documents shorter than k words yield a single whole-doc shingle."""
    toks = tokens(col)
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    return F.array_distinct(grams)


def token_set(col: Column) -> Column:
    """Distinct tokens (the unigram shingle set)."""
    return F.array_distinct(tokens(col))


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two string arrays."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def stopword_ratio(col: Column, stopwords: list[str]) -> Column:
    """Fraction of tokens that are stopwords."""
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda t: t.isin(stopwords)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are neither alphanumeric nor space."""
    total = F.length(col)
    punct = F.length(F.regexp_replace(col, "[a-zA-Z0-9\\s]", ""))
    return F.when(total > 0, punct / total).otherwise(F.lit(0.0))


def mean_word_length(col: Column) -> Column:
    toks = tokens(col)
    return F.when(
        F.size(toks) > 0,
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast("double")
        / F.size(toks),
    ).otherwise(F.lit(0.0))


# the canonical English stopword list the quality gate and the corpus
# build share — single definition so the `corpus_build_summary` gate's
# filter can never silently diverge from `pipeline.build_corpus`
QUALITY_STOPWORDS = [
    "the", "and", "of", "to", "a", "in", "is", "that", "it", "with",
]  # fmt: skip


def quality_score(col: Column, stopwords: list[str]) -> Column:
    """Heuristic document-quality score in [0,1]: rewards reasonable
    length (50..2000 chars), low punctuation noise, healthy stopword
    presence, and 3..10-char mean word length. Deterministic and
    SQL-portable; weights sum to 1."""
    n = F.length(col)
    len_ok = F.when((n >= 50) & (n <= 2000), 1.0).otherwise(0.5)
    punct_ok = F.when(punct_ratio(col) < 0.1, 1.0).otherwise(0.0)
    stop_ok = F.when(stopword_ratio(col, stopwords) >= 0.05, 1.0).otherwise(0.0)
    mwl = mean_word_length(col)
    word_ok = F.when((mwl >= 3.0) & (mwl <= 10.0), 1.0).otherwise(0.0)
    return (
        F.lit(0.25) * len_ok
        + F.lit(0.25) * punct_ok
        + F.lit(0.25) * stop_ok
        + F.lit(0.25) * word_ok
    )


def doc_fingerprint(col: Column) -> Column:
    """Deterministic 128-bit content fingerprint (md5 of the
    normalized text) — the exact-dedup key; md5 so the DuckDB oracle
    computes the identical digest."""
    return F.md5(normalize_text(col))


def winnow_fingerprints(col: Column, k: int = 8, w: int = 4) -> Column:
    """Rolling-hash document fingerprints by winnowing (Schleimer,
    Wilkerson & Aiken, SIGMOD 2003 — the MOSS algorithm): hash every
    character ``k``-gram of the normalized text, slide a window of
    ``w`` consecutive gram-hashes, keep each window's minimum, return
    the sorted distinct selection (``array<string>``).

    Guarantees: any shared substring of length ≥ k+w-1 between two
    documents yields at least one shared fingerprint, and the
    selection density is ~2/(w+1) of all grams — the standard local
    sampling for partial-overlap/plagiarism detection, where whole-doc
    hashing (``doc_fingerprint``) and shingle MinHash both fail on
    contained or re-ordered fragments.

    The gram hash is md5 (both engines compute identical digests on
    identical normalized bytes; hex strings compare lexicographically
    in both), so a DuckDB oracle can replay the selection exactly.
    Per-row map-only expression → embarrassingly parallel at scale;
    downstream matching is one explode + fingerprint groupBy.
    """
    empty = F.array().cast("array<string>")

    def _mins(g: Column) -> Column:
        # if fewer than w grams exist, take one window over all of them
        n_windows = F.greatest(
            F.size(g) - F.lit(w - 1), F.least(F.size(g), F.lit(1))
        )
        return F.when(
            F.size(g) > 0,
            F.transform(
                F.sequence(F.lit(1), n_windows),
                lambda j: F.array_min(F.slice(g, j, w)),
            ),
        ).otherwise(empty)

    def _grams(s: Column) -> Column:
        n_grams = F.length(s) - F.lit(k - 1)
        return F.when(
            n_grams > 0,
            F.transform(
                F.sequence(F.lit(1), n_grams),
                lambda i: F.md5(s.substr(i, F.lit(k)).cast("binary")),
            ),
        ).otherwise(empty)

    # Interpreted higher-order lambdas re-evaluate NON-lambda
    # subexpressions once per element (no subexpression elimination),
    # so referencing the normalized string / gram array directly inside
    # a lambda body would redo the regexp / all the md5s per element —
    # O(n²) per document. Wrapping each intermediate in a one-element
    # array and binding it as the HOF input makes it a lambda VARIABLE
    # (materialized once, cheap to reference): normalize once, hash
    # each gram once, window mins O(n·w).
    fps = F.element_at(
        F.transform(
            F.array(normalize_text(col)),
            lambda s: F.element_at(
                F.transform(F.array(_grams(s)), _mins), 1
            ),
        ),
        1,
    )
    return F.array_sort(F.array_distinct(fps))


# language-ID: tiny per-language marker lexicons; scoring is a plain
# deterministic count (the n-gram-heuristic shape of fastText-style
# lang-ID, reduced to something both engines can compute exactly)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "es": ["el", "la", "de", "que", "los", "una", "por", "con"],
    "de": ["der", "die", "und", "das", "ein", "mit", "ist", "von"],
    "fr": ["le", "les", "des", "une", "est", "dans", "pour", "que"],
    "zh": ["de5", "shi4", "le5", "zai4", "you3", "wo3", "ta1", "men5"],
}


def lang_scores(col: Column) -> dict[str, Column]:
    """Marker-hit count per language over the token set."""
    ts = token_set(col)
    return {
        lang: F.size(F.filter(ts, lambda t: t.isin(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def predict_lang(col: Column) -> Column:
    """argmax of marker hits, ties broken by language code order;
    'und' (undetermined) when nothing matches."""
    scores = lang_scores(col)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # reversed so earlier languages win ties via later .when override
    for lang in sorted(scores, reverse=True):
        expr = F.when((scores[lang] > 0) & (scores[lang] == best), lang).otherwise(
            expr
        )
    return expr


def word_ngrams_raw(col: Column, n: int = 2) -> Column:
    """ALL word n-grams of the raw space-split text, duplicates
    included (array<string>) — the repetition-analysis counterpart of
    ``word_shingles`` (which normalizes and dedups). Documents shorter
    than ``n`` words yield one short gram, so the array is never
    empty and ratio denominators are safe."""
    toks = F.split(col, " ")
    cnt = F.size(toks)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(cnt - F.lit(n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )


def dup_ngram_fraction(col: Column, n: int = 2) -> Column:
    """Gopher-style repetition signal: fraction of word n-gram
    OCCURRENCES that are repeats of an earlier occurrence
    (``1 - distinct/total``). 0.0 = no repetition; → 1.0 as the text
    degenerates into a loop."""
    grams = word_ngrams_raw(col, n)
    return F.lit(1.0) - F.size(F.array_distinct(grams)).cast(
        "double"
    ) / F.size(grams)
