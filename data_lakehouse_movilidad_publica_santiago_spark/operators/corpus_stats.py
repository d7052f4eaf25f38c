"""Corpus-level token statistics: Zipf rank–frequency spectrum.

A natural-language corpus follows Zipf's law: the r-th most frequent
token has frequency ∝ r^(-s) with s ≈ 1. Synthetic, templated, or
heavily duplicated corpora deviate sharply, so the fitted slope (and
its goodness of fit) is a standard cheap corpus-health probe next to
the per-document quality screens (Gopher/C4/perplexity): fit

    ln f(r) = intercept + slope · ln r       over the top-R tokens

by ordinary least squares per group (e.g. language). Piantadosi,
"Zipf's word frequency law in natural language", Psychon Bull Rev
2014, reviews the law and its diagnostic use.

Execution shape at 100 TB: one (group, token) count shuffle with
map-side partial aggregation; the top-R cut over the VOCABULARY
relation is group-limited either way — grouped, the rank window's
``rank <= R`` filter is rewritten by InferWindowGroupLimit into
per-partition top-R heaps before the exchange; ungrouped, the rank
window would single-partition the whole vocabulary (the rule does
not fire on an empty partition spec), so the cut is an explicit
orderBy+limit (TakeOrderedAndProject) and only the ≤ R survivors
see a window. The OLS fit is Spark's built-in ``regr_*`` aggregates
over ≤ R rows per group. The document text never leaves its scan.

Reference parity note: the reference repo has no corpus statistics —
beyond-reference LLM-data-pipeline suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def zipf_spectrum(
    docs: DataFrame,
    group_col: str | None = None,
    top_r: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Per-group Zipf OLS fit over the top-``top_r`` tokens.

    Rank is total and deterministic: frequency descending, token
    ascending on ties (word-soup corpora tie constantly). Output one
    row per group: [group], ``n_tokens`` (all token occurrences),
    ``vocab`` (distinct tokens), ``top_r`` (tokens actually fitted —
    min(top_r, vocab)), ``zipf_slope`` and ``zipf_r2`` (OLS over
    (ln rank, ln freq), rounded to 4)."""
    gcols = [group_col] if group_col else []
    freq = (
        docs.select(
            *gcols, F.explode(F.split(F.col(text_col), " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy(*gcols, "token")
        .agg(F.count("*").alias("freq"))
    )
    totals = freq.groupBy(*gcols).agg(
        F.sum("freq").alias("n_tokens"), F.count("*").alias("vocab")
    )
    order = [F.desc("freq"), F.asc("token")]
    if gcols:
        # Grouped: rank window with a non-empty partition spec —
        # Spark's InferWindowGroupLimit rewrites the rank<=top_r
        # filter into a per-partition WindowGroupLimit (top-r heaps
        # before the shuffle), so only ~top_r rows per group move.
        w = Window.partitionBy(*gcols).orderBy(*order)
        top = freq.withColumn("rank", F.row_number().over(w)).filter(
            F.col("rank") <= top_r
        )
    else:
        # Global: InferWindowGroupLimit does NOT fire for an EMPTY
        # partition spec (verified by explain() at Spark 4.1.2 — the
        # grouped plan shows WindowGroupLimit, the global plan shows a
        # plain Exchange SinglePartition under the Window), so a rank
        # window here would sort the ENTIRE vocabulary in one
        # partition — billions of rows at 100 TB. Cut first with
        # orderBy+limit (TakeOrderedAndProject = per-partition heaps,
        # only top_r rows ever cross the wire), then rank the
        # <= top_r survivors; that residual window is bounded.
        w = Window.partitionBy().orderBy(*order)
        top = (
            freq.orderBy(*order)
            .limit(top_r)
            .withColumn("rank", F.row_number().over(w))
        )
    ranked = top.select(
        *gcols,
        F.log(F.col("rank").cast("double")).alias("__lr"),
        F.log(F.col("freq").cast("double")).alias("__lf"),
    )
    fit = ranked.groupBy(*gcols).agg(
        F.count("*").alias("top_r"),
        F.round(F.regr_slope("__lf", "__lr"), 4).alias("zipf_slope"),
        F.round(F.regr_r2("__lf", "__lr"), 4).alias("zipf_r2"),
    )
    return totals.join(fit, gcols) if gcols else totals.crossJoin(fit)


def novelty_scores(
    docs: DataFrame,
    reference: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-corpus n-gram novelty: for each candidate document, the
    fraction of its DISTINCT word n-grams never seen in ``reference``
    -- the standard "how much new content does this snapshot add"
    selection signal when growing a corpus from successive crawls
    (high novelty -> keep; near-zero novelty -> the content is already
    owned by the at-rest corpus, cheaper than a full cross-corpus
    near-dup join).

    Execution shape at 100 TB: one distinct-shingle explode per side,
    every shuffled row (doc_id, 32-hex md5) or (32-hex md5); the
    reference side is DISTINCT-ed to its vocabulary before the probe
    join (one hash-equi join, no text movement). Exactly the
    decontamination shuffle shape with the verdict inverted: there a
    hit disqualifies, here a MISS is the signal.

    Output: one row per candidate doc -- ``doc_id``, ``n_grams``
    (distinct n-grams), ``n_novel`` (unseen in reference), ``novelty``
    (n_novel / n_grams, rounded 6). Docs shorter than ``n`` words
    yield their single whole-doc shingle (never a 0 denominator)."""
    from ..functions.text import word_shingles

    cand = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("__g"),
    ).select("doc_id", F.md5("__g").alias("__h"))
    seen = (
        reference.select(
            F.explode(word_shingles(F.col(text_col), n)).alias("__g")
        )
        .select(F.md5("__g").alias("__h"))
        .distinct()
        .withColumn("__seen", F.lit(1))
    )
    return (
        cand.join(seen, "__h", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(
                F.when(F.col("__seen").isNull(), 1).otherwise(0)
            ).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.round(
                F.col("n_novel").cast("double") / F.col("n_grams"), 6
            ).alias("novelty"),
        )
    )
