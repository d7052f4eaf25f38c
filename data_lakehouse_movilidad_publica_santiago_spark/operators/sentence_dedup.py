"""Global sentence-level exact deduplication (the C4 recipe).

C4 (Raffel et al., "Exploring the Limits of Transfer Learning with a
Unified Text-to-Text Transformer", JMLR 2020, §2.2) removes every
repeated occurrence of a sentence span across the WHOLE corpus,
keeping exactly one — the first. ``functions/c4.py`` covers C4's
per-document line filters; this module is the corpus-wide half:

- explode documents into (doc_id, pos, sentence) rows;
- a single corpus-wide decision: per distinct sentence hash, the
  occurrence with the smallest (doc_id, pos) survives;
- reassemble each document from its surviving sentences in original
  order (documents may shrink, possibly to the empty string — the
  caller's length filters decide their fate, never this operator).

Execution shape at 100 TB: sentence text rides exactly two shuffles —
one hash-partitioned exchange for the keep-first decision (rows are
(md5, doc_id, pos, sentence)) and one doc_id-partitioned combine for
reassembly. The decision itself needs only the hash triple; the text
rides along because reassembly needs it back anyway, so a
decision-only variant would pay the same exchange twice. Skewed
sentences (empty/boilerplate present millions of times) are bounded:
``row_number`` over a hash partition is a partial sort, and the
keep-first winner per hash is unique, so downstream rows per hash
collapse to ≤1 survivor plus drop counts.

Reference parity note: the reference repo has no corpus-global text
dedup — beyond-reference LLM-data-pipeline suite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def split_sentences(text_col: Column) -> Column:
    """Sentence array for real prose: split on terminal punctuation
    followed by whitespace, dropping empty fragments. Word-soup test
    corpora have no punctuation — gates pass an explicit grouping
    expression (e.g. ``fixed_width_sentences``) instead."""
    parts = F.split(text_col, r"(?<=[.!?])\s+")
    return F.filter(parts, lambda s: F.trim(s) != "")


def fixed_width_sentences(text_col: Column, width: Column) -> Column:
    """Pseudo-sentences for punctuation-free corpora: consecutive
    groups of ``width`` space-split words (the last group may be
    short). ``width`` may vary per row (e.g. derived from the id) —
    both this and the DuckDB twin slice the same word list, so the
    grouping is engine-independent."""
    toks = F.split(text_col, " ")
    n_groups = F.ceil(F.size(toks) / width).cast("int")
    return F.transform(
        F.sequence(F.lit(0), F.greatest(n_groups - 1, F.lit(0))),
        lambda g: F.concat_ws(
            " ", F.slice(toks, (g * width + 1).cast("int"), width.cast("int"))
        ),
    )


def sentence_dedup(
    docs: DataFrame,
    sentences: Column,
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-global keep-first sentence dedup.

    ``sentences`` is any array<string> expression over the input row
    (``split_sentences`` for prose, ``fixed_width_sentences`` for
    word-soup fixtures, or a caller-supplied segmenter).

    Output: one row per input document — ``doc_id``,
    ``n_sentences`` (before dedup), ``n_removed`` (repeated
    occurrences cut), ``text_clean`` (surviving sentences re-joined
    with a single space, in original order; '' when everything was a
    repeat). Keep-first is total and deterministic: the surviving
    occurrence of a sentence is the minimal (doc_id, pos)."""
    # two-step projection: materializing the array via withColumn keeps
    # the ``sentences`` expression (which may reference id_col) out of
    # any select that re-aliases id_col — Spark 4 otherwise resolves
    # the lambda's id_col as a lateral column alias and trips an
    # internal LateralColumnAliasReference error inside posexplode
    sent = (
        docs.withColumn("__sents", sentences)
        .select(
            F.col(id_col).alias("doc_id"),
            F.posexplode("__sents").alias("pos", "sentence"),
        )
        .filter(F.col("sentence") != "")
    )
    w = Window.partitionBy(F.md5("sentence")).orderBy("doc_id", "pos")
    tagged = sent.withColumn(
        "__keep", F.row_number().over(w) == 1
    )
    return tagged.groupBy("doc_id").agg(
        F.count("*").alias("n_sentences"),
        F.sum((~F.col("__keep")).cast("bigint")).alias("n_removed"),
        F.concat_ws(
            " ",
            F.transform(
                F.filter(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "pos",
                                F.when(F.col("__keep"), F.col("sentence"))
                                .otherwise(F.lit(None))
                                .alias("s"),
                            )
                        )
                    ),
                    lambda x: x["s"].isNotNull(),
                ),
                lambda x: x["s"],
            ),
        ).alias("text_clean"),
    )
