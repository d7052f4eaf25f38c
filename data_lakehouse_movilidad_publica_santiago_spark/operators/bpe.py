"""Distributed byte-pair-encoding vocabulary training (Sennrich,
Haddow & Birch, "Neural Machine Translation of Rare Words with
Subword Units", 2016 — the published BPE merge algorithm), on the
DataFrame API.

The classic algorithm is corpus → word-frequency table → repeat
``num_merges`` times: count adjacent symbol pairs weighted by word
frequency, merge the most frequent pair (greedy left-to-right inside
each word). The Spark shape:

- the working set after the first aggregation is the DISTINCT-word
  table (vocab-sized — millions of rows at 100 TB corpus scale, never
  corpus-sized), so every merge iteration touches vocab rows only;
- pair counting is one explode + codegen'd SUM per iteration — the
  only shuffle, carrying (left, right, freq) rows;
- the winning pair comes to the driver as ONE row per iteration
  (``freq DESC, left, right`` — deterministic tie-break);
- the greedy merge is applied map-side as a fold (``F.aggregate``)
  building a delimiter-separated symbol string — exact left-to-right
  BPE semantics ("a a a" with merge (a,a) → "aa a", back-to-back
  pairs handled correctly, which global regexp_replace is NOT);
- ``localCheckpoint`` every iteration truncates the fold-lambda
  lineage so the plan stays O(1) deep regardless of ``num_merges``.

Encoding then never re-runs per-character work over the corpus: the
trained word table already holds every distinct word's final symbol
sequence, so ``bpe_encode_counts`` is a single (broadcastable)
vocabulary join + SUM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# unit-separator: cannot occur in whitespace-split lowercase words
_D = "\x1f"

END_OF_WORD = "</w>"


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) frequency table over lowercased whitespace words —
    the one corpus-sized aggregation; everything after is vocab-sized."""
    return (
        df.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _init_syms(wc: DataFrame) -> DataFrame:
    """Seed symbols: the word's characters plus the end-of-word marker
    (Sennrich §3.2)."""
    return wc.withColumn(
        "syms",
        F.expr(
            "array_append(transform(sequence(1, length(word)),"
            " i -> substring(word, i, 1)), '</w>')"
        ),
    )


def _pair_counts(wt: DataFrame) -> DataFrame:
    """(l, r, freq): adjacent symbol pairs weighted by word count.
    Counts every adjacent occurrence (overlaps included), exactly the
    published counting rule."""
    pair = F.expr(
        "explode(transform(sequence(1, size(syms) - 1),"
        " i -> struct(element_at(syms, i) AS l,"
        " element_at(syms, i + 1) AS r)))"
    )
    # guard fully-merged single-symbol words: Spark's sequence(1, 0)
    # counts DOWN ([1, 0]) instead of returning empty
    return (
        wt.filter(F.size("syms") >= 2)
        .select(F.col("cnt"), pair.alias("p"))
        .select("cnt", "p.l", "p.r")
        .groupBy("l", "r")
        .agg(F.sum("cnt").alias("freq"))
    )


def _apply_merge(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of (left, right) → left+right inside
    one symbol array, as a fold over a ``_D``-delimited string. The
    ``endswith(acc, _D + left)`` guard matches the last SYMBOL, not a
    string suffix — the delimiter makes it exact — so "aa" never
    false-matches a pending "a"."""
    tail = _D + left
    lit_r, lit_tail = F.lit(right), F.lit(tail)
    merged = F.lit(_D + left + right)

    def step(acc: Column, x: Column) -> Column:
        return F.when(
            (x == lit_r) & acc.endswith(lit_tail),
            F.concat(
                F.substring(acc, F.lit(1), F.length(acc) - F.lit(len(tail))),
                merged,
            ),
        ).otherwise(F.concat(acc, F.lit(_D), x))

    folded = F.aggregate(syms, F.lit(""), step)
    return F.filter(F.split(folded, _D), lambda s: s != "")


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 8,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn ``num_merges`` BPE merges; returns ``(merges, words)``
    where merges = [(rank, left, right, freq), ...] (driver-side, one
    collected row per iteration) and ``words`` is the trained
    vocab-sized table (word, cnt, syms) with ALL merges applied —
    the encoding dictionary for ``bpe_encode_counts``."""
    wt = _init_syms(word_counts(df, text_col)).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, num_merges + 1):
        top = (
            _pair_counts(wt)
            .orderBy(F.col("freq").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:  # degenerate corpus: no adjacent pairs left
            break
        row = top[0]
        merges.append((rank, row["l"], row["r"], int(row["freq"])))
        # localCheckpoint: truncate the fold lineage so plan depth and
        # analysis cost stay O(1) in num_merges; the table is
        # vocab-sized, so the checkpoint itself is cheap
        wt = wt.withColumn(
            "syms", _apply_merge(F.col("syms"), row["l"], row["r"])
        ).localCheckpoint(eager=True)
    return merges, wt


def merge_table(
    spark: SparkSession, merges: list[tuple[int, str, str, int]]
) -> DataFrame:
    """The learned merge list as a DataFrame (rank, left_sym,
    right_sym, freq) — the durable training artifact."""
    return spark.createDataFrame(
        merges, "rank int, left_sym string, right_sym string, freq bigint"
    )


def bpe_encode_counts(
    df: DataFrame,
    words: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document BPE token counts: (id, n_words, n_bpe_tokens),
    via a vocabulary join against the TRAINED word table — no
    per-character work over the corpus. Unseen words fall back to
    character count + 1 (their untrained symbol count). The vocab
    side is broadcast when small; at 100 TB the optimizer falls back
    to a hash join on the word key."""
    doc_words = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word"),
    ).filter(F.col("word") != "")
    vocab = words.select("word", F.size("syms").alias("n_sym"))
    return (
        doc_words.join(F.broadcast(vocab), "word", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_words"),
            F.sum(
                F.coalesce(F.col("n_sym"), F.length("word") + F.lit(1))
            ).alias("n_bpe_tokens"),
        )
    )
