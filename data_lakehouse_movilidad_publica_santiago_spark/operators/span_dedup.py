"""Exact substring-span deduplication (ExactSubstr).

The corpus-level duplicated-passage detector of Lee et al.,
"Deduplicating Training Data Makes Language Models Better" (ACL
2022): any window of ``window`` consecutive tokens that occurs more
than once ANYWHERE in the corpus marks its positions as duplicated;
overlapping/adjacent marks merge into maximal spans, which downstream
masking removes. Unlike document-level dedup (fingerprints, MinHash),
this catches boilerplate and quoted passages embedded inside
otherwise-unique documents.

The reference paper builds a suffix array; the Spark-native
re-expression is relational and shuffles only narrow rows:

1. window hashes: ``posexplode`` of the token-window starts → one
   (doc_id, start, md5-of-window) row per position — map-only. The
   hash frame feeds BOTH the dup-aggregate and the semi-join probe,
   so it is persisted (the md5 sweep is the dominant CPU stage —
   recomputing it would double it); pass ``pins`` to release the
   cache after your final action, mirroring ``minhash_lsh_pairs``.
2. duplicated hashes: groupBy(hash) HAVING count > 1 — ONE shuffle
   whose rows are (32-hex, count); a semi-join marks the positions.
3. span merge: classic gaps-and-islands per document (one window
   over (doc_id, start) pairs — the heavy text never shuffles).
4. optional masking: tokens covered by a duplicated span are dropped
   via a positions anti-join and an ordered re-assembly — linear in
   tokens (never a per-token array_contains scan).

At 100 TB: stage 2's shuffle is the only corpus-wide exchange and it
carries hashes, not text; stage 3 partitions by doc_id (bounded per
document); masking (stage 4) is linear in tokens and opt-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _window_hashes(docs: DataFrame, window: int, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, s, hsh): md5 of each ``window``-token window, 1-based
    start position. Documents shorter than ``window`` yield no rows."""
    toks = F.split(F.col(text_col), " ")
    starts = F.sequence(F.lit(1), F.size(toks) - F.lit(window - 1))
    return (
        docs.filter(F.size(toks) >= window)
        .select(
            F.col(id_col).alias("doc_id"),
            toks.alias("__toks"),
            F.explode(starts).alias("s"),
        )
        .select(
            "doc_id",
            "s",
            # BINARY(16) key (round-12, guide §2.3): the window hash is
            # only grouped and semi-joined, never surfaced — unhex is
            # bijective (identical dup decisions) and halves the key
            # bytes of the operator's corpus-wide exchange
            F.unhex(
                F.md5(
                    F.concat_ws(
                        " ", F.slice(F.col("__toks"), F.col("s"), window)
                    )
                )
            ).alias("hsh"),
        )
    )


def duplicated_spans(
    docs: DataFrame,
    window: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    pins: list | None = None,
) -> DataFrame:
    """Maximal duplicated token spans per document: (doc_id,
    span_start, span_end, n_windows), positions 1-based inclusive.
    A span is the union of overlapping/adjacent duplicated windows.

    The window-hash frame is persisted (it feeds the dup aggregate
    AND the probe side); pass ``pins`` (a list) to receive the handle
    and ``unpersist()`` after your final action."""
    h = _window_hashes(docs, window, id_col, text_col).persist()
    if pins is not None:
        pins.append(h)
    dup = h.groupBy("hsh").count().filter(F.col("count") > 1).select("hsh")
    spans = h.join(dup, "hsh", "semi").select(
        "doc_id", "s", (F.col("s") + F.lit(window - 1)).alias("e")
    )
    w_order = Window.partitionBy("doc_id").orderBy("s")
    prev_max = F.max("e").over(w_order.rowsBetween(Window.unboundedPreceding, -1))
    grouped = (
        spans.withColumn(
            "__brk",
            F.when(prev_max.isNull() | (F.col("s") > prev_max + 1), 1).otherwise(0),
        )
        .withColumn(
            "__g",
            F.sum("__brk").over(w_order.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return grouped.groupBy("doc_id", "__g").agg(
        F.min("s").alias("span_start"),
        F.max("e").alias("span_end"),
        F.count("*").alias("n_windows"),
    ).drop("__g")


def span_dedup_stats(
    docs: DataFrame,
    window: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    spans: DataFrame | None = None,
    pins: list | None = None,
) -> DataFrame:
    """Per-document duplication accounting over ALL documents:
    (doc_id, n_tokens, dup_windows, dup_tokens, dup_frac). Documents
    untouched by duplication report zeros. Pass a precomputed
    ``spans`` frame (from ``duplicated_spans``) to share one
    window-hash pass with other consumers."""
    if spans is None:
        spans = duplicated_spans(docs, window, id_col, text_col, pins=pins)
    per_doc = spans.groupBy("doc_id").agg(
        F.sum("n_windows").alias("dup_windows"),
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("dup_tokens"),
    )
    toks = F.split(F.col(text_col), " ")
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.size(toks).cast("bigint").alias("n_tokens")
    )
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("dup_windows", F.lit(0)).alias("dup_windows"),
        F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
        F.round(
            F.coalesce("dup_tokens", F.lit(0)) / F.col("n_tokens").cast("double"), 6
        ).alias("dup_frac"),
    )


def mask_duplicated_spans(
    docs: DataFrame,
    window: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    spans: DataFrame | None = None,
    pins: list | None = None,
) -> DataFrame:
    """Rebuild each document with every duplicated span removed:
    (doc_id, kept_text). A fully-duplicated document keeps ''.

    Round-12 shape (guide §2.3 "shuffle keys, not payloads"): the
    spans fold to ONE bounded per-doc interval list (a tiny shuffle of
    (doc_id, start, end) triples), which joins back to the documents;
    the token drop + reassembly is then a pure positional array
    expression over the original row.  The previous formulation
    posexploded EVERY corpus token into (doc_id, p, tok) rows, anti-
    joined the exploded covered positions, and re-sorted all surviving
    tokens through a collect_list — two corpus-token-sized exchanges
    carrying the text itself, both gone now (plan: 2 fewer Exchanges;
    the only remaining join shuffles span lists, not tokens).
    Per-token cost is O(n_spans) interval tests, and n_spans per doc
    is bounded by the merged-maximal-span invariant."""
    if spans is None:
        spans = duplicated_spans(docs, window, id_col, text_col, pins=pins)
    per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    toks = F.split(F.col(text_col), " ")
    joined = (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("__toks"))
        .join(per_doc, "doc_id", "left")
    )
    pos_covered = lambda i: F.exists(  # noqa: E731 — 1-based position i
        F.col("__spans"),
        lambda s: (i >= s["span_start"]) & (i <= s["span_end"]),
    )
    kept = F.when(
        F.col("__spans").isNull(), F.col("__toks")
    ).otherwise(
        F.filter(F.col("__toks"), lambda t, i: ~pos_covered(i + 1))
    )
    return joined.select(
        "doc_id", F.concat_ws(" ", kept).alias("kept_text")
    )
