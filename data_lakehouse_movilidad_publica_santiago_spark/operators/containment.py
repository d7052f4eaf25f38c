"""Asymmetric containment near-duplicate detection.

Jaccard similarity misses the *subset* duplicate: a short document
wholly quoted inside a long one (boilerplate wrappers, article +
comment pages, quote farms) can have Jaccard ≪ threshold while its
containment is ≈ 1. Broder's resemblance/containment pair ("On the
resemblance and containment of documents", SEQUENCES 1997) defines

    C(A → B) = |S(A) ∩ S(B)| / |S(A)|

over shingle sets S(·): the fraction of A's shingles that also occur
in B. A training-data pipeline wants these pairs *in addition to* the
symmetric near-dups: the contained side is the redundant copy.

Execution shape at 100 TB:
- one distinct-shingle explode per document; every shuffled row is
  (doc_id, 32-hex md5) — the text never leaves its scan;
- candidate pairs come from a self-equi-join on the shingle hash, so
  only pairs that actually share a shingle are ever materialized
  (never the O(N²) cross space);
- ``max_df`` prunes boilerplate shingles (ones occurring in more than
  ``max_df`` documents) BEFORE the self-join — the standard guard
  against hot-key candidate explosion. A pair sharing *only* pruned
  shingles is missed; for containment ≥ t with t close to 1 such a
  pair must be assembled almost entirely from corpus-wide boilerplate,
  which is exactly the content the pipeline de-prioritizes anyway.
  Sizes (the containment denominator) are computed BEFORE pruning, so
  reported scores are exact for every surviving pair whose shared
  shingles are un-pruned;
- the per-pair combine carries (doc_a, doc_b, shared-count) rows.

Reference parity note: the reference repo has no containment scan —
part of the beyond-reference LLM-data-pipeline suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_shingles


def _shingle_hashes_distinct(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """(doc_id, h) — one row per DISTINCT word-k-gram shingle per
    document, md5-hashed so shuffle rows stay (id, 32-hex)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(F.col(text_col), k)).alias("__g"),
    ).select("doc_id", F.md5("__g").alias("h"))


def containment_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    k: int = 3,
    max_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Ordered document pairs whose max directional containment meets
    ``threshold``.

    Output: ``doc_a`` < ``doc_b``, ``n_shared`` (shared distinct
    shingles counted over un-pruned shingles), ``n_a``/``n_b``
    (distinct shingle counts, pre-pruning), ``c_ab`` = n_shared/n_a
    (how much of A is inside B), ``c_ba`` = n_shared/n_b, both rounded
    to 6. A pair appears when ``greatest(c_ab, c_ba) >= threshold`` —
    the smaller document is usually the contained one.

    ``max_df``: drop shingles occurring in more than ``max_df`` docs
    before the pair join (hot-key guard; see module docstring for the
    recall trade)."""
    sh = _shingle_hashes_distinct(df, id_col, text_col, k)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    if max_df is not None:
        rare = (
            sh.groupBy("h")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") <= max_df)
            .select("h")
        )
        sh = sh.join(rare, "h")
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").alias("n_shared"))
    )
    na = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a")
    )
    nb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b")
    )
    c_ab = F.col("n_shared").cast("double") / F.col("n_a")
    c_ba = F.col("n_shared").cast("double") / F.col("n_b")
    return (
        shared.join(na, "doc_a")
        .join(nb, "doc_b")
        .filter(F.greatest(c_ab, c_ba) >= F.lit(float(threshold)))
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            "n_a",
            "n_b",
            F.round(c_ab, 6).alias("c_ab"),
            F.round(c_ba, 6).alias("c_ba"),
        )
    )
