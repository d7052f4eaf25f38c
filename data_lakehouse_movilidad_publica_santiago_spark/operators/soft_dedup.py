"""Soft deduplication: frequency-based document reweighting.

Hard dedup (``dedup_text``) keeps one copy per near-dup cluster and
drops the rest; *soft* dedup (He et al., "SoftDedup: an Efficient Data
Reweighting Method for Speeding Up Language Model Pre-training",
ACL 2024) instead DOWN-WEIGHTS documents whose content is common in
the corpus, preserving coverage while shrinking the effective weight
of boilerplate. The signal is dataset-level n-gram *commonness*:

    dup_score(d) = mean over d's word n-gram occurrences of ln cf(g)
    commonness(d) = exp(dup_score)   (geometric-mean corpus frequency)
    weight(d)     = 1 / (1 + dup_score), floored at ``weight_floor``

``cf(g)`` is the corpus-wide occurrence count of gram ``g``, so a
document whose every n-gram is unique scores 0 → weight 1.0, and a
document assembled from corpus-frequent boilerplate scores high →
weight → ``weight_floor``. The optional sampling verdict realizes the
weight as a deterministic seeded keep/drop (same md5 uniform-hash
recipe as ``data_mix.sample_mix`` — partitioning/retry-invariant).

Execution shape at 100 TB:
- gram counting is ONE (gram, count) shuffle with map-side partial
  aggregation; gram rows are short strings + a long;
- the scoring join re-joins the exploded gram occurrences to the
  count table on ``gram``. Both subtrees are identical, so Catalyst
  REUSES the count shuffle for the join's gram side (one 240M-row
  exchange at the 5M-doc probe, not two — visible as ReusedExchange
  in the plan);
- measured negative result, for the record (SCALE.md round 7): a
  cf >= 2 prune of the count table (sound — unique grams add
  ln(1) = 0) with a separate map-side denominator pass ran 28 %
  SLOWER at 5M docs (381 s vs 297 s). The pruned model side is only
  broadcastable on nearly-dup-free corpora (here 15 % planted dup
  content → 12M dup grams → sort-merge either way), and the extra
  denominator pass re-evaluates the gram array over every document.
  The unpruned avg-join with exchange reuse wins; kept;
- the per-document combine carries (doc_id, ln cf) pairs only; the
  document text never leaves its scan.

Reference parity note: the reference repo has no corpus reweighting —
this is part of the beyond-reference LLM-data-pipeline suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_ngrams_raw
from .data_mix import _uniform_hash


def soft_dedup(
    docs: DataFrame,
    n: int = 3,
    seed: str = "softdedup-v1",
    weight_floor: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
    passthrough: list[str] | None = None,
) -> DataFrame:
    """Per-document duplication score, sampling weight, and seeded
    keep/drop verdict under corpus n-gram commonness.

    Output: one row per input document —
    ``doc_id``, passthrough columns, ``n_grams`` (full word n-gram
    occurrences; 0 for docs shorter than ``n`` words), ``dup_score``
    (mean ln corpus-frequency, rounded to 4; NULL when n_grams=0),
    ``weight`` (1/(1+dup_score) floored at ``weight_floor``; 1.0 when
    no gram evidence), ``kept`` (uniform_hash(seed, doc_id) < weight —
    deterministic, so a retry or repartition cannot flip verdicts).

    Working columns are ``__``-prefixed; passthrough names are
    validated against the fixed output columns."""
    extra = list(passthrough or [])
    reserved = {"doc_id", "n_grams", "dup_score", "weight", "kept"}
    bad = [c for c in extra if c in reserved or c.startswith("__")]
    if bad:
        raise ValueError(
            f"passthrough columns {bad} collide with soft_dedup output "
            f"columns {sorted(reserved)} or the __-internal prefix"
        )
    # full n-grams only: word_ngrams_raw pads docs shorter than n with
    # one short gram — a real n-gram splits into exactly n words
    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        *extra,
        F.explode(word_ngrams_raw(F.col(text_col), n)).alias("__gram"),
    ).filter(F.size(F.split(F.col("__gram"), " ")) == n)

    freq = grams.groupBy("__gram").agg(F.count("*").alias("__cf"))

    scored = (
        grams.join(freq, "__gram")
        .groupBy("doc_id", *extra)
        .agg(
            F.count("*").alias("n_grams"),
            F.avg(F.log("__cf")).alias("__raw_score"),
        )
    )
    # resurrect gram-free docs (shorter than n words): no evidence of
    # duplication → weight 1.0
    base = docs.select(F.col(id_col).alias("doc_id"), *extra)
    out = base.join(
        scored.select("doc_id", "n_grams", "__raw_score"), "doc_id", "left"
    )
    weight = F.when(
        F.col("__raw_score").isNull(), F.lit(1.0)
    ).otherwise(
        F.greatest(
            F.lit(1.0) / (F.lit(1.0) + F.col("__raw_score")),
            F.lit(float(weight_floor)),
        )
    )
    return out.select(
        "doc_id",
        *extra,
        F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
        F.round(F.col("__raw_score"), 4).alias("dup_score"),
        F.round(weight, 4).alias("weight"),
        (_uniform_hash(F.col("doc_id"), seed) < weight).alias("kept"),
    )
