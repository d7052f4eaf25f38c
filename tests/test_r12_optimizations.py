"""Round-12 optimization pins: the restructured operator internals
must keep their new physical shapes AND their exact semantics.

- DSIR's fused training/scoring (one tokenization trains both models,
  one scoring join per table) — plan-pinned explode budget;
- span-dedup masking never re-explodes tokens (the per-doc span-list
  join replaced the corpus-wide posexplode + anti-join);
- k-means' bounded prefix init equals the exact groupBy init,
  including the duplicate-low-id and fallback regimes;
- the IVF-PQ metadata cache serves the same objects per process and
  invalidates when an index is rebuilt in place.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from data_lakehouse_movilidad_publica_santiago_spark.plans.checks import (
    explain_str,
)

from conftest import SF_CORRECTNESS


def _docs(spark):
    return spark.read.parquet(f"{SF_CORRECTNESS}/documents.parquet")


def test_dsir_fused_training_explode_budget(spark):
    """Round-12 shape: ONE words explode + ONE bigram explode train
    BOTH models (conditional aggregation), one scoring explode — the
    pre-round-12 plan carried 7 Generates, the fused one at most 4
    (words, training grams, scoring grams, + the lazy-checkpoint
    unigram subtree before materialization).  Joins stay broadcast,
    ranking stays TakeOrdered."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.lm_filter import (
        dsir_select,
    )

    plan = explain_str(
        dsir_select(_docs(spark), F.col("lang") == "en", top_k=10)
    )
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan
    assert len(re.findall(r"\(\d+\) Generate", plan)) <= 4, plan


def test_span_mask_adds_no_token_explode(spark):
    """Round-12 shape: mask_duplicated_spans adds NO Generate beyond
    the span frame's own window-hash explode — token text never
    re-explodes (the old path posexploded every corpus token)."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.span_dedup import (
        duplicated_spans,
        mask_duplicated_spans,
    )

    docs = _docs(spark)
    spans = duplicated_spans(docs, window=8)
    n_spans = len(
        re.findall(r"\(\d+\) Generate", explain_str(spans))
    )
    masked = mask_duplicated_spans(docs, window=8, spans=spans)
    n_mask = len(
        re.findall(r"\(\d+\) Generate", explain_str(masked))
    )
    assert n_mask == n_spans, (n_mask, n_spans)


def test_kmeans_prefix_init_handles_duplicate_low_ids(spark):
    """The bounded prefix init must pick the k DISTINCT vectors with
    the smallest first-occurrence ids — duplicates among the low ids
    collapse exactly as the groupBy(vec).agg(min(id)) init did.  With
    iters=1 each init vector's own row must sit in its seed cluster at
    distance 0."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.kmeans import (
        kmeans_fit_assign,
    )

    dim = 4
    rows = []
    # ids 0 and 1 share a vector; 2, 3, 4 are distinct -> init ids
    # (first occurrences) are [0, 2, 3, 4]
    vecs = {
        0: [1.0, 0.0, 0.0, 0.0],
        1: [1.0, 0.0, 0.0, 0.0],
        2: [0.0, 1.0, 0.0, 0.0],
        3: [0.0, 0.0, 1.0, 0.0],
        4: [0.0, 0.0, 0.0, 1.0],
        5: [0.9, 0.1, 0.0, 0.0],
    }
    for i, v in vecs.items():
        rows.append((i, v))
    emb = spark.createDataFrame(
        rows, f"vec_id long, embedding array<double>"
    )
    out = kmeans_fit_assign(emb, k=4, iters=1)
    got = {r["vec_id"]: (r["cluster"], r["dist"]) for r in out.collect()}
    # seeds: cluster j anchored at the j-th distinct low-id vector
    assert got[0] == (0, 0.0)
    assert got[1] == (0, 0.0)  # duplicate of seed 0
    assert got[2] == (1, 0.0)
    assert got[3] == (2, 0.0)
    assert got[4] == (3, 0.0)
    assert got[5][0] == 0  # nearest seed is cluster 0


def test_kmeans_prefix_init_fallback_all_duplicates(spark):
    """When the 64-row prefix holds fewer than k distinct vectors the
    init must fall back to the exact groupBy path and still find the
    k distinct min-id vectors."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.kmeans import (
        kmeans_fit_assign,
    )

    rows = [(i, [1.0, 2.0]) for i in range(70)]  # 70 identical low ids
    rows.append((70, [5.0, 6.0]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = kmeans_fit_assign(emb, k=2, iters=1)
    got = {r["vec_id"]: (r["cluster"], r["dist"]) for r in out.collect()}
    assert got[0] == (0, 0.0)
    assert got[70] == (1, 0.0)


def test_ivfpq_meta_cache_serves_and_invalidates(spark, tmp_path):
    """load_ivfpq_meta returns the SAME objects per process for an
    unchanged index (no per-query collect jobs), and a rebuild in
    place (new codebooks.json mtime) invalidates the entry."""
    import time

    from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
        build_ivfpq_index,
        load_ivfpq_meta,
    )

    emb = spark.read.parquet(f"{SF_CORRECTNESS}/embeddings.parquet")
    idx = str(tmp_path / "idx")
    build_ivfpq_index(emb, idx, n_cells=4, m=8, ksub=16, iters=1, seed=7)
    meta1, cent1 = load_ivfpq_meta(spark, idx)
    meta2, cent2 = load_ivfpq_meta(spark, idx)
    assert meta1 is meta2 and cent1 is cent2
    time.sleep(0.01)  # ensure a distinct mtime_ns on coarse filesystems
    build_ivfpq_index(
        emb.filter(F.col("vec_id") % 2 == 0), idx,
        n_cells=4, m=8, ksub=16, iters=1, seed=7,
    )  # fmt: skip
    meta3, _ = load_ivfpq_meta(spark, idx)
    assert meta3 is not meta1
