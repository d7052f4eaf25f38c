"""Behavioral tests for the probabilistic / Python-stage LLM-data
operators (the ones the DuckDB oracle can't verify): MinHash-LSH
recall on constructed near-dups, SimHash locality, LSH-ANN recall,
multimodal feature plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lakehouse_movilidad_publica_santiago_spark.operators.dedup_text import (
    exact_dup_groups,
    jaccard_pairs_exact,
    minhash_lsh_pairs,
    simhash_pairs,
)
from data_lakehouse_movilidad_publica_santiago_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    synthesize_media_from_documents,
)
from data_lakehouse_movilidad_publica_santiago_spark.operators.similarity import (
    cosine_topk,
    lsh_topk,
)

# long doc (~130 distinct tokens) so a 1-word edit is a SMALL sketch
# perturbation — simhash locality only holds when each token carries
# ~1/sqrt(n) of a bit's margin
BASE = " ".join(f"tok{i:03d}" for i in range(130)) + " bright"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, BASE),
        (2, BASE),  # exact dup of 1
        (3, BASE.replace("bright", "cloudy")),  # near dup (1-word edit)
        (4, "completely different content about spark query engines and "
            "distributed columnar execution plans with shuffles"),
        (5, "yet another unrelated document mentioning minhash lsh "
            "banding signatures and jaccard similarity mathematics"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(corpus):
    groups = exact_dup_groups(corpus, "doc_id", "text").collect()
    assert len(groups) == 1
    assert groups[0]["n_docs"] == 2
    assert groups[0]["keeper_id"] == 1


def test_minhash_finds_near_dups(corpus):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jac"]
        for r in minhash_lsh_pairs(
            corpus, "doc_id", "text", threshold=0.5, k=3
        ).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0  # exact dup
    assert (1, 3) in pairs  # one-word edit caught
    assert all(4 not in p and 5 not in p for p in pairs)  # no false pairs


def test_minhash_agrees_with_exact_on_clear_pairs(corpus):
    """Precision check: every LSH pair IS a true pair (same verify
    threshold); recall check on this corpus: identical pair sets."""
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(corpus, "doc_id", "text", 0.5, k=3).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in jaccard_pairs_exact(corpus, "doc_id", "text", 0.5, k=3).collect()
    }
    assert lsh == exact


def test_simhash_locality(corpus):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_pairs(corpus, "doc_id", "text", max_hamming=10).collect()
    }
    assert pairs[(1, 2)] == 0  # identical text → identical sketch
    assert (1, 3) in pairs  # near dup → small hamming
    assert (1, 4) not in pairs and (1, 5) not in pairs


def test_lsh_ann_recall(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.standard_normal((200, 16)).astype("float32")
    query = vecs[17] + rng.standard_normal(16).astype("float32") * 0.05
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    exact = cosine_topk(df, [float(x) for x in query], k=5).collect()
    approx = lsh_topk(df, [float(x) for x in query], k=5, n_planes=6).collect()
    assert exact[0]["vec_id"] == 17  # planted neighbor found
    assert approx[0]["vec_id"] == 17  # survives LSH bucketing
    # scores inside the probed buckets are exact (same as brute force)
    exact_scores = {r["vec_id"]: r["cos_sim"] for r in exact}
    for r in approx:
        if r["vec_id"] in exact_scores:
            assert r["cos_sim"] == exact_scores[r["vec_id"]]
    # the true near-neighbor is what LSH must not lose; distant
    # 'neighbors' of uniform random data scatter across buckets by
    # design, so tail overlap is not asserted


def test_lsh_near_dup_precision_and_recall(spark):
    """LSH-bucketed near-dup: every emitted pair is exact-verified
    (precision 1.0 ⇒ subset of the exact all-pairs set); recall on
    deterministic hyperplanes is fixed — theory gives ≈0.84 for
    4 planes × 12 tables at the 0.35 threshold."""
    import numpy as np

    from data_lakehouse_movilidad_publica_santiago_spark.operators.similarity import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_lsh,
    )

    rng = np.random.RandomState(11)
    base = rng.standard_normal((60, 16)).astype("float32")
    # plant 20 true near-dups as noisy copies of the first 20 vectors
    dups = base[:20] + rng.standard_normal((20, 16)).astype("float32") * 0.15
    vecs = np.vstack([base, dups])
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    exact = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(df, threshold=0.9).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs_lsh(
            df, threshold=0.9, n_tables=12, n_planes=4
        ).collect()
    }
    assert lsh <= exact  # exact verify ⇒ precision 1.0
    assert len(exact) >= 15  # the planted pairs are found by brute force
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.7


def test_multimodal_pipeline(spark):
    docs = spark.createDataFrame(
        [(i, f"document body number {i} " * (i + 1), "en", "s", 10)
         for i in range(6)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    media = synthesize_media_from_documents(docs)
    assert set(r["media_type"] for r in media.collect()) == {
        "image", "audio", "video"
    }
    feats = extract_features(media).collect()
    assert len(feats) == 6
    for r in feats:
        assert len(r["feature"]) == 16
        assert r["byte_len"] > 0
    # deterministic: same input → same features
    again = extract_features(media).collect()
    assert sorted(map(str, feats)) == sorted(map(str, again))
    # frame sampling plan only for videos, spacing = every_ms
    plan = frame_sample_plan(media, every_ms=100).collect()
    assert plan and all(r["sample_ts_ms"] % 100 == 0 for r in plan)
