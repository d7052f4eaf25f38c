"""Recall pins for the probabilistic operators' gate parameters.

The LSH gate queries declare their EXACT twins' SQL as the DuckDB
oracle, which is only sound while the chosen banding has recall 1.0
on the driver corpus (precision is 1.0 by construction — candidates
are exact-verified). These tests pin that equality at the gate scale
so a parameter or corpus drift fails HERE, not in the driver's
correctness report. SimHash's md5 sketch now has a full DuckDB twin
(gate query); both sketch variants additionally carry their pigeonhole
completeness guarantees here."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lakehouse_movilidad_publica_santiago_spark.analytics.inventory import t
from data_lakehouse_movilidad_publica_santiago_spark.operators.dedup_text import (
    jaccard_pairs_exact,
    minhash_lsh_pairs,
    simhash64,
    simhash_pairs,
)
from data_lakehouse_movilidad_publica_santiago_spark.operators.similarity import (
    cosine_topk,
    embedding_near_dup_pairs,
    embedding_near_dup_pairs_lsh,
    lsh_topk,
)
from tests.conftest import SF_CORRECTNESS


@pytest.fixture(scope="module")
def docs(spark):
    return t(spark, SF_CORRECTNESS, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return t(spark, SF_CORRECTNESS, "embeddings").cache()


def test_minhash_gate_params_recall_one(docs):
    """Gate params (k=3, t=0.5, 64 perms, 16 bands): LSH pair set ==
    exact pair set on the driver corpus."""
    lsh = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", threshold=0.5, k=3, num_perm=64, bands=16
        ).collect()
    }
    exact = {
        (r.doc_a, r.doc_b)
        for r in jaccard_pairs_exact(
            docs, "doc_id", "text", threshold=0.5, k=3
        ).collect()
    }
    assert lsh == exact and exact  # equal AND non-trivial


def test_embedding_lsh_near_dup_gate_params_recall_one(emb):
    """Gate params (2 planes × 24 tables at sim 0.35): LSH pair set
    == exact pair set."""
    lsh = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs_lsh(
            emb, threshold=0.35, n_tables=24, n_planes=2
        ).collect()
    }
    exact = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(emb, threshold=0.35).collect()
    }
    assert lsh == exact and exact


def test_lsh_knn_gate_params_equal_exact(emb):
    """Gate params (2 planes × 8 tables, Hamming-1 probe): approximate
    top-10 == exact top-10 including scores and ranks."""
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0)
        .select("embedding")
        .collect()[0]["embedding"]
    ]
    exact = [tuple(r) for r in cosine_topk(emb, qv, k=10).collect()]
    approx = [
        tuple(r)
        for r in lsh_topk(emb, qv, k=10, n_planes=2, n_tables=8).collect()
    ]
    assert approx == exact


def test_simhash_banding_complete_to_hamming_15(docs):
    """Pigeonhole guarantee: 16 four-bit chunks of a 64-bit sketch —
    any pair within Hamming 15 leaves ≥1 chunk untouched, so chunk
    banding must produce EVERY such pair (recall 1.0 up to 15)."""
    sk = docs.select(
        F.col("doc_id"), simhash64("text").alias("sim")
    ).cache()
    a = sk.alias("a")
    b = sk.alias("b")
    exact = {
        (r.doc_a, r.doc_b)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.sim").bitwiseXOR(F.col("b.sim"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= 15)
        .collect()
    }
    banded = {
        (r.doc_a, r.doc_b)
        for r in simhash_pairs(docs, "doc_id", "text", max_hamming=15).collect()
    }
    assert banded == exact and exact


def test_ivf_knn_gate_params_equal_exact(emb):
    """Gate params (8 cells, probe 4): IVF top-10 == exact top-10 on
    the driver corpus, so the exact-kNN SQL is a valid oracle."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.similarity import (
        ivf_topk,
    )

    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0)
        .select("embedding")
        .first()[0]
    ]
    exact = [(r.vec_id, r.cos_sim) for r in cosine_topk(emb, qv, 10).collect()]
    approx = [
        (r.vec_id, r.cos_sim)
        for r in ivf_topk(emb, qv, 10, n_cells=8, n_probe=4).collect()
    ]
    assert approx == exact


def test_simhash_md5_banding_complete_to_hamming_14(docs):
    """Portable 60-bit sketch: 15 four-bit chunks ⇒ banding finds
    EVERY pair within Hamming 14 (the oracle-soundness guarantee for
    the md5 gate query's Hamming ≤ 8)."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.dedup_text import (
        simhash60_md5,
    )

    sk = simhash60_md5(docs, "doc_id", "text").cache()
    a, b = sk.alias("a"), sk.alias("b")
    exact = {
        (r.doc_a, r.doc_b)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.sim").bitwiseXOR(F.col("b.sim"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= 14)
        .collect()
    }
    banded = {
        (r.doc_a, r.doc_b)
        for r in simhash_pairs(
            docs, "doc_id", "text", max_hamming=14, hash_fn="md5"
        ).collect()
    }
    assert banded == exact and exact


def test_ivf_tiny_corpus_degrades_gracefully(spark, emb):
    """Fewer vectors than n_cells: cells clamp to the corpus size and
    results stay exact; empty corpus yields an empty result."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.similarity import (
        ivf_topk,
    )

    tiny = emb.limit(5)
    qv = [float(x) for x in tiny.select("embedding").first()[0]]
    got = ivf_topk(tiny, qv, k=10, n_cells=16, n_probe=16).collect()
    exact = cosine_topk(tiny, qv, 10).collect()
    assert got == exact and len(got) == 5
    empty = emb.filter("vec_id < 0")
    assert ivf_topk(empty, qv, k=3, n_cells=8, n_probe=2).count() == 0
