"""Scalar-quantized (int8) ANN semantics: quantization bounds, the
constant-dimension guard, two-phase recall vs exact brute force on the
gate corpus, and partitioning invariance."""

from __future__ import annotations

import pytest

from data_lakehouse_movilidad_publica_santiago_spark.operators.similarity import (
    cosine_topk,
    sq8_encode,
    sq8_params,
    sq8_topk,
)

SF001 = "/root/testdata/sf0.01"


def _emb(spark, rows, dim):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        ["vec_id", "embedding"],
    )


def test_sq8_codes_in_range_and_reconstruction_error(spark):
    rows = [
        (0, [0.0, -1.0, 5.0]),
        (1, [1.0, 1.0, 5.0]),
        (2, [0.5, 0.25, 5.0]),
    ]
    emb = _emb(spark, rows, 3)
    params = sq8_params(emb, dim=3)
    codes = {
        r["vec_id"]: r["codes"] for r in sq8_encode(emb, params).collect()
    }
    for vid, vec in rows:
        for i, x in enumerate(vec):
            c = codes[vid][i]
            assert 0 <= c <= 255
            lo, scale = params[i]
            # dequantization error is at most half a step
            assert abs((lo + c * scale) - x) <= scale / 2 + 1e-12


def test_sq8_constant_dimension_guard(spark):
    """dim 2 is constant (5.0): scale falls back to 1.0, every code is
    0, dequantization returns the constant exactly."""
    emb = _emb(spark, [(0, [0.0, 1.0, 5.0]), (1, [1.0, 0.0, 5.0])], 3)
    params = sq8_params(emb, dim=3)
    assert params[2] == (5.0, 1.0)
    for r in sq8_encode(emb, params).collect():
        assert r["codes"][2] == 0


def test_sq8_extremes_hit_0_and_255(spark):
    emb = _emb(spark, [(0, [-2.0]), (1, [6.0]), (2, [2.0])], 1)
    params = sq8_params(emb, dim=1)
    codes = {
        r["vec_id"]: r["codes"][0]
        for r in sq8_encode(emb, params).collect()
    }
    assert codes[0] == 0 and codes[1] == 255
    assert 0 < codes[2] < 255


def test_sq8_recall_vs_exact_on_gate_corpus(spark):
    """The gate claim: SQ8 two-phase top-10 == exact brute-force
    top-10 on the sf0.01 embeddings (recall 1.0 at overfetch 4)."""
    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    q = [
        float(x)
        for x in emb.filter("vec_id = 0").collect()[0]["embedding"]
    ]
    exact = [(r["vec_id"], r["cos_sim"]) for r in
             cosine_topk(emb, q, k=10).collect()]  # fmt: skip
    sq8 = [(r["vec_id"], r["cos_sim"]) for r in
           sq8_topk(emb, q, k=10, overfetch=4).collect()]  # fmt: skip
    assert sq8 == exact


def test_sq8_partitioning_invariant(spark):
    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    q = [
        float(x)
        for x in emb.filter("vec_id = 7").collect()[0]["embedding"]
    ]
    a = [tuple(r) for r in sq8_topk(emb.coalesce(1), q, k=5).collect()]
    b = [tuple(r) for r in sq8_topk(emb.repartition(16), q, k=5).collect()]
    assert a == b


def test_sq8_rank_and_self_hit(spark):
    """The query vector's own row is the top hit with cos 1.0."""
    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    q = [
        float(x)
        for x in emb.filter("vec_id = 3").collect()[0]["embedding"]
    ]
    rows = sq8_topk(emb, q, k=3).collect()
    assert rows[0]["vec_id"] == 3
    assert rows[0]["cos_sim"] == pytest.approx(1.0)
    assert [r["rank"] for r in rows] == [1, 2, 3]


def test_sq8_indexed_equals_inline(spark):
    """The at-rest codes layout reproduces the inline path
    bit-for-bit: same code values, same affine fold, same result."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.similarity import (
        sq8_topk_indexed,
    )

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    q = [
        float(x)
        for x in emb.filter("vec_id = 5").collect()[0]["embedding"]
    ]
    params = sq8_params(emb, dim=64)
    codes = sq8_encode(emb, params)
    inline = [tuple(r) for r in sq8_topk(emb, q, k=7, params=params).collect()]
    indexed = [
        tuple(r)
        for r in sq8_topk_indexed(codes, emb, q, params, k=7).collect()
    ]
    assert indexed == inline
