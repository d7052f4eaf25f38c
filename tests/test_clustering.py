"""Pairs → clusters → survivors (operators/clustering.py).

Covers: transitive closure beyond direct pairs (chain graphs that
need >1 label-exchange round), determinism under pair-order/direction
permutation, the keep-one policy's tie-breaks, singleton handling,
and the empty-graph edge case.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_movilidad_publica_santiago_spark.operators.clustering import (
    canonical_survivors,
    connected_components,
)


def _cc_map(df):
    return {r["doc_id"]: r["cluster_id"] for r in df.collect()}


def test_chain_transitive_closure(spark):
    # path graph 1-2-3-4-5 plus an isolated pair 10-11: one component
    # each; the path's diameter (4) forces multiple propagation rounds
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], ["doc_a", "doc_b"]
    )
    got = _cc_map(connected_components(pairs))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_long_path_needs_pointer_jumping(spark):
    # 64-node path: min-label alone needs 63 rounds; with pointer
    # jumping it must finish inside the default max_iter=30
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], ["doc_a", "doc_b"]
    )
    got = _cc_map(connected_components(pairs))
    assert set(got.values()) == {0}
    assert len(got) == 64


def test_permutation_and_direction_invariance(spark):
    base = [(5, 3), (7, 5), (1, 9), (2, 4)]
    a = spark.createDataFrame(base, ["doc_a", "doc_b"])
    # reversed order AND swapped endpoints — same undirected graph
    b = spark.createDataFrame(
        [(y, x) for (x, y) in reversed(base)], ["doc_a", "doc_b"]
    )
    assert _cc_map(connected_components(a)) == _cc_map(connected_components(b))
    assert _cc_map(connected_components(a)) == {
        3: 3, 5: 3, 7: 3, 1: 1, 9: 1, 2: 2, 4: 2,
    }


def test_empty_pairs(spark):
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(pairs).count() == 0


def test_survivors_keep_one_policy(spark):
    # cluster {1,2,3}: 2 has top score → survives; cluster {7,8}: tie
    # on score → min doc_id (7); 9 unpaired → singleton survivor
    docs = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.7), (7, 0.8), (8, 0.8), (9, 0.1)],
        ["doc_id", "score"],
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], ["doc_a", "doc_b"])
    cc = connected_components(pairs)
    got = {
        r["doc_id"]: (r["cluster_id"], r["n_members"], r["score"])
        for r in canonical_survivors(docs, cc, "doc_id", "score").collect()
    }
    assert got == {2: (1, 3, 0.9), 7: (7, 2, 0.8), 9: (9, 1, 0.1)}


def test_survivors_all_singletons_when_no_pairs(spark):
    docs = spark.createDataFrame([(1, 0.5), (2, 0.9)], ["doc_id", "score"])
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    cc = connected_components(pairs)
    out = canonical_survivors(docs, cc, "doc_id", "score")
    rows = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    assert rows == {1: 1, 2: 2}
    assert out.filter(F.col("n_members") != 1).count() == 0
