"""Unit tests for SemDeDup (cluster-then-compare semantic dedup) on
hand-built 2-D geometry."""

from __future__ import annotations

from data_lakehouse_movilidad_publica_santiago_spark.operators.semantic_dedup import (
    semantic_dedup,
)

# init seeds (ids 0, 1) anchor two well-separated clusters.
# cluster 0: ids 0/2/3 are colinear (pairwise cos = 1) -> one dup
# group; id 8 = [1, 0] also lands in cluster 0 but is orthogonal.
# cluster 1: ids 1/5 are nearly colinear -> a second dup group.
# id 8 vs id 1 have cos = 1.0 but sit in DIFFERENT clusters, so
# SemDeDup never compares them (the cross-cluster approximation).
DATA = [
    (0, [0.0, 1.0]),
    (1, [10.0, 0.0]),
    (2, [0.0, 1.01]),
    (3, [0.0, 0.99]),
    (5, [10.0, 0.05]),
    (8, [1.0, 0.0]),
]


def _emb(spark):
    return spark.createDataFrame(DATA, "vec_id bigint, embedding array<float>")


class TestSemanticDedup:
    def _run(self, spark):
        out = semantic_dedup(_emb(spark), k=2, iters=1, threshold=0.99)
        return {r["vec_id"]: r for r in out.collect()}

    def test_all_vectors_verdicted(self, spark):
        got = self._run(spark)
        assert set(got) == {0, 1, 2, 3, 5, 8}

    def test_duplicate_group_keeps_farthest_from_centroid(self, spark):
        got = self._run(spark)
        # group {0,2,3}: dists 0 / 0.0001 / 0.0001 — farthest ties
        # between 2 and 3, lowest id (2) is the representative
        assert got[2]["keep"] is True
        assert got[0]["keep"] is False
        assert got[3]["keep"] is False

    def test_second_cluster_group(self, spark):
        got = self._run(spark)
        # group {1,5}: id 5 (dist 0.0025) beats the seed at dist 0
        assert got[5]["keep"] is True
        assert got[1]["keep"] is False
        assert got[5]["dist"] == 0.0025

    def test_cross_cluster_twins_never_compared(self, spark):
        got = self._run(spark)
        # id 8 has cos = 1.0 with id 1 but lives in cluster 0: kept
        assert got[8]["keep"] is True
        assert got[8]["cluster"] != got[1]["cluster"]

    def test_singletons_kept(self, spark):
        got = self._run(spark)
        assert got[8]["keep"] is True

    def test_high_threshold_keeps_everything(self, spark):
        out = semantic_dedup(_emb(spark), k=2, iters=1, threshold=1.1)
        assert all(r["keep"] for r in out.collect())
