"""Unit tests for distributed k-means (Lloyd's) on tiny 2-D corpora
with known geometry."""

from __future__ import annotations

import pytest

from data_lakehouse_movilidad_publica_santiago_spark.operators.kmeans import (
    kmeans_fit_assign,
)


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


CLUSTERED = [
    (0, [0.0, 0.0]),
    (1, [10.0, 10.0]),
    (2, [0.5, 0.0]),
    (3, [0.0, 0.5]),
    (4, [10.0, 10.5]),
    (5, [10.5, 10.0]),
]


class TestKMeans:
    def test_separable_clusters_recovered(self, spark):
        out = kmeans_fit_assign(_emb(spark, CLUSTERED), k=2, iters=2)
        got = {r["vec_id"]: r["cluster"] for r in out.collect()}
        assert got == {0: 0, 2: 0, 3: 0, 1: 1, 4: 1, 5: 1}

    def test_centroids_converge_to_means(self, spark):
        out = kmeans_fit_assign(_emb(spark, CLUSTERED), k=2, iters=3)
        out.collect()
        c0, c1 = out.kmeans_centroids
        assert c0 == pytest.approx([1 / 6, 1 / 6], abs=1e-6)
        assert c1 == pytest.approx([10 + 1 / 6, 10 + 1 / 6], abs=1e-6)

    def test_tie_breaks_to_lowest_cluster(self, spark):
        # a point exactly between both centroids after convergence
        data = [
            (0, [0.0, 0.0]),
            (1, [2.0, 0.0]),
            (2, [1.0, 0.0]),
        ]
        out = kmeans_fit_assign(_emb(spark, data), k=2, iters=1)
        got = {r["vec_id"]: r["cluster"] for r in out.collect()}
        assert got[2] == 0  # equidistant -> lowest index wins

    def test_explicit_init_ids(self, spark):
        out = kmeans_fit_assign(
            _emb(spark, CLUSTERED), k=2, iters=1, init_ids=[1, 0]
        )
        got = {r["vec_id"]: r["cluster"] for r in out.collect()}
        # cluster 0 seeded at (10,10): far group now maps to 0
        assert got[1] == 0 and got[4] == 0 and got[5] == 0
        assert got[0] == 1 and got[2] == 1 and got[3] == 1

    def test_duplicate_init_empty_cluster_keeps_old_centroid(self, spark):
        data = [
            (0, [1.0, 1.0]),
            (1, [1.0, 1.0]),
            (2, [1.5, 1.0]),
        ]
        # default init dedups vectors; FORCE duplicate seeds through
        # init_ids to exercise the empty-cluster keep-old path
        out = kmeans_fit_assign(
            _emb(spark, data), k=2, iters=2, init_ids=[0, 1]
        )
        got = {r["vec_id"]: r["cluster"] for r in out.collect()}
        # iter 1: ties all -> 0; cluster 1 is EMPTY and keeps (1,1)
        # (not NaN). iter 2: c0 has moved to the mean (7/6, 1), so the
        # points at exactly (1,1) now re-assign to the kept centroid.
        assert got == {0: 1, 1: 1, 2: 0}
        assert out.kmeans_centroids[1] == [1.0, 1.0]  # kept, not NaN

    def test_dist_is_rounded_winning_distance(self, spark):
        out = kmeans_fit_assign(_emb(spark, CLUSTERED), k=2, iters=1)
        row = {r["vec_id"]: r for r in out.collect()}
        # point 2 = (0.5, 0) against init centroid 0 = (0,0): d = 0.25
        assert row[2]["dist"] == 0.25

    def test_too_few_vectors_raises(self, spark):
        with pytest.raises(ValueError):
            kmeans_fit_assign(_emb(spark, CLUSTERED[:1]), k=2, iters=1)


class TestKMeansEdges:
    def test_duplicate_low_id_vectors_do_not_collapse_init(self, spark):
        # ids 0-2 share one vector; distinct-init must seed the second
        # centroid from the other group, not a duplicate
        data = [(i, [1.0, 0.0]) for i in range(3)] + [
            (i, [0.0, 1.0]) for i in (3, 4, 5)
        ]
        out = kmeans_fit_assign(_emb(spark, data), k=2, iters=2)
        got = {r["vec_id"]: r["cluster"] for r in out.collect()}
        assert set(got.values()) == {0, 1}
        assert got[0] == got[1] == got[2]
        assert got[3] == got[4] == got[5] != got[0]

    def test_k1_single_cluster(self, spark):
        out = kmeans_fit_assign(_emb(spark, CLUSTERED), k=1, iters=1)
        rows = out.collect()
        assert {r["cluster"] for r in rows} == {0}
        assert len(rows) == len(CLUSTERED)

    def test_iters_zero_rejected(self, spark):
        import pytest as _pytest

        with _pytest.raises(ValueError, match="iters"):
            kmeans_fit_assign(_emb(spark, CLUSTERED), k=2, iters=0)

    def test_missing_init_id_clear_error(self, spark):
        import pytest as _pytest

        with _pytest.raises(ValueError, match="init_ids not found"):
            kmeans_fit_assign(
                _emb(spark, CLUSTERED), k=2, iters=1, init_ids=[0, 99]
            )
