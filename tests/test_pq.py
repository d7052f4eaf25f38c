"""Product-quantization ANN (round-8): training determinism, code
range, inline/at-rest bit parity, measured recall vs exact kNN, and
the at-rest size claim."""

from __future__ import annotations

import math

import pytest

from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
    build_pq_index,
    load_pq_index,
    pq_encode,
    pq_reconstruction_mse,
    pq_topk,
    pq_topk_indexed,
    pq_train,
)
from data_lakehouse_movilidad_publica_santiago_spark.operators.similarity import (
    cosine_topk,
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")


@pytest.fixture(scope="module")
def cb(emb):
    return pq_train(emb, m=8, ksub=16, iters=2)


@pytest.fixture(scope="module")
def qvec(emb):
    return [
        float(x)
        for x in emb.filter("vec_id = 0").collect()[0]["embedding"]
    ]


def test_codebook_shape_and_determinism(emb, cb):
    assert len(cb) == 8 and all(len(sub) == 16 for sub in cb)
    assert all(len(c) == 8 for sub in cb for c in sub)
    # partitioning must not change the trained codebooks (rounded
    # updates + deterministic init)
    cb2 = pq_train(emb.repartition(16), m=8, ksub=16, iters=2)
    assert cb2 == cb


def test_codes_in_range_and_every_vector_coded(emb, cb):
    codes = pq_encode(emb, cb)
    stats = codes.selectExpr(
        "count(*) AS n",
        "min(array_min(codes)) AS lo",
        "max(array_max(codes)) AS hi",
        "min(size(codes)) AS m_lo",
        "max(size(codes)) AS m_hi",
    ).collect()[0]
    assert stats["n"] == emb.count()
    assert 0 <= stats["lo"] and stats["hi"] <= 15
    assert stats["m_lo"] == stats["m_hi"] == 8


def test_recall_at_gate_overfetch_is_one(emb, cb, qvec):
    """The gate claims recall 1.0 at k=10, overfetch=16 on this corpus
    — pin it (the sq8 pattern: the oracle replays the algorithm, this
    test asserts the algorithm is also USEFUL)."""
    exact = [r["vec_id"] for r in cosine_topk(emb, qvec, k=10).collect()]
    got = [
        r["vec_id"]
        for r in pq_topk(emb, qvec, k=10, overfetch=16, codebooks=cb).collect()
    ]
    assert got == exact  # exact rescore makes the order identical too


def test_indexed_bit_parity(emb, cb, qvec):
    codes = pq_encode(emb, cb)
    a = [
        tuple(r)
        for r in pq_topk(
            emb, qvec, k=10, overfetch=8, codebooks=cb
        ).collect()
    ]
    b = [
        tuple(r)
        for r in pq_topk_indexed(
            codes, emb, qvec, cb, k=10, overfetch=8
        ).collect()
    ]
    assert a == b


def test_reconstruction_mse_beats_zero_codebook(emb, cb):
    """Training must beat the trivial quantizer: MSE against trained
    codebooks < per-component variance of the corpus (what an all-mean
    single-centroid codebook would score)."""
    mse = pq_reconstruction_mse(emb, cb)
    from pyspark.sql import functions as F

    var = (
        emb.select(F.explode("embedding").alias("x"))
        .agg(F.var_pop(F.col("x").cast("double")).alias("v"))
        .collect()[0]["v"]
    )
    assert 0.0 < mse < var


def test_validation_errors(emb):
    with pytest.raises(ValueError, match="divisible"):
        pq_train(emb, m=7, dim=64)
    with pytest.raises(ValueError, match="oracle_parity"):
        pq_train(emb, iters=3)
    with pytest.raises(ValueError, match=">= 1"):
        pq_train(emb, iters=0, oracle_parity=False)


@pytest.mark.slow
def test_production_training_uncapped(emb, cb):
    """oracle_parity=False lifts the iters<=2 oracle-parity pin:
    more Lloyd rounds must stay deterministic (rounded updates,
    min-id init, stale-centroid rule) and must not WORSEN the
    codebook (reconstruction MSE at 5 iters <= the 2-iter gate
    codebook's, up to the 1e-6 update rounding)."""
    cb5 = pq_train(emb, m=8, ksub=16, iters=5, oracle_parity=False)
    assert pq_train(
        emb.repartition(16), m=8, ksub=16, iters=5, oracle_parity=False
    ) == cb5
    # parity mode and production mode agree where both are defined
    assert pq_train(emb, m=8, ksub=16, iters=2, oracle_parity=False) == cb
    mse2 = pq_reconstruction_mse(emb, cb)
    mse5 = pq_reconstruction_mse(emb, cb5)
    assert mse5 <= mse2 + 1e-6


def test_at_rest_index_roundtrip_and_size(emb, cb, qvec, spark, tmp_path):
    """build/load round-trip; the persisted codes parquet must be well
    under the float column's size (the 32x at-rest claim, allowing
    parquet overhead on a small corpus)."""
    import os

    d = str(tmp_path / "pqidx")
    cb2 = build_pq_index(emb, d, m=8, ksub=16, iters=2)
    assert cb2 == cb
    codes, cb3, meta = load_pq_index(spark, d)
    assert cb3 == cb and meta["m"] == 8
    out = pq_topk_indexed(codes, emb, qvec, cb3, k=10, overfetch=16)
    exact = [r["vec_id"] for r in cosine_topk(emb, qvec, k=10).collect()]
    assert [r["vec_id"] for r in out.collect()] == exact

    def tree_bytes(p):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(p)
            for f in fs
            if f.endswith(".parquet")
        )

    float_dir = str(tmp_path / "floats")
    emb.write.mode("overwrite").parquet(float_dir)
    assert tree_bytes(os.path.join(d, "codes")) < 0.2 * tree_bytes(float_dir)


def test_norm_corrected_screen_handles_heterogeneous_norms(spark):
    """The ADVICE-flagged failure mode for dot-product screens: a
    large-norm vector pointing AWAY from the query must not crowd out
    true cosine neighbors.  With 8 subspaces over dim 16 and exact
    subvector codebooks (every distinct subvector is a centroid), the
    ADC cosine is exact, so the screen must rank by cosine, not norm."""
    import random

    rng = random.Random(7)
    rows = []
    q = [1.0] + [0.0] * 15
    # 5 unit-ish vectors near the query, 10 huge-norm vectors far away
    for i in range(1, 6):
        v = [1.0] + [rng.uniform(-0.05, 0.05) for _ in range(15)]
        rows.append((i, v))
    for i in range(6, 16):
        v = [-50.0] + [rng.uniform(-5.0, 5.0) for _ in range(15)]
        rows.append((i, v))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        ["vec_id", "embedding"],
    )
    cb = pq_train(emb, m=8, ksub=15, iters=1, dim=16)
    got = [
        r["vec_id"]
        for r in pq_topk(
            emb, q, k=5, overfetch=1, codebooks=cb
        ).collect()
    ]
    # overfetch=1: the screen ALONE must pick the 5 cosine neighbors
    assert sorted(got) == [1, 2, 3, 4, 5]


def test_ivfpq_gate_query_recall_and_order(emb, qvec, spark, tmp_path):
    """Pin the gate's exact-kNN-oracle justification: at n_cells=8 /
    n_probe=4 / overfetch=16, the gate query (vec_id 0) reproduces
    exact top-10 IN ORDER (deterministic build: seeded IVF sample,
    smallest-id PQ init)."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
        build_ivfpq_index,
        ivfpq_topk,
    )

    d = str(tmp_path / "ivfpq")
    build_ivfpq_index(emb, d, n_cells=8, m=8, ksub=16, iters=2, seed=7)
    exact = [tuple(r) for r in cosine_topk(emb, qvec, k=10).collect()]
    got = [
        tuple(r)
        for r in ivfpq_topk(
            spark, d, emb, qvec, k=10, n_probe=4, overfetch=16
        ).collect()
    ]
    assert got == exact

    # harder queries on this uniform-random corpus (near-tied
    # neighbors scattered across cells): full probe + wider overfetch
    # recovers exact top-10 — the corpus-adversarial ceiling
    for vid in (7, 42):
        q = [
            float(x)
            for x in emb.filter(f"vec_id = {vid}").collect()[0]["embedding"]
        ]
        e = [r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()]
        g = [
            r["vec_id"]
            for r in ivfpq_topk(
                spark, d, emb, q, k=10, n_probe=8, overfetch=32
            ).collect()
        ]
        assert g == e


def test_ivfpq_screen_prunes_at_file_level(emb, qvec, spark, tmp_path):
    """The ADC screen must read ONLY the probed cells' partition
    directories (executor truth via input_file_name)."""
    import os

    from pyspark.sql import functions as F

    from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
        build_ivfpq_index,
    )

    d = str(tmp_path / "ivfpq")
    build_ivfpq_index(emb, d, n_cells=8, m=8, ksub=16, iters=2, seed=7)
    codes = spark.read.parquet(os.path.join(d, "codes")).filter(
        F.col("ivf_cell").isin([0, 1])
    )
    files = [
        r[0]
        for r in codes.select(F.input_file_name()).distinct().collect()
    ]
    assert files and all(
        ("ivf_cell=0" in f or "ivf_cell=1" in f) for f in files
    )

class TestIvfpqAdd:
    pytestmark = pytest.mark.slow
    """Incremental index maintenance (round 9): ivfpq_add appends
    frozen-quantizer-encoded batches; queries see them with no reload."""

    def _grown_index(self, spark, tmp_path, store_vectors=False):
        from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
            build_ivfpq_index,
            ivfpq_add,
        )

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        )
        first = emb.filter("vec_id % 2 = 0")
        rest = emb.filter("vec_id % 2 = 1")
        idx = str(tmp_path / "grow")
        build_ivfpq_index(
            first, idx, n_cells=4, m=8, ksub=16, iters=2,
            store_vectors=store_vectors,
        )
        n = ivfpq_add(spark, idx, rest)
        assert n == rest.count()
        return emb, rest, idx

    def test_added_codes_bit_equal_direct_encode(self, spark, tmp_path):
        """Determinism contract: add-then-read equals a direct encode
        of the batch with the index's frozen centroids + codebooks."""
        from pyspark.sql import functions as F

        from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
            _with_codes,
            load_ivfpq_meta,
        )
        from data_lakehouse_movilidad_publica_santiago_spark.operators.similarity import (
            assign_ivf_cells,
        )

        emb, rest, idx = self._grown_index(spark, tmp_path)
        meta, cent = load_ivfpq_meta(spark, idx)
        stored = {
            r["vec_id"]: (r["ivf_cell"], tuple(r["codes"]))
            for r in spark.read.parquet(f"{idx}/codes")
            .join(rest.select("vec_id"), "vec_id")
            .collect()
        }
        direct = _with_codes(
            assign_ivf_cells(rest, cent),
            meta["codebooks"],
            meta["dim"] // meta["m"],
            keep=["vec_id", "ivf_cell"],
        ).select(
            "vec_id", "ivf_cell",
            F.array(*[F.col(f"__code{j}") for j in range(meta["m"])])
            .alias("codes"),
        )  # fmt: skip
        expect = {
            r["vec_id"]: (r["ivf_cell"], tuple(r["codes"]))
            for r in direct.collect()
        }
        assert stored == expect
        assert len(stored) == rest.count()

    def test_grown_index_queries_whole_corpus(self, spark, tmp_path):
        """At full probe + generous overfetch the grown index returns
        the exact top-k over ORIGINAL + ADDED vectors — no loss, no
        dupes, no reload step."""
        from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
            ivfpq_topk,
        )
        from data_lakehouse_movilidad_publica_santiago_spark.operators.similarity import (
            cosine_topk,
        )

        emb, rest, idx = self._grown_index(spark, tmp_path)
        q = [
            float(x)
            for x in emb.filter("vec_id = 1").collect()[0]["embedding"]
        ]
        got = [
            (r["vec_id"], r["cos_sim"])
            for r in ivfpq_topk(
                spark, idx, emb, q, k=10, n_probe=4, overfetch=64
            ).collect()
        ]
        exact = [
            (r["vec_id"], r["cos_sim"])
            for r in cosine_topk(emb, q, k=10).collect()
        ]
        assert got == exact

    def test_grown_index_serves_file_pruned_mmr(self, spark, tmp_path):
        """store_vectors indexes grow both datasets: the composed
        file-pruned MMR over the grown index equals the exact greedy
        over the full corpus."""
        from data_lakehouse_movilidad_publica_santiago_spark.operators.retrieval import (
            mmr_topk,
            mmr_topk_ivfpq,
        )

        emb, rest, idx = self._grown_index(
            spark, tmp_path, store_vectors=True
        )
        q = [
            float(x)
            for x in emb.filter("vec_id = 1").collect()[0]["embedding"]
        ]
        exact = [
            tuple(r) for r in mmr_topk(emb, q, k=5, lam=0.7).collect()
        ]
        got = [
            tuple(r)
            for r in mmr_topk_ivfpq(
                spark, idx, q, k=5, lam=0.7, pool_size=400, n_probe=4,
            ).collect()
        ]
        assert got == exact

    def test_append_only_layout(self, spark, tmp_path):
        """The add APPENDS files under the cell partitions; every file
        present before the add is still there, byte-identical names."""
        from pathlib import Path

        from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
            build_ivfpq_index,
            ivfpq_add,
        )

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        )
        idx = str(tmp_path / "layout")
        build_ivfpq_index(
            emb.filter("vec_id % 2 = 0"), idx, n_cells=4
        )
        before = {
            str(p) for p in Path(idx, "codes").rglob("*.parquet")
        }
        ivfpq_add(spark, idx, emb.filter("vec_id % 2 = 1"))
        after = {str(p) for p in Path(idx, "codes").rglob("*.parquet")}
        assert before <= after and len(after) > len(before)
        for f in after - before:
            assert "/ivf_cell=" in f


class TestIvfpqLifecycle:
    pytestmark = pytest.mark.slow
    """Round-10: index compaction (ivfpq_optimize) + drift monitoring
    (ivfpq_drift_stats) — the rebuild/maintenance story for a daily-
    growing ivfpq_add index."""

    def _built(self, spark, tmp_path, store_vectors=True, n_adds=3):
        from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
            build_ivfpq_index,
            ivfpq_add,
        )

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        )
        idx = str(tmp_path / "life")
        build_ivfpq_index(
            emb.filter("vec_id % 5 = 0"), idx, n_cells=4, m=8, ksub=16,
            iters=2, store_vectors=store_vectors,
        )  # fmt: skip
        for r in range(1, n_adds + 1):
            ivfpq_add(spark, idx, emb.filter(f"vec_id % 5 = {r}"))
        used = emb.filter(f"vec_id % 5 <= {n_adds}")
        return emb, used, idx

    def test_optimize_compacts_and_preserves_results(self, spark, tmp_path):
        """After 3 appends cells hold >1 file; optimize rewrites the
        over-threshold cells to one file each, and both the ANN query
        and the file-pruned MMR return IDENTICAL rows before/after."""
        from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
            _cell_files,
            ivfpq_optimize,
            ivfpq_topk,
        )
        from data_lakehouse_movilidad_publica_santiago_spark.operators.retrieval import (
            mmr_topk_ivfpq,
        )

        emb, used, idx = self._built(spark, tmp_path)
        q = [
            float(x)
            for x in emb.filter("vec_id = 0").collect()[0]["embedding"]
        ]
        before_files = _cell_files(f"{idx}/codes")
        assert any(len(fs) > 1 for fs in before_files.values())
        knn_before = [
            tuple(r)
            for r in ivfpq_topk(
                spark, idx, used, q, k=10, n_probe=4, overfetch=64
            ).collect()
        ]
        mmr_before = [
            tuple(r)
            for r in mmr_topk_ivfpq(
                spark, idx, q, k=5, pool_size=200, n_probe=4
            ).collect()
        ]
        stats = ivfpq_optimize(spark, idx, max_files_per_cell=1)
        for ds in ("codes", "vectors"):
            ds_stats = stats["datasets"][ds]
            assert ds_stats["files_after"] <= ds_stats["files_before"]
            after = _cell_files(f"{idx}/{ds}")
            assert all(len(fs) == 1 for fs in after.values()), after
        assert stats["datasets"]["codes"]["cells_compacted"] > 0
        # uniform per-dataset dicts (ADVICE r11: recovered_cells must
        # not be mixed into the dataset map)
        assert all(
            set(d) == {"cells_compacted", "files_before", "files_after"}
            for d in stats["datasets"].values()
        )
        assert stats["recovered_cells"] == 0
        knn_after = [
            tuple(r)
            for r in ivfpq_topk(
                spark, idx, used, q, k=10, n_probe=4, overfetch=64
            ).collect()
        ]
        mmr_after = [
            tuple(r)
            for r in mmr_topk_ivfpq(
                spark, idx, q, k=5, pool_size=200, n_probe=4
            ).collect()
        ]
        assert knn_after == knn_before
        assert mmr_after == mmr_before
        # no staging debris
        import os

        assert not os.path.exists(f"{idx}/_optimize_tmp")

    def test_optimize_noop_under_threshold(self, spark, tmp_path):
        from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
            ivfpq_optimize,
        )

        emb, used, idx = self._built(spark, tmp_path, n_adds=1)
        stats = ivfpq_optimize(spark, idx, max_files_per_cell=10)
        assert stats["datasets"]["codes"]["cells_compacted"] == 0
        assert (
            stats["datasets"]["codes"]["files_before"]
            == stats["datasets"]["codes"]["files_after"]
        )

    def test_drift_stats_in_distribution_vs_shifted(self, spark, tmp_path):
        """A batch drawn from the build distribution scores near-zero
        occupancy shift and mse_ratio ~1; a hard-shifted batch (all
        mass toward one direction) scores strictly worse on both."""
        from pyspark.sql import functions as F

        from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
            build_ivfpq_index,
            ivfpq_drift_stats,
        )

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        )
        idx = str(tmp_path / "drift")
        build_ivfpq_index(
            emb.filter("vec_id % 2 = 0"), idx, n_cells=4, store_vectors=False
        )
        same = ivfpq_drift_stats(
            spark, idx, emb.filter("vec_id % 2 = 1")
        )
        assert 0.0 <= same["cell_tv_distance"] <= 1.0
        assert same["build_mse"] is not None
        assert same["mse_ratio"] == pytest.approx(1.0, rel=0.35)
        # shift: collapse every vector onto 10x its first component
        shifted_df = emb.filter("vec_id % 2 = 1").select(
            "vec_id",
            F.expr(
                "transform(embedding, (x, i) -> CAST("
                "CASE WHEN i = 0 THEN 10.0 ELSE x * 0.01 END AS DOUBLE))"
            ).alias("embedding"),
        )
        shifted = ivfpq_drift_stats(spark, idx, shifted_df)
        assert shifted["cell_tv_distance"] > same["cell_tv_distance"]
        assert shifted["mse_ratio"] > same["mse_ratio"] * 2
        assert shifted["batch_hottest_cell_share"] >= 0.9

    def test_drift_stats_empty_batch_raises(self, spark, tmp_path):
        from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
            build_ivfpq_index,
            ivfpq_drift_stats,
        )

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        )
        idx = str(tmp_path / "empty")
        build_ivfpq_index(emb, idx, n_cells=4)
        with pytest.raises(ValueError, match="empty"):
            ivfpq_drift_stats(spark, idx, emb.filter("vec_id < 0"))

    def test_add_with_renamed_batch_columns(self, spark, tmp_path):
        """Round-10 ADVICE fix: id_col/vec_col name the BATCH's source
        columns; the appended rows land under the INDEX's column names
        (no null-merged schema), and queries see the whole corpus."""
        from pyspark.sql import functions as F

        from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
            build_ivfpq_index,
            ivfpq_add,
            ivfpq_topk,
        )
        from data_lakehouse_movilidad_publica_santiago_spark.operators.similarity import (
            cosine_topk,
        )

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        )
        idx = str(tmp_path / "renamed")
        build_ivfpq_index(
            emb.filter("vec_id % 2 = 0"), idx, n_cells=4, store_vectors=True
        )
        renamed = emb.filter("vec_id % 2 = 1").select(
            F.col("vec_id").alias("doc_id"),
            F.col("embedding").alias("vec"),
        )
        n = ivfpq_add(spark, idx, renamed, id_col="doc_id", vec_col="vec")
        assert n == renamed.count()
        codes = spark.read.parquet(f"{idx}/codes")
        assert set(codes.columns) == {"vec_id", "codes", "ivf_cell"}
        assert codes.filter("vec_id IS NULL OR codes IS NULL").count() == 0
        vecs = spark.read.parquet(f"{idx}/vectors")
        assert set(vecs.columns) == {"vec_id", "embedding", "ivf_cell"}
        assert vecs.filter("embedding IS NULL").count() == 0
        q = [
            float(x)
            for x in emb.filter("vec_id = 1").collect()[0]["embedding"]
        ]
        got = [
            (r["vec_id"], r["cos_sim"])
            for r in ivfpq_topk(
                spark, idx, emb, q, k=10, n_probe=4, overfetch=64
            ).collect()
        ]
        exact = [
            (r["vec_id"], r["cos_sim"])
            for r in cosine_topk(emb, q, k=10).collect()
        ]
        assert got == exact


class TestIvfpqResidual:
    pytestmark = pytest.mark.slow
    """Round-10: residual-codebook IVF-PQ (FAISS's actual default).
    Motivation measured in SCALE.md r10: on a 5M clustered corpus the
    GLOBAL-codebook ADC screen collapses to recall 0.1 at every
    training depth — all within-cluster vectors share one code, and
    every true neighbor is within-cluster.  Encoding r = x − c
    restores within-cluster discrimination."""

    def _clustered(self, spark, n=4000, centers=8, noise=0.2):
        from pyspark.sql import functions as F

        comps = []
        for w in range(16):
            hc = F.md5(F.concat(
                F.lit(f"ctr{w}:"), (F.col("id") % centers).cast("string")
            ))  # fmt: skip
            hn = F.md5(F.concat(F.lit(f"v{w}:"), F.col("id").cast("string")))
            for c in range(4):
                ctr = (
                    F.conv(F.substring(hc, 1 + 8 * c, 8), 16, 10)
                    .cast("double") / F.lit(2147483648.0) - F.lit(1.0)
                )  # fmt: skip
                jit = (
                    F.conv(F.substring(hn, 1 + 8 * c, 8), 16, 10)
                    .cast("double") / F.lit(2147483648.0) - F.lit(1.0)
                )  # fmt: skip
                comps.append(ctr + jit * F.lit(noise))
        return spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.array(*comps).cast("array<float>").alias("embedding"),
        )

    def test_residual_fixes_within_cluster_code_ties(self, spark, tmp_path):
        """The degeneracy the residual layout exists for, pinned on
        the mechanical invariant (SCALE.md r10 measures the recall
        side at 5M): with more clusters than codewords (64 > ksub=16)
        GLOBAL codes collapse within clusters — every member's raw
        subvectors sit at the cluster center, so whole clusters share
        a handful of codes and the ADC screen cannot rank inside the
        cluster where all true neighbors live.  RESIDUAL codes
        (r = x − cell-mean anchor) quantize the within-cluster offsets
        instead and stay near-unique per vector."""
        from pyspark.sql import functions as F

        from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
            build_ivfpq_index,
            ivfpq_topk,
        )
        from data_lakehouse_movilidad_publica_santiago_spark.operators.similarity import (
            cosine_topk,
        )

        emb = self._clustered(spark, n=4000, centers=64)
        src = tmp_path / "cl.parquet"
        emb.write.parquet(str(src))
        emb = spark.read.parquet(str(src))
        diversity = {}
        for variant, kw in (("global", {}), ("residual", {"residual": True})):
            idx = str(tmp_path / variant)
            build_ivfpq_index(
                emb, idx, n_cells=64, m=8, ksub=16, iters=2,
                sample_cap=10_000, **kw,
            )  # fmt: skip
            codes = spark.read.parquet(f"{idx}/codes").withColumn(
                "gcl", F.col("vec_id") % 64
            )
            per_cluster = [
                r["d"]
                for r in codes.groupBy("gcl")
                .agg(F.countDistinct("codes").alias("d"))
                .collect()
            ]
            per_cluster.sort()
            diversity[variant] = {
                "median": per_cluster[len(per_cluster) // 2],
                "total": codes.select("codes").distinct().count(),
            }
        # measured on this corpus: global median ~7 distinct codes per
        # 62-member cluster (min 1 = a fully tied cluster); residual
        # median ~62 = near-unique codes (measured 542 vs 3015 total)
        assert diversity["residual"]["median"] >= 45
        assert diversity["global"]["median"] <= 20
        assert (
            diversity["residual"]["total"] > 3 * diversity["global"]["total"]
        )
        # and the residual index still reproduces the exact top-k at
        # full probe + generous overfetch (same pin as the global gate)
        qv = [
            float(x)
            for x in emb.filter("vec_id = 0").collect()[0]["embedding"]
        ]
        got = [
            (r["vec_id"], r["cos_sim"])
            for r in ivfpq_topk(
                spark, str(tmp_path / "residual"), emb, qv,
                k=10, n_probe=64, overfetch=64,
            ).collect()
        ]  # fmt: skip
        want = [
            (r["vec_id"], r["cos_sim"])
            for r in cosine_topk(emb, qv, k=10).collect()
        ]
        assert got == want

    def test_residual_grown_index_and_filepruned_mmr(self, spark, tmp_path):
        """ivfpq_add encodes batches through the residual path (frozen
        centroids, bit-equal to build-time encode), and the file-pruned
        MMR stack runs the per-cell residual screen."""
        from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
            build_ivfpq_index,
            ivfpq_add,
            ivfpq_topk,
        )
        from data_lakehouse_movilidad_publica_santiago_spark.operators.retrieval import (
            mmr_topk,
            mmr_topk_ivfpq,
        )
        from data_lakehouse_movilidad_publica_santiago_spark.operators.similarity import (
            cosine_topk,
        )

        emb = self._clustered(spark)
        src = tmp_path / "cl2.parquet"
        emb.write.parquet(str(src))
        emb = spark.read.parquet(str(src))
        idx = str(tmp_path / "res_grow")
        build_ivfpq_index(
            emb.filter("vec_id % 2 = 0"), idx, n_cells=8, m=8, ksub=16,
            iters=2, residual=True, store_vectors=True,
        )  # fmt: skip
        n = ivfpq_add(spark, idx, emb.filter("vec_id % 2 = 1"))
        assert n == emb.filter("vec_id % 2 = 1").count()
        qv = [
            float(x)
            for x in emb.filter("vec_id = 1").collect()[0]["embedding"]
        ]
        got = [
            (r["vec_id"], r["cos_sim"])
            for r in ivfpq_topk(
                spark, idx, emb, qv, k=10, n_probe=8, overfetch=64
            ).collect()
        ]
        want = [
            (r["vec_id"], r["cos_sim"])
            for r in cosine_topk(emb, qv, k=10).collect()
        ]
        assert got == want
        exact = [tuple(r) for r in mmr_topk(emb, qv, k=5, lam=0.7).collect()]
        mmr = [
            tuple(r)
            for r in mmr_topk_ivfpq(
                spark, idx, qv, k=5, lam=0.7, pool_size=2000, n_probe=8
            ).collect()
        ]
        assert mmr == exact

    def test_residual_drift_and_optimize(self, spark, tmp_path):
        """Drift stats score residual batches in residual space
        (mse_ratio ~1 for an in-distribution batch), and compaction
        preserves residual-index query results."""
        from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
            build_ivfpq_index,
            ivfpq_add,
            ivfpq_drift_stats,
            ivfpq_optimize,
            ivfpq_topk,
        )

        emb = self._clustered(spark)
        src = tmp_path / "cl3.parquet"
        emb.write.parquet(str(src))
        emb = spark.read.parquet(str(src))
        idx = str(tmp_path / "res_life")
        build_ivfpq_index(
            emb.filter("vec_id % 3 = 0"), idx, n_cells=8, residual=True
        )
        batch = emb.filter("vec_id % 3 = 1")
        stats = ivfpq_drift_stats(spark, idx, batch)
        assert stats["mse_ratio"] == pytest.approx(1.0, rel=0.35)
        ivfpq_add(spark, idx, batch)
        ivfpq_add(spark, idx, emb.filter("vec_id % 3 = 2"))
        qv = [
            float(x)
            for x in emb.filter("vec_id = 2").collect()[0]["embedding"]
        ]
        before = [
            tuple(r)
            for r in ivfpq_topk(
                spark, idx, emb, qv, k=10, n_probe=8, overfetch=64
            ).collect()
        ]
        ivfpq_optimize(spark, idx, max_files_per_cell=1)
        after = [
            tuple(r)
            for r in ivfpq_topk(
                spark, idx, emb, qv, k=10, n_probe=8, overfetch=64
            ).collect()
        ]
        assert after == before


class TestIvfpqRound11:
    pytestmark = pytest.mark.slow
    """Round-11: broadcast-join residual encode for large cell counts
    (VERDICT r10 ask #1 — the literal anchor SQL grows O(n_cells·dim)
    and is tens of MB at 100-TB-realistic coarse counts), anchors out
    of inline JSON, ivfpq_optimize crash recovery (the ADVICE r10
    medium finding: re-run used to DELETE the only copy of a mid-swap
    cell), and the 256-cell full-probe screen codegen stress (ADVICE
    r10: the per-cell CASE screen was untested past n_probe=64)."""

    def test_broadcast_encode_bit_identical_and_anchors_parquet(
        self, spark, tmp_path, monkeypatch
    ):
        """Forcing the broadcast-join encode (threshold 0) must yield
        BIT-IDENTICAL codes to the literal-SQL encode — same rounded-
        double anchors, same zip_with subtraction — while the anchors
        move out of codebooks.json into an anchors/ parquet that
        load_ivfpq_meta folds back transparently."""
        import json
        import os

        import data_lakehouse_movilidad_publica_santiago_spark.operators.pq as pq_mod
        from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
            build_ivfpq_index,
            ivfpq_topk,
            load_ivfpq_meta,
        )

        emb = TestIvfpqResidual._clustered(
            TestIvfpqResidual(), spark, n=2000, centers=8
        )
        src = tmp_path / "bc.parquet"
        emb.write.parquet(str(src))
        emb = spark.read.parquet(str(src))

        lit_idx, bc_idx = str(tmp_path / "lit"), str(tmp_path / "bc")
        build_ivfpq_index(
            emb, lit_idx, n_cells=8, residual=True, sample_cap=10_000
        )
        monkeypatch.setattr(pq_mod, "_ANCHOR_LITERAL_MAX_CELLS", 0)
        build_ivfpq_index(
            emb, bc_idx, n_cells=8, residual=True, sample_cap=10_000
        )

        # at rest: same (id, cell, codes) rows, bit for bit
        def rows(idx):
            return sorted(
                (r["vec_id"], r["ivf_cell"], list(r["codes"]))
                for r in spark.read.parquet(f"{idx}/codes").collect()
            )

        assert rows(bc_idx) == rows(lit_idx)

        # anchors relocated: raw JSON carries none, loader folds back
        raw = json.loads(open(f"{bc_idx}/codebooks.json").read())
        assert raw["anchors"] is None and raw["anchors_dataset"] is True
        assert os.path.isdir(f"{bc_idx}/anchors")
        meta_lit, _ = load_ivfpq_meta(spark, lit_idx)
        meta_bc, _ = load_ivfpq_meta(spark, bc_idx)
        assert meta_bc["anchors"] == meta_lit["anchors"]
        assert meta_bc["codebooks"] == meta_lit["codebooks"]

        # identical query results through the parquet-anchored index
        qv = [
            float(x)
            for x in emb.filter("vec_id = 7").collect()[0]["embedding"]
        ]
        got_lit = [
            tuple(r)
            for r in ivfpq_topk(
                spark, lit_idx, emb, qv, k=10, n_probe=8, overfetch=16
            ).collect()
        ]
        got_bc = [
            tuple(r)
            for r in ivfpq_topk(
                spark, bc_idx, emb, qv, k=10, n_probe=8, overfetch=16
            ).collect()
        ]
        assert got_bc == got_lit

    def test_optimize_crash_recovery_restores_mid_swap_cell(
        self, spark, tmp_path, monkeypatch
    ):
        """Kill the process (simulated) BETWEEN the two renames of one
        cell's swap — the window where the cell's only copies sit
        under _optimize_tmp — and prove the documented recovery
        (re-running the optimize) restores a queryable index with the
        exact pre-crash results.  Before round 11 the re-run rmtree'd
        _optimize_tmp on entry and silently lost the cell's rows."""
        import os as _os

        import data_lakehouse_movilidad_publica_santiago_spark.operators.pq as pq_mod
        from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
            _cell_files,
            build_ivfpq_index,
            ivfpq_add,
            ivfpq_optimize,
            ivfpq_topk,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        idx = str(tmp_path / "crash")
        build_ivfpq_index(
            emb.filter("vec_id % 4 = 0"), idx, n_cells=4, m=8, ksub=16
        )
        for r in (1, 2, 3):
            ivfpq_add(spark, idx, emb.filter(f"vec_id % 4 = {r}"))
        qv = [
            float(x)
            for x in emb.filter("vec_id = 0").collect()[0]["embedding"]
        ]

        def knn():
            return [
                tuple(r)
                for r in ivfpq_topk(
                    spark, idx, emb, qv, k=10, n_probe=4, overfetch=64
                ).collect()
            ]

        before = knn()
        n_rows_before = spark.read.parquet(f"{idx}/codes").count()

        real_rename = _os.rename
        calls = {"n": 0}

        def dying_rename(src, dst):
            calls["n"] += 1
            if calls["n"] == 2:  # live→trash done, staged→live pending
                raise RuntimeError("injected crash mid-swap")
            return real_rename(src, dst)

        monkeypatch.setattr(pq_mod.os, "rename", dying_rename)
        with pytest.raises(RuntimeError, match="injected crash"):
            ivfpq_optimize(spark, idx, max_files_per_cell=1)
        monkeypatch.undo()

        # the crash left one cell's only copies parked under tmp
        live_cells = set(_cell_files(f"{idx}/codes"))
        assert len(live_cells) == 3  # one of 4 cells is mid-swap
        assert spark.read.parquet(f"{idx}/codes").count() < n_rows_before

        # documented recovery: re-run the optimize
        stats = ivfpq_optimize(spark, idx, max_files_per_cell=1)
        assert stats["recovered_cells"] == 1
        assert set(_cell_files(f"{idx}/codes")) == live_cells | {
            (live_cells ^ {0, 1, 2, 3}).pop()
        }
        assert spark.read.parquet(f"{idx}/codes").count() == n_rows_before
        assert all(
            len(fs) == 1 for fs in _cell_files(f"{idx}/codes").values()
        )
        assert not _os.path.exists(f"{idx}/_optimize_tmp")
        assert knn() == before

    def test_residual_full_probe_256_cells_equals_exact(
        self, spark, tmp_path, monkeypatch
    ):
        """The screen at the advertised 256-cell scale (ADVICE r10):
        a full probe over a 256-cell residual index exceeds
        _SCREEN_LITERAL_MAX_PROBE, so the query takes the broadcast-
        joined per-cell LUT screen (the literal 256-branch CASE's
        generated Java breaks Janino's 64 KB method limit and its
        compile alone OOMs a default-heap driver — measured on the
        vanilla gate session) and, with every cell probed and the
        overfetch covering the corpus, must reproduce exact
        brute-force kNN bit for bit.  Built through the broadcast-
        anchor path so the large-cell encode regime is under test end
        to end."""
        import data_lakehouse_movilidad_publica_santiago_spark.operators.pq as pq_mod
        from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
            build_ivfpq_index,
            ivfpq_topk,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        idx = str(tmp_path / "cells256")
        monkeypatch.setattr(pq_mod, "_ANCHOR_LITERAL_MAX_CELLS", 0)
        build_ivfpq_index(
            emb, idx, n_cells=256, residual=True, sample_cap=10_000
        )
        meta_rows = spark.read.parquet(f"{idx}/centroids").count()
        assert meta_rows == 256
        qv = [
            float(x)
            for x in emb.filter("vec_id = 0").collect()[0]["embedding"]
        ]
        got = [
            tuple(r)
            for r in ivfpq_topk(
                spark, idx, emb, qv, k=10, n_probe=256, overfetch=64
            ).collect()
        ]
        exact = [tuple(r) for r in cosine_topk(emb, qv, k=10).collect()]
        assert got == exact

    def test_joined_screen_bit_identical_to_literal_case(
        self, spark, tmp_path, monkeypatch
    ):
        """The two residual screens — literal per-cell CASE (small
        n_probe) and broadcast-joined LUT relation (large n_probe) —
        must score identically: same folded doubles, same op order,
        same ROUND.  Pinned by running the SAME query through both
        (threshold forced to 0 for the joined pass) and comparing the
        full (id, cos_sim, rank) output, plus the raw __approx scores
        of every screened row."""
        import data_lakehouse_movilidad_publica_santiago_spark.operators.pq as pq_mod
        from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
            _approx_cos_sql_residual,
            _residual_screen_joined,
            build_ivfpq_index,
            ivfpq_topk,
            load_ivfpq_meta,
            probe_cells,
        )
        from data_lakehouse_movilidad_publica_santiago_spark.operators.similarity import (
            _fold_norm,
        )
        from pyspark.sql import functions as F

        emb = TestIvfpqResidual._clustered(
            TestIvfpqResidual(), spark, n=2000, centers=8
        )
        src = tmp_path / "scr.parquet"
        emb.write.parquet(str(src))
        emb = spark.read.parquet(str(src))
        idx = str(tmp_path / "scr_idx")
        build_ivfpq_index(
            emb, idx, n_cells=8, residual=True, sample_cap=10_000
        )
        qv = [
            float(x)
            for x in emb.filter("vec_id = 3").collect()[0]["embedding"]
        ]
        lit = [
            tuple(r)
            for r in ivfpq_topk(
                spark, idx, emb, qv, k=10, n_probe=8, overfetch=16
            ).collect()
        ]
        monkeypatch.setattr(pq_mod, "_SCREEN_LITERAL_MAX_PROBE", 0)
        joined = [
            tuple(r)
            for r in ivfpq_topk(
                spark, idx, emb, qv, k=10, n_probe=8, overfetch=16
            ).collect()
        ]
        assert joined == lit

        # raw screen scores, every row, both paths
        meta, cent = load_ivfpq_meta(spark, idx)
        probe = probe_cells(cent, qv, 8)
        qnorm = _fold_norm(qv)
        codes = spark.read.parquet(f"{idx}/codes").filter(
            F.col("ivf_cell").isin(probe)
        )
        case_sql = _approx_cos_sql_residual(
            "codes", "ivf_cell", probe, meta["anchors"],
            meta["codebooks"], qv, qnorm,
        )  # fmt: skip
        s_lit = {
            r["vec_id"]: r["__approx"]
            for r in codes.select(
                "vec_id", F.expr(case_sql).alias("__approx")
            ).collect()
        }
        s_join = {
            r["vec_id"]: r["__approx"]
            for r in _residual_screen_joined(
                codes, probe, meta["anchors"], meta["codebooks"], qv,
                qnorm, "vec_id",
            ).collect()
        }
        assert s_join == s_lit and len(s_lit) == 2000

    def test_batch_topk_bit_identical_to_per_query(
        self, spark, tmp_path
    ):
        """ivfpq_topk_batch answers Q queries in ONE shared pass (one
        pruned scan of the union of probed cells, one windowed cut,
        one rescore join) and must reproduce Q separate ivfpq_topk
        calls bit for bit — on BOTH index variants, at a partial probe
        where per-query cell pruning actually differs."""
        from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
            build_ivfpq_index,
            ivfpq_topk,
            ivfpq_topk_batch,
        )

        emb = TestIvfpqResidual._clustered(
            TestIvfpqResidual(), spark, n=2000, centers=8
        )
        src = tmp_path / "bt.parquet"
        emb.write.parquet(str(src))
        emb = spark.read.parquet(str(src))
        queries = {
            int(r["vec_id"]): [float(x) for x in r["embedding"]]
            for r in emb.filter("vec_id < 4").collect()
        }
        for variant, kw in (("global", {}), ("residual", {"residual": True})):
            idx = str(tmp_path / f"bt_{variant}")
            build_ivfpq_index(
                emb, idx, n_cells=8, sample_cap=10_000, **kw
            )
            for n_probe in (3, 8):
                batch = ivfpq_topk_batch(
                    spark, idx, emb, queries, k=10, n_probe=n_probe,
                    overfetch=16,
                )  # fmt: skip
                got = {}
                for r in batch.collect():
                    got.setdefault(r["query_id"], []).append(
                        (r["rank"], r["vec_id"], r["cos_sim"])
                    )
                for qid, qv in queries.items():
                    solo = [
                        (r["rank"], r["vec_id"], r["cos_sim"])
                        for r in ivfpq_topk(
                            spark, idx, emb, qv, k=10, n_probe=n_probe,
                            overfetch=16,
                        ).collect()
                    ]  # fmt: skip
                    assert sorted(got[qid]) == sorted(solo), (
                        variant, n_probe, qid,
                    )

    def test_batch_topk_validation(self, spark, tmp_path):
        from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
            ivfpq_topk_batch,
        )

        with pytest.raises(ValueError, match="non-empty"):
            ivfpq_topk_batch(spark, str(tmp_path), None, {})

    def test_optimize_crash_recovery_vectors_dataset(
        self, spark, tmp_path, monkeypatch
    ):
        """Same injected crash, but inside the VECTORS dataset's swap
        of a store_vectors index (codes already fully compacted) — the
        asymmetric state where codes/ and vectors/ disagree on a cell
        and every file-pruned pool fetch silently drops that cell's
        rows.  Re-running the optimize must restore the vectors cell
        and the file-pruned MMR must match its pre-crash output."""
        import os as _os

        import data_lakehouse_movilidad_publica_santiago_spark.operators.pq as pq_mod
        from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
            _cell_files,
            build_ivfpq_index,
            ivfpq_add,
            ivfpq_optimize,
        )
        from data_lakehouse_movilidad_publica_santiago_spark.operators.retrieval import (
            mmr_topk_ivfpq,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        idx = str(tmp_path / "vcrash")
        build_ivfpq_index(
            emb.filter("vec_id % 3 = 0"), idx, n_cells=4,
            store_vectors=True,
        )  # fmt: skip
        for r in (1, 2):
            ivfpq_add(spark, idx, emb.filter(f"vec_id % 3 = {r}"))
        qv = [
            float(x)
            for x in emb.filter("vec_id = 0").collect()[0]["embedding"]
        ]

        def mmr():
            return [
                tuple(r)
                for r in mmr_topk_ivfpq(
                    spark, idx, qv, k=5, pool_size=600, n_probe=4
                ).collect()
            ]

        before = mmr()
        n_vec_rows = spark.read.parquet(f"{idx}/vectors").count()

        real_rename = _os.rename
        vec_calls = {"n": 0}

        def dying_rename(src, dst):
            if "/vectors/" in src or "/vectors/" in dst:
                vec_calls["n"] += 1
                if vec_calls["n"] == 2:  # inside the first cell's swap
                    raise RuntimeError("injected crash in vectors swap")
            return real_rename(src, dst)

        monkeypatch.setattr(pq_mod.os, "rename", dying_rename)
        with pytest.raises(RuntimeError, match="vectors swap"):
            ivfpq_optimize(spark, idx, max_files_per_cell=1)
        monkeypatch.undo()

        # codes fully compacted, vectors missing one live cell — the
        # silent-row-loss state
        assert len(_cell_files(f"{idx}/vectors")) == 3
        assert spark.read.parquet(f"{idx}/vectors").count() < n_vec_rows

        stats = ivfpq_optimize(spark, idx, max_files_per_cell=1)
        assert stats["recovered_cells"] == 1
        assert len(_cell_files(f"{idx}/vectors")) == 4
        assert spark.read.parquet(f"{idx}/vectors").count() == n_vec_rows
        assert mmr() == before

    def test_batch_topk_lut_budget_guard(self, spark, tmp_path):
        """The batch LUT broadcast grows Q·n_probe·m·ksub doubles —
        an unbounded batch must raise a clear ValueError (the r10
        candidates-collect hardening pattern), not OOM the driver."""
        from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
            build_ivfpq_index,
            ivfpq_topk_batch,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        idx = str(tmp_path / "budget")
        build_ivfpq_index(emb, idx, n_cells=4, residual=True)
        queries = {
            int(r["vec_id"]): [float(x) for x in r["embedding"]]
            for r in emb.filter("vec_id < 3").collect()
        }
        with pytest.raises(ValueError, match="broadcast LUT doubles"):
            ivfpq_topk_batch(
                spark, idx, emb, queries, k=5, n_probe=4,
                max_lut_doubles=100,
            )  # fmt: skip
        # at the default cap the same batch runs
        out = ivfpq_topk_batch(spark, idx, emb, queries, k=5, n_probe=4)
        assert out.count() == 15


class TestIvfpqTwoLevel:
    pytestmark = pytest.mark.slow
    """Round-12: hierarchical (two-level) coarse quantizer — the
    100-TB path for n_cells ~ √N cell counts, where flat k-means
    training (O(sample·n_cells·dim)/iter) and flat per-row assignment
    (O(n_cells·dim)) dominated the r11 4096-cell build at 854 s.
    Training and assignment become O(√n_cells·dim); leaf ids index the
    same flat centroid list so probing/screens/oracles are unchanged."""

    def test_build_query_exact_at_full_probe(self, emb, qvec, spark, tmp_path):
        from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
            build_ivfpq_index,
            ivfpq_topk,
            load_ivfpq_meta,
        )

        idx = str(tmp_path / "idx2l")
        build_ivfpq_index(
            emb, idx, n_cells=9, m=8, ksub=16, coarse="two_level",
            branch=3, residual=True,
        )  # fmt: skip
        meta, cent = load_ivfpq_meta(spark, idx)
        assert meta["coarse"] == "two_level"
        assert meta["branch_k2"] == 3
        assert meta["n_cells"] == 9 == len(cent)
        assert len(meta["l1_centroids"]) == 3
        # full probe + covering overfetch passes every row through the
        # screen to the exact rescore → must equal exact kNN
        got = [
            r["vec_id"]
            for r in ivfpq_topk(
                spark, idx, emb, qvec, k=10, n_probe=9, overfetch=64
            ).collect()
        ]
        want = [r["vec_id"] for r in cosine_topk(emb, qvec, 10).collect()]
        assert got == want

    def test_leaf_assignment_respects_hierarchy(self, emb, spark, tmp_path):
        """Every row's leaf must live under its OWN level-1 winner:
        recompute the two argmaxes driver-side from the persisted
        hierarchy and compare with the at-rest partition keys."""
        import numpy as np

        from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
            build_ivfpq_index,
            load_ivfpq_meta,
        )

        idx = str(tmp_path / "idxh")
        build_ivfpq_index(
            emb, idx, n_cells=9, m=8, ksub=16, coarse="two_level", branch=3
        )
        meta, cent = load_ivfpq_meta(spark, idx)
        l1 = np.asarray(meta["l1_centroids"])
        k2 = meta["branch_k2"]
        sub = np.asarray(cent).reshape(len(l1), k2, -1)
        at_rest = {
            r["vec_id"]: r["ivf_cell"]
            for r in spark.read.parquet(f"{idx}/codes").collect()
        }
        rows = emb.collect()
        assert len(at_rest) == len(rows)
        for r in rows:
            x = np.asarray(r["embedding"], dtype="float64")
            x = x / np.linalg.norm(x)
            top = int((x @ l1.T).argmax())
            leaf = top * k2 + int((sub[top] @ x).argmax())
            assert at_rest[r["vec_id"]] == leaf

    def test_add_reproduces_frozen_two_level_assignment(
        self, emb, spark, tmp_path
    ):
        """ivfpq_add on a two-level index must place batch rows with
        the BUILD's hierarchical rule (flat argmax would scatter them
        into different leaves — the _assign_index_cells contract)."""
        from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
            _assign_index_cells,
            build_ivfpq_index,
            ivfpq_add,
            load_ivfpq_meta,
        )

        idx = str(tmp_path / "idxadd")
        build_ivfpq_index(
            emb.filter("vec_id % 2 = 0"), idx, n_cells=9, m=8, ksub=16,
            coarse="two_level", branch=3, residual=True,
        )  # fmt: skip
        n = ivfpq_add(spark, idx, emb.filter("vec_id % 2 = 1"))
        assert n == emb.filter("vec_id % 2 = 1").count()
        meta, cent = load_ivfpq_meta(spark, idx)
        want = {
            r["vec_id"]: r["ivf_cell"]
            for r in _assign_index_cells(
                emb.filter("vec_id % 2 = 1"), meta, cent, "embedding"
            ).collect()
        }
        at_rest = {
            r["vec_id"]: r["ivf_cell"]
            for r in spark.read.parquet(f"{idx}/codes")
            .filter("vec_id % 2 = 1")
            .collect()
        }
        assert at_rest == want
        # drift stats run the same frozen hierarchical assignment
        from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
            ivfpq_drift_stats,
        )

        stats = ivfpq_drift_stats(
            spark, idx, emb.filter("vec_id % 2 = 1")
        )
        assert 0.0 <= stats["cell_tv_distance"] <= 1.0

    def test_auto_coarse_switches_at_threshold(
        self, emb, spark, tmp_path, monkeypatch
    ):
        import data_lakehouse_movilidad_publica_santiago_spark.operators.pq as pq_mod
        from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
            build_ivfpq_index,
            load_ivfpq_meta,
        )

        idx = str(tmp_path / "idxauto")
        build_ivfpq_index(emb, idx, n_cells=8, m=8, ksub=16)
        meta, _ = load_ivfpq_meta(spark, idx)
        assert meta["coarse"] == "flat" and meta["l1_centroids"] is None

        monkeypatch.setattr(pq_mod, "_TWO_LEVEL_MIN_CELLS", 4)
        idx2 = str(tmp_path / "idxauto2")
        build_ivfpq_index(emb, idx2, n_cells=8, m=8, ksub=16)
        meta2, cent2 = load_ivfpq_meta(spark, idx2)
        assert meta2["coarse"] == "two_level"
        assert len(cent2) == len(meta2["l1_centroids"]) * meta2["branch_k2"]
        with pytest.raises(ValueError, match="coarse"):
            build_ivfpq_index(
                emb, str(tmp_path / "bad"), n_cells=8, coarse="nope"
            )
