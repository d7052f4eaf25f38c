"""Round-10 scale probes (local[32]):

  pqcluster  the missing half of the r9 PQ training curve (VERDICT r9
             ask #1): recall@10 vs Lloyd iterations at 5M on a
             CLUSTERED corpus (mixture of 64 deterministic centers +
             bounded per-dim noise) next to r9's uniform-floor curve,
             so the "iterations pay off on clustered data" docstring
             claim is measured, not asserted.
  lifecycle  ivfpq_add file accretion + compaction + drift trajectory
             (VERDICT r9 ask #2): build 1M, 20 successive 50k adds
             with a progressively shifted distribution, tracking
             per-batch ivfpq_drift_stats, codes/ file growth, then
             query walls before/after ivfpq_optimize.
  serving    N-way concurrent query_service latency (VERDICT r9 ask
             #5): p50/p95 of a mixed request stream at 16/32 threads
             under FIFO vs FAIR scheduler pools on the same silver
             lake, to decide session.py's scheduler default.

Run:  python scripts/scale_probe_r10.py [n] [pqcluster|lifecycle|serving|all]
Emits one JSON line per probe; summarize into SCALE.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from pyspark.sql import functions as F  # noqa: E402

from scale_probe_r8 import _gen_vectors  # noqa: E402

from data_lakehouse_movilidad_publica_santiago_spark.session import (  # noqa: E402
    get_spark,
)


def probe(name: str, payload: dict) -> None:
    print(json.dumps({"probe": name, **payload}), flush=True)


def _gen_clustered_vectors(
    spark, n_vecs: int, path: str, n_centers: int = 64, noise: float = 0.2
) -> None:
    """Deterministic mixture-of-centers dim-64 corpus: vector i
    belongs to center i % n_centers; each component is the center's
    hash-derived value in [-1,1] plus ``noise``-scaled per-row jitter.
    Same md5 recipe as the uniform generator so only the STRUCTURE
    differs from the r9 floor corpus."""
    comps = []
    for w in range(16):
        hc = F.md5(
            F.concat(
                F.lit(f"ctr{w}:"),
                (F.col("id") % n_centers).cast("string"),
            )
        )
        hn = F.md5(F.concat(F.lit(f"v{w}:"), F.col("id").cast("string")))
        for c in range(4):
            ctr = (
                F.conv(F.substring(hc, 1 + 8 * c, 8), 16, 10).cast("double")
                / F.lit(2147483648.0)
                - F.lit(1.0)
            )
            jit = (
                F.conv(F.substring(hn, 1 + 8 * c, 8), 16, 10).cast("double")
                / F.lit(2147483648.0)
                - F.lit(1.0)
            )
            comps.append(ctr + jit * F.lit(noise))
    spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.array(*comps).cast("array<float>").alias("embedding"),
    ).write.mode("overwrite").parquet(path)


def pqcluster_probe(n_vecs: int, dim: int = 64, n_centers: int = 64) -> None:
    """Two cluster-count regimes: n_centers=64 > ksub=16 (codewords
    CANNOT separate the centers — 64 centers project onto each
    subspace, only 16 codewords available) and n_centers=16 = ksub
    (converged Lloyd CAN place one codeword per projected center — the
    regime where training is supposed to pay off)."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
        pq_reconstruction_mse,
        pq_topk,
        pq_train,
    )
    from data_lakehouse_movilidad_publica_santiago_spark.operators.similarity import (
        cosine_topk,
    )

    spark = get_spark(
        app_name="scale-probe-r10-pqcluster",
        extra_conf={"spark.network.timeout": "600s"},
    )
    work = Path(tempfile.mkdtemp(prefix="probe_r10_pqc_"))
    n_queries = 8  # 8 query vectors = 8 distinct clusters (i % 64)
    try:
        src = str(work / "vecs.parquet")
        _gen_clustered_vectors(spark, n_vecs, src, n_centers=n_centers)
        emb = spark.read.parquet(src).persist()
        qrows = emb.filter(f"vec_id < {n_queries}").collect()
        queries = {
            int(r["vec_id"]): [float(x) for x in r["embedding"]]
            for r in qrows
        }
        exact = {
            qid: {r["vec_id"] for r in cosine_topk(emb, qv, k=10).collect()}
            for qid, qv in queries.items()
        }

        for iters in (2, 5, 10, 20):
            t0 = time.perf_counter()
            cb = pq_train(
                emb, m=8, ksub=16, iters=iters, oracle_parity=False
            )
            train_wall = round(time.perf_counter() - t0, 2)
            mse = pq_reconstruction_mse(emb, cb)
            recalls = {}
            for of in (4, 16):
                per_q = []
                for qid, qv in queries.items():
                    got = {
                        r["vec_id"]
                        for r in pq_topk(
                            emb, qv, k=10, overfetch=of, codebooks=cb
                        ).collect()
                    }
                    per_q.append(len(got & exact[qid]) / 10)
                recalls[f"recall@10_of{of}"] = round(
                    sum(per_q) / len(per_q), 3
                )
            probe("pq_recall_vs_iters_clustered", {
                "n_vecs": n_vecs, "n_centers": n_centers, "noise": 0.2,
                "iters": iters, "n_queries": n_queries,
                "train_sec": train_wall,
                "reconstruction_mse": round(mse, 6), **recalls,
            })  # fmt: skip
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


def pqclusterivf_probe(
    n_vecs: int, dim: int = 64, n_centers: int = 64
) -> None:
    """The composed counterpoint to pqcluster: on the SAME clustered
    corpus where the flat global-codebook PQ screen collapses to 0.1
    (within-cluster code ties — every true neighbor is within-cluster
    and unrankable), measure GLOBAL vs RESIDUAL IVF-PQ with cells
    sized to the cluster structure, across an n_probe × overfetch
    grid.  The residual variant's per-vector codes are the designed
    fix; this is the recall money table for SCALE.md r10."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
        build_ivfpq_index,
        ivfpq_topk,
    )
    from data_lakehouse_movilidad_publica_santiago_spark.operators.similarity import (
        cosine_topk,
    )

    spark = get_spark(
        app_name="scale-probe-r10-pqclusterivf",
        extra_conf={"spark.network.timeout": "600s"},
    )
    work = Path(tempfile.mkdtemp(prefix="probe_r10_pqcivf_"))
    n_queries = 8
    try:
        src = str(work / "vecs.parquet")
        _gen_clustered_vectors(spark, n_vecs, src, n_centers=n_centers)
        emb = spark.read.parquet(src).persist()
        qrows = emb.filter(f"vec_id < {n_queries}").collect()
        queries = {
            int(r["vec_id"]): [float(x) for x in r["embedding"]]
            for r in qrows
        }
        exact = {
            qid: {r["vec_id"] for r in cosine_topk(emb, qv, k=10).collect()}
            for qid, qv in queries.items()
        }
        for variant, kw in (
            ("global", {}),
            ("residual", {"residual": True}),
        ):
            idx = str(work / f"ivfpq_{variant}")
            t0 = time.perf_counter()
            build_ivfpq_index(
                emb, idx, n_cells=n_centers, m=8, ksub=16, iters=2,
                sample_cap=200_000, **kw,
            )  # fmt: skip
            build_wall = round(time.perf_counter() - t0, 2)
            for np_ in (1, 4):
                for of in (16, 64):
                    per_q, walls = [], []
                    for qid, qv in queries.items():
                        t0 = time.perf_counter()
                        got = {
                            r["vec_id"]
                            for r in ivfpq_topk(
                                spark, idx, emb, qv, k=10,
                                n_probe=np_, overfetch=of,
                            ).collect()
                        }  # fmt: skip
                        walls.append(time.perf_counter() - t0)
                        per_q.append(len(got & exact[qid]) / 10)
                    probe("ivfpq_recall_clustered", {
                        "n_vecs": n_vecs, "n_centers": n_centers,
                        "n_cells": n_centers, "variant": variant,
                        "n_probe": np_, "overfetch": of,
                        "build_sec": build_wall,
                        "recall@10": round(sum(per_q) / len(per_q), 3),
                        "query_sec_median": round(
                            sorted(walls)[len(walls) // 2], 2
                        ),
                    })  # fmt: skip
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


def _shifted_batch(spark, n: int, start_id: int, alpha: float):
    """50k-style add batch: uniform base progressively pulled toward a
    fixed direction (first 16 dims offset by 1.5*alpha) — models a
    data-distribution shift the frozen quantizers were never trained
    on.  alpha=0 reproduces the build distribution."""
    comps = []
    for w in range(16):
        h = F.md5(F.concat(F.lit(f"v{w}:"), F.col("id").cast("string")))
        for c in range(4):
            nib = F.conv(F.substring(h, 1 + 8 * c, 8), 16, 10).cast("double")
            val = nib / F.lit(2147483648.0) - F.lit(1.0)
            if w < 4:  # first 16 dims carry the shift
                val = val + F.lit(1.5 * alpha)
            comps.append(val)
    return spark.range(start_id, start_id + n).select(
        F.col("id").alias("vec_id"),
        F.array(*comps).cast("array<float>").alias("embedding"),
    )


def lifecycle_probe(n_base: int, batch_rows: int = 50_000) -> None:
    from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
        _cell_files,
        build_ivfpq_index,
        ivfpq_add,
        ivfpq_drift_stats,
        ivfpq_optimize,
        ivfpq_topk,
    )
    from data_lakehouse_movilidad_publica_santiago_spark.operators.retrieval import (
        mmr_topk_ivfpq,
    )

    spark = get_spark(
        app_name="scale-probe-r10-lifecycle",
        extra_conf={"spark.network.timeout": "600s"},
    )
    work = Path(tempfile.mkdtemp(prefix="probe_r10_life_"))
    n_batches = 20
    try:
        src = str(work / "base.parquet")
        _gen_vectors(spark, n_base, src)
        base = spark.read.parquet(src)
        idx = str(work / "ivfpq")
        t0 = time.perf_counter()
        build_ivfpq_index(
            base, idx, n_cells=16, m=8, ksub=16, iters=2,
            store_vectors=True,
        )  # fmt: skip
        build_wall = round(time.perf_counter() - t0, 2)

        batches_dir = str(work / "batches.parquet")
        trajectory = []
        add_walls = []
        for t in range(n_batches):
            alpha = t / (n_batches - 1)  # 0 → 1 over the 20 batches
            batch = _shifted_batch(
                spark, batch_rows, n_base + t * batch_rows, alpha
            )
            batch.write.mode("append").parquet(batches_dir)
            stored = spark.read.parquet(batches_dir).filter(
                (F.col("vec_id") >= n_base + t * batch_rows)
                & (F.col("vec_id") < n_base + (t + 1) * batch_rows)
            )
            drift = ivfpq_drift_stats(spark, idx, stored)
            ta = time.perf_counter()
            ivfpq_add(spark, idx, stored)
            add_walls.append(round(time.perf_counter() - ta, 2))
            n_files = sum(
                len(fs) for fs in _cell_files(f"{idx}/codes").values()
            )
            trajectory.append({
                "batch": t, "alpha": round(alpha, 2),
                "cell_tv_distance": drift["cell_tv_distance"],
                "mse_ratio": drift["mse_ratio"],
                "hottest_cell_share": drift["batch_hottest_cell_share"],
                "codes_files": n_files,
            })  # fmt: skip

        full = spark.read.parquet(src, batches_dir)
        q = [
            float(x)
            for x in full.filter("vec_id = 0").collect()[0]["embedding"]
        ]

        def _walls():
            knn, mmr = [], []
            for _ in range(3):
                t1 = time.perf_counter()
                ivfpq_topk(
                    spark, idx, full, q, k=10, n_probe=4, overfetch=16
                ).collect()
                knn.append(time.perf_counter() - t1)
                t1 = time.perf_counter()
                mmr_topk_ivfpq(
                    spark, idx, q, k=5, pool_size=20_000, n_probe=4
                ).collect()
                mmr.append(time.perf_counter() - t1)
            return (
                round(sorted(knn)[1], 2), round(sorted(mmr)[1], 2)
            )

        knn_before, mmr_before = _walls()
        files_before = sum(
            len(fs) for fs in _cell_files(f"{idx}/codes").values()
        ) + sum(len(fs) for fs in _cell_files(f"{idx}/vectors").values())
        t0 = time.perf_counter()
        opt_stats = ivfpq_optimize(spark, idx, max_files_per_cell=2)
        opt_wall = round(time.perf_counter() - t0, 2)
        files_after = sum(
            len(fs) for fs in _cell_files(f"{idx}/codes").values()
        ) + sum(len(fs) for fs in _cell_files(f"{idx}/vectors").values())
        knn_after, mmr_after = _walls()

        probe("ivfpq_lifecycle", {
            "n_base": n_base, "n_batches": n_batches,
            "batch_rows": batch_rows, "build_sec": build_wall,
            "add_sec_min": min(add_walls), "add_sec_max": max(add_walls),
            "drift_trajectory": trajectory,
            "total_files_before": files_before,
            "total_files_after": files_after,
            "optimize_sec": opt_wall, "optimize_stats": opt_stats,
            "ivfpq_knn_sec_before": knn_before,
            "ivfpq_knn_sec_after": knn_after,
            "mmr_ivfpq_sec_before": mmr_before,
            "mmr_ivfpq_sec_after": mmr_after,
        })  # fmt: skip
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


def _serving_requests(lake):
    """A mixed request stream over the serving API (the portal's
    query types with varied filters)."""
    from data_lakehouse_movilidad_publica_santiago_spark.serving import (
        QueryFilters,
        query_demand_by_day_type,
        query_demand_by_mode,
        query_overview,
        query_top_boardings,
    )

    reqs = []
    for hour in (None, 6, 9, 15):
        f = QueryFilters(hour_from=hour)
        reqs.extend([
            lambda f=f: query_overview(lake, f),
            lambda f=f: query_demand_by_day_type(lake, f),
            lambda f=f: query_demand_by_mode(lake, f),
            lambda f=f: query_top_boardings(lake, f),
        ])  # fmt: skip
    return reqs


def serving_probe(viajes: int = 500_000) -> None:
    import duckdb
    from gen_scale_lake import gen_etapas, gen_subidas, gen_viajes

    from data_lakehouse_movilidad_publica_santiago_spark.serving import (
        SilverLake,
    )
    from data_lakehouse_movilidad_publica_santiago_spark.silver.runner import (
        run_silver,
    )
    from data_lakehouse_movilidad_publica_santiago_spark.sources.catalog import (
        discover_partitions,
    )

    work = Path(tempfile.mkdtemp(prefix="probe_r10_serv_"))
    lake_root = work / "lake"
    try:
        con = duckdb.connect()
        gen_viajes(con, lake_root, viajes)
        gen_etapas(con, lake_root, viajes * 2)
        gen_subidas(con, lake_root, viajes // 5)
        con.close()

        for mode in ("FIFO", "FAIR"):
            spark = get_spark(
                app_name=f"scale-probe-r10-serving-{mode}",
                extra_conf={"spark.scheduler.mode": mode},
            )
            if mode == "FIFO":  # silver build once, on the first session
                for p in [
                    pp
                    for ds in ("viajes", "etapas", "subidas_30m")
                    for pp in discover_partitions(lake_root, dataset=ds)
                ]:
                    run_silver(spark, p, lake_root)
            lake = SilverLake(spark, lake_root)
            reqs = _serving_requests(lake)
            for fn in reqs:  # warm-up: pay codegen/analysis once
                fn()
            from concurrent.futures import ThreadPoolExecutor

            for n_threads in (16, 32):
                stream = [
                    (i, reqs[i % len(reqs)]) for i in range(64)
                ]
                lat: list[float] = []

                def timed(item):
                    i, fn = item
                    # FAIR shares the cluster BETWEEN pools; jobs
                    # inside one pool still run FIFO — so each
                    # concurrent request stream gets its own pool
                    # (created on demand, weight 1), the per-request
                    # isolation a serving tier wants
                    if mode == "FAIR":
                        spark.sparkContext.setLocalProperty(
                            "spark.scheduler.pool", f"req{i % n_threads}"
                        )
                    t0 = time.perf_counter()
                    fn()
                    return time.perf_counter() - t0

                t0 = time.perf_counter()
                with ThreadPoolExecutor(n_threads) as ex:
                    lat = list(ex.map(timed, stream))
                total = round(time.perf_counter() - t0, 2)
                lat.sort()
                probe("serving_concurrency", {
                    "scheduler": mode, "n_threads": n_threads,
                    "n_requests": len(stream),
                    "p50_sec": round(lat[len(lat) // 2], 3),
                    "p95_sec": round(lat[int(len(lat) * 0.95)], 3),
                    "max_sec": round(lat[-1], 3),
                    "total_sec": total,
                    "req_per_sec": round(len(stream) / total, 1),
                })  # fmt: skip
            spark.stop()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    mode = sys.argv[2] if len(sys.argv) > 2 else "all"
    modes = set(mode.split(","))
    if modes & {"pqcluster", "all"}:
        pqcluster_probe(min(n, 5_000_000), n_centers=64)
        pqcluster_probe(min(n, 5_000_000), n_centers=16)
    if modes & {"pqclusterivf"}:
        pqclusterivf_probe(min(n, 5_000_000))
    if modes & {"lifecycle", "all"}:
        lifecycle_probe(min(n, 1_000_000))
    if modes & {"serving", "all"}:
        serving_probe()


if __name__ == "__main__":
    main()
