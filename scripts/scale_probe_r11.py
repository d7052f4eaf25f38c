"""Round-11 scale probes (local[32]):

  bigcells   residual IVF-PQ at n_cells=4096 on a 5M clustered corpus
             (VERDICT r10 ask #1): the coarse-cell regime where the
             pre-r11 literal anchor SQL would be ~20 MB of expression
             text — built through the round-11 broadcast-joined
             anchors path (plan size O(1) in n_cells, anchors in a
             parquet instead of inline JSON), recording build wall and
             the recall/query-wall grid.
  m16        the declared next recall lever measured (VERDICT r10 ask
             #2): the r10 residual grid rerun at m=16 (16 bytes/code)
             next to m=8 on the SAME 5M clustered corpus, with at-rest
             code bytes for the recall-per-byte trade.
  servingmix the mixed-weight serving probe (VERDICT r10 ask #7): r10
             measured FIFO > FAIR on UNIFORM small requests; this
             fires heavy analytics (business q3/q4/q8 over the gold
             constellation) CONCURRENTLY with interactive map/demand
             calls and compares FIFO vs FAIR-with-class-pools
             p50/p95 PER CLASS — the starvation scenario FAIR exists
             for.
  batchq     ivfpq_topk_batch amortization at 5M: Q=8 queries in one
             shared pass vs 8 sequential ivfpq_topk calls, results
             asserted equal.

Run:  python scripts/scale_probe_r11.py [n] [bigcells|m16|servingmix|batchq|all]
Emits one JSON line per probe; summarize into SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from pyspark.sql import functions as F  # noqa: E402

from scale_probe_r10 import _gen_clustered_vectors  # noqa: E402

from data_lakehouse_movilidad_publica_santiago_spark.session import (  # noqa: E402
    get_spark,
)


def probe(name: str, payload: dict) -> None:
    print(json.dumps({"probe": name, **payload}), flush=True)


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def _recall_grid(spark, idx, emb, queries, exact, grid, extra):
    from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
        ivfpq_topk,
    )

    for np_, of in grid:
        per_q, walls = [], []
        for qid, qv in queries.items():
            t0 = time.perf_counter()
            got = {
                r["vec_id"]
                for r in ivfpq_topk(
                    spark, idx, emb, qv, k=10, n_probe=np_, overfetch=of
                ).collect()
            }  # fmt: skip
            walls.append(time.perf_counter() - t0)
            per_q.append(len(got & exact[qid]) / 10)
        probe("ivfpq_recall_r11", {
            **extra, "n_probe": np_, "overfetch": of,
            "recall@10": round(sum(per_q) / len(per_q), 3),
            "query_sec_median": round(sorted(walls)[len(walls) // 2], 2),
        })  # fmt: skip


def _clustered_fixture(spark, work, n_vecs, n_centers=64, n_queries=8):
    from data_lakehouse_movilidad_publica_santiago_spark.operators.similarity import (
        cosine_topk,
    )

    src = str(work / "vecs.parquet")
    _gen_clustered_vectors(spark, n_vecs, src, n_centers=n_centers)
    emb = spark.read.parquet(src).persist()
    qrows = emb.filter(f"vec_id < {n_queries}").collect()
    queries = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]] for r in qrows
    }
    exact = {
        qid: {r["vec_id"] for r in cosine_topk(emb, qv, k=10).collect()}
        for qid, qv in queries.items()
    }
    return emb, queries, exact


def bigcells_probe(n_vecs: int, n_cells: int = 4096) -> None:
    """Build a residual index at a 100-TB-realistic coarse-cell count
    (n_cells ~ √N).  Pre-r11 this config would inline a ~20 MB anchor
    table into every encode expression; the probe proves the
    broadcast-anchor path builds it, moves the anchors to parquet,
    and queries it with file pruning intact."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
        build_ivfpq_index,
        load_ivfpq_meta,
    )

    spark = get_spark(
        app_name="scale-probe-r11-bigcells",
        extra_conf={"spark.network.timeout": "600s"},
    )
    work = Path(tempfile.mkdtemp(prefix="probe_r11_bigc_"))
    try:
        emb, queries, exact = _clustered_fixture(spark, work, n_vecs)
        idx = str(work / f"ivfpq_{n_cells}")
        t0 = time.perf_counter()
        build_ivfpq_index(
            emb, idx, n_cells=n_cells, m=8, ksub=16, iters=2,
            sample_cap=200_000, residual=True,
        )  # fmt: skip
        build_wall = round(time.perf_counter() - t0, 2)
        meta, _cent = load_ivfpq_meta(spark, idx)
        probe("bigcells_build", {
            "n_vecs": n_vecs, "n_cells": int(meta["n_cells"]),
            "build_sec": build_wall,
            "anchors_in_parquet": bool(meta.get("anchors_dataset")),
            "codebooks_json_bytes": os.path.getsize(
                os.path.join(idx, "codebooks.json")
            ),
            "anchors_parquet_bytes": (
                _dir_bytes(os.path.join(idx, "anchors"))
                if os.path.isdir(os.path.join(idx, "anchors"))
                else 0
            ),
            "codes_bytes": _dir_bytes(os.path.join(idx, "codes")),
        })  # fmt: skip
        _recall_grid(
            spark, idx, emb, queries, exact,
            grid=[(16, 64), (64, 64), (256, 64)],
            extra={"n_vecs": n_vecs, "n_cells": int(meta["n_cells"]),
                   "variant": "residual", "m": 8},
        )  # fmt: skip
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


def m16_probe(n_vecs: int, n_cells: int = 256) -> None:
    """m=8 vs m=16 residual indexes on the same corpus/cells: the
    recall-per-byte trade the build_ivfpq_index docstring records."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
        build_ivfpq_index,
    )

    spark = get_spark(
        app_name="scale-probe-r11-m16",
        extra_conf={"spark.network.timeout": "600s"},
    )
    work = Path(tempfile.mkdtemp(prefix="probe_r11_m16_"))
    try:
        emb, queries, exact = _clustered_fixture(spark, work, n_vecs)
        for m in (8, 16):
            idx = str(work / f"ivfpq_m{m}")
            t0 = time.perf_counter()
            build_ivfpq_index(
                emb, idx, n_cells=n_cells, m=m, ksub=16, iters=2,
                sample_cap=200_000, residual=True,
            )  # fmt: skip
            build_wall = round(time.perf_counter() - t0, 2)
            probe("m16_build", {
                "n_vecs": n_vecs, "n_cells": n_cells, "m": m,
                "build_sec": build_wall,
                "codes_bytes": _dir_bytes(os.path.join(idx, "codes")),
            })  # fmt: skip
            _recall_grid(
                spark, idx, emb, queries, exact,
                grid=[(4, 16), (4, 64), (16, 16), (16, 64)],
                extra={"n_vecs": n_vecs, "n_cells": n_cells,
                       "variant": "residual", "m": m},
            )  # fmt: skip
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


def servingmix_probe(viajes: int = 500_000) -> None:
    """4 heavy analytics requests (each = business q3+q4+q8 over the
    gold constellation — a dashboard refresh) fired alongside 28
    interactive serving calls from one thread pool.  FIFO vs FAIR with
    per-CLASS pools ("heavy" / "interactive"), per-class p50/p95 —
    the measurement r10 flagged as the real portal risk."""
    import duckdb
    from gen_scale_lake import gen_etapas, gen_subidas, gen_viajes
    from scale_probe_r10 import _serving_requests

    from data_lakehouse_movilidad_publica_santiago_spark.analytics.business import (
        register_gold_views,
        run as run_biz,
    )
    from data_lakehouse_movilidad_publica_santiago_spark.gold.runner import (
        GoldLoader,
    )
    from data_lakehouse_movilidad_publica_santiago_spark.serving import (
        SilverLake,
    )
    from data_lakehouse_movilidad_publica_santiago_spark.silver.runner import (
        run_silver,
    )
    from data_lakehouse_movilidad_publica_santiago_spark.sources.catalog import (
        discover_partitions,
    )

    work = Path(tempfile.mkdtemp(prefix="probe_r11_mix_"))
    lake_root = work / "lake"
    try:
        con = duckdb.connect()
        gen_viajes(con, lake_root, viajes)
        gen_etapas(con, lake_root, viajes * 2)
        gen_subidas(con, lake_root, viajes // 5)
        con.close()

        for mode in ("FIFO", "FAIR"):
            spark = get_spark(
                app_name=f"scale-probe-r11-mix-{mode}",
                extra_conf={"spark.scheduler.mode": mode},
            )
            if mode == "FIFO":  # build silver+gold once, first session
                parts = [
                    pp
                    for ds in ("viajes", "etapas", "subidas_30m")
                    for pp in discover_partitions(lake_root, dataset=ds)
                ]
                for p in parts:
                    run_silver(spark, p, lake_root)
                loader = GoldLoader(spark, lake_root / "gold")
                for p in parts:
                    loader.run(p, lake_root)
            register_gold_views(spark, lake_root / "gold")
            lake = SilverLake(spark, lake_root)
            interactive = _serving_requests(lake)

            def heavy():
                for q in ("q3_od_matrix", "q4_trip_complexity",
                          "q8_territorial_quartiles"):
                    run_biz(spark, q).collect()

            # warm-up: pay codegen/analysis once per request type
            heavy()
            for fn in interactive:
                fn()

            from concurrent.futures import ThreadPoolExecutor

            stream = [("heavy", heavy) for _ in range(4)] + [
                ("interactive", interactive[i % len(interactive)])
                for i in range(28)
            ]

            def timed(item):
                cls, fn = item
                if mode == "FAIR":
                    # class pools: heavies share one pool, interactive
                    # another — FAIR splits the cluster between the
                    # two classes instead of letting 4 heavies drain
                    # every slot ahead of queued map calls
                    spark.sparkContext.setLocalProperty(
                        "spark.scheduler.pool", cls
                    )
                t0 = time.perf_counter()
                fn()
                return cls, time.perf_counter() - t0

            for n_threads in (16,):
                t0 = time.perf_counter()
                with ThreadPoolExecutor(n_threads) as ex:
                    res = list(ex.map(timed, stream))
                total = round(time.perf_counter() - t0, 2)
                for cls in ("heavy", "interactive"):
                    lat = sorted(t for c, t in res if c == cls)
                    probe("servingmix", {
                        "scheduler": mode, "n_threads": n_threads,
                        "class": cls, "n_requests": len(lat),
                        "p50_sec": round(lat[len(lat) // 2], 3),
                        "p95_sec": round(lat[int(len(lat) * 0.95)], 3),
                        "max_sec": round(lat[-1], 3),
                        "total_sec": total,
                    })  # fmt: skip
            spark.stop()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    mode = sys.argv[2] if len(sys.argv) > 2 else "all"
    modes = set(mode.split(","))
    if modes & {"bigcells", "all"}:
        bigcells_probe(min(n, 5_000_000))
    if modes & {"m16", "all"}:
        m16_probe(min(n, 5_000_000))
    if modes & {"servingmix", "all"}:
        servingmix_probe()
    if modes & {"batchq", "all"}:
        batchq_probe(min(n, 5_000_000))




def batchq_probe(n_vecs: int, n_cells: int = 256, n_queries: int = 8) -> None:
    """Quantify the batch-ANN amortization at scale: Q residual-index
    queries answered by ONE ivfpq_topk_batch pass vs Q sequential
    ivfpq_topk calls, same parameters, same (m=8) index."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
        build_ivfpq_index,
        ivfpq_topk,
        ivfpq_topk_batch,
    )

    spark = get_spark(
        app_name="scale-probe-r11-batchq",
        extra_conf={"spark.network.timeout": "600s"},
    )
    work = Path(tempfile.mkdtemp(prefix="probe_r11_bq_"))
    try:
        emb, queries, _exact = _clustered_fixture(
            spark, work, n_vecs, n_queries=n_queries
        )
        idx = str(work / "ivfpq")
        build_ivfpq_index(
            emb, idx, n_cells=n_cells, m=8, ksub=16, iters=2,
            sample_cap=200_000, residual=True,
        )  # fmt: skip
        for n_probe, of in ((4, 64), (16, 64)):
            # warm both paths once (analysis/codegen), then time
            ivfpq_topk_batch(
                spark, idx, emb, queries, k=10, n_probe=n_probe,
                overfetch=of,
            ).collect()  # fmt: skip
            t0 = time.perf_counter()
            batch_rows = ivfpq_topk_batch(
                spark, idx, emb, queries, k=10, n_probe=n_probe,
                overfetch=of,
            ).collect()  # fmt: skip
            batch_wall = time.perf_counter() - t0
            solo_walls = []
            solo = {}
            for qid, qv in queries.items():
                t0 = time.perf_counter()
                solo[qid] = [
                    (r["vec_id"], r["cos_sim"], r["rank"])
                    for r in ivfpq_topk(
                        spark, idx, emb, qv, k=10, n_probe=n_probe,
                        overfetch=of,
                    ).collect()
                ]  # fmt: skip
                solo_walls.append(time.perf_counter() - t0)
            got = {}
            for r in batch_rows:
                got.setdefault(int(r["query_id"]), []).append(
                    (r["vec_id"], r["cos_sim"], r["rank"])
                )
            match = all(
                sorted(got[q]) == sorted(solo[q]) for q in queries
            )
            probe("batchq", {
                "n_vecs": n_vecs, "n_cells": n_cells,
                "n_queries": n_queries, "n_probe": n_probe,
                "overfetch": of,
                "batch_wall_sec": round(batch_wall, 2),
                "solo_total_sec": round(sum(solo_walls), 2),
                "amortization_x": round(sum(solo_walls) / batch_wall, 2),
                "results_match_solo": match,
            })  # fmt: skip
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
