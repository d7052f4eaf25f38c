"""Round-9 scale probes (local[32]):

  mmrivfpq   the composed 100 TB retrieval stack (VERDICT r8 ask #5):
             cell-pruned IVF-PQ ADC screen → relevance pool → driver
             greedy MMR, at 5M × dim-64 — measured against
             pooled-over-full-scan, pooled-over-candidates, and the
             k-scan exact path, with
             selection equality + certificate outcomes.
  zipf       ungrouped zipf_spectrum (VERDICT r8 ask #1 / weak flag):
             the new TakeOrdered-cut global path at 5M docs (vocab
             ~120M rows), plus old-vs-new at 1M docs where the OLD
             vocabulary-wide single-partition rank window is still
             runnable enough to time.
  pqiters    recall@10 vs training iterations (VERDICT r8 ask #3):
             production-mode pq_train (oracle_parity=False) at
             iters 2/5/10/20 on 5M uniform-random vectors (the
             adversarial recall floor), fixed overfetch ladder.

Run:  python scripts/scale_probe_r9.py [n] [mmrivfpq|zipf|pqiters|ivfpqadd|all]
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

from scale_probe_r6 import gen_corpus  # noqa: E402
from scale_probe_r8 import _gen_vectors  # noqa: E402

from data_lakehouse_movilidad_publica_santiago_spark.session import (  # noqa: E402
    get_spark,
)


def probe(name: str, payload: dict) -> None:
    print(json.dumps({"probe": name, **payload}), flush=True)


def mmrivfpq_probe(n_vecs: int, dim: int = 64) -> None:
    from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
        build_ivfpq_index,
        ivfpq_topk,
    )
    from data_lakehouse_movilidad_publica_santiago_spark.operators.retrieval import (
        mmr_topk,
        mmr_topk_ivfpq,
        mmr_topk_pooled,
    )

    spark = get_spark(
        app_name="scale-probe-r9-mmrivfpq",
        extra_conf={"spark.network.timeout": "600s"},
    )
    work = Path(tempfile.mkdtemp(prefix="probe_r9_mmr_"))
    try:
        src = str(work / "vecs.parquet")
        _gen_vectors(spark, n_vecs, src)
        emb = spark.read.parquet(src).persist()
        emb.count()  # materialize so the build isn't charged the gen IO
        q = [float(x) for x in
             emb.filter("vec_id = 0").collect()[0]["embedding"]]  # fmt: skip
        k, lam, pool = 5, 0.7, 20_000

        idx = str(work / "ivfpq")
        t0 = time.perf_counter()
        build_ivfpq_index(
            emb, idx, n_cells=16, m=8, ksub=16, iters=2,
            store_vectors=True,
        )  # fmt: skip
        build_wall = round(time.perf_counter() - t0, 2)
        emb.unpersist()  # queries measure the at-rest/cold-cache shape

        # exact counterpoint (k corpus scans)
        t0 = time.perf_counter()
        exact = [tuple(r) for r in mmr_topk(emb, q, k=k, lam=lam).collect()]
        exact_wall = round(time.perf_counter() - t0, 2)

        # pooled over FULL float scan (the r8 shape)
        t0 = time.perf_counter()
        full_df, full_cert = mmr_topk_pooled(
            emb, q, k=k, lam=lam, pool_size=pool, return_certificate=True
        )
        full = [tuple(r) for r in full_df.collect()]
        full_wall = round(time.perf_counter() - t0, 2)

        # pooled over an IVF-PQ candidates prefetch (the generic
        # composition: candidate ids materialized once, fused
        # broadcast-id pool fetch — still scans the source floats)
        t0 = time.perf_counter()
        cands = ivfpq_topk(
            spark, idx, emb, q, k=pool, n_probe=4, overfetch=4
        ).select("vec_id")
        cand_df, cand_cert = mmr_topk_pooled(
            emb, q, k=k, lam=lam, pool_size=pool,
            return_certificate=True, candidates=cands,
        )  # fmt: skip
        cand_sel = [tuple(r) for r in cand_df.collect()]
        cand_wall = round(time.perf_counter() - t0, 2)

        # the fully FILE-PRUNED composed stack (round 9): ADC screen
        # over n_probe/16 of the ~46x-smaller code files + pool fetch
        # from the cell-partitioned vectors/ — the source float corpus
        # is never scanned
        t0 = time.perf_counter()
        ivf_df, ivf_cert = mmr_topk_ivfpq(
            spark, idx, q, k=k, lam=lam, pool_size=pool,
            n_probe=4, overfetch=4, return_certificate=True,
        )  # fmt: skip
        ivf = [tuple(r) for r in ivf_df.collect()]
        ivf_wall = round(time.perf_counter() - t0, 2)

        probe("mmr_over_ivfpq_5m", {
            "n_vecs": n_vecs, "k": k, "pool": pool,
            "n_cells": 16, "n_probe": 4,
            "index_build_sec": build_wall,
            "exact_sec": exact_wall,
            "pooled_fullscan_sec": full_wall,
            "pooled_candidates_sec": cand_wall,
            "mmr_ivfpq_sec": ivf_wall,
            "fullscan_equals_exact": full == exact,
            "candidates_equals_exact": cand_sel == exact,
            "ivfpq_equals_exact": ivf == exact,
            "certificate_fullscan": bool(full_cert),
            "certificate_candidates": bool(cand_cert),
            "certificate_ivfpq": bool(ivf_cert),
        })  # fmt: skip
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


def zipf_probe(n_docs: int, old_path_docs: int = 1_000_000) -> None:
    from pyspark.sql import Window

    from data_lakehouse_movilidad_publica_santiago_spark.operators.corpus_stats import (
        zipf_spectrum,
    )

    spark = get_spark(
        app_name="scale-probe-r9-zipf",
        extra_conf={"spark.network.timeout": "600s"},
    )
    work = Path(tempfile.mkdtemp(prefix="probe_r9_zipf_"))
    try:
        src = str(work / "corpus.parquet")
        gen_corpus(spark, n_docs, src)
        docs = spark.read.parquet(src)

        t0 = time.perf_counter()
        row = zipf_spectrum(docs, group_col=None, top_r=100).collect()[0]
        new_wall = round(time.perf_counter() - t0, 2)
        probe("zipf_ungrouped_new", {
            "n_docs": n_docs, "vocab": int(row["vocab"]),
            "n_tokens": int(row["n_tokens"]), "sec": new_wall,
            "slope": row["zipf_slope"],
        })  # fmt: skip

        # the pre-round-9 shape, emulated inline: rank window with an
        # EMPTY partition spec — the whole vocabulary sorts through one
        # partition (InferWindowGroupLimit does not fire).  Timed
        # APPLES-TO-APPLES: both sides run freq → top-100 cut → count
        # on the same corpus (neither pays totals/fit), old at a
        # smaller n where the single-partition sort still completes.
        if old_path_docs:
            src_small = str(work / "corpus_small.parquet")
            if old_path_docs != n_docs:
                gen_corpus(spark, old_path_docs, src_small)
            else:
                src_small = src
            small = spark.read.parquet(src_small)
            freq = (
                small.select(
                    F.explode(F.split(F.col("text"), " ")).alias("token")
                )
                .filter(F.col("token") != "")
                .groupBy("token")
                .agg(F.count("*").alias("freq"))
            )
            order = [F.desc("freq"), F.asc("token")]
            t0 = time.perf_counter()
            (
                freq.orderBy(*order)
                .limit(100)
                .groupBy()
                .agg(F.count("*").alias("n"))
                .collect()
            )
            new_small = round(time.perf_counter() - t0, 2)
            w = Window.partitionBy().orderBy(*order)
            t0 = time.perf_counter()
            (
                freq.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= 100)
                .groupBy()
                .agg(F.count("*").alias("n"))
                .collect()
            )
            old_small = round(time.perf_counter() - t0, 2)
            # time the SHIPPED operator too (not just the inline
            # emulation of its cut) so the probe regresses if
            # zipf_spectrum(group_col=None) ever falls back to a
            # global window — the plan-pin test covers shape only
            t0 = time.perf_counter()
            zipf_spectrum(small, group_col=None, top_r=100).collect()
            op_small = round(time.perf_counter() - t0, 2)
            probe("zipf_ungrouped_old_vs_new", {
                "n_docs": old_path_docs,
                "old_global_window_cut_sec": old_small,
                "new_takeordered_cut_sec": new_small,
                "shipped_operator_sec": op_small,
            })  # fmt: skip
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


def pqiters_probe(n_vecs: int, dim: int = 64) -> None:
    from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
        pq_reconstruction_mse,
        pq_topk,
        pq_train,
    )
    from data_lakehouse_movilidad_publica_santiago_spark.operators.similarity import (
        cosine_topk,
    )

    spark = get_spark(
        app_name="scale-probe-r9-pqiters",
        extra_conf={"spark.network.timeout": "600s"},
    )
    work = Path(tempfile.mkdtemp(prefix="probe_r9_pqit_"))
    n_queries = 8  # recall@10 on ONE query has 0.1 granularity — pure
    # noise for an iters curve; average over several query vectors
    try:
        src = str(work / "vecs.parquet")
        _gen_vectors(spark, n_vecs, src)
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
            probe("pq_recall_vs_iters", {
                "n_vecs": n_vecs, "iters": iters, "n_queries": n_queries,
                "train_sec": train_wall,
                "reconstruction_mse": round(mse, 6), **recalls,
            })  # fmt: skip
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


def ivfpqadd_probe(n_vecs: int, dim: int = 64) -> None:
    """Index-maintenance cost at scale: build on 80% of the corpus,
    append the remaining 20% with ivfpq_add (frozen quantizers,
    map-only encode, per-cell parquet append) — the wall to compare
    against a full rebuild — then spot-check that the grown index
    still recalls across built+added vectors."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
        build_ivfpq_index,
        ivfpq_add,
        ivfpq_topk,
    )
    from data_lakehouse_movilidad_publica_santiago_spark.operators.similarity import (
        cosine_topk,
    )

    spark = get_spark(
        app_name="scale-probe-r9-ivfpqadd",
        extra_conf={"spark.network.timeout": "600s"},
    )
    work = Path(tempfile.mkdtemp(prefix="probe_r9_add_"))
    try:
        src_p = str(work / "vecs.parquet")
        _gen_vectors(spark, n_vecs, src_p)
        emb = spark.read.parquet(src_p)
        cut = int(n_vecs * 0.8)
        base = emb.filter(F.col("vec_id") < cut).persist()
        batch = emb.filter(F.col("vec_id") >= cut)
        base.count()

        idx = str(work / "ivfpq")
        t0 = time.perf_counter()
        build_ivfpq_index(
            base, idx, n_cells=16, m=8, ksub=16, iters=2,
            store_vectors=True,
        )  # fmt: skip
        build_wall = round(time.perf_counter() - t0, 2)
        base.unpersist()

        t0 = time.perf_counter()
        n_added = ivfpq_add(spark, idx, batch)
        add_wall = round(time.perf_counter() - t0, 2)

        # recall spot-check averaged over 8 queries (4 from the built
        # corpus, 4 from the added batch) — single-query recall@10 has
        # 0.1 granularity and is pure noise
        qids = [0, 1, 2, 3, cut, cut + 1, cut + 2, cut + 3]
        qrows = emb.filter(F.col("vec_id").isin(qids)).collect()
        queries = {
            int(r["vec_id"]): [float(x) for x in r["embedding"]]
            for r in qrows
        }
        overlaps = {}
        for np_ in (4, 8):
            per_q = []
            for qid in qids:
                qv = queries[qid]
                exact = {
                    r["vec_id"]
                    for r in cosine_topk(emb, qv, k=10).collect()
                }
                got = {
                    r["vec_id"]
                    for r in ivfpq_topk(
                        spark, idx, emb, qv, k=10,
                        n_probe=np_, overfetch=16,
                    ).collect()
                }  # fmt: skip
                per_q.append(len(got & exact) / 10)
            overlaps[f"recall@10_np{np_}"] = round(
                sum(per_q) / len(per_q), 3
            )
        probe("ivfpq_add_5m", {
            "n_built": cut, "n_added": n_added,
            "build_sec": build_wall, "add_sec": add_wall,
            "add_rows_per_sec": round(n_added / add_wall),
            "n_queries": len(qids),
            **overlaps,
        })  # fmt: skip
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


def mmrladder_probe(n_vecs: int, dim: int = 64) -> None:
    """Equality ladder for the file-pruned composed stack on the
    adversarial uniform corpus: at what n_probe does mmr_topk_ivfpq
    reproduce the exact full-corpus greedy?  (The gate corpus matches
    at 4 of 8 cells; uniform-random scatters true neighbors across
    cells, so this measures the knob's convergence, not typical
    behavior.)"""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
        build_ivfpq_index,
    )
    from data_lakehouse_movilidad_publica_santiago_spark.operators.retrieval import (
        mmr_topk,
        mmr_topk_ivfpq,
    )

    spark = get_spark(
        app_name="scale-probe-r9-mmrladder",
        extra_conf={"spark.network.timeout": "600s"},
    )
    work = Path(tempfile.mkdtemp(prefix="probe_r9_lad_"))
    try:
        src_p = str(work / "vecs.parquet")
        _gen_vectors(spark, n_vecs, src_p)
        emb = spark.read.parquet(src_p).persist()
        emb.count()
        q = [float(x) for x in
             emb.filter("vec_id = 0").collect()[0]["embedding"]]  # fmt: skip
        idx = str(work / "ivfpq")
        build_ivfpq_index(
            emb, idx, n_cells=16, m=8, ksub=16, iters=2,
            store_vectors=True,
        )  # fmt: skip
        emb.unpersist()
        k, lam, pool = 5, 0.7, 20_000
        exact = [tuple(r) for r in mmr_topk(emb, q, k=k, lam=lam).collect()]
        for np_ in (4, 8, 16):
            t0 = time.perf_counter()
            got_df, cert = mmr_topk_ivfpq(
                spark, idx, q, k=k, lam=lam, pool_size=pool,
                n_probe=np_, overfetch=4, return_certificate=True,
            )  # fmt: skip
            got = [tuple(r) for r in got_df.collect()]
            wall = round(time.perf_counter() - t0, 2)
            probe("mmr_ivfpq_ladder", {
                "n_vecs": n_vecs, "n_probe": np_, "sec": wall,
                "equals_exact": got == exact,
                "certificate": bool(cert),
            })  # fmt: skip
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    mode = sys.argv[2] if len(sys.argv) > 2 else "all"
    modes = set(mode.split(","))
    if modes & {"mmrivfpq", "all"}:
        mmrivfpq_probe(min(n, 5_000_000))
    if modes & {"zipf", "all"}:
        zipf_probe(n)
    if modes & {"pqiters", "all"}:
        pqiters_probe(min(n, 5_000_000))
    if modes & {"ivfpqadd", "all"}:
        ivfpqadd_probe(min(n, 5_000_000))
    if modes & {"mmrladder"}:
        mmrladder_probe(min(n, 5_000_000))


if __name__ == "__main__":
    main()
