"""Round-8 scale probes (local[32]):

  composed    the FULL composed corpus build at 10M docs with every
              round-6/7 batch stage on (VERDICT r7 ask #5): gopher →
              near-dedup (MinHash, guarded) → sentence dedup → soft
              dedup → span mask → ppl screen → quality model → DSIR
              (rank path) → redact → chunk/shuffle/write, with
              checkpoint_stages=True so shuffle scratch stays O(one
              stage). Reports per-stage walls + CacheManager-empty.
  pq          product-quantization ANN at 5M × dim-64 (VERDICT r7 ask
              #6): codebook training wall, at-rest codes size vs the
              float column AND vs SQ8, ADC query wall, recall vs
              exact, inline/indexed bit parity.
  mmrpool     pooled MMR vs the k-scan exact path at 5M vectors —
              the round-8 operator's scale row (equality + walls).

Corpus/vectors: the round-6/7 generators (deterministic, in-plan).

Run:  python scripts/scale_probe_r8.py [n] [composed|pq|mmrpool|all]
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
from data_lakehouse_movilidad_publica_santiago_spark.session import (  # noqa: E402
    get_spark,
)


def probe(name: str, payload: dict) -> None:
    print(json.dumps({"probe": name, **payload}), flush=True)


def composed_probe(n_docs: int) -> None:
    from data_lakehouse_movilidad_publica_santiago_spark.pipeline import (
        build_corpus,
    )

    spark = get_spark(
        app_name="scale-probe-r8",
        extra_conf={"spark.network.timeout": "600s"},
    )
    work = Path(tempfile.mkdtemp(prefix="probe_r8_"))
    try:
        src = str(work / "corpus.parquet")
        gen_wall = gen_corpus(spark, n_docs, src)
        probe("gen_corpus", {"n_docs": n_docs, "sec": gen_wall})
        summary = build_corpus(
            spark,
            src,
            str(work / "built"),
            seed="r8-probe",
            gopher=True,
            near_dedup=True,
            near_threshold=0.7,
            # load-bearing guards at this shape: 10% of docs share a
            # 16-token passage, whose banding hot buckets hold ~N/4000
            # docs each. At 5M the est-margin prune alone sufficed; at
            # 10M the hot buckets (~2.5k docs → millions of candidate
            # signature pairs per band) overflowed the box's shuffle
            # scratch (measured ENOSPC in the verify sort) — so the
            # max_bucket guard must actually BITE: 2000 drops the
            # boilerplate buckets before pairing (counts land in the
            # summary; true near-dup pairs share nearly all shingles,
            # so their other bands still find them)
            lsh_est_margin=0.25,
            lsh_max_bucket=2_000,
            sentence_dedup=True,
            soft_dedup_n=3,
            span_mask_window=8,
            ppl_threshold=99.0,
            quality_model_label="doc_id % 2 = 0",
            quality_model_min=0.4,
            dsir_target="doc_id % 10 = 3",
            dsir_top_k=max(n_docs // 10, 20_000),  # > 10k → rank path
            redact=True,
            checkpoint_stages=True,
        )
        cache_empty = (
            spark._jsparkSession.sharedState().cacheManager().isEmpty()
        )
        probe(
            "composed_build_corpus_full_r8",
            {
                "n_docs": n_docs,
                "sec": summary["total_wall_s"],
                "stage_wall_s": summary["stage_wall_s"],
                "n_docs_kept": summary["n_docs_kept"],
                "n_near_dups_removed": summary["n_near_dups_removed"],
                "n_sentences_removed": summary["n_sentences_removed"],
                "n_docs_dropped_by_soft_dedup": summary[
                    "n_docs_dropped_by_soft_dedup"
                ],
                "n_docs_emptied_by_mask": summary["n_docs_emptied_by_mask"],
                "n_docs_dropped_by_ppl": summary["n_docs_dropped_by_ppl"],
                "n_docs_dropped_by_quality_model": summary[
                    "n_docs_dropped_by_quality_model"
                ],
                "n_docs_dropped_by_dsir": summary["n_docs_dropped_by_dsir"],
                "n_chunks": summary["n_chunks"],
                "n_tokens": summary["n_tokens"],
                "lsh_hot_buckets_dropped": summary["lsh_hot_buckets_dropped"],
                "cache_manager_empty_at_exit": bool(cache_empty),
            },
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


def _gen_vectors(spark, n_vecs: int, path: str) -> float:
    """Deterministic pseudo-random dim-64 vectors (the r7 recipe)."""
    comps = []
    for w in range(16):
        h = F.md5(F.concat(F.lit(f"v{w}:"), F.col("id").cast("string")))
        for c in range(4):
            nib = F.conv(F.substring(h, 1 + 8 * c, 8), 16, 10).cast("double")
            comps.append(nib / F.lit(2147483648.0) - F.lit(1.0))
    t0 = time.perf_counter()
    spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.array(*comps).cast("array<float>").alias("embedding"),
    ).write.parquet(path)
    return round(time.perf_counter() - t0, 2)


def _dir_mb(p) -> float:
    return round(
        sum(f.stat().st_size for f in Path(p).rglob("*.parquet")) / 1e6, 1
    )


def pq_probe(n_vecs: int, dim: int = 64) -> None:
    from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
        build_pq_index,
        load_pq_index,
        pq_topk,
        pq_topk_indexed,
    )
    from data_lakehouse_movilidad_publica_santiago_spark.operators.similarity import (
        cosine_topk,
        sq8_encode,
        sq8_params,
    )

    spark = get_spark(
        app_name="scale-probe-r8-pq",
        extra_conf={"spark.network.timeout": "600s"},
    )
    work = Path(tempfile.mkdtemp(prefix="probe_r8_pq_"))
    try:
        src = str(work / "vecs.parquet")
        gen_wall = _gen_vectors(spark, n_vecs, src)
        probe("gen_vectors", {"n_vecs": n_vecs, "dim": dim, "sec": gen_wall})
        emb = spark.read.parquet(src)
        q = [float(x) for x in
             emb.filter("vec_id = 0").collect()[0]["embedding"]]  # fmt: skip

        t0 = time.perf_counter()
        exact = [(r["vec_id"], r["cos_sim"])
                 for r in cosine_topk(emb, q, k=10).collect()]  # fmt: skip
        probe("brute_cosine_topk", {
            "n_vecs": n_vecs, "sec": round(time.perf_counter() - t0, 2),
        })  # fmt: skip

        idx_dir = str(work / "pqidx")
        t0 = time.perf_counter()
        cb = build_pq_index(emb, idx_dir, m=8, ksub=16, iters=2)
        build_wall = round(time.perf_counter() - t0, 2)
        codes, cb2, _ = load_pq_index(spark, idx_dir)

        t0 = time.perf_counter()
        got_idx = [(r["vec_id"], r["cos_sim"])
                   for r in pq_topk_indexed(
                       codes, emb, q, cb2, k=10, overfetch=16
                   ).collect()]  # fmt: skip
        idx_wall = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        got_inline = [(r["vec_id"], r["cos_sim"])
                      for r in pq_topk(
                          emb, q, k=10, overfetch=16, codebooks=cb
                      ).collect()]  # fmt: skip
        inline_wall = round(time.perf_counter() - t0, 2)

        # size ladder: float32 vs SQ8 (4x class) vs PQ (32x class)
        sq8_path = str(work / "sq8codes.parquet")
        sq8_encode(emb, sq8_params(emb, dim=dim)).write.parquet(sq8_path)
        probe("pq_knn_5m", {
            "n_vecs": n_vecs, "m": 8, "ksub": 16,
            "train_encode_write_sec": build_wall,
            "query_indexed_sec": idx_wall,
            "query_inline_sec": inline_wall,
            "recall_vs_exact": round(
                len({i for i, _ in got_idx} & {i for i, _ in exact}) / 10, 2
            ),
            "indexed_equals_inline": got_idx == got_inline,
            "pq_codes_mb": _dir_mb(Path(idx_dir) / "codes"),
            "sq8_codes_mb": _dir_mb(sq8_path),
            "vectors_mb": _dir_mb(src),
        })  # fmt: skip
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


def mmrpool_probe(n_vecs: int, dim: int = 64) -> None:
    from data_lakehouse_movilidad_publica_santiago_spark.operators.retrieval import (
        mmr_topk,
        mmr_topk_pooled,
    )

    spark = get_spark(
        app_name="scale-probe-r8-mmr",
        extra_conf={"spark.network.timeout": "600s"},
    )
    work = Path(tempfile.mkdtemp(prefix="probe_r8_mmr_"))
    try:
        src = str(work / "vecs.parquet")
        _gen_vectors(spark, n_vecs, src)
        emb = spark.read.parquet(src)
        q = [float(x) for x in
             emb.filter("vec_id = 0").collect()[0]["embedding"]]  # fmt: skip
        t0 = time.perf_counter()
        exact = [tuple(r) for r in mmr_topk(emb, q, k=5, lam=0.7).collect()]
        exact_wall = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        pooled_df, cert = mmr_topk_pooled(
            emb, q, k=5, lam=0.7, pool_size=20_000, return_certificate=True
        )
        pooled = [tuple(r) for r in pooled_df.collect()]
        pooled_wall = round(time.perf_counter() - t0, 2)
        probe("mmr_pooled_vs_exact_5m", {
            "n_vecs": n_vecs, "k": 5, "pool": 20_000,
            "exact_sec": exact_wall, "pooled_sec": pooled_wall,
            "equal": pooled == exact, "certificate": bool(cert),
        })  # fmt: skip
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    mode = sys.argv[2] if len(sys.argv) > 2 else "all"
    modes = set(mode.split(","))
    if modes & {"composed", "all"}:
        composed_probe(n)
    if modes & {"pq", "all"}:
        pq_probe(min(n, 5_000_000))
    if modes & {"mmrpool", "all"}:
        mmrpool_probe(min(n, 5_000_000))


if __name__ == "__main__":
    main()
