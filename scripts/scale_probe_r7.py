"""Round-7 scale probes (local[32]) for the operators added in rounds
6-7 that have no SCALE.md row yet:

  bpe         BPE vocabulary training + corpus encode (the r6 script
              has the same mode; kept here so round-7 probes are one
              entry point)
  sentence    C4 global sentence dedup — corpus-wide sentence-hash
              shuffle + keep-first + per-doc reassembly
  softdedup   SoftDeDup reweighting — (gram, count) shuffle + gram
              re-join + per-doc combine
  trigram     stupid-backoff trigram scoring — LM count tables over
              the English slice + five LEFT equi-joins over one gram
              explode
  tfidf       TF-IDF cosine top-k — corpus idf relation + per-doc
              norms + TakeOrdered
  containment shared-shingle self-join with the max_df hot-shingle
              guard — the shape most at risk of hot-key candidate
              explosion (10% of docs carry a shared passage, exactly
              the r6 composed-probe trap)
  novelty     cross-corpus n-gram novelty — candidate shingles probed
              against a DISTINCT at-rest vocabulary
  doremi      DoReMi-lite — one (domain, word) shuffle + K-row update

Corpus: the round-6 generator (~50 words/doc, 5% planted near-dups,
10% carry a shared 16-token passage). ``containment`` additionally
plants every doc_id % 25 == 7 as a PREFIX-SUBSET of its neighbor
(wholly contained, Jaccard well below any symmetric threshold).

Run:  python scripts/scale_probe_r7.py [n_docs] [mode[,mode...]|all]
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


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    mode = sys.argv[2] if len(sys.argv) > 2 else "all"
    modes = set(mode.split(","))
    spark = get_spark(
        app_name="scale-probe-r7",
        extra_conf={"spark.network.timeout": "600s"},
    )
    work = Path(tempfile.mkdtemp(prefix="probe_r7_"))
    try:
        src = str(work / "corpus.parquet")
        gen_wall = gen_corpus(spark, n_docs, src)
        probe("gen_corpus", {"n_docs": n_docs, "sec": gen_wall})
        corpus = spark.read.parquet(src)

        if modes & {"bpe", "all"}:
            from data_lakehouse_movilidad_publica_santiago_spark.operators.bpe import (
                bpe_encode_counts,
                bpe_train,
                word_counts,
            )

            n_vocab = word_counts(corpus).count()
            t0 = time.perf_counter()
            merges, words = bpe_train(corpus, num_merges=8)
            train_wall = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            n_enc = bpe_encode_counts(corpus, words).count()
            probe(
                "bpe_train_encode",
                {
                    "n_docs": n_docs,
                    "n_vocab": n_vocab,
                    "train_8_merges_sec": train_wall,
                    "encode_sec": round(time.perf_counter() - t0, 2),
                    "n_encoded_docs": n_enc,
                },
            )

        if modes & {"sentence", "all"}:
            from data_lakehouse_movilidad_publica_santiago_spark.operators.sentence_dedup import (
                fixed_width_sentences,
                sentence_dedup,
            )

            t0 = time.perf_counter()
            out = sentence_dedup(
                corpus, fixed_width_sentences(F.col("text"), F.lit(10))
            )
            agg = out.agg(
                F.count("*").alias("docs"),
                F.sum("n_sentences").alias("sentences"),
                F.sum("n_removed").alias("removed"),
            ).collect()[0]
            probe(
                "sentence_dedup",
                {
                    "n_docs": n_docs,
                    "sec": round(time.perf_counter() - t0, 2),
                    "n_sentences": agg["sentences"],
                    "n_removed": agg["removed"],
                },
            )

        if modes & {"softdedup", "all"}:
            from data_lakehouse_movilidad_publica_santiago_spark.operators.soft_dedup import (
                soft_dedup,
            )

            t0 = time.perf_counter()
            agg = (
                soft_dedup(corpus, n=3)
                .agg(
                    F.count("*").alias("docs"),
                    F.sum(F.col("kept").cast("int")).alias("kept"),
                    F.round(F.avg("weight"), 4).alias("avg_weight"),
                )
                .collect()[0]
            )
            probe(
                "soft_dedup",
                {
                    "n_docs": n_docs,
                    "sec": round(time.perf_counter() - t0, 2),
                    "kept": agg["kept"],
                    "avg_weight": agg["avg_weight"],
                },
            )

        if modes & {"trigram", "all"}:
            from data_lakehouse_movilidad_publica_santiago_spark.operators.lm_filter import (
                score_stupid_backoff,
                train_trigram_lm,
            )

            # English slice proxy: even doc_ids train, all docs scored
            ref = corpus.filter(F.col("doc_id") % 2 == 0)
            t0 = time.perf_counter()
            model = train_trigram_lm(ref)
            agg = (
                score_stupid_backoff(corpus, model)
                .agg(
                    F.count("*").alias("docs"),
                    F.sum("n_trigrams").alias("trigrams"),
                    F.round(F.avg("cross_entropy"), 4).alias("avg_ce"),
                )
                .collect()[0]
            )
            probe(
                "trigram_backoff",
                {
                    "n_docs": n_docs,
                    "sec": round(time.perf_counter() - t0, 2),
                    "n_trigrams": agg["trigrams"],
                    "avg_ce": agg["avg_ce"],
                },
            )

        if modes & {"tfidf", "all"}:
            from data_lakehouse_movilidad_publica_santiago_spark.operators.retrieval import (
                tfidf_topk,
            )

            # query terms that actually occur: stopwords + one hex word
            t0 = time.perf_counter()
            rows = tfidf_topk(corpus, ["the", "and", "of"], top_k=10).collect()
            probe(
                "tfidf_topk",
                {
                    "n_docs": n_docs,
                    "sec": round(time.perf_counter() - t0, 2),
                    "rows": len(rows),
                },
            )

        if modes & {"containment", "all"}:
            from data_lakehouse_movilidad_publica_santiago_spark.operators.containment import (
                containment_pairs,
            )

            # plant containment-ONLY pairs: doc_id % 25 == 7 becomes
            # the 15-word PREFIX of its predecessor's body, i.e. a
            # subset document — C(short → long) = 1.0 while Jaccard
            # ≈ 13/48, invisible to any symmetric threshold. (CRT:
            # % 25 == 7 never hits the generator's % 20 == 19
            # near-dups, so these 200k pairs are all NEW; the 250k
            # suffix-extension near-dups are containment pairs too.)
            from scale_probe_r6 import _gen_text

            planted = corpus.withColumn(
                "text",
                F.when(
                    F.col("doc_id") % 25 == 7,
                    F.array_join(
                        F.slice(
                            F.split(_gen_text(F.col("doc_id") - 1), " "),
                            1,
                            15,
                        ),
                        " ",
                    ),
                ).otherwise(F.col("text")),
            )
            # max_df kills the shared-passage hot shingles (10% of the
            # corpus carries them) BEFORE the self-join — without it
            # this shape is the r6 hot-bucket trap
            t0 = time.perf_counter()
            n_pairs = containment_pairs(
                planted, threshold=0.9, k=3, max_df=1000
            ).count()
            probe(
                "containment_pairs",
                {
                    "n_docs": n_docs,
                    "max_df": 1000,
                    "sec": round(time.perf_counter() - t0, 2),
                    "pairs": n_pairs,
                },
            )

        if modes & {"novelty", "all"}:
            from data_lakehouse_movilidad_publica_santiago_spark.operators.corpus_stats import (
                novelty_scores,
            )

            t0 = time.perf_counter()
            agg = (
                novelty_scores(
                    corpus.filter(F.col("doc_id") % 2 == 1),
                    corpus.filter(F.col("doc_id") % 2 == 0),
                    n=3,
                )
                .agg(
                    F.count("*").alias("docs"),
                    F.round(F.avg("novelty"), 4).alias("avg_novelty"),
                )
                .collect()[0]
            )
            probe(
                "novelty_scores",
                {
                    "n_docs": n_docs,
                    "sec": round(time.perf_counter() - t0, 2),
                    "scored_docs": agg["docs"],
                    "avg_novelty": agg["avg_novelty"],
                },
            )

        if modes & {"doremi", "all"}:
            from data_lakehouse_movilidad_publica_santiago_spark.operators.data_mix import (
                doremi_weights,
            )

            domains = corpus.withColumn(
                "domain", F.concat(F.lit("d"), F.col("doc_id") % 8)
            )
            # pinned (domain, word) relation: one text scan feeds the
            # four consumers (plan pin in tests/test_corpus_plans.py)
            pins: list = []
            t0 = time.perf_counter()
            rows = doremi_weights(domains, "domain", pins=pins).collect()
            probe(
                "doremi_weights",
                {
                    "n_docs": n_docs,
                    "n_domains": len(rows),
                    "sec": round(time.perf_counter() - t0, 2),
                    "pinned": True,
                },
            )
            for p in pins:
                p.unpersist()
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()




# appended: ANN probes (brute vs SQ8 vs MMR) over generated vectors.
# Invoked via mode "ann"; kept out of main()'s corpus flow because the
# input is an embeddings table, not documents.
def ann_probe(n_vecs: int = 5_000_000, dim: int = 64) -> None:
    from data_lakehouse_movilidad_publica_santiago_spark.operators.retrieval import (
        mmr_topk,
    )
    from data_lakehouse_movilidad_publica_santiago_spark.operators.similarity import (
        cosine_topk,
        sq8_params,
        sq8_topk,
    )

    spark = get_spark(
        app_name="scale-probe-r7-ann",
        extra_conf={"spark.network.timeout": "600s"},
    )
    work = Path(tempfile.mkdtemp(prefix="probe_r7_ann_"))
    try:
        # deterministic pseudo-random vectors: 16 md5 words -> 64
        # uniform floats in [-1, 1); fully in-plan
        comps = []
        for w in range(16):
            h = F.md5(F.concat(F.lit(f"v{w}:"), F.col("id").cast("string")))
            for c in range(4):
                nib = F.conv(F.substring(h, 1 + 8 * c, 8), 16, 10).cast(
                    "double"
                )
                comps.append(nib / F.lit(2147483648.0) - F.lit(1.0))
        src = str(work / "vecs.parquet")
        t0 = time.perf_counter()
        spark.range(n_vecs).select(
            F.col("id").alias("vec_id"),
            F.array(*comps).cast("array<float>").alias("embedding"),
        ).write.parquet(src)
        probe("gen_vectors", {
            "n_vecs": n_vecs, "dim": dim,
            "sec": round(time.perf_counter() - t0, 2),
        })  # fmt: skip
        emb = spark.read.parquet(src)
        q = [float(x) for x in
             emb.filter("vec_id = 0").collect()[0]["embedding"]]  # fmt: skip

        t0 = time.perf_counter()
        exact = [(r["vec_id"], r["cos_sim"])
                 for r in cosine_topk(emb, q, k=10).collect()]  # fmt: skip
        probe("brute_cosine_topk", {
            "n_vecs": n_vecs, "sec": round(time.perf_counter() - t0, 2),
        })  # fmt: skip

        t0 = time.perf_counter()
        params = sq8_params(emb, dim=dim)
        params_wall = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        sq = [(r["vec_id"], r["cos_sim"])
              for r in sq8_topk(emb, q, k=10, params=params).collect()]  # fmt: skip
        probe("sq8_topk", {
            "n_vecs": n_vecs, "params_sec": params_wall,
            "query_sec": round(time.perf_counter() - t0, 2),
            "recall_vs_exact": round(
                len({i for i, _ in sq} & {i for i, _ in exact}) / 10, 2
            ),
        })  # fmt: skip

        # at-rest codes layout: the screen scans the persisted int8
        # codes (dictionary/ZSTD-friendly), rescore reads 40 vectors
        from data_lakehouse_movilidad_publica_santiago_spark.operators.similarity import (
            sq8_encode,
            sq8_topk_indexed,
        )

        codes_path = str(work / "codes.parquet")
        t0 = time.perf_counter()
        sq8_encode(emb, params).write.parquet(codes_path)
        encode_wall = round(time.perf_counter() - t0, 2)
        codes = spark.read.parquet(codes_path)

        def _dir_mb(p):
            return round(
                sum(f.stat().st_size for f in Path(p).rglob("*.parquet"))
                / 1e6,
                1,
            )

        t0 = time.perf_counter()
        idx = [(r["vec_id"], r["cos_sim"])
               for r in sq8_topk_indexed(codes, emb, q, params, k=10).collect()]  # fmt: skip
        probe("sq8_topk_indexed", {
            "n_vecs": n_vecs, "encode_sec": encode_wall,
            "query_sec": round(time.perf_counter() - t0, 2),
            "codes_mb": _dir_mb(codes_path),
            "vectors_mb": _dir_mb(src),
            "same_as_inline": idx == sq,
        })  # fmt: skip

        t0 = time.perf_counter()
        rows = mmr_topk(emb, q, k=5, lam=0.7).collect()
        probe("mmr_topk", {
            "n_vecs": n_vecs, "k": 5,
            "sec": round(time.perf_counter() - t0, 2),
            "rows": len(rows),
        })  # fmt: skip
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[2] == "ann":
        ann_probe(int(sys.argv[1]))
    else:
        main()
