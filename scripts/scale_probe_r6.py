"""Round-6 scale probes (local[32]):

1. COMPOSED corpus build — round 5 probed the stages in
   isolation; this runs ``pipeline.build_corpus`` with every batch
   stage ON (gopher rule battery + MinHash-LSH near-dedup +
   ExactSubstr span masking + CCNet perplexity screen + PII redaction
   + chunk/shuffle layout) over one generated corpus with
   ``checkpoint_stages=True`` (bounded scratch), records the
   per-stage walls the pipeline now emits (``stage_wall_s``), and
   asserts the CacheManager is empty at exit (no leaked pins across
   stage handoffs).

2. Incremental MinHash at-rest index — build the index ONCE over the
   10M-doc corpus, then probe two 1M-doc arriving batches through
   ``minhash_dedup_incremental`` and one through the streaming intake
   ``stream_dedup_against_index``: the index-once/score-many claim
   should show per-batch cost O(batch + matches), flat across
   batches and far below the index build.

Corpus shape: ~50 words/doc ("stopword hex6" pairs → passes every
Gopher rule with margin); 5% of docs are near-duplicates of their
predecessor (same body + 2-word suffix); 10% carry a shared 16-token
passage (span-mask fodder). All generated in-plan — no Python rows.

Run:  python scripts/scale_probe_r6.py [n_docs] [composed|index|all]
Emits one JSON line per probe; summarize into SCALE.md.

Disk budget: the composed probe runs ``checkpoint_stages=True`` —
without it the single-lineage build accumulates every stage's shuffle
files on local disk until the final write (ContextCleaner can't
reclaim them while the pinned plans keep the ShuffleDependency chain
reachable), which ENOSPC'd this box's ~80 GB scratch at 5M docs.
With stage-boundary checkpoints the scratch bound is one stage's
shuffle + the boundary parquets. Run composed and index modes in
separate processes so each starts with clean scratch.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from data_lakehouse_movilidad_publica_santiago_spark.session import (  # noqa: E402
    get_spark,
)

_STOPS = ["the", "and", "is", "of", "in", "to"]
_SHARED = (
    "the common block of the corpus holds part one and part two of "
    "the shared tail"
)  # 16 tokens


def _gen_text(seed_col, n_md5: int = 5):
    """~50 words: 25 stopwords interleaved with 25 unique hex-6 words
    derived from ``seed_col`` — passes every Gopher rule with margin
    (mean word len ≈ 4.5, ≥97% alpha words, 0 dup 2-grams)."""
    parts = []
    for k in range(n_md5):
        h = F.md5(F.concat(F.lit(f"g{k}:"), seed_col.cast("string")))
        for c in range(5):
            parts.append(F.lit(_STOPS[(k * 5 + c) % len(_STOPS)]))
            parts.append(F.substring(h, 1 + 6 * c, 6))
    return F.concat_ws(" ", *parts)


def gen_corpus(
    spark,
    n_docs: int,
    path: str,
    id_offset: int = 0,
    dup_parent_space: int | None = None,
) -> float:
    """Write the probe corpus; returns the generation+write wall.

    Docs with ``doc_id % 20 == 19`` are near-duplicates: by default of
    their predecessor (intra-corpus pairs); with ``dup_parent_space=N``
    their body comes from the [0, N) seed space instead — i.e. they
    near-duplicate a doc of the AT-REST corpus, for the incremental-
    index probes."""
    t0 = time.perf_counter()
    ids = spark.range(n_docs).select(
        (F.col("id") + F.lit(id_offset)).alias("doc_id")
    )
    if dup_parent_space is None:
        seed = F.when(
            F.col("doc_id") % 20 == 19, F.col("doc_id") - 1
        ).otherwise(F.col("doc_id"))
    else:
        # map into the corpus seed space, avoiding seeds no corpus doc
        # actually used for its own body (corpus docs % 20 == 19 carry
        # their predecessor's body, so those seeds never materialize)
        base = F.col("doc_id") % F.lit(dup_parent_space)
        parent = F.when(base % 20 == 19, base - 1).otherwise(base)
        seed = F.when(F.col("doc_id") % 20 == 19, parent).otherwise(
            F.col("doc_id")
        )
    body = _gen_text(seed)
    text = F.concat_ws(
        " ",
        body,
        F.when(F.col("doc_id") % 20 == 19, F.lit("extra suffix")).otherwise(
            F.lit("")
        ),
        F.when(F.col("doc_id") % 10 == 0, F.lit(_SHARED)).otherwise(
            F.lit("")
        ),
    )
    # concat_ws skips empty strings, so the padding never leaves gaps
    ids.select(
        "doc_id", F.trim(text).alias("text")
    ).write.mode("overwrite").parquet(path)
    return round(time.perf_counter() - t0, 2)


def probe(name: str, payload: dict) -> None:
    print(json.dumps({"probe": name, **payload}), flush=True)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    mode = sys.argv[2] if len(sys.argv) > 2 else "all"
    batch_n = max(n_docs // 10, 1000)
    # network.timeout > any plausible full-GC pause: a heartbeat miss
    # in local mode (single JVM) must never kill a measured run
    spark = get_spark(
        app_name="scale-probe-r6",
        extra_conf={"spark.network.timeout": "600s"},
    )
    work = Path(tempfile.mkdtemp(prefix="probe_r6_"))
    try:
        src = str(work / "corpus.parquet")
        gen_wall = gen_corpus(spark, n_docs, src)
        probe("gen_corpus", {"n_docs": n_docs, "sec": gen_wall})

        # ── 1. composed corpus build, all batch stages on ───────────
        from data_lakehouse_movilidad_publica_santiago_spark.pipeline import (
            build_corpus,
        )

        if mode in ("composed", "all"):
            # lsh_est_margin is the load-bearing guard here: 10% of
            # probe docs share a 16-token passage, whose carriers'
            # band minima all land on the shared shingles → per-band
            # hot buckets (~N/4000 docs each, one per band) whose
            # pairwise candidates are ALL false (their true Jaccard
            # ≈ 0.14 << 0.7). Without the signature prune the verify
            # join drags every candidate's 1.5 KB shingle arrays
            # through a shuffle — measured >60 GB scratch + a 144 s
            # driver GC stall (heartbeat death) at 5M docs; with it
            # the candidates die at 512 B signature rows.
            summary = build_corpus(
                spark,
                src,
                str(work / "built"),
                seed="r6-probe",
                gopher=True,
                near_dedup=True,
                near_threshold=0.7,
                lsh_est_margin=0.25,
                lsh_max_bucket=100_000,
                span_mask_window=8,
                ppl_threshold=99.0,
                redact=True,
                checkpoint_stages=True,
            )
            cache_empty = (
                spark._jsparkSession.sharedState().cacheManager().isEmpty()
            )
            probe(
                "composed_build_corpus",
                {
                    "n_docs": n_docs,
                    "sec": summary["total_wall_s"],
                    "stage_wall_s": summary["stage_wall_s"],
                    "n_docs_kept": summary["n_docs_kept"],
                    "n_near_dups_removed": summary["n_near_dups_removed"],
                    "n_docs_emptied_by_mask": summary["n_docs_emptied_by_mask"],
                    "n_docs_dropped_by_ppl": summary["n_docs_dropped_by_ppl"],
                    "n_chunks": summary["n_chunks"],
                    "n_tokens": summary["n_tokens"],
                    "lsh_hot_buckets_dropped": summary["lsh_hot_buckets_dropped"],
                    "cache_manager_empty_at_exit": bool(cache_empty),
                },
            )
        # ── BPE training over a web-scale vocabulary ────────────────
        if mode == "bpe":
            from data_lakehouse_movilidad_publica_santiago_spark.operators.bpe import (
                bpe_encode_counts,
                bpe_train,
                word_counts,
            )

            corpus = spark.read.parquet(src)
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
                    "merges": [m[1] + "+" + m[2] for m in merges],
                },
            )
            return

        if mode not in ("index", "all"):
            return

        # ── 2. incremental MinHash: index once, probe per-batch ─────
        from data_lakehouse_movilidad_publica_santiago_spark.operators.dedup_text import (
            build_minhash_index,
            minhash_dedup_incremental,
        )
        from data_lakehouse_movilidad_publica_santiago_spark.streaming.silver_stream import (
            stream_dedup_against_index,
        )

        corpus = spark.read.parquet(src)
        idx_dir = str(work / "mh_index")
        t0 = time.perf_counter()
        build_minhash_index(corpus, idx_dir)
        idx_wall = round(time.perf_counter() - t0, 2)
        probe("minhash_index_build", {"n_docs": n_docs, "sec": idx_wall})

        for b in range(2):
            # each batch: fresh ids; 5% of rows near-duplicate a doc
            # of the at-rest corpus → real index matches to verify
            bdir = str(work / f"batch{b}.parquet")
            gen_corpus(
                spark, batch_n, bdir,
                id_offset=n_docs * (b + 1),
                dup_parent_space=n_docs,
            )  # fmt: skip
            batch = spark.read.parquet(bdir)
            t0 = time.perf_counter()
            n_pairs = minhash_dedup_incremental(
                batch, idx_dir, threshold=0.7, est_margin=0.25
            ).count()
            probe(
                "minhash_incremental_batch",
                {
                    "batch": b,
                    "batch_docs": batch_n,
                    "index_docs": n_docs,
                    "sec": round(time.perf_counter() - t0, 2),
                    "pairs": n_pairs,
                },
            )

        # one streaming micro-batch through the same index
        sdir = str(work / "stream_in")
        gen_corpus(spark, batch_n, str(Path(sdir) / "part0.parquet"),
                   id_offset=n_docs * 3, dup_parent_space=n_docs)  # fmt: skip
        schema = spark.read.parquet(str(Path(sdir) / "part0.parquet")).schema
        stream = (
            spark.readStream.schema(schema)
            .parquet(str(Path(sdir) / "part0.parquet"))
        )
        t0 = time.perf_counter()
        q = stream_dedup_against_index(
            stream,
            idx_dir,
            str(work / "stream_out"),
            str(work / "stream_ckpt"),
            threshold=0.7,
            est_margin=0.25,
        )
        q.awaitTermination()
        accepted = spark.read.parquet(
            str(work / "stream_out" / "accepted")
        ).count()
        probe(
            "stream_dedup_against_index",
            {
                "batch_docs": batch_n,
                "index_docs": n_docs,
                "sec": round(time.perf_counter() - t0, 2),
                "accepted": accepted,
            },
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
