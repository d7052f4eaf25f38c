"""Round-5b scale probes: the retrieval/quality/dedup operators added
this round at 100-4000x the gate size, on local[32]. Inputs are
generated in-plan (one md5 or a few hashes per row — no files, no
Python), sized so each probe stresses the operator's real shuffle:

- span_dedup @ 2M docs x 32 tokens: 50M window hashes through the
  dup-hash groupBy; ~10% of docs carry a shared 16-token block, so
  the dup set is big enough to exercise the island merge.
- lm_perplexity @ 2M docs: 16-token hex vocabulary -> dense bigram
  model (<=256 rows, broadcast), ~62M scored gram occurrences.
- bm25 @ 20M docs: array-expression tf (no explode) + TakeOrdered.
- kmeans @ 5M x dim-16, k=8, 2 iterations: map-side assign +
  (cluster, dim) update shuffle; centroid collects stay k*dim.

Run:  python scripts/scale_probe_r5b.py
Emits one JSON line per probe; summarize into SCALE.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from data_lakehouse_movilidad_publica_santiago_spark.operators.kmeans import (  # noqa: E402
    kmeans_fit_assign,
)
from data_lakehouse_movilidad_publica_santiago_spark.operators.lm_filter import (  # noqa: E402
    score_perplexity,
    train_bigram_lm,
)
from data_lakehouse_movilidad_publica_santiago_spark.operators.retrieval import (  # noqa: E402
    bm25_topk,
)
from data_lakehouse_movilidad_publica_santiago_spark.operators.span_dedup import (  # noqa: E402
    span_dedup_stats,
)
from data_lakehouse_movilidad_publica_santiago_spark.session import get_spark  # noqa: E402


def probe(name, fn):
    t0 = time.perf_counter()
    result = fn()
    dt = round(time.perf_counter() - t0, 2)
    print(json.dumps({"probe": name, "sec": dt, **result}), flush=True)


def _hex_text(n_parts: int):
    """~32*n_parts single-hex-char tokens from n_parts md5 calls."""
    parts = [
        F.concat_ws(
            " ", F.split(F.md5(F.conv(F.col("id") * (i + 1), 10, 16)), "")
        )
        for i in range(n_parts)
    ]
    return F.concat_ws(" ", *parts)


SHARED = " ".join(f"s{i}" for i in range(16))


def main() -> None:
    spark = get_spark(app_name="scale-probe-r5b")

    def p_span():
        docs = spark.range(2_000_000).select(
            F.col("id").alias("doc_id"),
            F.when(
                F.col("id") % 10 == 0, F.concat(F.lit(SHARED + " "), _hex_text(1))
            )
            .otherwise(_hex_text(1))
            .alias("text"),
        )
        stats = span_dedup_stats(docs, window=8)
        agg = stats.agg(
            F.count("*").alias("docs"),
            F.sum("dup_windows").alias("dup_windows"),
            F.sum("dup_tokens").alias("dup_tokens"),
        ).collect()[0]
        return {
            "docs": agg["docs"],
            "dup_windows": int(agg["dup_windows"]),
            "dup_tokens": int(agg["dup_tokens"]),
        }

    probe("span_dedup_2m_docs", p_span)

    def p_lm():
        docs = spark.range(2_000_000).select(
            F.col("id").alias("doc_id"), _hex_text(1).alias("text")
        )
        model = train_bigram_lm(docs.filter(F.col("doc_id") % 2 == 0))
        scored = score_perplexity(
            docs, model, include_empty=False, keep_threshold=4.0
        )
        agg = scored.agg(
            F.count("*").alias("docs"),
            F.sum("n_bigrams").alias("grams"),
            F.sum(F.col("keep").cast("bigint")).alias("kept"),
        ).collect()[0]
        return {
            "docs": agg["docs"],
            "grams": int(agg["grams"]),
            "kept": int(agg["kept"]),
        }

    probe("lm_perplexity_2m_docs", p_lm)

    def p_bm25():
        docs = spark.range(20_000_000).select(
            F.col("id").alias("doc_id"), _hex_text(1).alias("text")
        )
        top = bm25_topk(docs, ["a", "7"], top_k=10).collect()
        return {"docs": 20_000_000, "top1": top[0]["doc_id"]}

    probe("bm25_20m_docs", p_bm25)

    def p_kmeans():
        emb = spark.range(5_000_000).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(16)),
                lambda i: (
                    F.pmod(F.xxhash64(F.col("id"), i), F.lit(1000)) / 1000.0
                ).cast("float"),
            ).alias("embedding"),
        )
        out = kmeans_fit_assign(emb, k=8, iters=2)
        agg = out.groupBy("cluster").count().collect()
        return {
            "docs": 5_000_000,
            "clusters": len(agg),
            "largest": max(r["count"] for r in agg),
        }

    probe("kmeans_5m_dim16_k8", p_kmeans)


if __name__ == "__main__":
    main()
