"""Corpus auditing report — the training-data counterpart of the
gold load report (``gold/diagnostics``): one JSON + markdown artifact
summarizing a documents parquet before/after a corpus build.

Composes the individually-gated expressions over ONE persisted
enrichment pass, then runs a handful of driver-sized jobs against it
(the wide aggregate, the Gopher/lang/source distributions, and the
trigram top-k): token/char accounting, language and source mixes,
exact duplication (fingerprint groups + HLL estimate vs exact),
Gopher rule outcomes, PII class counts, and the corpus top trigrams.
Percentiles are approximate (bounded-memory sketch aggregate — an
exact global percentile would buffer every row in one reducer)."""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.gopher import gopher_reason
from .functions.text import doc_fingerprint, token_count, word_ngrams_raw
from .operators.pii import pii_count
from .operators.spread import ensure_parallelism


def build_corpus_report(
    spark: SparkSession,
    input_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    topk_ngrams: int = 10,
    bpe_merges: int | None = None,
) -> dict:
    """Compute the report dict (see module docstring for contents).

    ``bpe_merges=N`` additionally trains an N-merge BPE vocabulary on
    the corpus (``operators/bpe``) and reports the resulting subword
    token total next to the whitespace total — the compression an
    N-merge tokenizer would achieve, a standard corpus-sizing figure.
    Cost: one vocab-sized pair aggregation per merge plus one
    vocabulary-join encode pass."""
    docs = ensure_parallelism(spark.read.parquet(input_path))
    has_lang = "lang" in docs.columns
    has_source = "source" in docs.columns

    enriched = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        *(["lang"] if has_lang else []),
        *(["source"] if has_source else []),
        token_count(F.col(text_col)).alias("__n_tok"),
        F.length(text_col).alias("__n_chars"),
        doc_fingerprint(F.col(text_col)).alias("__fp"),
        gopher_reason(F.col(text_col)).alias("__gopher"),
        (
            pii_count(F.col(text_col), "email")
            + pii_count(F.col(text_col), "ipv4")
            + pii_count(F.col(text_col), "phone")
        ).alias("__n_pii"),
    ).persist()

    wide = enriched.agg(
        F.count("*").alias("n_docs"),
        F.sum("__n_tok").alias("total_tokens"),
        F.sum("__n_chars").alias("total_chars"),
        F.expr("percentile_approx(__n_tok, array(0.5, 0.95))").alias("tok_pcts"),
        F.countDistinct("__fp").alias("distinct_fingerprints"),
        F.expr("hll_sketch_estimate(hll_sketch_agg(__fp))").alias(
            "distinct_fingerprints_hll"
        ),
        F.sum("__n_pii").alias("total_pii_matches"),
        F.sum((F.col("__n_pii") > 0).cast("bigint")).alias("docs_with_pii"),
    ).collect()[0]

    def _dist(col: str) -> dict:
        # NULL keys bucket under "__null__" so the report stays
        # json/sort-safe on nullable columns
        return {
            (r[col] if r[col] is not None else "__null__"): r["n"]
            for r in enriched.groupBy(col)
            .agg(F.count("*").alias("n"))
            .collect()
        }

    gopher_dist = {
        (r["__gopher"] or "PASS"): r["n"]
        for r in enriched.groupBy("__gopher").agg(F.count("*").alias("n")).collect()
    }
    top_ngrams = [
        {"gram": r["gram"], "n": r["n"]}
        for r in enriched.select(
            F.explode(word_ngrams_raw(F.col("text"), 3)).alias("gram")
        )
        # word_ngrams_raw pads docs shorter than 3 words with one
        # short gram — only true trigrams belong in the table
        .filter(F.size(F.split(F.col("gram"), " ")) == 3)
        .groupBy("gram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("gram"))
        .limit(topk_ngrams)
        .collect()
    ]

    n_docs = wide["n_docs"]
    report = {
        "input": str(input_path),
        "n_docs": n_docs,
        "total_tokens": int(wide["total_tokens"] or 0),
        "total_chars": int(wide["total_chars"] or 0),
        "tokens_p50": float(wide["tok_pcts"][0]) if wide["tok_pcts"] else None,
        "tokens_p95": float(wide["tok_pcts"][1]) if wide["tok_pcts"] else None,
        "distinct_fingerprints": int(wide["distinct_fingerprints"]),
        # NULL on an empty corpus (sketch of zero rows)
        "distinct_fingerprints_hll": (
            round(float(wide["distinct_fingerprints_hll"]), 1)
            if wide["distinct_fingerprints_hll"] is not None
            else 0.0
        ),
        "exact_dup_docs": n_docs - int(wide["distinct_fingerprints"]),
        # derived from the distribution — one source of truth
        "gopher_pass": gopher_dist.get("PASS", 0),
        "gopher_reasons": gopher_dist,
        "total_pii_matches": int(wide["total_pii_matches"] or 0),
        "docs_with_pii": int(wide["docs_with_pii"] or 0),
        "lang_distribution": _dist("lang") if has_lang else None,
        "source_distribution": _dist("source") if has_source else None,
        "top_trigrams": top_ngrams,
    }
    if bpe_merges is not None:
        from .operators.bpe import bpe_encode_counts, bpe_train

        merges, words = bpe_train(enriched, text_col="text", num_merges=bpe_merges)
        bpe_total = bpe_encode_counts(enriched, words, id_col="doc_id").agg(
            F.sum("n_bpe_tokens").alias("s")
        ).collect()[0]["s"]
        report["bpe_merges"] = bpe_merges
        report["bpe_total_tokens"] = int(bpe_total or 0)
        report["bpe_merge_list"] = [f"{l}+{r}" for _, l, r, _ in merges]
    enriched.unpersist()
    return report


def write_corpus_report(report: dict, out_dir: str | Path) -> tuple[Path, Path]:
    """Write ``corpus_report.{json,md}``; returns both paths."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    jp = out / "corpus_report.json"
    jp.write_text(json.dumps(report, indent=2, sort_keys=True))

    lines = [
        "# Corpus report",
        "",
        f"input: `{report['input']}`",
        "",
        f"- documents: **{report['n_docs']:,}** "
        f"({report['exact_dup_docs']:,} exact duplicates)",
        f"- tokens: {report['total_tokens']:,} total "
        f"(p50 {report['tokens_p50']}, p95 {report['tokens_p95']})",
        f"- distinct fingerprints: {report['distinct_fingerprints']:,} "
        f"(HLL estimate {report['distinct_fingerprints_hll']:,})",
        f"- Gopher pass rate: {report['gopher_pass']:,}/{report['n_docs']:,}",
        f"- PII: {report['total_pii_matches']:,} matches in "
        f"{report['docs_with_pii']:,} docs",
        *(
            [
                f"- BPE ({report['bpe_merges']} merges): "
                f"{report['bpe_total_tokens']:,} subword tokens"
            ]
            if report.get("bpe_merges") is not None
            else []
        ),
        "",
        "## Gopher outcomes",
        "",
    ]
    for k in sorted(report["gopher_reasons"]):
        lines.append(f"- {k}: {report['gopher_reasons'][k]:,}")
    for name, dist in (
        ("Languages", report["lang_distribution"]),
        ("Sources", report["source_distribution"]),
    ):
        if dist:
            lines += ["", f"## {name}", ""]
            for k in sorted(dist):
                lines.append(f"- {k}: {dist[k]:,}")
    lines += ["", "## Top trigrams", ""]
    for g in report["top_trigrams"]:
        lines.append(f"- `{g['gram']}` × {g['n']:,}")
    mp = out / "corpus_report.md"
    mp.write_text("\n".join(lines) + "\n")
    return jp, mp
