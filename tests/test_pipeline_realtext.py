"""Round-9 real-text pipeline replay (VERDICT r8 ask #7): the composed
``build_corpus`` (gopher → exact dedup → MinHash near-dedup → sentence
dedup → perplexity screen → tf-idf select → redact/chunk/shuffle) over
a REAL natural-language fixture — the reference repo's own markdown
docs (Spanish prose + code blocks + tables), used as DATA only.

Why this exists: every corpus gate runs on synthetic word-soup, whose
sentence/perplexity behavior is degenerate (SCALE.md r8 measured 0
sentence removals at 10M docs).  On natural language every stage does
real work, and the per-stage accounting is pinned EXACTLY — any change
to stage interaction arithmetic fails this test.

The replay also surfaced a genuine capability gap, fixed this round:
the quality battery hardwired English stopwords, so Spanish text died
wholesale at gopher's stopword-hit rule (438 → 7 docs in the first
scout).  ``build_corpus(stopwords=...)`` now parameterizes the family;
this test exercises it with a Spanish list.
"""

from __future__ import annotations

import re
from pathlib import Path

import pytest

from data_lakehouse_movilidad_publica_santiago_spark.pipeline import (
    build_corpus,
)

REF = Path("/root/reference")

# real-text composed-pipeline replays: slow-marked so the DEFAULT run finishes
# inside the driver's verify window (VERDICT r12 item 1);
# `pytest -m ""` runs the full suite.
pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not REF.exists(), reason="reference markdown fixture not present"
)]

SPANISH_STOPWORDS = [
    "de", "la", "que", "el", "en", "y", "a", "los", "del", "se",
    "las", "por", "un", "para", "con", "no", "una",
]  # fmt: skip
DISCLAIMER = (
    "Este documento describe el lakehouse de movilidad publica de "
    "Santiago y su pipeline de datos."
)


def _real_sections() -> list[str]:
    """One doc per markdown heading section, whitespace-normalized,
    ≥120 chars — real Spanish prose with embedded code/tables (the
    LOW_ALPHA_FRACTION and TOO_FEW_WORDS gopher rules both fire on
    this corpus, unlike on word-soup)."""
    secs = []
    for f in sorted(REF.rglob("*.md")):
        text = f.read_text(encoding="utf-8", errors="replace")
        for block in re.split(r"\n(?=#)", text):
            s = " ".join(block.split())
            if len(s) >= 120:
                secs.append(s)
    return secs


def _fixture_rows() -> list[tuple[int, str]]:
    """The base sections plus planted duplication, mirroring what a
    crawl actually contains: every 5th section re-included VERBATIM
    (exact-dedup work), every 7th re-included with one appended word
    (near-dedup work), and a fixed disclaimer sentence appended to
    every 4th (sentence-dedup work — keep-first removes the later
    copies)."""
    secs = _real_sections()
    rows = []
    for i, s in enumerate(secs):
        t = s + " " + DISCLAIMER if i % 4 == 0 else s
        rows.append((i, t))
    for i, s in enumerate(secs):
        if i % 5 == 0:
            rows.append(
                (10_000 + i, s + " " + DISCLAIMER if i % 4 == 0 else s)
            )
    for i, s in enumerate(secs):
        if i % 7 == 0:
            base = s + " " + DISCLAIMER if i % 4 == 0 else s
            rows.append((20_000 + i, base + " actualizado"))
    return rows


def test_realtext_stage_accounting_pinned(spark, tmp_path):
    rows = _fixture_rows()
    assert len(rows) == 343  # 232 sections + 47 exact + 34 near mirrors
    src = tmp_path / "docs.parquet"
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(
        str(src)
    )

    summary = build_corpus(
        spark,
        str(src),
        str(tmp_path / "out"),
        seed="realtext-r9",
        gopher=True,
        stopwords=SPANISH_STOPWORDS,
        near_dedup=True,
        near_threshold=0.7,
        sentence_dedup=True,
        ppl_threshold=7.33,  # p90 cross-entropy of the gopher survivors
        select_query="calidad de datos del modelo parquet",
        select_top_k=25,
    )

    # per-stage accounting, pinned exactly (deterministic fixture +
    # seeded stages).  343 raw → 138 pass gopher (Spanish stopwords;
    # TOO_FEW_WORDS and LOW_ALPHA_FRACTION carry the drops) → exact
    # dedup removes the verbatim mirrors → 10 near-mirrors removed →
    # 88 duplicate disclaimer/boilerplate sentences cut (0 docs
    # emptied) → 30 high-perplexity docs dropped → tf-idf keeps the
    # 25 most query-similar of the 78 survivors.
    assert summary["n_docs_raw"] == 343
    assert summary["custom_stopwords"] is True
    assert summary["n_near_dups_removed"] == 10
    assert summary["n_sentences_removed"] == 88
    assert summary["n_docs_emptied_by_sentence_dedup"] == 0
    assert summary["n_docs_dropped_by_ppl"] == 30
    assert summary["n_docs_selected"] == 25
    assert summary["n_docs_dropped_by_select"] == 53
    assert summary["n_docs_kept"] == 25
    assert summary["n_chunks"] == 54
    assert summary["n_tokens"] == 2818

    chunks = spark.read.parquet(summary["chunks_path"])
    assert chunks.count() == 54
    assert chunks.select("sample_id").distinct().count() == 54


def test_realtext_english_stopwords_kill_spanish_corpus(spark, tmp_path):
    """The failure mode the stopwords parameter exists for, pinned so
    it stays documented: with the DEFAULT English list, gopher's
    stopword-hit rule (plus the word-count/alpha rules) annihilates
    the Spanish corpus."""
    rows = _fixture_rows()
    src = tmp_path / "docs_en.parquet"
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(
        str(src)
    )
    summary = build_corpus(
        spark, str(src), str(tmp_path / "out_en"),
        seed="realtext-r9", gopher=True,
    )  # fmt: skip
    assert summary["custom_stopwords"] is False
    # vs 138 gopher survivors with the Spanish list
    assert summary["n_docs_kept"] < 30


def test_realtext_retrieval_stack_round_trip(spark, tmp_path, capsys):
    """Round-10 stage 2 (VERDICT r9 ask #8): the retrieval stack
    exercised on NON-synthetic data — embed the composed pipeline's
    surviving chunks (content-keyed deterministic embeddings), build
    the IVF-PQ index over two thirds, grow it with ivfpq_add over the
    rest, then drive the ``retrieve`` CLI against the grown index and
    pin equality with the exact full-corpus greedy."""
    import json

    from pyspark.sql import functions as F

    from data_lakehouse_movilidad_publica_santiago_spark import cli
    from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
        build_ivfpq_index,
        ivfpq_add,
    )
    from data_lakehouse_movilidad_publica_santiago_spark.operators.retrieval import (
        mmr_topk,
    )

    rows = _fixture_rows()
    src = tmp_path / "docs.parquet"
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(
        str(src)
    )
    summary = build_corpus(
        spark, str(src), str(tmp_path / "out"),
        seed="realtext-r9", gopher=True, stopwords=SPANISH_STOPWORDS,
        near_dedup=True, near_threshold=0.7, sentence_dedup=True,
        ppl_threshold=7.33,
        select_query="calidad de datos del modelo parquet",
        select_top_k=25,
    )  # fmt: skip
    chunks = spark.read.parquet(summary["chunks_path"])

    # content-keyed deterministic embeddings over the real chunks —
    # keyed on chunk_md5 (the chunk table's content fingerprint; it
    # deliberately carries no raw text) via the md5 nibble recipe of
    # the scale probes: dim 64, [-1, 1]
    comps = []
    for w in range(16):
        h = F.md5(F.concat(F.lit(f"e{w}:"), F.col("chunk_md5")))
        for c in range(4):
            nib = F.conv(F.substring(h, 1 + 8 * c, 8), 16, 10).cast("double")
            comps.append(nib / F.lit(2147483648.0) - F.lit(1.0))
    emb = chunks.select(
        F.col("sample_id").cast("bigint").alias("vec_id"),
        F.array(*comps).cast("array<float>").alias("embedding"),
    )
    emb_path = tmp_path / "chunk_embeddings.parquet"
    emb.write.parquet(str(emb_path))
    emb = spark.read.parquet(str(emb_path))
    n = emb.count()
    assert n == 54

    # index lifecycle on the real corpus: build on ~2/3, add the rest
    idx = tmp_path / "chunk_idx"
    built = emb.filter("vec_id % 3 < 2")
    added = emb.filter("vec_id % 3 = 2")
    build_ivfpq_index(
        built, str(idx), n_cells=4, m=8, ksub=16, iters=2,
        store_vectors=True,
    )  # fmt: skip
    assert ivfpq_add(spark, str(idx), added) == added.count()

    qid = emb.agg(F.min("vec_id")).collect()[0][0]
    rc = cli.main([
        "retrieve",
        "--embeddings", str(emb_path),
        "--index-dir", str(idx),
        "--query-id", str(qid),
        "--k", "4",
        "--n-probe", "4",
    ])  # fmt: skip
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["prefetch"] == "ivfpq-filepruned"
    assert payload["certificate_scope"] == "screened"
    got = [
        (r["rank"], r["vec_id"], r["relevance"], r["redundancy"],
         r["mmr_score"]) for r in payload["results"]
    ]  # fmt: skip
    q = [
        float(x)
        for x in emb.filter(F.col("vec_id") == qid).collect()[0]["embedding"]
    ]
    # n_probe = n_cells and pool ≥ corpus → the file-pruned stack over
    # the GROWN index reproduces the exact greedy over all 54 chunks
    exact = [tuple(r) for r in mmr_topk(emb, q, k=4, lam=0.7).collect()]
    assert got == exact


def test_realtext_retrieval_quality_mrr_floor(spark, tmp_path):
    """Round-11 (VERDICT r10 ask #8): retrieval QUALITY on real text,
    not just plumbing.  The r10 round-trip pins build→add→retrieve
    equality but its hash embeddings make relevance untestable (a
    query's neighbors are arbitrary).  Here each section's own HEADING
    is the query and the section is the expected hit, with embeddings
    that carry real token overlap: 64-dim feature-hashed bag-of-words
    (signed token hashing, Weinberger et al. 2009) computed by ONE
    Spark map expression — heading tokens recur in their body, so
    cosine against the heading must rank the owning section highly.
    The full file-pruned stack (build_ivfpq_index → mmr_topk_ivfpq)
    answers the queries; MRR@10 is pinned at a measured floor
    (0.52 on this fixture; floor 0.45 guards the stack, not the
    corpus' exact wording)."""
    from pyspark.sql import functions as F

    from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
        build_ivfpq_index,
    )
    from data_lakehouse_movilidad_publica_santiago_spark.operators.retrieval import (
        mmr_topk_ivfpq,
    )

    # labeled set: (heading, body) per markdown section with a real
    # heading and enough body to retrieve against
    pairs = []
    for f in sorted(REF.rglob("*.md")):
        text = f.read_text(encoding="utf-8", errors="replace")
        for block in re.split(r"\n(?=#)", text):
            lines = block.strip().splitlines()
            if not lines or not lines[0].lstrip().startswith("#"):
                continue
            heading = lines[0].lstrip("# ").strip()
            body = " ".join(" ".join(lines[1:]).split())
            if len(body) >= 200 and len(heading.split()) >= 2:
                pairs.append((heading, body))
    assert len(pairs) >= 24

    # signed feature-hashed BoW, dim 64 — one JVM-side expression
    # (aggregate over the token array), identical for docs and queries
    bow = (
        "CAST(aggregate("
        "  filter(split(lower(text), "
        "    '[^a-z0-9\\u00e1\\u00e9\\u00ed\\u00f3\\u00fa\\u00f1\\u00fc]+'"
        "  ), t -> length(t) > 2),"
        "  array_repeat(0.0D, 64),"
        "  (acc, t) -> transform(acc, (v, i) -> v + "
        "    IF(pmod(xxhash64(t), 64) = i,"
        "       IF(pmod(xxhash64(t, 7), 2) = 0, 1.0D, -1.0D), 0.0D))"
        ") AS ARRAY<FLOAT>)"
    )
    docs = spark.createDataFrame(
        [(i, f"{h} {b}") for i, (h, b) in enumerate(pairs)],
        "doc_id bigint, text string",
    )
    emb_path = tmp_path / "bow_emb.parquet"
    docs.select(
        F.col("doc_id").alias("vec_id"), F.expr(bow).alias("embedding")
    ).write.parquet(str(emb_path))
    emb = spark.read.parquet(str(emb_path))

    idx = str(tmp_path / "bow_idx")
    build_ivfpq_index(emb, idx, n_cells=4, m=8, ksub=16, store_vectors=True)

    qdf = spark.createDataFrame(
        [(i, h) for i, (h, _b) in enumerate(pairs)], "qid bigint, text string"
    ).select("qid", F.expr(bow).alias("qvec"))
    queries = {int(r["qid"]): [float(x) for x in r["qvec"]] for r in qdf.collect()}

    rr, top1 = [], 0
    for qid in sorted(queries)[:24]:
        got = mmr_topk_ivfpq(
            spark, idx, queries[qid], k=10, lam=0.7, n_probe=4
        ).collect()
        ranks = [r["rank"] for r in got if r["vec_id"] == qid]
        rr.append(1.0 / ranks[0] if ranks else 0.0)
        top1 += 1 if ranks and ranks[0] == 1 else 0
    mrr = sum(rr) / len(rr)
    assert mrr >= 0.45, f"MRR@10 {mrr:.3f} below the measured floor"
    assert top1 >= 9, f"only {top1}/24 headings rank their own section #1"
