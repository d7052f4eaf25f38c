"""Physical-plan assertions for the corpus-prep and SQL-surface
operators: the shapes that matter at 100 TB — map-only where a
shuffle isn't needed, one Expand pass for multi-level aggregates,
filter pushdown through the resample pipeline."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from data_lakehouse_movilidad_publica_santiago_spark.analytics import (
    corpus_gate,
    sql_surface_gate,
)
from data_lakehouse_movilidad_publica_santiago_spark.operators.chunking import (
    chunk_documents,
)
from data_lakehouse_movilidad_publica_santiago_spark.operators.pii import (
    redact_pii,
)
from data_lakehouse_movilidad_publica_santiago_spark.plans.checks import (
    explain_str,
    pushed_filters,
)

from conftest import SF_CORRECTNESS


def _docs(spark):
    return spark.read.parquet(f"{SF_CORRECTNESS}/documents.parquet")


def test_chunking_and_redaction_are_map_only(spark):
    """Chunking and redaction are narrow stages: no Exchange in the
    plan — at 100 TB they stream through executors with zero shuffle."""
    plan_chunks = explain_str(chunk_documents(_docs(spark)))
    assert "Exchange" not in plan_chunks
    plan_redact = explain_str(
        _docs(spark).select("doc_id", redact_pii(F.col("text")))
    )
    assert "Exchange" not in plan_redact
    # and no Python stage: pure JVM regex/array expressions
    for plan in (plan_chunks, plan_redact):
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def test_rollup_cube_single_expand_single_scan(spark):
    """ROLLUP/CUBE compute every grouping set from ONE scan via ONE
    Expand operator — never one pass per level."""
    for q in (
        sql_surface_gate.q_rollup_revenue,
        sql_surface_gate.q_cube_orders,
    ):
        plan = explain_str(q(spark, SF_CORRECTNESS))
        # formatted mode lists each node once in the tree and once in
        # the details — count the numbered detail entries
        assert len(re.findall(r"\(\d+\) Expand", plan)) == 1
        assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_session_window_is_single_key_shuffle(spark):
    """Sessionization shuffles once on the key; no global (empty
    partition spec) window drags the stream to one task."""
    plan = explain_str(
        corpus_gate.q_session_windows(spark, SF_CORRECTNESS)
    )
    # no unpartitioned Window node (empty partition-spec group) may
    # appear — session_window should plan as aggregate, not window
    for m in re.finditer(r"Window \[(.*?)\], \[(.*?)\]", plan):
        assert m.group(2).strip(), "unpartitioned window in session_windows"
    # session_window plans as (partial) aggregate + exchange on key
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2


def test_resample_pushes_key_filter_to_scan(spark):
    """The gate's user subset filter must reach the parquet scan —
    at scale the resample reads 1/10th of the events, not all of
    them."""
    df = corpus_gate  # noqa: F841  (import anchor)
    q = sql_surface_gate.q_resample_ffill_hourly(spark, SF_CORRECTNESS)
    plan = explain_str(q)
    # the events scan appears with a pushed predicate on user_id
    assert any("user_id" in f for f in pushed_filters(q)) or (
        "PushedFilters: [IsNotNull(user_id)" in plan
    )


def test_global_shuffle_no_single_partition_window(spark):
    """The rank window must be partitioned (by __pid) — a bare
    row_number() over a global ORDER BY would single-thread the
    corpus."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.chunking import (
        global_shuffle,
    )

    out = global_shuffle(_docs(spark), seed="plan-probe", n_parts=4)
    plan = explain_str(out)
    assert "windowspartitionspec" not in plan.lower()
    # every Window operator carries a partition spec
    for m in re.finditer(r"Window \[(.*?)\], \[(.*?)\]", plan):
        assert m.group(2).strip(), "unpartitioned window in global_shuffle"
    out.sparkSession.catalog.clearCache()


def test_bm25_no_explode_and_topk(spark):
    """BM25 term frequencies are per-row array expressions: the plan
    has NO Generate (explode) node, and ranking is
    TakeOrderedAndProject — never a global Sort."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.retrieval import (
        bm25_topk,
    )

    plan = explain_str(bm25_topk(_docs(spark), ["dup", "spark"], top_k=10))
    assert "Generate" not in plan
    assert "TakeOrderedAndProject" in plan


def test_lm_score_model_joins_broadcast(spark):
    """The LM scoring joins (bigram + unigram + |V| scalar) broadcast
    the model side: no SortMergeJoin, and the only hash Exchanges are
    the model-count aggregations + the per-doc combine."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.lm_filter import (
        score_perplexity,
        train_bigram_lm,
    )

    docs = _docs(spark)
    model = train_bigram_lm(docs.filter(F.col("lang") == "en"))
    plan = explain_str(score_perplexity(docs, model, include_empty=False))
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastExchange") >= 3


def test_span_dedup_corpus_shuffle_carries_hashes_only(spark):
    """The corpus-wide stage of span dedup (dup-hash groupBy) must
    shuffle md5 hashes, not text: no Exchange in the plan may carry
    the text column."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.span_dedup import (
        duplicated_spans,
    )

    plan = explain_str(duplicated_spans(_docs(spark), window=8))
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m.group(1)


def test_dsir_one_gram_shape_broadcast_models(spark):
    """DSIR's contract: the two scoring passes reuse ONE gram-explode
    shape each and every model join broadcasts — no SortMergeJoin may
    appear, ranking is TakeOrdered (never a global Sort), and the
    Generate (explode) count stays pinned at 8 (2 scoring explodes +
    2×(unigram+bigram) training explodes for the target and raw
    models, plus the word_ngrams padding filter sharing its explode).
    A regression that re-explodes the corpus per join breaks this."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.lm_filter import (
        dsir_select,
    )

    plan = explain_str(
        dsir_select(_docs(spark), F.col("lang") == "en", top_k=10)
    )
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan
    assert len(re.findall(r"\(\d+\) Generate", plan)) <= 8


def test_logreg_gradient_single_agg_scoring_map_only(spark):
    """logreg's contract: one aggregate pass per GD step (map-side
    partials, a single SinglePartition exchange bringing k+1 doubles
    to the driver), and scoring with literal weights is a pure map
    stage — no Exchange, no Join, no Python."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.logreg import (
        _sigmoid_sql,
        _z_sql,
        logreg_score,
    )

    feats = _docs(spark).select(
        "doc_id", (F.length("text") / F.lit(100.0)).alias("f1")
    )
    grad = feats.agg(
        F.round(
            F.avg(F.expr(_sigmoid_sql(_z_sql([0.0, 0.0], ["f1"])))),
            6,
        ).alias("g0")
    )
    gplan = explain_str(grad)
    assert len(re.findall(r"\(\d+\) Exchange", gplan)) == 1
    assert "SinglePartition" in gplan
    assert "Join" not in gplan

    splan = explain_str(logreg_score(feats, [0.1, 0.2], ["f1"]))
    assert "Exchange" not in splan
    assert "Join" not in splan
    assert "Python" not in splan


def test_kmeans_assign_stage_is_map_side(spark):
    """The k-means assignment against literal centroids is a pure map
    stage: scan + project, no Exchange, no Join."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.kmeans import (
        _dist_sql,
    )

    emb = spark.read.parquet(f"{SF_CORRECTNESS}/embeddings.parquet")
    centroid = [0.1] * 64
    scored = emb.select(
        "vec_id", F.expr(_dist_sql("embedding", centroid, 64)).alias("d")
    )
    plan = explain_str(scored)
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_c4_battery_is_map_only(spark):
    """The whole C4 line+page battery is pure Column expressions: no
    Exchange, no Python stage — it streams at 100 TB."""
    from data_lakehouse_movilidad_publica_santiago_spark.functions.c4 import (
        c4_kept_lines,
        c4_reason,
    )

    plan = explain_str(
        _docs(spark).select(
            "doc_id",
            c4_reason(F.col("text")).alias("r"),
            F.array_join(c4_kept_lines(F.col("text")), "\n").alias("t"),
        )
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_bpe_pair_counts_partial_agg_vocab_shuffle(spark):
    """BPE's per-merge cost contract: pair counting plans a partial
    (map-side) HashAggregate before the exchange, and the exchange
    keys on the pair — the shuffle carries (l, r, partial sum) rows,
    vocab-bounded, never corpus rows."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.bpe import (
        _init_syms,
        _pair_counts,
        word_counts,
    )

    plan = explain_str(_pair_counts(_init_syms(word_counts(_docs(spark)))))
    # partial_sum before the pair exchange = map-side combine
    assert re.search(r"partial_sum", plan)
    assert re.search(r"hashpartitioning\(l#\d+, r#\d+", plan)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bpe_encode_is_broadcast_vocab_join(spark):
    """Encoding never re-derives symbols from text: one broadcast
    join against the trained word table + one aggregate."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.bpe import (
        bpe_encode_counts,
        bpe_train,
    )

    _, words = bpe_train(_docs(spark).limit(50), num_merges=2)
    plan = explain_str(bpe_encode_counts(_docs(spark), words))
    assert "BroadcastHashJoin" in plan
    # the corpus side does no per-character transform: no posexplode
    # of character sequences, only the word split
    assert "substring(word" not in plan
    spark.catalog.clearCache()
