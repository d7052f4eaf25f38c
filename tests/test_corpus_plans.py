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
    exchange_input_cols,
    explain_str,
    pushed_filters,
    window_partition_specs,
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
    q = corpus_gate.q_session_windows(spark, SF_CORRECTNESS)
    plan = explain_str(q)
    # session_window plans as aggregate, never as a window operator
    assert len(re.findall(r"\(\d+\) Window", plan)) == 0
    # ...with at most two key-hash exchanges
    assert len(exchange_input_cols(q)) <= 2


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
    specs = window_partition_specs(out)
    # the rank window exists AND carries a partition spec
    assert specs and all(sp.strip() for sp in specs), specs
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

    cols = exchange_input_cols(duplicated_spans(_docs(spark), window=8))
    assert cols  # the corpus dup-hash shuffle is real, not vacuous
    for c in cols:
        assert "text#" not in c, c


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


def test_sentence_dedup_no_window_no_sentence_text_in_exchanges(spark):
    """Round-7 rework contract: the keep-first decision is a
    min(struct) partial aggregate, NOT a window (a hot boilerplate
    sentence must never sort its whole partition on one task), and no
    hash Exchange carries exploded sentence text — decision rows are
    (doc_id, pos, md5) only; the single doc-row join is the only
    place document content moves."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.sentence_dedup import (
        fixed_width_sentences,
        sentence_dedup,
    )

    docs = _docs(spark)
    out = sentence_dedup(
        docs, fixed_width_sentences(F.col("text"), F.lit(5))
    )
    plan = explain_str(out)
    assert len(re.findall(r"\(\d+\) Window", plan)) == 0
    cols = exchange_input_cols(out)
    assert cols
    for c in cols:
        assert "__s#" not in c, c  # exploded sentence text never shuffles


def test_soft_dedup_gram_explode_and_exchange_shape(spark):
    """SoftDeDup's scoring join re-reads the SAME exploded-gram
    subtree as the frequency aggregation. At gate scale the count
    table broadcasts (map-side join); in the sort-merge regime the
    gram occurrences cross ONE full exchange (the join side) while
    the count side partial-aggregates map-side BEFORE its (much
    smaller) exchange. Pin both regimes: the explode never runs more
    than twice, and the count side keeps its skew-safe partial
    aggregate."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.soft_dedup import (
        soft_dedup,
    )

    plan = explain_str(soft_dedup(_docs(spark), n=3))
    assert "SortMergeJoin" not in plan  # broadcast regime
    assert len(re.findall(r"\(\d+\) Generate", plan)) <= 2
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        big = soft_dedup(_docs(spark), n=3)
        plan_big = explain_str(big)
        assert len(re.findall(r"\(\d+\) Generate", plan_big)) <= 2
        # the count side's exchange carries (gram, partial count):
        # aggregation happened map-side BEFORE the shuffle (skew-safe)
        assert any(
            "__gram#" in c and "count#" in c
            for c in exchange_input_cols(big)
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)


def test_trigram_backoff_single_gram_shape(spark):
    """Stupid-backoff scoring explodes the CORPUS once; the 7-Generate
    pin decomposes as 1 corpus scoring explode + reference-slice model
    subtrees re-evaluated per consumer (trigram 1, bigram ×2 joins,
    unigram ×2 joins, totals chains off unigrams = 6) — all reference-
    sized, broadcastable, and collapsible by persisting the model
    frames at scale. A regression that re-explodes the CORPUS per
    model join would push the count past 7."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.lm_filter import (
        score_stupid_backoff,
        train_trigram_lm,
    )

    docs = _docs(spark)
    model = train_trigram_lm(docs.filter(F.col("lang") == "en"))
    plan = explain_str(score_stupid_backoff(docs, model))
    assert len(re.findall(r"\(\d+\) Generate", plan)) <= 7


def test_tfidf_ranking_is_takeordered(spark):
    """tf-idf top-k never global-sorts the scored corpus."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.retrieval import (
        tfidf_topk,
    )

    plan = explain_str(tfidf_topk(_docs(spark), ["dup", "spark"], top_k=10))
    assert "TakeOrderedAndProject" in plan


def test_sq8_screen_takeordered_rescore_broadcast(spark):
    """SQ8 contract: the int8 screen ranks via TakeOrdered (local
    top-k per partition, no global sort) and the exact rescore joins
    the k*overfetch candidate ids by BROADCAST — a sort-merge join
    there would shuffle the whole corpus for 40 ids."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.similarity import (
        sq8_topk,
    )

    emb = spark.read.parquet(f"{SF_CORRECTNESS}/embeddings.parquet")
    q = [float(x) for x in
         emb.filter("vec_id = 0").collect()[0]["embedding"]]  # fmt: skip
    plan = explain_str(sq8_topk(emb, q, k=10))
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastExchange" in plan


def test_containment_and_novelty_exchanges_carry_hashes_only(spark):
    """Both shingle-probe operators shuffle (id, 32-hex) rows — no
    hash Exchange may carry the text column."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.containment import (
        containment_pairs,
    )
    from data_lakehouse_movilidad_publica_santiago_spark.operators.corpus_stats import (
        novelty_scores,
    )

    docs = _docs(spark)
    for df in (
        containment_pairs(docs, threshold=0.8, k=3, max_df=100),
        novelty_scores(
            docs.filter(F.col("doc_id") % 2 == 1),
            docs.filter(F.col("doc_id") % 2 == 0),
        ),
    ):
        cols = exchange_input_cols(df)
        assert cols
        for c in cols:
            assert "text#" not in c, c


def test_doremi_one_token_explode_no_text_exchange(spark):
    """DoReMi-lite with the (domain, word) relation pinned scans the
    corpus text once (one Generate feeding the cached relation's four
    consumers), and the KL/update chain shuffles (domain, word)
    counts only."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.data_mix import (
        doremi_weights,
    )

    pins: list = []
    try:
        out = doremi_weights(_docs(spark), "lang", pins=pins)
        plan = explain_str(out)
        assert len(re.findall(r"\(\d+\) Generate", plan)) == 1
        for c in exchange_input_cols(out):
            assert "text#" not in c, c
    finally:
        for p in pins:
            p.unpersist()
