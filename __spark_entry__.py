"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship aggregation at sf0.001;
``queries()`` exposes the SURVEY §2 operator inventory implemented in
``data_lakehouse_movilidad_publica_santiago_spark``; ``oracle_sql()``
gives the DuckDB-equivalent ANSI SQL per query for the driver's
differential correctness gate.

The driver's CORRECTNESS snapshot covers the FIRST 50 entries of
``queries()`` in dict-insertion order, so the merge below is an explicit
rotation schedule: gates that have not yet appeared in a driver
CORRECTNESS_r*.json are ordered first, backfilled with a sample of
already-snapshotted gates; later rounds rotate again so every gate
eventually carries a driver-recorded green row.  All 107 gates stay
present regardless of order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_lakehouse_movilidad_publica_santiago_spark.analytics import (
    business_gate,
    corpus_gate,
    inventory,
    inventory_llm,
    lake_gate,
    sql_surface_gate,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return inventory.q_pricing_summary(spark, "/root/testdata/sf0.001")


# Round-7 rotation: every gate that had no row in CORRECTNESS_r01..r05
# (verified against the artifacts; the driver wrote no r06 snapshot),
# ordered first so the driver's 50-entry window finally records them.
# 43 never-snapshotted round-5 gates + the 5 round-6 additions
# (c4_rules / bpe_train / bpe_encode / pack_sequences /
# temperature_mix) + 2 of the round-7 additions = exactly 50; the
# other 4 round-7 gates follow immediately after the window, then the
# previously-green gates — all runnable by tests/scripts regardless.
_ROTATION_FIRST: tuple[str, ...] = (
    # lake / transactional table format (3)
    "txn_merge_upsert",
    "txn_time_travel",
    "txn_delete_skipping",
    # SQL surface (11)
    "rollup_revenue",
    "cube_orders",
    "grouping_sets_geo",
    "pivot_status_matrix",
    "resample_ffill_hourly",
    "salted_join_demand",
    "profile_orders",
    "hll_rollup",
    "cms_frequency",
    "set_ops_customers",
    "except_all_lineitems",
    # corpus / LLM-data operators (16)
    "pii_scan",
    "pii_redact",
    "repetition_stats",
    "ngram_topk",
    "rag_chunks",
    "global_shuffle",
    "session_windows",
    "corpus_build_summary",
    "lm_perplexity",
    "span_dedup",
    "kmeans_assign",
    "semantic_dedup",
    "gopher_rules",
    "logreg_quality",
    "dsir_selection",
    "bm25_topk",
    # business corpus shapes never snapshotted (13)
    "biz_q2_critical_parts",
    "biz_q4_order_complexity",
    "biz_q5_role_joins",
    "biz_q6_pct_of_peak",
    "biz_q7_captive_users",
    "biz_q8_coverage_quartiles",
    "biz_q9_intermodality",
    "biz_q10_deviation_factor",
    "biz_q11_transfer_propensity",
    "biz_q12_wait_percentiles",
    "biz_q13_coverage_audit",
    "biz_q14_daily_lag",
    "biz_q15_efficiency_profile",
    # round-6 additions, never snapshotted (5)
    "c4_rules",
    "bpe_train",
    "bpe_encode",
    "pack_sequences",
    "temperature_mix",
    # round-7 additions (first 2 of 6; the rest follow the window)
    "tfidf_topk",
    "sentence_dedup",
    # round-7 overflow — positions 51-57 (wave 2 included)
    "soft_dedup",
    "contamination_matrix",
    "trigram_ppl",
    "zipf_spectrum",
    "containment_near_dup",
    "doremi_weights",
    "novelty_scores",
)


def _rotated(merged: dict) -> dict:
    ordered = {k: merged[k] for k in _ROTATION_FIRST}
    ordered.update((k, v) for k, v in merged.items() if k not in ordered)
    return ordered


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, plus the
    LLM-data-pipeline operator suite (dedup / similarity / text /
    multimodal / tumbling windows) and the business-corpus shape
    twins (analytics/business_gate.py).  Insertion order follows the
    rotation schedule documented at module top."""
    return _rotated(
        {
            **inventory.QUERIES,
            **inventory_llm.QUERIES,
            **business_gate.QUERIES,
            **corpus_gate.QUERIES,
            **sql_surface_gate.QUERIES,
            **lake_gate.QUERIES,
        }
    )


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent per query (same aliases).
    Every key in ``queries()`` has a full oracle — including the
    probabilistic operators (MinHash-LSH, SimHash, LSH-ANN), whose
    oracles replay the exact seeded hash algebra in SQL, and the
    multimodal Python stages, whose oracles recompute the Arrow-batch
    features from the raw bytes.  98/98 value-hash-checkable."""
    return _rotated(
        {
            **inventory.ORACLE,
            **inventory_llm.ORACLE,
            **business_gate.ORACLE,
            **corpus_gate.ORACLE,
            **sql_surface_gate.ORACLE,
            **lake_gate.ORACLE,
        }
    )
