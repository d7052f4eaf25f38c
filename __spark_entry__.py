"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship aggregation at sf0.001;
``queries()`` exposes the SURVEY §2 operator inventory implemented in
``data_lakehouse_movilidad_publica_santiago_spark``; ``oracle_sql()``
gives the DuckDB-equivalent ANSI SQL per query for the driver's
differential correctness gate.

The driver's CORRECTNESS snapshot covers the FIRST 50 entries of
``queries()`` in dict-insertion order, so the ordering below is an
explicit rotation schedule: gates that have not yet appeared in any
driver CORRECTNESS_r*.json are ordered first; the remainder of the
window backfills automatically with already-snapshotted gates in
module insertion order.  Every gate stays present regardless of
order — the total is ``len(queries())`` (asserted equal between
``queries()`` and ``oracle_sql()`` by ``tests/test_entry_contract.py``),
and every key has a full value-hash DuckDB oracle.
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


# Round-8 rotation: the 10 gates with no green row in any of
# CORRECTNESS_r01..r07 (verified against the artifacts: union of green
# rows = 100 of 110), ordered first so the driver's 50-entry window
# finally records them; round-8 additions follow (also never
# snapshotted).  Positions after the tuple backfill with
# already-snapshotted gates in module insertion order.
_ROTATION_FIRST: tuple[str, ...] = (
    # round-7 gates never snapshotted (10)
    "soft_dedup",
    "contamination_matrix",
    "trigram_ppl",
    "zipf_spectrum",
    "containment_near_dup",
    "doremi_weights",
    "novelty_scores",
    "mmr_topk",
    "sq8_knn",
    "sq8_knn_indexed",
    # round-8 additions (never snapshotted)
    "mmr_topk_pooled",
    "pq_knn",
    "pq_knn_indexed",
    "ivfpq_knn",
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
    features from the raw bytes.  All value-hash-checkable."""
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
