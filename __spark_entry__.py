"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship aggregation at sf0.001;
``queries()`` exposes the SURVEY §2 operator inventory implemented in
``data_lakehouse_movilidad_publica_santiago_spark``; ``oracle_sql()``
gives the DuckDB-equivalent ANSI SQL per query for the driver's
differential correctness gate.
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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, plus the
    LLM-data-pipeline operator suite (dedup / similarity / text /
    multimodal / tumbling windows) and the business-corpus shape
    twins (analytics/business_gate.py)."""
    return {
        **inventory.QUERIES,
        **inventory_llm.QUERIES,
        **business_gate.QUERIES,
        **corpus_gate.QUERIES,
        **sql_surface_gate.QUERIES,
        **lake_gate.QUERIES,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent per query (same aliases).
    Probabilistic operators (MinHash-LSH, SimHash, LSH-ANN) and the
    Python-stage multimodal feature extractor are intentionally
    absent → rows-only check; their exact counterparts are
    oracle-verified."""
    return {
        **inventory.ORACLE,
        **inventory_llm.ORACLE,
        **business_gate.ORACLE,
        **corpus_gate.ORACLE,
        **sql_surface_gate.ORACLE,
        **lake_gate.ORACLE,
    }
