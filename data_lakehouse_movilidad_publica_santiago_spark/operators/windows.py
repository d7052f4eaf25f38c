"""Window-function operators used across serving + analytics.

Parity: modal-coordinate vote / top-k per group (reference
src/webapp/query_service.py:163-201), percent-of-total
(docs/queries Q4/Q7/Q9), percent-of-peak (Q6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group: list[str],
    order_by: list[Column | str],
    k: int = 1,
    rank_col: str | None = None,
) -> DataFrame:
    """Keep the top-k rows per group under ``order_by`` (row_number
    semantics — ties broken by order, deterministic iff order is)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    w = Window.partitionBy(*group).orderBy(*cols)
    out = df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    if rank_col:
        return out.withColumnRenamed("_rn", rank_col)
    return out.drop("_rn")


def pct_of_total(
    metric: Column,
    partition_by: list[str] | None = None,
    ndigits: int | None = None,
) -> Column:
    """``100.0 * metric / SUM(metric) OVER (PARTITION BY …)``.

    Empty ``partition_by`` = grand total over the whole result
    (``OVER ()``), the Q4/Q7/Q9 shape.
    """
    w = Window.partitionBy(*(partition_by or []))
    out = F.lit(100.0) * metric / F.sum(metric).over(w)
    return F.round(out, ndigits) if ndigits is not None else out
