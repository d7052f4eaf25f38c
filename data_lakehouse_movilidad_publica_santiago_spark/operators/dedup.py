"""Grain deduplication.

Parity: ``ROW_NUMBER() OVER (PARTITION BY grain ORDER BY ts DESC)``
keep-first dedup before every fact MERGE (reference
src/gold/load_gold.py:1076-1084, 1235-1243, 1390-1393, 1561-1566).

Where the reference orders by ``(SELECT NULL)`` (arbitrary winner) we
require an explicit deterministic tiebreak — a documented deviation
(SURVEY §7.4.5): nondeterministic winners break differential testing
and re-runs at scale.

Scale note: a single window shuffle on the grain keys; at 100 TB
prefer passing ``order_by`` columns that make the partial aggregation
(max-struct trick unnecessary — row_number is fine post-AQE) skew-safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_keep_latest(
    df: DataFrame,
    grain: list[str],
    order_by: list[Column | str],
) -> DataFrame:
    """Keep exactly one row per grain, the first under ``order_by``.

    ``order_by`` should end with a unique-ish tiebreak column to be
    fully deterministic.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    w = Window.partitionBy(*grain).orderBy(*cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
