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


def dedup_max_by(
    df: DataFrame,
    grain: list[str],
    order_col: str,
    descending: bool = True,
) -> DataFrame:
    """Keep-latest dedup as a ``max_by``/``min_by`` AGGREGATE instead
    of a row_number window: map-side combinable (partial aggregation
    before the shuffle), no per-partition sort — the scale path for
    the pre-MERGE fact dedups where the window version shuffles every
    full row. Ties on ``order_col`` pick an arbitrary winner, same as
    the reference's single-key ORDER BY.

    NULL safety: ``max_by(struct, key)`` skips rows whose key is NULL,
    so a group where EVERY row has a NULL ``order_col`` would collapse
    to a NULL struct — grain keys kept, every other column nulled
    (silent corruption for nullable order columns like
    ``parada_subida`` / ``ts_board``). We therefore order by a struct
    key ``(order_col IS [NOT] NULL, order_col)``: the key itself is
    never NULL, rows with a real ``order_col`` always beat NULL rows,
    and an all-NULL group still keeps one real row (arbitrary, same as
    a tie)."""
    others = [c for c in df.columns if c not in grain]
    if descending:
        picker = F.max_by
        # non-null key sorts above null key under MAX
        key = F.struct(
            F.col(order_col).isNotNull().alias("_present"),
            F.col(order_col).alias("_k"),
        )
    else:
        picker = F.min_by
        # non-null key sorts below null key under MIN
        key = F.struct(
            F.col(order_col).isNull().alias("_absent"),
            F.col(order_col).alias("_k"),
        )
    packed = df.groupBy(*grain).agg(picker(F.struct(*others), key).alias("_w"))
    return packed.select(*grain, *[F.col(f"_w.{c}").alias(c) for c in others])
