"""AS-OF (temporal/range) join and SCD2 timeline construction.

Parity:
- as-of join: facts resolve SCD2 surrogate keys with
  ``bk = bk AND valid_from <= event_dt AND (valid_to IS NULL OR
  event_dt <= valid_to)`` (reference src/gold/load_gold.py:1109-1118,
  1144-1154, 1308-1325, 1460-1483; supporting index ddl_gold.sql:716-732).
- timeline build: ordered multi-snapshot SCD2 (valid_from = snapshot
  date, valid_to = next change − 1 day) — the set-based form of the
  reference's row-wise loop (load_sqlite.py:460-482; load_gold.py:295-439).

Spark-first: the equality on the business key makes this a HASH join
(broadcast for dim-sized tables) with the validity window evaluated as
a residual join condition — NOT a BroadcastNestedLoopJoin. Version
windows per BK are non-overlapping, so at most one dim row matches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    fact: DataFrame,
    dim: DataFrame,
    bk: str | list[str],
    event_time: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Join each fact row to the dim version valid at its event time.

    ``valid_to IS NULL`` marks the open (current) version; bounds are
    inclusive on both ends, matching the reference's BETWEEN-style
    predicate.
    """
    bks = [bk] if isinstance(bk, str) else list(bk)
    d = F.broadcast(dim) if broadcast_dim else dim
    cond = None
    for k in bks:
        c = fact[k] == d[k]
        cond = c if cond is None else (cond & c)
    et = fact[event_time]
    cond = cond & (d[valid_from] <= et) & (d[valid_to].isNull() | (et <= d[valid_to]))
    joined = fact.join(d, cond, how)
    # drop the dim's duplicate BK columns; fact's survive
    for k in bks:
        joined = joined.drop(d[k])
    return joined


def snapshots_to_scd2(
    snapshots: DataFrame,
    bk: str | list[str],
    event_date: str,
    attrs: list[str],
    change_hash: Column | None = None,
) -> DataFrame:
    """Collapse (bk, event_date, attrs…) snapshots into an SCD2 table.

    Steps (all set-based, two window shuffles on the BK):
    1. one row per (bk, event_date): ``first(attr)`` consolidation
       (load_gold.py:955-961 parity);
    2. drop consecutive versions whose change hash is unchanged
       (same-hash ⇒ no new version);
    3. valid_from = event_date, valid_to = next valid_from − 1 day,
       is_current = (valid_to IS NULL).

    Returns columns: bk…, attrs…, row_hash, valid_from, valid_to,
    is_current.
    """
    from ..functions.hashing import row_hash as _row_hash

    bks = [bk] if isinstance(bk, str) else list(bk)
    one = snapshots.groupBy(*bks, event_date).agg(
        *[F.first(a, ignorenulls=True).alias(a) for a in attrs]
    )
    h = change_hash if change_hash is not None else _row_hash(*attrs)
    one = one.withColumn("row_hash", h)

    w = Window.partitionBy(*bks).orderBy(event_date)
    changed = one.withColumn("_prev_hash", F.lag("row_hash").over(w)).filter(
        F.col("_prev_hash").isNull() | (F.col("_prev_hash") != F.col("row_hash"))
    )
    return (
        changed.withColumn("valid_from", F.col(event_date))
        .withColumn(
            "valid_to",
            F.date_sub(F.lead("valid_from").over(w), 1),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("_prev_hash", event_date)
    )
