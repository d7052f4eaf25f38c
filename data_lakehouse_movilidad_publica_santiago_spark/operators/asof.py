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

Three strategies by dim size (all plan-asserted in tests):
- ``asof_join(broadcast_dim=True)``: broadcast hash + residual —
  dims under the broadcast threshold (the reference's ~12k-row dims);
- ``asof_join(broadcast_dim=False)``: shuffle sort-merge on the BK +
  residual — big dims with modest per-BK version counts;
- ``asof_join_merge``: union + carry-forward window, no join at all —
  unbounded dim size AND version counts (the 100 TB hardening path).
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


def asof_join_merge(
    fact: DataFrame,
    dim: DataFrame,
    bk: str | list[str],
    event_time: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """As-of join for dims too large to broadcast: union + carry-forward
    window instead of a join.

    The broadcast path (``asof_join``) needs the dim to fit the
    broadcast threshold; the shuffle-hash/sort-merge path
    (``broadcast_dim=False``) is fine while per-BK version counts are
    modest but still materializes every (fact row × candidate version)
    pair before the residual filter. This path has NO join at all:

    1. union dim version-starts and fact events into one stream of
       (bk, ts, is_dim) rows — dim rows sort before fact rows at equal
       ts so ``valid_from <= event_time`` stays inclusive;
    2. one window over ``partitionBy(bk).orderBy(ts, is_dim DESC)``
       with ``last(dim_payload, ignorenulls=True)`` carries the most
       recent version forward onto each fact row;
    3. validate the carried version's ``valid_to`` (SCD2 gaps resolve
       to no-match), null the dim columns (left) or drop (inner).

    One shuffle on the BK, running-window state = one dim struct —
    scales to arbitrarily large dims and version counts. Same
    semantics as ``asof_join`` (verified equal in tests; the
    ``asof_merge_resolve`` gate query shares ``asof_resolve``'s SQL
    oracle). Reference predicate: src/gold/load_gold.py:1109-1118.
    """
    bks = [bk] if isinstance(bk, str) else list(bk)
    fact_payload = [c for c in fact.columns if c not in bks]
    dim_payload = [c for c in dim.columns if c not in bks]
    et_type = fact.schema[event_time].dataType

    fact_struct = F.struct(*[fact[c] for c in fact_payload])
    dim_struct = F.struct(*[dim[c] for c in dim_payload])
    fact_struct_type = fact.select(fact_struct.alias("s")).schema["s"].dataType
    dim_struct_type = dim.select(dim_struct.alias("s")).schema["s"].dataType

    f_rows = fact.select(
        *[F.col(k) for k in bks],
        F.col(event_time).cast(et_type).alias("_ts"),
        F.lit(0).alias("_is_dim"),
        fact_struct.alias("_fact"),
        F.lit(None).cast(dim_struct_type).alias("_dim"),
    )
    d_rows = dim.select(
        *[F.col(k) for k in bks],
        F.col(valid_from).cast(et_type).alias("_ts"),
        F.lit(1).alias("_is_dim"),
        F.lit(None).cast(fact_struct_type).alias("_fact"),
        dim_struct.alias("_dim"),
    )

    w = (
        Window.partitionBy(*bks)
        .orderBy(F.col("_ts").asc(), F.col("_is_dim").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        f_rows.unionByName(d_rows)
        .withColumn("_v", F.last("_dim", ignorenulls=True).over(w))
        .filter(F.col("_is_dim") == 0)
    )
    valid = F.col("_v").isNotNull() & (
        F.col(f"_v.{valid_to}").isNull()
        | (F.col("_ts") <= F.col(f"_v.{valid_to}"))
    )
    if how == "inner":
        carried = carried.filter(valid)
        dim_cols = [F.col(f"_v.{c}").alias(c) for c in dim_payload]
    elif how == "left":
        dim_cols = [
            F.when(valid, F.col(f"_v.{c}")).alias(c) for c in dim_payload
        ]
    else:  # pragma: no cover - contract
        raise ValueError(f"asof_join_merge supports left/inner, got {how!r}")
    return carried.select(
        *[F.col(k) for k in bks],
        *[F.col(f"_fact.{c}").alias(c) for c in fact_payload],
        *dim_cols,
    )


def snapshots_to_scd2(
    snapshots: DataFrame,
    bk: str | list[str],
    event_date: str,
    attrs: list[str],
    change_hash: Column | None = None,
    pre_consolidated: bool = False,
) -> DataFrame:
    """Collapse (bk, event_date, attrs…) snapshots into an SCD2 table.

    Steps (all set-based, two window shuffles on the BK):
    1. one row per (bk, event_date): ``first(attr)`` consolidation
       (load_gold.py:955-961 parity) — skipped when the caller
       already guarantees the grain (``pre_consolidated=True``),
       saving a SortAggregate pass;
    2. drop consecutive versions whose change hash is unchanged
       (same-hash ⇒ no new version);
    3. valid_from = event_date, valid_to = next valid_from − 1 day,
       is_current = (valid_to IS NULL).

    Returns columns: bk…, attrs…, row_hash, valid_from, valid_to,
    is_current.
    """
    from ..functions.hashing import row_hash as _row_hash

    bks = [bk] if isinstance(bk, str) else list(bk)
    if pre_consolidated:
        one = snapshots.select(*bks, event_date, *attrs)
    else:
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
