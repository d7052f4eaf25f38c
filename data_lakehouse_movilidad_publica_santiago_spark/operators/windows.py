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


def quantile_buckets(
    df: DataFrame,
    col: str,
    n_buckets: int = 4,
    descending: bool = True,
    exact: bool = False,
    accuracy: int = 10000,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Scalable NTILE replacement: range-bucket on percentile
    boundaries instead of a global-order window.

    ``NTILE(n) OVER (ORDER BY col)`` moves the entire input through a
    SINGLE partition (the reference's Q8 shape,
    docs/queries/03_infraestructura.sql — inert at its ~12k-row stop
    dimension, fatal at a billion rows). Here the boundaries come from
    one small aggregate — ``approx_percentile`` (GK sketch, map-side
    combinable) by default, exact ``percentile`` when ``exact=True``
    for differential-testable runs — broadcast back as a 1-row
    dimension, and the bucket assignment is a pure Column CASE chain:
    no window, no global sort, no shuffle beyond the boundary
    aggregate's reduce.

    Documented deviation from NTILE: equal values always land in the
    same bucket, so bucket sizes are only equal up to ties at the
    boundaries (NTILE splits ties arbitrarily to force equal sizes —
    a property that requires the global sort we're avoiding).

    With ``descending=True`` (the Q8 shape) bucket 1 holds the top
    values."""
    probs = [i / n_buckets for i in range(1, n_buckets)]
    fn = "percentile" if exact else "approx_percentile"
    acc = "" if exact else f", {accuracy}"
    bounds = df.agg(
        *[
            F.expr(f"{fn}({col}, {p}{acc})").alias(f"_qb_{i}")
            for i, p in enumerate(probs)
        ]
    )
    with_bounds = df.crossJoin(F.broadcast(bounds))
    # boundaries ascend: _qb_0 < _qb_1 < ...; the When chain reads
    # top-down from the outermost range
    chain = None
    if descending:
        for b in range(len(probs), 0, -1):
            cond = F.col(col) >= F.col(f"_qb_{b - 1}")
            bucket_no = F.lit(len(probs) - b + 1)
            chain = (
                F.when(cond, bucket_no)
                if chain is None
                else chain.when(cond, bucket_no)
            )
        chain = chain.otherwise(F.lit(n_buckets))
    else:
        for b in range(len(probs), 0, -1):
            cond = F.col(col) > F.col(f"_qb_{b - 1}")
            chain = (
                F.when(cond, F.lit(b + 1))
                if chain is None
                else chain.when(cond, F.lit(b + 1))
            )
        chain = chain.otherwise(F.lit(1))
    return with_bounds.withColumn(bucket_col, chain).drop(
        *[f"_qb_{i}" for i in range(len(probs))]
    )


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


def sessionize(
    df: DataFrame,
    gap: str = "30 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Session windows over an event stream, computed in batch with
    the same ``session_window`` primitive Structured Streaming uses
    (SURVEY §2.10's stateful-session shape): events for one key merge
    into a session while each is within ``gap`` of the session's
    current end; ``session_end`` = last event + gap. Per-event ranges
    ``[ts, ts+gap)`` union when they overlap OR touch, so an event at
    exactly the previous end still EXTENDS the session (a new session
    needs a strictly greater-than-gap silence).

    One shuffle on the key, merged by the native session-window
    aggregation (dynamic gap would also plan the same way). Scales per
    key-partition; no per-key state on the driver. The differential
    oracle is the classic gaps-and-islands SQL (lag → break flag →
    running island id) — see analytics/corpus_gate.py."""
    aggs = aggs or [F.count("*").alias("n_events")]
    agged = df.groupBy(
        F.session_window(F.col(ts_col), gap).alias("w"), key_col
    ).agg(*aggs)
    metric_cols = [c for c in agged.columns if c not in ("w", key_col)]
    return agged.select(
        key_col,
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        *metric_cols,
    )
