"""Time-series resample + forward-fill (gap filling).

The hypertable-style ``time_bucket_gapfill`` / ``locf`` operation: put
an event stream on a regular time grid per key, filling empty buckets
by carrying the last observed value forward. Composed entirely of
built-in operators:

1. bucket + aggregate (one shuffle on (key, bucket)),
2. per-key bounds → ``sequence``-explode the dense grid (the grid is
   generated, never shuffled — its size is bounded by span/step per
   key, independent of event count),
3. left join grid←buckets on (key, bucket),
4. one per-key ordered window for the ``last(..., ignorenulls)``
   carry-forward.

Scale: everything partitions by key; no global window, no driver
loop. A key whose span/step ratio is pathological (one event in 1970,
one today, 1-second step) would explode its own grid — ``max_buckets``
guards that with a per-key error BEFORE the sequence materializes,
mirroring range_join's span guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_STEP_SECONDS = {
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
}


def _parse_step(step: str) -> tuple[int, str]:
    """'2 hours' → (7200, 'hour'); only calendar-stable units."""
    parts = step.split()
    if len(parts) != 2:
        raise ValueError(f"step must be '<n> <unit>' (got {step!r})")
    n, unit = int(parts[0]), parts[1].rstrip("s").lower()
    if n <= 0 or unit not in _STEP_SECONDS:
        raise ValueError(
            f"step must be a positive count of {sorted(_STEP_SECONDS)} "
            f"(got {step!r})"
        )
    return n * _STEP_SECONDS[unit], unit


def resample_ffill(
    df: DataFrame,
    step: str = "1 hour",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    max_buckets: int = 1_000_000,
) -> DataFrame:
    """Regular ``step`` grid per key from its first to last bucket:
    ``n_events`` (0 on gap buckets) and ``value_ffill`` — the bucket's
    last value by (ts, tiebreak) order, carried forward across gaps.

    The first grid bucket per key always holds an event, so
    ``value_ffill`` is never null. Buckets are epoch-aligned
    (``floor(epoch / step) * step``), so any step width lines the grid
    up with its own buckets — '2 hours' buckets at 00:00, 02:00, …"""
    step_seconds, _unit = _parse_step(step)
    # cast covers TIMESTAMP_NTZ scans (no direct NTZ→long cast); the
    # session runs UTC so the reinterpretation is value-preserving
    epoch_s = F.unix_seconds(F.col(ts_col).cast("timestamp"))
    bucket = F.timestamp_seconds(
        F.floor(epoch_s / step_seconds) * step_seconds
    )
    per_bucket = df.groupBy(
        F.col(key_col).alias("key"), bucket.alias("bucket")
    ).agg(
        F.count("*").alias("n_events"),
        F.max_by(
            value_col, F.struct(ts_col, tiebreak_col)
        ).alias("__last_value"),
    )
    bounds = per_bucket.groupBy("key").agg(
        F.min("bucket").alias("__b0"), F.max("bucket").alias("__b1")
    )
    # guard BEFORE the sequence materializes: span is computed
    # arithmetically from the bounds, so a pathological key fails the
    # job with a clear message instead of OOMing an executor
    n_buckets = (
        F.col("__b1").cast("long") - F.col("__b0").cast("long")
    ) / F.lit(step_seconds) + F.lit(1)
    guard = F.assert_true(
        n_buckets <= F.lit(max_buckets),
        F.concat(
            F.lit("resample_ffill: key "),
            F.col("key").cast("string"),
            F.lit(f" needs more than max_buckets={max_buckets} buckets"),
        ),
    )
    step_expr = F.expr(f"interval {step}")
    grid = bounds.select(
        "key",
        F.explode(
            F.when(
                guard.isNull(),
                F.sequence("__b0", "__b1", step_expr),
            )
        ).alias("bucket"),
    )
    joined = grid.join(per_bucket, ["key", "bucket"], "left")
    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col("key").alias(key_col),
        F.col("bucket"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.last("__last_value", ignorenulls=True).over(w).alias("value_ffill"),
    )
