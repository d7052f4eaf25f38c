"""Generic interval (range) join: points × overlapping intervals with
NO equality key — the case Catalyst can only plan as a
BroadcastNestedLoopJoin (small side) or cartesian product (both big).

``interval_join`` manufactures the missing equality key by bucketing
the time axis: a point lands in bucket floor(p/w); an interval
[lo, hi] is exploded to every bucket it overlaps. A matching
(point, interval) pair co-locates in EXACTLY one bucket — the
point's — so the bucket equi-join + residual ``lo <= p <= hi`` is
duplicate-free by construction (no post-join dedup shuffle).

This is the band/range-join strategy of the published Databricks
range-join optimization and TimescaleDB chunk exclusion, expressed in
plain DataFrame ops. Scale shape: one shuffle on the bucket key for
each side; per-bucket work is |points_in_bucket| × |intervals
overlapping that bucket| — bounded by choosing ``bucket_width`` near
the typical interval length (wider → fewer interval replicas,
narrower → tighter candidate sets). Skewed buckets fall to AQE skew
handling like any other equi-join.

The reference's only range predicate is the SCD2 validity window,
which carries a business-key equality (``operators/asof.py``); this
operator covers the keyless generalization (e.g. "events within any
maintenance window").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width_days: int = 7,
    max_span_buckets: int = 100_000,
) -> DataFrame:
    """Inner-join each point row to every interval row whose
    ``[lo_col, hi_col]`` (inclusive) contains ``point_col``.
    Date/timestamp columns are bucketed on epoch days.

    Malformed intervals are handled defensively: ``hi < lo`` rows are
    dropped (an inclusive interval with hi < lo contains nothing — it
    can never satisfy the residual, so dropping preserves semantics
    while preventing a descending ``sequence``), and an interval
    spanning more than ``max_span_buckets`` buckets (e.g. an
    open-ended hi of 9999-12-31) fails the stage with a descriptive
    error instead of exploding an unbounded per-row sequence into an
    OOM.  Raise ``max_span_buckets`` deliberately for genuinely huge
    intervals — at the default 7-day width the default cap already
    admits ~1,900 years.
    """
    w = int(bucket_width_days)
    p_epoch = F.datediff(F.col(point_col), F.lit("1970-01-01"))
    lo_epoch = F.datediff(F.col(lo_col), F.lit("1970-01-01"))
    hi_epoch = F.datediff(F.col(hi_col), F.lit("1970-01-01"))

    lo_b, hi_b = F.floor(lo_epoch / w), F.floor(hi_epoch / w)
    span = hi_b - lo_b + 1
    guarded_seq = F.when(
        span <= F.lit(int(max_span_buckets)), F.sequence(lo_b, hi_b)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("interval_join: interval spans "),
                span.cast("string"),
                F.lit(
                    f" buckets (> max_span_buckets={int(max_span_buckets)});"
                    " widen bucket_width_days or raise the cap"
                ),
            )
        )
    )
    pts = points.withColumn("_bucket", F.floor(p_epoch / w))
    ivl = intervals.where(F.col(lo_col) <= F.col(hi_col)).withColumn(
        "_bucket", F.explode(guarded_seq)
    )
    residual = (F.col(lo_col) <= F.col(point_col)) & (
        F.col(point_col) <= F.col(hi_col)
    )
    return (
        pts.join(ivl, on=["_bucket"], how="inner")
        .where(residual)
        .drop("_bucket")
    )
