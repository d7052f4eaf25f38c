"""Keyless interval join: correctness vs a nested-loop reference and
the no-cartesian plan guarantee."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from data_lakehouse_movilidad_publica_santiago_spark.operators.range_join import (
    interval_join,
)


def _d(s: str) -> datetime.date:
    return datetime.date.fromisoformat(s)


def _frames(spark):
    pts = spark.createDataFrame(
        [(i, _d("2025-01-01") + datetime.timedelta(days=3 * i)) for i in range(40)],
        "pid int, p date",
    )
    ivl = spark.createDataFrame(
        [
            (100, _d("2025-01-05"), _d("2025-01-20")),   # spans buckets
            (101, _d("2025-01-19"), _d("2025-01-21")),   # short
            (102, _d("2025-02-01"), _d("2025-03-15")),   # long (many buckets)
            (103, _d("2024-12-01"), _d("2024-12-31")),   # no points
            (104, _d("2025-01-05"), _d("2025-01-20")),   # duplicate range
        ],
        "wid int, lo date, hi date",
    )
    return pts, ivl


def test_interval_join_matches_nested_loop(spark):
    pts, ivl = _frames(spark)
    for width in (1, 7, 45):
        got = {
            (r.pid, r.wid)
            for r in interval_join(
                pts, ivl, "p", "lo", "hi", bucket_width_days=width
            ).collect()
        }
        want = {
            (r.pid, r.wid)
            for r in pts.crossJoin(ivl)
            .where((F.col("lo") <= F.col("p")) & (F.col("p") <= F.col("hi")))
            .collect()
        }
        assert got == want and want


def test_interval_join_no_duplicate_pairs(spark):
    """Each matching pair meets in exactly one bucket — no dedup pass,
    and no duplicates either."""
    pts, ivl = _frames(spark)
    out = interval_join(pts, ivl, "p", "lo", "hi", bucket_width_days=7)
    n = out.count()
    assert out.select("pid", "wid").distinct().count() == n


def test_interval_join_plans_as_equi_join(spark):
    """The bucket key must make this a hash/sort-merge equi-join —
    never BroadcastNestedLoopJoin or CartesianProduct."""
    pts, ivl = _frames(spark)
    plan = (
        interval_join(pts, ivl, "p", "lo", "hi")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_join_drops_inverted_intervals(spark):
    """hi < lo is an empty inclusive interval: silently dropped, never
    a descending-sequence explosion."""
    pts = spark.createDataFrame(
        [(1, "2025-01-10")], ["pid", "p"]
    ).select("pid", F.col("p").cast("date"))
    ivl = spark.createDataFrame(
        [(1, "2025-01-20", "2025-01-01"), (2, "2025-01-01", "2025-01-31")],
        ["wid", "lo", "hi"],
    ).select("wid", F.col("lo").cast("date"), F.col("hi").cast("date"))
    got = interval_join(pts, ivl, "p", "lo", "hi").collect()
    assert [(r.pid, r.wid) for r in got] == [(1, 2)]


def test_interval_join_span_cap_errors_not_ooms(spark):
    """An open-ended interval (hi = 9999-12-31) fails the stage with a
    descriptive error instead of exploding an unbounded sequence."""
    import pytest

    pts = spark.createDataFrame(
        [(1, "2025-01-10")], ["pid", "p"]
    ).select("pid", F.col("p").cast("date"))
    ivl = spark.createDataFrame(
        [(1, "2025-01-01", "9999-12-31")], ["wid", "lo", "hi"]
    ).select("wid", F.col("lo").cast("date"), F.col("hi").cast("date"))
    with pytest.raises(Exception, match="max_span_buckets"):
        interval_join(
            pts, ivl, "p", "lo", "hi", bucket_width_days=1,
            max_span_buckets=1000,
        ).collect()
