"""asof_join_merge (big-dim path) must agree with asof_join
(broadcast path) on every edge the SCD2 contract allows, and must
plan with NO join operator and NO broadcast."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_lakehouse_movilidad_publica_santiago_spark.operators.asof import (
    asof_join,
    asof_join_merge,
)

D = dt.date


def _frames(spark):
    dim = spark.createDataFrame(
        [
            # bk 1: two contiguous versions
            (1, "v1", D(2024, 1, 1), D(2024, 1, 31)),
            (1, "v2", D(2024, 2, 1), None),
            # bk 2: closed version then a GAP before the next
            (2, "w1", D(2024, 1, 1), D(2024, 1, 10)),
            (2, "w2", D(2024, 2, 1), None),
            # bk 3: single open version
            (3, "x1", D(2024, 3, 1), None),
        ],
        "bk int, attr string, valid_from date, valid_to date",
    )
    fact = spark.createDataFrame(
        [
            (100, 1, D(2024, 1, 15)),   # inside v1
            (101, 1, D(2024, 1, 31)),   # inclusive upper bound of v1
            (102, 1, D(2024, 2, 1)),    # first day of v2
            (103, 1, D(2023, 12, 31)),  # before any version → no match
            (104, 2, D(2024, 1, 20)),   # in the GAP → no match
            (105, 2, D(2024, 1, 10)),   # last day of w1
            (106, 3, D(2024, 3, 1)),    # valid_from == event_time
            (107, 3, None),             # NULL event time → no match
            (108, 9, D(2024, 1, 1)),    # unknown bk → no match
        ],
        "fact_id int, bk int, event_dt date",
    )
    return fact, dim


def _rows(df):
    return sorted(
        (r.fact_id, r.bk, r.event_dt, r.attr, r.valid_from, r.valid_to)
        for r in df.collect()
    )


def test_merge_equals_broadcast_left(spark):
    fact, dim = _frames(spark)
    bc = asof_join(fact, dim, bk="bk", event_time="event_dt", how="left")
    mg = asof_join_merge(fact, dim, bk="bk", event_time="event_dt", how="left")
    assert sorted(bc.columns) == sorted(mg.columns)
    assert _rows(bc.select(*mg.columns)) == _rows(mg)
    # spot-check the tricky rows
    by_id = {r.fact_id: r.attr for r in mg.collect()}
    assert by_id[101] == "v1" and by_id[102] == "v2"
    assert by_id[104] is None and by_id[107] is None and by_id[108] is None


def test_merge_equals_broadcast_inner(spark):
    fact, dim = _frames(spark)
    bc = asof_join(fact, dim, bk="bk", event_time="event_dt", how="inner")
    mg = asof_join_merge(fact, dim, bk="bk", event_time="event_dt", how="inner")
    assert _rows(bc.select(*mg.columns)) == _rows(mg)
    assert mg.count() == 5  # 100,101,102,105,106


def test_merge_plan_has_no_join_no_broadcast(spark):
    """The big-dim path must not contain any join operator (so no
    BroadcastNestedLoopJoin and no broadcast OOM is possible) — just
    a union, one shuffle on the BK, and a window."""
    from data_lakehouse_movilidad_publica_santiago_spark.plans import explain_str

    fact, dim = _frames(spark)
    plan = explain_str(
        asof_join_merge(fact, dim, bk="bk", event_time="event_dt"), "simple"
    )
    assert "Join" not in plan, plan
    assert "BroadcastExchange" not in plan, plan
    assert "Window" in plan and "Union" in plan
