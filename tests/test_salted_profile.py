"""Behavioral tests for the skew-salted join and the one-pass column
profiler (differential gates: salted_join_demand / profile_orders)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lakehouse_movilidad_publica_santiago_spark.operators.profile import (
    profile_columns,
)
from data_lakehouse_movilidad_publica_santiago_spark.operators.salted_join import (
    detect_hot_keys,
    salted_join,
)
from data_lakehouse_movilidad_publica_santiago_spark.plans.checks import (
    explain_str,
)


def _skewed(spark):
    """90% of the big side lands on key 7; keys 1..5 take the rest."""
    big = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7))
        .otherwise((F.col("id") % 5 + 1))
        .alias("k"),
        F.col("id").alias("row_id"),
    )
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(1, 9)], "k bigint, label string"
    )
    return big, small


def test_salted_join_equals_plain_join(spark):
    big, small = _skewed(spark)
    plain = big.join(small, "k").groupBy("k", "label").count()
    salted = (
        salted_join(big, small, "k", hot_keys=[7], n_salts=4)
        .groupBy("k", "label")
        .count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_left_join_keeps_unmatched(spark):
    big, small = _skewed(spark)
    # drop key 7's dim row: every hot row must still survive as LEFT
    small2 = small.filter(F.col("k") != 7)
    out = salted_join(big, small2, "k", hot_keys=[7], how="left", n_salts=4)
    plain = big.join(small2, "k", "left")
    assert out.count() == plain.count() == 2000
    assert (
        out.filter(F.col("label").isNull()).count()
        == plain.filter(F.col("label").isNull()).count()
    )


def test_salted_join_spreads_hot_key(spark):
    """The hot key's rows really do shuffle-distribute: the salted
    hot-side join keys include __salt in the plan."""
    big, small = _skewed(spark)
    out = salted_join(big, small, "k", hot_keys=[7], n_salts=4)
    plan = explain_str(out)
    assert "__salt" in plan


def test_salted_join_rejects_unsupported_how(spark):
    big, small = _skewed(spark)
    with pytest.raises(ValueError):
        salted_join(big, small, "k", hot_keys=[7], how="full")


def test_detect_hot_keys(spark):
    big, _ = _skewed(spark)
    assert detect_hot_keys(big, "k", min_rows=500) == [7]
    assert detect_hot_keys(big, "k", min_rows=10**9) == []


def test_profile_columns_counts_and_types(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 1.5),
            (2, None, 2.5),
            (2, "b", None),
            (None, "b", 4.0),
        ],
        "k bigint, s string, v double",
    )
    prof = {r["col_name"]: r for r in profile_columns(df).collect()}
    assert prof["k"]["n_rows"] == 4
    assert prof["k"]["n_nulls"] == 1
    assert prof["k"]["n_distinct"] == 2
    assert (prof["k"]["min_val"], prof["k"]["max_val"]) == ("1", "2")
    assert prof["s"]["n_nulls"] == 1
    assert (prof["s"]["min_val"], prof["s"]["max_val"]) == ("a", "b")
    assert prof["v"]["n_distinct"] == 3
    assert (prof["v"]["min_val"], prof["v"]["max_val"]) == ("1.5", "4.0")


def test_profile_single_scan(spark):
    df = spark.range(100).select(
        F.col("id").alias("a"), (F.col("id") % 3).alias("b")
    )
    plan = explain_str(profile_columns(df, ["a", "b"]))
    import re

    assert len(re.findall(r"\(\d+\) Range", plan)) == 1


def _skewed_with_nulls(spark):
    """NULL is the heaviest group (60%), key 7 hot (30%), 1..5 cold."""
    big = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 < 6, F.lit(None).cast("bigint"))
        .when(F.col("id") % 10 < 9, F.lit(7))
        .otherwise((F.col("id") % 5 + 1))
        .alias("k"),
        F.col("id").alias("row_id"),
    )
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(1, 9)], "k bigint, label string"
    )
    return big, small


def test_detect_hot_keys_excludes_null_group(spark):
    big, _ = _skewed_with_nulls(spark)
    # NULL has 1200 rows — the heaviest group — but must not be returned
    assert detect_hot_keys(big, "k", min_rows=300) == [7]


def test_salted_join_with_null_keys_inner(spark):
    """A None in hot_keys must not poison the cold-path isin filter
    (three-valued logic would silently drop every non-hot cold row)."""
    big, small = _skewed_with_nulls(spark)
    plain = big.join(small, "k").groupBy("k", "label").count()
    for hot in ([7], [None, 7]):  # caller passing None must be safe too
        salted = (
            salted_join(big, small, "k", hot_keys=hot, n_salts=4)
            .groupBy("k", "label")
            .count()
        )
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, salted.collect())
        )


def test_salted_join_with_null_keys_left(spark):
    big, small = _skewed_with_nulls(spark)
    plain = big.join(small, "k", "left")
    out = salted_join(big, small, "k", hot_keys=[None, 7], how="left", n_salts=4)
    assert out.count() == plain.count() == 2000
    # every NULL-key row survives unmatched via the cold path
    assert out.filter(F.col("k").isNull()).count() == 1200


def test_salted_join_all_hot_keys_null_degrades_to_plain(spark):
    big, small = _skewed_with_nulls(spark)
    out = salted_join(big, small, "k", hot_keys=[None], n_salts=4)
    plain = big.join(small, "k")
    assert out.count() == plain.count()
