"""Mergeable-sketch properties: rollup-of-merges equals
direct-sketch exactly at coupon-mode sizes (the fixture's ≤700
distincts stay in SET mode, where unions are path-independent),
estimates land within the published error envelope, and quantile
sketches bound rank error. Beyond SET mode the cross-path equality
intentionally weakens to the error envelope + union bounds — that
regime is pinned by the `hll_rollup` driver gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_movilidad_publica_santiago_spark.operators.sketches import (
    approx_quantiles,
    distinct_sketches,
    rollup_distinct,
)


def _events(spark):
    # 20 days × 500 events; user ids overlap across days so daily
    # distincts DON'T add up to the total — the case exact counts
    # cannot rollup
    return spark.range(0, 10_000).select(
        (F.col("id") % 20).alias("day"),
        ((F.col("id") * 2_654_435_761) % 700).alias("user_id"),
        (F.col("id") % 4).alias("segment"),
    )


def test_merged_rollup_equals_direct_sketch(spark):
    ev = _events(spark)
    daily = distinct_sketches(ev, ["segment", "day"], "user_id")
    rolled = {
        r["segment"]: r["n_distinct_est"]
        for r in rollup_distinct(daily, ["segment"]).collect()
    }
    direct = {
        r["segment"]: r["n_distinct_est"]
        for r in rollup_distinct(
            distinct_sketches(ev, ["segment"], "user_id"), ["segment"]
        ).collect()
    }
    # not approximately equal — EXACTLY equal: same sketch state
    assert rolled == direct


def test_estimate_within_error_envelope(spark):
    ev = _events(spark)
    exact = {
        r["segment"]: r["n"]
        for r in ev.groupBy("segment")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    est = {
        r["segment"]: r["n_distinct_est"]
        for r in rollup_distinct(
            distinct_sketches(ev, ["segment", "day"], "user_id"), ["segment"]
        ).collect()
    }
    for seg, n in exact.items():
        assert abs(est[seg] - n) / n < 0.05, (seg, n, est[seg])


def test_approx_quantiles_rank_error(spark):
    ev = _events(spark).withColumn(
        "v", ((F.col("user_id") * 17 + F.col("day")) % 1000).cast("double")
    )
    got = {
        r["segment"]: r["quantiles"]
        for r in approx_quantiles(
            ev, ["segment"], "v", [0.25, 0.5, 0.75]
        ).collect()
    }
    exact = {
        r["segment"]: r["q"]
        for r in ev.groupBy("segment")
        .agg(F.expr("percentile(v, array(0.25, 0.5, 0.75))").alias("q"))
        .collect()
    }
    for seg in exact:
        for a, b in zip(got[seg], exact[seg]):
            assert abs(a - b) <= 10.0, (seg, got[seg], exact[seg])


def test_cms_merge_is_exact_and_bounds_hold(spark):
    from data_lakehouse_movilidad_publica_santiago_spark.operators.sketches import (
        frequency_sketches,
        merged_frequency_estimates,
    )

    ev = _events(spark)
    exact = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    items = sorted(exact, key=lambda u: (-exact[u], u))[:10]

    daily = frequency_sketches(ev, ["day"], "user_id")
    whole = frequency_sketches(ev, [], "user_id")
    est_daily = merged_frequency_estimates(daily, items)
    est_whole = merged_frequency_estimates(whole, items)

    # CMS merge is counter ADDITION with seed-fixed hash functions:
    # merging 20 daily sketches gives the IDENTICAL estimate as one
    # whole-data sketch — exact mergeability, unlike HLL
    assert est_daily == est_whole

    n_total = ev.count()
    for item in items:
        # one-sided error: estimate >= true, and <= true + eps*N
        assert est_daily[item] >= exact[item]
        assert est_daily[item] <= exact[item] + 0.001 * n_total + 1
