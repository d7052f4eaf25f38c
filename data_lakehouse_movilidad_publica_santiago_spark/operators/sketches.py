"""Mergeable-sketch aggregates — the pre-aggregation layer of a
100 TB rollup pipeline.

Exact COUNT(DISTINCT) cannot be pre-aggregated: a daily exact count
is useless for a weekly rollup (distincts don't add). DataSketches
HLL sketches CAN: keep one small binary sketch per (grain, day),
merge sketches for any coarser grain, estimate at read time. The
estimator is deterministic for fixed data and a fixed merge path;
while sketches remain in exact coupon (SET) mode the union is
path-independent too — rollup(merge(daily)) == sketch(whole)
EXACTLY, pinned by tests/test_sketches.py. Past the HLL-mode
promotion threshold, different merge paths may differ by a few
counts (estimator-mode differences), and the guarantee is the
published error envelope plus the union superset/subadditivity
bounds — both driver-gated (`hll_rollup`, sql_surface_gate.py).

Built on Spark's native DataSketches bindings (hll_sketch_agg /
hll_union_agg / hll_sketch_estimate) — JVM-side, codegen-friendly,
zero Python in the path. Quantiles use percentile_approx (the
GK-sketch built-in) with a tolerance test against exact quantiles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def distinct_sketches(
    df: DataFrame,
    grain: list[str],
    col: str,
    lg_k: int = 12,
    sketch_col: str = "hll",
) -> DataFrame:
    """One HLL sketch of ``col`` per ``grain`` row — the persistable
    pre-aggregate (a few KB per row at lg_k=12, ±~1.6% rel. std
    error). Store next to the fact rollup; downstream rollups merge
    instead of rescanning."""
    return df.groupBy(*grain).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lg_k)).alias(sketch_col)
    )


def rollup_distinct(
    sketches: DataFrame,
    to_grain: list[str],
    sketch_col: str = "hll",
    out_col: str = "n_distinct_est",
) -> DataFrame:
    """Merge fine-grain sketches up to ``to_grain`` and estimate.
    This is the operation exact distinct counts cannot do — no
    rescan of the base data, just a union of the stored sketches."""
    merged = sketches.groupBy(*to_grain).agg(
        F.hll_union_agg(F.col(sketch_col)).alias("__merged")
    )
    return merged.select(
        *to_grain,
        F.hll_sketch_estimate("__merged").alias(out_col),
    )


def estimate(sketch: Column) -> Column:
    return F.hll_sketch_estimate(sketch)


def approx_quantiles(
    df: DataFrame,
    grain: list[str],
    col: str,
    probs: list[float],
    accuracy: int = 10_000,
) -> DataFrame:
    """Grouped approximate quantiles (GK sketch): one pass, mergeable
    partials, error ≤ 1/accuracy of rank — the scale path where exact
    per-group sorts don't fit."""
    return df.groupBy(*grain).agg(
        F.percentile_approx(
            F.col(col), F.array(*[F.lit(p) for p in probs]), F.lit(accuracy)
        ).alias("quantiles")
    )
