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


def frequency_sketches(
    df: DataFrame,
    grain: list[str],
    col: str,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
    sketch_col: str = "cms",
) -> DataFrame:
    """One Count-Min sketch of ``col`` per ``grain`` row — the
    frequency twin of ``distinct_sketches``. Store next to the fact
    rollup; any later "how often did item X appear across cuts
    A..B" answers by MERGING the stored sketches (pure counter
    addition — exact, unlike HLL union) instead of rescanning.

    Error contract: estimate ≥ true count always, and ≤ true +
    eps·N with probability ``confidence``; deterministic for a fixed
    ``seed`` (the seed fixes the hash functions, so merged and
    whole-data sketches are IDENTICAL arrays)."""
    return df.groupBy(*grain).agg(
        F.count_min_sketch(
            F.col(col), F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias(sketch_col)
    )


def merged_frequency_estimates(
    sketches: DataFrame,
    items: list,
    sketch_col: str = "cms",
) -> dict:
    """Merge ALL sketch rows (bounded: one per grain row — the same
    driver-sized footprint as collecting the rollup itself) and
    estimate each item's total count. Uses the JVM CountMinSketch
    (`org.apache.spark.util.sketch`) the SQL aggregate serializes."""
    jvm = sketches.sparkSession._jvm
    cls = jvm.org.apache.spark.util.sketch.CountMinSketch
    merged = None
    for row in sketches.select(sketch_col).collect():
        sk = cls.readFrom(bytes(row[sketch_col]))
        if merged is None:
            merged = sk
        else:
            merged.mergeInPlace(sk)
    if merged is None:
        return {item: 0 for item in items}
    out = {}
    for item in items:
        # CountMinSketch.estimateCount dispatches on the BOXED Java
        # type; py4j would pass a small Python int as Integer, which
        # hashes differently than the Long a bigint column produced —
        # box integral items explicitly
        jitem = jvm.java.lang.Long(item) if isinstance(item, int) else item
        out[item] = int(merged.estimateCount(jitem))
    return out
