"""Skew-adversarial stress for the banded operators (VERDICT r3 #4).

Two pathological inputs a real corpus will eventually produce:

- ``interval_join``: almost every point lands in ONE bucket (a hot
  shuffle key).  The bucket join must stay an equi-join and AQE's
  skew-join split must kick in (asserted via the ``skew=true`` marker
  in the final adaptive plan), with wall time bounded.

- ``simhash_pairs``: a mega-duplicate corpus (80% identical docs).
  The r3 banding-over-DISTINCT-sketches design makes the banding join
  quadratic only in distinct-sketch count; member expansion is
  output-bound.  Asserted via exact pair counts + a generous wall
  bound that a member-quadratic banding join would blow through.
"""

from __future__ import annotations

import random
import time

import pytest
from pyspark.sql import functions as F

from data_lakehouse_movilidad_publica_santiago_spark.operators.dedup_text import (
    simhash_pairs,
)
from data_lakehouse_movilidad_publica_santiago_spark.operators.range_join import (
    interval_join,
)

_SKEW_CONF = {
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16k",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8k",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def skew_conf(spark):
    """Tighten AQE skew thresholds to test scale; restore after (the
    session is shared across the suite)."""
    saved = {}
    for k, v in _SKEW_CONF.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    yield spark
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _skewed_frames(spark):
    # 90% of 50k points in the 2025-01-03 week; the rest spread over a
    # year.  200 intervals tile the year in 10-day windows.
    pts = spark.range(50_000).select(
        F.col("id").alias("pid"),
        F.when(F.col("id") % 10 < 9, F.lit("2025-01-03"))
        .otherwise(
            F.date_add(F.lit("2025-01-01"), (F.col("id") % 365).cast("int"))
        )
        .cast("date")
        .alias("p"),
    )
    ivl = spark.range(200).select(
        F.col("id").alias("wid"),
        F.date_add(F.lit("2025-01-01"), ((F.col("id") * 7) % 364).cast("int")).alias("lo"),
        F.date_add(
            F.lit("2025-01-01"), (((F.col("id") * 7) % 364) + 10).cast("int")
        ).alias("hi"),
    )
    return pts, ivl


def test_range_join_hot_bucket_aqe_skew_split(skew_conf):
    spark = skew_conf
    pts, ivl = _skewed_frames(spark)
    out = interval_join(pts, ivl, "p", "lo", "hi").select("pid", "wid")
    t0 = time.perf_counter()
    got = out.count()
    elapsed = time.perf_counter() - t0
    want = (
        pts.crossJoin(ivl)
        .where((F.col("lo") <= F.col("p")) & (F.col("p") <= F.col("hi")))
        .count()
    )
    assert got == want > 0
    assert elapsed < 90, f"hot-bucket interval join took {elapsed:.1f}s"
    # the final adaptive plan must show the skew-join split took over
    # the hot bucket (collect() materializes the AQE final plan)
    out.collect()
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "skew=true" in plan, "AQE skew-join split did not engage"


def test_simhash_mega_duplicate_corpus_is_output_bound(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(400)]
    clone_text = " ".join(rng.choices(vocab, k=60))
    docs = [(i, clone_text) for i in range(800)] + [
        (800 + i, " ".join(rng.choices(vocab, k=60))) for i in range(200)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    t0 = time.perf_counter()
    pairs = simhash_pairs(df, "doc_id", "text", max_hamming=8).cache()
    clone_pairs = pairs.filter("doc_a < 800 AND doc_b < 800")
    n_clone = clone_pairs.count()
    elapsed = time.perf_counter() - t0
    try:
        # every clone pair found, all at Hamming 0, exactly once
        assert n_clone == 800 * 799 // 2
        assert clone_pairs.filter("hamming != 0").count() == 0
        assert (
            pairs.select("doc_a", "doc_b").distinct().count() == pairs.count()
        )
    finally:
        pairs.unpersist()
    # member-quadratic banding would push 800^2 x 16 chunk rows through
    # the join; distinct-sketch banding keeps it at ~201^2 candidates.
    # 60s is ~10x the observed time — a regression to member-quadratic
    # blows through it, normal CI noise does not.
    assert elapsed < 60, f"mega-duplicate simhash took {elapsed:.1f}s"
