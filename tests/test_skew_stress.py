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
    # the salted-join straggler metric distributes 16 salts over the
    # session's shuffle partitions; it was written against 32 and its
    # n/3 bound holds there by a 45% margin (murmur3 is deterministic,
    # so this is exact, not statistical).  The shared test session
    # drifts to shuffle.partitions=4 mid-suite — get_spark() re-applies
    # its defaults (= $SPARK_GRAFT_CPUS since round 12) to the existing
    # session whenever another test calls it without extra_conf — and
    # at 4 partitions the same 16 salts can collide 6-deep and breach
    # the bound.  Pinning it here (saved/restored like the rest) makes
    # the test independent of suite execution order.
    "spark.sql.shuffle.partitions": "32",
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


@pytest.mark.slow
def test_salted_join_beats_plain_on_one_hot_key(skew_conf):
    """98 % of the big side is ONE key. With broadcast disabled and
    AQE skew split off (the regime salting exists for: a shuffle join
    where the hot KEY must co-locate), the plain join funnels the hot
    key through one task; salting spreads it over n_salts tasks.

    Deterministic assertion: the salted hot side occupies >= n_salts/2
    shuffle partitions where the plain join uses exactly one for the
    hot key. Wall-clock assertion is a sanity bound only (salted must
    not be SLOWER than plain beyond jitter); the measured win is
    recorded in SCALE.md."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.salted_join import (
        salted_join,
    )

    spark = skew_conf
    saved_skew = spark.conf.get("spark.sql.adaptive.skewJoin.enabled")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    try:
        n = 6_000_000
        big = spark.range(n).select(
            F.when(F.col("id") % 50 < 49, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.col("id").alias("row_id"),
        )
        small = spark.range(1000).select(
            F.col("id").alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        # per-joined-row sha256 makes task time ∝ rows, so the hot
        # key's partition genuinely dominates the plain join's wall
        # time (a cheap count would hide the straggler in overheads)
        agg = lambda df: df.groupBy("k").agg(  # noqa: E731
            F.count("*").alias("n"),
            F.max(
                F.sha2(
                    F.concat_ws(
                        ":", F.col("payload"), F.col("row_id").cast("string")
                    ),
                    256,
                )
            ).alias("p"),
        )

        t0 = time.perf_counter()
        plain_rows = agg(big.join(small, "k")).count()
        plain_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        salted = salted_join(
            big, small, "k", hot_keys=[7], n_salts=16, salt_source="row_id"
        )
        salted_rows = agg(salted).count()
        salted_s = time.perf_counter() - t0

        # keys in big: 7 plus {49, 99, ..., 999} (id%50==49 → id%1000
        # ranges over the 20 values ≡49 mod 50) → 21 groups
        assert plain_rows == salted_rows == 21

        # deterministic straggler metric: max rows landing in ONE
        # shuffle partition (Murmur3 = F.hash is the HashPartitioner
        # hash). Plain co-locates 98 % of rows in one task; salting
        # caps every task's load near the mean.
        n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
        max_plain = (
            big.groupBy(F.pmod(F.hash("k"), F.lit(n_shuffle)).alias("p"))
            .count().agg(F.max("count")).collect()[0][0]
        )
        salt = F.pmod(F.xxhash64(F.col("row_id")), F.lit(16)).cast("int")
        max_salted = (
            big.withColumn("__salt", salt)
            .groupBy(
                F.pmod(F.hash("k", "__salt"), F.lit(n_shuffle)).alias("p")
            )
            .count().agg(F.max("count")).collect()[0][0]
        )
        assert max_plain >= 0.98 * n
        # 16 salts over n_shuffle partitions: a perfectly even spread
        # is n/16 per salt; allow collisions of a few salts per
        # partition but require the straggler to be broken ≥ 3x
        assert max_salted <= n / 3, (max_salted, n)

        # wall-time sanity only (shared-session timing jitters ±15 %;
        # the standalone measured win is recorded in SCALE.md): the
        # salted plan must never LOSE badly to the straggler plan
        assert salted_s < plain_s * 1.3, (salted_s, plain_s)
        print(f"salted={salted_s:.2f}s plain={plain_s:.2f}s")
    finally:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", saved_skew)


def test_connected_components_giant_cluster_round_bound(spark):
    """Adversarial shapes for the pairs->clusters loop: (a) one giant
    cluster holding 90 % of nodes as a dense clump (diameter 2 — the
    realistic mega-duplicate case) and (b) a 1024-node PATH (maximum
    diameter per edge count). Pointer jumping must keep rounds
    O(log diameter), far under the 30-round guard."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.clustering import (
        connected_components,
    )

    # (a) giant clump: 9000 nodes all pair-linked to a few hubs
    hubs = spark.range(10).select(F.col("id").alias("hub"))
    members = spark.range(9_000).select((F.col("id") + 10).alias("m"))
    clump = members.crossJoin(hubs).select(
        F.col("m").alias("doc_a"), F.col("hub").alias("doc_b")
    )
    stats: dict = {}
    labels = connected_components(clump, stats=stats)
    assert labels.count() == 9_010
    assert labels.select("cluster_id").distinct().count() == 1
    assert stats["rounds"] <= 4, stats

    # (b) worst-case diameter: a path 0-1-2-...-1023
    path = spark.range(1_023).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    stats = {}
    labels = connected_components(path, stats=stats)
    assert labels.count() == 1_024
    assert labels.select("cluster_id").distinct().count() == 1
    assert labels.agg(F.max("cluster_id")).collect()[0][0] == 0
    # label-min propagation + pointer jump ~doubles reach per round:
    # O(log2 1024) = 10 rounds + convergence detection slack
    assert stats["rounds"] <= 14, stats
