"""Training-data ops (operators/data_mix.py): decontamination scan,
seeded deterministic sampling, distributed token-budget packing."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_movilidad_publica_santiago_spark.operators.data_mix import (
    contamination_pairs,
    pack_shards,
    sample_mix,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_contamination_finds_verbatim_overlap_only(spark):
    train = _docs(spark, [
        (1, "the quick brown fox jumps over the lazy dog tonight", "en"),
        (2, "completely different words with no overlap here at all", "en"),
    ])
    ev = _docs(spark, [
        (100, "we saw the quick brown fox jumps over a fence", "en"),
    ])
    got = {r["doc_id"]: r["n_shared"] for r in
           contamination_pairs(train, ev, k=16).collect()}
    assert 1 in got and got[1] >= 1  # shares "the quick brown fox…"
    assert 2 not in got              # zero 16-gram overlap


def test_sample_mix_deterministic_and_weighted(spark):
    docs = _docs(
        spark,
        [(i, f"doc {i}", "en" if i % 2 == 0 else "es") for i in range(2000)],
    )
    kept1 = sample_mix(docs, {"en": 0.5, "es": 0.1}, seed="s1")
    kept2 = sample_mix(docs, {"en": 0.5, "es": 0.1}, seed="s1")
    ids1 = {r["doc_id"] for r in kept1.collect()}
    ids2 = {r["doc_id"] for r in kept2.collect()}
    assert ids1 == ids2  # same seed → bit-identical sample
    ids3 = {r["doc_id"] for r in
            sample_mix(docs, {"en": 0.5, "es": 0.1}, seed="s2").collect()}
    assert ids1 != ids3  # different seed → different sample
    by_lang = {
        r["lang"]: r["n"]
        for r in kept1.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert 400 < by_lang["en"] < 600     # ~50% of 1000
    assert 50 < by_lang["es"] < 160      # ~10% of 1000


def test_pack_shards_budget_and_coverage(spark):
    docs = _docs(
        spark,
        [(i, " ".join(["w"] * (10 + i % 17)), "en") for i in range(500)],
    )
    shards = pack_shards(docs, budget_tokens=300).collect()
    assert len(shards) == 500  # every doc assigned exactly once
    per_shard: dict[int, int] = {}
    max_doc_tokens = 10 + 16
    for r in shards:
        per_shard[r["shard_id"]] = per_shard.get(r["shard_id"], 0) + r["n_tok"]
    # exclusive-prefix packing: a shard overflows by at most one doc
    for sid, total in per_shard.items():
        assert total <= 300 + max_doc_tokens, (sid, total)
    # shards are contiguous doc_id ranges (streaming layout)
    by_doc = sorted((r["doc_id"], r["shard_id"]) for r in shards)
    sids = [s for _, s in by_doc]
    assert sids == sorted(sids)


def test_pack_shards_plan_has_no_global_window(spark):
    docs = _docs(spark, [(i, "a b c", "en") for i in range(100)])
    plan = pack_shards(docs, budget_tokens=10)._jdf.queryExecution().toString()
    # the window must be partitioned by the range-partition id, never a
    # single global partition (that is the whole point of the 2-pass)
    assert "windowspecdefinition(__pid" in plan


def test_pack_shards_scale_derived_parts(spark, monkeypatch):
    """n_parts defaults from the session, not a constant 32: a big
    cluster's defaultParallelism must widen the range partitioning
    without the caller passing a kwarg."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators import (
        spread,
    )

    docs = spark.createDataFrame(
        [(i, "tok " * 5) for i in range(200)], "doc_id bigint, text string"
    )
    # on this 4-core test session the floor of 32 wins
    assert spread.default_range_parts(docs) == max(
        32, spark.sparkContext.defaultParallelism
    )
    # a session reporting more parallelism propagates through the
    # n_parts=None default path into the actual range partitioning
    monkeypatch.setattr(spread, "default_range_parts", lambda df: 48)
    pins: list = []
    out = pack_shards(docs, budget_tokens=50, pins=pins)
    assert pins and pins[0].rdd.getNumPartitions() == 48
    assert out.count() == 200
    for p in pins:
        p.unpersist()


def test_pack_shards_pins_released(spark):
    """The gate wrapper must not leave a CacheManager entry behind."""
    from data_lakehouse_movilidad_publica_santiago_spark.analytics.inventory_llm import (
        q_pack_shards,
    )

    jcache = spark._jsparkSession.sharedState().cacheManager()
    before = jcache.isEmpty()
    out = q_pack_shards(spark, "/root/testdata/sf0.001")
    assert out.count() > 0
    # whatever was cached before the call, q_pack_shards added nothing
    assert jcache.isEmpty() == before


def test_split_assign_properties(spark):
    from data_lakehouse_movilidad_publica_santiago_spark.operators.data_mix import (
        split_assign,
    )

    docs = spark.range(10_000).select(F.col("id").alias("doc_id"))
    out = split_assign(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    # exhaustive + disjoint (one split per row)
    assert sum(counts.values()) == 10_000
    assert set(counts) == {"train", "val", "test"}
    # proportions within a loose binomial band
    assert 7_700 <= counts["train"] <= 8_300
    assert 800 <= counts["val"] <= 1_200
    assert 800 <= counts["test"] <= 1_200
    # deterministic: repartitioning does not move any row
    again = split_assign(docs.repartition(17), {"train": 0.8, "val": 0.1, "test": 0.1})
    a = {r["doc_id"]: r["split"] for r in out.collect()}
    b = {r["doc_id"]: r["split"] for r in again.collect()}
    assert a == b
    # unnormalized weights normalize; single split takes everything
    solo = split_assign(docs, {"all": 3.0})
    assert solo.filter(F.col("split") == "all").count() == 10_000


def test_split_assign_rejects_bad_weights(spark):
    import pytest as _pytest

    from data_lakehouse_movilidad_publica_santiago_spark.operators.data_mix import (
        split_assign,
    )

    docs = spark.range(10).select(F.col("id").alias("doc_id"))
    with _pytest.raises(ValueError):
        split_assign(docs, {"a": 0.0, "b": 0.0})


def test_pack_sequences_exact_spans(spark):
    """Hand-computed concatenate-and-cut layout: docs of 4/6/3 tokens
    packed into length-5 sequences → the 6-token doc splits across
    three sequences, every slice accounted."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.data_mix import (
        pack_sequences,
    )

    docs = _docs(spark, [
        (1, "a b c d", "en"),          # tokens [0, 4)
        (2, "e f g h i j", "en"),      # tokens [4, 10)
        (3, "k l m", "en"),            # tokens [10, 13)
    ])
    rows = sorted(
        (r["doc_id"], r["seq_id"], r["doc_off"], r["seq_off"], r["slice_tok"])
        for r in pack_sequences(docs, seq_tokens=5).collect()
    )
    assert rows == [
        (1, 0, 0, 0, 4),   # doc 1 fills seq 0 positions 0-3
        (2, 0, 0, 4, 1),   # doc 2 token 0 closes seq 0
        (2, 1, 1, 0, 5),   # tokens 1-5 fill seq 1
        (3, 2, 0, 0, 3),   # doc 3 opens seq 2
    ]


def test_pack_sequences_conservation_and_boundaries(spark):
    """Σ slice_tok per doc == n_tok; every sequence except the last is
    exactly full; layout is invariant to input partitioning."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.data_mix import (
        pack_sequences,
    )

    docs = _docs(
        spark,
        [(i, " ".join(["w"] * (1 + i * 7 % 23)), "en") for i in range(400)],
    )
    out = pack_sequences(docs, seq_tokens=64).collect()
    per_doc: dict[int, int] = {}
    per_seq: dict[int, int] = {}
    for r in out:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["slice_tok"]
        per_seq[r["seq_id"]] = per_seq.get(r["seq_id"], 0) + r["slice_tok"]
        assert 0 <= r["seq_off"] < 64 and r["slice_tok"] >= 1
    n_toks = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.size(F.split("text", " ")).alias("n")
        ).collect()
    }
    assert per_doc == n_toks
    last = max(per_seq)
    for sid, tot in per_seq.items():
        assert tot == 64 or sid == last, (sid, tot)
    assert sum(n_toks.values()) == sum(per_seq.values())

    repart = sorted(
        tuple(r) for r in
        pack_sequences(docs.repartition(13), seq_tokens=64).collect()
    )
    assert repart == sorted(tuple(r) for r in out)


def test_temperature_mix_budgets_and_determinism(spark):
    """α=0.5 budgets sit between proportional and uniform: the small
    domain is upsampled relative to its share, the decision replays
    bit-identically, and α=1 degenerates to proportional sampling."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.data_mix import (
        temperature_mix,
    )

    docs = _docs(
        spark,
        [(i, f"doc {i}", "en" if i < 9000 else "es") for i in range(10000)],
    )
    kept = temperature_mix(docs, alpha=0.5, target_total=2000, seed="t1")
    by_lang = {
        r["lang"]: r["n"]
        for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # proportional would give es ~200 of 2000; α=0.5 lifts it to
    # 2000·sqrt(1000)/(sqrt(9000)+sqrt(1000)) ≈ 500
    assert 380 <= by_lang["es"] <= 620
    assert 1300 <= by_lang["en"] <= 1700
    ids1 = {r["doc_id"] for r in kept.collect()}
    ids2 = {
        r["doc_id"]
        for r in temperature_mix(
            docs, alpha=0.5, target_total=2000, seed="t1"
        ).collect()
    }
    assert ids1 == ids2
    # keep_prob is audited on every surviving row
    probs = {r["lang"]: r["keep_prob"] for r in kept.collect()}
    assert probs["es"] > probs["en"]

    prop = temperature_mix(docs, alpha=1.0, target_total=2000, seed="t1")
    by_prop = {
        r["lang"]: r["n"]
        for r in prop.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert 120 <= by_prop["es"] <= 280  # ~10% share → ~200


def test_temperature_mix_rejects_bad_alpha(spark):
    import pytest

    from data_lakehouse_movilidad_publica_santiago_spark.operators.data_mix import (
        temperature_mix,
    )

    docs = _docs(spark, [(1, "a", "en")])
    with pytest.raises(ValueError):
        temperature_mix(docs, alpha=1.5, target_total=10)
