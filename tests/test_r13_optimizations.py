"""Round-13 optimization pins: cache hygiene, rotation policy, bench
output contract.  Pure-python tests (no Spark session) — they run in
milliseconds and guard the round-13 infrastructure changes."""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def test_cleanup_clears_every_module_level_cache():
    """VERDICT r12 item 9: a new module-level cache that skips
    ``_cleanup_index_caches`` would silently serve stale state after
    an index rebuild.  Enumerate EVERY dict-typed ``*_CACHE`` global
    in inventory_llm by introspection, populate each, and assert the
    cleanup empties them all — a cache added later that is not wired
    into the cleanup fails this test automatically."""
    from data_lakehouse_movilidad_publica_santiago_spark.analytics import (
        inventory_llm as il,
    )

    caches = {
        name: obj
        for name, obj in vars(il).items()
        if name.endswith("_CACHE") and isinstance(obj, dict)
    }
    assert len(caches) >= 10, f"expected the full cache inventory, got {caches.keys()}"
    snapshot = {name: dict(obj) for name, obj in caches.items()}
    try:
        for name, obj in caches.items():
            # dir-valued caches get a path that doesn't exist: rmtree
            # with ignore_errors is a no-op on it
            obj[("__r13_probe__",)] = (
                "/nonexistent/__r13_probe__"
                if "INDEX" in name
                else ["probe"]
            )
        il._cleanup_index_caches()
        for name, obj in caches.items():
            assert obj == {}, f"{name} not cleared by _cleanup_index_caches"
    finally:
        for name, obj in caches.items():
            obj.clear()
            obj.update(snapshot[name])


def test_gate_param_caches_invalidate_on_embeddings_mtime(tmp_path):
    """ADVICE r12: the gate-parameter caches must key on the
    embeddings parquet's identity, not the directory path, so
    regenerating data under the same sf_dir mid-process can't serve
    stale vectors/quantizer params."""
    import os

    from data_lakehouse_movilidad_publica_santiago_spark.analytics import (
        inventory_llm as il,
    )

    p = tmp_path / "embeddings.parquet"
    p.write_bytes(b"v1")
    k1 = il._emb_cache_key(str(tmp_path))
    p.write_bytes(b"v2-bigger")
    os.utime(p, ns=(1, 1))
    k2 = il._emb_cache_key(str(tmp_path))
    assert k1 != k2, "rewriting embeddings.parquet must change the cache key"
    assert k1[0] == k2[0] == str(tmp_path)


def test_rotation_changed_gates_sort_first(monkeypatch):
    """VERDICT r12 item 3: gates whose implementation fingerprint
    differs from the committed baseline must sort ahead of unchanged
    gates (so the driver's 50-entry window re-proves them), with the
    age order preserved inside each class."""
    import __spark_entry__ as e

    merged = {"a": 1, "b": 2, "c": 3, "d": 4}
    monkeypatch.setattr(e, "_CHANGED_MEMO", [frozenset({"c", "d"})])
    monkeypatch.setattr(e, "_LAST_GREEN", {"a": 5, "b": 9, "c": 9, "d": 5})
    assert list(e._rotated(merged)) == ["d", "c", "a", "b"]


def test_rotation_fingerprints_cover_every_gate():
    """Every declared gate gets a non-empty fingerprint (getsource
    works for all of them) and the committed baseline has the same
    key set, so the changed-first comparison is total."""
    import __spark_entry__ as e

    merged = e._merged_queries()
    fps = e._impl_fingerprints(merged)
    assert set(fps) == set(merged)
    assert all(fps.values()), [k for k, v in fps.items() if not v]
    baseline = json.loads((REPO / "ROTATION_HASHES.json").read_text())
    assert set(baseline) == set(merged)


def test_bench_final_line_carries_per_query_medians():
    """VERDICT r12 items 2/6: the LAST JSON line of bench.py must
    carry the per-query medians inside the driver's 2,000-char stdout
    tail, and the detail line must carry cpu_sec.  Statically pin the
    emitted keys and the size guard against a realistic 60-query map."""
    src = (REPO / "bench.py").read_text()
    assert '"queries": {k: round(v, 2) for k, v in timings.items()}' in src
    assert '"cpu_sec": cpu_sec' in src
    assert "1900" in src  # the final-line size guard

    import bench

    names = bench.HEADLINE
    assert len(names) >= 60
    final = {
        "metric": "headline_queries_total_wall",
        "value": 123.456,
        "unit": "sec",
        "queries": {n: 12.34 for n in names},
        "sf": 0.1,
        "n_queries": len(names),
        "method": "median_warm_respread3x",
        "loader_rows_per_sec": 99999,
    }
    assert len(json.dumps(final)) < 1900


def test_fused_gram_counts_equal_naive(spark):
    """The round-13 fused single-pass trainer must produce COUNT
    TABLES identical to the naive per-order explodes, including the
    edge cases the per-order screens handle: empty text, single-token
    docs (word_ngrams_raw pads them with one short gram), double
    spaces (empty tokens), and NULL text."""
    from pyspark.sql import functions as F

    from data_lakehouse_movilidad_publica_santiago_spark.functions.text import (
        word_ngrams_raw,
    )
    from data_lakehouse_movilidad_publica_santiago_spark.operators.lm_filter import (
        _fused_gram_counts,
    )

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "cat"),
            (3, ""),
            (4, "a  b c"),  # double space → empty token
            (5, None),
            (6, "the cat sat"),
        ],
        "doc_id int, text string",
    )
    counts = _fused_gram_counts(docs, "text", 3)

    def naive(n):
        if n == 1:
            rows = docs.select(
                F.explode(F.split("text", " ")).alias("g")
            )
        else:
            rows = docs.select(
                F.explode(word_ngrams_raw(F.col("text"), n)).alias("g")
            ).filter(F.size(F.split("g", " ")) == n)
        return {
            (r["g"],): r["c"]
            for r in rows.groupBy("g").agg(F.count("*").alias("c")).collect()
        }

    for n in (1, 2, 3):
        fused = {
            (r["g"],): r["c"]
            for r in counts.filter(F.col("o") == n).collect()
        }
        assert fused == naive(n), f"order {n} counts diverge"


def test_trigram_model_tables_match_pre_fusion_shapes(spark):
    """train_trigram_lm / train_bigram_lm keep their public table
    schemas (the scorer and the oracles depend on the column names)."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.lm_filter import (
        train_bigram_lm,
        train_trigram_lm,
    )

    docs = spark.createDataFrame(
        [(1, "a b c a b")], "doc_id int, text string"
    )
    tri = train_trigram_lm(docs)
    assert tri.trigrams.columns == ["gram", "c123"]
    assert tri.bigrams.columns == ["gram", "c12"]
    assert tri.unigrams.columns == ["w", "c1"]
    assert tri.totals.columns == ["n_tokens", "vocab"]
    assert tri.totals.collect()[0].asDict() == {"n_tokens": 5, "vocab": 3}
    bi = train_bigram_lm(docs)
    assert bi.bigrams.columns == ["gram", "c12"]
    assert bi.unigrams.columns == ["w1", "c1"]
    assert bi.vocab_size == 3


def test_proc_tree_cpu_is_monotone():
    import bench

    a = bench._proc_tree_cpu()
    # burn a little CPU in this process
    x = 0
    for i in range(200_000):
        x += i * i
    b = bench._proc_tree_cpu()
    assert a is not None and b is not None and b >= a
