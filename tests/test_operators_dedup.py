"""Regression tests for grain dedup operators — in particular the
NULL-order-column corruption ADVICE flagged in round 1: max_by/min_by
skip NULL ordering keys, so an all-NULL group used to return a NULL
struct and null every non-grain column."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_movilidad_publica_santiago_spark.operators.dedup import (
    dedup_keep_latest,
    dedup_max_by,
)


def _frame(spark):
    # group g1: mixed NULL / non-NULL order col; g2: ALL NULL; g3: no dups
    rows = [
        ("g1", None, "a-null"),
        ("g1", 5, "a-five"),
        ("g1", 9, "a-nine"),
        ("g2", None, "b-null-1"),
        ("g2", None, "b-null-2"),
        ("g3", 1, "c-one"),
    ]
    return spark.createDataFrame(rows, "k string, ord int, payload string")


def test_dedup_max_by_all_null_group_keeps_real_row(spark):
    out = dedup_max_by(_frame(spark), ["k"], "ord", descending=True)
    by_key = {r["k"]: r for r in out.collect()}
    assert set(by_key) == {"g1", "g2", "g3"}
    # mixed group: non-null beats null, max wins
    assert by_key["g1"]["payload"] == "a-nine"
    assert by_key["g1"]["ord"] == 9
    # all-NULL group: must keep a REAL row, not a nulled-out shell
    assert by_key["g2"]["payload"] in ("b-null-1", "b-null-2")
    assert by_key["g3"]["payload"] == "c-one"


def test_dedup_min_by_prefers_non_null(spark):
    out = dedup_max_by(_frame(spark), ["k"], "ord", descending=False)
    by_key = {r["k"]: r for r in out.collect()}
    assert by_key["g1"]["payload"] == "a-five"  # min non-null, not the NULL row
    assert by_key["g2"]["payload"] in ("b-null-1", "b-null-2")


def test_dedup_max_by_matches_window_semantics(spark):
    """On data with a non-null unique order col, the aggregate path and
    the row_number path agree exactly."""
    df = spark.range(200).select(
        (F.col("id") % 40).alias("k"),
        F.col("id").alias("ord"),
        F.concat(F.lit("p"), F.col("id")).alias("payload"),
    )
    agg = dedup_max_by(df, ["k"], "ord", descending=True)
    win = dedup_keep_latest(df, ["k"], [F.col("ord").desc()])
    assert sorted(map(tuple, agg.collect())) == sorted(map(tuple, win.collect()))


def test_winnowing_fingerprints_edges(spark):
    """Short docs: len < k -> one whole-text gram; n_grams < w -> one
    whole-document window. Identical docs share identical sets; both
    hash variants agree on SET STRUCTURE (not values)."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.dedup_text import (
        winnowing_fingerprints,
    )

    docs = spark.createDataFrame(
        [
            (1, "tiny"),                         # len < k
            (2, "exactly8"),                     # len == k
            (3, "a slightly longer document body here"),
            (4, "a slightly longer document body here"),  # dup of 3
            (5, ""),                             # empty
        ],
        "doc_id long, text string",
    )
    for hash_fn in ("xxhash64", "md5"):
        fps = winnowing_fingerprints(
            docs, "doc_id", "text", k=8, w=4, hash_fn=hash_fn
        ).collect()
        by_doc: dict[int, set[int]] = {}
        for r in fps:
            by_doc.setdefault(r.doc_id, set()).add(r.fingerprint)
        # every doc (even empty/short) has >= 1 fingerprint
        assert set(by_doc) == {1, 2, 3, 4, 5}
        assert len(by_doc[1]) == 1 and len(by_doc[2]) == 1
        # exact duplicates -> identical fingerprint sets
        assert by_doc[3] == by_doc[4]
        # distinct docs -> distinct sets
        assert by_doc[1] != by_doc[3]


def test_minhash_incremental_matches_full_run(spark, tmp_path):
    """Batch-vs-index dedup returns exactly the cross-subset slice of
    a full-corpus run (signatures depend only on each doc's own
    shingles, so banding is split-invariant), and the index is built
    once then reused."""
    import random

    from data_lakehouse_movilidad_publica_santiago_spark.operators.dedup_text import (
        build_minhash_index,
        minhash_dedup_incremental,
        minhash_lsh_pairs,
    )

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(300)]
    corpus_rows, batch_rows = [], []
    for i in range(60):
        text = " ".join(rng.choices(vocab, k=40))
        corpus_rows.append((100 + i, text))
        if i < 20:  # 20 batch docs are exact clones of corpus docs
            batch_rows.append((i, text))
    for i in range(20, 40):  # 20 batch docs are fresh (no near-dups)
        batch_rows.append((i, " ".join(rng.choices(vocab, k=40))))

    corpus = spark.createDataFrame(corpus_rows, ["doc_id", "text"])
    batch = spark.createDataFrame(batch_rows, ["doc_id", "text"])

    meta = build_minhash_index(corpus, str(tmp_path / "idx"))
    assert meta["n_docs"] == 60

    inc = minhash_dedup_incremental(
        batch, str(tmp_path / "idx"), threshold=0.5
    )
    got = {(r["doc_new"], r["doc_corpus"], r["jac"]) for r in inc.collect()}

    # every clone pair found at jac 1.0; fresh docs produce nothing
    assert {(i, 100 + i, 1.0) for i in range(20)} <= got
    assert all(n < 20 for (n, _, _) in got)

    # cross-subset slice of the FULL-corpus run is identical
    full = minhash_lsh_pairs(
        batch.unionByName(corpus), "doc_id", "text", threshold=0.5
    )
    cross = {
        (r["doc_a"], r["doc_b"], r["jac"])
        for r in full.collect()
        if r["doc_a"] < 100 <= r["doc_b"]
    }
    assert cross == got
    spark.catalog.clearCache()


def _boilerplate_corpus(spark, n=400):
    """Unique bodies + a 16-token passage shared by half the docs (the
    hot-bucket shape: every carrier's band minima land on the shared
    shingles → one bucket per band holds all carriers, but carrier
    pairs' true Jaccard is far below any dedup threshold), plus two
    genuine near-dup pairs."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(5000)]
    shared = " ".join(f"s{i}" for i in range(16))
    rows = []
    for i in range(n):
        body = " ".join(rng.choices(vocab, k=40))
        text = f"{body} {shared}" if i % 2 == 0 else body
        rows.append((i, text))
    # two true near-dup pairs: same body, tiny suffix edit
    base_a = " ".join(rng.choices(vocab, k=40))
    base_b = " ".join(rng.choices(vocab, k=40))
    rows += [
        (n, base_a), (n + 1, base_a + " zz"),
        (n + 2, base_b + f" {shared}"), (n + 3, base_b + f" {shared} qq"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_minhash_est_prefilter_output_identical(spark):
    """est_margin prunes shared-boilerplate false candidates BEFORE
    the shingle-array verify but leaves the verified output identical
    (precision was already 1.0; the prune only skips pairs the exact
    verify would reject)."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.dedup_text import (
        minhash_lsh_pairs,
    )

    docs = _boilerplate_corpus(spark)
    base = {
        (r["doc_a"], r["doc_b"], r["jac"])
        for r in minhash_lsh_pairs(docs, "doc_id", "text", 0.7).collect()
    }
    pruned = {
        (r["doc_a"], r["doc_b"], r["jac"])
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", 0.7, est_margin=0.25
        ).collect()
    }
    assert base == pruned
    # both true pairs present (incl. the one whose docs carry the
    # shared passage — its est is high, the prune keeps it)
    assert {(a, b) for a, b, _ in base} >= {(400, 401), (402, 403)}
    spark.catalog.clearCache()


def test_minhash_max_bucket_drops_hot_and_reports(spark):
    """A mega-bucket of exact clones is dropped at max_bucket with its
    counts surfaced in stats; pairs outside hot buckets survive."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.dedup_text import (
        minhash_lsh_pairs,
    )

    import random

    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(3000)]
    clone = " ".join(rng.choices(vocab, k=40))
    pair = " ".join(rng.choices(vocab, k=40))
    rows = [(i, clone) for i in range(50)]  # 50 exact clones: hot bucket
    rows += [(100, pair), (101, pair + " zz")]  # isolated true pair
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    stats: dict = {}
    got = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", 0.7, max_bucket=10, stats=stats
        ).collect()
    }
    assert got == {(100, 101)}
    assert stats["hot_buckets_dropped"] >= 1
    assert stats["banded_rows_dropped"] >= 50
    # without the cap the clone pairs are all there
    full = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs, "doc_id", "text", 0.7).collect()
    }
    assert len(full) == 50 * 49 // 2 + 1
    spark.catalog.clearCache()


def test_minhash_incremental_est_margin(spark, tmp_path):
    """est_margin on the index path: identical verified pairs, and a
    legacy index without sigs.parquet fails with a clear message."""
    import shutil as _shutil

    import pytest

    from data_lakehouse_movilidad_publica_santiago_spark.operators.dedup_text import (
        build_minhash_index,
        minhash_dedup_incremental,
    )

    corpus = _boilerplate_corpus(spark, n=200)
    batch = corpus.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "text"
    )
    build_minhash_index(corpus, str(tmp_path / "idx"))
    base = {
        (r["doc_new"], r["doc_corpus"], r["jac"])
        for r in minhash_dedup_incremental(
            batch, str(tmp_path / "idx"), threshold=0.7
        ).collect()
    }
    pruned = {
        (r["doc_new"], r["doc_corpus"], r["jac"])
        for r in minhash_dedup_incremental(
            batch, str(tmp_path / "idx"), threshold=0.7, est_margin=0.25
        ).collect()
    }
    assert base == pruned and len(base) >= 60  # every clone-of-corpus doc
    _shutil.rmtree(tmp_path / "idx" / "sigs.parquet")
    with pytest.raises(ValueError, match="sigs.parquet"):
        minhash_dedup_incremental(
            batch, str(tmp_path / "idx"), threshold=0.7, est_margin=0.25
        )
    spark.catalog.clearCache()
