"""Round-7 wave-2 operator semantics: asymmetric containment pairs,
DoReMi-lite domain reweighting, cross-corpus n-gram novelty —
hand-computed expectations on constructed corpora (the sf0.01 DuckDB
differential lives in test_inventory_oracle.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_lakehouse_movilidad_publica_santiago_spark.operators.containment import (
    containment_pairs,
)
from data_lakehouse_movilidad_publica_santiago_spark.operators.corpus_stats import (
    novelty_scores,
)
from data_lakehouse_movilidad_publica_santiago_spark.operators.data_mix import (
    doremi_weights,
)


def _docs(spark, rows, cols=("doc_id", "text")):
    return spark.createDataFrame(rows, list(cols))


# ── containment ─────────────────────────────────────────────────────


def test_containment_subset_doc_found_jaccard_misses(spark):
    """doc 1 is wholly contained in doc 2 (c_ab = 1.0) but their
    Jaccard is only 3/10 — the pair a symmetric scan at 0.8 misses."""
    short = "alpha beta gamma delta epsilon"  # 3 distinct 3-grams
    long = short + " zeta eta theta iota kappa lambda mu"
    docs = _docs(spark, [(1, short), (2, long)])
    rows = containment_pairs(docs, threshold=0.8, k=3).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["n_a"] == 3 and r["n_shared"] == 3
    assert r["c_ab"] == pytest.approx(1.0)
    assert r["c_ba"] == pytest.approx(3 / r["n_b"], abs=1e-6)
    # and the symmetric Jaccard is below the threshold
    jac = r["n_shared"] / (r["n_a"] + r["n_b"] - r["n_shared"])
    assert jac < 0.8


def test_containment_disjoint_docs_emit_nothing(spark):
    docs = _docs(
        spark, [(1, "aa bb cc dd"), (2, "ee ff gg hh"), (3, "ii jj kk ll")]
    )
    assert containment_pairs(docs, threshold=0.1, k=3).count() == 0


def test_containment_max_df_prunes_boilerplate(spark):
    """A shingle shared by every doc is the only link between docs 1
    and 2; max_df below the corpus size prunes it, so the pair
    disappears — while a genuinely duplicated pair (3, 4) sharing rare
    shingles survives with exact (pre-pruning) denominators."""
    boiler = "click here to subscribe now"
    docs = _docs(
        spark,
        [
            (1, boiler + " unique one xx"),
            (2, boiler + " other words yy"),
            (3, "real content duplicated verbatim body"),
            (4, "real content duplicated verbatim body tail"),
            (5, boiler + " third carrier zz"),
        ],
    )
    unpruned = containment_pairs(docs, threshold=0.5, k=3)
    assert {(r["doc_a"], r["doc_b"]) for r in unpruned.collect()} >= {
        (1, 2),
        (3, 4),
    }
    pruned = containment_pairs(docs, threshold=0.5, k=3, max_df=2)
    got = {(r["doc_a"], r["doc_b"]): r for r in pruned.collect()}
    assert (1, 2) not in got
    assert (3, 4) in got
    r = got[(3, 4)]
    # denominators are pre-pruning distinct shingle counts
    assert r["n_a"] == 3 and r["n_b"] == 4 and r["n_shared"] == 3


def test_containment_ordering_and_symmetry(spark):
    """Exact duplicates: one (min_id, max_id) row, both directions 1."""
    docs = _docs(spark, [(7, "p q r s t"), (3, "p q r s t")])
    rows = containment_pairs(docs, threshold=0.9, k=3).collect()
    assert len(rows) == 1
    assert (rows[0]["doc_a"], rows[0]["doc_b"]) == (3, 7)
    assert rows[0]["c_ab"] == rows[0]["c_ba"] == pytest.approx(1.0)


# ── DoReMi-lite ──────────────────────────────────────────────────────


def test_doremi_identical_domains_stay_uniform(spark):
    """Domains with identical unigram distributions have zero KL →
    weights stay exactly uniform through every update step."""
    rows = [(i, "a", "x y z") for i in range(3)] + [
        (i + 10, "b", "x y z") for i in range(3)
    ]
    docs = _docs(spark, rows, cols=("doc_id", "domain", "text"))
    out = {
        r["domain"]: r
        for r in doremi_weights(docs, "domain", iters=3).collect()
    }
    assert out["a"]["excess_loss"] == 0.0
    assert out["a"]["weight"] == pytest.approx(0.5, abs=1e-4)
    assert out["b"]["weight"] == pytest.approx(0.5, abs=1e-4)


def test_doremi_divergent_domain_upweighted(spark):
    """A domain whose vocabulary diverges from the corpus average gets
    excess_loss > 0 and a weight above uniform; weights sum to 1."""
    rows = (
        [(i, "common", "the quick brown fox") for i in range(8)]
        + [(100 + i, "weird", "zx qv jk wp") for i in range(2)]
    )
    docs = _docs(spark, rows, cols=("doc_id", "domain", "text"))
    out = {
        r["domain"]: r for r in doremi_weights(docs, "domain").collect()
    }
    assert out["weird"]["excess_loss"] > out["common"]["excess_loss"]
    assert out["weird"]["weight"] > 0.5 > out["common"]["weight"]
    assert out["weird"]["weight"] + out["common"]["weight"] == pytest.approx(
        1.0, abs=1e-3
    )


def test_doremi_hand_computed_update(spark):
    """2 domains, hand-computed KL and 1 update step (eta=1, s=0)."""
    # domain a: tokens {x:2}; domain b: tokens {y:2}
    docs = _docs(
        spark,
        [(1, "a", "x x"), (2, "b", "y y")],
        cols=("doc_id", "domain", "text"),
    )
    out = {
        r["domain"]: r
        for r in doremi_weights(
            docs, "domain", iters=1, eta=1.0, smoothing=0.0
        ).collect()
    }
    # KL(a || corpus): p(x|a)=1, p(x|corpus)=1/2 → ln 2 per token
    kl = math.log(2.0)
    assert out["a"]["excess_loss"] == pytest.approx(round(kl, 4))
    # symmetric divergence → weights stay 0.5 even though KL > 0
    assert out["a"]["weight"] == pytest.approx(0.5, abs=1e-4)
    assert out["a"]["n_tokens"] == 2 and out["a"]["base_share"] == 0.5


def test_doremi_tokenless_domain_keeps_smoothing_floor(spark):
    """Round-7 ADVICE regression: a domain whose documents hold zero
    non-empty tokens must appear in the output (n_tokens 0, excess 0,
    smoothing-floor weight) instead of silently vanishing and
    renormalizing the remaining domains over a smaller K."""
    docs = _docs(
        spark,
        [
            (1, "a", "hello world hello"),
            (2, "a", "hello there"),
            (3, "b", "totally different words here"),
            (4, "empty", "   "),
            (5, "empty", ""),
        ],
        cols=("doc_id", "domain", "text"),
    )
    rows = {
        r["domain"]: r
        for r in doremi_weights(docs, "domain", iters=3).collect()
    }
    assert sorted(rows) == ["a", "b", "empty"]
    e = rows["empty"]
    assert e["n_docs"] == 2 and e["n_tokens"] == 0
    assert e["base_share"] == 0.0 and e["excess_loss"] == 0.0
    assert e["weight"] > 0.0  # smoothing floor, never dropped
    assert sum(r["weight"] for r in rows.values()) == pytest.approx(
        1.0, abs=1e-3
    )


def test_doremi_invariant_to_partitioning(spark):
    rows = [(i, f"d{i % 3}", f"w{i % 7} w{i % 5} common") for i in range(60)]
    docs = _docs(spark, rows, cols=("doc_id", "domain", "text"))
    one = {
        (r["domain"], r["weight"])
        for r in doremi_weights(docs.coalesce(1), "domain").collect()
    }
    many = {
        (r["domain"], r["weight"])
        for r in doremi_weights(docs.repartition(13), "domain").collect()
    }
    assert one == many


# ── novelty ─────────────────────────────────────────────────────────


def test_novelty_fraction_hand_computed(spark):
    """Candidate shares its first 3-gram with the reference and owns
    the other two → novelty 2/3."""
    ref = _docs(spark, [(0, "a b c x1 x2")])  # 3-grams: abc, bcx1, cx1x2
    cand = _docs(spark, [(1, "a b c d e")])  # abc, bcd, cde
    r = novelty_scores(cand, ref, n=3).collect()[0]
    assert r["n_grams"] == 3 and r["n_novel"] == 2
    assert r["novelty"] == pytest.approx(round(2 / 3, 6))


def test_novelty_bounds(spark):
    ref = _docs(spark, [(0, "m n o p q")])
    cand = _docs(spark, [(1, "m n o p q"), (2, "zz yy xx ww vv")])
    out = {r["doc_id"]: r for r in novelty_scores(cand, ref, n=3).collect()}
    assert out[1]["novelty"] == 0.0  # verbatim re-crawl
    assert out[2]["novelty"] == 1.0  # entirely new content


def test_novelty_short_doc_whole_shingle(spark):
    """Docs shorter than n words fall back to the whole-doc shingle —
    never a zero denominator."""
    ref = _docs(spark, [(0, "hi there")])
    cand = _docs(spark, [(1, "hi there"), (2, "bye")])
    out = {r["doc_id"]: r for r in novelty_scores(cand, ref, n=3).collect()}
    assert out[1]["n_grams"] == 1 and out[1]["novelty"] == 0.0
    assert out[2]["n_grams"] == 1 and out[2]["novelty"] == 1.0


def test_novelty_normalizes_text(spark):
    """Shingling runs on normalized text: case and punctuation do not
    manufacture novelty."""
    ref = _docs(spark, [(0, "The Quick! Brown? Fox jumps")])
    cand = _docs(spark, [(1, "the quick brown fox jumps")])
    r = novelty_scores(cand, ref, n=3).collect()[0]
    assert r["novelty"] == 0.0


# ── MMR ─────────────────────────────────────────────────────────────


def _vecs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        ["vec_id", "embedding"],
    )


def test_mmr_lambda_one_is_plain_topk(spark):
    from data_lakehouse_movilidad_publica_santiago_spark.operators.retrieval import (
        mmr_topk,
    )
    from data_lakehouse_movilidad_publica_santiago_spark.operators.similarity import (
        cosine_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = [float(x) for x in
         emb.filter("vec_id = 0").collect()[0]["embedding"]]  # fmt: skip
    plain = [r["vec_id"] for r in cosine_topk(emb, q, k=5).collect()]
    mmr = [r["vec_id"] for r in mmr_topk(emb, q, k=5, lam=1.0).collect()]
    assert mmr == plain


def test_mmr_skips_redundant_near_duplicate(spark):
    """Vectors 1 and 2 are nearly identical and most query-relevant;
    vector 3 is less relevant but orthogonal to them. Plain top-3
    keeps both near-twins; MMR at lam=0.5 selects one twin, then the
    diverse vector 3 ahead of the second twin."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.retrieval import (
        mmr_topk,
    )

    # query NOT parallel to the top hit, else penalty ≡ relevance for
    # every candidate and the comparison degenerates
    rows = [
        (1, [0.9, 0.3, 0.0]),
        (2, [0.89, 0.32, 0.0]),  # near-twin of 1
        (3, [0.8, -0.55, 0.0]),  # diverse, still query-relevant
        (4, [-1.0, 0.0, 0.0]),
    ]
    emb = _vecs(spark, rows)
    out = mmr_topk(emb, [1.0, 0.0, 0.0], k=2, lam=0.5).collect()
    assert [r["vec_id"] for r in out] == [1, 3]
    assert out[0]["rank"] == 1 and out[0]["redundancy"] == 0.0

    import math

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (
            math.sqrt(sum(x * x for x in a))
            * math.sqrt(sum(y * y for y in b))
        )

    assert out[1]["redundancy"] == pytest.approx(
        cos(rows[2][1], rows[0][1]), abs=1e-4
    )
    # and the twin would have scored LOWER than the diverse pick
    mmr2 = 0.5 * cos(rows[1][1], [1, 0, 0]) - 0.5 * cos(
        rows[1][1], rows[0][1]
    )
    assert out[1]["mmr_score"] > mmr2


def test_mmr_partitioning_invariant(spark):
    from data_lakehouse_movilidad_publica_santiago_spark.operators.retrieval import (
        mmr_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = [float(x) for x in
         emb.filter("vec_id = 7").collect()[0]["embedding"]]  # fmt: skip
    a = [tuple(r) for r in mmr_topk(emb.coalesce(1), q, k=4).collect()]
    b = [tuple(r) for r in mmr_topk(emb.repartition(16), q, k=4).collect()]
    assert a == b
