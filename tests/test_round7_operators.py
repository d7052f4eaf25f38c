"""Round-7 operator semantics: tf-idf cosine retrieval, SoftDedup
reweighting, C4 global sentence dedup, per-benchmark contamination
matrix, stupid-backoff trigram scoring, and the Zipf spectrum fit —
hand-computed expectations on constructed corpora (the sf0.01 DuckDB
differential lives in test_inventory_oracle.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_lakehouse_movilidad_publica_santiago_spark.operators.corpus_stats import (
    zipf_spectrum,
)
from data_lakehouse_movilidad_publica_santiago_spark.operators.data_mix import (
    contamination_matrix,
)
from data_lakehouse_movilidad_publica_santiago_spark.operators.lm_filter import (
    score_stupid_backoff,
    train_trigram_lm,
)
from data_lakehouse_movilidad_publica_santiago_spark.operators.retrieval import (
    tfidf_topk,
)
from data_lakehouse_movilidad_publica_santiago_spark.operators.sentence_dedup import (
    fixed_width_sentences,
    sentence_dedup,
    split_sentences,
)
from data_lakehouse_movilidad_publica_santiago_spark.operators.soft_dedup import (
    soft_dedup,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


# ── tf-idf ──────────────────────────────────────────────────────────


def test_tfidf_hand_computed(spark):
    """3-doc corpus, query {b}: doc 2 (b b c) outranks doc 1 (a b)
    because tf=2 beats tf=1 at comparable norms; doc 3 (a c) never
    appears (dot = 0)."""
    docs = _docs(spark, [(1, "a b"), (2, "b b c"), (3, "a c")])
    out = {r["doc_id"]: r for r in tfidf_topk(docs, ["b"]).collect()}
    assert set(out) == {1, 2}

    def idf(df, n=3):
        return math.log((1 + n) / (1 + df)) + 1

    ia, ib, ic = idf(2), idf(2), idf(2)
    # doc 2: w(b)=2*ib, w(c)=1*ic; dot = 2*ib*ib
    norm2 = math.sqrt((2 * ib) ** 2 + ic**2)
    qnorm = ib
    exp2 = round(2 * ib * ib / (norm2 * qnorm), 4)
    assert out[2]["score"] == pytest.approx(exp2, abs=1e-4)
    # doc 1: w(a)=ia, w(b)=ib; dot = ib*ib
    norm1 = math.sqrt(ia**2 + ib**2)
    exp1 = round(ib * ib / (norm1 * qnorm), 4)
    assert out[1]["score"] == pytest.approx(exp1, abs=1e-4)
    assert out[2]["score"] > out[1]["score"]


def test_tfidf_unseen_query_term_uses_max_idf(spark):
    """A query term absent from the corpus contributes ln(1+N)+1 to
    the query norm (df = 0), deflating every score but changing no
    ranking."""
    docs = _docs(spark, [(1, "a b"), (2, "b b")])
    base = {r["doc_id"]: r["score"] for r in tfidf_topk(docs, ["b"]).collect()}
    mixed = {
        r["doc_id"]: r["score"]
        for r in tfidf_topk(docs, ["b", "zzz"]).collect()
    }
    assert set(base) == set(mixed) == {1, 2}
    for d in base:
        assert mixed[d] < base[d]
    assert (mixed[2] > mixed[1]) == (base[2] > base[1])


def test_tfidf_empty_query_raises(spark):
    with pytest.raises(ValueError):
        tfidf_topk(_docs(spark, [(1, "a")]), [])


# ── soft dedup ──────────────────────────────────────────────────────


def test_soft_dedup_unique_doc_full_weight(spark):
    """All-unique trigrams → dup_score 0, weight 1.0, always kept."""
    docs = _docs(spark, [(1, "q w e r t y u")])
    row = soft_dedup(docs).collect()[0]
    assert row["n_grams"] == 5
    assert row["dup_score"] == 0.0
    assert row["weight"] == 1.0
    assert row["kept"] is True


def test_soft_dedup_boilerplate_downweighted(spark):
    """Five identical docs share every trigram (cf = 5): dup_score
    ln 5, weight 1/(1+ln5); a unique doc stays at weight 1."""
    rows = [(i, "a b c d e") for i in range(5)] + [(9, "z y x w v")]
    out = {r["doc_id"]: r for r in soft_dedup(_docs(spark, rows)).collect()}
    exp = round(1.0 / (1.0 + math.log(5)), 4)
    for i in range(5):
        assert out[i]["dup_score"] == round(math.log(5), 4)
        assert out[i]["weight"] == exp
    assert out[9]["weight"] == 1.0


def test_soft_dedup_short_doc_no_evidence(spark):
    """Docs shorter than n words: n_grams 0, NULL score, weight 1."""
    row = soft_dedup(_docs(spark, [(1, "a b")])).collect()[0]
    assert row["n_grams"] == 0
    assert row["dup_score"] is None
    assert row["weight"] == 1.0 and row["kept"] is True


def test_soft_dedup_weight_floor(spark):
    """Extreme boilerplate can't fall below the floor."""
    rows = [(i, "a b c") for i in range(200)]
    out = soft_dedup(_docs(spark, rows), weight_floor=0.25).collect()
    assert all(r["weight"] == 0.25 for r in out)


def test_soft_dedup_passthrough_collision_raises(spark):
    docs = _docs(spark, [(1, "a b c")]).withColumn("weight", F.lit(1))
    with pytest.raises(ValueError):
        soft_dedup(docs, passthrough=["weight"])


# ── sentence dedup ──────────────────────────────────────────────────


def _sdocs(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return sentence_dedup(df, split_sentences(F.col("text")))


def test_sentence_dedup_keep_first_across_docs(spark):
    """A sentence repeated across docs survives only in the smallest
    (doc_id, pos); later docs lose it but keep their own sentences in
    original order."""
    out = {
        r["doc_id"]: r
        for r in _sdocs(
            spark,
            [
                (1, "alpha beta. shared line here."),
                (2, "shared line here. gamma delta."),
            ],
        ).collect()
    }
    assert out[1]["n_removed"] == 0
    assert out[1]["text_clean"] == "alpha beta. shared line here."
    assert out[2]["n_removed"] == 1
    assert out[2]["text_clean"] == "gamma delta."


def test_sentence_dedup_within_doc_repeat(spark):
    """The same sentence twice inside ONE doc keeps the earlier pos."""
    out = _sdocs(spark, [(1, "dup dup. other one. dup dup.")]).collect()[0]
    assert out["n_sentences"] == 3 and out["n_removed"] == 1
    assert out["text_clean"] == "dup dup. other one."


def test_sentence_dedup_fully_duplicate_doc_empties(spark):
    out = {
        r["doc_id"]: r
        for r in _sdocs(
            spark, [(1, "same thing."), (2, "same thing.")]
        ).collect()
    }
    assert out[2]["text_clean"] == "" and out[2]["n_removed"] == 1


def test_fixed_width_sentences_grouping(spark):
    """Width 3 over 7 words → groups of 3/3/1."""
    df = spark.createDataFrame([(1, "a b c d e f g")], ["doc_id", "text"])
    arr = df.select(
        fixed_width_sentences(F.col("text"), F.lit(3)).alias("s")
    ).collect()[0]["s"]
    assert arr == ["a b c", "d e f", "g"]


# ── contamination matrix ────────────────────────────────────────────


def test_contamination_matrix_counts_and_zero_fill(spark):
    """Train doc 1 contains bench A's exact 16-char content; bench B
    has no overlap and still reports 0."""
    shared = "the quick brown fox jumps over it"
    train = _docs(spark, [(1, shared + " extra tail"), (2, "totally different words here")])
    evals = {
        "A": _docs(spark, [(100, shared)]),
        "B": _docs(spark, [(200, "nothing in common at all")]),
    }
    out = {r["benchmark"]: r for r in contamination_matrix(train, evals).collect()}
    assert out["A"]["n_contaminated"] == 1
    assert out["A"]["shared_occurrences"] > 0
    assert out["B"]["n_contaminated"] == 0 and out["B"]["shared_occurrences"] == 0


def test_contamination_matrix_grouped(spark):
    shared = "the quick brown fox jumps over it"
    train = spark.createDataFrame(
        [(1, shared + " tail", "s1"), (2, shared + " tail two", "s2"),
         (3, "unrelated other words entirely", "s1")],
        ["doc_id", "text", "source"],
    )
    evals = {"A": _docs(spark, [(100, shared)])}
    out = {
        (r["benchmark"], r["source"]): r["n_contaminated"]
        for r in contamination_matrix(train, evals, group_col="source").collect()
    }
    assert out[("A", "s1")] == 1 and out[("A", "s2")] == 1
    assert ("A", None) not in out


def test_contamination_matrix_requires_eval_sets(spark):
    with pytest.raises(ValueError):
        contamination_matrix(_docs(spark, [(1, "a")]), {})


# ── stupid backoff ──────────────────────────────────────────────────


def test_stupid_backoff_hand_computed(spark):
    """Reference 'a b c a b d': seen trigram uses c123/c12; unseen
    trigram with seen continuation bigram backs off to α·c23/c2;
    OOV bottoms out at α²·(c3+1)/(T+V)."""
    ref = _docs(spark, [(10, "a b c a b d")])
    model = train_trigram_lm(ref)
    # doc 'a b c': trigram seen once, c12('a b')=2 → S=1/2
    out1 = score_stupid_backoff(_docs(spark, [(1, "a b c")]), model).collect()[0]
    assert out1["n_trigrams"] == 1
    assert out1["cross_entropy"] == round(-math.log(0.5), 4)
    # doc 'c c a': trigram unseen, bigram 'c a' seen once, c1(c)=1 →
    # S = 0.4 * 1/1
    out2 = score_stupid_backoff(_docs(spark, [(2, "c c a")]), model).collect()[0]
    assert out2["cross_entropy"] == round(-math.log(0.4), 4)
    # doc 'z z z': everything OOV → S = 0.4² · (0+1)/(6+4)
    out3 = score_stupid_backoff(_docs(spark, [(3, "z z z")]), model).collect()[0]
    assert out3["cross_entropy"] == round(-math.log(0.4 * 0.4 * 0.1), 4)


def test_stupid_backoff_short_doc_null(spark):
    model = train_trigram_lm(_docs(spark, [(10, "a b c")]))
    row = score_stupid_backoff(_docs(spark, [(1, "a b")]), model).collect()[0]
    assert row["n_trigrams"] == 0 and row["cross_entropy"] is None


def test_stupid_backoff_passthrough_collision_raises(spark):
    model = train_trigram_lm(_docs(spark, [(10, "a b c")]))
    docs = _docs(spark, [(1, "a b c")]).withColumn("cross_entropy", F.lit(1))
    with pytest.raises(ValueError):
        score_stupid_backoff(docs, model, passthrough=["cross_entropy"])


# ── zipf spectrum ───────────────────────────────────────────────────


def test_zipf_exact_ols(spark):
    """freqs 4/2/1 at ranks 1/2/3: slope/r² must equal the closed-form
    OLS over (ln r, ln f)."""
    docs = _docs(spark, [(1, "a a a a b b c")])
    row = zipf_spectrum(docs, top_r=10).collect()[0]
    xs = [math.log(r) for r in (1, 2, 3)]
    ys = [math.log(f) for f in (4, 2, 1)]
    mx, my = sum(xs) / 3, sum(ys) / 3
    sxx = sum((x - mx) ** 2 for x in xs)
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    slope = sxy / sxx
    r2 = sxy**2 / (sxx * sum((y - my) ** 2 for y in ys))
    assert row["n_tokens"] == 7 and row["vocab"] == 3 and row["top_r"] == 3
    assert row["zipf_slope"] == pytest.approx(round(slope, 4), abs=1e-4)
    assert row["zipf_r2"] == pytest.approx(round(r2, 4), abs=1e-4)


def test_zipf_grouped_and_tie_break(spark):
    """Two groups fit independently; all-tied frequencies give slope
    exactly 0."""
    df = spark.createDataFrame(
        [(1, "x y z", "g1"), (2, "a a b b c c", "g2")],
        ["doc_id", "text", "lang"],
    )
    out = {r["lang"]: r for r in zipf_spectrum(df, group_col="lang").collect()}
    assert out["g1"]["zipf_slope"] == 0.0
    assert out["g2"]["zipf_slope"] == 0.0
    assert out["g1"]["vocab"] == 3 and out["g2"]["n_tokens"] == 6


def test_zipf_ungrouped_plan_cuts_before_window(spark):
    """The global (group_col=None) path must NOT sort the whole
    vocabulary through a single-partition rank window:
    InferWindowGroupLimit does not fire on an empty partition spec
    (Spark 4.1.2), so the cut has to be an explicit orderBy+limit
    (TakeOrderedAndProject = per-partition heaps) BEFORE the window.
    The grouped path keeps the window but must be group-limited."""
    docs = _docs(spark, [(i, f"tok{i} tok{i % 7} common") for i in range(40)])

    global_plan = (
        zipf_spectrum(docs, top_r=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in global_plan
    # the vocabulary-wide single-partition sort would show as
    # Exchange SinglePartition + Sort BETWEEN the rank Window and the
    # token-count scan; with the cut in place the Window's child chain
    # reaches TakeOrderedAndProject with no Exchange/Sort in between
    # (TakeOrdered's output is already single-partition and ordered).
    win_idx = global_plan.index("Window ")
    cut_idx = global_plan.index("TakeOrderedAndProject")
    assert win_idx < cut_idx
    between = global_plan[win_idx:cut_idx]
    assert "Exchange" not in between and "Sort " not in between

    grouped = spark.createDataFrame(
        [(i, "a b c", "g%d" % (i % 2)) for i in range(10)],
        ["doc_id", "text", "lang"],
    )
    grouped_plan = (
        zipf_spectrum(grouped, group_col="lang", top_r=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in grouped_plan
    # and the rewrite stays value-identical on the global path
    rows = zipf_spectrum(docs, top_r=3).collect()
    assert len(rows) == 1 and rows[0]["top_r"] == 3


def test_trigram_lm_min_count_pruning(spark):
    """min_count prunes singleton tri/bigrams; a pruned trigram backs
    off exactly as if unseen, and the backoff chain stays closed (a
    surviving trigram's prefix bigram has count >= the trigram's, so
    the c123/c12 division never loses its denominator). Unigrams and
    totals are unpruned, so OOV behavior is unchanged."""
    # 'a b c' twice (c123=2), 'a b d' once (c123=1, pruned at 2)
    ref = _docs(spark, [(10, "a b c a b c a b d")])
    full = train_trigram_lm(ref)
    pruned = train_trigram_lm(ref, min_count=2)
    assert pruned.trigrams.count() < full.trigrams.count()
    # surviving trigram's prefix bigram survived too (chain closed)
    tri = {r["gram"] for r in pruned.trigrams.collect()}
    bi = {r["gram"] for r in pruned.bigrams.collect()}
    assert all(" ".join(g.split()[:2]) in bi for g in tri)
    # totals unpruned: same corpus scale as the full model
    assert pruned.totals.collect() == full.totals.collect()
    # 'a b c' survives pruning: same score under both models
    s_full = score_stupid_backoff(_docs(spark, [(1, "a b c")]), full).collect()[0]
    s_pruned = score_stupid_backoff(_docs(spark, [(1, "a b c")]), pruned).collect()[0]
    assert s_pruned["cross_entropy"] == s_full["cross_entropy"]
    # 'a b d' was pruned: the pruned model backs off (higher entropy)
    p_full = score_stupid_backoff(_docs(spark, [(2, "a b d")]), full).collect()[0]
    p_pruned = score_stupid_backoff(_docs(spark, [(2, "a b d")]), pruned).collect()[0]
    assert p_pruned["cross_entropy"] > p_full["cross_entropy"]
