"""BPE trainer tests: the published Sennrich et al. 2016 example,
exact greedy-merge semantics on back-to-back pairs, deterministic
tie-breaking, and the vocabulary-join encoder with its unseen-word
fallback."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_movilidad_publica_santiago_spark.operators.bpe import (
    bpe_encode_counts,
    bpe_train,
    merge_table,
    word_counts,
)


def _corpus(spark, text: str):
    return spark.createDataFrame([(1, text)], ["doc_id", "text"])


def test_sennrich_example_merges(spark):
    """The paper's worked example (low x5, lower x2, newest x6,
    widest x3) learns es, est, est</w>, lo, low in that order."""
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    merges, words = bpe_train(_corpus(spark, text), num_merges=5)
    assert [(m[1], m[2], m[3]) for m in merges] == [
        ("e", "s", 9),
        ("es", "t", 9),
        ("est", "</w>", 9),
        ("l", "o", 7),
        ("lo", "w", 7),
    ]
    got = {r["word"]: r["syms"] for r in words.collect()}
    assert got["low"] == ["low", "</w>"]
    assert got["newest"] == ["n", "e", "w", "est</w>"]
    assert got["widest"] == ["w", "i", "d", "est</w>"]


def test_greedy_back_to_back_merges(spark):
    """"aaaa" with merge (a,a) must become [aa, aa, </w>] — greedy
    left-to-right pairs up adjacent runs, the case a global
    regexp_replace gets wrong by consuming the separator."""
    merges, words = bpe_train(_corpus(spark, "aaaa"), num_merges=2)
    assert (merges[0][1], merges[0][2], merges[0][3]) == ("a", "a", 3)
    # iteration 2 tie: (aa,</w>) freq 1 vs (aa,aa) freq 1 — '<' sorts
    # before 'a', so the deterministic (freq DESC, l, r) pick is
    # (aa, </w>)
    assert (merges[1][1], merges[1][2]) == ("aa", "</w>")
    got = {r["word"]: r["syms"] for r in words.collect()}
    assert got["aaaa"] == ["aa", "aa</w>"]


def test_odd_run_leaves_trailing_symbol(spark):
    """"aaa": greedy merge of (a,a) pairs the FIRST two, leaving the
    third unpaired — [aa, a, </w>]."""
    merges, words = bpe_train(_corpus(spark, "aaa bbb"), num_merges=1)
    got = {r["word"]: r["syms"] for r in words.collect()}
    # winner is (a,a) or (b,b) by tie-break: both freq 2, 'a' < 'b'
    assert (merges[0][1], merges[0][2]) == ("a", "a")
    assert got["aaa"] == ["aa", "a", "</w>"]
    assert got["bbb"] == ["b", "b", "b", "</w>"]


def test_word_counts_lowercases_and_drops_empties(spark):
    wc = {
        r["word"]: r["cnt"]
        for r in word_counts(_corpus(spark, "The  the THE tail")).collect()
    }
    assert wc == {"the": 3, "tail": 1}


def test_encode_counts_and_unseen_fallback(spark):
    """Encoding is a vocabulary join over the trained word table;
    unseen words fall back to chars + 1 (their untrained length)."""
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    _, words = bpe_train(_corpus(spark, text), num_merges=5)
    docs = spark.createDataFrame(
        [(1, "low low newest"), (2, "unseen low")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_encode_counts(docs, words).collect()
    }
    # low=2 syms, newest=4 syms → 2+2+4 = 8
    assert got[1] == (3, 8)
    # unseen: 6 chars + 1 = 7; low = 2 → 9
    assert got[2] == (2, 9)


def test_merge_table_schema(spark):
    mt = merge_table(spark, [(1, "e", "s", 9)])
    assert mt.columns == ["rank", "left_sym", "right_sym", "freq"]
    assert [tuple(r) for r in mt.collect()] == [(1, "e", "s", 9)]


def test_fully_merged_word_stops_cleanly(spark):
    """A word reduced to ONE symbol must not crash pair counting
    (Spark's sequence(1, 0) counts down instead of returning empty)."""
    merges, words = bpe_train(_corpus(spark, "ab ab ab"), num_merges=4)
    got = {r["word"]: r["syms"] for r in words.collect()}
    assert got["ab"] == ["ab</w>"]
    # only 2 merges possible: (a,b) then (ab,</w>)
    assert len(merges) == 2
