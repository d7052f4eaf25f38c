"""Property-based invariants for ExactSubstr span dedup: on random
corpora, the accounting must be internally consistent and the masked
rebuild must agree with it token-for-token."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_lakehouse_movilidad_publica_santiago_spark.operators.span_dedup import (
    mask_duplicated_spans,
    span_dedup_stats,
)

# tiny vocab + short docs make cross-doc window collisions likely, so
# the dup machinery is actually exercised rather than vacuously green
token = st.sampled_from(["a", "b", "c", "d"])
doc = st.lists(token, min_size=1, max_size=14).map(" ".join)
corpus = st.lists(doc, min_size=2, max_size=6)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=corpus)
def test_span_dedup_invariants(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    window = 3

    stats = {r["doc_id"]: r for r in span_dedup_stats(docs, window=window).collect()}
    kept = {
        r["doc_id"]: r["kept_text"]
        for r in mask_duplicated_spans(docs, window=window).collect()
    }

    assert set(stats) == set(range(len(texts)))
    for i, text in enumerate(rows):
        doc_id, original = text
        toks = original.split(" ")
        s = stats[doc_id]
        # accounting bounds
        assert s["n_tokens"] == len(toks)
        assert 0 <= s["dup_tokens"] <= s["n_tokens"]
        assert s["dup_windows"] >= 0
        if s["dup_windows"] > 0:
            assert s["dup_tokens"] >= window  # a span covers >= one window
        # masked rebuild agrees with the accounting exactly
        kept_toks = kept[doc_id].split(" ") if kept[doc_id] else []
        assert len(kept_toks) == s["n_tokens"] - s["dup_tokens"]
        # survivors are an order-preserving subsequence of the original
        it = iter(toks)
        assert all(any(tok == o for o in it) for tok in kept_toks)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=corpus)
def test_identical_corpora_fully_masked(spark, texts):
    # duplicate every doc: every window long enough occurs twice, so
    # every doc with >= window tokens must be fully covered
    window = 3
    rows = [(i, t) for i, t in enumerate(texts)] + [
        (1000 + i, t) for i, t in enumerate(texts)
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    stats = {r["doc_id"]: r for r in span_dedup_stats(docs, window=window).collect()}
    for doc_id, text in rows:
        s = stats[doc_id]
        n = len(text.split(" "))
        if n >= window:
            assert s["dup_tokens"] == n, (doc_id, text)
        else:
            assert s["dup_tokens"] == 0


# ── LM perplexity invariants ────────────────────────────────────────

from data_lakehouse_movilidad_publica_santiago_spark.operators.lm_filter import (  # noqa: E402
    score_perplexity,
    train_bigram_lm,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=corpus)
def test_lm_cross_entropy_bounds(spark, texts):
    """Add-one smoothing guarantees P(w2|w1) = (c12+1)/(c1+V) <= 1
    (since c12 <= c1 and V >= 1), so cross-entropy is >= 0; and
    P >= 1/(total_tokens + V) bounds it above. Every doc with >= 2
    tokens scores; shorter docs score NULL."""
    rows = [(i, t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    model = train_bigram_lm(docs)
    total_tokens = sum(len(t.split(" ")) for t in texts)
    vocab = model.vocab_size
    import math

    upper = math.log(total_tokens + vocab) + 1e-9
    got = {r["doc_id"]: r for r in score_perplexity(docs, model).collect()}
    for doc_id, text in rows:
        n = len(text.split(" "))
        r = got[doc_id]
        if n < 2:
            assert r["n_bigrams"] == 0 and r["cross_entropy"] is None
        else:
            assert r["n_bigrams"] == n - 1
            assert -1e-9 <= r["cross_entropy"] <= upper
