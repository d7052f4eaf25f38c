"""Behavioral tests for the corpus-preparation operators: PII
scan/redaction, RAG chunking, deterministic global shuffle, session
windows, repetition stats. The differential oracle gate lives in
test_inventory_oracle.py; these pin the semantics on handcrafted
inputs where the expected answer is known by inspection."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from data_lakehouse_movilidad_publica_santiago_spark.functions.text import (
    dup_ngram_fraction,
)
from data_lakehouse_movilidad_publica_santiago_spark.operators.chunking import (
    chunk_documents,
    global_shuffle,
)
from data_lakehouse_movilidad_publica_santiago_spark.operators.pii import (
    pii_count,
    redact_pii,
)
from data_lakehouse_movilidad_publica_santiago_spark.operators.windows import (
    sessionize,
)


# ── PII ─────────────────────────────────────────────────────────────


def test_pii_scan_and_redact(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@example.co.uk or ops@x.io thanks"),
            (2, "server 192.168.0.1 and 10.2.3.4 up"),
            (3, "call 555-123-4567 or +56 222-333-4444"),
            (4, "no identifiers here"),
        ],
        "id bigint, text string",
    )
    counted = df.select(
        "id",
        pii_count(F.col("text"), "email").alias("e"),
        pii_count(F.col("text"), "ipv4").alias("i"),
        pii_count(F.col("text"), "phone").alias("p"),
        redact_pii(F.col("text")).alias("red"),
    )
    rows = {r["id"]: r for r in counted.collect()}
    assert (rows[1]["e"], rows[1]["i"], rows[1]["p"]) == (2, 0, 0)
    assert (rows[2]["e"], rows[2]["i"], rows[2]["p"]) == (0, 2, 0)
    assert (rows[3]["e"], rows[3]["i"], rows[3]["p"]) == (0, 0, 2)
    assert (rows[4]["e"], rows[4]["i"], rows[4]["p"]) == (0, 0, 0)
    assert rows[1]["red"] == "mail me at [EMAIL] or [EMAIL] thanks"
    assert rows[2]["red"] == "server [IP] and [IP] up"
    assert rows[3]["red"] == "call [PHONE] or +56 [PHONE]"
    assert rows[4]["red"] == "no identifiers here"


def test_redaction_is_complete(spark):
    """scan(redact(text)) == 0 for every class — no partial rewrites."""
    df = spark.createDataFrame(
        [(1, "x a@b.com 1.2.3.4 555-000-1111 b@c.org 9.9.9.9 y")],
        "id bigint, text string",
    )
    red = df.select(redact_pii(F.col("text")).alias("t"))
    leftover = red.select(
        *[pii_count(F.col("t"), k).alias(k) for k in ("email", "ipv4", "phone")]
    ).collect()[0]
    assert (leftover["email"], leftover["ipv4"], leftover["phone"]) == (0, 0, 0)


# ── chunking ────────────────────────────────────────────────────────


def _doc(n_tokens: int) -> str:
    return " ".join(f"w{i}" for i in range(1, n_tokens + 1))


@pytest.mark.parametrize("n_tok", [1, 5, 64, 65, 112, 113, 200])
def test_chunks_cover_every_token_exactly(spark, n_tok):
    df = spark.createDataFrame([(1, _doc(n_tok))], "doc_id bigint, text string")
    chunks = chunk_documents(df, chunk_tokens=64, overlap=16).collect()
    starts = sorted((c["start_tok"], c["n_tok"]) for c in chunks)
    # 0-based idx == rank of start under stride 48
    assert sorted(c["chunk_idx"] for c in chunks) == list(range(len(chunks)))
    # stride is constant, first chunk starts at token 1
    assert starts[0][0] == 1
    assert all(
        b[0] - a[0] == 48 for a, b in zip(starts, starts[1:])
    )
    # the union of [start, start+n) covers 1..n_tok with no gap
    covered = set()
    for s, n in starts:
        covered.update(range(s, s + n))
    assert covered == set(range(1, n_tok + 1))
    # every chunk except possibly the last is full-size
    assert all(n == 64 for _, n in starts[:-1])


def test_chunk_bad_overlap_raises(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap=8)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap=-1)


# ── global shuffle ──────────────────────────────────────────────────


def test_global_shuffle_is_permutation_and_deterministic(spark):
    df = spark.createDataFrame(
        [(i, f"d{i}") for i in range(250)], "doc_id bigint, text string"
    )
    out1 = {
        r["doc_id"]: r["pos"]
        for r in global_shuffle(df, seed="s1", n_parts=8).collect()
    }
    assert sorted(out1.values()) == list(range(1, 251))
    # deterministic under a different partition count
    out1b = {
        r["doc_id"]: r["pos"]
        for r in global_shuffle(
            df.repartition(13), seed="s1", n_parts=3
        ).collect()
    }
    assert out1 == out1b
    # a different seed produces a different permutation
    out2 = {
        r["doc_id"]: r["pos"]
        for r in global_shuffle(df, seed="s2", n_parts=8).collect()
    }
    assert out1 != out2
    spark.catalog.clearCache()


# ── session windows ─────────────────────────────────────────────────


def test_sessionize_gap_boundary(spark):
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def ts(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    # user 1: 0, 29, 58 chain (gaps < 30); the event at exactly +88
    #         (58+30) has a TOUCHING range and still merges — Spark
    #         unions adjacent [ts, ts+gap) ranges; the event at +119
    #         (88+31) is strictly past the gap and starts a NEW
    #         session. The DuckDB oracle's break condition mirrors
    #         this (strict >).
    # user 2: single event.
    df = spark.createDataFrame(
        [
            (1, ts(0)),
            (1, ts(29)),
            (1, ts(58)),
            (1, ts(88)),
            (1, ts(119)),
            (2, ts(5)),
        ],
        "user_id bigint, ts timestamp",
    )
    rows = sorted(
        sessionize(df, gap="30 minutes").collect(),
        key=lambda r: (r["user_id"], r["session_start"]),
    )
    assert [(r["user_id"], r["n_events"]) for r in rows] == [
        (1, 4),
        (1, 1),
        (2, 1),
    ]
    first = rows[0]
    assert first["session_start"] == ts(0)
    assert first["session_end"] == ts(118)  # last event (88) + 30 gap


# ── repetition ──────────────────────────────────────────────────────


def test_dup_ngram_fraction_known_values(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d"),          # 3 distinct 2-grams of 3 → 0
            (2, "a b a b a b"),      # 5 grams, 2 distinct → 0.6
            (3, "x"),                # single token → degenerate 0
        ],
        "id bigint, text string",
    )
    got = {
        r["id"]: round(r["f"], 6)
        for r in df.select(
            "id", dup_ngram_fraction(F.col("text"), 2).alias("f")
        ).collect()
    }
    assert got == {1: 0.0, 2: 0.6, 3: 0.0}
