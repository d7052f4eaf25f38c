"""Unit tests for exact substring-span dedup (Lee et al. ExactSubstr)
on hand-crafted corpora where every span boundary is known."""

from __future__ import annotations

from data_lakehouse_movilidad_publica_santiago_spark.operators.span_dedup import (
    duplicated_spans,
    mask_duplicated_spans,
    span_dedup_stats,
)

# a shared 10-token passage inside otherwise-unique 20-token docs
SHARED = "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10"
DOC_A = f"a1 a2 a3 a4 a5 {SHARED} a6 a7 a8 a9 a10"
DOC_B = f"b1 b2 b3 b4 b5 {SHARED} b6 b7 b8 b9 b10"
DOC_C = "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


class TestSpans:
    def test_shared_passage_marks_merged_span(self, spark):
        docs = _df(spark, [(1, DOC_A), (2, DOC_B), (3, DOC_C)])
        spans = {
            r["doc_id"]: (r["span_start"], r["span_end"], r["n_windows"])
            for r in duplicated_spans(docs, window=8).collect()
        }
        # the 10-token shared passage sits at tokens 6..15 of each doc;
        # its 3 duplicated 8-windows (starts 6,7,8) merge into one span
        assert 3 not in spans
        assert spans[1] == (6, 15, 3)
        assert spans[2] == (6, 15, 3)

    def test_within_document_repetition_detected(self, spark):
        text = "x1 x2 x3 x4 x5 x6 x7 x8 sep x1 x2 x3 x4 x5 x6 x7 x8"
        spans = duplicated_spans(_df(spark, [(1, text)]), window=8).collect()
        got = sorted((r["span_start"], r["span_end"]) for r in spans)
        assert got == [(1, 8), (10, 17)]

    def test_adjacent_spans_merge(self, spark):
        # two duplicated 8-windows at starts 1 and 9 are adjacent
        # (cover 1..8 and 9..16) -> one island 1..16
        blk1 = "y1 y2 y3 y4 y5 y6 y7 y8"
        blk2 = "z1 z2 z3 z4 z5 z6 z7 z8"
        docs = _df(
            spark,
            [
                (1, f"{blk1} {blk2} t1 t2 t3 t4 t5 t6 t7"),
                (2, f"{blk1} u1 u2 u3 u4 u5 u6 u7"),
                (3, f"{blk2} v1 v2 v3 v4 v5 v6 v7"),
            ],
        )
        spans = {
            r["doc_id"]: (r["span_start"], r["span_end"])
            for r in duplicated_spans(docs, window=8).collect()
            if r["doc_id"] == 1
        }
        assert spans[1] == (1, 16)


class TestStats:
    def test_counts_and_fraction(self, spark):
        docs = _df(spark, [(1, DOC_A), (2, DOC_B), (3, DOC_C)])
        stats = {r["doc_id"]: r for r in span_dedup_stats(docs, window=8).collect()}
        assert stats[1]["n_tokens"] == 20
        assert stats[1]["dup_windows"] == 3
        assert stats[1]["dup_tokens"] == 10
        assert stats[1]["dup_frac"] == 0.5
        assert stats[3]["dup_windows"] == 0
        assert stats[3]["dup_tokens"] == 0
        assert stats[3]["dup_frac"] == 0.0

    def test_short_docs_report_zero(self, spark):
        stats = span_dedup_stats(
            _df(spark, [(1, "only three tokens")]), window=8
        ).collect()[0]
        assert stats["n_tokens"] == 3
        assert stats["dup_windows"] == 0


class TestMask:
    def test_masked_text_drops_exactly_the_span(self, spark):
        docs = _df(spark, [(1, DOC_A), (2, DOC_B), (3, DOC_C)])
        kept = {
            r["doc_id"]: r["kept_text"]
            for r in mask_duplicated_spans(docs, window=8).collect()
        }
        assert kept[1] == "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
        assert kept[2] == "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"
        assert kept[3] == DOC_C

    def test_exact_duplicate_doc_masks_to_empty(self, spark):
        same = "d1 d2 d3 d4 d5 d6 d7 d8 d9"
        kept = {
            r["doc_id"]: r["kept_text"]
            for r in mask_duplicated_spans(
                _df(spark, [(1, same), (2, same)]), window=8
            ).collect()
        }
        assert kept == {1: "", 2: ""}
