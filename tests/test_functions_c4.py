"""C4 battery tests (Raffel et al. 2020 §2.2): line filters, the
ordered page-level reason chain, precedence, and fail-closed NULL
handling."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_movilidad_publica_santiago_spark.functions.c4 import (
    C4_REASONS,
    c4_kept_lines,
    c4_reason,
)


def _verdicts(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = df.select(
        "doc_id",
        c4_reason(F.col("text"), **kw).alias("r"),
        c4_kept_lines(F.col("text")).alias("kept"),
    ).collect()
    return {r["doc_id"]: (r["r"], r["kept"]) for r in out}


_CLEAN = (
    "This is a good line.\nAnother fine line here!\nThird one, yes?\n"
    'He said "stop right there."\nFifth sentence ends.'
)


def test_clean_page_passes(spark):
    got = _verdicts(spark, [(1, _CLEAN)])
    assert got[1][0] is None
    assert len(got[1][1]) == 5


def test_line_filters(spark):
    text = (
        "no terminal punctuation here\n"  # dropped: no terminal
        "two words.\n"  # dropped: < 3 words
        "uses JavaScript framework today.\n"  # dropped: javascript
        "this line survives fine.\n"  # kept
        "   padded line also survives.   \n"  # kept (rtrim'd terminal)
        "exclamations work too!"  # kept
    )
    got = _verdicts(spark, [(1, text)])
    assert got[1][1] == [
        "this line survives fine.",
        "   padded line also survives.   ",
        "exclamations work too!",
    ]


def test_page_reason_chain_and_precedence(spark):
    rows = [
        (1, "lorem ipsum dolor sit.\n" + _CLEAN),
        (2, "some { code } block.\n" + _CLEAN),
        (3, "contains badword sadly.\n" + _CLEAN),
        (4, "one good line here."),  # < 5 sentences
        # precedence: lorem ipsum AND curly AND blocklist → first rule
        (5, "lorem ipsum { badword }.\n" + _CLEAN),
    ]
    got = _verdicts(spark, rows, blocklist=("badword",))
    assert got[1][0] == C4_REASONS[0]  # LOREM_IPSUM
    assert got[2][0] == C4_REASONS[1]  # CURLY_BRACE
    assert got[3][0] == C4_REASONS[2]  # BLOCKLIST_WORD
    assert got[4][0] == C4_REASONS[3]  # TOO_FEW_SENTENCES
    assert got[5][0] == C4_REASONS[0]  # first match wins


def test_sentence_threshold_counts_kept_lines_only(spark):
    # 5 terminal marks on the page, but 2 live on dropped lines
    # (too few words) → only 3 sentences survive → fail
    text = "ok.\nfine!\n" + "\n".join(
        ["this good line stands.", "another good line here.", "third good line now."]
    )
    got = _verdicts(spark, [(1, text)])
    assert got[1][0] == C4_REASONS[3]
    # raising min_sentences on the clean page also fails it
    got2 = _verdicts(spark, [(1, _CLEAN)], min_sentences=6)
    assert got2[1][0] == C4_REASONS[3]


def test_null_text_fails_closed(spark):
    df = spark.createDataFrame([(1, None)], "doc_id int, text string")
    out = df.select(c4_reason(F.col("text")).alias("r")).collect()
    assert out[0]["r"] == C4_REASONS[3]


def test_javascript_case_insensitive(spark):
    text = "JAVASCRIPT required beyond here.\n" + _CLEAN
    got = _verdicts(spark, [(1, text)])
    assert len(got[1][1]) == 5  # the javascript line was dropped
    assert got[1][0] is None
