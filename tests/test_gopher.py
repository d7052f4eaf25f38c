"""Unit tests for the Gopher quality-rule chain: each rule triggers
on a crafted document, and precedence is first-match-wins."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_movilidad_publica_santiago_spark.functions.gopher import (
    gopher_reason,
)

# 60 words, every 2-gram unique, 15 stopword hits, mean word len ~5
GOOD = " ".join(f"the item{i} holds value{i}" for i in range(15))


def _reason(spark, text, **kw):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(gopher_reason(F.col("text"), **kw).alias("r")).collect()[0]["r"]


class TestGopherRules:
    def test_good_doc_passes(self, spark):
        assert _reason(spark, GOOD) is None

    def test_too_few_words(self, spark):
        assert _reason(spark, "the of and it is") == "TOO_FEW_WORDS"

    def test_too_many_words(self, spark):
        assert (
            _reason(spark, GOOD, max_words=50) == "TOO_MANY_WORDS"
        )

    def test_bad_mean_word_length_short(self, spark):
        text = " ".join(["a"] * 60) + " the of"
        assert _reason(spark, text) == "BAD_MEAN_WORD_LENGTH"

    def test_bad_mean_word_length_long(self, spark):
        text = " ".join(["superlongword"] * 60) + " the of"
        assert _reason(spark, text) == "BAD_MEAN_WORD_LENGTH"

    def test_high_symbol_ratio(self, spark):
        # "#####" tokens: 5 symbol matches each, token length 5 keeps
        # the mean-word-length rule satisfied
        text = GOOD + " " + " ".join(["#####"] * 10)
        assert _reason(spark, text) == "HIGH_SYMBOL_RATIO"

    def test_ellipsis_counts_as_symbol(self, spark):
        text = GOOD + " " + " ".join(["......"] * 10)
        assert _reason(spark, text) == "HIGH_SYMBOL_RATIO"

    def test_low_alpha_fraction(self, spark):
        text = "the of and it is " + " ".join(["1234"] * 60)
        assert _reason(spark, text) == "LOW_ALPHA_FRACTION"

    def test_too_few_stopwords(self, spark):
        text = " ".join(f"word{i}" for i in range(60))
        assert _reason(spark, text) == "TOO_FEW_STOPWORDS"

    def test_high_dup_2gram(self, spark):
        # 60 words of pure repetition, with stopwords so earlier
        # rules pass: "the dog ate it the dog ate it ..."
        text = " ".join(["the dogs ate bones"] * 15)
        assert _reason(spark, text) == "HIGH_DUP_2GRAM"

    def test_precedence_word_count_before_symbols(self, spark):
        # fails BOTH word count and symbol ratio -> first rule wins
        assert _reason(spark, "# # # the of") == "TOO_FEW_WORDS"

    def test_thresholds_overridable(self, spark):
        text = " ".join(f"word{i}" for i in range(60))
        assert _reason(spark, text, min_stopword_hits=0) is None

    def test_null_text_fails_closed(self, spark):
        df = spark.createDataFrame([(None,)], "text string")
        r = df.select(gopher_reason(F.col("text")).alias("r")).collect()[0]["r"]
        assert r == "TOO_FEW_WORDS"

    def test_empty_text_fails_closed(self, spark):
        assert _reason(spark, "") == "TOO_FEW_WORDS"
