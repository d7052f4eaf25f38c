"""Ordered quality tagging + valid/invalid (quarantine) split.

Parity: the reference tags every row with the FIRST matching reason
code of an ordered CASE chain and splits into valid/invalid parquet,
never dropping rows silently (src/silver/transforms.py:457-490,
564-576,764-796,933-946). Precedence is semantics, not style — a row
violating two rules reports only the first reason (SURVEY §7.4.2).

Spark-first: one ordered ``when`` chain evaluated once; the two
outputs are filters over the same tagged plan, so a cached DF feeds
both sinks with a single pass over the data.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REASON_COL = "_reason_code"


@dataclass(frozen=True)
class QualityRule:
    """One quarantine predicate: ``condition`` True => row is INVALID
    with ``reason`` (first match wins)."""

    reason: str
    condition: Column


def tag_quality(df: DataFrame, rules: list[QualityRule]) -> DataFrame:
    """Add ``_reason_code`` via an ordered when-chain (NULL = valid)."""
    if not rules:
        return df.withColumn(REASON_COL, F.lit(None).cast("string"))
    expr = F.when(rules[0].condition, F.lit(rules[0].reason))
    for rule in rules[1:]:
        expr = expr.when(rule.condition, F.lit(rule.reason))
    return df.withColumn(REASON_COL, expr.otherwise(F.lit(None).cast("string")))


def split_by_quality(tagged: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid, invalid) from a tagged DF.

    valid drops the reason column (``SELECT * EXCLUDE (_reason_code)``
    parity, transforms.py:481-490); invalid keeps it as the quarantine
    ``reason_code``.
    """
    valid = tagged.filter(F.col(REASON_COL).isNull()).drop(REASON_COL)
    invalid = tagged.filter(F.col(REASON_COL).isNotNull()).withColumnRenamed(
        REASON_COL, "reason_code"
    )
    return valid, invalid


def reason_distribution(invalid: DataFrame) -> DataFrame:
    """GROUP BY reason_code counts for the quality report
    (transforms.py:598-604)."""
    return invalid.groupBy("reason_code").agg(F.count("*").alias("n")).orderBy(
        F.desc("n"), "reason_code"
    )
