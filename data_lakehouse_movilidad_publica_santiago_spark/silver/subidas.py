"""Silver transform: subidas_30m (avg boardings per stop/slot/mode/
day-type; cut = month).

Parity target: reference src/silver/transforms.py:876-1019.
Dataset-specific rules: Excel day-fraction → TIME + slot (:906-931);
rows with NULL Media_hora are pre-filtered BEFORE quality tagging
(:930); the NULL/negative subidas_promedio reason code is deliberately
the reused 'NEG_DISTANCE' (:941-942 — replicate, don't fix).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.datetime_fns import excel_fraction_to_slot, excel_fraction_to_time
from ..operators.quality import QualityRule, split_by_quality, tag_quality
from .common import try_double, upper_trim


def enrich_subidas(raw: DataFrame, cut: str, year: int, month: int) -> DataFrame:
    """Typed enrichment projection (transforms.py:909-931), including
    the Media_hora IS NOT NULL pre-filter."""
    frac = try_double("Media_hora")
    return raw.filter(frac.isNotNull()).select(
        F.lit(cut).alias("cut"),
        F.lit(year).cast("int").alias("year"),
        F.lit(month).cast("int").alias("month"),
        upper_trim("Tipo_dia").alias("tipo_dia"),
        upper_trim("Modo").alias("mode_code"),
        F.trim(F.col("Paradero")).alias("stop_code"),
        upper_trim("Comuna").alias("comuna"),
        excel_fraction_to_time(frac).alias("media_hora_time"),
        excel_fraction_to_slot(frac).alias("time_30m_sk"),
        try_double("Subidas_Promedio").alias("subidas_promedio"),
    )


def subidas_quality_rules() -> list[QualityRule]:
    """Ordered quarantine rules (transforms.py:933-946)."""
    return [
        QualityRule(
            "MISSING_ID",
            F.col("stop_code").isNull() | (F.trim(F.col("stop_code")) == ""),
        ),
        QualityRule(
            "BAD_TIME_SLOT",
            F.col("time_30m_sk").isNull()
            | (F.col("time_30m_sk") < 0)
            | (F.col("time_30m_sk") > 47),
        ),
        QualityRule(
            "NEG_DISTANCE",
            F.col("subidas_promedio").isNull() | (F.col("subidas_promedio") < 0),
        ),
    ]


def subidas_contract_constraints() -> list[tuple[str, Column]]:
    return [
        ("stop_code_nonempty", F.trim(F.col("stop_code")) != ""),
        ("slot_range", F.col("time_30m_sk").between(0, 47)),
        ("subidas_ge0", F.col("subidas_promedio") >= 0),
        (
            "tipo_dia_domain",
            F.col("tipo_dia").isin("LABORAL", "SABADO", "DOMINGO"),
        ),
    ]


def transform_subidas_df(
    raw: DataFrame, cut: str, year: int, month: int
) -> dict[str, Any]:
    """Pure-DataFrame core (no IO)."""
    enriched = enrich_subidas(raw, cut, year, month)
    tagged = tag_quality(enriched, subidas_quality_rules())
    valid, invalid = split_by_quality(tagged)
    return {"tagged": tagged, "valid": valid, "invalid": invalid}
