"""Silver transform: etapas (one row = one card validation / stage).

Parity target: reference src/silver/transforms.py:641-869.
Dataset-specific rules: tipo_dia / tipo_transporte may arrive as int
code OR already-mapped text (:673-687); tiene_bajada strict 0/1→bool
else NULL (:706-710 — NULL then quarantined as BAD_BOOLEAN); UTM
bounding-box rules (:777-788).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.codes import mode_code_expr, tipo_dia_expr
from ..functions.datetime_fns import date_sk, time_30m_sk
from ..operators.quality import QualityRule, split_by_quality, tag_quality
from .common import try_double, try_int, try_ts, upper_trim


def enrich_etapas(raw: DataFrame, cut: str, year: int, month: int) -> DataFrame:
    """Typed enrichment projection (transforms.py:689-761)."""
    tiene_bajada = (
        F.when(try_int("tiene_bajada") == 1, F.lit(True))
        .when(try_int("tiene_bajada") == 0, F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )
    return raw.select(
        F.lit(cut).alias("cut"),
        F.lit(year).cast("int").alias("year"),
        F.lit(month).cast("int").alias("month"),
        F.col("id_etapa"),
        F.trim(F.col("operador")).alias("operador"),
        F.trim(F.col("contrato")).alias("contrato"),
        tipo_dia_expr(F.col("tipo_dia"), accept_text=True).alias("tipo_dia"),
        mode_code_expr(F.col("tipo_transporte"), accept_text=True).alias(
            "tipo_transporte"
        ),
        try_double("fExpansionServicioPeriodoTS").alias(
            "fExpansionServicioPeriodoTS"
        ),
        tiene_bajada.alias("tiene_bajada"),
        try_ts("tiempo_subida").alias("tiempo_subida"),
        try_ts("tiempo_bajada").alias("tiempo_bajada"),
        try_int("tiempo_etapa").alias("tiempo_etapa"),
        date_sk(try_ts("tiempo_subida")).alias("date_board_sk"),
        time_30m_sk(try_ts("tiempo_subida")).alias("time_board_30m_sk"),
        date_sk(try_ts("tiempo_bajada")).alias("date_alight_sk"),
        time_30m_sk(try_ts("tiempo_bajada")).alias("time_alight_30m_sk"),
        try_int("x_subida").alias("x_subida"),
        try_int("y_subida").alias("y_subida"),
        try_int("x_bajada").alias("x_bajada"),
        try_int("y_bajada").alias("y_bajada"),
        try_int("dist_ruta_paraderos").alias("dist_ruta_paraderos"),
        try_int("dist_eucl_paraderos").alias("dist_eucl_paraderos"),
        upper_trim("servicio_subida").alias("servicio_subida"),
        upper_trim("servicio_bajada").alias("servicio_bajada"),
        upper_trim("parada_subida").alias("parada_subida"),
        upper_trim("parada_bajada").alias("parada_bajada"),
        upper_trim("comuna_subida").alias("comuna_subida"),
        upper_trim("comuna_bajada").alias("comuna_bajada"),
        try_int("zona_subida").alias("zona_subida"),
        try_int("zona_bajada").alias("zona_bajada"),
        try_double("tEsperaMediaIntervalo").alias("tEsperaMediaIntervalo"),
        upper_trim("periodoSubida").alias("periodoSubida"),
        upper_trim("periodoBajada").alias("periodoBajada"),
    )


def _utm_x_bad(col: str) -> Column:
    return F.col(col).isNotNull() & (
        (F.col(col) < 250_000) | (F.col(col) > 450_000)
    )


def _utm_y_bad(col: str) -> Column:
    return F.col(col).isNotNull() & (
        (F.col(col) < 6_200_000) | (F.col(col) > 6_400_000)
    )


def etapas_quality_rules() -> list[QualityRule]:
    """Ordered quarantine rules (transforms.py:764-796)."""
    return [
        QualityRule(
            "MISSING_ID",
            F.col("id_etapa").isNull() | (F.trim(F.col("id_etapa")) == ""),
        ),
        QualityRule("MISSING_TIMESTAMP", F.col("tiempo_subida").isNull()),
        QualityRule("BAD_BOOLEAN", F.col("tiene_bajada").isNull()),
        QualityRule(
            "BAD_TIME_SLOT",
            F.col("time_board_30m_sk").isNotNull()
            & ((F.col("time_board_30m_sk") < 0) | (F.col("time_board_30m_sk") > 47)),
        ),
        QualityRule("BAD_UTM_X", _utm_x_bad("x_subida")),
        QualityRule("BAD_UTM_Y", _utm_y_bad("y_subida")),
        QualityRule("BAD_UTM_X", _utm_x_bad("x_bajada")),
        QualityRule("BAD_UTM_Y", _utm_y_bad("y_bajada")),
        QualityRule(
            "NEG_DISTANCE",
            F.col("dist_ruta_paraderos").isNotNull()
            & (F.col("dist_ruta_paraderos") < 0),
        ),
        QualityRule(
            "NEG_DISTANCE",
            F.col("dist_eucl_paraderos").isNotNull()
            & (F.col("dist_eucl_paraderos") < 0),
        ),
    ]


def etapas_contract_constraints() -> list[tuple[str, Column]]:
    """EtapasValidationRow contract as columnar predicates."""
    return [
        ("id_etapa_nonempty", F.trim(F.col("id_etapa")) != ""),
        ("tiempo_subida_required", F.col("tiempo_subida").isNotNull()),
        ("tiene_bajada_required", F.col("tiene_bajada").isNotNull()),
        (
            "fexp_ge0",
            F.col("fExpansionServicioPeriodoTS").isNull()
            | (F.col("fExpansionServicioPeriodoTS") >= 0),
        ),
        (
            "tiempo_etapa_ge0",
            F.col("tiempo_etapa").isNull() | (F.col("tiempo_etapa") >= 0),
        ),
        (
            "board_slot_range",
            F.col("time_board_30m_sk").isNull()
            | F.col("time_board_30m_sk").between(0, 47),
        ),
        ("x_subida_box", ~_utm_x_bad("x_subida")),
        ("y_subida_box", ~_utm_y_bad("y_subida")),
    ]


def transform_etapas_df(
    raw: DataFrame, cut: str, year: int, month: int
) -> dict[str, Any]:
    """Pure-DataFrame core (no IO)."""
    enriched = enrich_etapas(raw, cut, year, month)
    tagged = tag_quality(enriched, etapas_quality_rules())
    valid, invalid = split_by_quality(tagged)
    return {"tagged": tagged, "valid": valid, "invalid": invalid}
