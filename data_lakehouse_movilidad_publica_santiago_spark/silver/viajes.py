"""Silver transform: viajes (one row = one complete trip, ≤4 legs wide).

Parity target: reference src/silver/transforms.py:286-634.
Pipeline (one DataFrame plan, cached once, feeding four sinks):
  raw all-VARCHAR scan → typed enrichment (P1, :325-454)
  → ordered quality tagging (P5, :457-479) → valid/invalid split (P6)
  → trip projection 101→27 cols (P2, :493-513) → viajes_trip.parquet
  → leg unpivot legs 1..4 (U1, :516-561)       → viajes_leg.parquet
  → quarantine invalid/valid (:564-576), quality.json (:606-629).

The leg "keep if any of mode/service/stop/ts present" filter
(:550-555) is replicated verbatim but is vacuous in practice: the mode
CASE has ELSE 'UNKNOWN', so mode_code_i is never NULL and every valid
trip emits exactly 4 legs (baseline confirms: 14,423,564 legs =
4 × 3,605,891 trips).

Scale: the unpivot is an in-partition ``inline(arrays_zip…)``-style
explode — no shuffle, no rescan; trip + leg + quarantine all derive
from one cached scan.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.codes import map_code, MODE_MAP, TIPO_DIA_MAP
from ..functions.datetime_fns import date_sk, time_30m_sk
from ..operators.quality import QualityRule, split_by_quality, tag_quality
from .common import try_double, try_int, try_ts, upper_trim


def enrich_viajes(raw: DataFrame, cut: str, year: int, month: int) -> DataFrame:
    """Typed enrichment projection (transforms.py:325-454): 101 raw
    VARCHAR cols → ~80 typed/normalized cols + literal partition cols."""
    tipodia = map_code(try_int("tipodia"), TIPO_DIA_MAP)

    cols: list[Column] = [
        F.lit(cut).alias("cut"),
        F.lit(year).cast("int").alias("year"),
        F.lit(month).cast("int").alias("month"),
        F.col("id_viaje"),
        F.col("id_tarjeta"),
        tipodia.alias("tipo_dia"),
        upper_trim("proposito").alias("proposito"),
        F.trim(F.col("contrato")).alias("contrato"),
        try_double("factor_expansion").alias("factor_expansion"),
        try_int("n_etapas").alias("n_etapas"),
        try_double("distancia_eucl").alias("distancia_eucl"),
        try_double("distancia_ruta").alias("distancia_ruta"),
        try_ts("tiempo_inicio_viaje").alias("tiempo_inicio_viaje"),
        try_ts("tiempo_fin_viaje").alias("tiempo_fin_viaje"),
        date_sk(try_ts("tiempo_inicio_viaje")).alias("date_start_sk"),
        time_30m_sk(try_ts("tiempo_inicio_viaje")).alias("time_start_30m_sk"),
        date_sk(try_ts("tiempo_fin_viaje")).alias("date_end_sk"),
        time_30m_sk(try_ts("tiempo_fin_viaje")).alias("time_end_30m_sk"),
        upper_trim("paradero_inicio_viaje").alias("paradero_inicio_viaje"),
        upper_trim("paradero_fin_viaje").alias("paradero_fin_viaje"),
        upper_trim("comuna_inicio_viaje").alias("comuna_inicio_viaje"),
        upper_trim("comuna_fin_viaje").alias("comuna_fin_viaje"),
        try_int("zona_inicio_viaje").alias("zona_inicio_viaje"),
        try_int("zona_fin_viaje").alias("zona_fin_viaje"),
        upper_trim("periodo_inicio_viaje").alias("periodo_inicio_viaje"),
        upper_trim("periodo_fin_viaje").alias("periodo_fin_viaje"),
        # tviaje2 preferred: tviaje may arrive empty (transforms.py:385-386)
        try_double("tviaje2").alias("tviaje_min"),
    ]

    op_cols = ["op_1era_etapa", "op_2da_etapa", "op_3era_etapa", "op_4ta_etapa"]
    for i in range(1, 5):
        cols += [
            map_code(try_int(f"tipo_transporte_{i}"), MODE_MAP).alias(
                f"mode_code_{i}"
            ),
            upper_trim(f"srv_{i}").alias(f"service_code_{i}"),
            F.trim(F.col(op_cols[i - 1])).alias(f"operator_code_{i}"),
            upper_trim(f"paradero_subida_{i}").alias(f"board_stop_{i}"),
            upper_trim(f"paradero_bajada_{i}").alias(f"alight_stop_{i}"),
            try_ts(f"tiempo_subida_{i}").alias(f"ts_board_{i}"),
            try_ts(f"tiempo_bajada_{i}").alias(f"ts_alight_{i}"),
            try_int(f"zona_subida_{i}").alias(f"zone_board_{i}"),
            try_int(f"zona_bajada_{i}").alias(f"zone_alight_{i}"),
            upper_trim(f"periodo_bajada_{i}").alias(f"fare_period_alight_{i}"),
            try_double(f"tv{i}").alias(f"tv_leg_{i}"),
        ]
        if i <= 3:
            cols += [
                try_double(f"tc{i}").alias(f"tc_transfer_{i}"),
                try_double(f"te{i}").alias(f"te_wait_{i}"),
            ]
    return raw.select(*cols)


# Ordered quarantine rules (transforms.py:457-479; SURVEY Appendix B)
def viajes_quality_rules() -> list[QualityRule]:
    return [
        QualityRule(
            "MISSING_ID",
            F.col("id_viaje").isNull() | (F.trim(F.col("id_viaje")) == ""),
        ),
        QualityRule("MISSING_TIMESTAMP", F.col("tiempo_inicio_viaje").isNull()),
        QualityRule(
            "BAD_RANGE_N_ETAPAS",
            F.col("n_etapas").isNotNull()
            & ((F.col("n_etapas") < 1) | (F.col("n_etapas") > 4)),
        ),
        QualityRule(
            "NEG_DISTANCE",
            F.col("tviaje_min").isNotNull() & (F.col("tviaje_min") < 0),
        ),
        QualityRule(
            "NEG_DISTANCE",
            F.col("distancia_eucl").isNotNull() & (F.col("distancia_eucl") < 0),
        ),
        QualityRule(
            "NEG_DISTANCE",
            F.col("distancia_ruta").isNotNull() & (F.col("distancia_ruta") < 0),
        ),
        QualityRule(
            "BAD_TIME_SLOT",
            F.col("time_start_30m_sk").isNotNull()
            & ((F.col("time_start_30m_sk") < 0) | (F.col("time_start_30m_sk") > 47)),
        ),
    ]


TRIP_COLUMNS = [
    "cut", "year", "month",
    "id_viaje", "id_tarjeta",
    "tipo_dia", "proposito", "contrato",
    "factor_expansion", "n_etapas",
    "distancia_eucl", "distancia_ruta",
    "tiempo_inicio_viaje", "tiempo_fin_viaje",
    "date_start_sk", "time_start_30m_sk",
    "date_end_sk", "time_end_30m_sk",
    "paradero_inicio_viaje", "paradero_fin_viaje",
    "comuna_inicio_viaje", "comuna_fin_viaje",
    "zona_inicio_viaje", "zona_fin_viaje",
    "periodo_inicio_viaje", "periodo_fin_viaje",
    "tviaje_min",
]  # fmt: skip


def trips_from_valid(valid: DataFrame) -> DataFrame:
    """Column pruning 101→27 (P2, transforms.py:493-513)."""
    return valid.select(*TRIP_COLUMNS)


def legs_from_valid(valid: DataFrame) -> DataFrame:
    """Leg unpivot (U1, transforms.py:516-561): wide trip → long legs
    1..4 as a single ``inline(array<struct>)`` explode — one pass, no
    UNION-ALL rescan of the source.

    Per-leg semantics: mode 'UNKNOWN'→NULL (:527), date/time SKs from
    the leg's own timestamps, tc/te only for legs 1..3 (:520-521),
    keep-if-any-of-4-fields filter (:550-555, vacuously true)."""
    structs = []
    for i in range(1, 5):
        tc = F.col(f"tc_transfer_{i}") if i <= 3 else F.lit(None).cast("double")
        te = F.col(f"te_wait_{i}") if i <= 3 else F.lit(None).cast("double")
        keep = (
            F.col(f"mode_code_{i}").isNotNull()
            | F.col(f"service_code_{i}").isNotNull()
            | F.col(f"board_stop_{i}").isNotNull()
            | F.col(f"ts_board_{i}").isNotNull()
        )
        leg = F.struct(
            F.lit(i).alias("leg_seq"),
            F.when(F.col(f"mode_code_{i}") == "UNKNOWN", F.lit(None))
            .otherwise(F.col(f"mode_code_{i}"))
            .alias("mode_code"),
            F.col(f"service_code_{i}").alias("service_code"),
            F.col(f"operator_code_{i}").alias("operator_code"),
            F.col(f"board_stop_{i}").alias("board_stop_code"),
            F.col(f"alight_stop_{i}").alias("alight_stop_code"),
            F.col(f"ts_board_{i}").alias("ts_board"),
            F.col(f"ts_alight_{i}").alias("ts_alight"),
            date_sk(F.col(f"ts_board_{i}")).alias("date_board_sk"),
            time_30m_sk(F.col(f"ts_board_{i}")).alias("time_board_30m_sk"),
            date_sk(F.col(f"ts_alight_{i}")).alias("date_alight_sk"),
            time_30m_sk(F.col(f"ts_alight_{i}")).alias("time_alight_30m_sk"),
            F.col(f"fare_period_alight_{i}").alias("fare_period_alight_code"),
            F.col(f"zone_board_{i}").alias("zone_board"),
            F.col(f"zone_alight_{i}").alias("zone_alight"),
            F.col(f"tv_leg_{i}").alias("tv_leg_min"),
            tc.alias("tc_transfer_min"),
            te.alias("te_wait_min"),
        )
        structs.append(F.when(keep, leg))  # NULL struct when not kept

    # explode the fixed 4-array then drop the not-kept (NULL) slots with
    # a plain filter: higher-order array lambdas (F.filter) run
    # interpreted, while array+explode+filter stays in codegen
    exploded = valid.select(
        "cut", "year", "month", "id_viaje", "id_tarjeta",
        F.explode(F.array(*structs)).alias("leg"),
    ).filter(F.col("leg").isNotNull())  # fmt: skip
    return exploded.select("cut", "year", "month", "id_viaje", "id_tarjeta", "leg.*")


def viajes_contract_constraints() -> list[tuple[str, Column]]:
    """Columnar re-expression of the ViajesTripRow Pydantic contract
    (src/silver/contracts.py:47-120) for the 10k-sample check."""
    return [
        ("id_viaje_nonempty", F.trim(F.col("id_viaje")) != ""),
        ("tipo_dia_domain", F.col("tipo_dia").isin("LABORAL", "SABADO", "DOMINGO")),
        ("month_range", F.col("month").between(1, 12)),
        (
            "factor_expansion_ge0",
            F.col("factor_expansion").isNull() | (F.col("factor_expansion") >= 0),
        ),
        (
            "n_etapas_range",
            F.col("n_etapas").isNull() | F.col("n_etapas").between(1, 4),
        ),
        (
            "distancia_eucl_ge0",
            F.col("distancia_eucl").isNull() | (F.col("distancia_eucl") >= 0),
        ),
        (
            "distancia_ruta_ge0",
            F.col("distancia_ruta").isNull() | (F.col("distancia_ruta") >= 0),
        ),
        ("tiempo_inicio_required", F.col("tiempo_inicio_viaje").isNotNull()),
        (
            "time_start_slot_range",
            F.col("time_start_30m_sk").isNull()
            | F.col("time_start_30m_sk").between(0, 47),
        ),
        (
            "tviaje_min_ge0",
            F.col("tviaje_min").isNull() | (F.col("tviaje_min") >= 0),
        ),
    ]


def transform_viajes_df(
    raw: DataFrame, cut: str, year: int, month: int
) -> dict[str, Any]:
    """Pure-DataFrame core (no IO): returns the tagged/valid/invalid/
    trip/leg plans so batch, streaming, and tests share one code path."""
    enriched = enrich_viajes(raw, cut, year, month)
    tagged = tag_quality(enriched, viajes_quality_rules())
    valid, invalid = split_by_quality(tagged)
    return {
        "tagged": tagged,
        "valid": valid,
        "invalid": invalid,
        "trips": trips_from_valid(valid),
        "legs": legs_from_valid(valid),
        "invalid_trips": invalid.select(*TRIP_COLUMNS, "reason_code"),
    }
