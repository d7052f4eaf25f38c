"""Gold facts: fct_trip, fct_trip_leg, fct_validation,
fct_boardings_30m.

Each load is: dedup on the TRUE grain (W1) → event-date derivation →
broadcast as-of SK resolution against the SCD2 dims (J2) / equality
joins against lookup dims (J1) → insert-only MERGE on the grain (J5).

Grain subtleties replicated from the reference (SURVEY §7.4.1):
- fct_trip grain (cut_sk, id_tarjeta, id_viaje): id_viaje is a
  per-card daily counter; cash trips (id_tarjeta NULL) are EXCLUDED
  (load_gold.py:1030-1189).
- fct_trip_leg adds leg_seq; empty leg slots (no ts/stop/mode) are
  excluded (:1242-1243).
- fct_validation grain (id_etapa, tiempo_boarding, cut_sk): id_etapa
  is NOT unique (:1359-1516); operator resolves via
  COALESCE(contrato, operador) (:1485).
- fct_boardings_30m joins the CURRENT stop version (deliberate
  deviation from as-of, :1568-1575) and drops rows whose stop/mode SK
  can't resolve (grain columns, :1556-1560).

Deviation (documented, SURVEY §7.4.5): the reference's dedup tiebreak
``ORDER BY (SELECT NULL)`` is nondeterministic; we use stable column
tiebreaks so reruns and differential tests are exact.

trip_sk is the deterministic hash of the trip grain, so legs compute
their FK without joining back to fct_trip — removes a 14M×3.6M join
per cut at scale (the reference needs it only because of IDENTITY).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

from ..operators.dedup import dedup_max_by
from .store import GoldStore


def _event_dt(date_sk_col: str) -> Column:
    """YYYYMMDD int -> DATE (DATEFROMPARTS parity, null-safe)."""
    return F.to_date(F.col(date_sk_col).cast("string"), "yyyyMMdd")


def _asof_stop(
    fact: DataFrame, dim_stop: DataFrame, code_col: str, out_sk: str
) -> DataFrame:
    d = dim_stop.select(
        F.col("stop_code").alias(f"_bk_{out_sk}"),
        F.col("stop_sk").alias(out_sk),
        F.col("valid_from").alias(f"_vf_{out_sk}"),
        F.col("valid_to").alias(f"_vt_{out_sk}"),
    )
    ev = F.col("event_dt")
    joined = fact.join(
        F.broadcast(d),
        (F.col(code_col) == F.col(f"_bk_{out_sk}"))
        & ev.isNotNull()
        & (F.col(f"_vf_{out_sk}") <= ev)
        & (F.col(f"_vt_{out_sk}").isNull() | (ev <= F.col(f"_vt_{out_sk}"))),
        "left",
    )
    return joined.drop(f"_bk_{out_sk}", f"_vf_{out_sk}", f"_vt_{out_sk}")


def _asof_service(
    fact: DataFrame, dim_service: DataFrame, code_col: str, out_sk: str
) -> DataFrame:
    d = dim_service.select(
        F.col("service_code").alias(f"_bk_{out_sk}"),
        F.col("service_sk").alias(out_sk),
        F.col("valid_from").alias(f"_vf_{out_sk}"),
        F.col("valid_to").alias(f"_vt_{out_sk}"),
    )
    ev = F.col("event_dt")
    joined = fact.join(
        F.broadcast(d),
        (F.col(code_col) == F.col(f"_bk_{out_sk}"))
        & ev.isNotNull()
        & (F.col(f"_vf_{out_sk}") <= ev)
        & (F.col(f"_vt_{out_sk}").isNull() | (ev <= F.col(f"_vt_{out_sk}"))),
        "left",
    )
    return joined.drop(f"_bk_{out_sk}", f"_vf_{out_sk}", f"_vt_{out_sk}")


def _lookup(
    fact: DataFrame,
    dim: DataFrame,
    bk: str,
    fact_col: str,
    sk: str,
    out_sk: str,
) -> DataFrame:
    d = dim.select(F.col(bk).alias(f"_bk_{out_sk}"), F.col(sk).alias(out_sk))
    return fact.join(
        F.broadcast(d), F.col(fact_col) == F.col(f"_bk_{out_sk}"), "left"
    ).drop(f"_bk_{out_sk}")


def trip_sk_expr(cut_sk: Column, id_tarjeta: Column, id_viaje: Column) -> Column:
    return F.xxhash64(F.lit("trip"), cut_sk, id_tarjeta, id_viaje)


def merge_fct_trip(
    store: GoldStore, trips: DataFrame, cut_sk: int
) -> tuple[int, int]:
    """viajes_trip silver → fct_trip. Returns (inserted, cash_excluded).

    The cash-exclusion count rides the merge's own job as an
    ``observe`` metric — no separate counting scan per cut."""
    obs = Observation()
    trips = trips.observe(
        obs,
        F.coalesce(
            F.sum(F.col("id_tarjeta").isNull().cast("long")), F.lit(0)
        ).alias("cash"),
    )
    src = dedup_max_by(
        trips.filter(F.col("id_tarjeta").isNotNull()),
        grain=["id_tarjeta", "id_viaje"],
        order_col="tiempo_inicio_viaje",
    ).withColumn("event_dt", _event_dt("date_start_sk"))

    dim_stop = store.read("dim_stop")
    src = _asof_stop(src, dim_stop, "paradero_inicio_viaje", "origin_stop_sk")
    src = _asof_stop(src, dim_stop, "paradero_fin_viaje", "dest_stop_sk")
    src = _lookup(
        src, store.read("dim_fare_period"), "fare_period_name",
        "periodo_inicio_viaje", "fare_period_sk", "fare_period_start_sk",
    )  # fmt: skip
    src = _lookup(
        src, store.read("dim_fare_period"), "fare_period_name",
        "periodo_fin_viaje", "fare_period_sk", "fare_period_end_sk",
    )  # fmt: skip
    src = _lookup(
        src, store.read("dim_operator_contract"), "contract_code",
        "contrato", "operator_contract_sk", "operator_sk",
    )  # fmt: skip
    src = _lookup(
        src, store.read("dim_purpose"), "purpose_name",
        "proposito", "purpose_sk", "purpose_sk",
    )  # fmt: skip

    cut = F.lit(cut_sk).cast("long")
    out = src.select(
        trip_sk_expr(cut, F.col("id_tarjeta"), F.col("id_viaje")).alias("trip_sk"),
        "date_start_sk",
        "time_start_30m_sk",
        "date_end_sk",
        "time_end_30m_sk",
        "origin_stop_sk",
        "dest_stop_sk",
        "fare_period_start_sk",
        "fare_period_end_sk",
        "operator_sk",
        "purpose_sk",
        cut.alias("cut_sk"),
        "id_viaje",
        "id_tarjeta",
        "tipo_dia",
        F.col("zona_inicio_viaje").cast("string").alias("zone_origin_txt"),
        F.col("zona_fin_viaje").cast("string").alias("zone_dest_txt"),
        "n_etapas",
        "tviaje_min",
        F.col("distancia_eucl").alias("distancia_eucl_m"),
        F.col("distancia_ruta").alias("distancia_ruta_m"),
        "factor_expansion",
    )
    n = store.merge_insert(
        out, "fct_trip", ["cut_sk", "id_tarjeta", "id_viaje"],
        partition_cols=["cut_sk"], prune={"cut_sk": [cut_sk]},
    )
    return n, int(obs.get["cash"])


def merge_fct_trip_leg(
    store: GoldStore, legs: DataFrame, cut_sk: int
) -> tuple[int, int]:
    """viajes_leg silver → fct_trip_leg. Returns (inserted,
    cash_excluded); the cash count is an ``observe`` metric on the
    merge job (no extra scan)."""
    obs = Observation()
    legs = legs.observe(
        obs,
        F.coalesce(
            F.sum(F.col("id_tarjeta").isNull().cast("long")), F.lit(0)
        ).alias("cash"),
    )
    nonempty = (
        F.col("ts_board").isNotNull()
        | F.col("board_stop_code").isNotNull()
        | F.col("mode_code").isNotNull()
    )
    src = dedup_max_by(
        legs.filter(F.col("id_tarjeta").isNotNull() & nonempty),
        grain=["id_tarjeta", "id_viaje", "leg_seq"],
        order_col="ts_board",
    ).withColumn("event_dt", _event_dt("date_board_sk"))

    src = _asof_stop(src, store.read("dim_stop"), "board_stop_code", "board_stop_sk")
    src = _asof_stop(src, store.read("dim_stop"), "alight_stop_code", "alight_stop_sk")
    src = _lookup(src, store.read("dim_mode"), "mode_code", "mode_code",
                  "mode_sk", "mode_sk")  # fmt: skip
    src = _asof_service(src, store.read("dim_service"), "service_code", "service_sk")
    src = _lookup(
        src, store.read("dim_operator_contract"), "contract_code",
        "operator_code", "operator_contract_sk", "operator_sk",
    )  # fmt: skip
    src = _lookup(
        src, store.read("dim_fare_period"), "fare_period_name",
        "fare_period_alight_code", "fare_period_sk", "fare_period_alight_sk",
    )  # fmt: skip

    cut = F.lit(cut_sk).cast("long")
    out = src.select(
        trip_sk_expr(cut, F.col("id_tarjeta"), F.col("id_viaje")).alias("trip_sk"),
        "id_viaje",
        "leg_seq",
        cut.alias("cut_sk"),
        "date_board_sk",
        "time_board_30m_sk",
        "date_alight_sk",
        "time_alight_30m_sk",
        "board_stop_sk",
        "alight_stop_sk",
        "mode_sk",
        "service_sk",
        "operator_sk",
        "fare_period_alight_sk",
        "id_tarjeta",
        F.col("zone_board").cast("string").alias("zone_board_txt"),
        F.col("zone_alight").cast("string").alias("zone_alight_txt"),
        "ts_board",
        "ts_alight",
        "tv_leg_min",
        "tc_transfer_min",
        "te_wait_min",
    )
    n = store.merge_insert(
        out, "fct_trip_leg", ["cut_sk", "id_tarjeta", "id_viaje", "leg_seq"],
        partition_cols=["cut_sk"], prune={"cut_sk": [cut_sk]},
    )
    return n, int(obs.get["cash"])


def merge_fct_validation(store: GoldStore, ev: DataFrame, cut_sk: int) -> int:
    """etapas_validation silver → fct_validation."""
    src = dedup_max_by(
        ev,
        grain=["id_etapa", "tiempo_subida"],
        # reference: ORDER BY (SELECT NULL); stable-ish pick here
        order_col="parada_subida",
        descending=False,
    ).withColumn("event_dt", _event_dt("date_board_sk"))

    dim_stop = store.read("dim_stop")
    dim_service = store.read("dim_service")
    src = _asof_stop(src, dim_stop, "parada_subida", "board_stop_sk")
    src = _asof_stop(src, dim_stop, "parada_bajada", "alight_stop_sk")
    src = _lookup(src, store.read("dim_mode"), "mode_code", "tipo_transporte",
                  "mode_sk", "mode_sk")  # fmt: skip
    src = _asof_service(src, dim_service, "servicio_subida", "service_board_sk")
    src = _asof_service(src, dim_service, "servicio_bajada", "service_alight_sk")
    src = src.withColumn("_op_bk", F.coalesce(F.col("contrato"), F.col("operador")))
    src = _lookup(
        src, store.read("dim_operator_contract"), "contract_code",
        "_op_bk", "operator_contract_sk", "operator_sk",
    )  # fmt: skip
    src = _lookup(
        src, store.read("dim_fare_period"), "fare_period_name",
        "periodoSubida", "fare_period_sk", "fare_period_board_sk",
    )  # fmt: skip
    src = _lookup(
        src, store.read("dim_fare_period"), "fare_period_name",
        "periodoBajada", "fare_period_sk", "fare_period_alight_sk",
    )  # fmt: skip

    out = src.select(
        "id_etapa",
        F.col("tiempo_subida").alias("tiempo_boarding"),
        F.lit(cut_sk).cast("long").alias("cut_sk"),
        "date_board_sk",
        "time_board_30m_sk",
        "date_alight_sk",
        "time_alight_30m_sk",
        "board_stop_sk",
        "alight_stop_sk",
        "mode_sk",
        "service_board_sk",
        "service_alight_sk",
        "operator_sk",
        "fare_period_board_sk",
        "fare_period_alight_sk",
        "tipo_dia",
        "tiene_bajada",
        "tiempo_bajada",
        F.col("tiempo_etapa").alias("tiempo_etapa_sec"),
        F.col("tEsperaMediaIntervalo").alias("t_espera_media_min"),
        F.col("dist_ruta_paraderos").alias("dist_ruta_m"),
        F.col("dist_eucl_paraderos").alias("dist_eucl_m"),
        "x_subida",
        "y_subida",
        "x_bajada",
        "y_bajada",
        F.col("fExpansionServicioPeriodoTS").alias("fexp_servicio"),
    )
    return store.merge_insert(
        out, "fct_validation", ["id_etapa", "tiempo_boarding", "cut_sk"],
        partition_cols=["cut_sk"], prune={"cut_sk": [cut_sk]},
    )


def merge_fct_boardings_30m(
    store: GoldStore, sv: DataFrame, cut_sk: int, year: int, month: int
) -> int:
    """subidas_30m silver → fct_boardings_30m (is_current stop join —
    deliberate deviation from as-of, load_gold.py:1568-1575)."""
    month_date_sk = year * 10000 + month * 100 + 1
    src = dedup_max_by(
        sv,
        grain=["stop_code", "time_30m_sk", "mode_code", "tipo_dia"],
        order_col="subidas_promedio",
    )
    stops = store.read("dim_stop").filter(F.col("is_current"))
    src = _lookup(src, stops, "stop_code", "stop_code", "stop_sk", "stop_sk")
    src = _lookup(src, store.read("dim_mode"), "mode_code", "mode_code",
                  "mode_sk", "mode_sk")  # fmt: skip
    out = (
        src.filter(F.col("stop_sk").isNotNull() & F.col("mode_sk").isNotNull())
        .select(
            F.lit(month_date_sk).cast("int").alias("month_date_sk"),
            "time_30m_sk",
            "stop_sk",
            "mode_sk",
            F.lit(cut_sk).cast("long").alias("cut_sk"),
            "tipo_dia",
            F.col("comuna").alias("comuna_txt"),
            "subidas_promedio",
        )
    )
    return store.merge_insert(
        out,
        "fct_boardings_30m",
        ["month_date_sk", "time_30m_sk", "stop_sk", "mode_sk", "tipo_dia", "cut_sk"],
        partition_cols=["cut_sk"], prune={"cut_sk": [cut_sk]},
    )
