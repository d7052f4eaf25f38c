"""Synthetic DTPM-shaped fixture lake for silver/gold tests.

Built from the FIXTURES.md spec (raw column lists + valid/negative
logical rows) — no data copied from the reference. '-' = NULL,
'|' separator, header row.
"""

from __future__ import annotations

from pathlib import Path

from data_lakehouse_movilidad_publica_santiago_spark.schemas import (
    ETAPAS_RAW_COLUMNS,
    SUBIDAS_RAW_COLUMNS,
    VIAJES_RAW_COLUMNS,
)
from data_lakehouse_movilidad_publica_santiago_spark.sources.catalog import (
    write_meta,
)

CUT_VIAJES = "2025-04-21"
CUT_ETAPAS = "2025-04-21_2025-04-27"
CUT_SUBIDAS = "2025-04"


def _row(columns: list[str], values: dict[str, str]) -> str:
    return "|".join(values.get(c, "-") for c in columns)


def _viajes_valid(
    id_viaje: str,
    id_tarjeta: str = "CARD01",
    n_etapas: str = "2",
    start="2025-04-21 08:48:04",
    **over: str,
) -> dict[str, str]:
    v = {
        "id_viaje": id_viaje,
        "id_tarjeta": id_tarjeta,
        "tipodia": "0",
        "proposito": "trabajo",
        "contrato": "U1",
        "factor_expansion": "1.4210",
        "n_etapas": n_etapas,
        "distancia_eucl": "1753.17",
        "distancia_ruta": "1943.0",
        "tiempo_inicio_viaje": start,
        "tiempo_fin_viaje": "2025-04-21 09:10:58",
        "paradero_inicio_viaje": "T-4-19-SN-40",
        "paradero_fin_viaje": "L-4-4-50-OP",
        "comuna_inicio_viaje": "recoleta",
        "comuna_fin_viaje": "santiago",
        "zona_inicio_viaje": "49",
        "zona_fin_viaje": "44",
        "periodo_inicio_viaje": "04 - punta manana",
        "periodo_fin_viaje": "05 - transicion punta manana",
        "tviaje2": "22.9",
        # leg 1
        "tipo_transporte_1": "1",
        "srv_1": "T203 00R",
        "op_1era_etapa": "OP7",
        "paradero_subida_1": "T-4-19-SN-40",
        "paradero_bajada_1": "E-4-19-SN-55",
        "tiempo_subida_1": start,
        "tiempo_bajada_1": "2025-04-21 08:54:58",
        "zona_subida_1": "49",
        "zona_bajada_1": "728",
        "periodo_bajada_1": "05 - transicion punta manana",
        "tv1": "6.9",
        "tc1": "1.2",
        "te1": "2.5",
    }
    if int(n_etapas) >= 2:
        v.update(
            {
                "tipo_transporte_2": "2",
                "srv_2": "L1",
                "op_2da_etapa": "METRO",
                "paradero_subida_2": "PUENTE CAL Y CANTO",
                "paradero_bajada_2": "U DE CHILE",
                "tiempo_subida_2": "2025-04-21 08:58:00",
                "tiempo_bajada_2": "2025-04-21 09:08:00",
                "zona_subida_2": "728",
                "zona_bajada_2": "44",
                "periodo_bajada_2": "05 - transicion punta manana",
                "tv2": "10.0",
                "tc2": "0.8",
                "te2": "3.1",
            }
        )
    v.update(over)
    return v


def viajes_rows() -> list[dict[str, str]]:
    rows = [
        _viajes_valid("1"),
        _viajes_valid("2", id_tarjeta="CARD02", n_etapas="1"),
        _viajes_valid("1", id_tarjeta="CARD02", start="2025-04-21 18:05:00"),
        # cash trip: id_tarjeta NULL is VALID silver (excluded later in gold)
        _viajes_valid("3", id_tarjeta="-"),
        # negatives, one per reason code
        _viajes_valid("", id_tarjeta="CARD03"),  # MISSING_ID
        _viajes_valid("4", start="-"),  # MISSING_TIMESTAMP
        _viajes_valid("5", n_etapas="5"),  # BAD_RANGE_N_ETAPAS
        _viajes_valid("6", tviaje2="-3.5"),  # NEG_DISTANCE (tviaje)
        _viajes_valid("7", distancia_eucl="-1"),  # NEG_DISTANCE (eucl)
        _viajes_valid("8", distancia_ruta="-2"),  # NEG_DISTANCE (ruta)
        # double violation → FIRST code wins (BAD_RANGE_N_ETAPAS)
        _viajes_valid("9", n_etapas="0", distancia_eucl="-9"),
    ]
    return rows


def _etapas_valid(id_etapa: str, **over: str) -> dict[str, str]:
    v = {
        "operador": "OP7",
        "id_etapa": id_etapa,
        "correlativo_viajes": "1",
        "correlativo_etapas": "1",
        "tipo_dia": "LABORAL",
        "tipo_transporte": "BUS",
        "fExpansionServicioPeriodoTS": "1.5031",
        "tiene_bajada": "1",
        "tiempo_subida": "2025-04-21 08:48:04",
        "tiempo_bajada": "2025-04-21 08:50:39",
        "tiempo_etapa": "155",
        "x_subida": "347180",
        "y_subida": "6301636",
        "x_bajada": "347201",
        "y_bajada": "6302489",
        "dist_ruta_paraderos": "853",
        "dist_eucl_paraderos": "825",
        "servicio_subida": "T203 00R",
        "servicio_bajada": "T203 00R",
        "parada_subida": "T-4-19-SN-40",
        "parada_bajada": "E-4-19-SN-55",
        "comuna_subida": "RECOLETA",
        "comuna_bajada": "RECOLETA",
        "zona_subida": "49",
        "zona_bajada": "728",
        "tEsperaMediaIntervalo": "1.4439",
        "periodoSubida": "05 - transicion punta manana",
        "periodoBajada": "05 - transicion punta manana",
        "contrato": "U1",
    }
    v.update(over)
    return v


def etapas_rows() -> list[dict[str, str]]:
    return [
        _etapas_valid("E001"),
        # int-coded tipo_dia / tipo_transporte variant
        _etapas_valid("E002", tipo_dia="0", tipo_transporte="2"),
        # duplicate id_etapa with distinct tiempo_subida (true grain)
        _etapas_valid("E001", tiempo_subida="2025-04-21 09:15:00"),
        _etapas_valid("", ),  # MISSING_ID
        _etapas_valid("E003", tiempo_subida="-"),  # MISSING_TIMESTAMP
        _etapas_valid("E004", tiene_bajada="2"),  # BAD_BOOLEAN
        _etapas_valid("E005", x_subida="100000"),  # BAD_UTM_X
        _etapas_valid("E006", y_subida="7000000"),  # BAD_UTM_Y
        _etapas_valid("E007", x_bajada="90000"),  # BAD_UTM_X (alight)
        _etapas_valid("E008", dist_ruta_paraderos="-5"),  # NEG_DISTANCE
        # precedence: BAD_BOOLEAN beats BAD_UTM_X
        _etapas_valid("E009", tiene_bajada="x", x_subida="100"),
    ]


def subidas_rows() -> list[dict[str, str]]:
    def r(tipo, modo, stop, comuna, frac, prom):
        return {
            "Tipo_dia": tipo,
            "Modo": modo,
            "Paradero": stop,
            "Comuna": comuna,
            "Media_hora": frac,
            "Subidas_Promedio": prom,
        }

    return [
        r("LABORAL", "Bus", "PA001", "SANTIAGO", "0.3333333333333333", "12.5"),
        r("SABADO", "Metro", "PA002", "PROVIDENCIA", "0.75", "8.0"),
        r("DOMINGO", "zp", "PA003", "MAIPU", "0.0", "0.0"),
        r("LABORAL", "Bus", "", "SANTIAGO", "0.5", "3.0"),  # MISSING_ID
        r("LABORAL", "Bus", "PA004", "SANTIAGO", "1.5", "3.0"),  # BAD_TIME_SLOT
        r("LABORAL", "Bus", "PA005", "SANTIAGO", "0.5", "-1"),  # NEG (negative)
        r("LABORAL", "Bus", "PA006", "SANTIAGO", "0.5", "-"),  # NEG (null)
        r("LABORAL", "Bus", "PA007", "SANTIAGO", "-", "5.0"),  # prefiltered
    ]


def build_lake(root: Path) -> Path:
    """Write the fixture lake (raw CSVs + _meta.json) under root."""
    spec = [
        ("viajes", CUT_VIAJES, 2025, 4, VIAJES_RAW_COLUMNS, viajes_rows()),
        ("etapas", CUT_ETAPAS, 2025, 4, ETAPAS_RAW_COLUMNS, etapas_rows()),
        ("subidas_30m", CUT_SUBIDAS, 2025, 4, SUBIDAS_RAW_COLUMNS, subidas_rows()),
    ]
    for dataset, cut, year, month, columns, rows in spec:
        pdir = (
            root
            / "raw"
            / "dtpm"
            / f"dataset={dataset}"
            / f"year={year}"
            / f"month={month:02d}"
            / f"cut={cut}"
        )
        pdir.mkdir(parents=True, exist_ok=True)
        lines = ["|".join(columns)] + [_row(columns, r) for r in rows]
        (pdir / f"{cut}.{dataset}.csv").write_text(
            "\n".join(lines) + "\n", encoding="utf-8"
        )
        write_meta(pdir, dataset, cut, year, month, columns, len(rows))
    return root
