"""Schema registry for the three DTPM raw datasets.

Ingest is all-VARCHAR by policy (reference src/silver/transforms.py:114-129,
spec built at src/silver/catalog.py:115-126): every raw column arrives
as text, '-' means NULL, '|' separates. Typing happens in the silver
projection via TRY_CAST-equivalent casts.

Column lists are authoritative from each partition's ``_meta.json``
(catalog.py:161-191); the constants here are the defaults observed in
the reference lake (viajes 101 cols incl. one trailing empty name that
is filtered, etapas 35, subidas_30m 6).
"""

from __future__ import annotations

from pyspark.sql import types as T

# fmt: off
VIAJES_RAW_COLUMNS: list[str] = [
    "tipodia", "factor_expansion", "n_etapas", "tviaje", "distancia_eucl",
    "distancia_ruta", "tiempo_inicio_viaje", "tiempo_fin_viaje",
    "mediahora_inicio_viaje", "mediahora_fin_viaje", "periodo_inicio_viaje",
    "periodo_fin_viaje", "tipo_transporte_1", "tipo_transporte_2",
    "tipo_transporte_3", "tipo_transporte_4", "srv_1", "srv_2", "srv_3",
    "srv_4", "paradero_inicio_viaje", "paradero_fin_viaje",
    "comuna_inicio_viaje", "comuna_fin_viaje", "zona_inicio_viaje",
    "zona_fin_viaje", "modos", "tiempo_subida_1", "tiempo_subida_2",
    "tiempo_subida_3", "tiempo_subida_4", "tiempo_bajada_1",
    "tiempo_bajada_2", "tiempo_bajada_3", "tiempo_bajada_4",
    "zona_subida_1", "zona_subida_2", "zona_subida_3", "zona_subida_4",
    "zona_bajada_1", "zona_bajada_2", "zona_bajada_3", "zona_bajada_4",
    "paradero_subida_1", "paradero_subida_2", "paradero_subida_3",
    "paradero_subida_4", "paradero_bajada_1", "paradero_bajada_2",
    "paradero_bajada_3", "paradero_bajada_4", "mediahora_bajada_1",
    "mediahora_bajada_2", "mediahora_bajada_3", "mediahora_bajada_4",
    "periodo_bajada_1", "periodo_bajada_2", "periodo_bajada_3",
    "periodo_bajada_4", "id_tarjeta", "id_viaje", "netapassinbajada",
    "ultimaetapaconbajada", "contrato", "mediahora_inicio_viaje_hora",
    "mediahora_fin_viaje_hora", "op_1era_etapa", "op_2da_etapa",
    "op_3era_etapa", "op_4ta_etapa", "dt1", "dveh_ruta1", "dveh_euc1",
    "dt2", "dveh_ruta2", "dveh_euc2", "dt3", "dveh_ruta3", "dveh_euc3",
    "dveh_ruta4", "dveh_euc4", "dtfinal", "dveh_rutafinal", "dveh_eucfinal",
    "tipo_corte_etapa_viaje", "proposito", "entrada", "te0", "tv1", "tc1",
    "te1", "tv2", "tc2", "te2", "tv3", "tc3", "te3", "tv4", "egreso",
    "tviaje2", "",
]

ETAPAS_RAW_COLUMNS: list[str] = [
    "operador", "id_etapa", "correlativo_viajes", "correlativo_etapas",
    "tipo_dia", "tipo_transporte", "fExpansionServicioPeriodoTS",
    "tiene_bajada", "tiempo2", "tiempo_subida", "tiempo_bajada",
    "tiempo_etapa", "media_hora_subida", "media_hora_bajada", "x_subida",
    "y_subida", "x_bajada", "y_bajada", "dist_ruta_paraderos",
    "dist_eucl_paraderos", "servicio_subida", "servicio_bajada",
    "parada_subida", "parada_bajada", "comuna_subida", "comuna_bajada",
    "zona_subida", "zona_bajada", "sitio_subida",
    "fExpansionZonaPeriodoTS", "tEsperaMediaIntervalo", "periodoSubida",
    "periodoBajada", "tiempoIniExpedicion", "contrato",
]

SUBIDAS_RAW_COLUMNS: list[str] = [
    "Tipo_dia", "Modo", "Paradero", "Comuna", "Media_hora",
    "Subidas_Promedio",
]
# fmt: on

RAW_COLUMNS: dict[str, list[str]] = {
    "viajes": VIAJES_RAW_COLUMNS,
    "etapas": ETAPAS_RAW_COLUMNS,
    "subidas_30m": SUBIDAS_RAW_COLUMNS,
}


def clean_columns(columns: list[str]) -> list[str]:
    """Drop empty column names (the trailing '' in viajes —
    catalog.py:31-33 parity)."""
    return [c for c in columns if c and c.strip()]


def all_varchar_schema(columns: list[str]) -> T.StructType:
    """All-string StructType over the FULL raw column list.

    Arity must match the physical CSV field count, so empty names
    (the trailing '' in viajes — rows end with a '|') become
    ``_empty_<i>`` placeholders; the reader selects only
    ``clean_columns`` afterwards.
    """
    fields = []
    for i, c in enumerate(columns):
        name = c if c and c.strip() else f"_empty_{i}"
        fields.append(T.StructField(name, T.StringType(), True))
    return T.StructType(fields)
