"""The reference's 15-query business corpus (docs/queries/01..05_*.sql)
as Spark SQL over the gold constellation.

Each query keeps the reference's semantics and output columns
(Spanish aliases); T-SQL-isms are re-expressed portably:
- ``SELECT TOP n`` → ``LIMIT n``
- ``PERCENTILE_CONT(p) WITHIN GROUP … OVER (PARTITION BY g)`` →
  grouped ``percentile(col, p)`` (same interpolated value; Spark has
  no ordered-set window — SURVEY §2.5 W6)
- ``dd.is_laboral`` → ``dd.tipo_dia = 'LABORAL'``
- ``t_transbordo_min`` → ``tc_transfer_min`` (silver leg naming)

Run ``register_gold_views`` once per session, then ``run(spark, "q5")``.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

GOLD_TABLES = [
    "dim_date", "dim_time_30m", "dim_mode", "dim_stop", "dim_service",
    "dim_fare_period", "dim_purpose", "dim_operator_contract", "dim_cut",
    "fct_trip", "fct_trip_leg", "fct_validation", "fct_boardings_30m",
]  # fmt: skip


def register_gold_views(spark: SparkSession, gold_root: Path | str) -> None:
    for t in GOLD_TABLES:
        spark.read.parquet(str(Path(gold_root) / t)).createOrReplaceTempView(t)


# Q1 (01_demanda_horaria.sql): demand curve by day type, 30-min slots
Q1 = """
SELECT
    t.label AS franja_horaria,
    t.hour,
    SUM(CASE WHEN f.tipo_dia = 'LABORAL' THEN f.subidas_promedio ELSE 0 END) AS subidas_laboral,
    SUM(CASE WHEN f.tipo_dia = 'SABADO'  THEN f.subidas_promedio ELSE 0 END) AS subidas_sabado,
    SUM(CASE WHEN f.tipo_dia = 'DOMINGO' THEN f.subidas_promedio ELSE 0 END) AS subidas_domingo,
    ROUND(100.0D * SUM(CASE WHEN f.tipo_dia = 'LABORAL' THEN f.subidas_promedio ELSE 0 END)
               / NULLIF(SUM(CASE WHEN f.tipo_dia = 'DOMINGO' THEN f.subidas_promedio ELSE 0 END), 0)
          - 100, 1) AS pct_laboral_vs_domingo
FROM fct_boardings_30m f
JOIN dim_time_30m t ON t.time_30m_sk = f.time_30m_sk
GROUP BY t.label, t.hour
ORDER BY t.hour, t.label
"""

# Q2 (03_infraestructura.sql): top-20 critical stops
Q2 = """
SELECT
    ds.stop_code, ds.comuna, ds.zone_code, dm.mode_code,
    ROUND(SUM(f.subidas_promedio), 0)       AS subidas_promedio_dia,
    ROUND(SUM(f.subidas_promedio) * 365, 0) AS proyeccion_anual,
    ds.x_utm, ds.y_utm
FROM fct_boardings_30m f
JOIN dim_stop ds ON ds.stop_sk = f.stop_sk
JOIN dim_mode dm ON dm.mode_sk = f.mode_sk
WHERE f.tipo_dia = 'LABORAL'
GROUP BY ds.stop_code, ds.comuna, ds.zone_code, dm.mode_code, ds.x_utm, ds.y_utm
ORDER BY subidas_promedio_dia DESC
LIMIT 20
"""

# Q3 (02_analisis_od.sql): OD matrix, top corridors
Q3 = """
SELECT
    ft.zone_origin_txt AS zona_origen,
    ft.zone_dest_txt   AS zona_destino,
    COUNT(*)           AS viajes_totales,
    ROUND(SUM(ft.factor_expansion), 0)           AS demanda_expandida,
    ROUND(AVG(ft.tviaje_min), 1)                 AS tiempo_promedio_min,
    ROUND(AVG(ft.distancia_ruta_m) / 1000.0, 2)  AS dist_ruta_km,
    ROUND(AVG(CAST(ft.n_etapas AS FLOAT)), 2)    AS etapas_promedio
FROM fct_trip ft
WHERE ft.zone_origin_txt IS NOT NULL
  AND ft.zone_dest_txt IS NOT NULL
  AND ft.zone_origin_txt <> ft.zone_dest_txt
GROUP BY ft.zone_origin_txt, ft.zone_dest_txt
ORDER BY demanda_expandida DESC
LIMIT 30
"""

# Q4 (04_calidad_servicio.sql): trip-complexity segmentation
Q4 = """
SELECT
    ft.n_etapas AS num_etapas,
    COUNT(*) AS viajes,
    ROUND(100.0D * COUNT(*) / SUM(COUNT(*)) OVER (), 2) AS pct_total,
    ROUND(SUM(ft.factor_expansion), 0)                 AS demanda_expandida,
    ROUND(AVG(ft.tviaje_min), 1)                       AS tviaje_promedio_min,
    ROUND(AVG(ft.distancia_ruta_m / 1000.0), 2)        AS dist_ruta_promedio_km,
    ROUND(AVG(ft.tviaje_min) / NULLIF(AVG(ft.distancia_ruta_m / 1000.0), 0), 2) AS min_por_km
FROM fct_trip ft
WHERE ft.n_etapas IS NOT NULL
GROUP BY ft.n_etapas
ORDER BY ft.n_etapas
"""

# Q5 (04_calidad_servicio.sql): slowest BUS services (role-playing stop joins)
Q5 = """
SELECT
    ds.service_code, dm.mode_code,
    COUNT(*) AS legs_registrados,
    ROUND(AVG(tl.tv_leg_min), 1) AS tiempo_promedio_min,
    ROUND(AVG(SQRT(POWER(CAST(sb.x_utm - sa.x_utm AS FLOAT), 2)
               + POWER(CAST(sb.y_utm - sa.y_utm AS FLOAT), 2)) / 1000.0), 2) AS dist_eucl_km_estimada,
    ROUND(AVG(tl.tv_leg_min)
          / NULLIF(AVG(SQRT(POWER(CAST(sb.x_utm - sa.x_utm AS FLOAT), 2)
                          + POWER(CAST(sb.y_utm - sa.y_utm AS FLOAT), 2)) / 1000.0), 0), 2) AS min_por_km
FROM fct_trip_leg tl
JOIN dim_service ds ON ds.service_sk = tl.service_sk
JOIN dim_mode dm    ON dm.mode_sk = tl.mode_sk
JOIN dim_stop sb    ON sb.stop_sk = tl.board_stop_sk
JOIN dim_stop sa    ON sa.stop_sk = tl.alight_stop_sk
WHERE tl.tv_leg_min > 0
  AND sb.x_utm IS NOT NULL AND sa.x_utm IS NOT NULL
  AND dm.mode_code = 'BUS'
GROUP BY ds.service_code, dm.mode_code
HAVING COUNT(*) > {min_legs}
ORDER BY min_por_km DESC
LIMIT 20
"""

# Q6 (01_demanda_horaria.sql): passengers in transit, pct of peak
Q6 = """
WITH viajes_en_transito AS (
    SELECT tl.time_board_30m_sk,
           SUM(ft.factor_expansion) AS pasajeros_en_transito
    FROM fct_trip_leg tl
    JOIN fct_trip ft ON ft.trip_sk = tl.trip_sk
    JOIN dim_mode dm ON dm.mode_sk = tl.mode_sk
    WHERE ft.tipo_dia = 'LABORAL'
    GROUP BY tl.time_board_30m_sk
)
SELECT
    t.label AS franja,
    ROUND(vt.pasajeros_en_transito, 0) AS pasajeros_en_transito,
    ROUND(100.0D * vt.pasajeros_en_transito
          / MAX(vt.pasajeros_en_transito) OVER (), 1) AS pct_del_pico
FROM viajes_en_transito vt
JOIN dim_time_30m t ON t.time_30m_sk = vt.time_board_30m_sk
ORDER BY t.time_30m_sk
"""

# Q7 (05_usuarios.sql): captive users segmentation
Q7 = """
WITH viajes_diarios AS (
    SELECT ft.id_tarjeta, dd.date_sk, COUNT(*) AS viajes_en_dia
    FROM fct_trip ft
    JOIN dim_date dd ON dd.date_sk = ft.date_start_sk
    WHERE ft.id_tarjeta IS NOT NULL AND dd.tipo_dia = 'LABORAL'
    GROUP BY ft.id_tarjeta, dd.date_sk
),
media_por_tarjeta AS (
    SELECT id_tarjeta,
           ROUND(AVG(CAST(viajes_en_dia AS FLOAT)), 2) AS viajes_x_dia_laboral,
           COUNT(DISTINCT date_sk) AS dias_con_actividad
    FROM viajes_diarios
    GROUP BY id_tarjeta
    HAVING COUNT(DISTINCT date_sk) >= {min_days}
)
SELECT
    CASE WHEN viajes_x_dia_laboral >= 6 THEN '>=6 (extremo cautivo)'
         WHEN viajes_x_dia_laboral >= 4 THEN '4-5 (cautivo)'
         WHEN viajes_x_dia_laboral >= 2 THEN '2-3 (regular)'
         ELSE '1 (esporádico)' END AS segmento_uso,
    COUNT(*) AS tarjetas,
    ROUND(100.0D * COUNT(*) / SUM(COUNT(*)) OVER (), 2) AS pct_tarjetas,
    ROUND(AVG(viajes_x_dia_laboral), 2) AS media_viajes_dia,
    ROUND(AVG(CAST(dias_con_actividad AS FLOAT)), 1) AS dias_activos_promedio
FROM media_por_tarjeta
GROUP BY 1
ORDER BY media_viajes_dia DESC
"""

# Q8 (03_infraestructura.sql): territorial inequality quartiles
Q8 = """
WITH subidas_x_comuna AS (
    SELECT ds.comuna,
           COUNT(DISTINCT ds.stop_code) AS num_paradas,
           ROUND(SUM(f.subidas_promedio), 0) AS subidas_promedio_dia,
           ROUND(SUM(f.subidas_promedio) / NULLIF(COUNT(DISTINCT ds.stop_code), 0), 1) AS subidas_por_parada
    FROM fct_boardings_30m f
    JOIN dim_stop ds ON ds.stop_sk = f.stop_sk
    WHERE f.tipo_dia = 'LABORAL' AND ds.comuna IS NOT NULL
    GROUP BY ds.comuna
)
SELECT comuna, num_paradas, subidas_promedio_dia, subidas_por_parada,
       NTILE(4) OVER (ORDER BY subidas_por_parada) AS cuartil_cobertura,
       CASE NTILE(4) OVER (ORDER BY subidas_por_parada)
           WHEN 1 THEN 'Sub-servida' WHEN 2 THEN 'Baja cobertura'
           WHEN 3 THEN 'Cobertura media' WHEN 4 THEN 'Bien servida' END AS categoria
FROM subidas_x_comuna
ORDER BY subidas_por_parada
"""

# Q9 (05_usuarios.sql): intermodality (Metro+Bus combinations);
# ordered-set window → grouped percentile of the per-trip mean
Q9 = """
WITH modos_por_viaje AS (
    SELECT tl.trip_sk,
           MAX(CASE WHEN dm.mode_code = 'METRO' THEN 1 ELSE 0 END) AS tiene_metro,
           MAX(CASE WHEN dm.mode_code = 'BUS' THEN 1 ELSE 0 END) AS tiene_bus,
           MAX(CASE WHEN dm.mode_code = 'METROTREN' THEN 1 ELSE 0 END) AS tiene_tren,
           AVG(CASE WHEN tl.leg_seq > 1 AND tl.tc_transfer_min IS NOT NULL
                    THEN tl.tc_transfer_min END) AS espera_transbordo_prom_min,
           COUNT(DISTINCT tl.leg_seq) AS n_etapas
    FROM fct_trip_leg tl
    JOIN dim_mode dm ON dm.mode_sk = tl.mode_sk
    GROUP BY tl.trip_sk
),
clasificado AS (
    SELECT *,
        CASE WHEN tiene_metro = 1 AND tiene_bus = 1 AND tiene_tren = 0 THEN 'Metro + Bus'
             WHEN tiene_metro = 1 AND tiene_bus = 0 AND tiene_tren = 0 THEN 'Solo Metro'
             WHEN tiene_metro = 0 AND tiene_bus = 1 AND tiene_tren = 0 THEN 'Solo Bus'
             WHEN tiene_metro = 1 AND tiene_tren = 1 THEN 'Metro + Metrotren'
             WHEN tiene_metro = 0 AND tiene_tren = 1 THEN 'Solo Metrotren'
             ELSE 'Combinación otra' END AS tipo_viaje
    FROM modos_por_viaje
)
SELECT tipo_viaje,
       COUNT(*) AS viajes,
       ROUND(100.0D * COUNT(*) / SUM(COUNT(*)) OVER (), 2) AS pct_viajes,
       ROUND(AVG(CAST(n_etapas AS FLOAT)), 2) AS etapas_promedio,
       ROUND(AVG(espera_transbordo_prom_min), 2) AS espera_transbordo_prom_min,
       ROUND(percentile(espera_transbordo_prom_min, 0.5), 2) AS mediana_espera_transbordo_min
FROM clasificado
GROUP BY tipo_viaje
ORDER BY viajes DESC
"""

# Q10 (02_analisis_od.sql): route-deviation factor
Q10 = """
SELECT
    CASE WHEN ft.distancia_ruta_m / NULLIF(ft.distancia_eucl_m, 0) < 1.2 THEN 'Muy directo (<1.2x)'
         WHEN ft.distancia_ruta_m / NULLIF(ft.distancia_eucl_m, 0) < 1.5 THEN 'Directo (1.2–1.5x)'
         WHEN ft.distancia_ruta_m / NULLIF(ft.distancia_eucl_m, 0) < 2.0 THEN 'Moderado (1.5–2x)'
         ELSE 'Alto desvío (>2x)' END AS categoria_desvio,
    COUNT(*) AS viajes,
    ROUND(AVG(ft.tviaje_min), 1) AS tiempo_promedio_min,
    ROUND(AVG(ft.distancia_ruta_m) / 1000.0, 2) AS dist_ruta_km,
    ROUND(AVG(ft.distancia_ruta_m / NULLIF(ft.distancia_eucl_m, 0)), 3) AS factor_desvio_promedio
FROM fct_trip ft
WHERE ft.distancia_eucl_m > 500 AND ft.distancia_ruta_m IS NOT NULL
GROUP BY 1
ORDER BY factor_desvio_promedio
"""

# Q11 (04_calidad_servicio.sql): transfer propensity by fare period
Q11 = """
SELECT
    fp.fare_period_name AS periodo_tarifario,
    COUNT(*) AS viajes,
    ROUND(AVG(CAST(ft.n_etapas AS FLOAT)), 3) AS etapas_promedio,
    ROUND(AVG(ft.tviaje_min), 1) AS tviaje_promedio_min,
    ROUND(AVG(ft.distancia_ruta_m / 1000.0), 2) AS dist_promedio_km,
    ROUND(100.0D * SUM(CASE WHEN ft.n_etapas > 1 THEN 1 ELSE 0 END) / COUNT(*), 2) AS pct_con_transbordo
FROM fct_trip ft
JOIN dim_fare_period fp ON fp.fare_period_sk = ft.fare_period_start_sk
WHERE fp.fare_period_name IS NOT NULL
GROUP BY fp.fare_period_name
ORDER BY pct_con_transbordo DESC
"""

# Q12 (04_calidad_servicio.sql): wait time by mode with median/p90
Q12 = """
SELECT
    dm.mode_code,
    COUNT(*) AS validaciones,
    ROUND(AVG(fv.t_espera_media_min), 2) AS espera_promedio_min,
    ROUND(percentile(fv.t_espera_media_min, 0.5), 2) AS espera_mediana_min,
    ROUND(percentile(fv.t_espera_media_min, 0.9), 2) AS espera_p90_min,
    ROUND(AVG(CASE WHEN fv.tipo_dia = 'LABORAL' THEN fv.t_espera_media_min END), 2) AS espera_laboral,
    ROUND(AVG(CASE WHEN fv.tipo_dia = 'DOMINGO' THEN fv.t_espera_media_min END), 2) AS espera_domingo
FROM fct_validation fv
JOIN dim_mode dm ON dm.mode_sk = fv.mode_sk
WHERE fv.t_espera_media_min IS NOT NULL
  AND fv.t_espera_media_min BETWEEN 0 AND 120
GROUP BY dm.mode_code
ORDER BY espera_promedio_min DESC
"""

# Q13 (04_calidad_servicio.sql): alight-data coverage audit by contract
Q13 = """
SELECT
    dm.mode_code, oc.contract_code,
    COUNT(*) AS total_validaciones,
    SUM(CAST(fv.tiene_bajada AS INT)) AS con_bajada,
    COUNT(*) - SUM(CAST(fv.tiene_bajada AS INT)) AS sin_bajada,
    ROUND(100.0D * SUM(CAST(fv.tiene_bajada AS INT)) / COUNT(*), 2) AS pct_con_bajada,
    ROUND(AVG(CASE WHEN fv.tiene_bajada THEN fv.tiempo_etapa_sec / 60.0D END), 1) AS tiempo_etapa_promedio_min
FROM fct_validation fv
JOIN dim_mode dm ON dm.mode_sk = fv.mode_sk
LEFT JOIN dim_operator_contract oc ON oc.operator_contract_sk = fv.operator_sk
WHERE fv.tiene_bajada IS NOT NULL
GROUP BY dm.mode_code, oc.contract_code
ORDER BY pct_con_bajada
"""

# Q14 (01_demanda_horaria.sql): daily demand time series with LAG
Q14 = """
SELECT
    dd.full_date, dd.day_of_week, dd.tipo_dia,
    COUNT(DISTINCT ft.id_tarjeta) AS tarjetas_unicas,
    COUNT(*) AS viajes_muestra,
    ROUND(SUM(ft.factor_expansion), 0) AS demanda_expandida,
    ROUND(AVG(ft.tviaje_min), 1) AS tviaje_promedio_min,
    ROUND(AVG(CAST(ft.n_etapas AS FLOAT)), 3) AS etapas_promedio,
    ROUND(SUM(ft.factor_expansion)
          - LAG(SUM(ft.factor_expansion)) OVER (ORDER BY dd.full_date), 0) AS delta_vs_dia_anterior
FROM fct_trip ft
JOIN dim_date dd ON dd.date_sk = ft.date_start_sk
GROUP BY dd.full_date, dd.day_of_week, dd.tipo_dia
ORDER BY dd.full_date
"""

# Q15 (02_analisis_od.sql): efficiency by trip purpose
Q15 = """
SELECT
    dp.purpose_name AS proposito,
    COUNT(*) AS viajes,
    ROUND(SUM(ft.factor_expansion), 0) AS demanda_expandida,
    ROUND(AVG(ft.tviaje_min), 1) AS tviaje_promedio_min,
    ROUND(AVG(ft.distancia_ruta_m) / 1000.0, 2) AS dist_ruta_promedio_km,
    ROUND(AVG(CAST(ft.n_etapas AS FLOAT)), 3) AS etapas_promedio,
    ROUND(AVG(ft.distancia_ruta_m / 1000.0) / NULLIF(AVG(ft.tviaje_min) / 60.0D, 0), 1) AS velocidad_puerta_kmh,
    ROUND(100.0D * SUM(CASE WHEN ft.tipo_dia = 'LABORAL' THEN 1 ELSE 0 END) / COUNT(*), 1) AS pct_laboral,
    ROUND(100.0D * SUM(CASE WHEN ft.tipo_dia = 'DOMINGO' THEN 1 ELSE 0 END) / COUNT(*), 1) AS pct_domingo
FROM fct_trip ft
JOIN dim_purpose dp ON dp.purpose_sk = ft.purpose_sk
GROUP BY dp.purpose_name
ORDER BY demanda_expandida DESC
"""

BUSINESS_QUERIES: dict[str, str] = {
    "q1_demand_curve": Q1,
    "q2_critical_stops": Q2,
    "q3_od_matrix": Q3,
    "q4_trip_complexity": Q4,
    "q5_slow_services": Q5,
    "q6_in_transit": Q6,
    "q7_captive_users": Q7,
    "q8_territorial_quartiles": Q8,
    "q9_intermodality": Q9,
    "q10_deviation_factor": Q10,
    "q11_fare_period_transfers": Q11,
    "q12_wait_by_mode": Q12,
    "q13_alight_coverage": Q13,
    "q14_daily_series": Q14,
    "q15_purpose_efficiency": Q15,
}

# statistical-floor params tuned down for small fixtures; production
# defaults match the reference (HAVING COUNT(*) > 1000, >= 3 days)
DEFAULT_PARAMS = {"min_legs": 1000, "min_days": 3}


def run(
    spark: SparkSession,
    name: str,
    params: dict[str, int] | None = None,
) -> DataFrame:
    sql = BUSINESS_QUERIES[name]
    p = dict(DEFAULT_PARAMS)
    if params:
        p.update(params)
    return spark.sql(sql.format(**p) if "{" in sql else sql)
