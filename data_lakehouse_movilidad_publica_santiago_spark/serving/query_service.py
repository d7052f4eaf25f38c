"""Parameterized query service — the Spark re-expression of the
reference FastAPI backend (src/webapp/query_service.py).

The reference spins up an in-memory DuckDB per request over parquet
globs (:110-112); here one long-lived SparkSession serves all
requests: the silver tables are lazily-resolved DataFrames, filters
become Catalyst predicates (pushed into the parquet scans, pruning
Hive partitions on `cut`), and results are tiny (≤2000 rows), so
collect() is the correct transport.

Query types (main.py:79-111): overview, demand_by_day_type,
demand_by_mode, top_boardings, plus map_points (modal-coordinate vote
W2 + UTM→WGS84 reprojection).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.geo import utm_to_wgs84
from ..operators.windows import top_k_per_group

ALLOWED_DAY_TYPES = {"LABORAL", "SABADO", "DOMINGO"}
ALLOWED_MODES = {"BUS", "METRO", "METROTREN", "ZP"}


@dataclass(frozen=True)
class QueryFilters:
    """API filter surface (query_service.py:17-24)."""

    cut_from: str | None = None
    cut_to: str | None = None
    tipo_dia: list[str] | None = None
    mode: list[str] | None = None
    hour_from: int | None = None
    hour_to: int | None = None


def _to_month_cut(value: str | None) -> str | None:
    """Daily cut → month cut for subidas (query_service.py:27-33)."""
    if not value:
        return None
    v = value.strip()
    return v[:7] if len(v) >= 7 else None


def _subidas_filters(f: QueryFilters) -> QueryFilters:
    return QueryFilters(
        cut_from=_to_month_cut(f.cut_from),
        cut_to=_to_month_cut(f.cut_to),
        tipo_dia=f.tipo_dia,
        mode=f.mode,
        hour_from=f.hour_from,
        hour_to=f.hour_to,
    )


def _normalize_hour(v: int | None) -> int | None:
    return None if v is None else max(0, min(23, int(v)))


def _normalize_list(values: list[str] | None, allowed: set[str]) -> list[str]:
    if not values:
        return []
    out = [v.strip().upper() for v in values if v and v.strip()]
    return [v for v in out if v in allowed]


def apply_filters(
    df: DataFrame,
    f: QueryFilters,
    *,
    cut_col: str = "cut",
    day_col: str | None = None,
    mode_col: str | None = None,
    hour_col: str | None = None,
) -> DataFrame:
    """Predicate builder (P7, query_service.py:65-107): cut range is a
    string compare, IN-lists validated against allowlists, hour range
    derived as FLOOR(slot/2). All plain Catalyst predicates → pushed
    to the scan."""
    conds: list[Column] = []
    if f.cut_from:
        conds.append(F.col(cut_col) >= f.cut_from)
    if f.cut_to:
        conds.append(F.col(cut_col) <= f.cut_to)
    days = _normalize_list(f.tipo_dia, ALLOWED_DAY_TYPES)
    if day_col and days:
        conds.append(F.col(day_col).isin(days))
    modes = _normalize_list(f.mode, ALLOWED_MODES)
    if mode_col and modes:
        conds.append(F.col(mode_col).isin(modes))
    hf, ht = _normalize_hour(f.hour_from), _normalize_hour(f.hour_to)
    if hour_col and hf is not None:
        conds.append(F.floor(F.col(hour_col) / 2).cast("int") >= hf)
    if hour_col and ht is not None:
        conds.append(F.floor(F.col(hour_col) / 2).cast("int") <= ht)
    for c in conds:
        df = df.filter(c)
    return df


class SilverLake:
    """Lazily-bound silver tables for the serving session."""

    def __init__(self, spark: SparkSession, lake_root: Path | str) -> None:
        self.spark = spark
        self.root = Path(lake_root)

    def _glob(self, dataset: str, filename: str) -> str:
        return str(
            self.root
            / "processed"
            / "dtpm"
            / f"dataset={dataset}"
            / "year=*"
            / "month=*"
            / "cut=*"
            / filename
        )

    def trips(self) -> DataFrame:
        return self.spark.read.parquet(self._glob("viajes", "viajes_trip.parquet"))

    def etapas(self) -> DataFrame:
        return self.spark.read.parquet(
            self._glob("etapas", "etapas_validation.parquet")
        )

    def subidas(self) -> DataFrame:
        return self.spark.read.parquet(
            self._glob("subidas_30m", "subidas_30m.parquet")
        )

    def ready(self, dataset: str, filename: str) -> bool:
        import glob as _glob_mod

        return bool(_glob_mod.glob(self._glob(dataset, filename) + "/*"))


def ensure_data_ready(lake: SilverLake) -> bool:
    """Readiness probe (S7, query_service.py:115-134)."""
    return (
        lake.ready("viajes", "viajes_trip.parquet")
        and lake.ready("etapas", "etapas_validation.parquet")
        and lake.ready("subidas_30m", "subidas_30m.parquet")
    )


def query_overview(lake: SilverLake, f: QueryFilters) -> list[dict[str, Any]]:
    """5 scalar aggregates across 3 datasets (A9, :260-290)."""
    trips = apply_filters(lake.trips(), f, cut_col="cut")
    etapas = apply_filters(
        lake.etapas(), f, cut_col="cut", day_col="tipo_dia",
        mode_col="tipo_transporte", hour_col="time_board_30m_sk",
    )  # fmt: skip
    subidas = apply_filters(
        lake.subidas(), _subidas_filters(f), cut_col="cut", day_col="tipo_dia",
        mode_col="mode_code", hour_col="time_30m_sk",
    )  # fmt: skip
    v = trips.agg(
        F.count("*").alias("viajes_observados"),
        F.coalesce(F.round(F.sum("factor_expansion"), 2), F.lit(0.0)).alias(
            "viajes_estimados"
        ),
    )
    e = etapas.agg(
        F.count("*").alias("etapas_observadas"),
        F.coalesce(
            F.round(F.sum("fExpansionServicioPeriodoTS"), 2), F.lit(0.0)
        ).alias("etapas_estimadas"),
    )
    s = subidas.agg(
        F.coalesce(F.round(F.sum("subidas_promedio"), 2), F.lit(0.0)).alias(
            "subidas_promedio_total"
        )
    )
    return [r.asDict() for r in v.crossJoin(e).crossJoin(s).collect()]


def query_demand_by_day_type(
    lake: SilverLake, f: QueryFilters
) -> list[dict[str, Any]]:
    """(:293-311)."""
    df = apply_filters(
        lake.etapas(), f, cut_col="cut",
        mode_col="tipo_transporte", hour_col="time_board_30m_sk",
    )  # fmt: skip
    out = (
        df.groupBy("tipo_dia")
        .agg(
            F.count("*").alias("etapas_observadas"),
            F.round(F.sum("fExpansionServicioPeriodoTS"), 2).alias(
                "etapas_estimadas"
            ),
        )
        .orderBy(F.desc("etapas_estimadas"))
    )
    return [r.asDict() for r in out.collect()]


def query_demand_by_mode(lake: SilverLake, f: QueryFilters) -> list[dict[str, Any]]:
    """(:314-333)."""
    df = apply_filters(
        lake.etapas(), f, cut_col="cut", day_col="tipo_dia",
        mode_col="tipo_transporte", hour_col="time_board_30m_sk",
    )  # fmt: skip
    out = (
        df.groupBy(F.col("tipo_transporte").alias("mode_code"))
        .agg(
            F.count("*").alias("etapas_observadas"),
            F.round(F.sum("fExpansionServicioPeriodoTS"), 2).alias(
                "etapas_estimadas"
            ),
        )
        .orderBy(F.desc("etapas_estimadas"))
    )
    return [r.asDict() for r in out.collect()]


def query_top_boardings(
    lake: SilverLake, f: QueryFilters, limit: int = 20
) -> list[dict[str, Any]]:
    """Grouped top-k (O1, :336-357)."""
    df = apply_filters(
        lake.subidas(), _subidas_filters(f), cut_col="cut", day_col="tipo_dia",
        mode_col="mode_code", hour_col="time_30m_sk",
    )  # fmt: skip
    out = (
        df.groupBy("stop_code", "comuna", "mode_code")
        .agg(F.round(F.sum("subidas_promedio"), 2).alias("subidas_promedio_total"))
        .orderBy(F.desc("subidas_promedio_total"))
        .limit(limit)
    )
    return [r.asDict() for r in out.collect()]


def stop_modal_coords(etapas: DataFrame) -> DataFrame:
    """Modal-coordinate vote per stop (W2, :163-201): most frequent
    (x, y) observed for each stop across board+alight events, tie
    broken by (x, y); map-display UTM bounding box."""
    def _side(stop: str, x: str, y: str) -> DataFrame:
        return etapas.filter(
            F.col(stop).isNotNull()
            & (F.trim(F.col(stop)) != "")
            & F.col(x).between(200_000, 500_000)
            & F.col(y).between(6_200_000, 6_350_000)
        ).select(
            F.col(stop).alias("stop_code"),
            F.col(x).cast("double").alias("x_utm"),
            F.col(y).cast("double").alias("y_utm"),
        )

    coords = _side("parada_subida", "x_subida", "y_subida").unionByName(
        _side("parada_bajada", "x_bajada", "y_bajada")
    )
    counted = coords.groupBy("stop_code", "x_utm", "y_utm").agg(
        F.count("*").alias("cnt")
    )
    return top_k_per_group(
        counted,
        group=["stop_code"],
        order_by=[F.desc("cnt"), F.asc("x_utm"), F.asc("y_utm")],
        k=1,
    ).select("stop_code", "x_utm", "y_utm")


def query_map_points(
    lake: SilverLake, f: QueryFilters, limit: int = 400
) -> list[dict[str, Any]]:
    """Map portal points (:151-257): aggregated boardings joined to the
    modal stop coordinate, top-k by estimated boardings, reprojected
    UTM 19S → WGS84 with the vectorized pandas UDF (not row-by-row
    pyproj like the reference)."""
    subidas = apply_filters(
        lake.subidas(), _subidas_filters(f), cut_col="cut", day_col="tipo_dia",
        mode_col="mode_code", hour_col="time_30m_sk",
    )  # fmt: skip
    boardings = subidas.groupBy(
        F.col("cut").alias("service_date"),
        F.floor(F.col("time_30m_sk") / 2).cast("int").alias("hour_of_day"),
        "tipo_dia",
        "mode_code",
        "stop_code",
    ).agg(
        F.any_value("comuna", ignoreNulls=True).alias("comuna"),
        F.round(F.sum("subidas_promedio"), 2).alias("etapas_estimadas"),
        F.count("*").alias("etapas_observadas"),
    )
    coords = stop_modal_coords(lake.etapas())
    joined = (
        boardings.join(F.broadcast(coords), "stop_code", "inner")
        .orderBy(F.desc("etapas_estimadas"))
        .limit(limit)
    )
    pts = joined.withColumn(
        "_ll", utm_to_wgs84(F.col("x_utm"), F.col("y_utm"))
    ).select(
        "service_date",
        "hour_of_day",
        "tipo_dia",
        "mode_code",
        "stop_code",
        "comuna",
        F.round(F.col("_ll.lat"), 6).alias("lat"),
        F.round(F.col("_ll.lon"), 6).alias("lon"),
        "etapas_estimadas",
        "etapas_observadas",
    )
    return [r.asDict() for r in pts.filter(F.col("lat").isNotNull()).collect()]
