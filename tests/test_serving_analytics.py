"""Serving-layer (API query types) and business-analytics (Q1–Q15)
tests over the fixture lake + gold DW."""

from __future__ import annotations

import pytest

from data_lakehouse_movilidad_publica_santiago_spark.analytics import business
from data_lakehouse_movilidad_publica_santiago_spark.gold import GoldLoader
from data_lakehouse_movilidad_publica_santiago_spark.serving import (
    QueryFilters,
    SilverLake,
    ensure_data_ready,
    query_demand_by_day_type,
    query_demand_by_mode,
    query_map_points,
    query_overview,
    query_top_boardings,
)
from data_lakehouse_movilidad_publica_santiago_spark.silver import run_silver
from data_lakehouse_movilidad_publica_santiago_spark.sources.catalog import (
    discover_partitions,
)

import dtpm_fixtures as fx


@pytest.fixture(scope="module")
def dw(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("lake")
    fx.build_lake(root)
    loader = GoldLoader(spark, root / "gold")
    for p in discover_partitions(root):
        run_silver(spark, p, root)
        loader.run(p, root)
    business.register_gold_views(spark, root / "gold")
    return SilverLake(spark, root), loader


def test_ready(dw):
    lake, _ = dw
    assert ensure_data_ready(lake)


def test_overview(dw):
    lake, _ = dw
    rows = query_overview(lake, QueryFilters())
    assert len(rows) == 1
    r = rows[0]
    assert r["viajes_observados"] == 4
    assert r["etapas_observadas"] == 3
    assert r["viajes_estimados"] == pytest.approx(5.68, abs=0.01)
    # cut range filter prunes everything
    none = query_overview(lake, QueryFilters(cut_from="2026-01-01"))[0]
    assert none["viajes_observados"] == 0
    assert none["subidas_promedio_total"] == 0.0


def test_demand_queries(dw):
    lake, _ = dw
    by_day = query_demand_by_day_type(lake, QueryFilters())
    assert {r["tipo_dia"] for r in by_day} == {"LABORAL"}
    by_mode = query_demand_by_mode(lake, QueryFilters(mode=["bus", "metro"]))
    assert {r["mode_code"] for r in by_mode} <= {"BUS", "METRO"}
    # hour filter: slot 17 → hour 8
    hour = query_demand_by_mode(lake, QueryFilters(hour_from=9))
    assert sum(r["etapas_observadas"] for r in hour) == 1  # only the 09:15 etapa


def test_top_boardings(dw):
    lake, _ = dw
    rows = query_top_boardings(lake, QueryFilters(), limit=2)
    assert len(rows) == 2
    assert rows[0]["subidas_promedio_total"] >= rows[1]["subidas_promedio_total"]
    assert rows[0]["stop_code"] == "PA001"


def test_map_points(dw):
    lake, _ = dw
    pts = query_map_points(lake, QueryFilters(), limit=10)
    # fixture stops with coords inside the map bbox: subidas stops have
    # no coords (no etapas match) except none → points come only from
    # stops present in BOTH subidas and etapas; fixture has none shared
    # → expect empty, which is a correct inner-join result
    assert pts == []
    # now check the modal-vote machinery directly via etapas stops
    from data_lakehouse_movilidad_publica_santiago_spark.serving.query_service import (
        stop_modal_coords,
    )

    coords = {r["stop_code"]: r for r in stop_modal_coords(lake.etapas()).collect()}
    assert "T-4-19-SN-40" in coords
    assert coords["T-4-19-SN-40"]["x_utm"] == 347180.0


def test_utm_reprojection(spark):
    """Santiago downtown UTM 19S → known WGS84 (±0.001°)."""
    from pyspark.sql import functions as F

    from data_lakehouse_movilidad_publica_santiago_spark.functions.geo import (
        utm_to_wgs84,
    )

    df = spark.createDataFrame([(346000.0, 6298000.0)], "x double, y double")
    row = df.select(utm_to_wgs84(F.col("x"), F.col("y")).alias("ll")).collect()[0]
    lat, lon = row["ll"]["lat"], row["ll"]["lon"]
    assert abs(lat - (-33.4447)) < 2e-3
    assert abs(lon - (-70.6565)) < 2e-3


@pytest.mark.parametrize("name", sorted(business.BUSINESS_QUERIES))
def test_business_query_runs(dw, spark, name):
    """Every Q runs over the DW and returns the expected columns."""
    df = business.run(spark, name, params={"min_legs": 0, "min_days": 1})
    rows = df.collect()
    if name == "q4_trip_complexity":
        assert [r["num_etapas"] for r in rows] == [1, 2]
        assert sum(r["viajes"] for r in rows) == 3
        assert abs(sum(r["pct_total"] for r in rows) - 100.0) < 0.1
    elif name == "q9_intermodality":
        kinds = {r["tipo_viaje"]: r["viajes"] for r in rows}
        assert kinds.get("Metro + Bus") == 2  # 2-leg fixture trips
        assert kinds.get("Solo Bus") == 1
    elif name == "q14_daily_series":
        assert len(rows) == 1 and rows[0]["tarjetas_unicas"] == 2
    elif name == "q12_wait_by_mode":
        assert {r["mode_code"] for r in rows} == {"BUS", "METRO"}
    elif name == "q15_purpose_efficiency":
        assert rows[0]["proposito"] == "TRABAJO"
    else:
        assert rows is not None  # executes without error


def test_concurrent_query_service_correctness(dw):
    """Round-10 serving-tier smoke: 16 threads fire mixed query types
    against ONE shared SparkSession (the long-lived serving model,
    SURVEY §3.3 — vs the reference's per-request DuckDB) and every
    concurrent result must equal its serial twin.  Latency under
    FIFO-vs-FAIR is probed in SCALE.md (scale_probe_r10.py serving);
    this pins correctness under concurrency."""
    from concurrent.futures import ThreadPoolExecutor

    lake, _ = dw
    reqs = []
    for hour in (None, 6, 9, 15):
        f = QueryFilters(hour_from=hour)
        reqs.extend([
            lambda f=f: query_overview(lake, f),
            lambda f=f: query_demand_by_day_type(lake, f),
            lambda f=f: query_demand_by_mode(lake, f),
            lambda f=f: query_top_boardings(lake, f),
        ])  # fmt: skip
    serial = [fn() for fn in reqs]
    with ThreadPoolExecutor(16) as ex:
        concurrent = list(ex.map(lambda fn: fn(), reqs))
    assert concurrent == serial


def test_request_class_pools(spark):
    """Round-11 serving profile: set_request_class routes the calling
    thread's jobs into the workload-class FAIR pool (local property),
    rejects unknown classes, and the serving conf asks for FAIR
    scheduling (the mode itself is SparkContext-level, so it can only
    take effect as the process's first session — asserted on the conf
    dict, not the shared test context)."""
    import pytest as _pytest

    from data_lakehouse_movilidad_publica_santiago_spark.session import (
        SERVING_CLASSES,
        set_request_class,
    )

    for cls in SERVING_CLASSES:
        set_request_class(spark, cls)
        assert (
            spark.sparkContext.getLocalProperty("spark.scheduler.pool")
            == cls
        )
    with _pytest.raises(ValueError, match="request_class"):
        set_request_class(spark, "batch")
    # restore the default pool for the shared session
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", None)


def test_get_serving_spark_rejects_foreign_fifo_context(spark):
    """ADVICE r11: spark.scheduler.mode is SparkContext-level, so
    get_serving_spark against an ALREADY-RUNNING FIFO context (the
    shared test session here) silently keeps FIFO — it must raise
    instead of handing back a session where set_request_class is a
    misconfigured no-op."""
    import pytest as _pytest

    from data_lakehouse_movilidad_publica_santiago_spark.session import (
        get_serving_spark,
    )

    with _pytest.raises(RuntimeError, match="scheduler.mode"):
        get_serving_spark()
