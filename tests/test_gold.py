"""Gold layer parity tests: dims (static/lookup/SCD2), fact grains,
cash exclusion, idempotent re-loads, run log."""

from __future__ import annotations

from datetime import date

import pytest
from pyspark.sql import functions as F

from data_lakehouse_movilidad_publica_santiago_spark.gold import GoldLoader
from data_lakehouse_movilidad_publica_santiago_spark.gold import dims as D
from data_lakehouse_movilidad_publica_santiago_spark.silver import run_silver
from data_lakehouse_movilidad_publica_santiago_spark.sources.catalog import (
    discover_partitions,
)

import dtpm_fixtures as fx


@pytest.fixture(scope="module")
def gold(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("lake")
    fx.build_lake(root)
    for p in discover_partitions(root):
        run_silver(spark, p, root)
    loader = GoldLoader(spark, root / "gold")
    results = {}
    for p in discover_partitions(root):
        results[p.dataset] = loader.run(p, root)
    loader.lake_root = root  # for reload tests
    return loader, results


def test_static_dims(gold):
    loader, _ = gold
    t30 = loader.store.read("dim_time_30m")
    assert t30.count() == 48
    rows = {r["time_30m_sk"]: r for r in t30.collect()}
    assert rows[17]["label"] == "08:30"
    assert rows[17]["start_time"] == "08:30:00"
    assert rows[17]["end_time"] == "09:00:00"
    assert rows[47]["end_time"] == "00:00:00"  # wraps
    mode = {r["mode_code"]: r["mode_sk"] for r in loader.store.read("dim_mode").collect()}
    assert mode == {"BUS": 1, "METRO": 2, "METROTREN": 3, "ZP": 4, "UNKNOWN": 5}


def test_dim_date(gold):
    loader, _ = gold
    dd = loader.store.read("dim_date")
    row = dd.filter("date_sk = 20250421").collect()[0]
    assert row["day_of_week"] == "Lunes"
    assert row["tipo_dia"] == "LABORAL"
    assert row["month_name"] == "Abril"
    sun = dd.filter("date_sk = 20250420").collect()[0]
    assert sun["tipo_dia"] == "DOMINGO" and sun["is_weekend"] == 1
    # full-year coverage
    assert dd.filter("year = 2025").count() == 365


def test_lookup_dims(gold):
    loader, _ = gold
    fp = loader.store.read("dim_fare_period")
    names = {r["fare_period_name"] for r in fp.collect()}
    assert "04 - PUNTA MANANA" in names
    assert "05 - TRANSICION PUNTA MANANA" in names
    purp = {r["purpose_name"] for r in loader.store.read("dim_purpose").collect()}
    assert purp == {"TRABAJO"}
    ops = {r["contract_code"] for r in loader.store.read("dim_operator_contract").collect()}
    assert "U1" in ops


def test_scd2_dim_stop(gold):
    loader, res = gold
    stop = loader.store.read("dim_stop")
    cur = stop.filter("is_current")
    # all fixture stops present once, current
    codes = {r["stop_code"] for r in cur.collect()}
    assert "T-4-19-SN-40" in codes and "PA001" in codes
    assert cur.count() == stop.count()  # single load date → no history yet
    # etapas load enriched the viajes-harvested stop with coords/comuna
    t = cur.filter("stop_code = 'T-4-19-SN-40'").collect()[0]
    assert t["comuna"] == "RECOLETA"
    assert t["x_utm"] == 347180


def test_fct_trip_grain_and_cash(gold):
    loader, res = gold
    ft = loader.store.read("fct_trip")
    # 4 valid trips, 1 is cash → 3 fact rows
    assert ft.count() == 3
    assert res["viajes"]["fct_trip"] == 3
    assert ft.filter("id_tarjeta IS NULL").count() == 0
    grain = ft.select("cut_sk", "id_tarjeta", "id_viaje").distinct().count()
    assert grain == 3
    row = ft.filter("id_tarjeta = 'CARD01'").collect()[0]
    assert row["origin_stop_sk"] is not None  # as-of resolved
    assert row["fare_period_start_sk"] is not None
    assert row["purpose_sk"] is not None


def test_fct_trip_leg_fk_and_empty_slots(gold, spark):
    loader, res = gold
    legs = loader.store.read("fct_trip_leg")
    # 3 card trips × 4 silver legs, minus empty slots:
    # CARD01/1: legs 1-2 real, 3-4 empty → but reference counts a slot
    # non-empty if mode/stop/ts present; fixture legs 3/4 are all NULL
    assert legs.filter("id_tarjeta = 'CARD01' AND id_viaje = '1'").count() == 2
    # FK joins back to fct_trip
    ft = loader.store.read("fct_trip")
    joined = legs.join(ft, "trip_sk", "inner")
    assert joined.count() == legs.count()
    lrow = legs.filter(
        "id_tarjeta = 'CARD01' AND id_viaje = '1' AND leg_seq = 1"
    ).collect()[0]
    assert lrow["mode_sk"] == 1  # BUS
    assert lrow["board_stop_sk"] is not None
    assert lrow["service_sk"] is not None


def test_fct_validation_grain(gold):
    loader, res = gold
    fv = loader.store.read("fct_validation")
    assert fv.count() == 3
    # duplicate id_etapa with different tiempo_subida → both present
    assert fv.filter("id_etapa = 'E001'").count() == 2
    row = fv.filter("id_etapa = 'E002'").collect()[0]
    assert row["mode_sk"] == 2  # METRO (int-coded input)
    assert row["operator_sk"] is not None  # COALESCE(contrato, operador)


def test_fct_boardings(gold):
    loader, res = gold
    fb = loader.store.read("fct_boardings_30m")
    assert fb.count() == 3
    assert res["subidas_30m"]["fct_boardings_30m"] == 3
    row = fb.filter("time_30m_sk = 36").collect()[0]
    assert row["month_date_sk"] == 20250401
    assert row["tipo_dia"] == "SABADO"


def test_idempotent_reload(gold):
    loader, _ = gold
    log = loader.store.read("etl_run_log")
    assert log.filter("status = 'OK'").count() == 3
    root = loader.lake_root
    parts = discover_partitions(root)
    # rerun without force → skip-if-OK short-circuits
    for p in parts:
        assert loader.run(p, root)["status"] == "SKIPPED"
    # forced rerun → MERGE inserts 0 new rows, counts unchanged
    before = loader.store.read("fct_trip").count()
    viajes = [p for p in parts if p.dataset == "viajes"][0]
    res = loader.run(viajes, root, force=True)
    assert res["status"] == "OK"
    assert res["fct_trip"] == 0 and res["fct_trip_leg"] == 0
    assert loader.store.read("fct_trip").count() == before


def test_scd2_change_creates_version(spark, tmp_path_factory):
    """Direct SCD2 unit: change attrs on a later date → expire+insert;
    same-day change → in-place; older event → skip."""
    from data_lakehouse_movilidad_publica_santiago_spark.gold.store import GoldStore

    store = GoldStore(spark, tmp_path_factory.mktemp("dw"))
    snap = spark.createDataFrame(
        [("S1", "SANTIAGO"), ("S2", "MAIPU")], "stop_code string, comuna string"
    ).withColumn("stop_name", F.lit(None).cast("string"))
    attrs = ["stop_name", "comuna"]
    c1 = D.scd2_upsert(store, "dim_stop", "stop_code", attrs, snap, date(2025, 4, 21), "stop_sk")
    assert c1 == {"inserted": 2, "expired": 0, "unchanged": 0}

    # same day, S1 enriched → in-place update, no new version
    snap2 = spark.createDataFrame(
        [("S1", "SANTIAGO", "Plaza")], "stop_code string, comuna string, stop_name string"
    )
    c2 = D.scd2_upsert(store, "dim_stop", "stop_code", attrs, snap2, date(2025, 4, 21), "stop_sk")
    assert c2 == {"inserted": 0, "expired": 0, "unchanged": 1}
    dim = store.read("dim_stop")
    assert dim.count() == 2
    s1 = dim.filter("stop_code = 'S1'").collect()[0]
    assert s1["stop_name"] == "Plaza" and s1["is_current"]

    # later date, S1 changes comuna → expire + new version
    snap3 = spark.createDataFrame(
        [("S1", "PROVIDENCIA", "Plaza")],
        "stop_code string, comuna string, stop_name string",
    )
    c3 = D.scd2_upsert(store, "dim_stop", "stop_code", attrs, snap3, date(2025, 4, 25), "stop_sk")
    assert c3 == {"inserted": 1, "expired": 1, "unchanged": 0}
    versions = store.read("dim_stop").filter("stop_code = 'S1'").orderBy("valid_from").collect()
    assert len(versions) == 2
    assert str(versions[0]["valid_to"]) == "2025-04-24"
    assert not versions[0]["is_current"]
    assert versions[1]["is_current"] and versions[1]["comuna"] == "PROVIDENCIA"

    # older event date → skip with warning semantics (unchanged)
    snap4 = spark.createDataFrame(
        [("S1", "NUNOA", "Plaza")], "stop_code string, comuna string, stop_name string"
    )
    c4 = D.scd2_upsert(store, "dim_stop", "stop_code", attrs, snap4, date(2025, 4, 1), "stop_sk")
    assert c4 == {"inserted": 0, "expired": 0, "unchanged": 1}
    assert store.read("dim_stop").filter("stop_code = 'S1'").count() == 2
