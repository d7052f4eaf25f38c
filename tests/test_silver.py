"""Silver pipeline behavioral parity tests (reference test strategy,
SURVEY §5): quarantine precedence, leg unpivot semantics, SK
derivations, count assertions, quality.json shape."""

from __future__ import annotations

import json

import pytest

from data_lakehouse_movilidad_publica_santiago_spark.silver import run_silver
from data_lakehouse_movilidad_publica_santiago_spark.sources.catalog import (
    discover_partitions,
)

import dtpm_fixtures as fx


@pytest.fixture(scope="module")
def lake(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("lake")
    fx.build_lake(root)
    stats = {}
    for p in discover_partitions(root):
        stats[p.dataset] = run_silver(spark, p, root)
    return root, stats


def _read(spark, root, dataset, cut, name):
    return spark.read.parquet(
        f"{root}/processed/dtpm/dataset={dataset}/year=2025/month=04/cut={cut}/{name}"
    )


def _quarantine(spark, root, dataset, cut):
    return spark.read.parquet(
        f"{root}/processed/_quarantine/dataset={dataset}/year=2025/month=04/"
        f"cut={cut}/invalid.parquet"
    )


# ── viajes ──────────────────────────────────────────────────────────


def test_viajes_counts(lake, spark):
    root, stats = lake
    s = stats["viajes"]
    assert s["read_row_count"] == 11
    assert s["valid_row_count"] == 4  # incl. the cash trip
    assert s["invalid_row_count"] == 7
    assert s["count_assertion"] == "PASS"


def test_viajes_quarantine_reasons(lake, spark):
    root, _ = lake
    inv = _quarantine(spark, root, "viajes", fx.CUT_VIAJES)
    reasons = {
        (r["id_viaje"] or ""): r["reason_code"] for r in inv.collect()
    }
    assert reasons[""] == "MISSING_ID"
    assert reasons["4"] == "MISSING_TIMESTAMP"
    assert reasons["5"] == "BAD_RANGE_N_ETAPAS"
    assert reasons["6"] == "NEG_DISTANCE"
    assert reasons["7"] == "NEG_DISTANCE"
    assert reasons["8"] == "NEG_DISTANCE"
    # ordered precedence: n_etapas=0 AND negative distance → FIRST rule
    assert reasons["9"] == "BAD_RANGE_N_ETAPAS"


def test_viajes_trip_schema_and_sks(lake, spark):
    root, _ = lake
    trips = _read(spark, root, "viajes", fx.CUT_VIAJES, "viajes_trip.parquet")
    assert len(trips.columns) == 27
    row = trips.filter("id_viaje = '1' AND id_tarjeta = 'CARD01'").collect()[0]
    assert row["tipo_dia"] == "LABORAL"
    assert row["proposito"] == "TRABAJO"
    assert row["date_start_sk"] == 20250421
    assert row["time_start_30m_sk"] == 17  # 08:48 → slot 17
    assert row["time_end_30m_sk"] == 18  # 09:10 → slot 18
    assert row["tviaje_min"] == 22.9
    # evening trip slot: 18:05 → 36
    evening = trips.filter("id_tarjeta = 'CARD02' AND id_viaje = '1'").collect()[0]
    assert evening["time_start_30m_sk"] == 36


def test_viajes_leg_unpivot(lake, spark):
    root, _ = lake
    legs = _read(spark, root, "viajes", fx.CUT_VIAJES, "viajes_leg.parquet")
    # reference semantics: ELSE 'UNKNOWN' mode ⇒ every valid trip emits 4 legs
    assert legs.count() == 16
    assert len(legs.columns) == 23
    one = {
        r["leg_seq"]: r
        for r in legs.filter("id_viaje = '1' AND id_tarjeta = 'CARD01'").collect()
    }
    assert one[1]["mode_code"] == "BUS"
    assert one[2]["mode_code"] == "METRO"
    assert one[3]["mode_code"] is None  # UNKNOWN → NULL
    assert one[1]["service_code"] == "T203 00R"
    assert one[1]["time_board_30m_sk"] == 17
    assert one[2]["date_board_sk"] == 20250421
    # tc/te only for legs 1..3; leg 4 forced NULL
    assert one[1]["tc_transfer_min"] == 1.2
    assert one[4]["tc_transfer_min"] is None
    assert one[4]["te_wait_min"] is None


# ── etapas ──────────────────────────────────────────────────────────


def test_etapas_counts_and_reasons(lake, spark):
    root, stats = lake
    s = stats["etapas"]
    assert s["read_row_count"] == 11
    assert s["valid_row_count"] == 3
    assert s["invalid_row_count"] == 8
    inv = _quarantine(spark, root, "etapas", fx.CUT_ETAPAS)
    reasons = {(r["id_etapa"] or ""): r["reason_code"] for r in inv.collect()}
    assert reasons[""] == "MISSING_ID"
    assert reasons["E003"] == "MISSING_TIMESTAMP"
    assert reasons["E004"] == "BAD_BOOLEAN"
    assert reasons["E005"] == "BAD_UTM_X"
    assert reasons["E006"] == "BAD_UTM_Y"
    assert reasons["E007"] == "BAD_UTM_X"
    assert reasons["E008"] == "NEG_DISTANCE"
    # precedence: BAD_BOOLEAN before BAD_UTM_X
    assert reasons["E009"] == "BAD_BOOLEAN"


def test_etapas_int_or_text_codes(lake, spark):
    root, _ = lake
    ev = _read(spark, root, "etapas", fx.CUT_ETAPAS, "etapas_validation.parquet")
    rows = {
        (r["id_etapa"], str(r["tiempo_subida"])): r for r in ev.collect()
    }
    text = rows[("E001", "2025-04-21 08:48:04")]
    coded = rows[("E002", "2025-04-21 08:48:04")]
    assert text["tipo_dia"] == "LABORAL" and text["tipo_transporte"] == "BUS"
    assert coded["tipo_dia"] == "LABORAL" and coded["tipo_transporte"] == "METRO"
    assert text["tiene_bajada"] is True
    # duplicate id_etapa with distinct tiempo_subida both survive
    assert ("E001", "2025-04-21 09:15:00") in rows


# ── subidas_30m ─────────────────────────────────────────────────────


def test_subidas_counts_and_slots(lake, spark):
    root, stats = lake
    s = stats["subidas_30m"]
    assert s["read_row_count"] == 8
    assert s["prefiltered_row_count"] == 1  # NULL Media_hora
    assert s["valid_row_count"] == 3
    assert s["invalid_row_count"] == 4
    sv = _read(spark, root, "subidas_30m", fx.CUT_SUBIDAS, "subidas_30m.parquet")
    rows = {r["stop_code"]: r for r in sv.collect()}
    assert rows["PA001"]["time_30m_sk"] == 16  # 1/3 day = 08:00
    assert rows["PA001"]["media_hora_time"] == "08:00:00"
    assert rows["PA002"]["time_30m_sk"] == 36  # 0.75 = 18:00
    assert rows["PA002"]["media_hora_time"] == "18:00:00"
    assert rows["PA003"]["mode_code"] == "ZP"


def test_subidas_quarantine(lake, spark):
    root, _ = lake
    inv = _quarantine(spark, root, "subidas_30m", fx.CUT_SUBIDAS)
    reasons = {(r["stop_code"] or ""): r["reason_code"] for r in inv.collect()}
    assert reasons[""] == "MISSING_ID"
    assert reasons["PA004"] == "BAD_TIME_SLOT"  # frac 1.5 → slot 72
    assert reasons["PA005"] == "NEG_DISTANCE"  # negative
    assert reasons["PA006"] == "NEG_DISTANCE"  # null


# ── quality.json ────────────────────────────────────────────────────


def test_quality_json_written(lake):
    root, stats = lake
    p = (
        root
        / "processed"
        / "_quality"
        / "dataset=viajes"
        / "year=2025"
        / "month=04"
        / f"cut={fx.CUT_VIAJES}"
        / "quality.json"
    )
    doc = json.loads(p.read_text())
    assert doc["count_assertion"] == "PASS"
    assert doc["valid_row_count"] == 4
    dist = {d["_reason_code"]: d["cnt"] for d in doc["quarantine_reason_distribution"]}
    assert dist["NEG_DISTANCE"] == 3
    assert doc["contract_sample_validation"]["status"] == "OK"
