"""End-to-end streaming gold (streaming/gold_stream.py): bronze file
arrival → silver → gold merge inside foreachBatch, with the run-log
skip making checkpoint replays no-ops.

Asserted: (1) streaming gold == batch-runner gold on the same cuts,
table by table; (2) a restart with the same checkpoint re-loads
nothing (run-log SKIP parity) but picks up a newly-landed cut; the
new cut's gold still equals a fresh batch run over all cuts.
"""

from __future__ import annotations

from pathlib import Path

import pytest

import dtpm_fixtures as fx
from data_lakehouse_movilidad_publica_santiago_spark.gold.runner import GoldLoader
from data_lakehouse_movilidad_publica_santiago_spark.schemas import (
    VIAJES_RAW_COLUMNS,
)
from data_lakehouse_movilidad_publica_santiago_spark.silver.runner import run_silver
from data_lakehouse_movilidad_publica_santiago_spark.sources.catalog import (
    discover_partitions,
    write_meta,
)
from data_lakehouse_movilidad_publica_santiago_spark.streaming.gold_stream import (
    stream_gold,
)

GOLD_TABLES = [
    "dim_date", "dim_time_30m", "dim_mode", "dim_stop", "dim_service",
    "dim_fare_period", "dim_purpose", "dim_operator_contract", "dim_cut",
    "fct_trip", "fct_trip_leg",
]  # fmt: skip


def _write_viajes_cut(root: Path, cut: str, rows) -> None:
    pdir = (
        root / "raw" / "dtpm" / "dataset=viajes" / "year=2025" / "month=04"
        / f"cut={cut}"
    )
    pdir.mkdir(parents=True, exist_ok=True)
    lines = ["|".join(VIAJES_RAW_COLUMNS)] + [
        fx._row(VIAJES_RAW_COLUMNS, r) for r in rows
    ]
    (pdir / f"{cut}.viajes.csv").write_text("\n".join(lines) + "\n", "utf-8")
    write_meta(pdir, "viajes", cut, 2025, 4, VIAJES_RAW_COLUMNS, len(rows))


def _second_cut_rows():
    return [
        fx._viajes_valid(
            "1", id_tarjeta="CARD09", start="2025-04-22 07:30:00"
        ),
        fx._viajes_valid("2", id_tarjeta="CARD10", n_etapas="1"),
    ]


def _third_cut_rows():
    return [
        fx._viajes_valid("1", id_tarjeta="CARD11", start="2025-04-23 09:00:00"),
    ]


def _table_rows(spark, gold_root: Path, table: str):
    df = spark.read.parquet(str(gold_root / table))
    cols = sorted(df.columns)
    return sorted(repr([r[c] for c in cols]) for r in df.collect()), cols


def _batch_load(spark, lake: Path, gold: Path) -> None:
    loader = GoldLoader(spark, gold)
    for p in discover_partitions(lake, dataset="viajes"):
        run_silver(spark, p, lake)
        loader.run(p, lake)


@pytest.fixture(scope="module")
def two_cut_lake(tmp_path_factory):
    root = tmp_path_factory.mktemp("stream_gold_lake")
    fx.build_lake(root)
    _write_viajes_cut(root, "2025-04-22", _second_cut_rows())
    return root


@pytest.mark.slow  # 20-40 s; VERDICT r12 item 1 (default-run budget)
def test_stream_gold_equals_batch_gold(spark, two_cut_lake, tmp_path_factory):
    work = tmp_path_factory.mktemp("sg_work")
    gold_stream_dir, gold_batch_dir = work / "gold_s", work / "gold_b"
    ckpt = work / "ckpt"

    q = stream_gold(spark, two_cut_lake, gold_stream_dir, ckpt)
    q.awaitTermination(300)

    _batch_load(spark, two_cut_lake, gold_batch_dir)

    for table in GOLD_TABLES:
        s_rows, s_cols = _table_rows(spark, gold_stream_dir, table)
        b_rows, b_cols = _table_rows(spark, gold_batch_dir, table)
        assert s_cols == b_cols, f"{table}: schema drift"
        assert s_rows == b_rows, f"{table}: data drift"

    # both cuts loaded exactly once, by the same code path
    log = spark.read.parquet(str(gold_stream_dir / "etl_run_log"))
    assert log.count() == 2
    assert {r["status"] for r in log.collect()} == {"OK"}


@pytest.mark.slow  # ~70 s restart replay; VERDICT r12 item 1
def test_stream_restart_skips_loaded_cuts_and_picks_up_new(
    spark, two_cut_lake, tmp_path_factory
):
    work = tmp_path_factory.mktemp("sg_restart")
    gold_dir, ckpt = work / "gold", work / "ckpt"

    q = stream_gold(spark, two_cut_lake, gold_dir, ckpt)
    q.awaitTermination(300)
    log1 = spark.read.parquet(str(gold_dir / "etl_run_log"))
    assert log1.count() == 2

    # a third cut lands; restart the stream on the SAME checkpoint
    _write_viajes_cut(two_cut_lake, "2025-04-23", _third_cut_rows())
    try:
        q2 = stream_gold(spark, two_cut_lake, gold_dir, ckpt)
        q2.awaitTermination(300)

        # only the new cut produced a run-log row: the checkpoint never
        # re-delivered cuts 1-2, and even a replay would hit the
        # run-log skip (exercised below by a forced re-stream)
        log2 = spark.read.parquet(str(gold_dir / "etl_run_log"))
        assert log2.count() == 3
        assert log2.filter("cut = '2025-04-23'").count() == 1

        # fresh-checkpoint re-stream re-delivers EVERY cut: all three
        # must come back SKIPPED via the run log, gold unchanged
        before = {
            t: _table_rows(spark, gold_dir, t)[0] for t in GOLD_TABLES
        }
        q3 = stream_gold(spark, two_cut_lake, gold_dir, work / "ckpt2")
        q3.awaitTermination(300)
        log3 = spark.read.parquet(str(gold_dir / "etl_run_log"))
        assert log3.count() == 3  # no new rows: every cut skipped
        for t in GOLD_TABLES:
            assert _table_rows(spark, gold_dir, t)[0] == before[t], t

        # and the stream-built gold equals a fresh batch run on 3 cuts
        gold_batch_dir = work / "gold_b3"
        _batch_load(spark, two_cut_lake, gold_batch_dir)
        for t in GOLD_TABLES:
            assert (
                _table_rows(spark, gold_dir, t)[0]
                == _table_rows(spark, gold_batch_dir, t)[0]
            ), t
    finally:
        # leave the module-scoped lake without the third cut for any
        # later test ordering
        import shutil

        shutil.rmtree(
            two_cut_lake
            / "raw/dtpm/dataset=viajes/year=2025/month=04/cut=2025-04-23",
            ignore_errors=True,
        )
