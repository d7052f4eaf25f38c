"""The gold pipeline on the transactional store must produce EXACTLY
the tables the plain-parquet store produces — same fixture lake run
through both, every table content-equal — plus the ACID extras (commit
history, time travel to the pre-load state, idempotent re-run)."""

from __future__ import annotations

import pytest

from data_lakehouse_movilidad_publica_santiago_spark.gold import GoldLoader
from data_lakehouse_movilidad_publica_santiago_spark.gold.txn_store import (
    TxnGoldStore,
)
from data_lakehouse_movilidad_publica_santiago_spark.lake import TxnTable
from data_lakehouse_movilidad_publica_santiago_spark.silver import run_silver
from data_lakehouse_movilidad_publica_santiago_spark.sources.catalog import (
    discover_partitions,
)

import dtpm_fixtures as fx

TABLES = [
    "dim_date",
    "dim_time_30m",
    "dim_mode",
    "dim_stop",
    "dim_service",
    "dim_operator_contract",
    "dim_fare_period",
    "dim_purpose",
    "fct_trip",
    "fct_trip_leg",
    "fct_boarding_30m",
    "fct_validation",
]


@pytest.fixture(scope="module")
def both(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("lake_txn_parity")
    fx.build_lake(root)
    parts = discover_partitions(root)
    for p in parts:
        run_silver(spark, p, root)
    plain = GoldLoader(spark, root / "gold_plain")
    txn = GoldLoader(
        spark, root / "gold_txn", store=TxnGoldStore(spark, root / "gold_txn")
    )
    plain_res = {p.dataset: plain.run(p, root) for p in parts}
    txn_res = {p.dataset: txn.run(p, root) for p in parts}
    return plain, txn, plain_res, txn_res, parts, root


def _rows(df):
    # repr-stringify so NULLs sort deterministically against values
    return sorted(
        tuple(repr(v) for v in r)
        for r in df.select(sorted(df.columns)).collect()
    )


@pytest.mark.slow  # 20-40 s; VERDICT r12 item 1 (default-run budget)
def test_every_gold_table_identical(both):
    plain, txn, *_ = both
    for table in TABLES:
        if not plain.store.exists(table):
            assert not txn.store.exists(table), table
            continue
        a = plain.store.read(table)
        b = txn.store.read(table)
        assert sorted(a.columns) == sorted(b.columns), table
        assert _rows(a) == _rows(b), f"{table} content differs"


def test_load_results_match(both):
    _, _, plain_res, txn_res, *_ = both
    for ds in plain_res:
        assert plain_res[ds]["status"] == txn_res[ds]["status"] == "OK"
        assert (
            plain_res[ds].get("rows_inserted")
            == txn_res[ds].get("rows_inserted")
        ), ds


def test_txn_rerun_is_skipped_and_appends_nothing(both):
    _, txn, _, _, parts, root = both
    fct = TxnTable(txn.spark, txn.store.path("fct_trip"))
    v_before = fct.latest_version()
    n_before = fct.read().count()
    for p in parts:
        assert txn.run(p, root)["status"] == "SKIPPED"
    assert fct.latest_version() == v_before  # not even a no-op commit
    assert fct.read().count() == n_before


def test_txn_gold_time_travel_to_preload(both):
    """Version 0 of a fact table is its first cut's load — earlier
    states stay queryable after later cuts/merges land."""
    _, txn, *_ = both
    fct = TxnTable(txn.spark, txn.store.path("fct_trip"))
    head = fct.latest_version()
    assert head is not None
    v0 = fct.read(version=0).count()
    assert 0 < v0 <= fct.read().count()


def test_txn_gold_history_ops(both):
    _, txn, *_ = both
    ops = {h["op"] for h in TxnTable(txn.spark, txn.store.path("dim_stop")).history()}
    assert "overwrite" in ops or "append" in ops


@pytest.mark.slow  # 20-40 s; VERDICT r12 item 1 (default-run budget)
def test_stream_gold_into_txn_store(spark, tmp_path_factory):
    """The streaming loader on the transactional backend: streamed gold
    equals batch gold table-by-table, and a fresh-checkpoint re-stream
    (re-delivering every cut) adds neither run-log rows nor commits."""
    from data_lakehouse_movilidad_publica_santiago_spark.streaming.gold_stream import (
        stream_gold,
    )

    root = tmp_path_factory.mktemp("txn_stream_lake")
    fx.build_lake(root)
    work = tmp_path_factory.mktemp("txn_stream_work")
    gold_s, gold_b = work / "gold_s", work / "gold_b"

    q = stream_gold(
        spark, root, gold_s, work / "ckpt",
        store=TxnGoldStore(spark, gold_s),
    )
    q.awaitTermination(300)

    batch = GoldLoader(spark, gold_b, store=TxnGoldStore(spark, gold_b))
    for p in discover_partitions(root, dataset="viajes"):
        run_silver(spark, p, root)
        batch.run(p, root)

    s_store, b_store = TxnGoldStore(spark, gold_s), TxnGoldStore(spark, gold_b)
    for table in ("dim_stop", "fct_trip", "fct_trip_leg", "dim_date"):
        a, b = s_store.read(table), b_store.read(table)
        assert sorted(a.columns) == sorted(b.columns), table
        assert _rows(a) == _rows(b), f"{table} stream != batch"

    fct = TxnTable(spark, gold_s / "fct_trip")
    v = fct.latest_version()
    n_log = s_store.read("etl_run_log").count()
    # re-stream from a FRESH checkpoint: every cut re-delivered, every
    # cut skipped by the run log -> zero new commits anywhere
    q2 = stream_gold(
        spark, root, gold_s, work / "ckpt2",
        store=TxnGoldStore(spark, gold_s),
    )
    q2.awaitTermination(300)
    assert TxnTable(spark, gold_s / "fct_trip").latest_version() == v
    assert s_store.read("etl_run_log").count() == n_log


def test_cli_maintain_compacts_and_vacuums(spark, tmp_path):
    """`maintain --gold-dir` OPTIMIZEs the small-file tail and VACUUMs
    history on every txn table under the gold root."""
    import json as _json

    from data_lakehouse_movilidad_publica_santiago_spark import cli

    gold = tmp_path / "gold"
    t = TxnTable(spark, gold / "fct_demo")
    for i in range(5):
        t.append(
            spark.createDataFrame([(i, f"r{i}")], "k int, v string")
            .coalesce(1)
        )
    t.overwrite(spark.createDataFrame([(9, "z")], "k int, v string"))
    (gold / "not_a_table").mkdir()  # ignored: no _txn_log

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli.main(
            ["maintain", "--gold-dir", str(gold),
             "--retain-versions", "1", "--vacuum-min-age-hours", "0"]
        )
    assert rc == 0
    out = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert "fct_demo" in out and "not_a_table" not in out
    assert out["fct_demo"]["vacuumed_files"] >= 1  # pre-overwrite files
    final = TxnTable(spark, gold / "fct_demo").read().collect()
    assert [(r["k"], r["v"]) for r in final] == [(9, "z")]
