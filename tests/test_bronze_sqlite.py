"""Bronze ingest utilities + SQLite DW export."""

from __future__ import annotations

import sqlite3
import zipfile

import pytest

from data_lakehouse_movilidad_publica_santiago_spark.gold import GoldLoader
from data_lakehouse_movilidad_publica_santiago_spark.gold.sqlite_export import (
    export_gold_to_sqlite,
)
from data_lakehouse_movilidad_publica_santiago_spark.silver import run_silver
from data_lakehouse_movilidad_publica_santiago_spark.sources.bronze import (
    ingest_csv_partition,
    safe_extract_zip,
)
from data_lakehouse_movilidad_publica_santiago_spark.sources.catalog import (
    discover_partitions,
)

import dtpm_fixtures as fx


def test_ingest_csv_partition(spark, tmp_path):
    src = tmp_path / "src.csv"
    cols = ["Tipo_dia", "Modo", "Paradero", "Comuna", "Media_hora",
            "Subidas_Promedio"]  # fmt: skip
    src.write_text(
        "|".join(cols) + "\nLABORAL|Bus|PA1|SANTIAGO|0.5|1.0\n"
        "SABADO|Metro|PA2|NUNOA|0.25|2.0\n",
        encoding="utf-8",
    )
    lake = tmp_path / "lake"
    pdir = ingest_csv_partition(
        spark, [src], lake, "subidas_30m", "2025-05", 2025, 5, cols
    )
    parts = discover_partitions(lake)
    assert len(parts) == 1
    assert parts[0].meta_row_count == 2
    assert parts[0].csv_paths == [str(pdir / "src.csv")]


def test_safe_extract_rejects_traversal(tmp_path):
    z = tmp_path / "evil.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("../escape.txt", "x")
    with pytest.raises(ValueError, match="unsafe path"):
        safe_extract_zip(z, tmp_path / "out")
    ok = tmp_path / "ok.zip"
    with zipfile.ZipFile(ok, "w") as zf:
        zf.writestr("a/b.csv", "h|h\n1|2\n")
    files = safe_extract_zip(ok, tmp_path / "out2")
    assert files[0].read_text() == "h|h\n1|2\n"


@pytest.mark.slow  # 20-40 s; VERDICT r12 item 1 (default-run budget)
def test_sqlite_export(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("lake")
    fx.build_lake(root)
    loader = GoldLoader(spark, root / "gold")
    for p in discover_partitions(root):
        run_silver(spark, p, root)
        loader.run(p, root)

    db = root / "dw.db"
    counts = export_gold_to_sqlite(loader.store, db)
    assert counts["fct_trip"] == 3
    assert counts["dim_time_30m"] == 48

    con = sqlite3.connect(str(db))
    n = con.execute(
        "SELECT COUNT(*) FROM fct_trip ft "
        "JOIN dim_purpose dp ON dp.purpose_sk = ft.purpose_sk"
    ).fetchone()[0]
    assert n == 3
    # idempotent re-export: INSERT OR IGNORE on the grain
    counts2 = export_gold_to_sqlite(loader.store, db, tables=["fct_trip"])
    assert counts2["fct_trip"] == 0
    assert con.execute("SELECT COUNT(*) FROM fct_trip").fetchone()[0] == 3
    con.close()
