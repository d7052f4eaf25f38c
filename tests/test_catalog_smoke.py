"""Port of the reference's smoke-test suite spirit
(src/silver/tests_smoke.py:118-385): catalog integrity, schema
hygiene, contract thresholds, registry keys, CLI dry paths."""

from __future__ import annotations

import pytest

from data_lakehouse_movilidad_publica_santiago_spark import schemas
from data_lakehouse_movilidad_publica_santiago_spark.silver import (
    TRANSFORM_REGISTRY,
)
from data_lakehouse_movilidad_publica_santiago_spark.silver.common import (
    CONTRACT_FAIL_RATE,
    CONTRACT_SAMPLE_ROWS,
    CONTRACT_WARN_RATE,
)
from data_lakehouse_movilidad_publica_santiago_spark.sources.catalog import (
    discover_partitions,
)

import dtpm_fixtures as fx


@pytest.fixture(scope="module")
def lake(tmp_path_factory):
    root = tmp_path_factory.mktemp("lake")
    fx.build_lake(root)
    return root


# ── catalog tests (reference: ≥N partitions, 3 datasets, no empty
#    cols, spec format, row counts) ─────────────────────────────────


def test_catalog_partition_count(lake):
    parts = discover_partitions(lake)
    assert len(parts) == 3


def test_catalog_three_datasets(lake):
    parts = discover_partitions(lake)
    assert [p.dataset for p in parts] == ["viajes", "etapas", "subidas_30m"]


def test_catalog_no_empty_columns_after_clean():
    cleaned = schemas.clean_columns(schemas.VIAJES_RAW_COLUMNS)
    assert "" not in cleaned
    assert len(cleaned) == 100  # 101 raw minus the trailing empty name


def test_catalog_schema_arity_matches_raw():
    # the physical schema must keep the raw arity (empty→placeholder)
    s = schemas.all_varchar_schema(schemas.VIAJES_RAW_COLUMNS)
    assert len(s.fields) == 101
    assert all(f.dataType.typeName() == "string" for f in s.fields)
    assert s.fields[-1].name.startswith("_empty_")


def test_catalog_row_counts(lake):
    by_ds = {p.dataset: p for p in discover_partitions(lake)}
    assert by_ds["viajes"].meta_row_count == 11
    assert by_ds["etapas"].meta_row_count == 11
    assert by_ds["subidas_30m"].meta_row_count == 8


def test_catalog_filters(lake):
    assert len(discover_partitions(lake, dataset="viajes")) == 1
    assert len(discover_partitions(lake, cut="2025-04")) == 1
    assert discover_partitions(lake, dataset="nope") == []


def test_partition_csv_discovery(lake):
    p = discover_partitions(lake, dataset="viajes")[0]
    assert len(p.csv_paths) == 1
    assert p.csv_paths[0].endswith(".csv")


def test_partition_missing_csv_raises(lake, tmp_path):
    from data_lakehouse_movilidad_publica_santiago_spark.sources.catalog import (
        CutPartition,
    )

    empty = tmp_path / "empty"
    empty.mkdir()
    p = CutPartition("viajes", 2025, 4, "x", empty)
    with pytest.raises(FileNotFoundError):
        _ = p.csv_paths


# ── thresholds & registry (reference: threshold sanity, registry keys) ──


def test_contract_thresholds_sane():
    assert 0 < CONTRACT_WARN_RATE < CONTRACT_FAIL_RATE < 1
    assert CONTRACT_WARN_RATE == 0.01 and CONTRACT_FAIL_RATE == 0.05
    assert CONTRACT_SAMPLE_ROWS == 10_000


def test_transform_registry_keys():
    assert set(TRANSFORM_REGISTRY) == {"viajes", "etapas", "subidas_30m"}
    assert set(schemas.RAW_COLUMNS) == set(TRANSFORM_REGISTRY)


def test_raw_column_counts():
    assert len(schemas.VIAJES_RAW_COLUMNS) == 101
    assert len(schemas.ETAPAS_RAW_COLUMNS) == 35
    assert len(schemas.SUBIDAS_RAW_COLUMNS) == 6


# ── CLI dry paths (reference: 3 CLI dry-run tests) ──────────────────


def test_cli_no_partitions(tmp_path):
    from data_lakehouse_movilidad_publica_santiago_spark.cli import main

    assert main(["silver", "--lake", str(tmp_path)]) == 1
    assert main(["gold", "--lake", str(tmp_path)]) == 1


def test_cli_bad_subcommand():
    from data_lakehouse_movilidad_publica_santiago_spark.cli import main

    with pytest.raises(SystemExit):
        main(["frobnicate"])
