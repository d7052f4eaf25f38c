"""Store swap-contract: the five-method surface every gold backend
must honor, run identically over the plain-parquet ``GoldStore`` and
the transactional ``TxnGoldStore``.

This is the seam a real Delta/Iceberg backend drops into (the env
ships neither jar). The exact Delta Lake mapping, so a jar-present
environment can implement a ``DeltaGoldStore`` without touching any
caller:

| contract method              | Delta Lake equivalent                                  |
|------------------------------|--------------------------------------------------------|
| ``exists(t)``                | ``DeltaTable.isDeltaTable(spark, path)``               |
| ``read(t)``                  | ``spark.read.format("delta").load(path)``              |
| ``overwrite(df, t)``         | ``df.write.format("delta").mode("overwrite")``         |
| ``append(df, t, parts)``     | ``df.write.format("delta").mode("append")``            |
|                              | (``partitionBy(parts)`` on first write)                |
| ``merge_insert(df, t, g,``   | ``DeltaTable.merge(df, AND(g_i <=> s.g_i))``           |
| ``  parts, prune)``          | ``  .whenNotMatchedInsertAll().execute()``;            |
|                              | ``prune`` becomes extra partition predicates ANDed     |
|                              | into the merge condition (Delta prunes files from      |
|                              | them); insert count from operationMetrics              |
|                              | ``numTargetRowsInserted``                              |
| ``TxnTable.read_version(v)`` | ``spark.read.format("delta").option("versionAsOf", v)``|

Note the ``<=>`` (eqNullSafe) in the merge condition: the contract
treats NULL grain values as equal, like a unique index would — plain
``=`` would re-insert NULL-keyed rows on every run.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lakehouse_movilidad_publica_santiago_spark.gold.store import GoldStore
from data_lakehouse_movilidad_publica_santiago_spark.gold.txn_store import (
    TxnGoldStore,
)


@pytest.fixture(params=["parquet", "txn"])
def store(request, spark, tmp_path):
    cls = {"parquet": GoldStore, "txn": TxnGoldStore}[request.param]
    return cls(spark, tmp_path / f"gold_{request.param}")


def _df(spark, rows):
    return spark.createDataFrame(rows, "k bigint, cut_sk int, v string")


def _collect(store, table):
    return sorted(
        (r["k"], r["cut_sk"], r["v"]) for r in store.read(table).collect()
    )


def test_exists_lifecycle(store, spark):
    assert not store.exists("tbl")
    store.append(_df(spark, [(1, 10, "a")]), "tbl")
    assert store.exists("tbl")


def test_append_accumulates(store, spark):
    store.append(_df(spark, [(1, 10, "a")]), "tbl")
    store.append(_df(spark, [(2, 10, "b")]), "tbl")
    assert _collect(store, "tbl") == [(1, 10, "a"), (2, 10, "b")]


def test_overwrite_replaces_fully(store, spark):
    store.append(_df(spark, [(1, 10, "a"), (2, 10, "b")]), "tbl")
    store.overwrite(_df(spark, [(3, 11, "c")]), "tbl")
    assert _collect(store, "tbl") == [(3, 11, "c")]


def test_merge_insert_only_unmatched(store, spark):
    n = store.merge_insert(
        _df(spark, [(1, 10, "a"), (2, 10, "b")]), "tbl", grain=["k", "cut_sk"]
    )
    assert n == 2
    # one old key, one new key: only the new row lands
    n = store.merge_insert(
        _df(spark, [(2, 10, "B-changed"), (3, 10, "c")]),
        "tbl",
        grain=["k", "cut_sk"],
    )
    assert n == 1
    assert _collect(store, "tbl") == [(1, 10, "a"), (2, 10, "b"), (3, 10, "c")]


def test_merge_insert_idempotent_rerun(store, spark):
    batch = _df(spark, [(1, 10, "a"), (2, 10, "b")])
    assert store.merge_insert(batch, "tbl", grain=["k", "cut_sk"]) == 2
    assert store.merge_insert(batch, "tbl", grain=["k", "cut_sk"]) == 0
    assert _collect(store, "tbl") == [(1, 10, "a"), (2, 10, "b")]


def test_merge_insert_null_grain_matches(store, spark):
    rows = [(None, 10, "n")]
    df = spark.createDataFrame(rows, "k bigint, cut_sk int, v string")
    assert store.merge_insert(df, "tbl", grain=["k", "cut_sk"]) == 1
    # NULL <=> NULL must match (unique-index semantics) — no re-insert
    assert store.merge_insert(df, "tbl", grain=["k", "cut_sk"]) == 0
    assert store.read("tbl").count() == 1


def test_merge_insert_pruned_equals_unpruned(store, spark):
    """prune is a performance hint (partition/file skipping), never a
    semantics change: the grain contains the prune column, so rows in
    other partitions can't match anyway."""
    store.merge_insert(
        _df(spark, [(1, 10, "a"), (2, 11, "b")]),
        "tbl",
        grain=["k", "cut_sk"],
        partition_cols=["cut_sk"],
        prune={"cut_sk": [10, 11]},
    )
    n = store.merge_insert(
        _df(spark, [(1, 10, "dup"), (3, 11, "c")]),
        "tbl",
        grain=["k", "cut_sk"],
        partition_cols=["cut_sk"],
        prune={"cut_sk": [10, 11]},
    )
    assert n == 1
    assert _collect(store, "tbl") == [(1, 10, "a"), (2, 11, "b"), (3, 11, "c")]


def test_read_after_partitioned_append(store, spark):
    store.append(
        _df(spark, [(1, 10, "a"), (2, 11, "b")]), "tbl",
        partition_cols=["cut_sk"],
    )  # fmt: skip
    got = store.read("tbl").select("k", "cut_sk", "v")
    assert sorted(map(tuple, got.collect())) == [(1, 10, "a"), (2, 11, "b")]


def test_loader_runs_on_either_backend(store, spark, tmp_path):
    """The seam the swap rests on: GoldLoader takes any contract
    implementation; the full-pipeline parity is pinned separately by
    tests/test_txn_gold_parity.py."""
    from data_lakehouse_movilidad_publica_santiago_spark.gold import GoldLoader

    loader = GoldLoader(spark, tmp_path / "gold_any", store=store)
    assert loader.store is store
