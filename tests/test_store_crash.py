"""Crash-safety evidence for the parquet MERGE path (gold/store.py).

The env has no Delta/Iceberg transaction log, so fact atomicity rests
on the parquet job committer: task outputs stage under ``_temporary/``
and publish only at JOB commit (FileOutputCommitter v1 semantics).
These tests inject a task failure MID-APPEND and assert the two
guarantees the reference's idempotent loader
(`/root/reference/src/gold/load_gold.py:1775-1785` skip-if-OK)
depends on:

1. readers never see a partial batch (no torn appends, no grain dups);
2. re-running the same merge after the crash converges to exactly one
   copy of every row.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from data_lakehouse_movilidad_publica_santiago_spark.gold.store import GoldStore


def _batch(spark, lo, hi, poison_at=None):
    """Rows (k, val) for k in [lo, hi); if ``poison_at`` is set, the
    writing task covering that k raises after other tasks have rows —
    the mid-write crash injection."""
    df = spark.range(lo, hi, 1, 4)  # 4 partitions → several write tasks

    def maybe_boom(v):
        # nested (not module-level) so cloudpickle ships it whole
        if poison_at is not None and v == poison_at:
            raise RuntimeError("injected mid-append failure")
        return v

    boom = F.udf(maybe_boom, LongType())
    return df.select(boom(F.col("id")).alias("k"), F.lit("v").alias("val"))


def test_mid_append_crash_is_invisible_and_rerun_converges(spark, tmp_path):
    store = GoldStore(spark, tmp_path)
    assert store.merge_insert(_batch(spark, 0, 100), "fct", ["k"]) == 100
    assert store.read("fct").count() == 100

    with pytest.raises(Exception, match="injected|Job aborted"):
        store.merge_insert(_batch(spark, 100, 200, poison_at=150), "fct", ["k"])

    # 1. the aborted job is invisible: same rows, no partials, no dups
    got = store.read("fct")
    assert got.count() == 100
    assert got.agg(F.max("k")).collect()[0][0] == 99
    assert got.groupBy("k").count().filter("count > 1").count() == 0

    # 2. a clean re-run of the SAME logical batch converges
    assert store.merge_insert(_batch(spark, 100, 200), "fct", ["k"]) == 100
    got = store.read("fct")
    assert got.count() == 200
    assert got.groupBy("k").count().filter("count > 1").count() == 0


def test_crash_on_initial_load_leaves_no_table(spark, tmp_path):
    store = GoldStore(spark, tmp_path)
    with pytest.raises(Exception, match="injected|Job aborted"):
        store.merge_insert(_batch(spark, 0, 100, poison_at=50), "fct", ["k"])
    # no part-file ever published → table still "does not exist" and a
    # retry takes the fast initial-load path
    assert not store.exists("fct")
    assert store.merge_insert(_batch(spark, 0, 100), "fct", ["k"]) == 100
    assert store.read("fct").count() == 100


def test_matched_rerun_counts_zero_without_caching(spark, tmp_path):
    # the observe-metric count: a fully-matched re-run reports 0 and
    # leaves the DATA untouched — at most one 0-row schema-marker
    # part-file appears (documented in merge_insert)
    store = GoldStore(spark, tmp_path)
    assert store.merge_insert(_batch(spark, 0, 50), "fct", ["k"]) == 50
    before = set((tmp_path / "fct").rglob("*.parquet"))
    assert store.merge_insert(_batch(spark, 0, 50), "fct", ["k"]) == 0
    new_files = set((tmp_path / "fct").rglob("*.parquet")) - before
    assert len(new_files) <= 1
    for f in new_files:  # any new file must hold zero rows
        assert spark.read.parquet(str(f)).count() == 0
    got = store.read("fct")
    assert got.count() == 50
    assert got.groupBy("k").count().filter("count > 1").count() == 0
