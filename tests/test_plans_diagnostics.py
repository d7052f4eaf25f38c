"""Plan-quality assertions (the 100 TB posture, testable) + gold load
diagnostics report."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lakehouse_movilidad_publica_santiago_spark.analytics import inventory
from data_lakehouse_movilidad_publica_santiago_spark.plans import (
    has_broadcast_hash_join,
    has_nested_loop_join,
    pushed_filters,
    scan_read_schema,
)

from conftest import SF_CORRECTNESS


def test_filter_pushdown_reaches_scan(spark):
    """The flagship's shipdate filter must appear in PushedFilters."""
    df = inventory.q_pricing_summary(spark, SF_CORRECTNESS)
    pf = pushed_filters(df)
    assert any("l_shipdate" in f for f in pf), pf


def test_column_pruning(spark):
    """pricing_summary reads only the 7 needed lineitem columns."""
    df = inventory.q_pricing_summary(spark, SF_CORRECTNESS)
    cols = set(scan_read_schema(df))
    assert "l_shipdate" in cols and "l_quantity" in cols
    assert "l_partkey" not in cols and "l_suppkey" not in cols


def test_star_join_broadcasts_dims(spark):
    df = inventory.q_star_join_revenue(spark, SF_CORRECTNESS)
    assert has_broadcast_hash_join(df)


def test_asof_join_is_hash_not_nested_loop(spark):
    """The SCD2 as-of join has an equi BK → must plan as a hash join,
    never BroadcastNestedLoopJoin (SURVEY §4 join-strategy row)."""
    df = inventory.q_asof_resolve(spark, SF_CORRECTNESS)
    assert has_broadcast_hash_join(df)
    assert not has_nested_loop_join(df)


def test_cosine_topk_is_take_ordered(spark):
    """Global top-k must plan as TakeOrderedAndProject (per-partition
    local top-k), never a single-partition global-window sort."""
    from data_lakehouse_movilidad_publica_santiago_spark.analytics import (
        inventory_llm,
    )
    from data_lakehouse_movilidad_publica_santiago_spark.plans import explain_str

    df = inventory_llm.q_embedding_knn(spark, SF_CORRECTNESS)
    assert "TakeOrderedAndProject" in explain_str(df, "simple")


def test_quantile_buckets_plan_is_window_free(spark):
    """The scalable NTILE replacement must contain NO window operator
    (in particular no single-partition global-order WindowExec) —
    only the boundary aggregate, a broadcast of its 1-row result, and
    a codegen'd CASE projection."""
    from data_lakehouse_movilidad_publica_santiago_spark.plans import explain_str

    df = inventory.q_quantile_buckets_customers(spark, SF_CORRECTNESS)
    plan = explain_str(df, "simple")
    assert "Window" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_quantile_buckets_matches_ntile_up_to_ties(spark):
    """On unique values (acctbal cents with unique tiebreak absent),
    bucket counts from quantile_buckets stay within ties of NTILE's
    equal split."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.windows import (
        quantile_buckets,
    )

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") * 37 % 1009).alias("v")
    )
    out = quantile_buckets(df, "v", n_buckets=4, descending=True, exact=True)
    counts = {r["bucket"]: r["n"] for r in out.groupBy("bucket").count()
              .withColumnRenamed("count", "n").collect()}
    assert set(counts) == {1, 2, 3, 4}
    assert all(abs(c - 250) <= 1 for c in counts.values()), counts


def test_serving_filters_push_to_scan(spark, tmp_path_factory):
    """API cut/day filters reach the silver parquet scan."""
    import dtpm_fixtures as fx
    from data_lakehouse_movilidad_publica_santiago_spark.serving import (
        QueryFilters,
    )
    from data_lakehouse_movilidad_publica_santiago_spark.serving.query_service import (
        SilverLake,
        apply_filters,
    )
    from data_lakehouse_movilidad_publica_santiago_spark.silver import run_silver
    from data_lakehouse_movilidad_publica_santiago_spark.sources.catalog import (
        discover_partitions,
    )

    root = tmp_path_factory.mktemp("lake")
    fx.build_lake(root)
    for p in discover_partitions(root, dataset="etapas"):
        run_silver(spark, p, root)
    lake = SilverLake(spark, root)
    df = apply_filters(
        lake.etapas(),
        QueryFilters(cut_from="2025-04-01", tipo_dia=["LABORAL"]),
        cut_col="cut",
        day_col="tipo_dia",
    )
    pf = pushed_filters(df)
    assert any("cut" in f for f in pf), pf
    assert any("tipo_dia" in f for f in pf), pf


@pytest.mark.slow  # 20-40 s; VERDICT r12 item 1 (default-run budget)
def test_load_report(spark, tmp_path_factory):
    import dtpm_fixtures as fx
    from data_lakehouse_movilidad_publica_santiago_spark.gold import GoldLoader
    from data_lakehouse_movilidad_publica_santiago_spark.gold.diagnostics import (
        build_load_report,
        write_load_report,
    )
    from data_lakehouse_movilidad_publica_santiago_spark.silver import run_silver
    from data_lakehouse_movilidad_publica_santiago_spark.sources.catalog import (
        discover_partitions,
    )

    root = tmp_path_factory.mktemp("lake")
    fx.build_lake(root)
    loader = GoldLoader(spark, root / "gold")
    for p in discover_partitions(root):
        run_silver(spark, p, root)
        loader.run(p, root)

    report = build_load_report(loader.store, root)
    assert report["facts"]["fct_trip"]["grain_duplicates"]["duplicate_keys"] == 0
    assert report["facts"]["fct_trip"]["sk_miss_rates"]["rows"] == 3
    miss = report["facts"]["fct_trip"]["sk_miss_rates"]["miss_rates_pct"]
    assert miss["origin_stop_sk"] == 0.0
    q = {r["reason_code"]: r["n"] for r in report["quarantine"]["viajes"]["reasons"]}
    assert q["NEG_DISTANCE"] == 3
    assert report["runs"]["ok"] == 3

    # ANALYZE layer: HLL cardinality per fact (exact at this tiny
    # size — SET-mode sketches) + exact dim profiles
    card = report["facts"]["fct_trip"]["cardinality"]
    assert card["column"] == "id_tarjeta"
    exact = (
        loader.store.read("fct_trip").select("id_tarjeta").distinct().count()
    )
    assert card["distinct_est"] == exact
    stop_prof = {
        p["col_name"]: p for p in report["dim_profiles"]["dim_stop"]
    }
    assert stop_prof["stop_code"]["n_nulls"] == 0
    assert stop_prof["stop_code"]["n_distinct"] > 0

    jp, mp = write_load_report(report, root / "diagnostics")
    assert jp.exists() and mp.exists()
    md = mp.read_text()
    assert "fct_trip" in md
    assert "HLL est" in md and "profile — dim_stop" in md
