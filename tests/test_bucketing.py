"""Bucketed fact tables: the trip↔leg join must plan without a
shuffle (no Exchange) once both sides are bucketed on the join keys."""

from __future__ import annotations

import pytest

from data_lakehouse_movilidad_publica_santiago_spark.gold import GoldLoader
from data_lakehouse_movilidad_publica_santiago_spark.gold.bucketing import (
    bucketed_trip_leg_join,
    bucketize_trip_facts,
)
from data_lakehouse_movilidad_publica_santiago_spark.plans.checks import (
    explain_str,
)
from data_lakehouse_movilidad_publica_santiago_spark.silver import run_silver
from data_lakehouse_movilidad_publica_santiago_spark.sources.catalog import (
    discover_partitions,
)

import dtpm_fixtures as fx


def test_bucketed_join_has_no_exchange(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("lake")
    fx.build_lake(root)
    loader = GoldLoader(spark, root / "gold")
    for p in discover_partitions(root, dataset="viajes"):
        run_silver(spark, p, root)
        loader.run(p, root)

    bucketize_trip_facts(loader.store, n_buckets=4)

    # at fixture size the planner prefers broadcast (bucketing is a
    # big-table tool); force the sort-merge path to observe the
    # shuffle elimination bucketing exists for
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_trip_leg_join(spark)
        plan = explain_str(joined)
        assert "SortMergeJoin" in plan, plan
        # bucketed co-location: no hash-partition shuffle on either
        # side (formatted mode splits node name and arguments across
        # lines, so check the parsed exchange list, not a substring)
        from data_lakehouse_movilidad_publica_santiago_spark.plans.checks import (
            exchange_input_cols,
        )

        assert exchange_input_cols(joined) == [], plan
        assert joined.count() == 5
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP DATABASE gold_bucketed CASCADE")
