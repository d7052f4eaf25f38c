"""Bucketed gold tables — shuffle-free fact↔fact joins at scale.

The trip↔leg join (J4 shape: legs resolve/validate against trips on
``(cut_sk, id_tarjeta, id_viaje)``) shuffles both facts when stored as
plain parquet. Bucketing both on ``(id_tarjeta, id_viaje)`` co-locates
matching rows at WRITE time, so every later join/groupBy on those keys
runs shuffle-free — at 100 TB that converts the biggest recurring
exchange (14M+ legs per cut) into a map-side zip.

Opt-in: plain-parquet remains the default store; call
``bucketize_trip_facts`` after loads (or point the loader at a
metastore-backed deployment and bucket on write).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .store import GoldStore

BUCKET_KEYS = ["id_tarjeta", "id_viaje"]


def bucketize_trip_facts(
    store: GoldStore,
    database: str = "gold_bucketed",
    n_buckets: int = 64,
) -> None:
    """Persist fct_trip and fct_trip_leg as bucketed managed tables
    (sorted within buckets on the join keys for merge-friendly reads)."""
    spark = store.spark
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    for fact in ("fct_trip", "fct_trip_leg"):
        # clear both catalog entry and any stale location from an
        # interrupted earlier write (saveAsTable refuses otherwise)
        spark.sql(f"DROP TABLE IF EXISTS {database}.{fact}")
        loc = spark.sql(f"DESCRIBE DATABASE {database}").filter(
            "info_name = 'Location'"
        ).collect()
        if loc:
            import shutil
            from urllib.parse import urlparse

            path = urlparse(loc[0]["info_value"]).path
            shutil.rmtree(f"{path}/{fact}", ignore_errors=True)
        (
            store.read(fact)
            .write.mode("overwrite")
            .bucketBy(n_buckets, *BUCKET_KEYS)
            .sortBy(*BUCKET_KEYS)
            .saveAsTable(f"{database}.{fact}")
        )


def bucketed_trip_leg_join(
    spark: SparkSession, database: str = "gold_bucketed"
) -> DataFrame:
    """Trip↔leg join over the bucketed tables — plans with NO Exchange
    on either side (asserted in tests)."""
    trips = spark.table(f"{database}.fct_trip")
    legs = spark.table(f"{database}.fct_trip_leg")
    return legs.join(trips.select(*BUCKET_KEYS, "tipo_dia", "factor_expansion"),
                     BUCKET_KEYS)  # fmt: skip
