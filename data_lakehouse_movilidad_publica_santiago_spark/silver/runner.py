"""Silver runner: one (dataset, cut) partition end-to-end.

Mirrors the reference CLI loop (src/silver/transform_silver.py:101-161):
catalog resolve → dispatch per dataset → sinks + quality.json + count
assertion. Differences are Spark-architectural: the four sinks derive
from ONE cached tagged plan (no view re-evaluation), and counts come
from a single aggregate pass.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..operators.quality import REASON_COL
from ..sources.catalog import CutPartition
from ..sources.csv_source import read_pipe_csv
from .common import contract_check, quality_stats, write_parquet, write_quality
from .etapas import etapas_contract_constraints, transform_etapas_df
from .subidas import subidas_contract_constraints, transform_subidas_df
from .viajes import (
    legs_from_valid,
    transform_viajes_df,
    trips_from_valid,
    viajes_contract_constraints,
)

TRANSFORM_REGISTRY = {
    "viajes": transform_viajes_df,
    "etapas": transform_etapas_df,
    "subidas_30m": transform_subidas_df,
}

_CONTRACTS = {
    "viajes": viajes_contract_constraints,
    "etapas": etapas_contract_constraints,
    "subidas_30m": subidas_contract_constraints,
}

_VALID_SINK_NAME = {
    "etapas": "etapas_validation.parquet",
    "subidas_30m": "subidas_30m.parquet",
}


def run_silver(
    spark: SparkSession,
    partition: CutPartition,
    lake_root: Path,
) -> dict[str, Any]:
    """Transform one raw partition → silver parquet + quarantine +
    quality.json. Returns the quality stats dict.

    Single-CSV-pass design: the enriched+tagged plan is cached
    (MEMORY_AND_DISK — spills instead of OOM at scale) on its first
    materialization; every sink, count, and audit derives from the
    cache, and no separate raw ``count()`` pass re-parses the CSV
    (read_row_count is reconstructed from the tagged totals).
    """
    raw = read_pipe_csv(spark, partition.csv_paths, list(partition.columns))

    # subidas pre-filters NULL Media_hora before tagging
    # (transforms.py:930); count raw rows only where the prefilter
    # makes tagged_total != raw (cheap: 6-column source)
    read_row_count: int | None = None
    if partition.dataset == "subidas_30m":
        read_row_count = raw.count()

    plans = TRANSFORM_REGISTRY[partition.dataset](
        raw, partition.cut, partition.year, partition.month
    )
    silver_dir = partition.silver_dir(lake_root)
    quarantine_dir = partition.quarantine_dir(lake_root)
    tagged = plans["tagged"].cache()
    try:
        valid = tagged.filter(F.col(REASON_COL).isNull()).drop(REASON_COL)
        invalid = tagged.filter(F.col(REASON_COL).isNotNull()).withColumnRenamed(
            REASON_COL, "reason_code"
        )

        outputs: list[str] = []
        if partition.dataset == "viajes":
            trips = trips_from_valid(valid)
            out_trip = silver_dir / "viajes_trip.parquet"
            out_leg = silver_dir / "viajes_leg.parquet"
            write_parquet(trips, out_trip)
            write_parquet(legs_from_valid(valid), out_leg)
            write_parquet(
                invalid.select(*trips.columns, "reason_code"),
                quarantine_dir / "invalid.parquet",
            )
            write_parquet(trips, quarantine_dir / "valid.parquet")
            outputs = [str(out_trip), str(out_leg)]
            contract_df = trips
        else:
            out_valid = silver_dir / _VALID_SINK_NAME[partition.dataset]
            write_parquet(valid, out_valid)
            write_parquet(invalid, quarantine_dir / "invalid.parquet")
            write_parquet(valid, quarantine_dir / "valid.parquet")
            outputs = [str(out_valid)]
            contract_df = valid

        counts = tagged.agg(
            F.sum(F.when(F.col(REASON_COL).isNull(), 1).otherwise(0)).alias("v"),
            F.sum(F.when(F.col(REASON_COL).isNotNull(), 1).otherwise(0)).alias("i"),
        ).collect()[0]
        valid_count, invalid_count = int(counts["v"] or 0), int(counts["i"] or 0)
        tagged_total = valid_count + invalid_count
        if read_row_count is None:
            read_row_count = tagged_total
        prefiltered = read_row_count - tagged_total

        contract = contract_check(contract_df, _CONTRACTS[partition.dataset]())

        stats = quality_stats(
            dataset=partition.dataset,
            cut=partition.cut,
            year=partition.year,
            month=partition.month,
            meta_row_count=partition.meta_row_count,
            read_row_count=tagged_total,
            valid_count=valid_count,
            invalid_count=invalid_count,
            invalid_df=invalid,
            contract=contract,
            output_files=outputs,
        )
        stats["read_row_count"] = read_row_count
        stats["prefiltered_row_count"] = prefiltered
        if partition.meta_row_count and read_row_count != partition.meta_row_count:
            stats["meta_count_mismatch"] = True

        write_quality(stats, partition.quality_dir(lake_root))
        return stats
    finally:
        tagged.unpersist()
