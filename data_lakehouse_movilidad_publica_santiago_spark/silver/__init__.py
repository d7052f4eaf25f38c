"""Silver layer: typed, quality-tagged, quarantined datasets.

One transform per dataset (viajes / etapas / subidas_30m), each the
Spark-first re-expression of the reference's DuckDB view pipeline
(src/silver/transforms.py): all-VARCHAR scan → typed enrichment
projection → ordered quality tagging → valid/invalid split → parquet
sinks + quality.json — a single cached plan feeding all sinks.
"""

from .runner import TRANSFORM_REGISTRY, run_silver

__all__ = ["TRANSFORM_REGISTRY", "run_silver"]
