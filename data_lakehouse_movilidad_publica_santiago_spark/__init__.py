"""PySpark-native analytics engine with the query & data-processing
capabilities of ``lu1spereir4/Data_Lakehouse_Movilidad_Publica_Santiago``
(a batch medallion lakehouse over Santiago public-transit bip! data),
re-expressed Spark-first: DataFrame/SQL plans optimized by Catalyst,
parquet/ZSTD storage, broadcast dim joins, window-function dedup,
set-based SCD2, and Structured-Streaming-ready silver transforms.

Layout
------
- ``session``    SparkSession factory tuned for local[32] tests and cluster scale
- ``schemas``    raw/silver/gold StructType registry (all-VARCHAR ingest contract)
- ``functions``  scalar expression library (date/time SKs, code maps, hashing, geo, text)
- ``operators``  reusable relational operators (quality split, unpivot, dedup,
                 as-of join, SCD2, upsert, windows, similarity/dedup for LLM data)
- ``sources``    bronze CSV reader, parquet sinks, catalog manifest
- ``silver``     dataset transforms (viajes / etapas / subidas_30m) + quality audit
- ``gold``       Kimball constellation: dims (2 SCD2) + 4 facts + run log
- ``serving``    parameterized query service (the FastAPI query types)
- ``analytics``  the 15-query business corpus as Spark SQL
- ``streaming``  Structured Streaming variant of the silver pipeline
- ``plans``      plan-inspection helpers (pushdown / broadcast assertions)
"""

__version__ = "0.1.0"
