"""Bronze pipe-CSV scan (S1/S2).

Parity with the reference's all-VARCHAR ingest contract
(src/silver/transforms.py:114-129; build_lake.py:45):
- separator '|', UTF-8, header row present (skipped — names come from
  the authoritative column list), '-' reads as NULL,
- every field is a string; no silent error-skipping: FAILFAST aborts
  on malformed rows exactly like the reference's no-``ignore_errors``
  policy.

Scale: the scan is a plain distributed FileScan; Spark splits large
CSVs by byte ranges, so one 8 GB etapas file parallelizes across the
cluster (the reference's single-threaded-per-file bottleneck is gone).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import all_varchar_schema, clean_columns


def read_pipe_csv(
    spark: SparkSession,
    path: str | list[str],
    columns: list[str],
    fail_fast: bool = True,
) -> DataFrame:
    """Read one or many pipe-delimited CSVs with an explicit
    all-string schema; returns only the named (non-empty) columns."""
    schema = all_varchar_schema(columns)
    reader = (
        spark.read.schema(schema)
        .option("sep", "|")
        .option("header", "true")
        .option("encoding", "UTF-8")
        .option("nullValue", "-")
        .option("mode", "FAILFAST" if fail_fast else "PERMISSIVE")
        # the reference parses no quotes/escapes — raw split on '|'
        .option("quote", "")
    )
    df = reader.csv(path)
    return df.select(*clean_columns(columns))
