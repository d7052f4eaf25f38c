"""Parquet table store with MERGE semantics (no Delta in this env).

- ``merge_insert``: WHEN NOT MATCHED INSERT (J5/J6) = left-anti join on
  the grain + append — faithful to the reference, whose MERGEs are
  insert-only (``rows_updated`` always 0, ddl_gold.sql:637).
- ``overwrite``: full-table swap via tmp-dir + atomic rename — the
  reference's tmp→rename (transforms.py:136-154) generalized to a
  directory. Used for dims (small); facts only ever append.

Scale: facts never rewrite — appends add part-files; the anti-join
side scans only the grain columns of the existing fact (column-pruned
parquet scan), broadcast when small. At cluster scale swap this class
for Delta/Iceberg MERGE without touching callers.
"""

from __future__ import annotations

import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class GoldStore:
    def __init__(self, spark: SparkSession, root: Path) -> None:
        self.spark = spark
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def path(self, table: str) -> Path:
        return self.root / table

    def exists(self, table: str) -> bool:
        p = self.path(table)
        # rglob: partitioned tables keep their files under
        # <table>/<col>=<val>/ subdirectories
        return p.exists() and any(p.rglob("*.parquet"))

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(str(self.path(table)))

    def overwrite(self, df: DataFrame, table: str) -> None:
        """Atomic full-table replace (dims): write to tmp dir, swap."""
        final = self.path(table)
        tmp = self.root / f"_tmp_{table}_{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(str(tmp))
        if final.exists():
            old = self.root / f"_old_{table}_{uuid.uuid4().hex[:8]}"
            final.rename(old)
            tmp.rename(final)
            shutil.rmtree(old)
        else:
            tmp.rename(final)

    def append(
        self, df: DataFrame, table: str, partition_cols: list[str] | None = None
    ) -> None:
        writer = df.write.mode("append")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(str(self.path(table)))

    def merge_insert(
        self,
        df: DataFrame,
        table: str,
        grain: list[str],
        partition_cols: list[str] | None = None,
        prune: dict[str, list] | None = None,
    ) -> int:
        """Insert-only MERGE keyed on ``grain``; returns rows inserted.

        The existing-side scan reads only the grain columns
        (column-pruned); new rows are appended as new part-files.

        Scale: pass ``partition_cols`` (typically ``["cut_sk"]``) so
        appends are Hive-partitioned, and ``prune`` with the incoming
        batch's values for those columns — the anti-join's existing
        side then PARTITION-PRUNES to just the cuts being loaded
        instead of scanning the whole historical fact. Safe because
        the grain contains the partition column: rows in other
        partitions can never match.
        """
        if not self.exists(table):
            new_rows = df
        else:
            existing = self.read(table)
            if prune:
                for col, values in prune.items():
                    existing = existing.filter(existing[col].isin(values))
            existing = existing.select(*grain)
            cond = [
                df[g].eqNullSafe(existing[g]) for g in grain
            ]  # NULLs in grain compare equal, like a unique index would
            new_rows = df.join(existing, cond, "left_anti")
        # one pass: count + write (cache the anti-join result, it is
        # usually a fraction of the input)
        new_rows = new_rows.cache()
        try:
            n = new_rows.count()
            if n:
                self.append(new_rows, table, partition_cols)
            return n
        finally:
            new_rows.unpersist()
