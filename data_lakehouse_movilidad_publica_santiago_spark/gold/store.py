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

from pyspark.sql import DataFrame, Observation, SparkSession
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

        The insert count rides the write as an ``observe`` metric —
        one pass, zero extra memory (no cache of the anti-join
        result).  A fully-matched re-run performs an empty append,
        which leaves at most one 0-row schema-marker part-file
        (FileFormatWriter writes one file for an empty result);
        readers are unaffected and its row-group stats prune it from
        every scan.  Callers that must avoid even that (tight re-run
        loops) should gate on the run log, as the batch runner does —
        the same skip-if-OK discipline as the reference loader.

        Crash safety (no Delta log in this env): the parquet job
        committer (FileOutputCommitter v1) stages every task file
        under ``_temporary/`` and publishes only at JOB commit;
        readers ignore ``_``-prefixed paths, so a mid-append crash
        leaves the table exactly as before and the next merge_insert
        re-derives the same anti-join — convergent, never duplicated.
        Pinned by ``tests/test_store_crash.py``.
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
        obs = Observation()
        self.append(
            new_rows.observe(obs, F.count(F.lit(1)).alias("n_inserted")),
            table,
            partition_cols,
        )
        return int(obs.get["n_inserted"])
