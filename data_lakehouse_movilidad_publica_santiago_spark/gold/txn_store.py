"""GoldStore on the transactional table format (lake.TxnTable).

Drop-in replacement for ``store.GoldStore`` (same five-method surface:
``exists / read / overwrite / append / merge_insert``) that keeps every
gold table in a manifest-log TxnTable instead of bare parquet dirs:

- dims get ACID overwrites with time travel instead of tmp-dir swaps,
- facts get ACID appends, and the insert-only MERGE's existing-side
  scan prunes at the FILE level via footer stats (``prune`` values →
  ``in`` predicates) instead of Hive partition dirs,
- a crashed load leaves no partial state (unreferenced files), and
  concurrent loaders serialize through the commit log instead of
  relying on the parquet committer alone.

``GoldLoader(..., store=TxnGoldStore(spark, root))`` runs the whole
reference pipeline on the ACID layer; ``tests/test_txn_gold_parity.py``
pins byte-equality of every gold table against the plain-parquet store.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lake import TxnTable
from .store import GoldStore


class TxnGoldStore(GoldStore):
    def __init__(self, spark: SparkSession, root: Path) -> None:
        super().__init__(spark, root)
        self._tables: dict[str, TxnTable] = {}

    def _t(self, table: str) -> TxnTable:
        if table not in self._tables:
            self._tables[table] = TxnTable(self.spark, self.path(table))
        return self._tables[table]

    def exists(self, table: str) -> bool:
        p = self.path(table)
        return p.exists() and self._t(table).latest_version() is not None

    def read(self, table: str) -> DataFrame:
        return self._t(table).read()

    def overwrite(self, df: DataFrame, table: str) -> None:
        self._t(table).overwrite(df)

    @staticmethod
    def _co_locate(
        df: DataFrame,
        partition_cols: list[str] | None,
        prune: dict[str, list] | None = None,
    ) -> DataFrame:
        """Hive partition dirs become HASH co-location on the same
        columns: every output file then holds one (or few) partition
        value(s), so its footer min==max and stats-based file skipping
        replaces partition pruning. Hash, not range: a range shuffle
        runs a sampling job (the whole upstream plan executes twice —
        expensive when upstream is the MERGE anti-join).

        CRITICAL skip: when the batch holds a SINGLE partition value
        (the normal per-cut load — ``prune`` says so without a scan),
        hashing on it would funnel every row into ONE task (hot
        partition; fatal at scale) and buy nothing — any layout
        already gives min==max stats for a constant column. So only
        multi-value batches repartition."""
        if not partition_cols:
            return df
        if prune is not None and all(
            len(prune.get(c, [0, 1])) <= 1 for c in partition_cols
        ):
            return df
        return df.repartition(*[F.col(c) for c in partition_cols])

    def append(
        self, df: DataFrame, table: str, partition_cols: list[str] | None = None
    ) -> None:
        self._t(table).append(self._co_locate(df, partition_cols))

    def merge_insert(
        self,
        df: DataFrame,
        table: str,
        grain: list[str],
        partition_cols: list[str] | None = None,
        prune: dict[str, list] | None = None,
    ) -> int:
        """Insert-only MERGE (reference semantics, ddl_gold.sql:637)
        with the existing side read through stats-based file skipping
        for the incoming cuts. The insert count comes from the commit
        record's per-file row stats — zero extra passes, and immune to
        the double-execution an ``observe`` metric would suffer here
        (``repartitionByRange`` runs a sampling job over the input
        before the write, so the plan executes twice)."""
        tab = self._t(table)
        if not self.exists(table):
            new_rows = df
        else:
            preds = (
                [(col, "in", values) for col, values in prune.items()]
                if prune
                else None
            )
            existing = tab.read(predicates=preds).select(*grain)
            cond = [df[g].eqNullSafe(existing[g]) for g in grain]
            new_rows = df.join(existing, cond, "left_anti")
        version = tab.append(self._co_locate(new_rows, partition_cols, prune))
        if version is None:
            return 0
        return sum(e["rows"] for e in tab.commit_info(version)["add"])
