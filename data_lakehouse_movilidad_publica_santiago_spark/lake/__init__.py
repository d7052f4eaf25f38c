"""Transactional parquet table format ("lakehouse-lite").

A pure-PySpark, dependency-free implementation of the lakehouse
table-format contract (the env ships no Delta/Iceberg jar — this
module supplies the same guarantees from first principles, modeled on
the published Delta commit protocol):

- atomic commits via a put-if-absent version log,
- snapshot-isolated reads and time travel,
- optimistic concurrency with append rebase,
- MERGE upsert / DELETE via copy-on-write of only the affected files,
- file-level min/max statistics for data skipping,
- OPTIMIZE bin-packing compaction and reference-counted VACUUM.

See ``txn_table.TxnTable``.
"""

from .txn_table import ConcurrentCommitError, SchemaMismatchError, TxnTable

__all__ = ["TxnTable", "ConcurrentCommitError", "SchemaMismatchError"]
