"""Driver-gate queries for the transactional table format (lake.TxnTable).

The driver's DuckDB oracle cannot run the table format itself, but the
format's OBSERVABLE state after a deterministic commit sequence is pure
relational algebra — so each gate query replays the same sequence
(append → MERGE upsert → DELETE) into a per-(process, sf_dir) table
once, then reads a pinned version; the oracle recomputes that version's
expected content with plain SQL over the same source parquet. Green
means the commit log, snapshot resolution, copy-on-write rewrite and
data-skipping read all reproduce exact SQL semantics.

Commit sequence over ``orders`` (columns o_orderkey, o_orderstatus,
o_totalprice):

- v0  append  : orders with ``o_orderkey % 3 <> 0``
- v1  merge   : orders with ``o_orderkey % 2 = 0``, status ``'U'``,
                price doubled — updates the overlap, inserts the rest
- v2  delete  : rows with ``o_totalprice < 50000``

Gate queries: ``txn_merge_upsert`` (read v1), ``txn_time_travel``
(read v0 AFTER later commits exist), ``txn_delete_skipping`` (read v2
through a stats-pruned predicate read).
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lake import TxnTable
from .inventory import t

_TXN_CACHE: dict[str, str] = {}


@atexit.register
def _cleanup_txn_cache() -> None:
    """Remove the per-process gate-table temp dirs on interpreter
    exit (they are rebuilt lazily per process; nothing references
    them across runs)."""
    for root in _TXN_CACHE.values():
        shutil.rmtree(root, ignore_errors=True)
    _TXN_CACHE.clear()


def _table_for(spark: SparkSession, sf_dir: str) -> TxnTable:
    """Build the commit sequence once per (process, sf_dir); every gate
    query afterwards is a pure snapshot read."""
    if sf_dir not in _TXN_CACHE:
        root = tempfile.mkdtemp(prefix="dlmps_txn_gate_")
        tab = TxnTable(spark, root)
        orders = t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        tab.append(orders.filter(F.col("o_orderkey") % 3 != 0))
        tab.merge_upsert(
            orders.filter(F.col("o_orderkey") % 2 == 0).select(
                "o_orderkey",
                F.lit("U").alias("o_orderstatus"),
                (F.col("o_totalprice") * 2).alias("o_totalprice"),
            ),
            keys=["o_orderkey"],
        )
        tab.delete_where([("o_totalprice", "<", 50000.0)])
        _TXN_CACHE[sf_dir] = root
    return TxnTable(spark, _TXN_CACHE[sf_dir])


def _summarize(df: DataFrame) -> DataFrame:
    return df.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


def q_txn_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State right after the MERGE (version 1): matched keys updated,
    unmatched inserted, untouched files carried over by reference."""
    return _summarize(_table_for(spark, sf_dir).read(version=1))


ORACLE_TXN_MERGE_UPSERT = """
WITH b1 AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 3 <> 0),
b2 AS (
  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice * 2 AS o_totalprice
  FROM orders WHERE o_orderkey % 2 = 0),
merged AS (
  SELECT * FROM b2
  UNION ALL
  SELECT * FROM b1
  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM b2))
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS sum_price
FROM merged
GROUP BY o_orderstatus
"""


def q_txn_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Version-0 read resolved while LATER commits (merge + delete)
    exist — proves old manifests and their files stay consistent."""
    return _summarize(_table_for(spark, sf_dir).read(version=0))


ORACLE_TXN_TIME_TRAVEL = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS sum_price
FROM orders
WHERE o_orderkey % 3 <> 0
GROUP BY o_orderstatus
"""


def q_txn_delete_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-DELETE state read through a predicate that exercises the
    file-level min/max skip path (semantics unchanged — the predicate
    is also applied row-level)."""
    return _summarize(
        _table_for(spark, sf_dir).read(
            predicates=[("o_totalprice", ">=", 100000.0)]
        )
    )


ORACLE_TXN_DELETE_SKIPPING = """
WITH b1 AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 3 <> 0),
b2 AS (
  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice * 2 AS o_totalprice
  FROM orders WHERE o_orderkey % 2 = 0),
merged AS (
  SELECT * FROM b2
  UNION ALL
  SELECT * FROM b1
  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM b2))
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS sum_price
FROM merged
WHERE NOT (o_totalprice < 50000)   -- the DELETE
  AND o_totalprice >= 100000       -- the skipping read predicate
GROUP BY o_orderstatus
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "txn_merge_upsert": q_txn_merge_upsert,
    "txn_time_travel": q_txn_time_travel,
    "txn_delete_skipping": q_txn_delete_skipping,
}

ORACLE: dict[str, str] = {
    "txn_merge_upsert": ORACLE_TXN_MERGE_UPSERT,
    "txn_time_travel": ORACLE_TXN_TIME_TRAVEL,
    "txn_delete_skipping": ORACLE_TXN_DELETE_SKIPPING,
}
