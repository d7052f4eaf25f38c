"""JDBC bulk sink (S8) — the Spark-native replacement for the
reference's pyodbc ``fast_executemany`` SQL Server loader
(src/gold/load_gold.py:120-180: batched INSERT with an explicit
transaction per table).

``df.write.jdbc`` distributes the insert: each partition opens its own
connection and streams its rows in ``batchsize``-sized statements —
the executor-parallel analog of the reference's single driver
connection, with no driver-side materialization at any scale.

Tested against the Derby embedded driver that ships inside Spark's
own jars (no extra package), which exercises the full JDBC write/read
path; production targets (SQL Server / Postgres) differ only by URL +
driver jar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# matches the reference's executemany batch (load_gold.py BATCH parity
# with sqlite_export.BATCH_SIZE)
DEFAULT_BATCH_SIZE = 5_000


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    driver: str | None = None,
    batch_size: int = DEFAULT_BATCH_SIZE,
    num_partitions: int | None = None,
    truncate: bool = False,
) -> None:
    """Bulk-write ``df`` to a JDBC table.

    ``num_partitions`` caps the number of concurrent connections
    (repartitions down only — never up, which would add a shuffle);
    ``truncate=True`` with mode='overwrite' keeps the target schema
    (TRUNCATE instead of DROP+CREATE), the idempotent full-refresh
    shape for dims.
    """
    if truncate and mode != "overwrite":
        # Spark silently ignores the truncate option outside
        # overwrite mode — reject the combination instead of letting
        # a caller believe the target was truncated
        raise ValueError(
            f"truncate=True requires mode='overwrite' (got mode={mode!r})"
        )
    # coalesce never increases the partition count, so no guard needed
    out = df.coalesce(num_partitions) if num_partitions is not None else df
    writer = (
        out.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .option("isolationLevel", "READ_COMMITTED")
    )
    if driver:
        writer = writer.option("driver", driver)
    if truncate:
        writer = writer.option("truncate", "true")
    writer.mode(mode).save()


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Read a JDBC table, optionally range-partitioned so the scan is
    executor-parallel (one connection per partition) instead of a
    single-threaded pull."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
    )
    if driver:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partition_column requires explicit lower_bound/upper_bound"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 4))
        )
    return reader.load()
