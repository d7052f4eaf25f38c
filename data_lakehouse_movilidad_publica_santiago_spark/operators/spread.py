"""Input-parallelism guard shared by the compute-heavy operators.

A small parquet table scans as ONE partition, which silently
single-threads any expensive narrow stage built on it (shingle
explode + hashing, banding, all-pairs scoring). ``ensure_parallelism``
round-robin repartitions ONLY when the optimized plan's size estimate
says the scan yields fewer splits than the session's default
parallelism — at cluster scale (many file splits) it is a no-op and
adds no shuffle. Measured: 65s → 8.6s on the similarity all-pairs at
sf0.1; 6.8s → 1.7s on the decontamination shingle scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Spread ``df`` across the default parallelism iff its scan is
    estimated smaller than parallelism × maxPartitionBytes. The check
    is driver-side metadata only (Catalyst plan stats)."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        max_pb = int(
            spark._jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
                spark.conf.get("spark.sql.files.maxPartitionBytes", "128m")
            )
        )
    except Exception:  # pragma: no cover - stats unavailable → be safe
        return df.repartition(target)
    if size // max_pb < target:
        return df.repartition(target)
    return df
