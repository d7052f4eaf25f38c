"""S8 JDBC bulk sink, exercised end-to-end against the Derby embedded
driver that ships in Spark's own jars (no network, file-backed DB)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lakehouse_movilidad_publica_santiago_spark.gold.jdbc_sink import (
    read_jdbc,
    write_jdbc,
)

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture()
def derby_url(tmp_path):
    return f"jdbc:derby:{tmp_path}/goldsink;create=true"


def test_jdbc_roundtrip(spark, tmp_path, derby_url):
    df = spark.range(0, 1000).select(
        F.col("id").alias("order_sk"),
        (F.col("id") % 7).alias("status_sk"),
        (F.col("id") * 1.5).alias("amount"),
    )
    write_jdbc(
        df, derby_url, "fct_orders", driver=DERBY_DRIVER, batch_size=100
    )
    back = read_jdbc(spark, derby_url, "fct_orders", driver=DERBY_DRIVER)
    assert back.count() == 1000
    assert sorted(c.lower() for c in back.columns) == [
        "amount", "order_sk", "status_sk",
    ]
    got = back.agg(
        F.sum("order_sk").alias("s"), F.round(F.sum("amount"), 2).alias("a")
    ).first()
    assert got["s"] == sum(range(1000))
    assert float(got["a"]) == round(sum(i * 1.5 for i in range(1000)), 2)


def test_jdbc_append_and_overwrite_truncate(spark, derby_url):
    df = spark.range(0, 50).select(F.col("id").alias("k"))
    write_jdbc(df, derby_url, "dim_small", driver=DERBY_DRIVER)
    write_jdbc(df, derby_url, "dim_small", driver=DERBY_DRIVER, mode="append")
    assert read_jdbc(spark, derby_url, "dim_small", driver=DERBY_DRIVER).count() == 100
    # idempotent full refresh: overwrite+truncate keeps the schema
    write_jdbc(
        df, derby_url, "dim_small", driver=DERBY_DRIVER,
        mode="overwrite", truncate=True,
    )
    assert read_jdbc(spark, derby_url, "dim_small", driver=DERBY_DRIVER).count() == 50


def test_jdbc_partitioned_read(spark, derby_url):
    df = spark.range(0, 200).select(F.col("id").alias("k"))
    write_jdbc(df, derby_url, "t_part", driver=DERBY_DRIVER)
    back = read_jdbc(
        spark, derby_url, "t_part", driver=DERBY_DRIVER,
        partition_column="k", lower_bound=0, upper_bound=200,
        num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 200


def test_partitioned_read_requires_bounds(spark, derby_url):
    with pytest.raises(ValueError, match="lower_bound"):
        read_jdbc(
            spark, derby_url, "t_part", driver=DERBY_DRIVER,
            partition_column="k",
        )


def test_truncate_requires_overwrite(spark, derby_url):
    """Spark ignores truncate outside overwrite mode — the sink
    rejects the combination instead of silently not truncating."""
    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="truncate"):
        write_jdbc(df, derby_url, "dim_x", driver=DERBY_DRIVER, truncate=True)
