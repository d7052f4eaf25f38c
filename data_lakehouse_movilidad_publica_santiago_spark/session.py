"""SparkSession factory.

The reference hand-tunes its engines per process (DuckDB ``SET threads``,
``SET memory_limit '6GB'`` — reference src/silver/transforms.py:157-163);
here the equivalent knobs are set once on the session and Catalyst/AQE
handle the rest. Defaults are sized so the same code runs on
``local[N]`` for tests and scales to a multi-executor cluster: AQE
coalesces the 200-default shuffle partitions on tiny inputs and splits
skewed ones at scale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# ZSTD parquet mirrors the reference's silver layer
# (COPY ... FORMAT PARQUET, COMPRESSION ZSTD, transforms.py:146).
_BASE_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # default floor is 1MB: on MB-scale shuffles AQE coalesces to 1-3
    # partitions and serializes the sort/window/agg stages that follow.
    # 64k keeps small shuffles parallel; at scale the computed target
    # size is >> this floor, so the setting is inert there.
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
    "spark.sql.parquet.compression.codec": "zstd",
    # naive local timestamps everywhere in the reference (DATETIME2, no tz)
    "spark.sql.session.timeZone": "UTC",
    # Arrow for every pandas-UDF boundary (geo reproject, contract sampling)
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # DuckDB TRY_CAST semantics == Spark non-ANSI cast (SURVEY §1.3);
    # keep ANSI off so CAST yields NULL on parse failure, not an error.
    "spark.sql.ansi.enabled": "false",
    # broadcast all the small dims (largest SCD2 dim ~12k rows)
    "spark.sql.autoBroadcastJoinThreshold": "64MB",
    # some sources (driver testdata `events`) carry parquet TIMESTAMP(NANOS),
    # which vanilla Spark rejects; read as long and convert at the scan
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # the silver enrichment plans carry 100-180 fields; the default
    # maxFields=100 silently drops them out of whole-stage codegen
    # (~2x slower interpreted path)
    "spark.sql.codegen.maxFields": "400",
    "spark.ui.enabled": "false",
    "spark.sql.files.maxPartitionBytes": "128MB",
}


def get_spark(
    app_name: str = "data_lakehouse_movilidad_publica_santiago_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``)
    so tests and bench share one code path; on a real cluster pass
    ``master=None`` with ``spark.master`` preconfigured.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = builder.master(master)
    conf = dict(_BASE_CONF)
    # Scale-adaptive shuffle parallelism (round-12, guide §2): a fixed
    # 32 meant a local[8] run paid 4 waves of undersized tasks per
    # exchange while a real cluster would be underpartitioned.  The
    # default follows the session's core count ($SPARK_GRAFT_CPUS when
    # numeric — the same variable that sizes the master — else the
    # historical 32); AQE still coalesces tiny exchanges and splits
    # skewed ones on top.  Production clusters should set an explicit
    # value (2-3× total executor cores, or rely on AQE's
    # initialPartitionNum) via extra_conf/spark-defaults — this default
    # only aims local runs at their actual parallelism.
    cpus_env = os.environ.get("SPARK_GRAFT_CPUS", "")
    conf.setdefault(
        "spark.sql.shuffle.partitions",
        cpus_env if cpus_env.isdigit() else "32",
    )
    # local mode = driver-only JVM: the driver heap IS the executor
    # memory; the 1g default OOMs on wide-row CSV scans with 32 threads
    conf.setdefault(
        "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")
    )
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


# Serving-tier scheduler profile (round 11, measured in SCALE.md r11's
# mixed-weight probe): on a MIXED request stream — heavy gold-
# constellation analytics concurrent with interactive map/demand calls
# — FAIR with per-CLASS pools beats FIFO on BOTH classes (interactive
# p95 −51%, heavy p50 −27%, stream wall −29%): FIFO lets the heavies
# convoy the queue while FAIR time-slices executor slots between the
# two class pools.  On UNIFORM small-request streams FIFO remains the
# measured winner (SCALE.md r10: FAIR-with-per-REQUEST-pools p95 +32-
# 36% — per-request pools fragment slots; class pools do not), so the
# default session stays FIFO and serving tiers opt in explicitly.
SERVING_CLASSES = ("interactive", "heavy")


def get_serving_spark(
    app_name: str = "dlmps-serving",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """The serving-tier session: ``get_spark`` + FAIR scheduling, so
    ``set_request_class`` can route each request's jobs into its
    workload-class pool.  ``spark.scheduler.mode`` is a SparkContext-
    level setting — this must create the PROCESS'S FIRST session
    (``getOrCreate`` against an existing context silently keeps its
    scheduler); serving processes are dedicated, so that holds by
    construction — and VERIFIED here: if some earlier code created a
    FIFO context first, ``set_request_class`` would silently become a
    no-op and the serving tier would run misconfigured, so a scheduler
    mismatch raises instead of being swallowed (ADVICE r11)."""
    conf = {"spark.scheduler.mode": "FAIR"}
    if extra_conf:
        conf.update(extra_conf)
    spark = get_spark(app_name=app_name, master=master, extra_conf=conf)
    mode = spark.sparkContext.getConf().get("spark.scheduler.mode", "FIFO")
    if mode != "FAIR":
        raise RuntimeError(
            "get_serving_spark got an existing SparkContext with "
            f"spark.scheduler.mode={mode!r}; FAIR is a context-level "
            "setting, so the serving session must be the process's "
            "first — stop the existing context (spark.stop()) or run "
            "the serving tier in its own process"
        )
    return spark


def set_request_class(spark: SparkSession, request_class: str) -> None:
    """Tag the CURRENT THREAD's subsequent jobs into the given
    workload-class FAIR pool (``interactive`` or ``heavy``).  Pools
    are created on demand with equal weight and FIFO order inside —
    the class split is what the r11 probe measured, NOT per-request
    pools (measured worse, r10).  Call per request thread in the
    serving tier; a no-op under the default FIFO scheduler."""
    if request_class not in SERVING_CLASSES:
        raise ValueError(
            f"request_class must be one of {SERVING_CLASSES}, "
            f"got {request_class!r}"
        )
    spark.sparkContext.setLocalProperty(
        "spark.scheduler.pool", request_class
    )
