"""Streaming gold: file-arrival-triggered end-to-end medallion loads.

The reference's "streaming" is a per-cut batch CLI loop
(`/root/reference/src/gold/load_gold.py:1741-1866`): a new cut appears
→ silver transform → gold MERGE, with an etl_run_log skip-if-already-OK
guard making re-runs no-ops.  This module is that loop as a Structured
Streaming query: the bronze dataset directory is a file source, a new
cut's CSV landing is the arrival event, and ``foreachBatch`` drives the
SAME ``run_silver`` + ``GoldLoader.run`` code path the batch CLI uses.

Consequences, by construction rather than by re-implementation:

- **gold is byte-identical to the batch runner** on the same cuts —
  there is no second streaming implementation of the silver transform
  or the gold MERGE to drift;
- **restart-safe / effectively exactly-once** — after a crash the
  checkpoint replays the last micro-batch, ``run_silver`` overwrites
  its cut's silver atomically (tmp+rename), and the gold run-log skip
  (`load_gold.py:1775-1785` parity) turns the replayed gold load into
  a SKIPPED no-op; the fact MERGE's anti-join is a second, independent
  dedup layer under it (tests/test_store_crash.py);
- **scale**: the stream moves only file-arrival metadata per batch
  (the cut ids); all heavy lifting is the same partition-pruned batch
  plans, one cut at a time — the unit the reference sized its loads by.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..gold.runner import GoldLoader
from ..schemas import (
    ETAPAS_RAW_COLUMNS,
    SUBIDAS_RAW_COLUMNS,
    VIAJES_RAW_COLUMNS,
    all_varchar_schema,
)
from ..silver.runner import run_silver
from ..sources.catalog import discover_partitions

_DATASET_COLUMNS = {
    "viajes": VIAJES_RAW_COLUMNS,
    "etapas": ETAPAS_RAW_COLUMNS,
    "subidas_30m": SUBIDAS_RAW_COLUMNS,
}


def stream_gold(
    spark: SparkSession,
    lake_root: str | Path,
    gold_root: str | Path,
    checkpoint_dir: str | Path,
    dataset: str = "viajes",
    available_now: bool = True,
    force: bool = False,
    store=None,
):
    """Start the bronze→silver→gold stream for one dataset.

    Returns the started StreamingQuery (AvailableNow by default, so
    callers ``awaitTermination()`` to drain all pending cuts and stop —
    the batch CLI's drain semantics; pass ``available_now=False`` for
    a resident continuous loader).  ``force=True`` forwards to
    ``GoldLoader.run`` to bypass the run-log skip (reprocessing).
    ``store`` forwards to ``GoldLoader`` — pass a ``TxnGoldStore`` to
    stream into the transactional table format (checkpoint replays are
    then absorbed twice over: the run-log skip AND the commit log).
    """
    lake_root, gold_root = Path(lake_root), Path(gold_root)
    schema = all_varchar_schema(_DATASET_COLUMNS[dataset])
    src_glob = str(
        lake_root / "raw" / "dtpm" / f"dataset={dataset}" / "year=*" / "month=*" / "cut=*" / "*.csv"
    )
    raw = (
        spark.readStream.schema(schema)
        .option("sep", "|")
        .option("header", "true")
        .option("nullValue", "-")
        .option("quote", "")
        .csv(src_glob)
        .select(F.input_file_name().alias("_src"))
    )
    loader = GoldLoader(spark, gold_root, store=store)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # the batch's information content is WHICH cuts arrived — a
        # handful of strings; the heavy work re-reads bronze through
        # the audited batch path (catalog columns, quality.json, run
        # log), not through this stream's rows
        cuts = {
            r["c"]
            for r in batch_df.select(
                F.regexp_extract(F.col("_src"), r"cut=([^/]+)/", 1).alias("c")
            )
            .distinct()
            .collect()
        }
        parts = [
            p
            for p in discover_partitions(lake_root, dataset=dataset)
            if p.cut in cuts
        ]
        for p in sorted(parts, key=lambda p: p.cut):
            run_silver(spark, p, lake_root)
            loader.run(p, lake_root, force=force)

    writer = (
        raw.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(checkpoint_dir))
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
