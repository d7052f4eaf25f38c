"""Streaming ANN-index maintenance: the IVF-PQ lifecycle as a
Structured Streaming query.

A growing training corpus lands embedding batches as parquet files; a
serving-grade index must absorb them continuously without a rebuild.
This module is the ``cli.py index-maintain`` verb (drift monitor →
threshold-gated compaction → incremental add, per arriving batch)
driven by a file-source stream, with the one property a crash-looping
batch CLI cannot give: **row-level exactly-once adds across
micro-batch replays**, built on ``ivfpq_add(write_token=...)`` —

- the frozen-quantizer encode is deterministic (same batch rows →
  same cells, same codes), and
- the token write puts each touched cell's rows at the deterministic
  name ``ivf_cell=<c>/add-b<batch_id>.parquet`` via ``os.replace``,

so a replayed micro-batch (the checkpoint re-delivers the last
uncommitted batch after a crash ANYWHERE in the sink) rewrites the
same row sets onto the same file names instead of appending
duplicates.  No ledger or marker file is needed — the marker-write
crash window that would reopen at-least-once simply doesn't exist.

Ordering inside the sink (each step's reason):

1. ``_recover_optimize_tmp`` — a PRIOR sink run may have died inside
   a compaction swap, parking a cell's only copies under
   ``_optimize_tmp``; everything after must see the restored index.
2. ``ivfpq_drift_stats`` on the incoming batch — measured BEFORE the
   add (afterwards the batch is part of the index and dilutes its own
   signal).
3. ``ivfpq_optimize`` when any cell exceeds ``max_files_per_cell`` —
   BEFORE the add, never after: compaction absorbs old files into new
   ones, so compacting the *current* batch's token files and then
   crashing pre-commit would let the replay re-materialize them
   (duplicates).  Compacting first touches only batches whose offsets
   are already committed (foreachBatch commits batch N's offsets
   before delivering batch N+1), keeping every token file
   replay-stable until it is safe to fold in.
4. ``ivfpq_add(write_token=f"b{batch_id}")`` — the idempotent commit.

Each batch appends one JSON line to ``<index_dir>/maintenance_log.jsonl``
mirroring the CLI report (drift stats, compaction stats,
``rebuild_recommended`` per the SCALE.md r10 recipe).  The report
write is after the add and NOT idempotent (a replayed batch logs
twice) — maintenance telemetry is advisory, index contents are not.

Single-writer: like ``ivfpq_optimize``, the stream must be the
index's only writer, and compaction's swap window is not
reader-atomic — pause concurrent queries or accept the documented
window (see ``ivfpq_optimize``).  At 100 TB this is one lightweight
always-on driver whose per-batch work is O(batch + over-threshold
cells), never O(index).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from ..operators.pq import (
    _cell_files,
    _recover_optimize_tmp,
    ivfpq_add,
    ivfpq_drift_stats,
    ivfpq_optimize,
    load_ivfpq_meta,
)


def maintain_index_batch(
    spark: SparkSession,
    index_dir: str,
    batch_df: DataFrame,
    batch_id: int,
    id_col: str | None = None,
    vec_col: str | None = None,
    max_files_per_cell: int = 8,
    mse_rebuild_threshold: float = 1.5,
    tv_rebuild_threshold: float = 0.5,
) -> dict:
    """One maintenance cycle (the foreachBatch sink body, callable
    directly for tests / batch parity): recover → drift → compact →
    idempotent add, returning the report dict.  See the module
    docstring for why this exact order."""
    meta, _cent = load_ivfpq_meta(spark, index_dir)
    datasets = ["codes"] + (["vectors"] if meta.get("store_vectors") else [])
    recovered = _recover_optimize_tmp(index_dir, datasets)
    drift = ivfpq_drift_stats(
        spark, index_dir, batch_df, id_col=id_col, vec_col=vec_col
    )
    over = [
        c
        for c, fs in _cell_files(os.path.join(index_dir, "codes")).items()
        if len(fs) > max_files_per_cell
    ]
    opt = (
        ivfpq_optimize(spark, index_dir, max_files_per_cell=max_files_per_cell)
        if over
        else None
    )
    n_added = ivfpq_add(
        spark, index_dir, batch_df,
        id_col=id_col, vec_col=vec_col,
        write_token=f"b{batch_id}",
    )  # fmt: skip
    reasons = []
    if (
        drift["mse_ratio"] is not None
        and drift["mse_ratio"] > mse_rebuild_threshold
    ):
        reasons.append(
            f"mse_ratio {drift['mse_ratio']} > {mse_rebuild_threshold}"
        )
    if drift["cell_tv_distance"] > tv_rebuild_threshold:
        reasons.append(
            f"cell_tv_distance {drift['cell_tv_distance']} > "
            f"{tv_rebuild_threshold}"
        )
    report = {
        "batch_id": int(batch_id),
        "recovered_cells": recovered,
        "n_added": n_added,
        "drift": drift,
        "compacted": opt is not None,
        "optimize": opt,
        "rebuild_recommended": bool(reasons),
        "rebuild_reason": "; ".join(reasons) or None,
    }
    with open(os.path.join(index_dir, "maintenance_log.jsonl"), "a") as f:
        f.write(json.dumps(report) + "\n")
    return report


def stream_index_maintenance(
    spark: SparkSession,
    source_dir: str | Path,
    index_dir: str | Path,
    checkpoint_dir: str | Path,
    id_col: str | None = None,
    vec_col: str | None = None,
    max_files_per_cell: int = 8,
    mse_rebuild_threshold: float = 1.5,
    tv_rebuild_threshold: float = 0.5,
    available_now: bool = True,
):
    """Start the index-maintenance stream over a parquet file source
    (each arriving file = one embeddings batch).  Returns the started
    StreamingQuery — AvailableNow by default, so callers
    ``awaitTermination()`` to drain pending batches and stop (the
    index-maintain CLI's semantics); ``available_now=False`` keeps a
    resident maintainer.  The source schema is read from the index's
    recorded (id, vec) columns, so batches are validated against the
    index contract at subscription time, not per file."""
    index_dir = str(index_dir)
    meta, _cent = load_ivfpq_meta(spark, index_dir)
    meta_id = id_col or meta["id_col"]
    meta_vec = vec_col or meta.get("vec_col", "embedding")
    try:
        # schema from the already-landed batch files (flat parquet
        # files in source_dir — arrival drops, not directories)
        schema = (
            spark.read.parquet(str(source_dir))
            .select(meta_id, meta_vec)
            .schema
        )
    except Exception:
        # empty source (resident maintainer started ahead of the first
        # arrival): derive the contract from the index itself — id
        # field from codes/, vector field from vectors/ when stored,
        # else the build's float-array convention
        from pyspark.sql.types import ArrayType, FloatType, StructType

        codes = spark.read.parquet(os.path.join(index_dir, "codes"))
        id_field = codes.schema[meta["id_col"]]
        if meta.get("store_vectors"):
            vecs = spark.read.parquet(os.path.join(index_dir, "vectors"))
            vec_type = vecs.schema[meta.get("vec_col", "embedding")].dataType
        else:
            vec_type = ArrayType(FloatType())
        schema = StructType(
            [
                id_field.__class__(meta_id, id_field.dataType),
                id_field.__class__(meta_vec, vec_type),
            ]
        )
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(source_dir))
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        maintain_index_batch(
            spark, index_dir, batch_df, batch_id,
            id_col=id_col, vec_col=vec_col,
            max_files_per_cell=max_files_per_cell,
            mse_rebuild_threshold=mse_rebuild_threshold,
            tv_rebuild_threshold=tv_rebuild_threshold,
        )  # fmt: skip

    writer = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(checkpoint_dir))
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
