"""Streaming silver pipeline.

Mapping from the reference's batch semantics (SURVEY §2.10):
- micro-batch / trigger : one cut per run → file-source stream with
  ``Trigger.AvailableNow`` over the bronze dir (new CSVs = new cuts)
- late/dirty data       : quarantine split with reason codes inside
  ``foreachBatch`` — the SAME ``transform_viajes_df`` plan as batch,
  never dropping rows silently
- exactly-once          : checkpointing + the batch sinks' idempotent
  layout (foreachBatch writes per-batch parquet; gold MERGE dedups)
- tumbling windows      : ``window(ts, '30 minutes')`` + watermark —
  the streaming form of ``fct_boardings_30m``
- state                 : ``applyInPandasWithState`` per-card trip
  chaining (beyond-reference custom stateful operator)
"""

from __future__ import annotations

from pathlib import Path
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.quality import REASON_COL
from ..schemas import VIAJES_RAW_COLUMNS, all_varchar_schema, clean_columns
from ..silver.viajes import transform_viajes_df


def stream_silver_viajes(
    spark: SparkSession,
    bronze_dir: str | Path,
    out_dir: str | Path,
    checkpoint_dir: str | Path,
    cut: str = "stream",
    year: int = 0,
    month: int = 0,
    available_now: bool = True,
):
    """File-source stream over a bronze viajes directory → valid trip
    + quarantine parquet sinks via foreachBatch.

    Returns the started StreamingQuery (AvailableNow by default so
    callers can ``awaitTermination()`` for the drain-and-stop batch
    semantics the reference's per-cut CLI loop has).
    """
    schema = all_varchar_schema(VIAJES_RAW_COLUMNS)
    raw = (
        spark.readStream.schema(schema)
        .option("sep", "|")
        .option("header", "true")
        .option("nullValue", "-")
        .option("quote", "")
        .csv(str(bronze_dir))
        .select(*clean_columns(VIAJES_RAW_COLUMNS))
    )

    out_dir = Path(out_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        plans = transform_viajes_df(batch_df, cut, year, month)
        tagged = plans["tagged"].cache()
        try:
            valid = tagged.filter(F.col(REASON_COL).isNull()).drop(REASON_COL)
            invalid = tagged.filter(F.col(REASON_COL).isNotNull()).withColumnRenamed(
                REASON_COL, "reason_code"
            )
            valid.write.mode("append").parquet(str(out_dir / "trips"))
            invalid.write.mode("append").parquet(str(out_dir / "quarantine"))
        finally:
            tagged.unpersist()

    writer = (
        raw.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(checkpoint_dir))
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_boardings_30m(
    events: DataFrame,
    ts_col: str = "tiempo_subida",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked 30-minute tumbling-window boardings aggregate — the
    streaming realization of ``fct_boardings_30m``. ``events`` is a
    streaming DF of typed validations; late rows beyond the watermark
    are dropped instead of quarantined (streaming semantics)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), "30 minutes").alias("w"),
            "parada_subida",
            "tipo_transporte",
            "tipo_dia",
        )
        .agg(
            F.count("*").alias("boardings"),
            F.sum("fExpansionServicioPeriodoTS").alias("boardings_expanded"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("parada_subida").alias("stop_code"),
            F.col("tipo_transporte").alias("mode_code"),
            "tipo_dia",
            "boardings",
            "boardings_expanded",
        )
    )


def streaming_sessions(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked session windows over a stream — the streaming twin
    of ``operators.windows.sessionize`` (same native ``session_window``
    primitive, so batch and stream agree row-for-row on closed
    sessions). Append mode emits a session only once the watermark
    passes its end: the state store holds exactly the OPEN sessions
    per key, bounded by key cardinality, and a session's row is final
    the moment it is emitted (no retractions downstream)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"), key_col
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


_CHAIN_STATE_SCHEMA = "n_legs long, last_ts timestamp"
_CHAIN_OUT_SCHEMA = (
    "id_tarjeta string, chain_legs long, first_leg boolean, emitted_at timestamp"
)


def _chain_fn(key, pdf_iter, state: GroupState):
    """Per-card running leg counter with a 60-min inactivity timeout —
    a new chain (trip) starts when the card is idle longer than the
    transfer window. Everything imported locally: the closure must be
    self-contained for executor pickling."""
    import pandas as pd

    if state.hasTimedOut:
        state.remove()
        return iter([])

    n_legs, last_ts = state.get if state.exists else (0, None)
    rows = []
    for pdf in pdf_iter:
        pdf = pdf.sort_values("tiempo_subida")
        for ts in pdf["tiempo_subida"]:
            if last_ts is not None and (ts - last_ts).total_seconds() > 3600:
                n_legs = 0  # idle > 60 min → new trip chain
            n_legs += 1
            rows.append(
                {
                    "id_tarjeta": key[0],
                    "chain_legs": n_legs,
                    "first_leg": n_legs == 1,
                    "emitted_at": ts,
                }
            )
            last_ts = ts
    state.update((n_legs, last_ts))
    state.setTimeoutDuration(60 * 60 * 1000)
    return iter([pd.DataFrame(rows)])


def stream_trip_chains(validations: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): chain legs
    into trips per card using a 60-minute inactivity gap. ``validations``
    is a streaming DF with at least (id_tarjeta, tiempo_subida)."""
    return (
        validations.groupBy("id_tarjeta")
        .applyInPandasWithState(
            _chain_fn,
            outputStructType=_CHAIN_OUT_SCHEMA,
            stateStructType=_CHAIN_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def streaming_dedup(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermark-bounded exact dedup — the streaming twin of the batch
    exact-dedup operators (``operators/dedup.keep_latest`` and the
    ``exact_dedup_summary`` fingerprint groupBy).

    ``dropDuplicatesWithinWatermark`` keeps ONE row per key seen
    within the watermark horizon and, critically for 100 TB streams,
    bounds the state store by (keys alive inside the horizon) instead
    of growing forever the way a plain streaming ``dropDuplicates``
    on keys would. Semantics: the first-arriving row of each key is
    emitted; any duplicate arriving while the key is still inside the
    watermark window is dropped; a duplicate arriving later than the
    horizon is treated as new (at-least-once upstream should size the
    watermark to its redelivery bound).

    The batch twin for differential testing is
    ``df.dropDuplicates(keys)`` when all duplicates fall inside one
    horizon (pinned by tests/test_streaming.py).
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def _guard_partitioned_sink_layout(*dirs: str) -> None:
    """Fail fast when a sink directory still holds the pre-upgrade
    FLAT layout (root-level ``*.parquet`` from the old plain-append
    sinks). The current sinks write ``batch_id=<id>`` partition
    subdirectories; Spark's partition discovery refuses a directory
    that mixes both ("conflicting directory structures"), and the
    reader-visible schema gains a ``batch_id`` column. Migrate by
    moving legacy files into a ``batch_id=-1`` subdirectory (or
    pointing the stream at a fresh out_dir)."""
    from pathlib import Path as _Path

    for d in dirs:
        p = _Path(d)
        if not p.is_dir():
            continue
        legacy = [f.name for f in p.iterdir() if f.suffix == ".parquet"]
        if legacy:
            raise ValueError(
                f"{d} contains root-level parquet files from the "
                f"pre-partitioned flat-append layout (e.g. {legacy[0]}); "
                "the sink now writes batch_id=<id> partition directories "
                "and Spark cannot read a mix of both. Move the legacy "
                "files into a batch_id=-1 subdirectory or use a fresh "
                "out_dir."
            )


def stream_dedup_against_index(
    events: DataFrame,
    index_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.85,
    id_col: str = "doc_id",
    text_col: str = "text",
    est_margin: float | None = None,
):
    """Streaming corpus intake with incremental near-dedup: every
    arriving micro-batch is near-dup-checked against the PERSISTED
    MinHash index (``operators.dedup_text.build_minhash_index``) and
    split into ``<out_dir>/accepted`` (no corpus match) and
    ``<out_dir>/near_dups`` (the matching pairs with their exact
    Jaccard). The corpus signatures are computed ONCE at index build;
    each micro-batch costs O(batch + matches) — the streaming twin of
    ``minhash_dedup_incremental``, sharing its recipe sidecar so
    banding matches are identical to a batch run.

    foreachBatch (not a continuous stateful operator) because the
    index is an at-rest artifact. foreachBatch is at-least-once, so
    each sink writes into a ``batch_id=<id>`` partition directory
    with overwrite: a replayed micro-batch rewrites its own partition
    instead of appending duplicates — idempotent, restart-safe via
    the checkpoint. Readers see ``batch_id`` as a partition column.
    ``est_margin`` forwards to ``minhash_dedup_incremental``'s
    signature-estimate candidate prune (the hot-bucket guard for
    corpora with shared boilerplate; see its docstring).
    Returns the started StreamingQuery."""
    from pathlib import Path as _Path

    from ..operators.dedup_text import minhash_dedup_incremental

    accepted_dir = str(_Path(out_dir) / "accepted")
    pairs_dir = str(_Path(out_dir) / "near_dups")
    _guard_partitioned_sink_layout(accepted_dir, pairs_dir)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        mh_pins: list = []
        try:
            pairs = minhash_dedup_incremental(
                batch_df, index_dir, threshold, id_col=id_col,
                text_col=text_col, est_margin=est_margin, pins=mh_pins,
            ).persist()  # fmt: skip
            pairs.write.mode("overwrite").parquet(
                f"{pairs_dir}/batch_id={batch_id}"
            )
            dup_ids = pairs.select(
                F.col("doc_new").alias(id_col)
            ).distinct()
            batch_df.join(dup_ids, id_col, "left_anti").write.mode(
                "overwrite"
            ).parquet(f"{accepted_dir}/batch_id={batch_id}")
            pairs.unpersist()
        finally:
            for p in mh_pins:
                p.unpersist()
            batch_df.unpersist()

    return (
        events.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_quality_screen(
    docs: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    redact: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Streaming corpus intake with quality quarantine: every
    arriving micro-batch runs the Gopher rule chain; passing docs
    (optionally PII-redacted) append to ``<out_dir>/accepted``,
    failures append to ``<out_dir>/rejected`` WITH their first-
    failing reason code — the corpus-domain twin of the silver
    stream's quarantine (documents are never dropped silently).

    foreachBatch for the same reason as the dedup intake, and with
    the same idempotency discipline: each sink writes its micro-batch
    into a ``batch_id=<id>`` partition with overwrite, so an
    at-least-once replay rewrites its own partition instead of
    duplicating rows. The rule chain and redaction are map-only, so
    each micro-batch is one narrow pass. Returns the StreamingQuery."""
    from pathlib import Path as _Path

    from ..functions.gopher import gopher_reason
    from ..operators.pii import redact_pii

    accepted_dir = str(_Path(out_dir) / "accepted")
    rejected_dir = str(_Path(out_dir) / "rejected")
    _guard_partitioned_sink_layout(accepted_dir, rejected_dir)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        tagged = batch_df.withColumn(
            "__reason", gopher_reason(F.col(text_col))
        ).persist()
        try:
            accepted = tagged.filter(F.col("__reason").isNull()).drop("__reason")
            if redact:
                accepted = accepted.withColumn(
                    text_col, redact_pii(F.col(text_col))
                )
            accepted.write.mode("overwrite").parquet(
                f"{accepted_dir}/batch_id={batch_id}"
            )
            tagged.filter(F.col("__reason").isNotNull()).withColumnRenamed(
                "__reason", "reason_code"
            ).write.mode("overwrite").parquet(
                f"{rejected_dir}/batch_id={batch_id}"
            )
        finally:
            tagged.unpersist()

    return (
        docs.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
