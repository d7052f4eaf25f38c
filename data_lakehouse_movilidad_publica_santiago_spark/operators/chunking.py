"""RAG/context chunking and deterministic global shuffle.

Two layout operators a training/retrieval corpus build needs after
cleaning and dedup:

- ``chunk_documents``: split each document into fixed-size
  overlapping token windows (the retrieval-augmented-generation
  chunking step). One ``posexplode`` over a computed list of chunk
  start offsets — a narrow map stage, no shuffle, no Python.
- ``global_shuffle``: a deterministic, seeded global permutation of
  the corpus with a STABLE global position for every row —  the
  "shuffle the training data" step. The permutation key is a pure
  hash of (seed, id): re-running on any cluster size, any
  partitioning, any retry reproduces the identical order. The global
  position is a two-pass distributed rank (range partition by key,
  per-partition ``row_number``, bounded driver-side offsets), NOT a
  single-partition ``ROW_NUMBER() OVER (ORDER BY ...)`` — the naive
  form funnels the whole corpus through one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Explode each document into whitespace-token windows of
    ``chunk_tokens`` tokens advancing by ``chunk_tokens - overlap``.

    Output grain: one row per (doc, chunk) with ``chunk_idx`` (0-based),
    ``start_tok`` (1-based first-token offset), ``n_tok`` (actual chunk
    length — the final chunk may be short), and ``chunk_md5`` (md5 of the
    space-joined chunk text, so verification never transports text).
    A trailing window fully covered by the previous one is not emitted
    (starts stop once a chunk reaches the end of the document)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"require 0 <= overlap < chunk_tokens (got {overlap=}, {chunk_tokens=})"
        )
    stride = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # last start: the smallest s with s + chunk_tokens - 1 >= n
    # (i.e. the first chunk that reaches the document's end), so the
    # tail is covered exactly once
    last_start = F.greatest(
        F.lit(1),
        (F.ceil((n - F.lit(chunk_tokens)).cast("double") / stride) * stride
         + F.lit(1)).cast("int"),
    )
    starts = F.sequence(F.lit(1), last_start, F.lit(stride))
    exploded = df.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("__toks"),
        F.posexplode(starts).alias("chunk_idx", "start_tok"),
    )
    chunk = F.slice(F.col("__toks"), F.col("start_tok"), chunk_tokens)
    return exploded.select(
        "doc_id",
        "chunk_idx",
        "start_tok",
        F.size(chunk).alias("n_tok"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )


def global_shuffle(
    df: DataFrame,
    seed: str,
    id_col: str = "doc_id",
    n_parts: int | None = None,
    pins: list | None = None,
) -> DataFrame:
    """Seeded deterministic permutation: every row gets ``shuffle_key``
    (md5 of ``seed || ':' || id``) and ``pos`` — its 1-based global rank
    in (key64, id) order, where ``key64`` is the first 8 hex digits of
    the md5 as a BIGINT. Epoch-reproducible: the key depends only on
    (seed, id), and ties (32-bit prefix collisions) break on id, so the
    order is total and identical across runs, partitionings, and
    retries. Ranking on the 8-byte prefix instead of the 32-char
    digest keeps the range shuffle and per-partition sort integer-
    cheap — measured 63 s → the string-key cost dominated at 50 M rows
    — while the full digest is still emitted for audit (recomputed
    from the id at output, so it never crosses the shuffle).

    Scale: ``repartitionByRange`` on the key gives ascending key ranges
    in ascending partition ids; pass 1 ranks within each partition, pass
    2 collects one row-count per partition (metadata-sized) and adds
    exclusive offsets. Writers can then lay the corpus out in shuffle
    order with ``repartitionByRange(pos)`` + sortWithinPartitions.

    The range-shuffled input must stay persisted until the RESULT is
    consumed (re-executed range bounds may differ — see pack_shards).
    Pass ``pins`` (a list) to receive the persisted handle and
    ``unpersist()`` it after your final action — or wrap with
    ``spread.release_pins`` when the final action is out of your hands
    (gate/bench harnesses) — instead of leaving the pin to die with
    the session. ``n_parts`` defaults to max(32, defaultParallelism)
    so big clusters spread the rank without a kwarg."""
    from .spread import default_range_parts

    if n_parts is None:
        n_parts = default_range_parts(df)
    md5_key = F.md5(F.concat_ws(":", F.lit(seed), F.col("doc_id")))
    keyed = df.select(F.col(id_col).alias("doc_id")).withColumn(
        "__key64", F.conv(F.substring(md5_key, 1, 8), 16, 10).cast("long")
    )
    # persist: the range shuffle samples its bounds; both passes and
    # the final join must observe the SAME partitioning (see
    # data_mix.pack_shards for the same pinning rationale)
    parts = (
        keyed.repartitionByRange(n_parts, "__key64", "doc_id")
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    if pins is not None:
        pins.append(parts)
    w = Window.partitionBy("__pid").orderBy("__key64", "doc_id")
    local = parts.withColumn("__local_rank", F.row_number().over(w))
    counts = {
        r["__pid"]: r["c"]
        for r in parts.groupBy("__pid").agg(F.count("*").alias("c")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = local.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()],
        "__pid int, __offset bigint",
    )
    return local.join(F.broadcast(off_df), "__pid").select(
        "doc_id",
        # audit column: the full digest, recomputed narrowly from the
        # id — it never rides the shuffle
        md5_key.alias("shuffle_key"),
        (F.col("__offset") + F.col("__local_rank")).alias("pos"),
    )
