"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The Spark-side plumbing (schemas, batch iteration, partition-preserving
transforms) is real and tested; the actual media decode is STUBBED —
the container has no image/audio libraries — behind ``try_import``
gates with a deterministic fake so pipelines are testable end-to-end.
At deployment, swap ``_decode_image_stub`` for PIL/libvips inside the
same mapInPandas signature; nothing else changes.

Scale notes: payloads stay in executor memory only for the duration of
one Arrow batch (bound via spark.sql.execution.arrow.maxRecordsPerBatch);
feature outputs are small fixed-width arrays, so the shuffle after
extraction carries features, not media bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except Exception:
    _HAS_PIL = False

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("byte_len", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("byte_len", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _decode_image_stub(content: bytes) -> np.ndarray:
    """Deterministic fake decode: fold the bytes into FEATURE_DIM
    bucket SUMS. Integer-valued, so the features are exact in float32
    up to 2^24 per bucket (payloads ≲ 1 MiB) and the differential
    oracle can recompute them byte-for-byte in SQL. Replace with a
    real decoder (PIL → resize → pooled pixels) where the library
    exists."""
    if content is None or len(content) == 0:
        return np.zeros(FEATURE_DIM, dtype="float32")
    arr = np.frombuffer(content, dtype=np.uint8)
    pad = (-len(arr)) % FEATURE_DIM
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, dtype=np.uint8)])
    folded = arr.reshape(-1, FEATURE_DIM).sum(axis=0, dtype="int64")
    return folded.astype("float32")


def real_image_decode_available() -> bool:
    return _HAS_PIL


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature-extraction stage: Arrow batches in, fixed
    FEATURE_DIM float vectors out. Media bytes never cross a shuffle."""

    feature_dim = FEATURE_DIM

    # decode nested INSIDE the UDF so cloudpickle ships it by value —
    # executors must not need this package importable (the driver's
    # session may not carry our PYTHONPATH)
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        def decode(content: bytes | None) -> _np.ndarray:
            if content is None or len(content) == 0:
                return _np.zeros(feature_dim, dtype="float32")
            arr = _np.frombuffer(content, dtype=_np.uint8)
            pad = (-len(arr)) % feature_dim
            if pad:
                arr = _np.concatenate([arr, _np.zeros(pad, dtype=_np.uint8)])
            folded = arr.reshape(-1, feature_dim).sum(axis=0, dtype="int64")
            return folded.astype("float32")

        for pdf in it:
            feats = [
                decode(c if c is None or isinstance(c, bytes) else bytes(c))
                for c in pdf["content"]
            ]
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": [
                        0 if c is None else len(c) for c in pdf["content"]
                    ],
                    "feature": [f.tolist() for f in feats],
                }
            )

    return media.mapInPandas(batches, schema=_FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one row per planned sample
    timestamp from the metadata duration — the real decoder would
    seek these offsets. Pure Column math (no decode needed to plan)."""
    n = F.greatest(
        (F.col("meta.duration_ms") / F.lit(every_ms)).cast("int"), F.lit(1)
    )
    return media.filter(F.col("media_type") == "video").select(
        "media_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n - 1), lambda i: i * F.lit(every_ms)
            )
        ).alias("sample_ts_ms"),
    )


def synthesize_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from the documents
    fixture: payload = utf-8 bytes of the text, metadata from its
    shape. Lets the multimodal pipeline run on driver-provided data
    without inventing new inputs."""
    mtype = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    content = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        mtype.alias("media_type"),
        content.alias("content"),
        F.struct(
            F.concat(F.lit("application/x-fake-"), mtype).alias("mime"),
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            (F.octet_length(content) * 10).cast("int").alias("duration_ms"),
            F.octet_length(content).cast("long").alias("byte_len"),
        ).alias("meta"),
    )
