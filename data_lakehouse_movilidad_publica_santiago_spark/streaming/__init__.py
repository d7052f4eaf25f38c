"""Structured Streaming surface (SURVEY §2.10).

The reference is a batch pipeline whose unit of work — one "cut" per
run with quarantine splitting and idempotent loads — is exactly the
micro-batch contract. This package offers the streaming realization:
file-source streams over the bronze layout, foreachBatch quarantine
splits reusing the SAME silver transform plans, watermarked tumbling
windows for the 30-minute boardings rollup, and a stateful per-card
trip-chain counter as the custom-stateful-operator example.
"""

from .silver_stream import (
    stream_silver_viajes,
    streaming_boardings_30m,
    streaming_dedup,
    stream_dedup_against_index,
    stream_quality_screen,
    stream_trip_chains,
)

__all__ = [
    "stream_silver_viajes",
    "streaming_boardings_30m",
    "streaming_dedup",
    "stream_dedup_against_index",
    "stream_quality_screen",
    "stream_trip_chains",
]
