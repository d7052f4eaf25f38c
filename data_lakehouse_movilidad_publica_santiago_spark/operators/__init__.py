"""Reusable relational operators — the engine's §2 inventory pieces
that aren't a single built-in call."""

from .quality import QualityRule, split_by_quality, tag_quality
from .dedup import dedup_keep_latest
from .asof import asof_join, snapshots_to_scd2
from .windows import pct_of_total, top_k_per_group

__all__ = [
    "QualityRule",
    "tag_quality",
    "split_by_quality",
    "dedup_keep_latest",
    "asof_join",
    "snapshots_to_scd2",
    "pct_of_total",
    "top_k_per_group",
]
