"""Reusable relational operators — the engine's §2 inventory pieces
that aren't a single built-in call."""

from .quality import QualityRule, split_by_quality, tag_quality
from .dedup import dedup_keep_latest
from .asof import asof_join, snapshots_to_scd2
from .windows import pct_of_total, top_k_per_group
from .dedup_text import (
    exact_dup_groups,
    jaccard_pairs_exact,
    minhash_lsh_pairs,
    simhash64,
    simhash_pairs,
)
from .similarity import (
    cosine_topk,
    embedding_near_dup_pairs,
    lsh_topk,
)
from .multimodal import extract_features, synthesize_media_from_documents

__all__ = [
    "QualityRule",
    "tag_quality",
    "split_by_quality",
    "dedup_keep_latest",
    "asof_join",
    "snapshots_to_scd2",
    "pct_of_total",
    "top_k_per_group",
    "exact_dup_groups",
    "jaccard_pairs_exact",
    "minhash_lsh_pairs",
    "simhash64",
    "simhash_pairs",
    "cosine_topk",
    "lsh_topk",
    "embedding_near_dup_pairs",
    "extract_features",
    "synthesize_media_from_documents",
]
