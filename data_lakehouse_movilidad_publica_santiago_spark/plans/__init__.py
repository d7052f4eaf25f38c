"""Plan-inspection helpers: assert the physical plans the engine is
designed to produce (pushdown, broadcast, no nested-loop as-of)."""

from .checks import (
    explain_str,
    has_broadcast_hash_join,
    has_nested_loop_join,
    pushed_filters,
    scan_read_schema,
)

__all__ = [
    "explain_str",
    "pushed_filters",
    "scan_read_schema",
    "has_broadcast_hash_join",
    "has_nested_loop_join",
]
