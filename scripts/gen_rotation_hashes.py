"""Regenerate ROTATION_HASHES.json — the per-gate implementation-
fingerprint baseline the changed-first rotation in __spark_entry__
compares against (VERDICT r12 item 3).

Run at the START of an optimization/build round, BEFORE touching any
package code, so the baseline captures the previous round's end-state
tree: every gate whose implementation the round then changes gets a
differing live fingerprint and floats to the head of the driver's
50-entry correctness window.

Usage: python scripts/gen_rotation_hashes.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as e  # noqa: E402


def main() -> None:
    merged = e._merged_queries()
    fps = e._impl_fingerprints(merged)
    out = Path(__file__).resolve().parent.parent / "ROTATION_HASHES.json"
    out.write_text(json.dumps(dict(sorted(fps.items())), indent=1) + "\n")
    empty = [k for k, v in fps.items() if not v]
    print(f"wrote {len(fps)} fingerprints to {out}")
    if empty:
        print(f"WARNING: empty fingerprints (getsource failed): {empty}")
        sys.exit(1)


if __name__ == "__main__":
    main()
