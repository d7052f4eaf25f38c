"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship aggregation at sf0.001;
``queries()`` exposes the SURVEY §2 operator inventory implemented in
``data_lakehouse_movilidad_publica_santiago_spark``; ``oracle_sql()``
gives the DuckDB-equivalent ANSI SQL per query for the driver's
differential correctness gate.

The driver's CORRECTNESS snapshot covers the FIRST 50 entries of
``queries()`` in dict-insertion order, so the ordering is a rotation
schedule.  Rotation policy (round 13+, changed-first then age-based):
gates whose IMPLEMENTATION fingerprint (sha256 over the gate
function's source plus the package-internal module closure it
imports — see ``_impl_fingerprints``) differs from the committed
``ROTATION_HASHES.json`` baseline sort FIRST, so every gate whose
code was touched this round lands inside the driver's 50-entry
window instead of relying on self-reported oracle runs (VERDICT r12
item 3).  Within each class (changed / unchanged), gates are ordered
by the round of their MOST RECENT fully-green row across the
``CORRECTNESS_r*.json`` artifacts committed next to this file —
never-snapshotted gates first, then stalest-green first, ties broken
by module insertion order (the round-9+ age policy).  The baseline
is regenerated at the START of each round from the previous round's
end-state tree (``scripts/gen_rotation_hashes.py``), so at driver
time the diff is exactly "what this round changed".  Every gate
stays present regardless of order — the total is ``len(queries())``
(asserted equal between ``queries()`` and ``oracle_sql()`` by
``tests/test_entry_contract.py``), and every key has a full
value-hash DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_lakehouse_movilidad_publica_santiago_spark.analytics import (
    business_gate,
    corpus_gate,
    inventory,
    inventory_llm,
    lake_gate,
    sql_surface_gate,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return inventory.q_pricing_summary(spark, "/root/testdata/sf0.001")


def _last_green_rounds() -> dict[str, int]:
    """Most recent round with a fully-green driver row per gate, read
    from the ``CORRECTNESS_r*.json`` artifacts committed next to this
    file.  Gates absent from every artifact (new this round, or a
    fresh clone without artifacts) map to nothing and sort first."""
    import json
    import re
    from glob import glob
    from pathlib import Path

    here = Path(__file__).resolve().parent
    out: dict[str, int] = {}
    for f in sorted(glob(str(here / "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)", f)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            d = json.loads(Path(f).read_text())
        except (OSError, ValueError):
            continue
        for k, v in d.items():
            if (
                isinstance(v, dict)
                and v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match")
                and not v.get("err")
            ):
                out[k] = max(out.get(k, 0), rnd)
    return out


_LAST_GREEN = _last_green_rounds()


def _impl_fingerprints(merged: dict) -> dict[str, str]:
    """Per-gate implementation fingerprint: sha256 of the gate
    function's own source concatenated with the contents of every
    package-internal module in its import closure (the ``from ..x.y
    import`` statements in the function body and, transitively, in
    each imported module).  A gate's fingerprint therefore changes
    exactly when code it executes changes, whether the edit is in the
    gate itself or in an operator module underneath it."""
    import hashlib
    import inspect
    import re
    from pathlib import Path

    pkg = "data_lakehouse_movilidad_publica_santiago_spark"
    root = Path(__file__).resolve().parent / pkg
    imp_re = re.compile(
        rf"^\s*from\s+(\.+|{pkg})([\w.]*)\s+import\s+\(?([\w,\s]+)\)?",
        re.M,
    )
    src_cache: dict[Path, str] = {}

    def read(p: Path) -> str:
        if p not in src_cache:
            try:
                src_cache[p] = p.read_text()
            except OSError:
                src_cache[p] = ""
        return src_cache[p]

    def deps(text: str, mod_dir: Path) -> set[Path]:
        out: set[Path] = set()
        for dots, modpath, names in imp_re.findall(text):
            base = root if dots == pkg else mod_dir
            if dots != pkg:
                for _ in range(len(dots) - 1):
                    base = base.parent
            target = base
            for part in modpath.strip(".").split("."):
                if part:
                    target = target / part
            cands = [target.with_suffix(".py"), target / "__init__.py"]
            cands += [
                (target / n.strip()).with_suffix(".py")
                for n in names.split(",")
                if n.strip()
            ]
            for c in cands:
                try:
                    inside = c.resolve().is_relative_to(root)
                except (OSError, ValueError):
                    inside = False
                if inside and c.is_file():
                    out.add(c.resolve())
        return out

    def closure(text: str, mod_dir: Path) -> set[Path]:
        seen: set[Path] = set()
        frontier = deps(text, mod_dir)
        while frontier:
            f = frontier.pop()
            if f in seen:
                continue
            seen.add(f)
            frontier |= deps(read(f), f.parent) - seen
        return seen

    top_imp_re = re.compile(r"^from\s+[\w.]+\s+import\b.*$", re.M)
    out: dict[str, str] = {}
    for name, fn in merged.items():
        try:
            fn_src = inspect.getsource(fn)
            mod_file = Path(inspect.getfile(fn)).resolve()
        except (OSError, TypeError):
            out[name] = ""
            continue
        # Closure seed: the gate function's own imports plus the
        # defining module's TOP-LEVEL imports (module-level helpers
        # the function calls resolve through those).  Seeding with the
        # whole module source would drag every sibling gate's operator
        # imports into every fingerprint and float entire modules at
        # once — too coarse for a 50-entry window.  The module file
        # itself is always hashed (shared helpers, oracle constants).
        top_imports = "\n".join(top_imp_re.findall(read(mod_file)))
        files = {mod_file} | closure(
            fn_src + "\n" + top_imports, mod_file.parent
        )
        h = hashlib.sha256(fn_src.encode())
        for f in sorted(files):
            h.update(str(f.relative_to(root)).encode())
            h.update(read(f).encode())
        out[name] = h.hexdigest()
    return out


_CHANGED_MEMO: list[frozenset[str]] = []


def _changed_since_baseline() -> frozenset[str]:
    """Gates whose implementation fingerprint differs from the
    committed ``ROTATION_HASHES.json`` baseline (captured from the
    previous round's end-state tree).  Always fingerprints the QUERY
    CALLABLES (``_merged_queries()``), never the oracle SQL strings,
    so ``queries()`` and ``oracle_sql()`` sort identically.  Missing
    baseline file → empty set (pure age rotation, the pre-round-13
    behavior).  Memoized — source files don't change under a running
    process."""
    if not _CHANGED_MEMO:
        import json
        from pathlib import Path

        path = Path(__file__).resolve().parent / "ROTATION_HASHES.json"
        try:
            baseline = json.loads(path.read_text())
        except (OSError, ValueError):
            _CHANGED_MEMO.append(frozenset())
            return _CHANGED_MEMO[0]
        merged = _merged_queries()
        fps = _impl_fingerprints(merged)
        _CHANGED_MEMO.append(
            frozenset(
                k
                for k in merged
                if fps.get(k) and fps[k] != baseline.get(k)
            )
        )
    return _CHANGED_MEMO[0]


def _rotated(merged: dict) -> dict:
    """Changed-first, then age-based rotation: gates whose
    implementation changed since the committed baseline sort first
    (so the driver's next 50-entry window re-proves them); within
    each class, never-green gates first (age -1), then stalest
    most-recent-green round; Python's stable sort keeps module
    insertion order within each (changed, age) class."""
    changed = _changed_since_baseline()
    ordered = sorted(
        merged,
        key=lambda k: (0 if k in changed else 1, _LAST_GREEN.get(k, -1)),
    )
    return {k: merged[k] for k in ordered}


def _merged_queries() -> dict:
    return {
        **inventory.QUERIES,
        **inventory_llm.QUERIES,
        **business_gate.QUERIES,
        **corpus_gate.QUERIES,
        **sql_surface_gate.QUERIES,
        **lake_gate.QUERIES,
    }


# the current window head, derived (not hand-maintained) — kept as a
# module attribute so tests can pin that the window is made of real,
# unique gate names
_ROTATION_FIRST: tuple[str, ...] = tuple(_rotated(_merged_queries()))[:50]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, plus the
    LLM-data-pipeline operator suite (dedup / similarity / text /
    multimodal / tumbling windows) and the business-corpus shape
    twins (analytics/business_gate.py).  Insertion order follows the
    age-based rotation policy documented at module top."""
    return _rotated(_merged_queries())


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent per query (same aliases).
    Every key in ``queries()`` has a full oracle — including the
    probabilistic operators (MinHash-LSH, SimHash, LSH-ANN), whose
    oracles replay the exact seeded hash algebra in SQL, and the
    multimodal Python stages, whose oracles recompute the Arrow-batch
    features from the raw bytes.  All value-hash-checkable."""
    return _rotated(
        {
            **inventory.ORACLE,
            **inventory_llm.ORACLE,
            **business_gate.ORACLE,
            **corpus_gate.ORACLE,
            **sql_surface_gate.ORACLE,
            **lake_gate.ORACLE,
        }
    )
