"""Lake catalog: Hive-layout partition discovery + `_meta.json` sidecars.

Parity: the reference aggregates per-partition ``_meta.json`` into
``lake_catalog.json`` (build_catalog.py:14-106) and resolves partitions
from it (src/silver/catalog.py:131-231). Spark's own catalog/partition
discovery covers query-time pruning; this thin manifest keeps the
row-count auditing and the authoritative per-partition column lists.

Layout (identical to the reference lake):
    <lake>/raw/dtpm/dataset=<d>/year=YYYY/month=MM/cut=<cut>/{*.csv,_meta.json}
    <lake>/processed/dtpm/dataset=<d>/.../cut=<cut>/<output>.parquet
    <lake>/processed/_quality/...  /quality.json
    <lake>/processed/_quarantine/.../{invalid,valid}.parquet
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path


@dataclass(frozen=True)
class CutPartition:
    """One (dataset, cut) load unit."""

    dataset: str
    year: int
    month: int
    cut: str
    partition_dir: Path
    columns: tuple[str, ...] = field(default_factory=tuple)
    meta_row_count: int | None = None

    @property
    def csv_paths(self) -> list[str]:
        found = sorted(str(p) for p in self.partition_dir.glob("*.csv"))
        if not found:
            raise FileNotFoundError(f"no CSV in {self.partition_dir}")
        return found

    def _layer_dir(self, lake_root: Path, layer: str) -> Path:
        return (
            lake_root
            / "processed"
            / layer
            / f"dataset={self.dataset}"
            / f"year={self.year}"
            / f"month={self.month:02d}"
            / f"cut={self.cut}"
        )

    def silver_dir(self, lake_root: Path) -> Path:
        return self._layer_dir(lake_root, "dtpm")

    def quality_dir(self, lake_root: Path) -> Path:
        return self._layer_dir(lake_root, "_quality")

    def quarantine_dir(self, lake_root: Path) -> Path:
        return self._layer_dir(lake_root, "_quarantine")


def write_meta(
    partition_dir: Path,
    dataset: str,
    cut: str,
    year: int,
    month: int,
    columns: list[str],
    row_count: int,
) -> Path:
    """Write the `_meta.json` sidecar (build_lake.py:79-81 parity)."""
    meta = {
        "dataset": dataset,
        "cut": cut,
        "year": year,
        "month": month,
        "columns": columns,
        "row_count": row_count,
        "separator": "|",
        "encoding": "utf-8",
    }
    path = partition_dir / "_meta.json"
    path.write_text(json.dumps(meta, indent=2), encoding="utf-8")
    return path


# canonical pipeline order (reference TRANSFORM_REGISTRY,
# transforms.py:1026-1030): viajes first so the later etapas load
# same-day-ENRICHES harvested dims instead of being overwritten
_DATASET_ORDER = {"viajes": 0, "etapas": 1, "subidas_30m": 2}


def discover_partitions(
    lake_root: Path,
    dataset: str | None = None,
    cut: str | None = None,
) -> list[CutPartition]:
    """Scan `<lake>/raw/dtpm` for partitions with `_meta.json`,
    deterministic order: canonical dataset order, then cut (sorted
    globs — load_gold.py:109-113 parity)."""
    out: list[CutPartition] = []
    raw_root = Path(lake_root) / "raw" / "dtpm"
    for meta_path in sorted(raw_root.glob("dataset=*/year=*/month=*/cut=*/_meta.json")):
        meta = json.loads(meta_path.read_text(encoding="utf-8"))
        if dataset and meta["dataset"] != dataset:
            continue
        if cut and str(meta["cut"]) != cut:
            continue
        out.append(
            CutPartition(
                dataset=meta["dataset"],
                year=int(meta["year"]),
                month=int(meta["month"]),
                cut=str(meta["cut"]),
                partition_dir=meta_path.parent,
                columns=tuple(meta["columns"]),
                meta_row_count=meta.get("row_count"),
            )
        )
    out.sort(key=lambda p: (_DATASET_ORDER.get(p.dataset, 99), p.dataset, p.cut))
    return out
