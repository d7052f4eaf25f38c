"""Bronze ingestion utilities (reference build_lake.py re-expressed).

- ``ingest_csv_partition`` (S2/S3/S11): land one or many source CSVs
  as a bronze partition — count rows distributively, write
  ``_meta.json``. Multi-file inputs stay multi-file (Spark unions
  them at read time; no driver-side concat like the reference's
  ``pl.concat(...).sink_csv``, build_lake.py:313-324).
- ``safe_extract_zip`` (S12): zip-bomb / path-traversal / symlink
  guarded extraction (build_lake.py:93-217 semantics).
- ``xlsb_to_csv`` (S4): gated behind pyxlsb availability — raises a
  clear error in environments without it (this container), same
  sheet-iteration contract where present.
"""

from __future__ import annotations

import shutil
import zipfile
from pathlib import Path

from pyspark.sql import SparkSession

from .catalog import write_meta
from .csv_source import read_pipe_csv

MAX_EXTRACT_BYTES = 20 * 1024**3  # zip-bomb guard
MAX_RATIO = 200  # compressed→uncompressed blow-up guard


def ingest_csv_partition(
    spark: SparkSession,
    src_csvs: list[Path],
    lake_root: Path,
    dataset: str,
    cut: str,
    year: int,
    month: int,
    columns: list[str],
) -> Path:
    """Copy source CSVs into the bronze Hive layout + `_meta.json`
    with an authoritative distributed row count."""
    pdir = (
        Path(lake_root)
        / "raw"
        / "dtpm"
        / f"dataset={dataset}"
        / f"year={year}"
        / f"month={month:02d}"
        / f"cut={cut}"
    )
    pdir.mkdir(parents=True, exist_ok=True)
    for src in src_csvs:
        shutil.copy2(src, pdir / src.name)
    row_count = read_pipe_csv(
        spark, [str(pdir / s.name) for s in src_csvs], columns
    ).count()
    write_meta(pdir, dataset, cut, year, month, columns, row_count)
    return pdir


def safe_extract_zip(zip_path: Path, dest: Path) -> list[Path]:
    """Guarded ZIP extraction: rejects absolute paths, ``..``
    traversal, symlinks, and decompression bombs."""
    dest = Path(dest)
    dest.mkdir(parents=True, exist_ok=True)
    out: list[Path] = []
    with zipfile.ZipFile(zip_path) as zf:
        total = 0
        for info in zf.infolist():
            name = info.filename
            if name.startswith(("/", "\\")) or ".." in Path(name).parts:
                raise ValueError(f"unsafe path in archive: {name!r}")
            mode = (info.external_attr >> 16) & 0o170000
            if mode == 0o120000:  # symlink
                raise ValueError(f"symlink in archive: {name!r}")
            total += info.file_size
            if total > MAX_EXTRACT_BYTES:
                raise ValueError("archive exceeds extraction size cap")
            if info.compress_size and info.file_size / info.compress_size > MAX_RATIO:
                raise ValueError(f"suspicious compression ratio: {name!r}")
        for info in zf.infolist():
            if info.is_dir():
                continue
            target = dest / info.filename
            target.parent.mkdir(parents=True, exist_ok=True)
            with zf.open(info) as src, open(target, "wb") as dst:
                shutil.copyfileobj(src, dst)
            out.append(target)
    return out


def xlsb_to_csv(xlsb_path: Path, out_csv: Path, sheet: str | int = 1) -> Path:
    """XLSB workbook → pipe-CSV (S4). Requires pyxlsb (not in this
    container) — import-gated with a precise error."""
    try:
        from pyxlsb import open_workbook
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "xlsb_to_csv requires the 'pyxlsb' package, which is not "
            "installed in this environment; land the workbook as CSV "
            "upstream or install pyxlsb at deployment"
        ) from exc
    with open_workbook(str(xlsb_path)) as wb:  # pragma: no cover
        with wb.get_sheet(sheet) as ws, open(out_csv, "w", encoding="utf-8") as fh:
            for row in ws.rows():
                fh.write("|".join("" if c.v is None else str(c.v) for c in row))
                fh.write("\n")
    return out_csv
