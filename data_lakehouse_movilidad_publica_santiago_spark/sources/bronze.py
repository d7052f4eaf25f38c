"""Bronze ingestion utilities (reference build_lake.py re-expressed).

- ``ingest_csv_partition`` (S2/S3/S11): land one or many source CSVs
  as a bronze partition — count rows distributively, write
  ``_meta.json``. Multi-file inputs stay multi-file (Spark unions
  them at read time; no driver-side concat like the reference's
  ``pl.concat(...).sink_csv``, build_lake.py:313-324).
- ``safe_extract_zip`` (S12): zip-bomb / path-traversal / symlink
  guarded extraction (build_lake.py:93-217 semantics).
- ``xlsb_to_csv`` / ``convert_subidas_xlsb`` (S4): XLSB ingest via the
  bundled pure-Python BIFF12 reader (``sources/xlsb.py``) — no pyxlsb
  dependency; same sheet-iteration + FICHA-capture contract as the
  reference (build_lake.py:352-444).
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


def _fmt_cell(v: object) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float) and v.is_integer():
        # the reference's Polars round-trip prints integral floats
        # without the trailing .0 (infer_schema_length=0 → str)
        return str(int(v))
    return str(v)


def xlsb_to_csv(xlsb_path: Path, out_csv: Path, sheet: str | int = 1) -> Path:
    """XLSB worksheet → pipe-CSV dump (S4), via the bundled pure-Python
    BIFF12 reader (``sources/xlsb.py``) — no pyxlsb needed."""
    from .xlsb import XlsbWorkbook

    with XlsbWorkbook(xlsb_path) as wb:
        with open(out_csv, "w", encoding="utf-8") as fh:
            for _, values in wb.rows(sheet):
                fh.write("|".join(_fmt_cell(v) for v in values))
                fh.write("\n")
    return out_csv


def convert_subidas_xlsb(
    xlsb_path: Path, out_csv: Path
) -> dict[str, object]:
    """Full reference conversion contract for the monthly subidas
    workbook (build_lake.py:352-444): capture the FICHA sheet as a
    key→value dict, pick the data sheet (first non-FICHA), take the
    first non-empty row as the header, write the remaining rows as
    pipe-CSV (header first), and return the sidecar metadata fields
    (columns / row_count / ficha / source_sheet)."""
    from .xlsb import XlsbWorkbook

    with XlsbWorkbook(xlsb_path) as wb:
        ficha: dict[str, object] = {}
        ficha_sheet = next(
            (s for s in wb.sheets if "FICHA" in s.upper()), None
        )
        if ficha_sheet:
            for _, vals in wb.rows(ficha_sheet):
                if len(vals) >= 2 and vals[0] is not None:
                    ficha[str(vals[0])] = vals[1]
        data_sheet = next(
            (s for s in wb.sheets if "FICHA" not in s.upper()), None
        )
        if data_sheet is None:
            # a FICHA-only (or sheetless) workbook has no data to
            # export — fail loudly instead of silently re-dumping the
            # FICHA sheet as data
            raise ValueError(
                f"{xlsb_path}: no non-FICHA data sheet found "
                f"(sheets: {wb.sheets!r})"
            )
        header: list[str] | None = None
        n_rows = 0
        with open(out_csv, "w", encoding="utf-8") as fh:
            for _, values in wb.rows(data_sheet):
                # defensive parity with pyxlsb, which can yield
                # all-None rows (our reader never does)
                if all(v is None for v in values):
                    continue
                if header is None:
                    header = [
                        str(v) if v is not None else "" for v in values
                    ]
                    fh.write("|".join(header) + "\n")
                    continue
                # reference parity (build_lake.py:421-423): rows are
                # clipped/padded to the header width — cells beyond the
                # right-most header column are dropped there too
                padded = [
                    values[i] if i < len(values) else None
                    for i in range(len(header))
                ]
                fh.write("|".join(_fmt_cell(v) for v in padded) + "\n")
                n_rows += 1
    return {
        "columns": header or [],
        "column_count": len(header) if header else 0,
        "row_count": n_rows,
        "source_sheet": data_sheet,
        "ficha": ficha,
    }
