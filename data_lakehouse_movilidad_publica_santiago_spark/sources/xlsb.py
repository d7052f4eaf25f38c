"""Minimal pure-Python XLSB (MS-XLSB / BIFF12) reader.

The reference ingests the monthly ``subidas_30m`` workbook with
pyxlsb (build_lake.py:352-444: list sheets, capture the FICHA
metadata sheet as key→value, stream the data sheet's rows to
pipe-CSV). pyxlsb is not installed in this container, so S4 would
otherwise be import-gated dead code; this module implements the small
slice of the public [MS-XLSB] binary format that workbook needs:

- BIFF12 record stream: 1-2 byte record id (7 bits per byte,
  continuation bit 0x80), 1-4 byte 7-bit-varint payload length;
- workbook part: BrtBundleSh (0x9C) → sheet name + relationship id,
  resolved to a worksheet part via the OPC rels XML;
- shared strings part: BrtSstItem (0x13);
- worksheet part: BrtRowHdr (0x00) + cell records BrtCellBlank/Rk/
  Error/Bool/Real/St/Isst (0x01-0x07) and their formula twins
  BrtFmlaString/Num/Bool/Error (0x08-0x0B), incl. RkNumber decoding
  (fX100 / fInt packing).

Only cell VALUES are decoded (styles/formats/formulas skipped) —
exactly what the reference conversion consumes.
"""

from __future__ import annotations

import struct
import zipfile
from pathlib import Path
from typing import Any, BinaryIO, Iterator
from xml.etree import ElementTree

# BIFF12 record ids ([MS-XLSB] §2.3)
_BRT_ROW_HDR = 0x00
_BRT_CELL_BLANK = 0x01
_BRT_CELL_RK = 0x02
_BRT_CELL_ERROR = 0x03
_BRT_CELL_BOOL = 0x04
_BRT_CELL_REAL = 0x05
_BRT_CELL_ST = 0x06
_BRT_CELL_ISST = 0x07
_BRT_FMLA_STRING = 0x08
_BRT_FMLA_NUM = 0x09
_BRT_FMLA_BOOL = 0x0A
_BRT_FMLA_ERROR = 0x0B
_BRT_SST_ITEM = 0x13
_BRT_BUNDLE_SH = 0x9C

_CELL_RECORDS = frozenset(range(_BRT_CELL_BLANK, _BRT_FMLA_ERROR + 1))


def _read_record_id(fh: BinaryIO) -> int | None:
    """Record id: 7 bits per byte, bit 0x80 = one more byte (max 2)."""
    b = fh.read(1)
    if not b:
        return None
    v = b[0]
    if v & 0x80:
        b2 = fh.read(1)
        if not b2:
            return None
        return (v & 0x7F) | ((b2[0] & 0x7F) << 7)
    return v


def _read_record_len(fh: BinaryIO) -> int | None:
    """Payload length: 7-bit varint, 1-4 bytes."""
    out = 0
    for shift in range(0, 28, 7):
        b = fh.read(1)
        if not b:
            return None
        out |= (b[0] & 0x7F) << shift
        if not (b[0] & 0x80):
            return out
    return out


def _records(fh: BinaryIO) -> Iterator[tuple[int, bytes]]:
    while True:
        rid = _read_record_id(fh)
        if rid is None:
            return
        ln = _read_record_len(fh)
        if ln is None:
            return
        yield rid, fh.read(ln)


def _wide_str(buf: bytes, off: int) -> tuple[str, int]:
    """XLWideString: 4-byte char count + UTF-16LE payload."""
    (cch,) = struct.unpack_from("<I", buf, off)
    off += 4
    if cch == 0xFFFFFFFF:  # XLNullableWideString null marker
        return "", off
    end = off + 2 * cch
    return buf[off:end].decode("utf-16-le"), end


def _decode_rk(raw: int) -> float | int:
    """RkNumber: bit0 = ÷100, bit1 = int; value in bits 2-31."""
    f_x100 = raw & 0x1
    f_int = raw & 0x2
    if f_int:
        # signed 30-bit integer (arithmetic shift)
        v: float | int = (raw & 0xFFFFFFFF) >> 2
        if raw & 0x80000000:
            v -= 1 << 30
    else:
        (v,) = struct.unpack("<d", struct.pack("<Q", (raw & 0xFFFFFFFC) << 32))
    if f_x100:
        v = v / 100
        if f_int and float(v).is_integer():
            v = int(v)
    return v


class XlsbWorkbook:
    """Read-only XLSB workbook: ``sheets`` + ``rows(sheet)``.

    ``rows`` yields ``(row_index, values)`` where ``values`` is a
    dense list from column 0 through the right-most populated cell of
    that row (gaps are None) — the shape the reference's row loop
    expects from pyxlsb.
    """

    def __init__(self, path: str | Path) -> None:
        self._zf = zipfile.ZipFile(path)
        self._sst: list[str] | None = None
        self.sheets: list[str] = []
        self._sheet_parts: dict[str, str] = {}
        try:
            self._load_workbook()
        except BaseException:
            self._zf.close()
            raise

    def __enter__(self) -> "XlsbWorkbook":
        return self

    def __exit__(self, *exc: object) -> None:
        self.close()

    def close(self) -> None:
        self._zf.close()

    def _load_workbook(self) -> None:
        rels: dict[str, str] = {}
        ns = "{http://schemas.openxmlformats.org/package/2006/relationships}"
        with self._zf.open("xl/_rels/workbook.bin.rels") as fh:
            for rel in ElementTree.parse(fh).getroot().iter(f"{ns}Relationship"):
                target = rel.get("Target", "")
                if target.startswith("/"):
                    target = target.lstrip("/")
                else:
                    target = "xl/" + target
                rels[rel.get("Id", "")] = target
        with self._zf.open("xl/workbook.bin") as fh:
            for rid, payload in _records(fh):
                if rid != _BRT_BUNDLE_SH:
                    continue
                # hsState (4) + iTabID (4), then relId + name strings
                off = 8
                rel_id, off = _wide_str(payload, off)
                name, off = _wide_str(payload, off)
                self.sheets.append(name)
                if rel_id in rels:
                    self._sheet_parts[name] = rels[rel_id]

    def _shared_strings(self) -> list[str]:
        if self._sst is None:
            self._sst = []
            try:
                fh = self._zf.open("xl/sharedStrings.bin")
            except KeyError:
                return self._sst
            with fh:
                for rid, payload in _records(fh):
                    if rid == _BRT_SST_ITEM:
                        # flags byte, then the string (rich-text runs
                        # follow the base string; values ignore them)
                        s, _ = _wide_str(payload, 1)
                        self._sst.append(s)
        return self._sst

    def _resolve(self, sheet: str | int) -> str:
        if isinstance(sheet, int):
            # pyxlsb convention: 1-based index
            name = self.sheets[sheet - 1]
        else:
            name = sheet
        return self._sheet_parts[name]

    def rows(self, sheet: str | int) -> Iterator[tuple[int, list[Any]]]:
        """Yield ``(row_index, values)`` per BrtRowHdr — including
        rows whose cells are all blank/error (an empty values list),
        matching pyxlsb's behavior so row alignment is preserved for
        sheets with styled-blank rows."""
        sst = self._shared_strings()
        part = self._resolve(sheet)
        row_idx: int | None = None
        cells: dict[int, Any] = {}
        with self._zf.open(part) as fh:
            for rid, payload in _records(fh):
                if rid == _BRT_ROW_HDR:
                    if row_idx is not None:
                        yield row_idx, _dense(cells)
                    (row_idx,) = struct.unpack_from("<I", payload, 0)
                    cells = {}
                elif rid in _CELL_RECORDS:
                    (col,) = struct.unpack_from("<I", payload, 0)
                    val = _cell_value(rid, payload, sst)
                    if val is not None:
                        cells[col] = val
            if row_idx is not None:
                yield row_idx, _dense(cells)


def _dense(cells: dict[int, Any]) -> list[Any]:
    if not cells:
        return []
    width = max(cells) + 1
    return [cells.get(i) for i in range(width)]


def _cell_value(rid: int, payload: bytes, sst: list[str]) -> Any:
    # cell records share an 8-byte prefix: column (4) + style/flags (4)
    off = 8
    if rid in (_BRT_CELL_BLANK, _BRT_CELL_ERROR, _BRT_FMLA_ERROR):
        return None
    if rid == _BRT_CELL_RK:
        (raw,) = struct.unpack_from("<I", payload, off)
        return _decode_rk(raw)
    if rid in (_BRT_CELL_BOOL, _BRT_FMLA_BOOL):
        return bool(payload[off])
    if rid in (_BRT_CELL_REAL, _BRT_FMLA_NUM):
        (v,) = struct.unpack_from("<d", payload, off)
        return v
    if rid in (_BRT_CELL_ST, _BRT_FMLA_STRING):
        s, _ = _wide_str(payload, off)
        return s
    if rid == _BRT_CELL_ISST:
        (idx,) = struct.unpack_from("<I", payload, off)
        return sst[idx] if idx < len(sst) else None
    return None
