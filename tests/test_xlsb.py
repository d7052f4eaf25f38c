"""Tests for the pure-Python BIFF12/XLSB reader (S4).

The fixture writer below constructs a workbook byte-by-byte from the
public [MS-XLSB] record layout (record-id/varint-length framing,
BrtBundleSh, BrtSstItem, BrtRowHdr, the cell records, RkNumber
packing) — independent of the reader's code paths — then the tests
assert the reader recovers the logical content, incl. the reference's
subidas conversion contract (FICHA capture + header + pipe-CSV).
"""

from __future__ import annotations

import struct
import zipfile
from pathlib import Path

import pytest

from data_lakehouse_movilidad_publica_santiago_spark.sources.bronze import (
    convert_subidas_xlsb,
    xlsb_to_csv,
)
from data_lakehouse_movilidad_publica_santiago_spark.sources.xlsb import (
    XlsbWorkbook,
)


# ── fixture writer (spec-driven, no dependency on the reader) ───────


def _rec(rid: int, payload: bytes) -> bytes:
    """BIFF12 framing: record id (1-2 bytes, 7-bit little chunks with
    0x80 continuation) + payload length (7-bit varint)."""
    if rid < 0x80:
        head = bytes([rid])
    else:
        head = bytes([(rid & 0x7F) | 0x80, (rid >> 7) & 0x7F])
    ln = len(payload)
    out = bytearray(head)
    while True:
        b = ln & 0x7F
        ln >>= 7
        out.append(b | (0x80 if ln else 0))
        if not ln:
            break
    return bytes(out) + payload


def _wstr(s: str) -> bytes:
    # cch counts UTF-16 CODE UNITS (astral chars = surrogate pair = 2),
    # not characters — [MS-XLSB] XLWideString
    b = s.encode("utf-16-le")
    return struct.pack("<I", len(b) // 2) + b


def _cell_prefix(col: int) -> bytes:
    return struct.pack("<I", col) + b"\x00\x00\x00\x00"


def _rk_from_int(v: int) -> int:
    """Pack a small int as RkNumber with fInt=1, fX100=0."""
    return ((v & 0x3FFFFFFF) << 2) | 0x2


def _rk_from_double(v: float) -> int:
    """Pack a double whose low 34 mantissa bits are zero (fInt=0)."""
    (q,) = struct.unpack("<Q", struct.pack("<d", v))
    assert q & ((1 << 34) - 1) == 0, "not RK-representable"
    return (q >> 32) & 0xFFFFFFFC


def _sheet_records(rows: list[tuple[int, list[tuple[int, bytes]]]]) -> bytes:
    out = bytearray()
    for row_idx, cells in rows:
        out += _rec(0x00, struct.pack("<I", row_idx) + b"\x00" * 13)
        for rid, payload in cells:
            out += _rec(rid, payload)
    return bytes(out)


@pytest.fixture()
def sample_xlsb(tmp_path: Path) -> Path:
    """Two-sheet workbook: FICHA_DATOS (key/value) + Datos (header +
    3 data rows exercising isst/rk-int/rk-x100/real/bool/blank/inline
    string cells)."""
    sst = ["stop_code", "boardings", "PA1", "PA2", "Fuente", "DTPM"]

    ficha = _sheet_records(
        [
            (0, [(0x07, _cell_prefix(0) + struct.pack("<I", 4)),
                 (0x07, _cell_prefix(1) + struct.pack("<I", 5))]),
            (2, [(0x01, _cell_prefix(0))]),  # all-blank row
        ]
    )
    datos = _sheet_records(
        [
            # header row: shared-string + inline string
            (0, [(0x07, _cell_prefix(0) + struct.pack("<I", 0)),
                 (0x07, _cell_prefix(1) + struct.pack("<I", 1)),
                 (0x06, _cell_prefix(2) + _wstr("mode"))]),
            # PA1 | 17 (rk int) | inline "BUS"
            (1, [(0x07, _cell_prefix(0) + struct.pack("<I", 2)),
                 (0x02, _cell_prefix(1) + struct.pack("<I", _rk_from_int(17))),
                 (0x06, _cell_prefix(2) + _wstr("BUS"))]),
            # PA2 | 2.5 (real) | bool TRUE in col 2
            (3, [(0x07, _cell_prefix(0) + struct.pack("<I", 3)),
                 (0x05, _cell_prefix(1) + struct.pack("<d", 2.5)),
                 (0x04, _cell_prefix(2) + b"\x01")]),
            # gap row: col0 rk double 3.0, col2 rk x100 → 1.25
            (4, [(0x02, _cell_prefix(0) + struct.pack("<I", _rk_from_double(3.0))),
                 (0x02, _cell_prefix(2) + struct.pack("<I", _rk_from_int(125) | 0x1))]),
        ]
    )

    wb = bytearray()
    for i, (name, rel) in enumerate([("FICHA_DATOS", "rId1"), ("Datos", "rId2")]):
        payload = struct.pack("<II", 0, i + 1) + _wstr(rel) + _wstr(name)
        wb += _rec(0x9C, payload)

    sst_part = bytearray(_rec(0x9F, struct.pack("<II", len(sst), len(sst))))
    for s in sst:
        sst_part += _rec(0x13, b"\x00" + _wstr(s))

    rels = (
        '<?xml version="1.0"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/'
        'package/2006/relationships">'
        '<Relationship Id="rId1" Type="ws" Target="worksheets/sheet1.bin"/>'
        '<Relationship Id="rId2" Type="ws" Target="worksheets/sheet2.bin"/>'
        "</Relationships>"
    )

    path = tmp_path / "Subida_Paradero_Estacion_2025.04.xlsb"
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("xl/workbook.bin", bytes(wb))
        zf.writestr("xl/_rels/workbook.bin.rels", rels)
        zf.writestr("xl/sharedStrings.bin", bytes(sst_part))
        zf.writestr("xl/worksheets/sheet1.bin", ficha)
        zf.writestr("xl/worksheets/sheet2.bin", datos)
    return path


def test_sheet_list_and_rows(sample_xlsb: Path) -> None:
    with XlsbWorkbook(sample_xlsb) as wb:
        assert wb.sheets == ["FICHA_DATOS", "Datos"]
        rows = list(wb.rows("Datos"))
    assert rows[0] == (0, ["stop_code", "boardings", "mode"])
    assert rows[1] == (1, ["PA1", 17, "BUS"])
    assert rows[2] == (3, ["PA2", 2.5, True])
    # sparse row: gap at col1, RK-double and RK-x100 decoding
    assert rows[3] == (4, [3.0, None, 1.25])


def test_rows_by_pyxlsb_style_index(sample_xlsb: Path) -> None:
    with XlsbWorkbook(sample_xlsb) as wb:
        first = next(wb.rows(1))  # 1-based like pyxlsb
    assert first == (0, ["Fuente", "DTPM"])


def test_xlsb_to_csv_dump(sample_xlsb: Path, tmp_path: Path) -> None:
    out = tmp_path / "dump.csv"
    xlsb_to_csv(sample_xlsb, out, sheet="Datos")
    lines = out.read_text(encoding="utf-8").splitlines()
    assert lines[0] == "stop_code|boardings|mode"
    assert lines[1] == "PA1|17|BUS"
    assert lines[2] == "PA2|2.5|True"
    assert lines[3] == "3||1.25"


def test_convert_subidas_contract(sample_xlsb: Path, tmp_path: Path) -> None:
    """Reference build_lake.py:352-444 semantics: FICHA dict, non-FICHA
    data sheet, first non-empty row = header, padded data rows."""
    out = tmp_path / "subidas_30m.csv"
    meta = convert_subidas_xlsb(sample_xlsb, out)
    assert meta["ficha"] == {"Fuente": "DTPM"}
    assert meta["source_sheet"] == "Datos"
    assert meta["columns"] == ["stop_code", "boardings", "mode"]
    assert meta["row_count"] == 3
    lines = out.read_text(encoding="utf-8").splitlines()
    assert lines[0] == "stop_code|boardings|mode"
    assert len(lines) == 4


# ── property-based round trip ───────────────────────────────────────

from hypothesis import given, settings
from hypothesis import strategies as st

_cell_vals = st.one_of(
    st.none(),
    st.integers(min_value=-(2**29), max_value=2**29 - 1),   # RK int range
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.booleans(),
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=12
    ),
)


def _encode_cell(col: int, v) -> tuple[int, bytes] | None:
    if v is None:
        return None
    if isinstance(v, bool):
        return (0x04, _cell_prefix(col) + (b"\x01" if v else b"\x00"))
    if isinstance(v, int):
        return (0x02, _cell_prefix(col) + struct.pack("<I", _rk_from_int(v)))
    if isinstance(v, float):
        return (0x05, _cell_prefix(col) + struct.pack("<d", v))
    return (0x06, _cell_prefix(col) + _wstr(v))


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(_cell_vals, min_size=1, max_size=6), min_size=1, max_size=8
    )
)
def test_roundtrip_random_grids(tmp_path_factory, grid) -> None:
    """Any grid of typed cells encoded per [MS-XLSB] decodes to the
    same values (trailing Nones trimmed, empty rows absent)."""
    rows = []
    expected = []
    for r, vals in enumerate(grid):
        cells = []
        for c, v in enumerate(vals):
            enc = _encode_cell(c, v)
            if enc is not None:
                cells.append(enc)
        if cells:
            rows.append((r, cells))
            width = max(c for c, v in enumerate(vals) if v is not None) + 1
            expected.append(
                (r, [v if v is not None else None for v in vals[:width]])
            )
    sheet = _sheet_records(rows)
    wb_rec = _rec(
        0x9C, struct.pack("<II", 0, 1) + _wstr("rId1") + _wstr("Datos")
    )
    rels = (
        '<?xml version="1.0"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/'
        'package/2006/relationships">'
        '<Relationship Id="rId1" Type="ws" Target="worksheets/sheet1.bin"/>'
        "</Relationships>"
    )
    path = tmp_path_factory.mktemp("xlsb") / "prop.xlsb"
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("xl/workbook.bin", wb_rec)
        zf.writestr("xl/_rels/workbook.bin.rels", rels)
        zf.writestr("xl/worksheets/sheet1.bin", sheet)
    with XlsbWorkbook(path) as wb:
        got = list(wb.rows("Datos"))
    assert got == expected


def test_blank_rows_are_yielded(sample_xlsb: Path) -> None:
    """pyxlsb parity: a row whose cells are all blank is yielded as an
    empty values list (so dumps keep row alignment for styled-blank
    rows) rather than skipped."""
    with XlsbWorkbook(sample_xlsb) as wb:
        rows = list(wb.rows("FICHA_DATOS"))
    assert rows == [(0, ["Fuente", "DTPM"]), (2, [])]


def test_ficha_only_workbook_raises(sample_xlsb: Path, tmp_path: Path) -> None:
    """A workbook with no non-FICHA sheet must fail loudly, not
    re-export the FICHA sheet as data."""
    import shutil

    clone = tmp_path / "ficha_only.xlsb"
    shutil.copy(sample_xlsb, clone)
    # rebuild the workbook part with only the FICHA sheet entry
    with zipfile.ZipFile(sample_xlsb) as src:
        parts = {n: src.read(n) for n in src.namelist()}
    wb = bytearray()
    payload = struct.pack("<II", 0, 1) + _wstr("rId1") + _wstr("FICHA_DATOS")
    wb += _rec(0x9C, payload)
    parts["xl/workbook.bin"] = bytes(wb)
    with zipfile.ZipFile(clone, "w") as zf:
        for n, data in parts.items():
            zf.writestr(n, data)
    with pytest.raises(ValueError, match="non-FICHA"):
        convert_subidas_xlsb(clone, tmp_path / "out.csv")
