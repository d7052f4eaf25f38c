"""Code-map (CASE dictionary) expressions.

Parity targets (reference src/silver/transforms.py:47-79):
- tipo_dia: {0: LABORAL, 1: SABADO, 2: DOMINGO}, else UNKNOWN
- mode:     {1: BUS, 2: METRO, 3: METROTREN, 4: ZP}, else UNKNOWN
- etapas variants accept the code as int OR already-mapped text
  (transforms.py:673-687): if TRY_CAST to int succeeds map it,
  otherwise UPPER(TRIM(raw)).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TIPO_DIA_MAP = {0: "LABORAL", 1: "SABADO", 2: "DOMINGO"}
MODE_MAP = {1: "BUS", 2: "METRO", 3: "METROTREN", 4: "ZP"}


def map_code(
    col: Column,
    mapping: dict[int, str],
    default: str | None = "UNKNOWN",
) -> Column:
    """Ordered CASE over an int-code column. NULL input -> default
    (matching the reference's ``ELSE 'UNKNOWN'``)."""
    expr: Column | None = None
    for code, label in mapping.items():
        cond = col == F.lit(code)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    assert expr is not None
    return expr.otherwise(F.lit(default))


def tipo_dia_expr(raw: Column, accept_text: bool = False) -> Column:
    """tipo_dia from a raw string column (all-VARCHAR ingest).

    ``accept_text=True`` = etapas semantics: value may arrive as the
    int code or the final text; text passes through UPPER(TRIM(...)).
    """
    as_int = raw.try_cast("int")
    mapped = map_code(as_int, TIPO_DIA_MAP)
    if not accept_text:
        return mapped
    return F.when(as_int.isNotNull(), mapped).otherwise(F.upper(F.trim(raw)))


def mode_code_expr(raw: Column, accept_text: bool = False) -> Column:
    """Transport mode from a raw string column; same int-or-text rule."""
    as_int = raw.try_cast("int")
    mapped = map_code(as_int, MODE_MAP)
    if not accept_text:
        return mapped
    return F.when(as_int.isNotNull(), mapped).otherwise(F.upper(F.trim(raw)))
