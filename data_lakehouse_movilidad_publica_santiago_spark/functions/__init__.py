"""Scalar expression library — every derived-column rule the reference
computes in SQL text, as reusable Column-builder functions (JVM-side,
codegen-friendly; no Python row UDFs in the hot path)."""

from .codes import map_code, mode_code_expr, tipo_dia_expr
from .datetime_fns import (
    date_sk,
    excel_fraction_to_slot,
    excel_fraction_to_time,
    time_30m_sk,
)
from .hashing import row_hash
from .geo import utm_to_wgs84

__all__ = [
    "date_sk",
    "time_30m_sk",
    "excel_fraction_to_slot",
    "excel_fraction_to_time",
    "map_code",
    "tipo_dia_expr",
    "mode_code_expr",
    "row_hash",
    "utm_to_wgs84",
]
