"""Date/time surrogate-key expressions.

Parity targets (reference src/silver/transforms.py):
- ``date_sk``            int YYYYMMDD from a timestamp        (transforms.py:82-84)
- ``time_30m_sk``        hour*2 + (minute>=30), 0..47         (transforms.py:87-92)
- ``excel_fraction_*``   Excel day-fraction -> slot / HH:MM   (transforms.py:95-111)

All are pure Column expressions — whole-stage-codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def date_sk(ts: Column) -> Column:
    """``int(strftime(ts, '%Y%m%d'))`` — NULL-safe (NULL ts -> NULL sk)."""
    return F.date_format(ts, "yyyyMMdd").cast("int")


def time_30m_sk(ts: Column) -> Column:
    """30-minute slot index 0..47: ``hour*2 + (minute >= 30)``."""
    return (F.hour(ts) * F.lit(2) + F.when(F.minute(ts) >= 30, 1).otherwise(0)).cast(
        "int"
    )


def excel_fraction_to_slot(frac: Column) -> Column:
    """Excel day-fraction (0..1) -> 30-min slot ``FLOOR(frac*48)``.

    Clamped exactly like the reference: 1.0 maps to 47 via the
    LEAST(…, 47) guard (transforms.py:95-100).
    """
    return F.least(F.floor(frac * F.lit(48)), F.lit(47)).cast("int")


def excel_fraction_to_time(frac: Column) -> Column:
    """Excel day-fraction -> 'HH:MM:SS' string (MAKE_TIME parity,
    transforms.py:103-111). Seconds are always 00 — the source grid
    is 30-minute resolution."""
    total_min = F.floor(frac * F.lit(24) * F.lit(60)).cast("int")
    hh = F.least(F.floor(total_min / 60), F.lit(23)).cast("int")
    mm = (total_min % 60).cast("int")
    return F.format_string("%02d:%02d:00", hh, mm)
