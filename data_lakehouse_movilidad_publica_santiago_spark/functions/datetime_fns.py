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

    Deliberately UNclamped (transforms.py:95-100): a fraction of 1.0
    yields 48, which the BAD_TIME_SLOT quality rule quarantines —
    clamping here would hide bad rows from quarantine.
    """
    return F.floor(frac * F.lit(48)).cast("int")


def excel_fraction_to_time(frac: Column) -> Column:
    """Excel day-fraction -> 'HH:MM:00' string (MAKE_TIME parity,
    transforms.py:103-111): hour = FLOOR(f*24), minute = FLOOR of the
    hour remainder. Seconds are always 00 — the source grid is
    30-minute resolution."""
    hh = F.floor(frac * F.lit(24)).cast("int")
    mm = F.floor((frac * F.lit(24) - F.floor(frac * F.lit(24))) * F.lit(60)).cast(
        "int"
    )
    return F.format_string("%02d:%02d:00", hh, mm)
