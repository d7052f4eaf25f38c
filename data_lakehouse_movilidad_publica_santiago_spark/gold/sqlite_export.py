"""Portable SQLite export of the gold DW (reference S10:
src/sqlite/load_sqlite.py — the single-file analyst handoff).

Streams each table through ``toLocalIterator`` in bounded batches so
the driver never materializes a full fact (the reference's 28M-row
pandas OOM cannot recur), with ``INSERT OR IGNORE`` idempotency on
the declared grain via UNIQUE indexes.

JDBC path (S8): where a JDBC driver jar is available,
``df.write.jdbc(url, table, mode)`` replaces all of this — kept out
of the default path because this environment ships no JDBC drivers.
"""

from __future__ import annotations

import sqlite3
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .diagnostics import FACT_GRAINS
from .store import GoldStore

BATCH_SIZE = 5_000  # load_sqlite.py:37 parity

_TYPE_MAP = {
    T.LongType: "INTEGER",
    T.IntegerType: "INTEGER",
    T.ShortType: "INTEGER",
    T.ByteType: "INTEGER",
    T.BooleanType: "INTEGER",
    T.DoubleType: "REAL",
    T.FloatType: "REAL",
}


def _sqlite_type(dt: T.DataType) -> str:
    return _TYPE_MAP.get(type(dt), "TEXT")


def _coerce(v):
    import datetime

    if isinstance(v, bool):
        return int(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return str(v)
    return v


def export_table(
    df: DataFrame,
    con: sqlite3.Connection,
    table: str,
    unique_cols: list[str] | None = None,
    batch_size: int = BATCH_SIZE,
) -> int:
    """Stream one DataFrame into SQLite; returns rows inserted (rows
    already present on the UNIQUE grain are ignored)."""
    cols = df.schema.fields
    col_defs = ", ".join(f'"{f.name}" {_sqlite_type(f.dataType)}' for f in cols)
    con.execute(f'CREATE TABLE IF NOT EXISTS "{table}" ({col_defs})')
    if unique_cols:
        idx_cols = ", ".join(f'"{c}"' for c in unique_cols)
        con.execute(
            f'CREATE UNIQUE INDEX IF NOT EXISTS "ux_{table}_grain" '
            f'ON "{table}" ({idx_cols})'
        )
    placeholders = ", ".join("?" * len(cols))
    names = ", ".join(f'"{f.name}"' for f in cols)
    sql = f'INSERT OR IGNORE INTO "{table}" ({names}) VALUES ({placeholders})'

    before = con.execute(f'SELECT COUNT(*) FROM "{table}"').fetchone()[0]
    batch: list[tuple] = []
    for row in df.toLocalIterator():
        batch.append(tuple(_coerce(v) for v in row))
        if len(batch) >= batch_size:
            con.executemany(sql, batch)
            batch = []
    if batch:
        con.executemany(sql, batch)
    con.commit()
    after = con.execute(f'SELECT COUNT(*) FROM "{table}"').fetchone()[0]
    return after - before


def export_gold_to_sqlite(
    store: GoldStore, db_path: Path, tables: list[str] | None = None
) -> dict[str, int]:
    """Export the whole constellation (or a subset) to one .db file."""
    con = sqlite3.connect(str(db_path))
    try:
        counts: dict[str, int] = {}
        names = tables or [
            "dim_date", "dim_time_30m", "dim_mode", "dim_stop", "dim_service",
            "dim_fare_period", "dim_purpose", "dim_operator_contract", "dim_cut",
            "fct_trip", "fct_trip_leg", "fct_validation", "fct_boardings_30m",
            "etl_run_log",
        ]  # fmt: skip
        for name in names:
            if not store.exists(name):
                continue
            counts[name] = export_table(
                store.read(name), con, name, FACT_GRAINS.get(name)
            )
        return counts
    finally:
        con.close()
