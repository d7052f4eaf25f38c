"""SCD2 row-hash expression.

Parity: sha256 over UPPER(TRIM(attr)) joined by '||', NULL -> ''
(reference src/gold/load_gold.py:281-292; load_sqlite.py:134-137).
Computed JVM-side with sha2/concat_ws — no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def row_hash(*attrs: Column | str) -> Column:
    """sha256 hex digest of the normalized attribute tuple."""
    cols = [F.col(a) if isinstance(a, str) else a for a in attrs]
    normed = [F.coalesce(F.upper(F.trim(c.cast("string"))), F.lit("")) for c in cols]
    return F.sha2(F.concat_ws("||", *normed), 256)
