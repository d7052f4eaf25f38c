"""Gold layer: Kimball constellation (9 dims, 2 SCD2; 4 facts;
etl_run_log) as parquet tables managed by a MERGE-capable store.

Re-expression of the reference's SQL Server loader
(src/gold/load_gold.py + models/gold/ddl_gold.sql): staging disappears
(silver DataFrames ARE the staging), the row-wise SCD2 Python loop
becomes a set-based dim rebuild, facts use insert-only anti-join MERGE
on their true grains, and surrogate keys are deterministic hashes so
every load is idempotent by construction.
"""

from .runner import GoldLoader
from .store import GoldStore

__all__ = ["GoldLoader", "GoldStore"]
