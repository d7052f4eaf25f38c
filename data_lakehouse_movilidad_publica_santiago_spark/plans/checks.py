"""Physical-plan assertions.

The reference delegates optimization to DuckDB/SQL Server (SURVEY §4);
in Spark the same guarantees come from Catalyst — but only if the
plans are expressed so Catalyst CAN apply them. These helpers make the
intended physical properties testable:

- filters/projections reach the parquet scan (PushedFilters/ReadSchema)
- dim joins are BroadcastHashJoin, and the non-equi as-of join does
  NOT degrade to BroadcastNestedLoopJoin (its equi BK keeps it hash)
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", text):
        inner = m.group(1).strip()
        if inner:
            out.extend(p.strip() for p in inner.split(","))
    return out


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names in each scan's ReadSchema (proves pruning)."""
    text = explain_str(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<(.*?)>", text):
        cols.extend(c.split(":")[0].strip() for c in m.group(1).split(",") if c)
    return cols


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def has_nested_loop_join(df: DataFrame) -> bool:
    return "BroadcastNestedLoopJoin" in explain_str(df) or "CartesianProduct" in (
        explain_str(df)
    )


def exchange_input_cols(df: DataFrame) -> list[str]:
    """Column list (the ``Input [n]: [...]`` line) of every
    hash-partitioned Exchange node in the FORMATTED plan — what
    actually crosses each shuffle. Formatted mode never prints
    ``Exchange hashpartitioning(...)`` on one line, so regexes over
    that shape match nothing; use this instead."""
    text = explain_str(df)
    return [
        m.group(1)
        for m in re.finditer(
            r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]\n"
            r"Arguments: hashpartitioning",
            text,
        )
    ]


def window_partition_specs(df: DataFrame) -> list[str]:
    """The partition-spec list (second bracket of ``Arguments:``) of
    every Window node in the FORMATTED plan; '' = unpartitioned
    (single-task) window."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(
        r"\(\d+\) Window\nInput [^\n]*\n"
        r"Arguments: \[.*\], \[([^\]]*)\], \[",
        text,
    ):
        out.append(m.group(1))
    return out
