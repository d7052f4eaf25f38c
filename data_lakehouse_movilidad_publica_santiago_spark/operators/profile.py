"""One-pass column profiler — the ANALYZE step of a pipeline.

Per-column row/null/distinct counts and min/max in a SINGLE
aggregation over a SINGLE scan (Catalyst plans the multi-distinct via
one Expand; n columns never mean n passes). The wide one-row result
unpivots driver-side into one row per column — ``stack`` over a
1-row aggregate, no second scan.

Min/max surface as strings so heterogeneous column types share one
schema. String casts of bigint/string/date are engine-portable;
double formatting diverges across engines in scientific-notation
ranges, so the differential gate profiles the non-double columns and
doubles are covered by pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One row per profiled column: ``col_name, n_rows, n_nulls,
    n_distinct, min_val, max_val`` (exact distinct — swap in
    ``approx_count_distinct`` at the 100 TB tier where ±2% is fine
    and the Expand for multi-exact-distinct isn't)."""
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            # min/max on the NATIVE type (lexicographic string min of
            # a bigint would be wrong), cast the 1-row result after
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}, __min_{c}, __max_{c}" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stacked}) AS "
            "(col_name, __nn, n_distinct, min_val, max_val)"
        ),
        F.col("__n").alias("n_rows"),
    ).select(
        "col_name",
        "n_rows",
        (F.col("n_rows") - F.col("__nn")).alias("n_nulls"),
        "n_distinct",
        "min_val",
        "max_val",
    )
