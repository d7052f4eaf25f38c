"""Z-order (Morton) clustering for multi-column data skipping.

Range-clustering on ONE column gives surgical footer-stat skipping on
that column but leaves every other column's min/max spanning the whole
table per file. Z-ordering interleaves the bits of several columns'
quantile-bucket ranks into one Morton code and range-clusters on THAT,
so each file owns a small hyper-rectangle of the key space — a
predicate on ANY of the z-columns then prunes ~N^((d-1)/d) of the
files (the standard multi-dimensional-clustering trade, as in Delta's
OPTIMIZE ZORDER BY).

Mechanics (one extra metadata pass per write, like Delta's analysis):

1. per column, ``approxQuantile`` computes 2^bits quantile boundaries
   (driver-side, bounded: 2^bits doubles per column);
2. rows map to a bucket rank via a folded CASE chain (JVM codegen, no
   UDF) — quantile buckets, not uniform-width, so skewed columns still
   spread across ranks;
3. ranks bit-interleave into the Morton code with shift/or expressions;
4. the writer range-partitions + sorts on the code.

Numeric and DATE columns are supported (DATE ranks via days since
epoch); other types raise — hash-sourced columns have no meaningful
order to preserve.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ZCOL = "__zorder"


def _rankable(df: DataFrame, col: str) -> Column:
    """The column as a double for quantile analysis / bucketing."""
    dt = dict((f.name, f.dataType) for f in df.schema.fields)[col]
    if isinstance(
        dt,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
         T.FloatType, T.DoubleType, T.DecimalType),
    ):
        return F.col(col).cast("double")
    if isinstance(dt, T.DateType):
        return F.datediff(F.col(col), F.lit("1970-01-01")).cast("double")
    raise TypeError(
        f"z-order column {col!r} has unsupported type {dt.simpleString()}; "
        "use numeric or DATE columns (strings/timestamps have no portable "
        "rank expression here)"
    )


def _bucket_expr(ranked: Column, bounds: list[float]) -> Column:
    """Quantile-bucket rank 0..len(bounds) as a folded CASE chain.
    NULLs rank 0 (lowest), keeping them clustered together."""
    expr: Column = F.lit(0)
    for i, b in enumerate(bounds):
        expr = expr + F.when(ranked > F.lit(b), 1).otherwise(0)
    return F.when(ranked.isNull(), F.lit(0)).otherwise(expr)


def with_zvalue(
    df: DataFrame, cols: Sequence[str], bits: int = 4
) -> DataFrame:
    """``df`` plus a ``__zorder`` Morton-code column over ``cols``.

    ``bits`` ranks per column (2^bits quantile buckets each); total
    code width = bits * len(cols) ≤ 62.
    """
    if len(cols) < 2:
        raise ValueError("z-order needs >= 2 columns; use cluster_by for 1")
    if bits * len(cols) > 62:
        raise ValueError("bits * len(cols) must stay <= 62")
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    ranked = {c: _rankable(df, c) for c in cols}
    analysis = df.select(
        *[ranked[c].alias(f"__r_{i}") for i, c in enumerate(cols)]
    )
    # one bounded driver-side metadata pass (2^bits-1 doubles per col)
    all_bounds = analysis.approxQuantile(
        [f"__r_{i}" for i in range(len(cols))], probs, 0.01
    )
    m = len(cols)
    z: Column = F.lit(0)
    for ci, c in enumerate(cols):
        rank = _bucket_expr(ranked[c], all_bounds[ci]).cast("long")
        for bi in range(bits):
            # bit bi of column ci lands at position bi*m + (m-1-ci):
            # higher-order bits of every column stay adjacent, which is
            # what gives the Morton curve its locality
            pos = bi * m + (m - 1 - ci)
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(rank, bi).bitwiseAND(F.lit(1)), pos)
            )
    return df.withColumn(ZCOL, z)
