"""Salted equi-join for key skew beyond what AQE can split.

AQE's skew-join handling splits oversized SHUFFLE partitions, but a
single hot KEY still lands every one of its rows in one task when the
join must co-locate by key. The classic fix: replicate the small
side's hot keys ``n_salts`` times and scatter the big side's hot rows
across the replicas — turning one straggler task into ``n_salts``
even ones. Cold keys join exactly as before; the result is the UNION
of the two joins and is semantically identical to the plain join
(differentially gated against a plain-join DuckDB oracle).

Salt assignment uses a uniform hash of the row id when provided
(deterministic under retries), else a per-row round-robin — either
way correctness never depends on WHICH salt a row gets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def detect_hot_keys(
    df: DataFrame, key: str, min_rows: int, top_k: int = 100
) -> list:
    """Keys with more than ``min_rows`` rows (bounded to the worst
    ``top_k`` — a driver-sized list). One map-side-combined count
    pass; at 100 TB this is the cheap ANALYZE step you run once per
    load, not per query."""
    rows = (
        df.groupBy(key)
        .count()
        .filter(F.col("count") > min_rows)
        .orderBy(F.desc("count"))
        .limit(top_k)
        .collect()
    )
    # NULL can be the heaviest "key" (groupBy counts the NULL group)
    # but is excluded here: NULL never equi-matches, and a None inside
    # an isin() list poisons the cold-path filter with three-valued
    # NULLs, silently dropping every non-hot row.
    return [r[key] for r in rows if r[key] is not None]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    hot_keys: list,
    how: str = "inner",
    n_salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with the listed hot
    keys salted ``n_salts`` ways. ``how`` ∈ {inner, left}: the salted
    rewrite preserves exactly those joins' semantics (every big-side
    row appears in one salt bucket; the small side's hot rows exist in
    every bucket). ``salt_source``: a column of ``big`` to hash for
    deterministic salt assignment; defaults to round-robin by row."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left (got {how!r})")
    # NULL keys always take the cold path (isNull() branch below); a
    # None in the list would make `~isin` NULL for every non-hot key
    hot_keys = [k for k in hot_keys if k is not None]
    if not hot_keys:
        return big.join(small, on, how)
    key = F.col(on)
    if salt_source is not None:
        big_salt = F.pmod(F.xxhash64(F.col(salt_source)), F.lit(n_salts))
    else:
        big_salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))

    big_hot = big.filter(key.isin(hot_keys)).withColumn(
        "__salt", big_salt.cast("int")
    )
    small_hot = (
        small.filter(key.isin(hot_keys))
        .withColumn(
            "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
        )
    )
    # the hot join shuffles on (key, salt): the single hot key's rows
    # spread over n_salts partitions instead of one straggler task.
    # (If the small side fit in a broadcast there would be no skew
    # problem to solve — salting exists for the shuffle-join case.)
    hot_joined = big_hot.join(small_hot, [on, "__salt"], how).drop("__salt")

    cold = key.isNull() | ~key.isin(hot_keys)
    cold_joined = big.filter(cold).join(
        small.filter(F.col(on).isNull() | ~F.col(on).isin(hot_keys)), on, how
    )
    return hot_joined.unionByName(cold_joined)
