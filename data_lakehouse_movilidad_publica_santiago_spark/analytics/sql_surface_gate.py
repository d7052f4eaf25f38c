"""Multi-dimensional SQL-surface gates: ROLLUP / CUBE / GROUPING
SETS, native pivot, and time-series resample+forward-fill — the
OLAP-report shapes a warehouse user reaches for right after plain
GROUP BY, each with a DuckDB differential oracle.

The reference's report queries aggregate one grouping set at a time
(docs/queries/*.sql run per-dimension); these gates prove the engine
covers the multi-level forms natively (Catalyst's Expand operator
computes all grouping sets in ONE scan — at 100 TB that's the
difference between one pass and one pass per level).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.resample import resample_ffill
from .inventory import t


def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (returnflag, linestatus): per-pair, per-flag subtotal,
    and grand total in one Expand pass. ``gid`` disambiguates a NULL
    grouping key from a rolled-up level (first listed column = MSB,
    matching DuckDB's multi-arg GROUPING())."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
    )


ORACLE_ROLLUP_REVENUE = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       COUNT(*) AS n,
       ROUND(SUM(l_extendedprice), 2) AS revenue
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (status, priority): all four grouping sets in one pass."""
    o = t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


ORACLE_CUBE_ORDERS = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
       COUNT(*) AS n,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def q_grouping_sets_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((region, nation), (region), ()) over
    the geo dims — the hand-picked-levels form (SQL surface; the
    DataFrame API covers rollup/cube above)."""
    t(spark, sf_dir, "nation").createOrReplaceTempView("__gs_nation")
    t(spark, sf_dir, "region").createOrReplaceTempView("__gs_region")
    t(spark, sf_dir, "customer").createOrReplaceTempView("__gs_customer")
    return spark.sql(
        """
        SELECT r.r_name, n.n_name,
               CAST(grouping_id() AS BIGINT) AS gid,
               COUNT(*) AS n_cust,
               ROUND(SUM(c.c_acctbal), 2) AS acctbal
        FROM __gs_customer c
        JOIN __gs_nation n ON c.c_nationkey = n.n_nationkey
        JOIN __gs_region r ON n.n_regionkey = r.r_regionkey
        GROUP BY GROUPING SETS ((r.r_name, n.n_name), (r.r_name), ())
        """
    )


ORACLE_GROUPING_SETS_GEO = """
SELECT r.r_name, n.n_name,
       CAST(GROUPING(r.r_name, n.n_name) AS BIGINT) AS gid,
       COUNT(*) AS n_cust,
       ROUND(SUM(c.c_acctbal), 2) AS acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY GROUPING SETS ((r.r_name, n.n_name), (r.r_name), ())
"""


def q_pivot_status_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native pivot: order counts per priority × status, statuses as
    columns (values pinned so the plan needs no discovery pass — at
    scale an unpinned pivot runs an extra distinct job)."""
    o = t(spark, sf_dir, "orders")
    pivoted = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return pivoted.select(
        "o_orderpriority",
        F.coalesce("F", F.lit(0)).alias("n_f"),
        F.coalesce("O", F.lit(0)).alias("n_o"),
        F.coalesce("P", F.lit(0)).alias("n_p"),
    )


ORACLE_PIVOT_STATUS_MATRIX = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
FROM orders
GROUP BY o_orderpriority
"""


def q_resample_ffill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly grid per user with last-observation carry
    forward — the time-series resample/locf shape over the event
    stream. Buckets surface as unix micros for engine-stable hashing.
    The gate keeps every 10th user (filter pushed to the scan) so the
    differential compare moves ~10k grid rows, not the full grid."""
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 0)
    res = resample_ffill(ev, step="1 hour")
    return res.select(
        "user_id",
        F.unix_micros(F.col("bucket").cast("timestamp")).alias("bucket_us"),
        "n_events",
        F.round("value_ffill", 2).alias("value_ffill"),
    )


ORACLE_RESAMPLE_FFILL = """
WITH ranked AS (
  SELECT user_id,
         to_timestamp(FLOOR(epoch(ts) / 3600) * 3600) AS bucket,
         value,
         ROW_NUMBER() OVER (
           PARTITION BY user_id, FLOOR(epoch(ts) / 3600)
           ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE user_id % 10 = 0),
hourly AS (
  SELECT user_id, bucket, COUNT(*) AS n_events,
         MAX(CASE WHEN rn = 1 THEN value END) AS last_value
  FROM ranked GROUP BY user_id, bucket),
bounds AS (
  SELECT user_id, MIN(bucket) AS b0, MAX(bucket) AS b1
  FROM hourly GROUP BY user_id),
grid AS (
  SELECT user_id,
         unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket
  FROM bounds),
filled AS (
  SELECT g.user_id, g.bucket,
         COALESCE(h.n_events, 0) AS n_events,
         last_value(h.last_value IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.bucket
           ROWS UNBOUNDED PRECEDING) AS value_ffill
  FROM grid g
  LEFT JOIN hourly h ON g.user_id = h.user_id AND g.bucket = h.bucket)
SELECT user_id, epoch_us(bucket) AS bucket_us, n_events,
       ROUND(value_ffill, 2) AS value_ffill
FROM filled
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "rollup_revenue": q_rollup_revenue,
    "cube_orders": q_cube_orders,
    "grouping_sets_geo": q_grouping_sets_geo,
    "pivot_status_matrix": q_pivot_status_matrix,
    "resample_ffill_hourly": q_resample_ffill_hourly,
}

ORACLE: dict[str, str] = {
    "rollup_revenue": ORACLE_ROLLUP_REVENUE,
    "cube_orders": ORACLE_CUBE_ORDERS,
    "grouping_sets_geo": ORACLE_GROUPING_SETS_GEO,
    "pivot_status_matrix": ORACLE_PIVOT_STATUS_MATRIX,
    "resample_ffill_hourly": ORACLE_RESAMPLE_FFILL,
}


# ── skew-hardened join + profiler ───────────────────────────────────


def q_salted_join_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted equi-join, differentially proven IDENTICAL to the
    plain join: lineitem⋈orders with the 5 highest-volume order keys
    salted 8 ways (hot keys pinned deterministically as the top-5 by
    line count, ties to the lower key). The oracle is the PLAIN join —
    what makes the gate meaningful is that the salted rewrite may not
    change a single row."""
    from ..operators.salted_join import salted_join

    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    hot = [
        r["l_orderkey"]
        for r in li.groupBy("l_orderkey")
        .count()
        .orderBy(F.desc("count"), F.asc("l_orderkey"))
        .limit(5)
        .collect()
    ]
    joined = salted_join(
        li.withColumnRenamed("l_orderkey", "okey"),
        o.withColumnRenamed("o_orderkey", "okey"),
        on="okey",
        hot_keys=hot,
        n_salts=8,
        salt_source="l_linenumber",
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_lines"),
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        F.count_distinct("okey").alias("n_orders"),
    )


ORACLE_SALTED_JOIN_DEMAND = """
SELECT o.o_orderpriority,
       COUNT(*) AS n_lines,
       ROUND(SUM(l.l_extendedprice), 2) AS revenue,
       COUNT(DISTINCT l.l_orderkey) AS n_orders
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""


def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profile of the orders table (row/null/distinct
    counts + min/max) — exact multi-distinct via one Expand, one scan."""
    from ..operators.profile import profile_columns

    o = t(spark, sf_dir, "orders")
    return profile_columns(
        o,
        [
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_orderdate",
            "o_orderpriority",
        ],
    )


ORACLE_PROFILE_ORDERS = """
SELECT 'o_orderkey' AS col_name, COUNT(*) AS n_rows,
       COUNT(*) - COUNT(o_orderkey) AS n_nulls,
       COUNT(DISTINCT o_orderkey) AS n_distinct,
       CAST(MIN(o_orderkey) AS VARCHAR) AS min_val,
       CAST(MAX(o_orderkey) AS VARCHAR) AS max_val
FROM orders
UNION ALL
SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
       COUNT(DISTINCT o_custkey),
       CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
       COUNT(DISTINCT o_orderstatus),
       MIN(o_orderstatus), MAX(o_orderstatus)
FROM orders
UNION ALL
SELECT 'o_orderdate', COUNT(*), COUNT(*) - COUNT(o_orderdate),
       COUNT(DISTINCT o_orderdate),
       CAST(MIN(o_orderdate) AS VARCHAR), CAST(MAX(o_orderdate) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
       COUNT(DISTINCT o_orderpriority),
       MIN(o_orderpriority), MAX(o_orderpriority)
FROM orders
"""


QUERIES["salted_join_demand"] = q_salted_join_demand
ORACLE["salted_join_demand"] = ORACLE_SALTED_JOIN_DEMAND
QUERIES["profile_orders"] = q_profile_orders
ORACLE["profile_orders"] = ORACLE_PROFILE_ORDERS


# ── mergeable HLL distinct sketches (ANALYZE layer) ─────────────────


def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate for the sketch layer (operators/sketches.py): per
    (year, month) HLL sketches of distinct customers, merged up to
    year. The oracle can't replay a DataSketches estimate (and HLL
    union state is NOT path-independent once sketches leave exact
    coupon mode — measured: one-level vs two-level merges of the
    same monthly sketches differ by a few counts), so the gate
    exports the RELATIONAL invariants of the fixed rollup path, all
    deterministic for fixed data:

    - ``exact_distinct`` — DuckDB recomputes it exactly;
    - ``rel_err_ok`` — merged estimate within ±5 % of exact
      (lg_k=12 → ±1.6 % std error, 5 % ≈ 3σ);
    - ``union_bounds_ok`` — merged estimate ≥ the largest monthly
      estimate and ≤ the sum of monthly estimates (the superset /
      subadditivity laws any correct distinct-union must satisfy;
      exact counts break the upper one only if the union
      double-counts, the lower one only if the union loses keys).

    ``fact_cardinalities`` (gold/diagnostics.py) ships the same
    sketches in the product's load report."""
    from ..operators.sketches import distinct_sketches, rollup_distinct

    base = t(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        "o_custkey",
    )
    monthly = distinct_sketches(base, ["o_year", "o_month"], "o_custkey")
    monthly_est = monthly.select(
        "o_year", F.hll_sketch_estimate("hll").alias("__m_est")
    ).groupBy("o_year").agg(
        F.max("__m_est").alias("__max_m"),
        F.sum("__m_est").alias("__sum_m"),
    )  # fmt: skip
    merged = rollup_distinct(monthly, ["o_year"])
    exact = base.groupBy("o_year").agg(
        F.count_distinct("o_custkey").alias("exact_distinct")
    )
    return (
        merged.join(monthly_est, "o_year")
        .join(exact, "o_year")
        .select(
            "o_year",
            "exact_distinct",
            (
                F.abs(F.col("n_distinct_est") - F.col("exact_distinct"))
                / F.col("exact_distinct")
                < F.lit(0.05)
            ).alias("rel_err_ok"),
            (
                (F.col("n_distinct_est") >= F.col("__max_m"))
                & (F.col("n_distinct_est") <= F.col("__sum_m"))
            ).alias("union_bounds_ok"),
        )
    )


ORACLE_HLL_ROLLUP = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       COUNT(DISTINCT o_custkey) AS exact_distinct,
       TRUE AS rel_err_ok,
       TRUE AS union_bounds_ok
FROM orders
GROUP BY 1
"""


QUERIES["hll_rollup"] = q_hll_rollup
ORACLE["hll_rollup"] = ORACLE_HLL_ROLLUP


def q_cms_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate for the Count-Min frequency layer: per-month CMS
    sketches of customer order counts, merged to a whole-corpus
    estimate for the top-5 customers. CMS merge is counter ADDITION
    with seed-fixed hashes, so `merged_eq_whole` pins EXACT
    mergeability (unlike HLL), and `overcount_ok` pins the one-sided
    error contract (estimate ≥ exact, ≤ exact + eps·N) — both
    deterministic for fixed data/seed. Top-5 selection tie-breaks on
    key so both engines pick identical rows. The driver-side merge is
    bounded: one sketch row per month."""
    from ..operators.sketches import (
        frequency_sketches,
        merged_frequency_estimates,
    )

    base = t(spark, sf_dir, "orders").select(
        F.date_format("o_orderdate", "yyyyMM").alias("o_month"), "o_custkey"
    )
    top = (
        base.groupBy("o_custkey")
        .agg(F.count("*").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), "o_custkey")
        .limit(5)
        .collect()
    )
    items = [int(r["o_custkey"]) for r in top]
    exact = {int(r["o_custkey"]): int(r["exact_cnt"]) for r in top}
    n_total = base.count()

    est_m = merged_frequency_estimates(
        frequency_sketches(base, ["o_month"], "o_custkey"), items
    )
    est_w = merged_frequency_estimates(
        frequency_sketches(base, [], "o_custkey"), items
    )
    rows = [
        (
            k,
            exact[k],
            est_m[k] == est_w[k],
            exact[k] <= est_m[k] <= exact[k] + 0.001 * n_total,
        )
        for k in items
    ]
    return spark.createDataFrame(
        rows,
        "o_custkey bigint, exact_cnt bigint, "
        "merged_eq_whole boolean, overcount_ok boolean",
    )


ORACLE_CMS_FREQUENCY = """
SELECT o_custkey,
       CAST(COUNT(*) AS BIGINT) AS exact_cnt,
       TRUE AS merged_eq_whole,
       TRUE AS overcount_ok
FROM orders
GROUP BY o_custkey
ORDER BY exact_cnt DESC, o_custkey
LIMIT 5
"""


QUERIES["cms_frequency"] = q_cms_frequency
ORACLE["cms_frequency"] = ORACLE_CMS_FREQUENCY


# ── set operations (INTERSECT / EXCEPT / EXCEPT ALL) ────────────────
#
# The reference uses only UNION [ALL] (SURVEY §2.7); these complete
# the set-op surface. Catalyst plans INTERSECT/EXCEPT as left-semi /
# left-anti aggregates — one hash shuffle per input, no sort.


def q_set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with both an URGENT and a HIGH order, excluding any
    with a finished ('F') order: (URGENT ∩ HIGH) − F — the standard
    cohort-algebra shape, via native INTERSECT/EXCEPT (distinct
    semantics in both engines)."""
    o = t(spark, sf_dir, "orders")

    def keys(pred):
        return o.filter(pred).select("o_custkey")

    urgent = keys(F.col("o_orderpriority") == "1-URGENT")
    high = keys(F.col("o_orderpriority") == "2-HIGH")
    finished = keys(F.col("o_orderstatus") == "F")
    return urgent.intersect(high).subtract(finished)


ORACLE_SET_OPS_CUSTOMERS = """
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
"""


def q_except_all_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference: (suppkey, qty) pairs that occur more
    often among accepted ('A') lines than among returned ('R') lines
    — EXCEPT ALL keeps the occurrence-count surplus per row, which
    the distinct EXCEPT destroys."""
    li = t(spark, sf_dir, "lineitem")
    accepted = li.filter(F.col("l_returnflag") == "A").select(
        "l_suppkey", F.col("l_quantity").cast("bigint").alias("qty")
    )
    returned = li.filter(F.col("l_returnflag") == "R").select(
        "l_suppkey", F.col("l_quantity").cast("bigint").alias("qty")
    )
    surplus = accepted.exceptAll(returned)
    return surplus.groupBy("l_suppkey").agg(
        F.count("*").alias("surplus_rows"), F.sum("qty").alias("surplus_qty")
    )


ORACLE_EXCEPT_ALL_LINEITEMS = """
WITH surplus AS (
  SELECT l_suppkey, CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem WHERE l_returnflag = 'A'
  EXCEPT ALL
  SELECT l_suppkey, CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem WHERE l_returnflag = 'R')
SELECT l_suppkey, COUNT(*) AS surplus_rows,
       CAST(SUM(qty) AS BIGINT) AS surplus_qty
FROM surplus GROUP BY l_suppkey
"""


QUERIES["set_ops_customers"] = q_set_ops_customers
ORACLE["set_ops_customers"] = ORACLE_SET_OPS_CUSTOMERS
QUERIES["except_all_lineitems"] = q_except_all_lineitems
ORACLE["except_all_lineitems"] = ORACLE_EXCEPT_ALL_LINEITEMS
