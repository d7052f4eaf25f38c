"""Driver-gated twins of the reference's business-query corpus.

``analytics/business.py`` carries the reference's 15 published
analytics queries (`/root/reference/docs/queries/01..05_*.sql`) over
the gold constellation; they are pytest-fixture-asserted
(`tests/test_serving_analytics.py`).  The gold views don't exist in
the driver's correctness harness, so this module re-expresses the
judge-selected query SHAPES over the synthetic star the driver does
register — each one a DataFrame-native plan with a DuckDB oracle, so
the business corpus's operator mix (conditional pivot, role-playing
multi-join, NTILE labeling, two-level aggregation, grouped
percentiles, LAG series) is differentially verified, not just
fixture-asserted.

Shape map (reference SQL → twin here) — ALL 15 published queries:
- Q1 `01_demanda_horaria.sql` day-type pivot + ratio → ``biz_q1``
- Q2 `03_infraestructura.sql` top-20 star join + ×365 projection → ``biz_q2``
- Q3 `02_matriz_od.sql` OD-pair flow matrix + share → ``biz_q3``
- Q4 `02_matriz_od.sql` leg-count histogram (1/2/3/4+) → ``biz_q4``
- Q5 `04_calidad_servicio.sql` role-playing stop joins → ``biz_q5``
- Q6 `01_demanda_horaria.sql` CTE agg + pct-of-peak MAX OVER () → ``biz_q6``
- Q7 `05_usuarios.sql` captive-user share (COUNT DISTINCT=1) → ``biz_q7``
- Q8 `03_infraestructura.sql` NTILE quartile labeling → ``biz_q8``
- Q9 `05_usuarios.sql` per-trip agg → classify → share → ``biz_q9``
- Q10 `04_calidad_servicio.sql` group-vs-global deviation → ``biz_q10``
- Q11 `04_calidad_servicio.sql` per-entity pre-agg + CASE share → ``biz_q11``
- Q12 `04_calidad_servicio.sql` median/p90 + conditional AVG → ``biz_q12``
- Q13 `04_calidad_servicio.sql` LEFT-JOIN coverage audit → ``biz_q13``
- Q14 `01_demanda_horaria.sql` LAG daily series → ``biz_q14``
- Q15 `02_analisis_od.sql` multi-metric + NULLIF ratio profile → ``biz_q15``
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .inventory import t


def q_biz_demand_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 shape: one row per calendar slot (ship month ↔ 30-min
    slot), conditional SUM pivot per category (returnflag ↔ day
    type), then the A-vs-R percent-delta ratio column."""
    li = t(spark, sf_dir, "lineitem")
    qty = lambda flag: F.sum(  # noqa: E731
        F.when(F.col("l_returnflag") == flag, F.col("l_quantity")).otherwise(0.0)
    )
    return (
        li.groupBy(F.month("l_shipdate").cast("long").alias("ship_month"))
        .agg(
            F.round(qty("A"), 2).alias("qty_a"),
            F.round(qty("N"), 2).alias("qty_n"),
            F.round(qty("R"), 2).alias("qty_r"),
            F.round(
                F.expr(
                    "100.0D * sum(CASE WHEN l_returnflag = 'A' THEN l_quantity ELSE 0.0D END)"
                    " / nullif(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0.0D END), 0)"
                    " - 100.0D"
                ),
                1,
            ).alias("pct_a_vs_r"),
        )
    )


ORACLE_BIZ_DEMAND_PIVOT = """
SELECT CAST(MONTH(l_shipdate) AS BIGINT) AS ship_month,
       ROUND(SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity ELSE 0 END), 2) AS qty_a,
       ROUND(SUM(CASE WHEN l_returnflag = 'N' THEN l_quantity ELSE 0 END), 2) AS qty_n,
       ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END), 2) AS qty_r,
       ROUND(100.0 * SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity ELSE 0 END)
             / NULLIF(SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END), 0)
             - 100.0, 1) + 0.0 AS pct_a_vs_r  -- +0.0 folds IEEE -0.0 to 0.0 (Spark's BigDecimal round has no -0)
FROM lineitem
GROUP BY CAST(MONTH(l_shipdate) AS BIGINT)
"""


def q_biz_role_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: fact joined to the SAME dimension in two roles
    (customer-nation and supplier-nation, like board-stop and
    alight-stop), small dims broadcast, HAVING floor, derived ratio."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    joined = (
        li.join(
            F.broadcast(orders.select("o_orderkey", "o_custkey")),
            li["l_orderkey"] == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(supp.select("s_suppkey", "s_nationkey")),
            li["l_suppkey"] == F.col("s_suppkey"),
        )
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
    )
    return (
        joined.groupBy("cust_nation", "supp_nation")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
        )
        .filter(F.col("n_lines") > 10)
    )


ORACLE_BIZ_ROLE_JOINS = """
SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
       COUNT(*) AS n_lines,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       ROUND(AVG(l.l_quantity), 2) AS avg_qty
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
GROUP BY cn.n_name, sn.n_name
HAVING COUNT(*) > 10
"""


def q_biz_coverage_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: aggregate per territory (nation ↔ comuna), derive a
    per-unit coverage metric, NTILE(4) it, attach the category label.
    The NTILE window input is the POST-aggregation nation table (25
    rows) — the documented small-input exact path; the scalable twin
    is ``quantile_buckets`` (plan-asserted in tests)."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    nation = t(spark, sf_dir, "nation")
    per_nation = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .join(
            F.broadcast(
                nation.select("n_nationkey", F.col("n_name").alias("nation"))
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("nation")
        .agg(
            F.countDistinct("o_custkey").alias("n_buyers"),
            F.round(F.sum("o_totalprice"), 0).alias("revenue"),
            F.round(
                F.sum("o_totalprice") / F.countDistinct("o_custkey"), 1
            ).alias("revenue_per_buyer"),
        )
    )
    quart = F.ntile(4).over(
        Window.orderBy(F.col("revenue_per_buyer").asc(), F.col("nation").asc())
    )
    labeled = per_nation.withColumn("q_i", quart).withColumn(
        "category",
        F.element_at(
            F.array(
                F.lit("underserved"),
                F.lit("low"),
                F.lit("medium"),
                F.lit("well-served"),
            ),
            F.col("q_i"),
        ),
    )
    return labeled.select(
        "nation",
        "n_buyers",
        "revenue",
        "revenue_per_buyer",
        # DuckDB NTILE is BIGINT; cast after the INT-indexed element_at
        F.col("q_i").cast("long").alias("coverage_quartile"),
        "category",
    )


ORACLE_BIZ_COVERAGE_QUARTILES = """
WITH per_nation AS (
  SELECT n.n_name AS nation,
         COUNT(DISTINCT o.o_custkey) AS n_buyers,
         ROUND(SUM(o.o_totalprice), 0) AS revenue,
         ROUND(SUM(o.o_totalprice) / COUNT(DISTINCT o.o_custkey), 1) AS revenue_per_buyer
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n   ON n.n_nationkey = c.c_nationkey
  GROUP BY n.n_name)
SELECT nation, n_buyers, revenue, revenue_per_buyer,
       NTILE(4) OVER (ORDER BY revenue_per_buyer ASC, nation ASC) AS coverage_quartile,
       CASE NTILE(4) OVER (ORDER BY revenue_per_buyer ASC, nation ASC)
            WHEN 1 THEN 'underserved' WHEN 2 THEN 'low'
            WHEN 3 THEN 'medium' WHEN 4 THEN 'well-served' END AS category
FROM per_nation
"""


def q_biz_intermodality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: two-level aggregation — per trip (order), flag which
    modes (returnflags) appear and average the transfer metric over
    non-first legs; classify each trip; then share-of-total and the
    grouped MEDIAN of the per-trip mean (the ordered-set-aggregate
    re-expression, SURVEY §2.5 W6)."""
    li = t(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.max(F.when(F.col("l_returnflag") == "A", 1).otherwise(0)).alias("has_a"),
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("has_r"),
        F.avg(
            F.when(F.col("l_linenumber") > 1, F.col("l_discount"))
        ).alias("later_disc"),
        F.countDistinct("l_linenumber").alias("n_lines"),
    )
    classified = per_order.withColumn(
        "trip_type",
        F.when((F.col("has_a") == 1) & (F.col("has_r") == 1), "A + R")
        .when(F.col("has_a") == 1, "solo A")
        .when(F.col("has_r") == 1, "solo R")
        .otherwise("solo N"),
    )
    total = Window.partitionBy()
    return (
        classified.groupBy("trip_type")
        .agg(
            F.count("*").alias("n_trips"),
            F.round(F.avg(F.col("n_lines").cast("double")), 2).alias("avg_lines"),
            F.round(F.avg("later_disc"), 4).alias("avg_later_disc"),
            F.round(F.expr("percentile(later_disc, 0.5D)"), 4).alias(
                "median_later_disc"
            ),
        )
        .withColumn(
            "pct_trips",
            F.round(
                F.lit(100.0) * F.col("n_trips") / F.sum("n_trips").over(total), 2
            ),
        )
    )


ORACLE_BIZ_INTERMODALITY = """
WITH per_order AS (
  SELECT l_orderkey,
         MAX(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS has_a,
         MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_r,
         AVG(CASE WHEN l_linenumber > 1 THEN l_discount END) AS later_disc,
         COUNT(DISTINCT l_linenumber) AS n_lines
  FROM lineitem GROUP BY l_orderkey),
classified AS (
  SELECT *,
         CASE WHEN has_a = 1 AND has_r = 1 THEN 'A + R'
              WHEN has_a = 1 THEN 'solo A'
              WHEN has_r = 1 THEN 'solo R'
              ELSE 'solo N' END AS trip_type
  FROM per_order)
SELECT trip_type,
       COUNT(*) AS n_trips,
       ROUND(AVG(CAST(n_lines AS DOUBLE)), 2) AS avg_lines,
       ROUND(AVG(later_disc), 4) AS avg_later_disc,
       ROUND(quantile_cont(later_disc, 0.5), 4) AS median_later_disc,
       ROUND(100.0 * COUNT(*) / SUM(COUNT(*)) OVER (), 2) AS pct_trips
FROM classified
GROUP BY trip_type
"""


def q_biz_wait_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: per mode (order status), mean + exact interpolated
    median/p90 of the wait metric (total price), plus conditional
    means per day-type (order priority), with the reference's
    plausibility band filter."""
    orders = t(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_totalprice").between(0, 400000))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.avg("o_totalprice"), 2).alias("price_avg"),
            F.round(F.expr("percentile(o_totalprice, 0.5D)"), 2).alias(
                "price_median"
            ),
            F.round(F.expr("percentile(o_totalprice, 0.9D)"), 2).alias(
                "price_p90"
            ),
            F.round(
                F.avg(
                    F.when(
                        F.col("o_orderpriority") == "1-URGENT",
                        F.col("o_totalprice"),
                    )
                ),
                2,
            ).alias("avg_urgent"),
            F.round(
                F.avg(
                    F.when(
                        F.col("o_orderpriority") == "5-LOW", F.col("o_totalprice")
                    )
                ),
                2,
            ).alias("avg_low"),
        )
    )


ORACLE_BIZ_WAIT_PERCENTILES = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       ROUND(AVG(o_totalprice), 2) AS price_avg,
       ROUND(quantile_cont(o_totalprice, 0.5), 2) AS price_median,
       ROUND(quantile_cont(o_totalprice, 0.9), 2) AS price_p90,
       ROUND(AVG(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END), 2) AS avg_urgent,
       ROUND(AVG(CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice END), 2) AS avg_low
FROM orders
WHERE o_totalprice BETWEEN 0 AND 400000
GROUP BY o_orderstatus
"""


def q_biz_daily_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: per-day distinct cards (customers), sample count,
    expanded demand (price sum), and the LAG delta vs the previous
    day.  Aggregated by MONTH here so the unpartitioned LAG window's
    input is the post-aggregation month table (≤ 80 rows) — same
    small-input rationale as the reference's daily series over one
    weekly cut; the arbitrarily-growing variant belongs to
    ``lag_daily_delta``'s partitioned form."""
    orders = t(spark, sf_dir, "orders")
    # demand rounds to CENTS, not integers: the price sum is exact at 2
    # decimals in a double, while ROUND(x, 0) sits on .5 boundaries
    # where the two engines' accumulated last-bit differences flip the
    # result (verify-skill gotcha: round aggressively but never ON a
    # representable boundary of the data)
    # month as int YYYYMM (the reference's date_sk surrogate pattern,
    # transforms.py:82-84) — engine-portable, no date/timestamp
    # representation skew between Spark and the oracle
    monthly = orders.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("long")
        .alias("month_sk")
    ).agg(
        F.countDistinct("o_custkey").alias("n_buyers"),
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("demand"),
    )
    lag = F.lag("demand").over(Window.orderBy("month_sk"))
    return monthly.withColumn("delta_vs_prev", F.round(F.col("demand") - lag, 2))


ORACLE_BIZ_DAILY_LAG = """
WITH monthly AS (
  SELECT CAST(YEAR(o_orderdate) * 100 + MONTH(o_orderdate) AS BIGINT) AS month_sk,
         COUNT(DISTINCT o_custkey) AS n_buyers,
         COUNT(*) AS n_orders,
         ROUND(SUM(o_totalprice), 2) AS demand
  FROM orders GROUP BY 1)
SELECT month_sk, n_buyers, n_orders, demand,
       ROUND(demand - LAG(demand) OVER (ORDER BY month_sk), 2) AS delta_vs_prev
FROM monthly
"""


def q_biz_od_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape (`02_matriz_od.sql`): origin→destination flow matrix —
    pair-grouped leg counts (customer nation → supplier nation, like
    board-comuna → alight-comuna) with each pair's percent share of
    the total flow (SUM OVER ())."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation")
    flows = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(nat.select(
                F.col("n_nationkey").alias("on_key"),
                F.col("n_name").alias("origin"),
            )),
            F.col("c_nationkey") == F.col("on_key"),
        )
        .join(
            F.broadcast(nat.select(
                F.col("n_nationkey").alias("dn_key"),
                F.col("n_name").alias("destination"),
            )),
            F.col("s_nationkey") == F.col("dn_key"),
        )
        .groupBy("origin", "destination")
        .agg(F.count("*").alias("n_flows"))
    )
    w = Window.partitionBy()
    return flows.withColumn(
        "pct_of_total",
        F.round(100.0 * F.col("n_flows") / F.sum("n_flows").over(w), 4),
    ).filter(F.col("n_flows") >= 20)


ORACLE_BIZ_OD_MATRIX = """
WITH flows AS (
  SELECT no.n_name AS origin, ns.n_name AS destination, COUNT(*) AS n_flows
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation no  ON c.c_nationkey = no.n_nationkey
  JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
  GROUP BY no.n_name, ns.n_name),
ranked AS (
  -- window BEFORE the floor filter (SQL WHERE runs before windows,
  -- but the share must be of the TOTAL flow); CAST because DuckDB's
  -- 100.0 literal is DECIMAL where Spark's is double
  SELECT origin, destination, n_flows,
         ROUND(CAST(100.0 AS DOUBLE) * n_flows / SUM(n_flows) OVER (), 4)
           AS pct_of_total
  FROM flows)
SELECT origin, destination, n_flows, pct_of_total
FROM ranked
WHERE n_flows >= 20
"""


def q_biz_order_complexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape (`02_matriz_od.sql` trip-complexity block): per-entity
    leg count → CASE bucket → distribution with percent share (the
    1/2/3/4+ etapas histogram)."""
    li = t(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(F.count("*").alias("n_legs"))
    bucket = (
        F.when(F.col("n_legs") >= 4, F.lit("4+"))
        .otherwise(F.col("n_legs").cast("string"))
        .alias("complexity")
    )
    dist = per_order.select(bucket).groupBy("complexity").agg(
        F.count("*").alias("n_orders")
    )
    w = Window.partitionBy()
    return dist.withColumn(
        "pct",
        F.round(100.0 * F.col("n_orders") / F.sum("n_orders").over(w), 4),
    )


ORACLE_BIZ_ORDER_COMPLEXITY = """
WITH per_order AS (
  SELECT l_orderkey, COUNT(*) AS n_legs FROM lineitem GROUP BY l_orderkey),
dist AS (
  SELECT CASE WHEN n_legs >= 4 THEN '4+' ELSE CAST(n_legs AS VARCHAR) END
           AS complexity,
         COUNT(*) AS n_orders
  FROM per_order GROUP BY 1)
SELECT complexity, n_orders,
       ROUND(CAST(100.0 AS DOUBLE) * n_orders / SUM(n_orders) OVER (), 4)
         AS pct
FROM dist
"""


def q_biz_captive_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape (`05_usuarios.sql` captive-users block): per-user
    distinct-category count, captivity flag (exactly one category),
    then the captive share per segment — COUNT DISTINCT → boolean
    classify → second-level aggregation."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    part = t(spark, sf_dir, "part")
    per_cust = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("o_custkey")
        .agg(F.countDistinct("p_brand").alias("n_brands"))
    )
    return (
        per_cust.join(cust, per_cust.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_users"),
            F.sum(
                F.when(F.col("n_brands") == 1, 1).otherwise(0)
            ).alias("n_captive"),
        )
        .withColumn(
            "captive_pct",
            F.round(100.0 * F.col("n_captive") / F.col("n_users"), 4),
        )
    )


ORACLE_BIZ_CAPTIVE_USERS = """
WITH per_cust AS (
  SELECT o.o_custkey, COUNT(DISTINCT p.p_brand) AS n_brands
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p   ON l.l_partkey = p.p_partkey
  GROUP BY o.o_custkey)
SELECT c.c_mktsegment,
       COUNT(*) AS n_users,
       CAST(SUM(CASE WHEN n_brands = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_captive,
       ROUND(CAST(100.0 AS DOUBLE)
             * SUM(CASE WHEN n_brands = 1 THEN 1 ELSE 0 END)
             / COUNT(*), 4) AS captive_pct
FROM per_cust pc JOIN customer c ON pc.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


def q_biz_deviation_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape (`04_calidad_servicio.sql` deviation block): group
    average vs the global average as a deviation ratio — integer SUM /
    COUNT per group against the same over the whole fact, so the
    ratio is exact before the final round (no float-sum drift)."""
    li = t(spark, sf_dir, "lineitem")
    grouped = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.count("*").alias("n_legs"),
    )
    w = Window.partitionBy()
    return grouped.select(
        "l_returnflag",
        "l_linestatus",
        "n_legs",
        F.round(
            (F.col("sum_qty") / F.col("n_legs"))
            / (
                F.sum("sum_qty").over(w) / F.sum("n_legs").over(w)
            ),
            4,
        ).alias("deviation_factor"),
    )


ORACLE_BIZ_DEVIATION_FACTOR = """
WITH grouped AS (
  SELECT l_returnflag, l_linestatus,
         SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
         COUNT(*) AS n_legs
  FROM lineitem GROUP BY l_returnflag, l_linestatus)
SELECT l_returnflag, l_linestatus, n_legs,
       ROUND((CAST(sum_qty AS DOUBLE) / n_legs)
             / (CAST(SUM(sum_qty) OVER () AS DOUBLE)
                / SUM(n_legs) OVER ()), 4)
         AS deviation_factor
FROM grouped
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "biz_q1_demand_pivot": q_biz_demand_pivot,
    "biz_q3_od_matrix": q_biz_od_matrix,
    "biz_q4_order_complexity": q_biz_order_complexity,
    "biz_q5_role_joins": q_biz_role_joins,
    "biz_q7_captive_users": q_biz_captive_users,
    "biz_q8_coverage_quartiles": q_biz_coverage_quartiles,
    "biz_q9_intermodality": q_biz_intermodality,
    "biz_q10_deviation_factor": q_biz_deviation_factor,
    "biz_q12_wait_percentiles": q_biz_wait_percentiles,
    "biz_q14_daily_lag": q_biz_daily_lag,
}

ORACLE: dict[str, str] = {
    "biz_q1_demand_pivot": ORACLE_BIZ_DEMAND_PIVOT,
    "biz_q3_od_matrix": ORACLE_BIZ_OD_MATRIX,
    "biz_q4_order_complexity": ORACLE_BIZ_ORDER_COMPLEXITY,
    "biz_q5_role_joins": ORACLE_BIZ_ROLE_JOINS,
    "biz_q7_captive_users": ORACLE_BIZ_CAPTIVE_USERS,
    "biz_q8_coverage_quartiles": ORACLE_BIZ_COVERAGE_QUARTILES,
    "biz_q9_intermodality": ORACLE_BIZ_INTERMODALITY,
    "biz_q10_deviation_factor": ORACLE_BIZ_DEVIATION_FACTOR,
    "biz_q12_wait_percentiles": ORACLE_BIZ_WAIT_PERCENTILES,
    "biz_q14_daily_lag": ORACLE_BIZ_DAILY_LAG,
}


# ── round-4 session 2: the remaining five shapes (Q2/Q6/Q11/Q13/Q15) ─
#
# With these, all 15 published business queries have driver-gated
# shape twins: the corpus is fully differentially verified.


def q_biz_critical_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape (`03_infraestructura.sql` top-20 critical stops):
    filtered star join, multi-attribute grouping carrying dimension
    columns through, a derived projection column (daily × 365), ORDER
    BY metric DESC LIMIT 20 with a deterministic tiebreak."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    return (
        li.filter(F.col("l_returnflag") == "N")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey", "p_brand", "p_type")
        .agg(
            F.round(F.sum("l_quantity"), 0).alias("qty_daily"),
            F.round(F.sum("l_quantity") * 365, 0).alias("qty_annualized"),
        )
        .orderBy(F.desc("qty_daily"), F.asc("p_partkey"))
        .limit(20)
    )


ORACLE_BIZ_CRITICAL_PARTS = """
SELECT p.p_partkey, p.p_brand, p.p_type,
       ROUND(SUM(l.l_quantity), 0) AS qty_daily,
       ROUND(SUM(l.l_quantity) * 365, 0) AS qty_annualized
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_returnflag = 'N'
GROUP BY p.p_partkey, p.p_brand, p.p_type
ORDER BY qty_daily DESC, p.p_partkey ASC
LIMIT 20
"""


def q_biz_pct_of_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape (`01_demanda_horaria.sql` passengers in transit):
    CTE aggregate, then percent-of-peak via MAX() OVER () — the
    share-of-global-max window over a pre-aggregated series."""
    o = t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.month("o_orderdate").cast("long").alias("order_month")
    ).agg(F.round(F.sum("o_totalprice"), 0).alias("demand"))
    w = Window.partitionBy()
    return monthly.select(
        "order_month",
        "demand",
        F.round(
            F.lit(100.0) * F.col("demand") / F.max("demand").over(w), 1
        ).alias("pct_of_peak"),
    )


ORACLE_BIZ_PCT_OF_PEAK = """
WITH monthly AS (
  SELECT CAST(MONTH(o_orderdate) AS BIGINT) AS order_month,
         ROUND(SUM(o_totalprice), 0) AS demand
  FROM orders GROUP BY 1)
SELECT order_month, demand,
       ROUND(100.0 * demand / MAX(demand) OVER (), 1) AS pct_of_peak
FROM monthly
"""


def q_biz_transfer_propensity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape (`04_calidad_servicio.sql` transfer propensity):
    per-entity pre-aggregate (legs per trip ↔ lines per order), then
    per-category averages + a CASE-share column, ordered by the
    share."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count("*").alias("n_lines")
    )
    joined = o.join(
        per_order, F.col("o_orderkey") == F.col("l_orderkey"), "inner"
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("orders"),
            F.round(F.avg(F.col("n_lines").cast("double")), 3).alias(
                "lines_avg"
            ),
            F.round(F.avg("o_totalprice"), 1).alias("price_avg"),
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("n_lines") > 1, 1).otherwise(0))
                / F.count("*"),
                2,
            ).alias("pct_multi_line"),
        )
    )


ORACLE_BIZ_TRANSFER_PROPENSITY = """
WITH per_order AS (
  SELECT l_orderkey, COUNT(*) AS n_lines FROM lineitem GROUP BY l_orderkey)
SELECT o.o_orderpriority,
       COUNT(*) AS orders,
       ROUND(AVG(CAST(p.n_lines AS DOUBLE)), 3) AS lines_avg,
       ROUND(AVG(o.o_totalprice), 1) AS price_avg,
       ROUND(100.0 * SUM(CASE WHEN p.n_lines > 1 THEN 1 ELSE 0 END)
             / COUNT(*), 2) AS pct_multi_line
FROM orders o JOIN per_order p ON o.o_orderkey = p.l_orderkey
GROUP BY o.o_orderpriority
"""


def q_biz_coverage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape (`04_calidad_servicio.sql` alight-coverage audit):
    LEFT JOIN to a dimension that genuinely misses (customers with
    non-positive balance excluded), boolean coverage counts, coverage
    percent, and a conditional AVG over only the covered rows."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    joined = o.join(
        F.broadcast(c.select("c_custkey", "c_mktsegment")),
        F.col("o_custkey") == F.col("c_custkey"),
        "left",
    )
    covered = F.col("c_custkey").isNotNull()
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("total_orders"),
        F.sum(covered.cast("bigint")).alias("with_dim"),
        (F.count("*") - F.sum(covered.cast("bigint"))).alias("without_dim"),
        F.round(
            F.lit(100.0) * F.sum(covered.cast("bigint")) / F.count("*"), 2
        ).alias("pct_covered"),
        F.round(
            F.avg(F.when(covered, F.col("o_totalprice") / 100.0)), 1
        ).alias("covered_price_h"),
    )


ORACLE_BIZ_COVERAGE_AUDIT = """
WITH dim AS (
  SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 0)
SELECT o.o_orderpriority,
       COUNT(*) AS total_orders,
       CAST(SUM(CASE WHEN d.c_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS with_dim,
       CAST(COUNT(*) - SUM(CASE WHEN d.c_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS without_dim,
       ROUND(100.0 * SUM(CASE WHEN d.c_custkey IS NOT NULL THEN 1 ELSE 0 END)
             / COUNT(*), 2) AS pct_covered,
       ROUND(AVG(CASE WHEN d.c_custkey IS NOT NULL
                 THEN o.o_totalprice / 100.0 END), 1) AS covered_price_h
FROM orders o LEFT JOIN dim d ON o.o_custkey = d.c_custkey
GROUP BY o.o_orderpriority
"""


def q_biz_efficiency_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape (`02_analisis_od.sql` efficiency by purpose):
    multi-metric profile per category — counts, rounded demand sum,
    averages, a NULLIF-guarded ratio of two averages (speed ↔ price
    per unit), and two complementary CASE-percent columns."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    joined = li.join(
        o.select("o_orderkey", "o_orderpriority", "o_orderstatus"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("lines"),
        F.round(F.sum("l_extendedprice"), 0).alias("demand"),
        F.round(F.avg("l_quantity"), 3).alias("qty_avg"),
        F.round(
            F.avg("l_extendedprice")
            / F.nullif(F.avg("l_quantity"), F.lit(0.0)),
            1,
        ).alias("price_per_unit"),
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            / F.count("*"),
            1,
        ).alias("pct_f"),
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0))
            / F.count("*"),
            1,
        ).alias("pct_o"),
    )


ORACLE_BIZ_EFFICIENCY_PROFILE = """
SELECT o.o_orderpriority,
       COUNT(*) AS lines,
       ROUND(SUM(l.l_extendedprice), 0) AS demand,
       ROUND(AVG(l.l_quantity), 3) AS qty_avg,
       ROUND(AVG(l.l_extendedprice) / NULLIF(AVG(l.l_quantity), 0), 1) AS price_per_unit,
       ROUND(100.0 * SUM(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END)
             / COUNT(*), 1) AS pct_f,
       ROUND(100.0 * SUM(CASE WHEN o.o_orderstatus = 'O' THEN 1 ELSE 0 END)
             / COUNT(*), 1) AS pct_o
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""


QUERIES["biz_q2_critical_parts"] = q_biz_critical_parts
ORACLE["biz_q2_critical_parts"] = ORACLE_BIZ_CRITICAL_PARTS
QUERIES["biz_q6_pct_of_peak"] = q_biz_pct_of_peak
ORACLE["biz_q6_pct_of_peak"] = ORACLE_BIZ_PCT_OF_PEAK
QUERIES["biz_q11_transfer_propensity"] = q_biz_transfer_propensity
ORACLE["biz_q11_transfer_propensity"] = ORACLE_BIZ_TRANSFER_PROPENSITY
QUERIES["biz_q13_coverage_audit"] = q_biz_coverage_audit
ORACLE["biz_q13_coverage_audit"] = ORACLE_BIZ_COVERAGE_AUDIT
QUERIES["biz_q15_efficiency_profile"] = q_biz_efficiency_profile
ORACLE["biz_q15_efficiency_profile"] = ORACLE_BIZ_EFFICIENCY_PROFILE
