"""SURVEY §2 operator inventory, demonstrated on the driver's
TPC-H-ish testdata (`/root/testdata/sf*/`) with a DuckDB oracle per
query.

Every entry is implemented through the engine's operator/function
library (not ad-hoc SQL), so the correctness gate exercises the same
code paths the DTPM pipeline uses. Operator IDs in each docstring map
to SURVEY §2 rows; reference citations are in the operator modules.

Determinism contract with the oracle:
- every computed double is ``round``-ed (2–6 digits) on BOTH sides;
- every LIMIT/top-k goes through row_number with a full tiebreak;
- aggregate/computed columns carry identical aliases on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.datetime_fns import date_sk, time_30m_sk
from ..operators.asof import asof_join, snapshots_to_scd2
from ..operators.dedup import dedup_keep_latest
from ..operators.quality import QualityRule, split_by_quality, tag_quality
from ..operators.windows import pct_of_total, quantile_buckets, top_k_per_group


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet table loader (partition-pruned, column-pruned scans).

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` it scans as long
    nanoseconds and is converted here to a proper timestamp (truncated
    to micros, matching DuckDB's ns→us read). The conf is set here as
    well so the queries also work on a caller-provided vanilla
    session (e.g. the driver's). The session timezone is pinned UTC
    for the same reason: the corpus/sql-surface gates reinterpret
    TIMESTAMP_NTZ scans as instants (unix_micros), which must agree
    with DuckDB's UTC epoch on a driver session whose JVM default
    timezone could be anything."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


# --------------------------------------------------------------------------
# A3/A6 — flagship aggregation (TPC-H Q1 shape: the reference's
# demand-curve query class, SURVEY §2.4)
# --------------------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + SUM/AVG/COUNT over the big fact (A3), conditional
    revenue expression inside the aggregate (A6)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


ORACLE_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                              AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                         AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)      AS sum_disc_price,
       ROUND(AVG(l_quantity), 4)                              AS avg_qty,
       ROUND(AVG(l_discount), 4)                              AS avg_disc,
       COUNT(*)                                               AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# P1/P4 + §2.8 scalar functions — typed enrichment projection
# --------------------------------------------------------------------------


def q_typed_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrichment projection (P1): cast/normalize/derive SKs from an
    event stream — date_sk (YYYYMMDD int), 30-min slot, upper-trim
    normalization, JSON field extraction; then a distribution agg so
    the result is compact."""
    ev = t(spark, sf_dir, "events")
    enriched = ev.select(
        F.col("event_id"),
        date_sk(F.col("ts")).alias("date_sk"),
        time_30m_sk(F.col("ts")).alias("time_30m_sk"),
        F.upper(F.trim(F.col("event_type"))).alias("event_type_norm"),
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
        F.col("value"),
    )
    return enriched.groupBy("date_sk", "time_30m_sk", "event_type_norm").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.round(F.avg("prop_k"), 4).alias("avg_prop_k"),
    )


ORACLE_TYPED_PROJECTION = """
WITH enriched AS (
  SELECT event_id,
         CAST(strftime(ts, '%Y%m%d') AS INTEGER)                        AS date_sk,
         CAST(EXTRACT(hour FROM ts) * 2
              + CASE WHEN EXTRACT(minute FROM ts) >= 30 THEN 1 ELSE 0 END
              AS INTEGER)                                               AS time_30m_sk,
         UPPER(TRIM(event_type))                                        AS event_type_norm,
         CAST(json_extract_string(props, '$.k') AS INTEGER)             AS prop_k,
         value
  FROM events)
SELECT date_sk, time_30m_sk, event_type_norm,
       COUNT(*)              AS n_events,
       ROUND(SUM(value), 2)  AS sum_value,
       ROUND(AVG(prop_k), 4) AS avg_prop_k
FROM enriched
GROUP BY date_sk, time_30m_sk, event_type_norm
"""


# --------------------------------------------------------------------------
# P5/P6 — ordered quality tagging + quarantine split
# --------------------------------------------------------------------------

_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def _tag_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    rules = [
        QualityRule("MISSING_ID", F.col("user_id").isNull()),
        QualityRule("MISSING_TIMESTAMP", F.col("ts").isNull()),
        QualityRule("BAD_RANGE_VALUE", F.col("value") > 400.0),
        QualityRule("BAD_TYPE", ~F.col("event_type").isin(_EVENT_TYPES)),
        QualityRule("ERROR_EVENT", F.col("event_type") == "error"),
    ]
    return tag_quality(ev, rules)


def q_quality_split_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Valid side of the ordered-precedence quarantine split (P5/P6):
    a row matching several rules gets only the FIRST reason."""
    valid, _ = split_by_quality(_tag_events(spark, sf_dir))
    return valid.select("event_id", "user_id", "event_type", "value")


def q_quality_split_invalid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarantine side with first-match reason_code + distribution."""
    _, invalid = split_by_quality(_tag_events(spark, sf_dir))
    return invalid.groupBy("reason_code").agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


_ORACLE_TAG = """
  SELECT *,
         CASE WHEN user_id IS NULL THEN 'MISSING_ID'
              WHEN ts IS NULL THEN 'MISSING_TIMESTAMP'
              WHEN value > 400.0 THEN 'BAD_RANGE_VALUE'
              WHEN event_type NOT IN ('click','view','purchase','signup','error')
                   THEN 'BAD_TYPE'
              WHEN event_type = 'error' THEN 'ERROR_EVENT'
              ELSE NULL END AS reason_code
  FROM events
"""

ORACLE_QUALITY_SPLIT_VALID = f"""
SELECT event_id, user_id, event_type, value
FROM ({_ORACLE_TAG}) WHERE reason_code IS NULL
"""

ORACLE_QUALITY_SPLIT_INVALID = f"""
SELECT reason_code, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
FROM ({_ORACLE_TAG}) WHERE reason_code IS NOT NULL
GROUP BY reason_code
"""


# --------------------------------------------------------------------------
# U1 — wide→long unpivot (the leg-unpivot shape, via stack)
# --------------------------------------------------------------------------


def q_measure_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way unpivot of lineitem measures into (measure, value) rows —
    the reference's wide-trip→legs UNION ALL (U1) expressed with
    ``stack`` (one pass, no 4 rescans)."""
    li = t(spark, sf_dir, "lineitem")
    long = li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(4, 'quantity', l_quantity, 'extendedprice', l_extendedprice,"
            " 'discount', l_discount, 'tax', l_tax) AS (measure, m_value)"
        ),
    )
    return long.groupBy("measure").agg(
        F.count("*").alias("n"),
        F.round(F.sum("m_value"), 2).alias("total"),
    )


ORACLE_MEASURE_UNPIVOT = """
WITH long AS (
  SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS m_value FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem)
SELECT measure, COUNT(*) AS n, ROUND(SUM(m_value), 2) AS total
FROM long GROUP BY measure
"""


# --------------------------------------------------------------------------
# W1 — dedup keep-latest
# --------------------------------------------------------------------------


def q_dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW_NUMBER dedup: one row per (user_id, event_type), the latest
    by ts (event_id DESC tiebreak — deterministic, SURVEY §7.4.5)."""
    ev = t(spark, sf_dir, "events")
    latest = dedup_keep_latest(
        ev,
        grain=["user_id", "event_type"],
        order_by=[F.col("ts").desc(), F.col("event_id").desc()],
    )
    return latest.select(
        "user_id", "event_type", "event_id", date_sk(F.col("ts")).alias("date_sk")
    )


ORACLE_DEDUP_KEEP_LATEST = """
SELECT user_id, event_type, event_id,
       CAST(strftime(ts, '%Y%m%d') AS INTEGER) AS date_sk
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
WHERE rn = 1
"""


# --------------------------------------------------------------------------
# §4.3 — SCD2 timeline build (set-based)
# --------------------------------------------------------------------------


def _scd2_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 versions of per-customer order status: snapshots =
    (custkey, orderdate) keeping the highest orderkey per day.

    The keep-latest dedup is a single ``max_by`` aggregate (map-side
    combinable) rather than a row_number window — one shuffle instead
    of window-sort + re-aggregation; orderkey is unique so the winner
    is deterministic and identical to the ROW_NUMBER oracle.

    The explicit repartition on the BK alone makes the whole chain a
    SINGLE exchange: HashPartitioning(custkey) satisfies the
    ClusteredDistribution of the (custkey, day) groupBy AND of every
    downstream BK window, so Catalyst inserts no further shuffles
    (plan-checked: 1 Exchange instead of 2; 2× faster at sf0.1)."""
    o = t(spark, sf_dir, "orders")
    snap = (
        o.repartition("o_custkey")
        .groupBy(
            "o_custkey", F.col("o_orderdate").cast("date").alias("event_date")
        )
        .agg(
            F.max_by(
                F.struct("o_orderstatus", "o_orderpriority"), F.col("o_orderkey")
            ).alias("_w")
        )
        .select(
            "o_custkey",
            "event_date",
            F.col("_w.o_orderstatus").alias("o_orderstatus"),
            F.col("_w.o_orderpriority").alias("o_orderpriority"),
        )
    )
    return snapshots_to_scd2(
        snap,
        bk="o_custkey",
        event_date="event_date",
        attrs=["o_orderstatus", "o_orderpriority"],
        # the max_by aggregate above already guarantees one row per
        # (custkey, day) — skip the first() re-consolidation pass
        pre_consolidated=True,
    )


def q_scd2_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-snapshot SCD2 construction (SURVEY §4.3): consolidate →
    drop unchanged-hash versions → valid_from/valid_to/is_current."""
    dim = _scd2_dim(spark, sf_dir)
    return dim.select(
        "o_custkey",
        "o_orderstatus",
        "o_orderpriority",
        "row_hash",
        F.col("valid_from").cast("string").alias("valid_from"),
        F.col("valid_to").cast("string").alias("valid_to"),
        "is_current",
    )


_ORACLE_SCD2_DIM = """
  WITH snap AS (
    SELECT o_custkey, CAST(o_orderdate AS DATE) AS event_date,
           o_orderstatus, o_orderpriority,
           ROW_NUMBER() OVER (PARTITION BY o_custkey, CAST(o_orderdate AS DATE)
                              ORDER BY o_orderkey DESC) AS rn
    FROM orders),
  one AS (
    SELECT o_custkey, event_date, o_orderstatus, o_orderpriority,
           sha256(concat_ws('||',
             COALESCE(UPPER(TRIM(o_orderstatus)), ''),
             COALESCE(UPPER(TRIM(o_orderpriority)), ''))) AS row_hash
    FROM snap WHERE rn = 1),
  chg AS (
    SELECT *, LAG(row_hash) OVER (PARTITION BY o_custkey ORDER BY event_date) AS prev_hash
    FROM one),
  vers AS (
    SELECT o_custkey, o_orderstatus, o_orderpriority, row_hash,
           event_date AS valid_from,
           LEAD(event_date) OVER (PARTITION BY o_custkey ORDER BY event_date) - 1
             AS valid_to
    FROM chg WHERE prev_hash IS NULL OR prev_hash <> row_hash)
  SELECT o_custkey, o_orderstatus, o_orderpriority, row_hash, valid_from, valid_to,
         (valid_to IS NULL) AS is_current
  FROM vers
"""

ORACLE_SCD2_TIMELINE = f"""
SELECT o_custkey, o_orderstatus, o_orderpriority, row_hash,
       CAST(valid_from AS VARCHAR) AS valid_from,
       CAST(valid_to   AS VARCHAR) AS valid_to,
       is_current
FROM ({_ORACLE_SCD2_DIM})
"""


# --------------------------------------------------------------------------
# J2 — AS-OF join (fact event time → SCD2 validity window)
# --------------------------------------------------------------------------


def q_asof_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of SK resolution (J2): lineitem events (l_shipdate) resolve
    the customer-status version valid at ship time. Equality on the BK
    keeps this a broadcast HASH join with the validity window as a
    residual condition — not a nested-loop join."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    dim = _scd2_dim(spark, sf_dir).select(
        F.col("o_custkey"),
        F.col("o_orderstatus").alias("status_at_ship"),
        F.col("valid_from"),
        F.col("valid_to"),
    )
    fact = li.join(o, li.l_orderkey == o.o_orderkey, "inner").select(
        "l_orderkey",
        "o_custkey",
        F.col("l_shipdate").cast("date").alias("ship_date"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )
    resolved = asof_join(
        fact,
        dim,
        bk="o_custkey",
        event_time="ship_date",
    )
    return resolved.groupBy("status_at_ship").agg(
        F.count("*").alias("n_lineitems"),
        F.round(F.sum("revenue"), 2).alias("revenue"),
    )


def q_asof_merge_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same as-of resolution through the BIG-DIM path
    (``asof_join_merge``: union + carry-forward window, no broadcast,
    no join) — shares ``asof_resolve``'s oracle, proving the two
    strategies agree."""
    from ..operators.asof import asof_join_merge

    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    dim = _scd2_dim(spark, sf_dir).select(
        F.col("o_custkey"),
        F.col("o_orderstatus").alias("status_at_ship"),
        F.col("valid_from"),
        F.col("valid_to"),
    )
    fact = li.join(o, li.l_orderkey == o.o_orderkey, "inner").select(
        "l_orderkey",
        "o_custkey",
        F.col("l_shipdate").cast("date").alias("ship_date"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )
    resolved = asof_join_merge(
        fact,
        dim,
        bk="o_custkey",
        event_time="ship_date",
    )
    return resolved.groupBy("status_at_ship").agg(
        F.count("*").alias("n_lineitems"),
        F.round(F.sum("revenue"), 2).alias("revenue"),
    )


ORACLE_ASOF_RESOLVE = f"""
WITH dim AS ({_ORACLE_SCD2_DIM}),
fact AS (
  SELECT l.l_orderkey, o.o_custkey, CAST(l.l_shipdate AS DATE) AS ship_date,
         l.l_extendedprice * (1 - l.l_discount) AS revenue
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
SELECT d.o_orderstatus AS status_at_ship,
       COUNT(*) AS n_lineitems,
       ROUND(SUM(f.revenue), 2) AS revenue
FROM fact f
LEFT JOIN dim d
  ON f.o_custkey = d.o_custkey
 AND d.valid_from <= f.ship_date
 AND (d.valid_to IS NULL OR f.ship_date <= d.valid_to)
GROUP BY d.o_orderstatus
"""


# --------------------------------------------------------------------------
# Keyless interval (range) join — bucketized band join
# --------------------------------------------------------------------------


def q_range_join_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless interval join via ``operators/range_join.interval_join``:
    1995-H1 shipments × urgent-order 14-day windows with NO equality
    key — the bucketed band join turns what Catalyst would plan as a
    nested-loop into a plain bucket equi-join + residual (each
    matching pair meets in exactly one bucket, so no dedup pass).
    Summarized per ship month; quantities summed as integers so the
    oracle compare is addition-order-free."""
    from ..operators.range_join import interval_join

    li = t(spark, sf_dir, "lineitem")
    pts = li.select(
        F.col("l_shipdate").cast("date").alias("ship_date"),
        F.col("l_quantity").cast("int").alias("qty"),
    ).filter(
        (F.col("ship_date") >= F.lit("1995-01-01"))
        & (F.col("ship_date") <= F.lit("1995-06-30"))
    )
    o = t(spark, sf_dir, "orders")
    win = o.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate").cast("date") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate").cast("date") <= F.lit("1995-06-30"))
    ).select(
        F.col("o_orderkey").alias("window_id"),
        F.col("o_orderdate").cast("date").alias("win_lo"),
        F.date_add(F.col("o_orderdate").cast("date"), 14).alias("win_hi"),
    )
    joined = interval_join(
        pts, win, "ship_date", "win_lo", "win_hi", bucket_width_days=7
    )
    return joined.groupBy(
        F.month("ship_date").alias("ship_month")
    ).agg(
        F.count("*").alias("n_pairs"),
        F.countDistinct("window_id").alias("n_windows"),
        F.sum("qty").alias("sum_qty"),
    )


ORACLE_RANGE_JOIN_SHIPMENTS = """
WITH pts AS (
  SELECT CAST(l_shipdate AS DATE) AS ship_date, CAST(l_quantity AS INT) AS qty
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1995-06-30'),
win AS (
  SELECT o_orderkey AS window_id, CAST(o_orderdate AS DATE) AS win_lo,
         CAST(o_orderdate AS DATE) + 14 AS win_hi
  FROM orders
  WHERE o_orderpriority = '1-URGENT'
    AND CAST(o_orderdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1995-06-30')
SELECT month(ship_date) AS ship_month,
       COUNT(*) AS n_pairs,
       COUNT(DISTINCT window_id) AS n_windows,
       CAST(SUM(qty) AS BIGINT) AS sum_qty
FROM pts JOIN win ON ship_date BETWEEN win_lo AND win_hi
GROUP BY month(ship_date)
"""


# --------------------------------------------------------------------------
# J1/J8 — multi-dim star join with broadcast
# --------------------------------------------------------------------------


def q_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact→dims equi joins (J1), two-level dim chain (J8): revenue by
    region/nation of the customer. Dims are broadcast."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


ORACLE_STAR_JOIN_REVENUE = """
SELECT r.r_name, n.n_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
"""


# --------------------------------------------------------------------------
# J9 — anti-join (new-keys harvest) / semi-join existence
# --------------------------------------------------------------------------


def q_anti_join_customers_without_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LEFT ANTI join — the lookup-dim 'insert only new BKs' harvest
    (J9) / NOT EXISTS."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


ORACLE_ANTI_JOIN = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


def q_semi_join_discounted_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join — EXISTS: orders having a >5%-discount item."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_discount") > 0.05)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


ORACLE_SEMI_JOIN = """
SELECT o_orderstatus, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05)
GROUP BY o_orderstatus
"""


# --------------------------------------------------------------------------
# U2/U3 — unions
# --------------------------------------------------------------------------


def q_union_dedup_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION-dedup (U3): nations that appear as customer OR supplier
    homes (the service-code UNION harvest shape)."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    n = t(spark, sf_dir, "nation")
    keys = c.unionByName(s).distinct()
    return keys.join(F.broadcast(n), keys.nationkey == n.n_nationkey).select(
        "nationkey", "n_name"
    )


ORACLE_UNION_DEDUP = """
WITH keys AS (
  SELECT c_nationkey AS nationkey FROM customer
  UNION
  SELECT s_nationkey FROM supplier)
SELECT k.nationkey, n.n_name FROM keys k JOIN nation n ON k.nationkey = n.n_nationkey
"""


# --------------------------------------------------------------------------
# W2/O1 — top-k per group and global top-k (deterministic)
# --------------------------------------------------------------------------


def q_topk_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by totalprice per priority (W2 modal-vote shape /
    O1 top-k), deterministic tiebreak on orderkey."""
    o = t(spark, sf_dir, "orders")
    return top_k_per_group(
        o,
        group=["o_orderpriority"],
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=3,
        rank_col="rank_in_priority",
    ).select(
        "o_orderpriority",
        "rank_in_priority",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )


ORACLE_TOPK_PER_PRIORITY = """
SELECT o_orderpriority, rn AS rank_in_priority, o_orderkey,
       ROUND(o_totalprice, 2) AS o_totalprice
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders)
WHERE rn <= 3
"""


# --------------------------------------------------------------------------
# W3 — LAG day-over-day delta (the Q14 shape)
# --------------------------------------------------------------------------


def q_lag_daily_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily demand series with LAG delta vs previous day (W3)."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").cast("string").alias("day")).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("demand"),
    )
    w = Window.orderBy("day")
    return daily.select(
        "day",
        "n_events",
        "demand",
        F.round(F.col("demand") - F.lag("demand").over(w), 2).alias("delta_vs_prev"),
    )


ORACLE_LAG_DAILY_DELTA = """
WITH daily AS (
  SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
         COUNT(*) AS n_events, ROUND(SUM(value), 2) AS demand
  FROM events GROUP BY 1)
SELECT day, n_events, demand,
       ROUND(demand - LAG(demand) OVER (ORDER BY day), 2) AS delta_vs_prev
FROM daily
"""


# --------------------------------------------------------------------------
# W4 — NTILE quartiles (the Q8 shape)
# --------------------------------------------------------------------------


def q_ntile_customer_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(4) over account balance (deterministic order w/ custkey
    tiebreak), aggregated per quartile.

    Scale note: NTILE with a global ORDER BY is inherently a
    single-partition window — kept ONLY as the exact small-input path
    (the reference's Q8 runs it over the ~12k-row stop dimension,
    BASELINE.md, where it is inert). The scalable rewrite is
    ``operators/windows.quantile_buckets`` — see
    ``quantile_buckets_customers`` below, plan-asserted window-free."""
    c = t(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    q = c.withColumn("quartile", F.ntile(4).over(w))
    return q.groupBy("quartile").agg(
        F.count("*").alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
        F.round(F.min("c_acctbal"), 2).alias("min_acctbal"),
        F.round(F.max("c_acctbal"), 2).alias("max_acctbal"),
    )


ORACLE_NTILE_QUARTILES = """
SELECT quartile, COUNT(*) AS n_customers,
       ROUND(SUM(c_acctbal), 2) AS sum_acctbal,
       ROUND(MIN(c_acctbal), 2) AS min_acctbal,
       ROUND(MAX(c_acctbal), 2) AS max_acctbal
FROM (
  SELECT *, NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS quartile
  FROM customer)
GROUP BY quartile
"""


def q_quantile_buckets_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALABLE quartile path (operators/windows.quantile_buckets):
    range-bucket on exact percentile boundaries — no global-order
    window anywhere in the plan (plan-asserted in
    test_plans_diagnostics).

    Bucketing on integer cents keeps the differential gate exact:
    quartile boundaries of integers interpolate at dyadic fractions
    (p·(n-1) has fraction 0, .25, .5 or .75), which both engines
    compute bit-identically, and the aggregates are pure integer
    math."""
    c = t(spark, sf_dir, "customer").withColumn(
        "bal_cents", F.round(F.col("c_acctbal") * F.lit(100.0)).cast("long")
    )
    b = quantile_buckets(c, "bal_cents", n_buckets=4, descending=True, exact=True)
    return b.groupBy("bucket").agg(
        F.count("*").alias("n_customers"),
        F.sum("bal_cents").alias("sum_cents"),
        F.min("bal_cents").alias("min_cents"),
        F.max("bal_cents").alias("max_cents"),
    )


ORACLE_QUANTILE_BUCKETS = """
WITH c AS (
  SELECT CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS bal_cents FROM customer),
b AS (
  SELECT quantile_cont(bal_cents, 0.25) AS q25,
         quantile_cont(bal_cents, 0.50) AS q50,
         quantile_cont(bal_cents, 0.75) AS q75
  FROM c),
x AS (
  SELECT bal_cents,
         CASE WHEN bal_cents >= q75 THEN 1
              WHEN bal_cents >= q50 THEN 2
              WHEN bal_cents >= q25 THEN 3
              ELSE 4 END AS bucket
  FROM c CROSS JOIN b)
SELECT bucket, COUNT(*) AS n_customers,
       CAST(SUM(bal_cents) AS BIGINT) AS sum_cents,
       MIN(bal_cents) AS min_cents, MAX(bal_cents) AS max_cents
FROM x GROUP BY bucket
"""


# --------------------------------------------------------------------------
# A11/W5 — percent-of-total window
# --------------------------------------------------------------------------


def q_pct_of_total_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total over an unbounded window (A11): order revenue
    share per market segment."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    seg = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.sum("o_totalprice").alias("seg_total"))
    )
    return seg.select(
        "c_mktsegment",
        F.round("seg_total", 2).alias("seg_total"),
        pct_of_total(F.col("seg_total"), ndigits=4).alias("pct_of_total"),
    )


ORACLE_PCT_OF_TOTAL = """
WITH seg AS (
  SELECT c.c_mktsegment, SUM(o.o_totalprice) AS seg_total
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment)
SELECT c_mktsegment, ROUND(seg_total, 2) AS seg_total,
       ROUND(100.0 * seg_total / SUM(seg_total) OVER (), 4) AS pct_of_total
FROM seg
"""


# --------------------------------------------------------------------------
# W6 — grouped percentiles (median / p90)
# --------------------------------------------------------------------------


def q_percentile_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENTILE_CONT parity (W6): exact interpolated median and p90
    of order totals per status, as a grouped aggregate."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_total"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_total"),
        F.count("*").alias("n"),
    )


ORACLE_PERCENTILE_BY_STATUS = """
SELECT o_orderstatus,
       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_total,
       ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_total,
       COUNT(*) AS n
FROM orders GROUP BY o_orderstatus
"""


# --------------------------------------------------------------------------
# A4/A7 — distinct counts + HAVING
# --------------------------------------------------------------------------


def q_distinct_buyers_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group + HAVING filter (A4/A7)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_buyers"),
            F.count("*").alias("n_orders"),
        )
        .filter(F.col("n_orders") > 50)
    )


ORACLE_DISTINCT_BUYERS_HAVING = """
SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_buyers, COUNT(*) AS n_orders
FROM orders GROUP BY o_orderstatus HAVING COUNT(*) > 50
"""


# --------------------------------------------------------------------------
# A9 — scalar-subquery fan-out (the /api/query overview shape)
# --------------------------------------------------------------------------


def q_overview_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source scalar overview (A9): independent aggregates over
    three tables joined into one row (each agg is its own tiny job —
    no shuffle interaction)."""
    o = t(spark, sf_dir, "orders").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("orders_total"),
    )
    li = t(spark, sf_dir, "lineitem").agg(F.count("*").alias("n_lineitems"))
    ev = t(spark, sf_dir, "events").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )
    return o.crossJoin(li).crossJoin(ev)


ORACLE_OVERVIEW_SCALARS = """
SELECT (SELECT COUNT(*) FROM orders)                    AS n_orders,
       (SELECT ROUND(SUM(o_totalprice), 2) FROM orders) AS orders_total,
       (SELECT COUNT(*) FROM lineitem)                  AS n_lineitems,
       (SELECT COUNT(*) FROM events)                    AS n_events,
       (SELECT COUNT(DISTINCT user_id) FROM events)     AS n_users
"""


# --------------------------------------------------------------------------
# P7 analog — parameterized serving predicates (demand by day type)
# --------------------------------------------------------------------------


def q_demand_by_day_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The /api/query demand_by_day_type shape on events: derive
    tipo_dia from the weekday, filter to an allowlist, aggregate."""
    ev = t(spark, sf_dir, "events")
    isodow = F.weekday(F.col("ts")) + F.lit(1)  # 1=Mon..7=Sun
    tipo = (
        F.when(isodow <= 5, "LABORAL")
        .when(isodow == 6, "SABADO")
        .otherwise("DOMINGO")
    )
    return (
        ev.withColumn("tipo_dia", tipo)
        .filter(F.col("event_type").isin("click", "view", "purchase"))
        .groupBy("tipo_dia")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("demand"),
        )
    )


ORACLE_DEMAND_BY_DAY_TYPE = """
SELECT CASE WHEN isodow(ts) <= 5 THEN 'LABORAL'
            WHEN isodow(ts) = 6 THEN 'SABADO'
            ELSE 'DOMINGO' END AS tipo_dia,
       COUNT(*) AS n_events, ROUND(SUM(value), 2) AS demand
FROM events
WHERE event_type IN ('click','view','purchase')
GROUP BY 1
"""


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "pricing_summary": q_pricing_summary,
    "typed_projection": q_typed_projection,
    "quality_split_valid": q_quality_split_valid,
    "quality_split_invalid": q_quality_split_invalid,
    "measure_unpivot": q_measure_unpivot,
    "dedup_keep_latest": q_dedup_keep_latest,
    "scd2_timeline": q_scd2_timeline,
    "asof_resolve": q_asof_resolve,
    "asof_merge_resolve": q_asof_merge_resolve,
    "range_join_shipments": q_range_join_shipments,
    "star_join_revenue": q_star_join_revenue,
    "anti_join_customers_without_orders": q_anti_join_customers_without_orders,
    "semi_join_discounted_orders": q_semi_join_discounted_orders,
    "union_dedup_nations": q_union_dedup_nations,
    "topk_orders_per_priority": q_topk_orders_per_priority,
    "lag_daily_delta": q_lag_daily_delta,
    "ntile_customer_quartiles": q_ntile_customer_quartiles,
    "quantile_buckets_customers": q_quantile_buckets_customers,
    "pct_of_total_by_segment": q_pct_of_total_by_segment,
    "percentile_by_status": q_percentile_by_status,
    "distinct_buyers_having": q_distinct_buyers_having,
    "overview_scalars": q_overview_scalars,
    "demand_by_day_type": q_demand_by_day_type,
}

ORACLE: dict[str, str] = {
    "pricing_summary": ORACLE_PRICING_SUMMARY,
    "typed_projection": ORACLE_TYPED_PROJECTION,
    "quality_split_valid": ORACLE_QUALITY_SPLIT_VALID,
    "quality_split_invalid": ORACLE_QUALITY_SPLIT_INVALID,
    "measure_unpivot": ORACLE_MEASURE_UNPIVOT,
    "dedup_keep_latest": ORACLE_DEDUP_KEEP_LATEST,
    "scd2_timeline": ORACLE_SCD2_TIMELINE,
    "asof_resolve": ORACLE_ASOF_RESOLVE,
    "asof_merge_resolve": ORACLE_ASOF_RESOLVE,
    "range_join_shipments": ORACLE_RANGE_JOIN_SHIPMENTS,
    "star_join_revenue": ORACLE_STAR_JOIN_REVENUE,
    "anti_join_customers_without_orders": ORACLE_ANTI_JOIN,
    "semi_join_discounted_orders": ORACLE_SEMI_JOIN,
    "union_dedup_nations": ORACLE_UNION_DEDUP,
    "topk_orders_per_priority": ORACLE_TOPK_PER_PRIORITY,
    "lag_daily_delta": ORACLE_LAG_DAILY_DELTA,
    "ntile_customer_quartiles": ORACLE_NTILE_QUARTILES,
    "quantile_buckets_customers": ORACLE_QUANTILE_BUCKETS,
    "pct_of_total_by_segment": ORACLE_PCT_OF_TOTAL,
    "percentile_by_status": ORACLE_PERCENTILE_BY_STATUS,
    "distinct_buyers_having": ORACLE_DISTINCT_BUYERS_HAVING,
    "overview_scalars": ORACLE_OVERVIEW_SCALARS,
    "demand_by_day_type": ORACLE_DEMAND_BY_DAY_TYPE,
}
