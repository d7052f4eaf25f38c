"""Gold dimensions.

Static: dim_time_30m (48 rows, load_gold.py:486-502), dim_mode (5 rows,
:504-523), dim_date (range generator with Spanish names, :525-595).
Lookup (anti-join append, J9): dim_fare_period, dim_purpose,
dim_operator_contract (:822-878). Metadata: dim_cut from quality.json
(:777-818). SCD2 (set-based rebuild): dim_stop, dim_service
(:295-439, 882-1019).

Surrogate keys are deterministic (xxhash64 of the BK, plus valid_from
for SCD2 versions) instead of IDENTITY columns — idempotent loads,
no cross-partition key coordination at scale. Documented deviation.
"""

from __future__ import annotations

from datetime import date
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import row_hash
from .store import GoldStore


def sk_of(*cols: Column | str) -> Column:
    """Deterministic surrogate key."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.xxhash64(*cs)


# ── static dims ─────────────────────────────────────────────────────


def build_dim_time_30m(spark: SparkSession) -> DataFrame:
    """48 half-hour slots with start/end/label (load_gold.py:486-502)."""
    sk = F.col("time_30m_sk")
    h = (sk / 2).cast("int")
    m = F.when(sk % 2 == 1, 30).otherwise(0)
    end_h = ((sk + 1) / 2).cast("int") % 24
    end_m = F.when((sk + 1) % 2 == 1, 30).otherwise(0)
    return (
        spark.range(48)
        .select(F.col("id").cast("int").alias("time_30m_sk"))
        .select(
            "time_30m_sk",
            F.format_string("%02d:%02d:00", h, m).alias("start_time"),
            F.format_string("%02d:%02d:00", end_h, end_m).alias("end_time"),
            h.alias("hour"),
            m.cast("int").alias("minute"),
            F.format_string("%02d:%02d", h, m).alias("label"),
        )
    )


MODE_ROWS = [
    (1, "BUS", "Bus RED"),
    (2, "METRO", "Metro de Santiago"),
    (3, "METROTREN", "Metrotren"),
    (4, "ZP", "Zona Paga / Estación"),
    (5, "UNKNOWN", "Modo desconocido"),
]


def build_dim_mode(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        MODE_ROWS, "mode_sk int, mode_code string, mode_desc string"
    )


_ES_DAYS = ["Lunes", "Martes", "Miércoles", "Jueves", "Viernes", "Sábado", "Domingo"]
_ES_MONTHS = [
    "Enero", "Febrero", "Marzo", "Abril", "Mayo", "Junio",
    "Julio", "Agosto", "Septiembre", "Octubre", "Noviembre", "Diciembre",
]  # fmt: skip


def build_dim_date(spark: SparkSession, min_sk: int, max_sk: int) -> DataFrame:
    """Calendar rows for the full years covering [min_sk, max_sk]
    (load_gold.py:525-595): Spanish day/month names, tipo_dia from the
    weekday, generated distributively with sequence+explode."""
    y0, y1 = min_sk // 10000, max_sk // 10000
    days = spark.sql(
        f"SELECT explode(sequence(DATE'{y0}-01-01', DATE'{y1}-12-31')) AS full_date"
    )
    dow = F.weekday("full_date")  # 0=Mon .. 6=Sun
    day_names = F.array(*[F.lit(d) for d in _ES_DAYS])
    month_names = F.array(*[F.lit(m) for m in _ES_MONTHS])
    return days.select(
        (
            F.year("full_date") * 10000
            + F.month("full_date") * 100
            + F.dayofmonth("full_date")
        ).alias("date_sk"),
        F.col("full_date"),
        F.year("full_date").alias("year"),
        F.month("full_date").alias("month"),
        F.dayofmonth("full_date").alias("day"),
        F.weekofyear("full_date").alias("iso_week"),
        F.element_at(day_names, dow + 1).alias("day_of_week"),
        F.element_at(month_names, F.month("full_date")).alias("month_name"),
        (dow >= 5).cast("int").alias("is_weekend"),
        F.date_format("full_date", "yyyy-MM").alias("year_month"),
        F.when(dow == 6, "DOMINGO")
        .when(dow == 5, "SABADO")
        .otherwise("LABORAL")
        .alias("tipo_dia"),
    )


def ensure_dim_date(store: GoldStore, date_sks: list[int]) -> None:
    """Extend dim_date to cover observed SKs (full-year expansion +
    only-new-rows append, load_gold.py:525-595)."""
    valid = [int(s) for s in date_sks if s and s > 19000101]
    if not valid:
        return
    df = build_dim_date(store.spark, min(valid), max(valid))
    store.merge_insert(df, "dim_date", ["date_sk"])


def ensure_static_dims(store: GoldStore) -> None:
    if not store.exists("dim_time_30m"):
        store.overwrite(build_dim_time_30m(store.spark), "dim_time_30m")
    if not store.exists("dim_mode"):
        store.overwrite(build_dim_mode(store.spark), "dim_mode")


# ── lookup dims (anti-join append, J9) ──────────────────────────────


def upsert_lookup_dim(
    store: GoldStore,
    table: str,
    bk_col: str,
    values: DataFrame,
    extra_cols: list[str] | None = None,
) -> int:
    """Insert-only upsert of new BKs (load_gold.py:846-878;
    sql_helpers.py:350-391). ``values``: DataFrame with bk_col (+extras),
    deduped here; SK = xxhash64(bk)."""
    cand = (
        values.filter(F.col(bk_col).isNotNull() & (F.trim(F.col(bk_col)) != ""))
        .withColumn(bk_col, F.trim(F.col(bk_col)))
        .dropDuplicates([bk_col])
        .withColumn(f"{table.removeprefix('dim_')}_sk", sk_of(bk_col))
    )
    cols = [f"{table.removeprefix('dim_')}_sk", bk_col] + (extra_cols or [])
    return store.merge_insert(cand.select(*cols), table, [bk_col])


# ── dim_cut ─────────────────────────────────────────────────────────


def upsert_dim_cut(store: GoldStore, quality: dict[str, Any]) -> int:
    """Batch/partition metadata dim fed from quality.json
    (load_gold.py:777-818; ddl_gold.sql:326-345)."""
    row = {
        "dataset_name": quality["dataset"],
        "cut_id": str(quality["cut"]),
        "year": int(quality["year"]),
        "month": int(quality["month"]),
        "read_row_count": quality.get("read_row_count"),
        "valid_row_count": quality.get("valid_row_count"),
        "invalid_row_count": quality.get("invalid_row_count"),
        "quarantine_rate_pct": float(quality.get("quarantine_rate_pct") or 0.0),
    }
    df = store.spark.createDataFrame(
        [row],
        "dataset_name string, cut_id string, year int, month int, "
        "read_row_count long, valid_row_count long, invalid_row_count long, "
        "quarantine_rate_pct double",
    ).withColumn("cut_sk", sk_of("dataset_name", "cut_id"))
    return store.merge_insert(df, "dim_cut", ["dataset_name", "cut_id"])


def get_cut_sk(store: GoldStore, dataset: str, cut: str) -> int | None:
    if not store.exists("dim_cut"):
        return None
    rows = (
        store.read("dim_cut")
        .filter((F.col("dataset_name") == dataset) & (F.col("cut_id") == cut))
        .select("cut_sk")
        .collect()
    )
    return rows[0]["cut_sk"] if rows else None


# ── SCD2 (set-based) ────────────────────────────────────────────────


def scd2_upsert(
    store: GoldStore,
    table: str,
    bk_col: str,
    attr_cols: list[str],
    candidates: DataFrame,
    event_date: date,
    sk_col: str,
) -> dict[str, int]:
    """Set-based SCD2 upsert — same decision table as the reference's
    row-wise loop (load_gold.py:295-439), via joins:

    - new BK                      → INSERT (valid_from=event, open)
    - same BK, same hash          → unchanged
    - changed, event >  valid_from → expire current (event−1) + INSERT
    - changed, event == valid_from → in-place attr update (same-day
      enrichment, :386-407), counted as unchanged
    - changed, event <  valid_from → skip with no change (:377-384)

    Dims are small: the new dim state is rebuilt as one DataFrame and
    atomically swapped. Version SK = xxhash64(bk, valid_from) — stable
    across rebuilds, unchanged by same-day enrichment.
    """
    cand = (
        candidates.filter(F.col(bk_col).isNotNull() & (F.trim(F.col(bk_col)) != ""))
        .withColumn(bk_col, F.trim(F.col(bk_col)))
        .groupBy(bk_col)
        # MAX consolidation: the reference's groupby-'first' is
        # row-order-arbitrary; MAX is deterministic and also skips NULLs
        .agg(*[F.max(a).alias(a) for a in attr_cols])
        .withColumn("_new_hash", row_hash(*attr_cols))
    )

    if not store.exists(table):
        new_dim = cand.select(
            sk_of(bk_col, F.lit(str(event_date))).alias(sk_col),
            F.col(bk_col),
            *attr_cols,
            F.col("_new_hash").alias("row_hash"),
            F.lit(str(event_date)).cast("date").alias("valid_from"),
            F.lit(None).cast("date").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
        new_dim = new_dim.cache()
        n = new_dim.count()
        store.overwrite(new_dim, table)
        new_dim.unpersist()
        return {"inserted": n, "expired": 0, "unchanged": 0}

    dim = store.read(table).cache()
    # round-12: cand (the consolidated candidate aggregate) feeds the
    # kept branch, the inserts branch and the counts — uncached it
    # re-ran its groupBy once per consumer inside the overwrite job
    cand = cand.cache()
    try:
        history = dim.filter(~F.col("is_current"))
        current = dim.filter(F.col("is_current"))
        ev = F.lit(str(event_date)).cast("date")

        j = current.alias("c").join(
            cand.alias("n"), F.col(f"c.{bk_col}") == F.col(f"n.{bk_col}"), "full"
        )
        is_new = F.col(f"c.{bk_col}").isNull()
        no_cand = F.col(f"n.{bk_col}").isNull()
        same = F.col("c.row_hash") == F.col("n._new_hash")
        stale = ev < F.col("c.valid_from")
        same_day = ev == F.col("c.valid_from")

        def cur(c: str) -> Column:
            return F.col(f"c.{c}")

        def new(c: str) -> Column:
            return F.col(f"n.{c}")

        # round-12 (guide §1.2): the decision counts ride the rebuild
        # write as ``observe`` metrics on each branch — previously a
        # separate aggregate job re-ran the full-outer join just to
        # count categories.  Same predicates, same values; the write
        # executes each branch exactly once (plain union + parquet
        # write, no resampling shuffle, so no double-count hazard).
        from pyspark.sql import Observation

        obs_kept = Observation()
        obs_ins = Observation()
        kept_src = j.filter(~is_new).observe(
            obs_kept,
            F.sum(
                F.when(~no_cand & ~same & ~stale & ~same_day, 1).otherwise(0)
            ).alias("expired"),
            F.sum(
                F.when(~no_cand & (same | stale | same_day), 1).otherwise(0)
            ).alias("unchanged"),
        )
        # surviving current-generation rows (possibly expired / enriched)
        kept = kept_src.select(
            cur(sk_col).alias(sk_col),
            cur(bk_col).alias(bk_col),
            *[
                F.when(no_cand | same | stale, cur(a))
                .when(same_day, new(a))  # same-day in-place enrichment
                .otherwise(cur(a))  # expired row keeps old attrs
                .alias(a)
                for a in attr_cols
            ],
            F.when(no_cand | same | stale, cur("row_hash"))
            .when(same_day, new("_new_hash"))
            .otherwise(cur("row_hash"))
            .alias("row_hash"),
            cur("valid_from").alias("valid_from"),
            F.when(
                no_cand | same | stale | same_day, cur("valid_to")
            )  # unchanged stays open
            .otherwise(F.date_sub(ev, 1))  # expire
            .alias("valid_to"),
            F.when(no_cand | same | stale | same_day, cur("is_current"))
            .otherwise(F.lit(False))
            .alias("is_current"),
        )

        inserts = j.filter(
            is_new | (~no_cand & ~same & ~stale & ~same_day)
        ).observe(obs_ins, F.count(F.lit(1)).alias("inserted")).select(
            sk_of(new(bk_col), F.lit(str(event_date))).alias(sk_col),
            new(bk_col).alias(bk_col),
            *[new(a).alias(a) for a in attr_cols],
            new("_new_hash").alias("row_hash"),
            ev.alias("valid_from"),
            F.lit(None).cast("date").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )

        new_dim = history.unionByName(kept).unionByName(inserts)
        store.overwrite(new_dim, table)
        km = obs_kept.get
        return {
            "inserted": int(obs_ins.get["inserted"] or 0),
            "expired": int(km["expired"] or 0),
            "unchanged": int(km["unchanged"] or 0),
        }
    finally:
        dim.unpersist()
        cand.unpersist()


# ── SCD2 harvest queries ────────────────────────────────────────────

STOP_ATTRS = ["stop_name", "stop_type", "comuna", "zone_code", "x_utm", "y_utm"]
SERVICE_ATTRS = ["service_name", "mode_code"]


def harvest_stops(dataset: str, silver: dict[str, DataFrame]) -> DataFrame | None:
    """DISTINCT stop attribute snapshots per dataset
    (load_gold.py:882-971): viajes legs contribute zone only; etapas
    contribute comuna+zone+coords; subidas contribute comuna."""
    null_s = F.lit(None).cast("string")
    null_i = F.lit(None).cast("int")
    if dataset == "viajes":
        legs = silver["legs"]
        parts = [
            legs.filter(F.col(c).isNotNull()).select(
                F.col(c).alias("stop_code"),
                null_s.alias("stop_name"),
                null_s.alias("stop_type"),
                null_s.alias("comuna"),
                F.col(z).cast("string").alias("zone_code"),
                null_i.alias("x_utm"),
                null_i.alias("y_utm"),
            )
            for c, z in [
                ("board_stop_code", "zone_board"),
                ("alight_stop_code", "zone_alight"),
            ]
        ]
    elif dataset == "etapas":
        ev = silver["valid"]
        parts = [
            ev.filter(F.col(sc).isNotNull()).select(
                F.col(sc).alias("stop_code"),
                null_s.alias("stop_name"),
                null_s.alias("stop_type"),
                F.col(cc).alias("comuna"),
                F.col(zc).cast("string").alias("zone_code"),
                F.col(xc).alias("x_utm"),
                F.col(yc).alias("y_utm"),
            )
            for sc, cc, zc, xc, yc in [
                ("parada_subida", "comuna_subida", "zona_subida", "x_subida", "y_subida"),
                ("parada_bajada", "comuna_bajada", "zona_bajada", "x_bajada", "y_bajada"),
            ]
        ]
    elif dataset == "subidas_30m":
        sv = silver["valid"]
        parts = [
            sv.filter(F.col("stop_code").isNotNull())
            .groupBy("stop_code")
            .agg(F.max("comuna").alias("comuna"))
            .select(
                "stop_code",
                null_s.alias("stop_name"),
                null_s.alias("stop_type"),
                "comuna",
                null_s.alias("zone_code"),
                null_i.alias("x_utm"),
                null_i.alias("y_utm"),
            )
        ]
    else:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.dropDuplicates()


def harvest_services(dataset: str, silver: dict[str, DataFrame]) -> DataFrame | None:
    """DISTINCT (service_code, mode_code) snapshots
    (load_gold.py:973-1018); subidas has no services."""
    if dataset == "viajes":
        legs = silver["legs"]
        out = legs.filter(F.col("service_code").isNotNull()).select(
            "service_code", "mode_code"
        )
    elif dataset == "etapas":
        ev = silver["valid"]
        out = (
            ev.filter(F.col("servicio_subida").isNotNull())
            .select(
                F.col("servicio_subida").alias("service_code"),
                F.col("tipo_transporte").alias("mode_code"),
            )
            .unionByName(
                ev.filter(F.col("servicio_bajada").isNotNull()).select(
                    F.col("servicio_bajada").alias("service_code"),
                    F.col("tipo_transporte").alias("mode_code"),
                )
            )
            .distinct()
        )
    else:
        return None
    return out.withColumn("service_name", F.lit(None).cast("string")).select(
        "service_code", "service_name", "mode_code"
    )
