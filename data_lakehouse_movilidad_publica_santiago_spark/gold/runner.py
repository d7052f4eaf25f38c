"""Gold loader: one silver partition → the DW constellation.

Orchestration parity with the reference's GoldLoader.run
(load_gold.py:1741-1866): run-log start + skip-if-already-OK, dim_cut
from quality.json, static dims, dim_date range, lookup dims, SCD2
dims (event_date = cut date, :1788-1792), fact merges, run-log finish.
Staging is gone — the silver parquet IS the staging (SURVEY §3.2).
"""

from __future__ import annotations

import json
import time
import uuid
from datetime import date, datetime, timezone
from pathlib import Path
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import CutPartition
from . import dims as D
from . import facts as FX
from .store import GoldStore

LOADER_VERSION = "spark-gold-1.0"


def _parallel(*thunks):
    """Run independent loader steps as concurrent Spark jobs (guide
    §2.6: actions are only sequential because driver code calls them
    sequentially — overlapping lets the next job's tasks back-fill
    executors idled by the current job's tail).  Used ONLY for steps
    that touch DISJOINT gold tables, so results are identical to the
    sequential order; exceptions propagate like sequential calls.

    Partial-failure footprint (ADVICE r12): all thunks are submitted
    before the first result is awaited, and a failing thunk does NOT
    cancel its siblings — a concurrent sibling may finish committing
    its (disjoint) table before the exception propagates, and its
    counts are then absent from the caller's result.  That is safe
    here because every step is idempotent (merge_insert / overwrite)
    and the run-log marks the CUT failed, so the re-run redoes every
    table of the cut identically: the group is all-or-nothing at the
    re-run level, not at the thread level."""
    if len(thunks) == 1:
        return [thunks[0]()]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(thunks)) as ex:
        futures = [ex.submit(t) for t in thunks]
        return [f.result() for f in futures]


class GoldLoader:
    def __init__(
        self,
        spark: SparkSession,
        gold_root: Path,
        store: GoldStore | None = None,
    ) -> None:
        """``store`` defaults to the plain-parquet GoldStore; pass
        ``txn_store.TxnGoldStore(spark, gold_root)`` to run the same
        pipeline on the transactional table format (ACID commits, file
        skipping, time travel) — parity pinned by
        tests/test_txn_gold_parity.py."""
        self.spark = spark
        self.store = store if store is not None else GoldStore(spark, gold_root)

    # ── etl_run_log ────────────────────────────────────────────────

    def _log_run(self, row: dict[str, Any]) -> None:
        df = self.spark.createDataFrame(
            [row],
            "run_id string, dataset string, cut string, status string, "
            "started_at string, finished_at string, rows_staged long, "
            "rows_inserted long, ignored_cash_rows long, error_message string, "
            "loader_version string",
        )
        self.store.append(df, "etl_run_log")

    def _is_already_ok(self, dataset: str, cut: str) -> bool:
        """Skip-if-OK idempotency gate (load_gold.py:1775-1785)."""
        if not self.store.exists("etl_run_log"):
            return False
        rows = (
            self.store.read("etl_run_log")
            .filter((F.col("dataset") == dataset) & (F.col("cut") == cut))
            .orderBy(F.desc("started_at"))
            .select("status")
            .limit(1)
            .collect()
        )
        return bool(rows) and rows[0]["status"] == "OK"

    # ── silver inputs ──────────────────────────────────────────────

    def _silver(self, partition: CutPartition, lake_root: Path) -> dict[str, DataFrame]:
        sdir = partition.silver_dir(lake_root)
        if partition.dataset == "viajes":
            return {
                "trips": self.spark.read.parquet(str(sdir / "viajes_trip.parquet")),
                "legs": self.spark.read.parquet(str(sdir / "viajes_leg.parquet")),
            }
        if partition.dataset == "etapas":
            return {
                "valid": self.spark.read.parquet(
                    str(sdir / "etapas_validation.parquet")
                )
            }
        return {
            "valid": self.spark.read.parquet(str(sdir / "subidas_30m.parquet"))
        }

    def _quality(self, partition: CutPartition, lake_root: Path) -> dict[str, Any]:
        qp = partition.quality_dir(lake_root) / "quality.json"
        if qp.exists():
            return json.loads(qp.read_text(encoding="utf-8"))
        return {
            "dataset": partition.dataset,
            "cut": partition.cut,
            "year": partition.year,
            "month": partition.month,
        }

    # ── dim plumbing per dataset ───────────────────────────────────

    def _upsert_lookup_dims(self, dataset: str, silver: dict[str, DataFrame]) -> None:
        """dim_fare_period / dim_purpose / dim_operator_contract
        harvests (load_gold.py:822-878)."""
        store = self.store
        null_s = F.lit(None).cast("string")
        if dataset == "viajes":
            trips = silver["trips"]
            fare = trips.select(
                F.col("periodo_inicio_viaje").alias("fare_period_name")
            ).unionByName(
                trips.select(F.col("periodo_fin_viaje").alias("fare_period_name"))
            )
            # three DISJOINT lookup tables — overlap the upsert jobs
            _parallel(
                lambda: D.upsert_lookup_dim(
                    store, "dim_fare_period", "fare_period_name", fare
                ),
                lambda: D.upsert_lookup_dim(
                    store,
                    "dim_purpose",
                    "purpose_name",
                    trips.select(F.col("proposito").alias("purpose_name")),
                ),
                lambda: D.upsert_lookup_dim(
                    store,
                    "dim_operator_contract",
                    "contract_code",
                    trips.select(
                        F.col("contrato").alias("contract_code")
                    ).withColumn("operator_code", null_s),
                    extra_cols=["operator_code"],
                ),
            )
        elif dataset == "etapas":
            ev = silver["valid"]
            fare = ev.select(
                F.col("periodoSubida").alias("fare_period_name")
            ).unionByName(ev.select(F.col("periodoBajada").alias("fare_period_name")))
            # BK = COALESCE(contrato, operador) (load_gold.py:866-878)
            ops = ev.select(
                F.coalesce(F.col("contrato"), F.col("operador")).alias(
                    "contract_code"
                ),
                F.col("operador").alias("operator_code"),
            )
            _parallel(
                lambda: D.upsert_lookup_dim(
                    store, "dim_fare_period", "fare_period_name", fare
                ),
                lambda: D.upsert_lookup_dim(
                    store,
                    "dim_operator_contract",
                    "contract_code",
                    ops,
                    extra_cols=["operator_code"],
                ),
            )

    def _collect_date_sks(self, dataset: str, silver: dict[str, DataFrame]) -> list[int]:
        """MIN/MAX date SKs from the staged data (load_gold.py:1603-1630);
        one aggregate job per table, all columns fused."""
        per_table: dict[str, list[str]] = {}
        if dataset == "viajes":
            per_table = {
                "trips": ["date_start_sk", "date_end_sk"],
                "legs": ["date_board_sk", "date_alight_sk"],
            }
        elif dataset == "etapas":
            per_table = {"valid": ["date_board_sk", "date_alight_sk"]}
        sks: list[int] = []
        for key, cols in per_table.items():
            aggs = []
            for c in cols:
                aggs += [F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}")]
            row = silver[key].agg(*aggs).collect()[0]
            for c in cols:
                if row[f"lo_{c}"] is not None:
                    sks += [int(row[f"lo_{c}"]), int(row[f"hi_{c}"])]
        return sks

    # ── main entry ─────────────────────────────────────────────────

    def run(
        self,
        partition: CutPartition,
        lake_root: Path,
        force: bool = False,
    ) -> dict[str, Any]:
        dataset, cut = partition.dataset, partition.cut
        if not force and self._is_already_ok(dataset, cut):
            return {"status": "SKIPPED", "dataset": dataset, "cut": cut}

        run_id = uuid.uuid4().hex
        started = datetime.now(tz=timezone.utc).isoformat()
        t0 = time.monotonic()
        # cache the silver inputs: dim harvests, date ranges, and fact
        # merges each re-scan them otherwise (4-6 scans per table)
        silver = {
            k: df.cache() for k, df in self._silver(partition, lake_root).items()
        }
        result: dict[str, Any] = {"dataset": dataset, "cut": cut}
        try:
            # event_date for SCD2 = cut date (load_gold.py:1788-1792)
            try:
                event_date = date.fromisoformat(cut[:10])
            except ValueError:
                event_date = date(partition.year, partition.month, 1)

            D.ensure_static_dims(self.store)
            D.upsert_dim_cut(self.store, self._quality(partition, lake_root))
            cut_sk = D.get_cut_sk(self.store, dataset, cut)
            assert cut_sk is not None

            # dim_date and the lookup dims touch disjoint tables —
            # overlap them (guide §2.6); same for the two SCD2 dims
            _parallel(
                lambda: D.ensure_dim_date(
                    self.store, self._collect_date_sks(dataset, silver)
                ),
                lambda: self._upsert_lookup_dims(dataset, silver),
            )

            stops = D.harvest_stops(dataset, silver)
            services = D.harvest_services(dataset, silver)
            scd2_thunks = []
            if stops is not None:
                scd2_thunks.append(
                    ("scd2_stop", lambda: D.scd2_upsert(
                        self.store, "dim_stop", "stop_code", D.STOP_ATTRS,
                        stops, event_date, "stop_sk",
                    ))  # fmt: skip
                )
            if services is not None:
                scd2_thunks.append(
                    ("scd2_service", lambda: D.scd2_upsert(
                        self.store, "dim_service", "service_code",
                        D.SERVICE_ATTRS, services, event_date, "service_sk",
                    ))  # fmt: skip
                )
            if scd2_thunks:
                outs = _parallel(*[t for _, t in scd2_thunks])
                for (key, _), out in zip(scd2_thunks, outs):
                    result[key] = out

            rows_staged = 0
            rows_inserted = 0
            cash_excluded = 0
            if dataset == "viajes":
                rows_staged = silver["trips"].count() + silver["legs"].count()
                # fct_trip and fct_trip_leg are disjoint tables whose
                # FK is the deterministic trip_sk hash (no join-back)
                # — overlap the two merges (guide §2.6)
                (n_t, cash_t), (n_l, cash_l) = _parallel(
                    lambda: FX.merge_fct_trip(
                        self.store, silver["trips"], cut_sk
                    ),
                    lambda: FX.merge_fct_trip_leg(
                        self.store, silver["legs"], cut_sk
                    ),
                )
                rows_inserted = n_t + n_l
                cash_excluded = cash_t + cash_l
                result["fct_trip"] = n_t
                result["fct_trip_leg"] = n_l
            elif dataset == "etapas":
                rows_staged = silver["valid"].count()
                rows_inserted = FX.merge_fct_validation(
                    self.store, silver["valid"], cut_sk
                )
                result["fct_validation"] = rows_inserted
            else:
                rows_staged = silver["valid"].count()
                rows_inserted = FX.merge_fct_boardings_30m(
                    self.store, silver["valid"], cut_sk,
                    partition.year, partition.month,
                )  # fmt: skip
                result["fct_boardings_30m"] = rows_inserted

            self._log_run(
                {
                    "run_id": run_id,
                    "dataset": dataset,
                    "cut": cut,
                    "status": "OK",
                    "started_at": started,
                    "finished_at": datetime.now(tz=timezone.utc).isoformat(),
                    "rows_staged": rows_staged,
                    "rows_inserted": rows_inserted,
                    "ignored_cash_rows": cash_excluded,
                    "error_message": None,
                    "loader_version": LOADER_VERSION,
                }
            )
            result.update(
                status="OK",
                rows_staged=rows_staged,
                rows_inserted=rows_inserted,
                ignored_cash_rows=cash_excluded,
                elapsed_sec=round(time.monotonic() - t0, 1),
            )
            return result
        except Exception as exc:
            self._log_run(
                {
                    "run_id": run_id,
                    "dataset": dataset,
                    "cut": cut,
                    "status": "FAILED",
                    "started_at": started,
                    "finished_at": datetime.now(tz=timezone.utc).isoformat(),
                    "rows_staged": 0,
                    "rows_inserted": 0,
                    "ignored_cash_rows": 0,
                    "error_message": str(exc)[:2000],
                    "loader_version": LOADER_VERSION,
                }
            )
            raise
        finally:
            for df in silver.values():
                df.unpersist()
