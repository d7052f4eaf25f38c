"""Load diagnostics — the reference's SQLite load report re-expressed
(src/sqlite/load_sqlite.py:1162-1277): per-fact duplicate detection on
the declared grain (top-20 offending keys), per-dimension SK miss
rates, quarantine top reasons — emitted as a dict + json/markdown.

Each check is one aggregate job; nothing is collected except the
top-k summaries.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

from pyspark.sql import functions as F

from ..operators.profile import profile_columns
from ..operators.sketches import distinct_sketches, rollup_distinct
from .store import GoldStore

FACT_GRAINS: dict[str, list[str]] = {
    "fct_trip": ["cut_sk", "id_tarjeta", "id_viaje"],
    "fct_trip_leg": ["cut_sk", "id_tarjeta", "id_viaje", "leg_seq"],
    "fct_validation": ["id_etapa", "tiempo_boarding", "cut_sk"],
    "fct_boardings_30m": [
        "month_date_sk", "time_30m_sk", "stop_sk", "mode_sk", "tipo_dia", "cut_sk",
    ],
}  # fmt: skip

# fact column → dim it should resolve against (miss = NULL SK where the
# natural key was present is not distinguishable post-load, so we
# report raw NULL-SK rates like the reference's miss report)
FACT_SK_COLS: dict[str, list[str]] = {
    "fct_trip": [
        "origin_stop_sk", "dest_stop_sk", "fare_period_start_sk",
        "fare_period_end_sk", "operator_sk", "purpose_sk",
    ],
    "fct_trip_leg": [
        "board_stop_sk", "alight_stop_sk", "mode_sk", "service_sk",
        "operator_sk", "fare_period_alight_sk",
    ],
    "fct_validation": [
        "board_stop_sk", "alight_stop_sk", "mode_sk", "service_board_sk",
        "service_alight_sk", "operator_sk", "fare_period_board_sk",
        "fare_period_alight_sk",
    ],
    "fct_boardings_30m": ["stop_sk", "mode_sk"],
}  # fmt: skip


def grain_duplicates(store: GoldStore, fact: str, top_k: int = 20) -> dict[str, Any]:
    """Duplicate keys on the declared grain (should be none — the
    MERGE enforces it; this is the audit that proves it)."""
    grain = FACT_GRAINS[fact]
    df = store.read(fact)
    dups = (
        df.groupBy(*grain)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .orderBy(F.desc("n"), *grain)
    )
    top = [r.asDict() for r in dups.limit(top_k).collect()]
    return {
        "fact": fact,
        "grain": grain,
        "duplicate_keys": len(top),
        "top_duplicates": top,
    }


def sk_miss_rates(store: GoldStore, fact: str) -> dict[str, Any]:
    """NULL-SK rate per dimension FK column in one aggregate pass."""
    cols = FACT_SK_COLS[fact]
    df = store.read(fact)
    aggs = [F.count("*").alias("_n")] + [
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(c) for c in cols
    ]
    row = df.agg(*aggs).collect()[0]
    n = row["_n"] or 0
    return {
        "fact": fact,
        "rows": n,
        "miss_rates_pct": {
            c: round(100.0 * (row[c] or 0) / n, 4) if n else 0.0 for c in cols
        },
    }


def quarantine_top_reasons(
    spark, lake_root: Path, dataset: str, top_k: int = 10
) -> dict[str, Any]:
    """Top quarantine reasons across all cuts of a dataset."""
    glob = str(
        Path(lake_root)
        / "processed"
        / "_quarantine"
        / f"dataset={dataset}"
        / "year=*"
        / "month=*"
        / "cut=*"
        / "invalid.parquet"
    )
    try:
        inv = spark.read.parquet(glob)
    except Exception:
        return {"dataset": dataset, "reasons": []}
    rows = (
        inv.groupBy("reason_code")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "reason_code")
        .limit(top_k)
        .collect()
    )
    return {
        "dataset": dataset,
        "reasons": [{"reason_code": r["reason_code"], "n": r["n"]} for r in rows],
    }


# representative high-cardinality column per fact for the ANALYZE
# layer: per-cut HLL sketches (the persistable pre-aggregate) merged
# to a whole-table estimate — at 100 TB the merge replaces a rescan
FACT_DISTINCT_COLS: dict[str, str] = {
    "fct_trip": "id_tarjeta",
    "fct_trip_leg": "id_tarjeta",
    "fct_validation": "id_etapa",
    "fct_boardings_30m": "stop_sk",
}


def fact_cardinalities(store: GoldStore, fact: str) -> dict[str, Any]:
    """Distinct-cardinality estimate of the fact's representative
    column via mergeable HLL sketches: one sketch per cut_sk, unioned
    up to the table total. Incremental loads can merge yesterday's
    stored sketches instead of rescanning history."""
    col = FACT_DISTINCT_COLS[fact]
    per_cut = distinct_sketches(store.read(fact), ["cut_sk"], col)
    rows = rollup_distinct(per_cut, []).collect()
    est = int(rows[0]["n_distinct_est"]) if rows else 0
    return {"fact": fact, "column": col, "distinct_est": est}


def dim_profiles(
    store: GoldStore, dims: dict[str, list[str]] | None = None
) -> dict[str, Any]:
    """One-pass column profiles (nulls / distincts / min / max) over
    the small dims — the exact-profile half of the ANALYZE layer."""
    dims = dims or {
        "dim_stop": ["stop_code", "comuna"],
        "dim_service": ["service_code"],
    }
    out: dict[str, Any] = {}
    for dim, cols in dims.items():
        if not store.exists(dim):
            continue
        out[dim] = [
            r.asDict() for r in profile_columns(store.read(dim), cols).collect()
        ]
    return out


def build_load_report(
    store: GoldStore, lake_root: Path
) -> dict[str, Any]:
    """Full report over whatever facts exist."""
    report: dict[str, Any] = {"facts": {}, "quarantine": {}}
    for fact in FACT_GRAINS:
        if store.exists(fact):
            report["facts"][fact] = {
                "grain_duplicates": grain_duplicates(store, fact),
                "sk_miss_rates": sk_miss_rates(store, fact),
                "cardinality": fact_cardinalities(store, fact),
            }
    report["dim_profiles"] = dim_profiles(store)
    for dataset in ("viajes", "etapas", "subidas_30m"):
        report["quarantine"][dataset] = quarantine_top_reasons(
            store.spark, lake_root, dataset
        )
    if store.exists("etl_run_log"):
        log = store.read("etl_run_log")
        report["runs"] = {
            "total": log.count(),
            "ok": log.filter("status = 'OK'").count(),
            "failed": log.filter("status = 'FAILED'").count(),
        }
    return report


def write_load_report(report: dict[str, Any], out_dir: Path) -> tuple[Path, Path]:
    """json + human-readable markdown (load_sqlite.py:1222-1277)."""
    out_dir.mkdir(parents=True, exist_ok=True)
    jp = out_dir / "load_report.json"
    jp.write_text(json.dumps(report, indent=2, default=str), encoding="utf-8")

    lines = ["# Gold load report", ""]
    for fact, checks in report.get("facts", {}).items():
        dups = checks["grain_duplicates"]
        miss = checks["sk_miss_rates"]
        lines += [
            f"## {fact}",
            f"- rows: {miss['rows']}",
            f"- grain: `{', '.join(dups['grain'])}` — duplicate keys: "
            f"{dups['duplicate_keys']}",
            "- SK miss rates (%): "
            + ", ".join(f"{c}={v}" for c, v in miss["miss_rates_pct"].items()),
        ]
        card = checks.get("cardinality")
        if card:
            lines += [
                f"- distinct {card['column']} (HLL est): "
                f"{card['distinct_est']}"
            ]
        lines += [""]
    for dim, profs in report.get("dim_profiles", {}).items():
        if profs:
            lines += [
                f"## profile — {dim}",
                *[
                    f"- {p['col_name']}: distinct={p['n_distinct']} "
                    f"nulls={p['n_nulls']} range=[{p['min_val']}, "
                    f"{p['max_val']}]"
                    for p in profs
                ],
                "",
            ]
    for ds, q in report.get("quarantine", {}).items():
        if q["reasons"]:
            lines += [
                f"## quarantine — {ds}",
                *[f"- {r['reason_code']}: {r['n']}" for r in q["reasons"]],
                "",
            ]
    if "runs" in report:
        r = report["runs"]
        lines += [f"## runs", f"- total={r['total']} ok={r['ok']} failed={r['failed']}"]
    mp = out_dir / "load_report.md"
    mp.write_text("\n".join(lines), encoding="utf-8")
    return jp, mp
