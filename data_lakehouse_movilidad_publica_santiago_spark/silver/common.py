"""Shared silver-transform plumbing: cast helpers with DuckDB TRY_CAST
parity, sink writers, and the quality.json audit document."""

from __future__ import annotations

import json
from datetime import datetime, timezone
from pathlib import Path
from typing import Any

import pyspark
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.quality import reason_distribution

# contract-sample thresholds (reference src/silver/contracts.py:20-21)
CONTRACT_WARN_RATE = 0.01
CONTRACT_FAIL_RATE = 0.05
CONTRACT_SAMPLE_ROWS = 10_000


def try_double(name: str) -> Column:
    """TRY_CAST(x AS DOUBLE): NULL on parse failure, even on ANSI sessions."""
    return F.col(name).try_cast("double")


def try_int(name: str) -> Column:
    """TRY_CAST(x AS INTEGER) parity: DuckDB parses '1.5' as numeric
    and rounds half-away; Spark's direct string→int would yield NULL,
    so go through double + HALF_UP round (SURVEY §7.4.4)."""
    return F.round(F.col(name).try_cast("double"), 0).try_cast("int")


def try_ts(name: str) -> Column:
    """TRY_CAST(x AS TIMESTAMP): NULL on unparseable strings."""
    return F.col(name).try_cast("timestamp")


def upper_trim(name: str) -> Column:
    return F.upper(F.trim(F.col(name)))


def write_parquet(df: DataFrame, path: Path) -> None:
    """ZSTD parquet sink. Spark's commit protocol (write to _temporary,
    atomic task/job commit) replaces the reference's tmp→rename dance
    (transforms.py:136-154)."""
    df.write.mode("overwrite").parquet(str(path))


def contract_check(
    df: DataFrame,
    constraints: list[tuple[str, Column]],
    sample_rows: int = CONTRACT_SAMPLE_ROWS,
) -> dict[str, Any]:
    """Columnar re-expression of the reference's Pydantic sample
    validation (transforms.py:214-279): evaluate every constraint
    predicate on a ≤10k-row sample in ONE aggregate pass; warn ≥1%,
    RuntimeError ≥5% error rate."""
    sample = df.limit(sample_rows)
    aggs = [
        F.sum(F.when(~cond | cond.isNull(), 1).otherwise(0)).alias(name)
        for name, cond in constraints
    ]
    row = sample.agg(F.count(F.lit(1)).alias("_n"), *aggs).collect()[0]
    n = row["_n"] or 0
    violations = {name: int(row[name] or 0) for name, _ in constraints}
    total_err = sum(violations.values())
    rate = (total_err / n) if n else 0.0
    status = "OK"
    if rate >= CONTRACT_FAIL_RATE:
        raise RuntimeError(
            f"contract sample validation failed: error_rate={rate:.4f} "
            f"violations={violations}"
        )
    if rate >= CONTRACT_WARN_RATE:
        status = "WARN"
    return {
        "sampled_rows": n,
        "error_rows": total_err,
        "error_rate": round(rate, 6),
        "status": status,
        "violations": {k: v for k, v in violations.items() if v},
    }


def quality_stats(
    dataset: str,
    cut: str,
    year: int,
    month: int,
    meta_row_count: int | None,
    read_row_count: int,
    valid_count: int,
    invalid_count: int,
    invalid_df: DataFrame,
    contract: dict[str, Any],
    output_files: list[str],
) -> dict[str, Any]:
    """The quality.json document (transforms.py:606-629 parity), with
    the hard count assertion read == valid + invalid."""
    assert read_row_count == valid_count + invalid_count, (
        f"{dataset} cut={cut}: read_row_count={read_row_count} "
        f"!= valid({valid_count}) + invalid({invalid_count})"
    )
    dist = [
        {"_reason_code": r["reason_code"], "cnt": r["n"]}
        for r in reason_distribution(invalid_df).collect()
    ]
    return {
        "generated_at": datetime.now(tz=timezone.utc).isoformat(),
        "engine": "spark",
        "spark_version": pyspark.__version__,
        "dataset": dataset,
        "cut": cut,
        "year": year,
        "month": month,
        "meta_row_count": meta_row_count,
        "read_row_count": read_row_count,
        "valid_row_count": valid_count,
        "invalid_row_count": invalid_count,
        "count_assertion": "PASS",
        "quarantine_rate_pct": round(invalid_count / read_row_count * 100, 4)
        if read_row_count
        else 0,
        "quarantine_reason_distribution": dist,
        "contract_sample_validation": contract,
        "output_files": output_files,
    }


def write_quality(stats: dict[str, Any], quality_dir: Path) -> Path:
    quality_dir.mkdir(parents=True, exist_ok=True)
    path = quality_dir / "quality.json"
    path.write_text(
        json.dumps(stats, indent=2, ensure_ascii=False, default=str),
        encoding="utf-8",
    )
    return path
