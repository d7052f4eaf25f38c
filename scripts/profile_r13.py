"""Round-13 optimization measurement harness (guide §1).

For each headline query: capture the FORMATTED physical plan to
``plans/r13/<name>_<tag>.txt``, count plan features (Exchange nodes,
join strategies, Python-eval nodes), and time the query with the
bench's own action (collect of the small aggregated result — these
queries all end in a driver-sized aggregate, so collect == compute;
a noop sink adds nothing here but is available with --noop).

Usage:
    python scripts/profile_r13.py --tag before [--passes 3] [names...]
    python scripts/profile_r13.py --tag after --noop mmr_topk

Prints one JSON line per query: {name, median_sec, min, max, plan:
{exchanges, bhj, smj, shj, bnlj, python_eval}} and a total at the end.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import ALL_QUERIES, HEADLINE  # noqa: E402

from data_lakehouse_movilidad_publica_santiago_spark.plans.checks import (  # noqa: E402
    explain_str,
)
from data_lakehouse_movilidad_publica_santiago_spark.session import (  # noqa: E402
    get_spark,
)


def plan_features(text: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\(\d+\) Exchange\b", text)),
        "bhj": len(re.findall(r"\(\d+\) BroadcastHashJoin", text)),
        "smj": len(re.findall(r"\(\d+\) SortMergeJoin", text)),
        "shj": len(re.findall(r"\(\d+\) ShuffledHashJoin", text)),
        "bnlj": len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", text)),
        "cartesian": len(re.findall(r"\(\d+\) CartesianProduct", text)),
        "python_eval": len(
            re.findall(
                r"\(\d+\) (BatchEvalPython|ArrowEvalPython|MapInArrow|"
                r"MapInPandas|FlatMapGroupsInPandas)",
                text,
            )
        ),
        "windows": len(re.findall(r"\(\d+\) Window\b", text)),
        "sorts": len(re.findall(r"\(\d+\) Sort\b", text)),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=None)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = args.names or HEADLINE
    plans_dir = Path(__file__).resolve().parent.parent / "plans" / "r13"
    plans_dir.mkdir(parents=True, exist_ok=True)

    spark = get_spark(app_name="profile_r13")
    results: dict[str, dict] = {}
    # warm-up pass (codegen, parquet footers, one-time index builds)
    for name in names:
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        ALL_QUERIES[name](spark, sf_dir).collect()

    for name in names:
        df = ALL_QUERIES[name](spark, sf_dir)
        if not args.no_plans:
            text = explain_str(df)
            (plans_dir / f"{name}_{args.tag}.txt").write_text(text)
            feats = plan_features(text)
        else:
            feats = {}
        runs = []
        for i in range(args.passes):
            spark.sparkContext.setJobDescription(f"{name}:pass{i}")
            # time INCLUDES gate construction, like bench.py — several
            # gates (MMR greedy, GD fits, pinned prefix sums) do their
            # work eagerly at construction time
            t0 = time.perf_counter()
            df = ALL_QUERIES[name](spark, sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        rec = {
            "name": name,
            "median_sec": round(runs[len(runs) // 2], 3) if runs else None,
            "min": round(runs[0], 3) if runs else None,
            "max": round(runs[-1], 3) if runs else None,
            "plan": feats,
        }
        results[name] = rec
        print(json.dumps(rec), flush=True)

    total = round(
        sum(r["median_sec"] or 0.0 for r in results.values()), 3
    )
    print(json.dumps({"total_median_sec": total, "n": len(results)}))


if __name__ == "__main__":
    main()
