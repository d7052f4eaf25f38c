"""Multi-cut history benchmark (VERDICT r3 #7): measure, not assert,
that per-cut gold merge wall time stays FLAT as history accumulates.

The claim under test is SCALE.md's O(batch) incremental-load story:
``merge_insert`` prunes the anti-join's existing side to the incoming
cut's partition (``prune={"cut_sk": [cut_sk]}``), so loading cut #30
costs the same as loading cut #1 even though the fact table is 30×
bigger.  A naive MERGE that rescans the whole fact would show wall
time growing linearly with cut index.

    python scripts/multicut_bench.py --cuts 30 --rows-per-cut 30000 \
        --work /tmp/multicut

Prints one JSON line: per-cut silver+gold seconds, the least-squares
slope of gold seconds vs cut index (sec/cut), and the ratio of the
last-5-cut mean to the first-5-cut mean.  Appends a markdown table to
SCALE.md when --update-scale-md is passed.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_lakehouse_movilidad_publica_santiago_spark.gold.runner import (  # noqa: E402
    GoldLoader,
)
from data_lakehouse_movilidad_publica_santiago_spark.session import (  # noqa: E402
    get_spark,
)
from data_lakehouse_movilidad_publica_santiago_spark.silver.runner import (  # noqa: E402
    run_silver,
)
from data_lakehouse_movilidad_publica_santiago_spark.sources.catalog import (  # noqa: E402
    discover_partitions,
)
from gen_scale_lake import gen_viajes  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cuts", type=int, default=30)
    ap.add_argument("--rows-per-cut", type=int, default=30_000)
    ap.add_argument("--work", type=Path, default=Path("/tmp/multicut_bench"))
    ap.add_argument("--update-scale-md", action="store_true")
    ap.add_argument(
        "--store",
        choices=["parquet", "txn"],
        default="parquet",
        help="gold store backend: plain parquet dirs or the "
        "transactional table format (lake.TxnTable)",
    )
    args = ap.parse_args()

    lake = args.work / "lake"
    gold = args.work / "gold"
    if args.work.exists():
        shutil.rmtree(args.work)
    lake.mkdir(parents=True)

    con = duckdb.connect()
    # April 2025 daily cuts: 30 days exactly
    cuts = [f"2025-04-{d:02d}" for d in range(1, args.cuts + 1)]
    for c in cuts:
        gen_viajes(con, lake, args.rows_per_cut, cut=c)

    spark = get_spark(app_name="multicut-bench")
    if args.store == "txn":
        from data_lakehouse_movilidad_publica_santiago_spark.gold.txn_store import (
            TxnGoldStore,
        )

        loader = GoldLoader(spark, gold, store=TxnGoldStore(spark, gold))
    else:
        loader = GoldLoader(spark, gold)
    parts = {p.cut: p for p in discover_partitions(lake, dataset="viajes")}

    rows = []
    for i, c in enumerate(cuts, start=1):
        p = parts[c]
        t0 = time.perf_counter()
        run_silver(spark, p, lake)
        t1 = time.perf_counter()
        res = loader.run(p, lake)
        t2 = time.perf_counter()
        assert res["status"] == "OK", res
        rows.append(
            {
                "cut": c,
                "i": i,
                "silver_sec": round(t1 - t0, 2),
                "gold_sec": round(t2 - t1, 2),
                "rows_inserted": res["rows_inserted"],
            }
        )
        print(
            f"cut {i:02d}/{len(cuts)} {c}: silver {rows[-1]['silver_sec']}s "
            f"gold {rows[-1]['gold_sec']}s ins={res['rows_inserted']}",
            file=sys.stderr,
        )

    # least-squares slope of gold_sec vs cut index
    n = len(rows)
    xs = [r["i"] for r in rows]
    ys = [r["gold_sec"] for r in rows]
    mx, my = sum(xs) / n, sum(ys) / n
    slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    first5 = sum(ys[:5]) / 5
    last5 = sum(ys[-5:]) / 5
    out = {
        "metric": "per_cut_gold_merge_wall",
        "store": args.store,
        "cuts": n,
        "rows_per_cut": args.rows_per_cut,
        "gold_sec": ys,
        "silver_sec": [r["silver_sec"] for r in rows],
        "slope_sec_per_cut": round(slope, 4),
        "last5_over_first5": round(last5 / first5, 3),
    }
    print(json.dumps(out))

    if args.update_scale_md:
        md = [
            "",
            "## Multi-cut history: per-cut gold merge stays flat"
            + (" (transactional store)" if args.store == "txn" else ""),
            "",
        ]
        md.append(
            f"{n} daily viajes cuts × {args.rows_per_cut} rows, loaded "
            "sequentially into one gold store (`scripts/multicut_bench.py"
            + (" --store txn" if args.store == "txn" else "")
            + "`). "
            + (
                "The stats-pruned (file-skipping) anti-join on the "
                "manifest-log store makes each merge O(batch), not "
                "O(history):"
                if args.store == "txn"
                else "The partition-pruned anti-join makes each merge "
                "O(batch), not O(history):"
            )
        )
        md += ["", "| cut # | gold merge (s) | silver (s) |", "|---|---|---|"]
        for r in rows:
            if r["i"] <= 3 or r["i"] > n - 3 or r["i"] % 5 == 0:
                md.append(
                    f"| {r['i']} | {r['gold_sec']} | {r['silver_sec']} |"
                )
        md += [
            "",
            f"Least-squares slope: **{out['slope_sec_per_cut']} s/cut**; "
            f"mean of last 5 cuts / first 5 cuts: "
            f"**{out['last5_over_first5']}** (1.0 = perfectly flat).",
        ]
        with open(Path(__file__).resolve().parents[1] / "SCALE.md", "a") as fh:
            fh.write("\n".join(md) + "\n")


if __name__ == "__main__":
    main()
