"""Round-9 refresh of the real-shape end-to-end baseline (VERDICT r8
ask #4): generate the reference's EXACT production shape — one 3,621,017-row
viajes day + one 28,447,535-row etapas week + one 747,593-row subidas
month (the exact quality.json totals, so the round-10 quarantine
parity assertion checks the reference's EXACT published per-reason
counts: viajes NEG_DISTANCE 14,854 + BAD_RANGE_N_ETAPAS 272; etapas
NEG_DISTANCE 100,606 + BAD_UTM_X 6,364; subidas 0) — and replay the full silver→gold load
through the real CLI code paths (``run_silver`` + ``GoldLoader``) on
local[32], timing each layer.

The round-3 headline (1006 s end-to-end, 32.6 k raw rows/s, 2.5× the
reference's 13.1 k rows/s) predates ~80 operators and the checkpoint/
stage machinery; this replay re-measures on the current tree so SCALE.md
tracks drift.  Prints ONE JSON line (per-layer walls, rows/s) that the
SCALE.md round-9 row sources verbatim.

    python scripts/weekly_cut_replay.py --work /tmp/scale_lake_r9
    python scripts/weekly_cut_replay.py --viajes 360000 \
        --etapas 2840000 --subidas 75000   # 1/10-shape smoke
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
sys.path.insert(0, str(Path(__file__).resolve().parent))

from gen_scale_lake import (  # noqa: E402
    expected_quarantine,
    gen_etapas,
    gen_subidas,
    gen_viajes,
)

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


def _proc_tree_cpu_sec(root_pid: int | None = None) -> float:
    """User+system CPU seconds of this process and every live
    descendant (plus reaped children via cutime/cstime), read from
    /proc.  In local mode the whole engine is one process tree —
    Python driver → executor JVM → forked Python workers — so the
    delta of this across a layer is that layer's total CPU burn.
    Round-11 motivation (VERDICT r10 ask #5): the full-shape WALL
    swings 90↔148s between identical runs from box-state contention
    alone, so wall cannot distinguish a code regression from noise on
    4–7-minute jobs; CPU time is stable under contention and is the
    round-over-round comparator SCALE.md now tracks."""
    import os

    tck = float(os.sysconf("SC_CLK_TCK"))
    children: dict[int, list[int]] = {}
    cpu: dict[int, int] = {}
    for name in os.listdir("/proc"):
        if not name.isdigit():
            continue
        try:
            with open(f"/proc/{name}/stat") as f:
                s = f.read()
        except OSError:
            continue  # process exited between listdir and open
        rest = s[s.rindex(")") + 2 :].split()
        pid = int(name)
        cpu[pid] = sum(int(rest[i]) for i in (11, 12, 13, 14))
        children.setdefault(int(rest[1]), []).append(pid)
    total, stack, seen = 0, [root_pid or os.getpid()], set()
    while stack:
        p = stack.pop()
        if p in seen or p not in cpu:
            continue
        seen.add(p)
        total += cpu[p]
        stack.extend(children.get(p, []))
    return total / tck


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", type=Path, default=Path("/tmp/scale_lake_r9"))
    ap.add_argument("--viajes", type=int, default=3_621_017)
    ap.add_argument("--etapas", type=int, default=28_447_535)
    ap.add_argument("--subidas", type=int, default=747_593)
    ap.add_argument("--keep", action="store_true", help="keep the work dir")
    args = ap.parse_args()

    if args.work.exists():
        shutil.rmtree(args.work)
    lake = args.work / "lake"
    lake.mkdir(parents=True)

    t0 = time.perf_counter()
    con = duckdb.connect()
    gen_viajes(con, lake, args.viajes)
    gen_etapas(con, lake, args.etapas)
    gen_subidas(con, lake, args.subidas)
    con.close()
    gen_sec = time.perf_counter() - t0
    n_raw = args.viajes + args.etapas + args.subidas
    print(f"gen: {n_raw} raw rows in {gen_sec:.1f}s", file=sys.stderr)

    spark = get_spark(app_name="weekly-cut-replay")
    parts = [
        p
        for ds in ("viajes", "etapas", "subidas_30m")
        for p in discover_partitions(lake, dataset=ds)
    ]
    assert len(parts) == 3, parts

    silver = {}
    silver_cpu = {}
    t1 = time.perf_counter()
    c1 = _proc_tree_cpu_sec()
    for p in parts:
        ts, cs = time.perf_counter(), _proc_tree_cpu_sec()
        run_silver(spark, p, lake)
        silver[p.dataset] = round(time.perf_counter() - ts, 1)
        silver_cpu[p.dataset] = round(_proc_tree_cpu_sec() - cs, 1)
        print(
            f"silver {p.dataset}: {silver[p.dataset]}s "
            f"cpu={silver_cpu[p.dataset]}s",
            file=sys.stderr,
        )
    t2 = time.perf_counter()
    c2 = _proc_tree_cpu_sec()

    # quarantine parity (round 10): the generator plants the
    # reference's EXACT published per-reason quarantine distribution
    # (quality.json in the reference lake), so the silver layer's own
    # quality.json must reproduce it — count_assertion, invalid total,
    # and the per-reason counts, asserted here
    sizes = {
        "viajes": args.viajes,
        "etapas": args.etapas,
        "subidas_30m": args.subidas,
    }
    quarantine = {}
    for p in parts:
        expected = expected_quarantine(p.dataset, sizes[p.dataset])
        stats = json.loads(
            (p.quality_dir(lake) / "quality.json").read_text(encoding="utf-8")
        )
        actual = {
            d["_reason_code"]: d["cnt"]
            for d in stats["quarantine_reason_distribution"]
        }
        ok = (
            stats["count_assertion"] == "PASS"
            and stats["read_row_count"] == sizes[p.dataset]
            and stats["invalid_row_count"] == sum(expected.values())
            and actual == expected
        )
        quarantine[p.dataset] = {
            "expected": expected,
            "actual": actual,
            "invalid_rows": stats["invalid_row_count"],
            "match": ok,
        }
        if not ok:
            # not `assert` — that compiles out under python -O and
            # would turn the parity gate into a no-op (ADVICE r10)
            raise SystemExit(
                f"{p.dataset}: quarantine parity MISMATCH — expected "
                f"{expected}, got {actual} "
                f"(invalid={stats['invalid_row_count']})"
            )
        print(f"quarantine {p.dataset}: EXACT match {actual}", file=sys.stderr)

    loader = GoldLoader(spark, args.work / "gold")
    gold = {}
    gold_cpu = {}
    inserted = {}
    cg = _proc_tree_cpu_sec()
    for p in parts:
        ts, cs = time.perf_counter(), _proc_tree_cpu_sec()
        res = loader.run(p, lake)
        if res["status"] != "OK":
            raise SystemExit(f"gold load failed: {res}")
        gold[p.dataset] = round(time.perf_counter() - ts, 1)
        gold_cpu[p.dataset] = round(_proc_tree_cpu_sec() - cs, 1)
        inserted[p.dataset] = res.get("rows_inserted")
        print(
            f"gold {p.dataset}: {gold[p.dataset]}s "
            f"cpu={gold_cpu[p.dataset]}s ins={inserted[p.dataset]}",
            file=sys.stderr,
        )
    t3 = time.perf_counter()
    c3 = _proc_tree_cpu_sec()

    silver_sec, gold_sec = t2 - t1, t3 - t2
    total = t3 - t1
    out = {
        "metric": "weekly_cut_end_to_end",
        "raw_rows": n_raw,
        "gen_sec": round(gen_sec, 1),
        "silver_sec": round(silver_sec, 1),
        "silver_cpu_sec": round(c2 - c1, 1),
        "silver_per_dataset": silver,
        "silver_cpu_per_dataset": silver_cpu,
        "gold_sec": round(gold_sec, 1),
        "gold_cpu_sec": round(c3 - cg, 1),
        "gold_per_dataset": gold,
        "gold_cpu_per_dataset": gold_cpu,
        "cpu_method": "proc_tree_utime+stime (driver+JVM+python workers)",
        "rows_inserted": inserted,
        "end_to_end_sec": round(total, 1),
        "raw_rows_per_sec": round(n_raw / total),
        "silver_rows_per_sec": round(n_raw / silver_sec),
        "quarantine_parity": quarantine,
    }
    print(json.dumps(out))
    if not args.keep:
        shutil.rmtree(args.work, ignore_errors=True)


if __name__ == "__main__":
    main()
