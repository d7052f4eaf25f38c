"""Simulate the driver's correctness gate: vanilla SparkSession (no
session.py configs, ANSI default ON), entry() smoke, then each
queries()[name] vs oracle_sql()[name] on DuckDB at sf0.01.

Usage: python /tmp/drive_driver_contract.py [name-substring ...]
With substrings, only matching query names are driven (entry always).
"""

import math
import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as e  # noqa: E402

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in sorted(cols):
            v = row[c]
            if isinstance(v, float):
                v = None if math.isnan(v) else round(v, 6)
            vals.append(repr(v))
        out.append("|".join(vals))
    return sorted(out)


def main():
    filters = sys.argv[1:]
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    n = e.entry(spark).count()
    print(f"entry: {n} rows", flush=True)
    assert n > 0, "entry() must return a non-empty DataFrame"

    queries = e.queries()
    oracles = e.oracle_sql()
    failed = []
    for name in sorted(queries):
        if filters and not any(f in name for f in filters):
            continue
        try:
            sdf = queries[name](spark, SF)
            srows = [r.asDict() for r in sdf.collect()]
            scols = sdf.columns
            if name not in oracles:
                print(f"{name}: rows-only {len(srows)} rows", flush=True)
                continue
            rel = con.execute(oracles[name])
            dcols = [d[0] for d in rel.description]
            drows = [dict(zip(dcols, r)) for r in rel.fetchall()]
            ok_cols = sorted(scols) == sorted(dcols)
            ok_rows = len(srows) == len(drows)
            ok_vals = normalize(srows, scols) == normalize(drows, dcols)
            status = "OK" if (ok_cols and ok_rows and ok_vals) else "FAIL"
            if status == "FAIL":
                failed.append(name)
            print(
                f"{name}: {status} cols={ok_cols} rows={ok_rows}"
                f" ({len(srows)}/{len(drows)}) vals={ok_vals}",
                flush=True,
            )
        except Exception as ex:  # noqa: BLE001
            failed.append(name)
            print(f"{name}: ERROR {type(ex).__name__}: {ex}", flush=True)
    print("FAILED:", failed, flush=True)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
