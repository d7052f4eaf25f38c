"""Round-12 scale probes (local[32]):

  twolevel  hierarchical vs flat coarse quantizer at n_cells=4096 on a
            5M clustered corpus — the 100-TB cell-count regime
            (n_cells ~ sqrt(N)) where SCALE.md r11 measured the FLAT
            build at 854 s, dominated by O(sample*n_cells*dim)/iter
            driver k-means and O(n_cells*dim) per-row assignment.
            Builds BOTH variants (residual, m=8) on the same corpus in
            the same session, records build walls and the recall/query
            grid for each, so the two-level path's build savings and
            its assignment-approximation recall cost are measured on
            one box state.
  trainonly driver-side training microbench: flat vs two-level
            k-means on the SAME collected 200k sample at n_cells=4096
            — isolates the training-cost term from the corpus passes.

Run:  python scripts/scale_probe_r12.py [n] [twolevel|trainonly|all]
Emits one JSON line per probe; summarize into SCALE.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from scale_probe_r11 import (  # noqa: E402
    _clustered_fixture,
    _dir_bytes,
    _recall_grid,
)

from data_lakehouse_movilidad_publica_santiago_spark.session import (  # noqa: E402
    get_spark,
)


def probe(name: str, payload: dict) -> None:
    print(json.dumps({"probe": name, **payload}), flush=True)


def twolevel_probe(n_vecs: int, n_cells: int = 4096) -> None:
    import os

    from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
        build_ivfpq_index,
        load_ivfpq_meta,
    )

    spark = get_spark(
        app_name="scale-probe-r12-twolevel",
        extra_conf={"spark.network.timeout": "600s"},
    )
    work = Path(tempfile.mkdtemp(prefix="probe_r12_2l_"))
    try:
        emb, queries, exact = _clustered_fixture(spark, work, n_vecs)
        for coarse in ("two_level", "flat"):
            idx = str(work / f"ivfpq_{coarse}")
            t0 = time.perf_counter()
            build_ivfpq_index(
                emb, idx, n_cells=n_cells, m=8, ksub=16, iters=2,
                sample_cap=200_000, residual=True, coarse=coarse,
            )  # fmt: skip
            build_wall = round(time.perf_counter() - t0, 2)
            meta, _cent = load_ivfpq_meta(spark, idx)
            probe("twolevel_build", {
                "n_vecs": n_vecs, "coarse": coarse,
                "n_cells": int(meta["n_cells"]),
                "branch_k2": meta.get("branch_k2"),
                "build_sec": build_wall,
                "codes_bytes": _dir_bytes(os.path.join(idx, "codes")),
            })  # fmt: skip
            _recall_grid(
                spark, idx, emb, queries, exact,
                grid=[(16, 64), (64, 64), (256, 64)],
                extra={"n_vecs": n_vecs, "n_cells": int(meta["n_cells"]),
                       "variant": f"residual-{coarse}", "m": 8},
            )  # fmt: skip
            shutil.rmtree(idx, ignore_errors=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


def trainonly_probe(n_vecs: int, n_cells: int = 4096) -> None:
    from data_lakehouse_movilidad_publica_santiago_spark.operators.similarity import (
        _collect_training_sample,
        _spherical_kmeans,
    )

    spark = get_spark(app_name="scale-probe-r12-train")
    work = Path(tempfile.mkdtemp(prefix="probe_r12_tr_"))
    try:
        emb, _queries, _exact = _clustered_fixture(
            spark, work, n_vecs, n_queries=1
        )
        x = _collect_training_sample(emb, "embedding", 200_000, 7)

        t0 = time.perf_counter()
        _spherical_kmeans(x, n_cells, n_iter=10, seed=7)
        flat_sec = round(time.perf_counter() - t0, 2)

        import math

        import numpy as np

        t0 = time.perf_counter()
        k1 = int(round(math.sqrt(n_cells)))
        l1 = _spherical_kmeans(x, k1, n_iter=10, seed=7)
        assign = (x @ l1.T).argmax(axis=1)
        k2 = math.ceil(n_cells / len(l1))
        for c in range(len(l1)):
            members = x[assign == c]
            if len(members) > k2:
                _spherical_kmeans(members, k2, n_iter=10, seed=8 + c)
        two_sec = round(time.perf_counter() - t0, 2)
        # one Arrow-batch of flat vs hierarchical assignment cost
        batch = x[:10_000]
        cent = np.repeat(l1, k2, axis=0)[:n_cells]
        t0 = time.perf_counter()
        (batch @ cent.T).argmax(axis=1)
        flat_assign_sec = round(time.perf_counter() - t0, 4)
        sub = cent.reshape(len(l1), -1, x.shape[1])
        t0 = time.perf_counter()
        top = (batch @ l1.T).argmax(axis=1)
        np.einsum("nd,nkd->nk", batch, sub[top]).argmax(axis=1)
        two_assign_sec = round(time.perf_counter() - t0, 4)
        probe("trainonly", {
            "sample_rows": int(len(x)), "n_cells": n_cells,
            "flat_train_sec": flat_sec, "twolevel_train_sec": two_sec,
            "train_speedup": round(flat_sec / max(two_sec, 1e-9), 1),
            "flat_assign_sec_per_10k": flat_assign_sec,
            "twolevel_assign_sec_per_10k": two_assign_sec,
            "assign_speedup": round(
                flat_assign_sec / max(two_assign_sec, 1e-9), 1
            ),
        })  # fmt: skip
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    mode = sys.argv[2] if len(sys.argv) > 2 else "all"
    modes = {mode}
    if modes & {"trainonly", "all"}:
        trainonly_probe(min(n, 5_000_000))
    if modes & {"twolevel", "all"}:
        twolevel_probe(min(n, 5_000_000))


if __name__ == "__main__":
    main()
