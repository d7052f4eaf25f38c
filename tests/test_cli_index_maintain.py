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

import json

from pyspark.sql import functions as F

from data_lakehouse_movilidad_publica_santiago_spark import cli
from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
    build_ivfpq_index,
    ivfpq_topk,
)

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
    assert rep2["optimize"]["codes"]["cells_compacted"] > 0
    assert (
        rep2["optimize"]["codes"]["files_after"]
        < rep2["optimize"]["codes"]["files_before"]
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
