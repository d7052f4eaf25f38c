"""Persisted IVF index: build layout, query correctness, and the
file-pruning guarantee (VERDICT r3 #5).

The claim under test: with the corpus written Hive-partitioned by
``ivf_cell``, an ANN query's cell predicate prunes at the FILE level —
it reads exactly the probed cells' part-files (n_probe/n_cells of the
corpus), not a row-filtered full scan.  ``input_file_name()`` gives
executor truth about which files the pruned scan actually opened.
"""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from data_lakehouse_movilidad_publica_santiago_spark.operators.similarity import (
    build_ivf_index,
    cosine_topk,
    ivf_topk_indexed,
)

from conftest import SF_CORRECTNESS

N_CELLS, N_PROBE = 8, 4


@pytest.fixture(scope="module")
def ivf_index(spark, tmp_path_factory):
    emb = spark.read.parquet(f"{SF_CORRECTNESS}/embeddings.parquet")
    d = str(tmp_path_factory.mktemp("ivf_index"))
    build_ivf_index(emb, d, n_cells=N_CELLS, seed=7)
    return d, emb


def _query_vec(emb):
    row = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0]
    return [float(x) for x in row[0]]


def test_layout_one_file_per_cell(ivf_index):
    d, _ = ivf_index
    cell_dirs = sorted(glob.glob(f"{d}/vectors/ivf_cell=*"))
    assert len(cell_dirs) == N_CELLS
    for cd in cell_dirs:  # repartition(ivf_cell) → one part-file per cell
        assert len(glob.glob(f"{cd}/*.parquet")) == 1
    assert len(glob.glob(f"{d}/centroids/*.parquet")) == 1


def test_indexed_query_matches_exact_topk(spark, ivf_index):
    d, emb = ivf_index
    q = _query_vec(emb)
    got = ivf_topk_indexed(spark, d, q, k=10, n_probe=N_PROBE).collect()
    want = cosine_topk(emb, q, k=10).collect()
    # measured recall 1.0 on this corpus at 8 cells / 4 probes (the
    # same pinned configuration as the ivf_knn gate)
    assert [(r["vec_id"], r["cos_sim"]) for r in got] == [
        (r["vec_id"], r["cos_sim"]) for r in want
    ]


def test_probe_scan_reads_only_probed_files(spark, ivf_index):
    d, emb = ivf_index
    q = _query_vec(emb)
    # recompute the probe set the same way the query does
    import numpy as np

    rows = spark.read.parquet(f"{d}/centroids").collect()
    cent = np.zeros((len(rows), len(rows[0]["centroid"])))
    for r in rows:
        cent[r["cell"]] = r["centroid"]
    qv = np.asarray(q) / np.linalg.norm(q)
    probe = [int(c) for c in np.argsort(-(cent @ qv))[:N_PROBE]]

    scan = spark.read.parquet(f"{d}/vectors").filter(
        F.col("ivf_cell").isin(probe)
    )
    # plan: the cell predicate must be a PARTITION filter (file-level),
    # not a post-scan row filter
    plan = scan._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PartitionFilters" in plan and "ivf_cell" in plan.split(
        "PartitionFilters", 1
    )[1].splitlines()[0]
    # executor truth: the files actually opened are exactly the probed
    # cells' part-files — n_probe/n_cells of the corpus
    files_read = {
        r[0] for r in scan.select(F.input_file_name()).distinct().collect()
    }
    probed_disk = {
        f"file://{p}"
        for c in probe
        for p in glob.glob(f"{d}/vectors/ivf_cell={c}/*.parquet")
    }
    all_disk = set(glob.glob(f"{d}/vectors/*/*.parquet"))
    assert files_read == probed_disk
    assert len(files_read) == N_PROBE and len(all_disk) == N_CELLS
