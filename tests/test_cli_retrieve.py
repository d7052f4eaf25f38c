"""The ``retrieve`` CLI subcommand: the composed 100 TB retrieval
stack (IVF-PQ cell-pruned ADC prefetch → bounded relevance pool →
driver-greedy MMR) as a product surface, end-to-end from argv to
JSON on stdout.  At sf0.001 (500 vectors) the default pool covers
most of the corpus, so the CLI output is checked for EQUALITY against
the exact k-scan mmr_topk — the same pin the mmr gates use."""

from __future__ import annotations

import json

from data_lakehouse_movilidad_publica_santiago_spark import cli
from data_lakehouse_movilidad_publica_santiago_spark.operators.retrieval import (
    mmr_topk,
)

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def _run_cli(argv, capsys):
    rc = cli.main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return rc, json.loads(out)


def test_retrieve_ivfpq_prefetch_matches_exact(spark, tmp_path, capsys):
    rc, payload = _run_cli(
        [
            "retrieve",
            "--embeddings", EMB,
            "--index-dir", str(tmp_path / "idx"),
            "--query-id", "0",
            "--k", "4",
            "--pool-size", "400",
            "--n-cells", "4",
            "--n-probe", "4",
        ],
        capsys,
    )
    assert rc == 0
    # fresh builds store cell-partitioned vectors → the CLI runs the
    # fully file-pruned stack (round 9)
    assert payload["prefetch"] == "ivfpq-filepruned"
    assert (tmp_path / "idx" / "codebooks.json").exists()
    assert (tmp_path / "idx" / "vectors").exists()
    got = [
        (r["rank"], r["vec_id"], r["relevance"], r["redundancy"],
         r["mmr_score"]) for r in payload["results"]
    ]  # fmt: skip
    emb = spark.read.parquet(EMB)
    q = [float(x) for x in
         emb.filter("vec_id = 0").collect()[0]["embedding"]]  # fmt: skip
    exact = [tuple(r) for r in mmr_topk(emb, q, k=4, lam=0.7).collect()]
    # n_probe = n_cells → the prefetch screens every cell; with the
    # pool covering 4/5 of the tiny corpus the ANN-prefetched pooled
    # selection reproduces the exact greedy bit-for-bit
    assert got == exact


def test_retrieve_exact_pool_certifies(tmp_path, capsys):
    rc, payload = _run_cli(
        [
            "retrieve",
            "--embeddings", EMB,
            "--index-dir", str(tmp_path / "unused"),
            "--query-id", "7",
            "--k", "3",
            "--pool-size", "500",
            "--exact-pool",
        ],
        capsys,
    )
    assert rc == 0
    assert payload["prefetch"] == "exact"
    # pool == corpus → exact by construction, certificate trivially True
    assert payload["pool_certified_sufficient"] is True
    assert len(payload["results"]) == 3
    assert [r["rank"] for r in payload["results"]] == [1, 2, 3]


def test_retrieve_unknown_query_id_fails_cleanly(tmp_path, capsys):
    rc = cli.main(
        [
            "retrieve",
            "--embeddings", EMB,
            "--index-dir", str(tmp_path / "idx2"),
            "--query-id", "99999999",
        ]
    )
    assert rc == 1

def test_retrieve_legacy_codes_only_index(spark, tmp_path, capsys):
    """A pre-round-9 index (codes only, no vectors/) still serves: the
    CLI falls back to the candidates-prefetch pooled path."""
    from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
        build_ivfpq_index,
    )

    emb = spark.read.parquet(EMB)
    idx = tmp_path / "legacy"
    build_ivfpq_index(emb, str(idx), n_cells=4)
    rc, payload = _run_cli(
        [
            "retrieve",
            "--embeddings", EMB,
            "--index-dir", str(idx),
            "--query-id", "0",
            "--k", "4",
            "--pool-size", "400",
            "--n-probe", "4",
        ],
        capsys,
    )
    assert rc == 0
    assert payload["prefetch"] == "ivfpq"
    q = [float(x) for x in
         emb.filter("vec_id = 0").collect()[0]["embedding"]]  # fmt: skip
    exact = [tuple(r) for r in mmr_topk(emb, q, k=4, lam=0.7).collect()]
    got = [
        (r["rank"], r["vec_id"], r["relevance"], r["redundancy"],
         r["mmr_score"]) for r in payload["results"]
    ]  # fmt: skip
    assert got == exact
