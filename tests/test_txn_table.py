"""Transactional table format (lake.TxnTable): atomic commits, snapshot
isolation, time travel, optimistic concurrency, copy-on-write MERGE /
DELETE with file pruning, data skipping, OPTIMIZE, VACUUM."""

from __future__ import annotations

import json
import threading

import pytest
from pyspark.sql import functions as F

from data_lakehouse_movilidad_publica_santiago_spark.lake import (
    ConcurrentCommitError,
    SchemaMismatchError,
    TxnTable,
)


def _df(spark, rows, schema="k int, v string"):
    return spark.createDataFrame(rows, schema=schema)


def _content(df):
    return sorted(tuple(r) for r in df.collect())


# ---------------------------------------------------------------- basics


def test_append_read_roundtrip(spark, tmp_path):
    t = TxnTable(spark, tmp_path / "t")
    assert t.append(_df(spark, [(1, "a"), (2, "b")])) == 0
    assert t.append(_df(spark, [(3, "c")])) == 1
    assert _content(t.read()) == [(1, "a"), (2, "b"), (3, "c")]


def test_schema_enforced_on_append(spark, tmp_path):
    t = TxnTable(spark, tmp_path / "t")
    t.append(_df(spark, [(1, "a")]))
    with pytest.raises(SchemaMismatchError):
        t.append(_df(spark, [(1.5, "a")], schema="k double, v string"))
    # overwrite may evolve the schema
    t.overwrite(_df(spark, [(1.5, "x")], schema="k double, v string"))
    assert _content(t.read()) == [(1.5, "x")]


def test_empty_append_adds_no_files(spark, tmp_path):
    t = TxnTable(spark, tmp_path / "t")
    t.append(_df(spark, [(1, "a")]))
    before = t.snapshot().file_paths()
    t.append(_df(spark, []))  # 0-row markers must be dropped
    assert t.snapshot().file_paths() == before


# ------------------------------------------------- snapshots / time travel


def test_snapshot_isolation_and_time_travel(spark, tmp_path):
    t = TxnTable(spark, tmp_path / "t")
    t.append(_df(spark, [(1, "a")]))
    snap_v0 = t.read(version=0)  # resolve BEFORE the next commit
    t.append(_df(spark, [(2, "b")]))
    t.overwrite(_df(spark, [(9, "z")]))
    # the in-flight reader still sees v0 (files are immutable)
    assert _content(snap_v0) == [(1, "a")]
    assert _content(t.read(version=1)) == [(1, "a"), (2, "b")]
    assert _content(t.read()) == [(9, "z")]
    ts1 = json.load(open(t._log_path(1)))["ts_ms"]
    assert _content(t.read(timestamp_ms=ts1)) == [(1, "a"), (2, "b")]
    with pytest.raises(ValueError):
        t.read(timestamp_ms=0)


def test_checkpoint_replay_matches_full_replay(spark, tmp_path):
    t = TxnTable(spark, tmp_path / "t", checkpoint_interval=3)
    for i in range(8):
        t.append(_df(spark, [(i, f"r{i}")]))
    assert (t.root / "_txn_log").glob("*.checkpoint.json") is not None
    cps = list((t.root / "_txn_log").glob("*.checkpoint.json"))
    assert cps, "expected at least one checkpoint"
    assert _content(t.read()) == [(i, f"r{i}") for i in range(8)]
    # old versions still resolvable across the checkpoint boundary
    assert _content(t.read(version=4)) == [(i, f"r{i}") for i in range(5)]


# --------------------------------------------------------- crash / atomic


def test_uncommitted_data_files_are_invisible(spark, tmp_path):
    t = TxnTable(spark, tmp_path / "t")
    t.append(_df(spark, [(1, "a")]))
    # simulate a writer that crashed after landing data, before commit:
    orphan = t._write_data_files(_df(spark, [(99, "ghost")]))
    assert orphan  # files exist on disk ...
    assert _content(t.read()) == [(1, "a")]  # ... but are invisible
    # and a later vacuum (past the retention window) reclaims them
    out = t.vacuum(retain_last=5, min_age_s=0)
    assert out["deleted_files"] >= 1
    assert _content(t.read()) == [(1, "a")]


def test_interrupted_commit_leaves_no_partial_log(spark, tmp_path):
    t = TxnTable(spark, tmp_path / "t")
    t.append(_df(spark, [(1, "a")]))
    # a tmp log file from a dying writer must not corrupt the log
    (t.root / "_txn_log" / ".tmp-dead.json").write_text("{corrupt")
    assert t.latest_version() == 0
    assert _content(t.read()) == [(1, "a")]


# ------------------------------------------------------------ concurrency


def test_concurrent_appends_both_land(spark, tmp_path):
    t = TxnTable(spark, tmp_path / "t")
    t.append(_df(spark, [(0, "seed")]))
    errs: list[Exception] = []

    def worker(i: int) -> None:
        try:
            TxnTable(spark, tmp_path / "t").append(
                _df(spark, [(i, f"w{i}")])
            )
        except Exception as ex:  # pragma: no cover
            errs.append(ex)

    ths = [threading.Thread(target=worker, args=(i,)) for i in (1, 2, 3)]
    for th in ths:
        th.start()
    for th in ths:
        th.join()
    assert not errs
    assert _content(t.read()) == [
        (0, "seed"), (1, "w1"), (2, "w2"), (3, "w3")
    ]
    assert t.latest_version() == 3  # three distinct commits, no clobber


def test_lost_commit_race_rebases(spark, tmp_path):
    t = TxnTable(spark, tmp_path / "t")
    t.append(_df(spark, [(1, "a")]))
    # steal the next version slot to force the CAS to fail once
    stolen = {
        "version": 1, "ts_ms": 1, "op": "append",
        "add": [], "remove": [], "schema": None,
    }
    with open(t._log_path(1), "w") as f:
        json.dump(stolen, f)
    v = t.append(_df(spark, [(2, "b")]))
    assert v == 2  # rebased past the stolen slot
    assert _content(t.read()) == [(1, "a"), (2, "b")]


def test_merge_raises_after_retries_exhausted(spark, tmp_path):
    t = TxnTable(spark, tmp_path / "t", max_retries=1)
    t.append(_df(spark, [(1, "a")]))
    real_try = t._try_commit
    t._try_commit = lambda rec: False  # permanent loser
    try:
        with pytest.raises(ConcurrentCommitError):
            t.merge_upsert(_df(spark, [(1, "x")]), keys=["k"])
    finally:
        t._try_commit = real_try


# ------------------------------------------------------- merge / delete


def test_merge_upsert_updates_and_inserts(spark, tmp_path):
    t = TxnTable(spark, tmp_path / "t")
    t.append(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    out = t.merge_upsert(_df(spark, [(2, "B!"), (4, "d")]), keys=["k"])
    assert out["version"] == 1
    assert _content(t.read()) == [(1, "a"), (2, "B!"), (3, "c"), (4, "d")]
    # time travel still sees the pre-merge state
    assert _content(t.read(version=0)) == [(1, "a"), (2, "b"), (3, "c")]


def test_merge_prunes_unaffected_files(spark, tmp_path):
    t = TxnTable(spark, tmp_path / "t")
    # three disjoint key-range files via three commits of 1 file each
    for lo in (0, 100, 200):
        t.append(
            _df(spark, [(lo + i, f"v{lo + i}") for i in range(10)]).coalesce(1)
        )
    before = set(t.snapshot().file_paths())
    assert len(before) == 3
    out = t.merge_upsert(_df(spark, [(105, "UP")]), keys=["k"])
    # only the 100..109 file was rewritten; the other two carried over
    assert out["rewritten_files"] == 1
    assert out["kept_files"] == 2
    after = set(t.snapshot().file_paths())
    assert len(before & after) == 2
    got = dict((k, v) for k, v in t.read().collect())
    assert got[105] == "UP" and got[0] == "v0" and got[200] == "v200"


def test_merge_composite_keys(spark, tmp_path):
    t = TxnTable(spark, tmp_path / "t")
    t.append(
        _df(spark, [(1, 1, "a"), (1, 2, "b")], schema="k1 int, k2 int, v string")
    )
    t.merge_upsert(
        _df(spark, [(1, 2, "B"), (2, 1, "c")], schema="k1 int, k2 int, v string"),
        keys=["k1", "k2"],
    )
    assert _content(t.read()) == [(1, 1, "a"), (1, 2, "B"), (2, 1, "c")]


def test_delete_where_rewrites_only_candidates(spark, tmp_path):
    t = TxnTable(spark, tmp_path / "t")
    for lo in (0, 100):
        t.append(_df(spark, [(lo + i, "x") for i in range(10)]).coalesce(1))
    out = t.delete_where([("k", ">=", 100), ("k", "<", 105)])
    assert out["deleted_rows"] == 5
    assert out["rewritten_files"] == 1  # the 0..9 file was never touched
    assert _content(t.read()) == [
        *[(i, "x") for i in range(10)],
        *[(i, "x") for i in range(105, 110)],
    ]


# ------------------------------------------------------- skipping / maint


def test_read_predicates_skip_files(spark, tmp_path):
    t = TxnTable(spark, tmp_path / "t")
    for lo in (0, 100, 200):
        t.append(_df(spark, [(lo + i, "x") for i in range(10)]).coalesce(1))
    snap = t.snapshot()
    assert len(snap.file_paths()) == 3
    assert len(snap.prune([("k", "=", 105)])) == 1
    assert len(snap.prune([("k", ">=", 100)])) == 2
    assert len(snap.prune([("k", "in", [5, 205])])) == 2
    df = t.read(predicates=[("k", "=", 105)])
    # executor truth: only ONE file is actually opened
    files = {r[0] for r in df.select(F.input_file_name()).distinct().collect()}
    assert len(files) == 1
    assert _content(df) == [(105, "x")]


def test_optimize_compacts_without_changing_data(spark, tmp_path):
    t = TxnTable(spark, tmp_path / "t")
    for i in range(6):
        t.append(_df(spark, [(i, f"r{i}")]).coalesce(1))
    before = _content(t.read())
    n_before = len(t.snapshot().file_paths())
    out = t.optimize(target_file_bytes=64 * 1024 * 1024)
    assert out["compacted_files"] == n_before
    assert len(t.snapshot().file_paths()) == 1
    assert _content(t.read()) == before


def test_vacuum_respects_retention(spark, tmp_path):
    t = TxnTable(spark, tmp_path / "t")
    t.append(_df(spark, [(1, "a")]).coalesce(1))
    t.overwrite(_df(spark, [(2, "b")]).coalesce(1))
    t.overwrite(_df(spark, [(3, "c")]).coalesce(1))
    # retain last 2 versions: v0's file is exclusive → reclaimed
    out = t.vacuum(retain_last=2, min_age_s=0)
    assert out["deleted_files"] == 1
    assert _content(t.read(version=1)) == [(2, "b")]  # still travelable
    assert _content(t.read()) == [(3, "c")]
    with pytest.raises(Exception):
        t.read(version=0).collect()  # reclaimed, as promised


def test_history(spark, tmp_path):
    t = TxnTable(spark, tmp_path / "t")
    t.append(_df(spark, [(1, "a")]))
    t.merge_upsert(_df(spark, [(1, "b")]), keys=["k"])
    ops = [h["op"] for h in t.history()]
    assert ops == ["append", "merge"]


# ----------------------------------------------- clustering / streaming


def test_cluster_by_gives_disjoint_file_ranges(spark, tmp_path):
    t = TxnTable(spark, tmp_path / "t")
    rows = [(i, f"v{i}") for i in range(1000)]
    import random

    random.Random(7).shuffle(rows)
    t.append(
        _df(spark, rows).repartition(8),  # deliberately scrambled input
        cluster_by=["k"],
        n_files=4,
    )
    snap = t.snapshot()
    spans = sorted(
        (e["stats"]["min"]["k"], e["stats"]["max"]["k"])
        for e in snap.files.values()
    )
    assert len(spans) > 1
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2, "clustered files must own disjoint key ranges"
    # a point read therefore touches exactly one file
    assert len(snap.prune([("k", "=", 500)])) == 1


def test_optimize_recluster_restores_disjoint_ranges(spark, tmp_path):
    t = TxnTable(spark, tmp_path / "t")
    # interleaved appends → overlapping file ranges
    t.append(_df(spark, [(i, "a") for i in range(0, 100, 2)]).coalesce(1))
    t.append(_df(spark, [(i, "b") for i in range(1, 100, 2)]).coalesce(1))
    assert len(t.snapshot().prune([("k", "=", 50)])) == 2  # both overlap
    before = _content(t.read())
    t.optimize(target_file_bytes=64 * 1024 * 1024, cluster_by=["k"])
    assert _content(t.read()) == before
    assert len(t.snapshot().prune([("k", "=", 50)])) == 1


def test_txn_append_idempotent_per_batch(spark, tmp_path):
    t = TxnTable(spark, tmp_path / "t")
    assert t.append(_df(spark, [(1, "a")]), txn=("s1", 0)) == 0
    # replay of the SAME batch: no-op, no duplicate rows
    assert t.append(_df(spark, [(1, "a")]), txn=("s1", 0)) is None
    assert t.append(_df(spark, [(2, "b")]), txn=("s1", 1)) == 1
    # a DIFFERENT stream with the same batch id is independent
    assert t.append(_df(spark, [(3, "c")]), txn=("s2", 0)) == 2
    assert _content(t.read()) == [(1, "a"), (2, "b"), (3, "c")]
    assert t.snapshot().streams == {"s1": 1, "s2": 0}


def test_streaming_sink_exactly_once_across_restart(spark, tmp_path):
    import time as _time

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    t = TxnTable(spark, tmp_path / "t")

    _df(spark, [(1, "a"), (2, "b")]).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))

    def run_once() -> None:
        q = (
            spark.readStream.schema("k int, v string")
            .parquet(str(src))
            .writeStream.option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .foreachBatch(t.streaming_sink("gold-stream"))
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    run_once()
    assert _content(t.read()) == [(1, "a"), (2, "b")]
    # land a new file, restart from the SAME checkpoint
    _df(spark, [(3, "c")]).coalesce(1).write.mode("append").parquet(str(src))
    _time.sleep(0.1)
    run_once()
    assert _content(t.read()) == [(1, "a"), (2, "b"), (3, "c")]
    # a full re-run with NO new data must be a pure no-op
    v_before = t.latest_version()
    run_once()
    assert t.latest_version() == v_before
    assert _content(t.read()) == [(1, "a"), (2, "b"), (3, "c")]


# ------------------------------------------------------ schema evolution


def test_merge_schema_adds_column(spark, tmp_path):
    t = TxnTable(spark, tmp_path / "t")
    t.append(_df(spark, [(1, "a")]))
    # widening append: new column lands, old rows read as NULL
    t.append(
        _df(spark, [(2, "b", 9.5)], schema="k int, v string, score double"),
        merge_schema=True,
    )
    got = _content(t.read())
    assert got == [(1, "a", None), (2, "b", 9.5)]
    # without the flag the same append still raises
    with pytest.raises(SchemaMismatchError):
        t.append(
            _df(spark, [(3, "c", 1.0, 1)],
                schema="k int, v string, score double, extra int"),
        )
    # a type CHANGE is rejected even with the flag
    with pytest.raises(SchemaMismatchError):
        t.append(
            _df(spark, [(3, "c", "no")],
                schema="k int, v string, score string"),
            merge_schema=True,
        )


def test_merge_schema_subset_append_fills_null(spark, tmp_path):
    t = TxnTable(spark, tmp_path / "t")
    t.append(
        _df(spark, [(1, "a", 0.5)], schema="k int, v string, score double")
    )
    t.append(_df(spark, [(2, "b")]), merge_schema=True)  # missing 'score'
    assert _content(t.read()) == [(1, "a", 0.5), (2, "b", None)]


# ------------------------------------------------------------- z-order


def test_zorder_skips_on_both_columns(spark, tmp_path):
    """Linear clustering on x gives files whose y-range spans the whole
    table (y-predicates prune nothing); z-order on (x, y) gives files
    owning hyper-rectangles, so EITHER column's predicate prunes."""
    rows = [(x, y, x * 64 + y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x int, y int, payload int")

    lin = TxnTable(spark, tmp_path / "lin")
    lin.append(df.repartition(8), cluster_by=["x"], n_files=16)
    zt = TxnTable(spark, tmp_path / "z")
    zt.append(df.repartition(8), zorder_by=["x", "y"], n_files=16)

    n = 16
    x_pred = [("x", "<", 8)]
    y_pred = [("y", "<", 8)]
    assert len(lin.snapshot().prune(x_pred)) <= n // 4  # linear: x prunes
    assert len(lin.snapshot().prune(y_pred)) == n  # ... but y can't
    z_x = len(zt.snapshot().prune(x_pred))
    z_y = len(zt.snapshot().prune(y_pred))
    assert z_x <= n // 2, f"z-order x-predicate pruned nothing ({z_x}/{n})"
    assert z_y <= n // 2, f"z-order y-predicate pruned nothing ({z_y}/{n})"
    # and the data itself is unchanged
    assert zt.read().count() == 64 * 64
    assert _content(zt.read(predicates=[("x", "=", 3), ("y", "=", 4)])) == [
        (3, 4, 3 * 64 + 4)
    ]


def test_zorder_column_not_persisted(spark, tmp_path):
    t = TxnTable(spark, tmp_path / "t")
    df = spark.createDataFrame(
        [(i, i % 10, "p") for i in range(100)], "a int, b int, v string"
    )
    t.append(df, zorder_by=["a", "b"], n_files=4)
    assert t.read().columns == ["a", "b", "v"]  # __zorder dropped


def test_zorder_rejects_bad_input(spark, tmp_path):
    from data_lakehouse_movilidad_publica_santiago_spark.lake.zorder import (
        with_zvalue,
    )

    df = spark.createDataFrame([(1, "s")], "a int, s string")
    with pytest.raises(ValueError):
        with_zvalue(df, ["a"])  # one column: use cluster_by
    with pytest.raises(TypeError):
        with_zvalue(df, ["a", "s"])  # string column unsupported


# -------------------------------------------------------- change feed


def test_read_appends_incremental_feed(spark, tmp_path):
    t = TxnTable(spark, tmp_path / "t")
    t.append(_df(spark, [(1, "a")]))          # v0
    t.append(_df(spark, [(2, "b")]))          # v1
    t.append(_df(spark, [(3, "c")]))          # v2
    # consumer synced at v0 pulls exactly v1..v2's rows
    assert _content(t.read_appends(since_version=0)) == [(2, "b"), (3, "c")]
    assert _content(t.read_appends(0, until_version=1)) == [(2, "b")]
    # fully caught up → empty frame with the table schema
    empty = t.read_appends(since_version=2)
    assert empty.count() == 0 and empty.columns == ["k", "v"]


def test_read_appends_ignores_optimize_rejects_rewrites(spark, tmp_path):
    t = TxnTable(spark, tmp_path / "t")
    t.append(_df(spark, [(1, "a")]).coalesce(1))   # v0
    t.append(_df(spark, [(2, "b")]).coalesce(1))   # v1
    t.optimize(target_file_bytes=64 * 1024 * 1024)  # v2 (no-op logically)
    t.append(_df(spark, [(3, "c")]))               # v3
    assert _content(t.read_appends(since_version=1)) == [(3, "c")]
    t.merge_upsert(_df(spark, [(1, "A")]), keys=["k"])  # v4 rewrites
    with pytest.raises(ValueError, match="not append-only"):
        t.read_appends(since_version=1)


# ------------------------------------------------------ restore / bloom


def test_restore_rolls_back_as_new_commit(spark, tmp_path):
    t = TxnTable(spark, tmp_path / "t")
    t.append(_df(spark, [(1, "a")]))                   # v0
    t.merge_upsert(_df(spark, [(1, "BAD")]), keys=["k"])  # v1: bad deploy
    t.append(_df(spark, [(2, "also-bad")]))            # v2
    v = t.restore(0)
    assert v == 3  # a NEW commit, history preserved
    assert _content(t.read()) == [(1, "a")]
    assert _content(t.read(version=2)) == [(1, "BAD"), (2, "also-bad")]
    assert t.history()[-1]["op"] == "restore"
    # restoring to where we already are is a no-op
    assert t.restore(3) == 3


def test_bloom_prunes_unclustered_point_lookup(spark, tmp_path):
    import random

    rnd = random.Random(11)
    ids = [f"doc-{i:05d}" for i in range(2000)]
    rnd.shuffle(ids)  # high-cardinality id scattered across files
    t = TxnTable(spark, tmp_path / "t", bloom_columns=["doc_id"])
    rows = [(d, i % 7) for i, d in enumerate(ids)]
    df = spark.createDataFrame(rows, "doc_id string, grp int")
    # 4 separate commits -> 4+ files with fully overlapping id ranges
    for c in range(4):
        t.append(
            spark.createDataFrame(rows[c::4], "doc_id string, grp int")
            .coalesce(1)
        )
    n_files = len(t.snapshot().file_paths())
    assert n_files == 4
    target = rows[5][0]
    # min/max stats can't prune (ranges overlap) ...
    assert len(t.snapshot().prune([("doc_id", "=", target)])) == n_files
    # ... the bloom can
    pruned = t._bloom_prune(
        t.snapshot().file_paths(), [("doc_id", "=", target)]
    )
    assert len(pruned) < n_files
    got = t.read(predicates=[("doc_id", "=", target)])
    files = {r[0] for r in got.select(F.input_file_name()).distinct().collect()}
    assert len(files) <= len(pruned)
    assert _content(got) == [(target, 5 % 7)]
    # a value that exists is NEVER pruned away (no false negatives)
    for probe in rows[::97]:
        assert t.read(predicates=[("doc_id", "=", probe[0])]).count() == 1


def test_bloom_sidecars_follow_vacuum(spark, tmp_path):
    t = TxnTable(spark, tmp_path / "t", bloom_columns=["v"])
    t.append(_df(spark, [(1, "a")]).coalesce(1))
    t.overwrite(_df(spark, [(2, "b")]).coalesce(1))
    assert list((t.root / "data").rglob("*.bloom.json"))
    t.vacuum(retain_last=1, min_age_s=0)
    # every surviving sidecar belongs to a live data file
    import os as _os

    for side in (t.root / "data").rglob("*.bloom.json"):
        assert _os.path.exists(str(side)[: -len(".bloom.json")])


# ---------------------------------------------------------- MERGE clauses


def test_merge_matched_delete_not_matched_insert(spark, tmp_path):
    t = TxnTable(spark, tmp_path / "t")
    t.append(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    # matched keys are DELETED, unmatched source rows INSERTED
    t.merge(
        _df(spark, [(2, "x"), (9, "new")]), keys=["k"],
        when_matched="delete", when_not_matched="insert",
    )
    assert _content(t.read()) == [(1, "a"), (3, "c"), (9, "new")]


def test_merge_matched_delete_only(spark, tmp_path):
    t = TxnTable(spark, tmp_path / "t")
    t.append(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    t.merge(
        _df(spark, [(2, "x"), (9, "zz")]), keys=["k"],
        when_matched="delete", when_not_matched=None,
    )
    assert _content(t.read()) == [(1, "a"), (3, "c")]  # 9 NOT inserted


def test_merge_update_only_skips_unmatched_source(spark, tmp_path):
    t = TxnTable(spark, tmp_path / "t")
    t.append(_df(spark, [(1, "a"), (2, "b")]))
    t.merge(
        _df(spark, [(2, "B!"), (9, "never")]), keys=["k"],
        when_matched="update", when_not_matched=None,
    )
    assert _content(t.read()) == [(1, "a"), (2, "B!")]


def test_merge_insert_only_appends_without_rewrites(spark, tmp_path):
    t = TxnTable(spark, tmp_path / "t")
    t.append(_df(spark, [(1, "a"), (2, "b")]).coalesce(1))
    before = set(t.snapshot().file_paths())
    out = t.merge(
        _df(spark, [(2, "dup"), (3, "c")]), keys=["k"],
        when_matched=None, when_not_matched="insert",
    )
    assert out["rewritten_files"] == 0
    assert before <= set(t.snapshot().file_paths())  # nothing removed
    assert _content(t.read()) == [(1, "a"), (2, "b"), (3, "c")]
    assert t.history()[-1]["op"] == "append"  # zero-copy insert-only path


def test_merge_requires_a_clause(spark, tmp_path):
    t = TxnTable(spark, tmp_path / "t")
    t.append(_df(spark, [(1, "a")]))
    with pytest.raises(ValueError):
        t.merge(_df(spark, [(1, "x")]), keys=["k"],
                when_matched=None, when_not_matched=None)
