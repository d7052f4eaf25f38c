"""Manifest-log transactional parquet tables (pure PySpark, no jars).

``BASELINE.json`` names "Spark SQL + Delta/Iceberg" as the stated
production approach; this environment ships neither jar, so this module
implements the table-format contract itself, from the *published*
protocol ideas (Delta's commit log / Iceberg's snapshot manifests):

Layout::

    <root>/
      _txn_log/
        00000000000000000000.json            one commit per version
        00000000000000000009.checkpoint.json full live-set snapshot
      data/
        commit-<uuid>/part-*.parquet         immutable, never edited

Guarantees
----------
- **Atomic commits.** A commit is a single put-if-absent of
  ``_txn_log/<version>.json`` (``os.link`` — atomic create-if-absent on
  POSIX; HDFS/ABFS rename-without-overwrite at cluster scale). Data
  files land first under unique names; a crash before the log record
  publishes leaves them unreferenced and therefore invisible.
- **Snapshot isolation.** Readers resolve a version once and read only
  that version's file list; files are immutable, so a concurrent
  writer can never change what an in-flight reader sees.
- **Time travel.** Any retained version (or latest-at-timestamp) is
  readable, because old manifests and their files stay until VACUUM.
- **Optimistic concurrency.** A losing writer (version file already
  exists) rebases: appends always replay onto the new head;
  copy-on-write ops (merge/delete/optimize) recompute from the new
  snapshot, bounded by ``max_retries``.
- **Data skipping.** Each added file carries per-column min/max/null
  stats read from the parquet footers at commit time; point and range
  predicates prune the file list before Spark ever plans the scan.

Scale notes (100 TB): the log is O(commits) metadata, compacted by
checkpoints every ``checkpoint_interval`` commits so resolving a
snapshot reads one checkpoint + a handful of tail commits, never the
whole history. Footer-stat collection is O(files-per-commit) metadata
reads (what Delta gathers inside write tasks); file pruning for MERGE
uses a broadcast range-join of the (tiny) file-stats table against the
source keys, so the existing table is never scanned for files the
source cannot touch. Mirrors the reference's tmp→rename atomicity
(transforms.py:136-154) and insert-only MERGE (ddl_gold.sql:637),
extended to the full upsert/delete/compact surface the reference's
SQL-Server tier gets from its RDBMS.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Sequence

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_LOG_DIR = "_txn_log"
_DATA_DIR = "data"
_V_WIDTH = 20


class ConcurrentCommitError(RuntimeError):
    """A conflicting commit landed and the operation could not rebase."""


class SchemaMismatchError(ValueError):
    """Appended DataFrame schema does not match the table schema."""


# ---------------------------------------------------------------------------
# file statistics


def _stat_value(v: Any) -> Any:
    """JSON-encode a footer stat; ISO strings for temporal types keep
    lexicographic order == chronological order, so pruning can compare
    strings directly."""
    import datetime

    if isinstance(v, bool) or v is None:
        return None  # bool stats are useless for pruning; drop
    if isinstance(v, (int, float, str)):
        return v
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    # bytes, Decimal and exotic types: no stats → those columns are
    # simply never pruned (Decimal would need a scale-aware compare to
    # stay SOUND against lexicographic string order; cheaper to skip)
    return None


def _collect_file_stats(path: Path) -> dict[str, Any]:
    """rows/bytes/per-column min-max from the parquet footer — metadata
    only, no data pages are read."""
    md = pq.ParquetFile(path).metadata
    mins: dict[str, Any] = {}
    maxs: dict[str, Any] = {}
    nulls: dict[str, int] = {}
    for rg_i in range(md.num_row_groups):
        rg = md.row_group(rg_i)
        for c_i in range(rg.num_columns):
            col = rg.column(c_i)
            name = col.path_in_schema
            if "." in name:  # nested fields: skip, never pruned
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                mins[name] = maxs[name] = None
                continue
            lo, hi = _stat_value(st.min), _stat_value(st.max)
            if lo is None or hi is None:
                mins[name] = maxs[name] = None
                continue
            if name not in mins or (mins[name] is not None and lo < mins[name]):
                mins[name] = lo
            if name not in maxs or (maxs[name] is not None and hi > maxs[name]):
                maxs[name] = hi
            if st.null_count is not None:
                nulls[name] = nulls.get(name, 0) + st.null_count
    return {
        "rows": md.num_rows,
        "bytes": os.path.getsize(path),
        "min": {k: v for k, v in mins.items() if v is not None},
        "max": {k: v for k, v in maxs.items() if v is not None},
        "nulls": nulls,
    }


def _cmp_vals(a: Any, b: Any) -> int:
    """Compare two stat/predicate values of matching kind (numbers
    numerically, strings — incl. ISO temporals — lexicographically)."""
    return (a > b) - (a < b)


def _file_may_match(entry: dict, col: str, op: str, value: Any) -> bool:
    """Conservative skip test: True unless the footer stats PROVE no row
    in the file can satisfy ``col op value``. Missing stats → True."""
    import datetime

    def conv(v: Any) -> Any:
        if isinstance(v, (datetime.datetime, datetime.date)):
            return v.isoformat()
        return v

    lo = entry.get("stats", {}).get("min", {}).get(col)
    hi = entry.get("stats", {}).get("max", {}).get(col)
    if lo is None or hi is None:
        return True
    try:
        if op == "=":
            value = conv(value)
            return _cmp_vals(lo, value) <= 0 <= _cmp_vals(hi, value)
        if op in ("<", "<="):
            c = _cmp_vals(lo, conv(value))
            return c < 0 or (op == "<=" and c == 0)
        if op in (">", ">="):
            c = _cmp_vals(hi, conv(value))
            return c > 0 or (op == ">=" and c == 0)
        if op == "in":
            return any(
                _cmp_vals(lo, conv(v)) <= 0 <= _cmp_vals(hi, conv(v))
                for v in value
            )
    except TypeError:  # mixed kinds (e.g. int stat vs str predicate)
        return True
    return True


# ---------------------------------------------------------------------------
# bloom filter index (sidecar per data file, Delta-style)


def _bloom_params(n_keys: int, fpp: float) -> tuple[int, int]:
    """(m bits, k hashes) for n keys at the target false-positive
    rate — the textbook formulas, m rounded up to whole bytes."""
    import math

    n = max(1, n_keys)
    m = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = (m + 7) // 8 * 8
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _bloom_positions(value: str, m: int, k: int):
    import hashlib

    h = hashlib.md5(value.encode("utf-8")).digest()
    # double hashing: two 64-bit halves generate k positions
    h1 = int.from_bytes(h[:8], "big")
    h2 = int.from_bytes(h[8:], "big") | 1
    for i in range(k):
        yield (h1 + i * h2) % m


def _bloom_norm(v: Any) -> str:
    """One canonical string per value for hashing — datetime/date via
    isoformat so build-side (pyarrow) and probe-side (predicate)
    representations agree."""
    import datetime

    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return str(v)


def _bloom_build(values, fpp: float) -> dict:
    uniq = {_bloom_norm(v) for v in values if v is not None}
    m, k = _bloom_params(len(uniq), fpp)
    bits = bytearray(m // 8)
    for v in uniq:
        for pos in _bloom_positions(v, m, k):
            bits[pos >> 3] |= 1 << (pos & 7)
    import base64

    return {"m": m, "k": k, "b64": base64.b64encode(bytes(bits)).decode()}


def _bloom_might_contain(bloom: dict, value: Any) -> bool:
    import base64

    bits = base64.b64decode(bloom["b64"])
    return all(
        bits[pos >> 3] & (1 << (pos & 7))
        for pos in _bloom_positions(_bloom_norm(value), bloom["m"], bloom["k"])
    )


def _pred_to_column(c: str, op: str, v: Any):
    """One ``(col, op, value)`` predicate as a Spark Column."""
    col = F.col(c)
    if op == "=":
        return col == F.lit(v)
    if op == "<":
        return col < F.lit(v)
    if op == "<=":
        return col <= F.lit(v)
    if op == ">":
        return col > F.lit(v)
    if op == ">=":
        return col >= F.lit(v)
    if op == "in":
        return col.isin(list(v))
    raise ValueError(f"unsupported predicate op {op!r}")


# ---------------------------------------------------------------------------
# snapshot


@dataclass
class Snapshot:
    version: int
    ts_ms: int
    schema_json: str | None
    files: dict[str, dict] = field(default_factory=dict)  # rel path -> entry
    # per-stream high-water marks for exactly-once streaming writes:
    # stream_id -> highest batch_id whose commit is in this snapshot
    streams: dict[str, int] = field(default_factory=dict)

    @property
    def schema(self) -> T.StructType | None:
        if self.schema_json is None:
            return None
        return T.StructType.fromJson(json.loads(self.schema_json))

    def file_paths(self) -> list[str]:
        return sorted(self.files)

    def prune(self, predicates: Sequence[tuple[str, str, Any]]) -> list[str]:
        """File paths that may contain rows matching ALL predicates
        (each ``(col, op, value)``, op in = < <= > >= in)."""
        out = []
        for p in sorted(self.files):
            e = self.files[p]
            if all(_file_may_match(e, c, o, v) for c, o, v in predicates):
                out.append(p)
        return out


# ---------------------------------------------------------------------------
# the table


class TxnTable:
    def __init__(
        self,
        spark: SparkSession,
        root: str | Path,
        checkpoint_interval: int = 10,
        max_retries: int = 10,
        bloom_columns: Sequence[str] | None = None,
        bloom_fpp: float = 0.05,
    ) -> None:
        """``bloom_columns`` builds a per-file bloom filter for those
        columns at write time (sidecar ``<file>.bloom.json``), so
        point/``in`` predicates prune files even when the column is
        UNclustered — min/max stats can't help a high-cardinality id
        scattered across every file, a bloom can (Delta's bloom filter
        index). Filters apply to commits written by THIS instance;
        files written without them simply never bloom-prune."""
        self.spark = spark
        self.root = Path(root)
        self.checkpoint_interval = checkpoint_interval
        self.max_retries = max_retries
        self.bloom_columns = list(bloom_columns or [])
        self.bloom_fpp = bloom_fpp
        (self.root / _LOG_DIR).mkdir(parents=True, exist_ok=True)
        (self.root / _DATA_DIR).mkdir(parents=True, exist_ok=True)

    def _unlink_data(self, rel_path: str) -> None:
        (self.root / rel_path).unlink(missing_ok=True)
        (self.root / (rel_path + ".bloom.json")).unlink(missing_ok=True)

    # -- log plumbing -------------------------------------------------------

    def _log_path(self, version: int, checkpoint: bool = False) -> Path:
        suffix = ".checkpoint.json" if checkpoint else ".json"
        return self.root / _LOG_DIR / f"{version:0{_V_WIDTH}d}{suffix}"

    def _versions(self) -> list[int]:
        out = []
        for name in os.listdir(self.root / _LOG_DIR):
            stem = name.split(".")[0]
            if name.endswith(".json") and not name.endswith(
                ".checkpoint.json"
            ) and len(stem) == _V_WIDTH and stem.isdigit():
                out.append(int(stem))
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self._versions()
        return vs[-1] if vs else None

    def commit_info(self, version: int) -> dict:
        """The raw commit record for one version (metadata only)."""
        with open(self._log_path(version)) as f:
            return json.load(f)

    def history(self) -> list[dict]:
        """All commit records, oldest first (metadata only)."""
        out = []
        for v in self._versions():
            with open(self._log_path(v)) as f:
                rec = json.load(f)
            out.append(
                {k: rec[k] for k in ("version", "ts_ms", "op")}
                | {
                    "added": len(rec.get("add", [])),
                    "removed": len(rec.get("remove", [])),
                }
            )
        return out

    def snapshot(
        self, version: int | None = None, timestamp_ms: int | None = None
    ) -> Snapshot:
        """Resolve a stable view: latest checkpoint ≤ target, replay the
        tail commits. O(checkpoint_interval) log reads, not O(history)."""
        versions = self._versions()
        if not versions:
            return Snapshot(version=-1, ts_ms=0, schema_json=None)
        target = versions[-1] if version is None else version
        if timestamp_ms is not None:
            eligible = []
            for v in versions:
                with open(self._log_path(v)) as f:
                    if json.load(f)["ts_ms"] <= timestamp_ms:
                        eligible.append(v)
            if not eligible:
                raise ValueError("no commit at or before the given timestamp")
            target = eligible[-1]
        if target not in versions:
            raise ValueError(f"version {target} does not exist")

        start = 0
        snap = Snapshot(version=-1, ts_ms=0, schema_json=None)
        for v in reversed([x for x in versions if x <= target]):
            cp = self._log_path(v, checkpoint=True)
            if cp.exists():
                with open(cp) as f:
                    data = json.load(f)
                snap = Snapshot(
                    version=v,
                    ts_ms=data["ts_ms"],
                    schema_json=data.get("schema"),
                    files={e["path"]: e for e in data["files"]},
                    streams=dict(data.get("streams", {})),
                )
                start = v + 1
                break
        for v in [x for x in versions if start <= x <= target]:
            with open(self._log_path(v)) as f:
                rec = json.load(f)
            if rec.get("schema"):
                snap.schema_json = rec["schema"]
            if rec["op"] == "overwrite":
                snap.files = {}
            for p in rec.get("remove", []):
                snap.files.pop(p, None)
            for e in rec.get("add", []):
                snap.files[e["path"]] = e
            txn = rec.get("txn")
            if txn:
                prev = snap.streams.get(txn["stream_id"], -1)
                snap.streams[txn["stream_id"]] = max(prev, txn["batch_id"])
            snap.version = rec["version"]
            snap.ts_ms = rec["ts_ms"]
        return snap

    def _try_commit(self, record: dict) -> bool:
        """Put-if-absent publish of one commit. True on win, False when
        another writer took the version (caller rebases)."""
        dst = self._log_path(record["version"])
        tmp = self.root / _LOG_DIR / f".tmp-{uuid.uuid4().hex}.json"
        with open(tmp, "w") as f:
            json.dump(record, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, dst)  # atomic create-if-absent (POSIX)
            return True
        except FileExistsError:
            return False
        finally:
            tmp.unlink(missing_ok=True)

    def _maybe_checkpoint(self, snap_version: int) -> None:
        if (snap_version + 1) % self.checkpoint_interval != 0:
            return
        snap = self.snapshot(version=snap_version)
        cp = self._log_path(snap_version, checkpoint=True)
        tmp = self.root / _LOG_DIR / f".tmp-{uuid.uuid4().hex}.json"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "version": snap.version,
                    "ts_ms": snap.ts_ms,
                    "schema": snap.schema_json,
                    "files": [snap.files[p] for p in sorted(snap.files)],
                    "streams": snap.streams,
                },
                f,
            )
        tmp.rename(cp)  # checkpoints are derived — plain atomic replace

    # -- data-file plumbing -------------------------------------------------

    def _write_data_files(
        self,
        df: DataFrame,
        cluster_by: Sequence[str] | None = None,
        n_files: int | None = None,
        zorder_by: Sequence[str] | None = None,
    ) -> list[dict]:
        """Write ``df`` under a unique commit dir; return add-entries
        with footer stats. 0-row marker files are dropped here, so an
        empty merge adds NOTHING to the log (no marker-file drift).

        ``cluster_by`` range-partitions + sorts the rows so each output
        file owns a (nearly) disjoint key range — that is what makes
        the footer min/max stats surgical for data skipping and MERGE
        file pruning at scale (the liquid-clustering idea, minus the
        incremental re-clustering): a point predicate then touches ~1
        file instead of all of them."""
        commit_dir = self.root / _DATA_DIR / f"commit-{uuid.uuid4().hex[:12]}"
        drop_after_sort: str | None = None
        if zorder_by:
            from .zorder import ZCOL, with_zvalue

            df = with_zvalue(df, zorder_by)
            cols = [F.col(ZCOL)]
            drop_after_sort = ZCOL
        elif cluster_by:
            cols = [F.col(c) for c in cluster_by]
        if zorder_by or cluster_by:
            if n_files:  # explicit file count (AQE would coalesce tiny
                # range shuffles to 1 partition = 1 file otherwise)
                df = df.repartitionByRange(n_files, *cols)
            else:
                df = df.repartitionByRange(*cols)
            df = df.sortWithinPartitions(*cols)
            if drop_after_sort:
                df = df.drop(drop_after_sort)
        df.write.mode("overwrite").parquet(str(commit_dir))
        bloom_cols = [c for c in self.bloom_columns if c in df.columns]
        entries = []
        for p in sorted(commit_dir.rglob("*.parquet")):
            stats = _collect_file_stats(p)
            if stats["rows"] == 0:
                p.unlink()
                continue
            if bloom_cols:
                tbl = pq.read_table(p, columns=bloom_cols)
                blooms = {
                    c: _bloom_build(tbl.column(c).to_pylist(), self.bloom_fpp)
                    for c in bloom_cols
                }
                with open(f"{p}.bloom.json", "w") as bf:
                    json.dump(blooms, bf)
            entries.append(
                {
                    "path": str(p.relative_to(self.root)),
                    "rows": stats["rows"],
                    "bytes": stats["bytes"],
                    "stats": {
                        "min": stats["min"],
                        "max": stats["max"],
                        "nulls": stats["nulls"],
                    },
                }
            )
        return entries

    def _check_schema(
        self, df: DataFrame, snap: Snapshot, merge_schema: bool = False
    ) -> str | None:
        """Validate ``df`` against the table schema. With
        ``merge_schema`` (ADD-COLUMN evolution), extra columns in
        either direction are fine as long as shared columns type-match
        — parquet schema-on-read fills absences with NULL on both old
        and new files — and the WIDENED schema json is returned for
        the commit record. Returns None when the table schema already
        covers ``df``."""
        expected = snap.schema
        if expected is None:
            return None
        got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        want = {f.name: f.dataType.simpleString() for f in expected.fields}
        if got == want:
            return None
        shared_mismatch = {
            k for k in got.keys() & want.keys() if got[k] != want[k]
        }
        if shared_mismatch or not merge_schema:
            raise SchemaMismatchError(
                f"append schema {sorted(got.items())} != table schema "
                f"{sorted(want.items())}"
                + (
                    f"; type changed for {sorted(shared_mismatch)}"
                    if shared_mismatch
                    else "; pass merge_schema=True to add columns"
                )
                + "; use overwrite() for incompatible evolution"
            )
        new_fields = [
            f for f in df.schema.fields if f.name not in want
        ]
        if not new_fields:
            return None  # df is a SUBSET: table schema already covers it
        widened = T.StructType(list(expected.fields) + new_fields)
        return json.dumps(widened.jsonValue())

    # -- operations ---------------------------------------------------------

    def append(
        self,
        df: DataFrame,
        cluster_by: Sequence[str] | None = None,
        txn: tuple[str, int] | None = None,
        n_files: int | None = None,
        merge_schema: bool = False,
        zorder_by: Sequence[str] | None = None,
    ) -> int | None:
        """ACID append. Returns the committed version.

        ``txn=(stream_id, batch_id)`` makes the append IDEMPOTENT per
        stream: if a commit for this stream with ``batch_id`` (or
        higher) is already in the table, the append is a no-op
        returning None — the exactly-once contract a Structured
        Streaming ``foreachBatch`` replay needs (same idea as Delta's
        ``txnAppId``/``txnVersion``). The check re-runs against the
        head INSIDE the commit-race loop, so two racing replays of the
        same batch cannot both land.

        ``merge_schema=True`` allows ADD-COLUMN evolution: new columns
        widen the table schema in this commit; rows in older files
        read as NULL for them (schema-on-read), no rewrite."""
        if txn is not None and self._batch_seen(*txn):
            return None
        add = self._write_data_files(df, cluster_by, n_files, zorder_by)
        schema_json = json.dumps(df.schema.jsonValue())
        try:
            for _ in range(self.max_retries):
                head = self.latest_version()
                version = 0 if head is None else head + 1
                evolved: str | None = None
                if head is not None:
                    # re-check against the CURRENT head each attempt: a
                    # racing initial commit may have set a different
                    # schema than the one we validated before the race
                    evolved = self._check_schema(
                        df, self.snapshot(version=head), merge_schema
                    )
                    if txn is not None and self._batch_seen(*txn):
                        # a racing replay of the SAME batch won: drop
                        # our duplicate files, succeed as a no-op
                        for e in add:
                            self._unlink_data(e["path"])
                        return None
                rec = {
                    "version": version,
                    "ts_ms": int(time.time() * 1000),
                    "op": "append",
                    "add": add,
                    "remove": [],
                    "schema": schema_json if version == 0 else evolved,
                    "txn": (
                        {"stream_id": txn[0], "batch_id": txn[1]}
                        if txn is not None
                        else None
                    ),
                }
                if self._try_commit(rec):
                    self._maybe_checkpoint(version)
                    return version
                # lost the race: appends commute — rebase = re-number
        except SchemaMismatchError:
            for e in add:  # our files will never be referenced
                self._unlink_data(e["path"])
            raise
        raise ConcurrentCommitError(
            f"append lost {self.max_retries} commit races"
        )

    def _batch_seen(self, stream_id: str, batch_id: int) -> bool:
        if self.latest_version() is None:
            return False
        return self.snapshot().streams.get(stream_id, -1) >= batch_id

    def streaming_sink(self, stream_id: str, cluster_by=None):
        """``foreachBatch`` callable writing this stream into the table
        exactly once::

            (df.writeStream.option("checkpointLocation", ckpt)
               .foreachBatch(table.streaming_sink("my-stream")).start())

        Source-side replay (checkpoint restart re-delivering a batch)
        is absorbed by the per-stream batch high-water mark; sink-side
        atomicity by the commit log. Together with a replayable source
        that is end-to-end exactly-once."""

        def _sink(batch_df: DataFrame, batch_id: int) -> None:
            self.append(batch_df, cluster_by=cluster_by,
                        txn=(stream_id, int(batch_id)))

        return _sink

    def overwrite(
        self,
        df: DataFrame,
        cluster_by: Sequence[str] | None = None,
        n_files: int | None = None,
        zorder_by: Sequence[str] | None = None,
    ) -> int:
        """ACID full replace (schema may evolve)."""
        add = self._write_data_files(df, cluster_by, n_files, zorder_by)
        schema_json = json.dumps(df.schema.jsonValue())
        for _ in range(self.max_retries):
            head = self.latest_version()
            version = 0 if head is None else head + 1
            rec = {
                "version": version,
                "ts_ms": int(time.time() * 1000),
                "op": "overwrite",
                "add": add,
                "remove": [],
                "schema": schema_json,
            }
            if self._try_commit(rec):
                self._maybe_checkpoint(version)
                return version
        raise ConcurrentCommitError(
            f"overwrite lost {self.max_retries} commit races"
        )

    def read(
        self,
        version: int | None = None,
        timestamp_ms: int | None = None,
        predicates: Sequence[tuple[str, str, Any]] | None = None,
    ) -> DataFrame:
        """Snapshot read, optionally time-traveled, with file-level data
        skipping when ``predicates`` (``(col, op, value)``) are given.
        The predicates are ALSO applied row-level — skipping is purely a
        scan reduction, semantics are unchanged."""
        snap = self.snapshot(version=version, timestamp_ms=timestamp_ms)
        paths = (
            snap.prune(predicates) if predicates else snap.file_paths()
        )
        if predicates:
            paths = self._bloom_prune(paths, predicates)
        schema = snap.schema
        if not paths:
            if schema is None:
                raise ValueError("table has no commits yet")
            df = self.spark.createDataFrame([], schema)
        else:
            reader = self.spark.read
            if schema is not None:
                reader = reader.schema(schema)
            df = reader.parquet(*[str(self.root / p) for p in paths])
        if predicates:
            for c, op, v in predicates:
                df = df.filter(_pred_to_column(c, op, v))
        return df

    def restore(self, version: int) -> int:
        """Roll the table back to ``version`` — as a NEW commit, so
        history is preserved and nothing is deleted (the bad commits
        stay inspectable; VACUUM reclaims their files later). The
        standard bad-deploy recovery: readers flip to the restored
        state atomically."""
        target = self.snapshot(version=version)
        for _ in range(self.max_retries):
            head = self.latest_version()
            if head is None:
                raise ValueError("table has no commits yet")
            if head == version:
                return head  # already there
            head_snap = self.snapshot(version=head)
            rec = {
                "version": head + 1,
                "ts_ms": int(time.time() * 1000),
                "op": "restore",
                "add": [target.files[p] for p in sorted(target.files)],
                "remove": sorted(set(head_snap.files) - set(target.files)),
                "schema": target.schema_json,
            }
            if self._try_commit(rec):
                self._maybe_checkpoint(head + 1)
                return head + 1
        raise ConcurrentCommitError(
            f"restore lost {self.max_retries} commit races"
        )

    def read_appends(
        self, since_version: int, until_version: int | None = None
    ) -> DataFrame:
        """Rows ADDED by commits in ``(since_version, until_version]``
        — the incremental feed a downstream pipeline consumes instead
        of rescanning the table (reads ONLY the new commits' files,
        O(delta) not O(table)).

        Only ``append`` commits contribute rows. ``optimize`` commits
        in the range are ignored (logically no-ops). ``overwrite`` /
        ``delete`` / ``merge`` commits raise — they change existing
        rows, so an additive feed cannot represent them; consumers
        must re-sync from a snapshot at that point."""
        head = self.latest_version()
        if head is None:
            raise ValueError("table has no commits yet")
        until = head if until_version is None else until_version
        schema = self.snapshot(version=until).schema
        paths: list[str] = []
        for v in self._versions():
            if not (since_version < v <= until):
                continue
            rec = self.commit_info(v)
            if rec["op"] == "append":
                paths.extend(e["path"] for e in rec.get("add", []))
            elif rec["op"] == "optimize":
                continue
            else:
                raise ValueError(
                    f"version {v} is a {rec['op']!r} commit: the range "
                    "is not append-only; re-sync from a snapshot read"
                )
        if not paths:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(
            *[str(self.root / p) for p in paths]
        )

    def _bloom_prune(
        self, paths: list[str], predicates: Sequence[tuple[str, str, Any]]
    ) -> list[str]:
        """Drop files whose bloom sidecar PROVES a ``=``/``in``
        predicate value is absent. Files without a sidecar (written
        before blooms were configured) always survive."""
        eq_preds = [
            (c, op, v) for c, op, v in predicates if op in ("=", "in")
        ]
        if not eq_preds:
            return paths
        out = []
        for p in paths:
            side = self.root / (p + ".bloom.json")
            if not side.exists():
                out.append(p)
                continue
            with open(side) as f:
                blooms = json.load(f)
            keep = True
            for c, op, v in eq_preds:
                if c not in blooms:
                    continue
                vals = [v] if op == "=" else list(v)
                if not any(
                    _bloom_might_contain(blooms[c], x) for x in vals
                ):
                    keep = False
                    break
            if keep:
                out.append(p)
        return out

    # -- copy-on-write ops --------------------------------------------------

    def _affected_files_for_keys(
        self, snap: Snapshot, source: DataFrame, keys: Sequence[str]
    ) -> list[str]:
        """Files that MAY contain a source key — broadcast range-join of
        the (metadata-sized) file-stats table against the distinct
        source keys on the FIRST key column's min/max. Sound: a file
        whose k1-range misses every source k1 cannot match the full
        composite key. The existing table's data is never scanned.

        Soundness of the compare, by key type: integer kinds compare as
        LONG (exact), float kinds as DOUBLE, strings and DATEs
        lexicographically (DATE stats are ISO strings and Spark's
        string cast of a DATE is the same ``YYYY-MM-DD``). TIMESTAMP /
        DECIMAL / other keys skip pruning entirely (every file counts
        as affected) — Spark's timestamp string cast uses a space where
        ISO uses ``T``, so a lexicographic compare would be unsound."""
        k1 = keys[0]
        k1_type = dict((f.name, f.dataType) for f in source.schema.fields)[k1]
        if isinstance(
            k1_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
        ):
            cast_to = "bigint"
        elif isinstance(k1_type, (T.FloatType, T.DoubleType)):
            cast_to = "double"
        elif isinstance(k1_type, (T.StringType, T.DateType)):
            cast_to = "string"
        else:
            return snap.file_paths()
        ranges = []
        for p in snap.file_paths():
            e = snap.files[p]
            lo = e.get("stats", {}).get("min", {}).get(k1)
            hi = e.get("stats", {}).get("max", {}).get(k1)
            if lo is None or hi is None:
                ranges.append((p, None, None))  # no stats → always affected
            else:
                ranges.append((p, str(lo), str(hi)))
        statless = [p for p, lo, _ in ranges if lo is None]
        ranged = [(p, lo, hi) for p, lo, hi in ranges if lo is not None]
        if not ranged:
            return snap.file_paths()
        rdf = self.spark.createDataFrame(
            ranged,
            schema="__path string, __lo string, __hi string",
        )
        hits = (
            source.select(F.col(k1).cast(cast_to).alias("__k")).distinct()
            .join(
                F.broadcast(rdf),
                (F.col("__k") >= F.col("__lo").cast(cast_to))
                & (F.col("__k") <= F.col("__hi").cast(cast_to)),
            )
            .select("__path")
            .distinct()
        )
        affected = [r["__path"] for r in hits.collect()]  # O(#files) rows
        return sorted(set(affected) | set(statless))

    def merge_upsert(
        self,
        source: DataFrame,
        keys: Sequence[str],
        cluster_by: Sequence[str] | None = None,
    ) -> dict:
        """MERGE: WHEN MATCHED UPDATE SET * / WHEN NOT MATCHED INSERT *
        — the common upsert; see ``merge`` for the full clause surface."""
        return self.merge(
            source,
            keys,
            when_matched="update",
            when_not_matched="insert",
            cluster_by=cluster_by,
        )

    def merge(
        self,
        source: DataFrame,
        keys: Sequence[str],
        when_matched: str | None = "update",
        when_not_matched: str | None = "insert",
        cluster_by: Sequence[str] | None = None,
    ) -> dict:
        """Full MERGE clause surface over copy-on-write rewrites:

        - ``when_matched``: ``"update"`` (replace the target row with
          the source row), ``"delete"`` (drop the matched target row),
          or None (leave matched target rows untouched);
        - ``when_not_matched``: ``"insert"`` (add source rows with no
          target match) or None (drop them).

        Only files whose key range can intersect the source are
        rewritten; every other file carries over by reference. Beyond
        the reference's insert-only MERGE (ddl_gold.sql:637) — this is
        the surface its RDBMS tier gets from T-SQL MERGE. ``source``
        must be unique on ``keys``.

        ``cluster_by`` (typically ``keys``) range-clusters the rewrite
        output so repeated merges keep file key-ranges disjoint — the
        prune set stays small instead of widening merge over merge.
        """
        if when_matched not in ("update", "delete", None):
            raise ValueError(f"when_matched={when_matched!r}")
        if when_not_matched not in ("insert", None):
            raise ValueError(f"when_not_matched={when_not_matched!r}")
        if when_matched is None and when_not_matched is None:
            raise ValueError("at least one MERGE clause is required")
        last_err: Exception | None = None
        for _ in range(self.max_retries):
            head = self.latest_version()
            if head is None:
                if when_not_matched == "insert":
                    v = self.append(source, cluster_by)
                    return {
                        "version": v, "rewritten_files": 0, "kept_files": 0,
                    }
                raise ValueError("table has no commits yet")
            snap = self.snapshot(version=head)
            self._check_schema(source, snap)
            affected = self._affected_files_for_keys(snap, source, keys)
            cols = [f.name for f in snap.schema.fields]
            src_keys = source.select(*keys).distinct()
            if when_matched is None:
                # insert-only MERGE: no target row changes, so nothing
                # is rewritten — the anti-join'd new rows just APPEND
                # (the reference's own MERGE semantics, zero-copy here)
                if affected:
                    existing = self.spark.read.schema(snap.schema).parquet(
                        *[str(self.root / p) for p in affected]
                    ).select(*keys)
                    new_rows = source.join(existing, list(keys), "left_anti")
                else:
                    new_rows = source
                v = self.append(new_rows.select(*cols), cluster_by)
                return {
                    "version": v,
                    "rewritten_files": 0,
                    "kept_files": len(snap.files),
                }
            if affected:
                target = self.spark.read.schema(snap.schema).parquet(
                    *[str(self.root / p) for p in affected]
                )
                # target rows with no source match always survive
                pieces = [
                    target.join(src_keys, list(keys), "left_anti")
                    .select(*cols)
                ]
                if when_matched == "update":
                    # the matched keys' new image is the source row
                    pieces.append(
                        source.join(
                            target.select(*keys).distinct(),
                            list(keys),
                            "left_semi",
                        ).select(*cols)
                    )
                # when_matched == "delete": matched target rows vanish —
                # nothing to add for them
                if when_not_matched == "insert":
                    pieces.append(
                        source.join(
                            target.select(*keys).distinct(),
                            list(keys),
                            "left_anti",
                        ).select(*cols)
                    )
                merged = pieces[0]
                for piece in pieces[1:]:
                    merged = merged.unionByName(piece)
            else:
                if when_not_matched != "insert":
                    return {  # no file can match and inserts are off
                        "version": head,
                        "rewritten_files": 0,
                        "kept_files": len(snap.files),
                    }
                merged = source.select(*cols)
            add = self._write_data_files(merged, cluster_by)
            rec = {
                "version": head + 1,
                "ts_ms": int(time.time() * 1000),
                "op": "merge",
                "add": add,
                "remove": affected,
                "schema": None,
            }
            if self.latest_version() == head and self._try_commit(rec):
                self._maybe_checkpoint(head + 1)
                return {
                    "version": head + 1,
                    "rewritten_files": len(affected),
                    "kept_files": len(snap.files) - len(affected),
                }
            # a commit landed mid-rewrite: our remove-set may be stale —
            # recompute the whole op from the new head
            for e in add:  # orphaned rewrite output: unreference eagerly
                self._unlink_data(e["path"])
            last_err = ConcurrentCommitError("merge rebased")
        raise ConcurrentCommitError(
            f"merge lost {self.max_retries} commit races"
        ) from last_err

    def delete_where(
        self, predicates: Sequence[tuple[str, str, Any]]
    ) -> dict:
        """DELETE via copy-on-write: stats-pruned candidate files are
        rewritten without the matching rows; all other files carry over
        untouched (their bytes are provably predicate-free)."""
        for _ in range(self.max_retries):
            head = self.latest_version()
            if head is None:
                raise ValueError("table has no commits yet")
            snap = self.snapshot(version=head)
            candidates = snap.prune(predicates)
            if not candidates:
                return {"version": head, "rewritten_files": 0, "deleted_rows": 0}
            df = self.spark.read.schema(snap.schema).parquet(
                *[str(self.root / p) for p in candidates]
            )
            cond = F.lit(True)
            for c, op, v in predicates:
                cond = cond & _pred_to_column(c, op, v)
            kept = df.filter(~F.coalesce(cond, F.lit(False)))
            add = self._write_data_files(kept)
            before = sum(snap.files[p]["rows"] for p in candidates)
            after = sum(e["rows"] for e in add)
            rec = {
                "version": head + 1,
                "ts_ms": int(time.time() * 1000),
                "op": "delete",
                "add": add,
                "remove": candidates,
                "schema": None,
            }
            if self.latest_version() == head and self._try_commit(rec):
                self._maybe_checkpoint(head + 1)
                return {
                    "version": head + 1,
                    "rewritten_files": len(candidates),
                    "deleted_rows": before - after,
                }
            for e in add:
                self._unlink_data(e["path"])
        raise ConcurrentCommitError(
            f"delete_where lost {self.max_retries} commit races"
        )

    def optimize(
        self,
        target_file_bytes: int = 128 * 1024 * 1024,
        cluster_by: Sequence[str] | None = None,
        zorder_by: Sequence[str] | None = None,
    ) -> dict:
        """Bin-pack small files into ~target-size files (compaction).
        Logically a no-op; physically collapses the small-file tail that
        incremental merges accumulate. At 100 TB this is the routine
        maintenance op that keeps scan task counts sane. ``cluster_by``
        additionally re-sorts the compacted rows by key so the rewrite
        restores disjoint file key-ranges (re-clustering pass);
        ``zorder_by`` Morton-clusters instead (OPTIMIZE ZORDER BY) so
        skipping works on every listed column."""
        for _ in range(self.max_retries):
            head = self.latest_version()
            if head is None:
                raise ValueError("table has no commits yet")
            snap = self.snapshot(version=head)
            small = [
                p
                for p in snap.file_paths()
                if snap.files[p]["bytes"] < target_file_bytes
            ]
            if len(small) < 2:
                return {"version": head, "compacted_files": 0}
            total = sum(snap.files[p]["bytes"] for p in small)
            n_out = max(1, round(total / target_file_bytes))
            df = self.spark.read.schema(snap.schema).parquet(
                *[str(self.root / p) for p in small]
            )
            if zorder_by or cluster_by:
                add = self._write_data_files(
                    df, cluster_by, n_files=n_out, zorder_by=zorder_by
                )
            else:
                add = self._write_data_files(df.coalesce(n_out))
            rec = {
                "version": head + 1,
                "ts_ms": int(time.time() * 1000),
                "op": "optimize",
                "add": add,
                "remove": small,
                "schema": None,
            }
            if self.latest_version() == head and self._try_commit(rec):
                self._maybe_checkpoint(head + 1)
                return {"version": head + 1, "compacted_files": len(small)}
            for e in add:
                self._unlink_data(e["path"])
        raise ConcurrentCommitError(
            f"optimize lost {self.max_retries} commit races"
        )

    def vacuum(self, retain_last: int = 2, min_age_s: float = 3600.0) -> dict:
        """Delete data files referenced by NO retained version. The last
        ``retain_last`` versions stay time-travelable; older versions'
        exclusive files are reclaimed. Log records are kept (tiny).

        ``min_age_s`` protects files an IN-FLIGHT writer has landed but
        not yet committed (they are unreferenced until its log record
        publishes) — same retention-window discipline as Delta's
        VACUUM. Tests pass 0 for determinism."""
        versions = self._versions()
        if not versions:
            return {"deleted_files": 0}
        retained = versions[-max(1, retain_last):]
        referenced: set[str] = set()
        for v in retained:
            referenced |= set(self.snapshot(version=v).files)
        deleted = 0
        cutoff = time.time() - min_age_s
        for p in sorted((self.root / _DATA_DIR).rglob("*.parquet")):
            rel = str(p.relative_to(self.root))
            if rel not in referenced and p.stat().st_mtime <= cutoff:
                self._unlink_data(rel)
                deleted += 1
        for d in sorted(
            (self.root / _DATA_DIR).glob("commit-*"), reverse=True
        ):
            if d.is_dir() and not any(d.iterdir()):
                d.rmdir()
        return {"deleted_files": deleted, "retained_versions": retained}
