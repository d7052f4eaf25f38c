"""Property-based SCD2 invariants (hypothesis): for ANY sequence of
snapshot batches applied in date order, the dimension must maintain:

1. exactly one current version per business key;
2. non-overlapping, gap-free validity windows per key
   (next.valid_from == prev.valid_to + 1 day);
3. the current version reflects the latest applied attributes
   (ignoring stale-skipped and same-day-enriched subtleties, which
   are asserted separately in test_gold);
4. version SKs are unique.

Run counts are kept small — each scd2_upsert is a Spark job.
"""

from __future__ import annotations

from datetime import date, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_lakehouse_movilidad_publica_santiago_spark.gold import dims as D
from data_lakehouse_movilidad_publica_santiago_spark.gold.store import GoldStore

BKS = ["A", "B", "C"]
VALUES = ["x", "y", "z"]

# a batch: {bk: attr_value} for a random subset of keys
batch_strategy = st.dictionaries(
    st.sampled_from(BKS), st.sampled_from(VALUES), min_size=1, max_size=3
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=st.lists(batch_strategy, min_size=1, max_size=4))
def test_scd2_invariants(spark, tmp_path_factory, batches):
    store = GoldStore(spark, tmp_path_factory.mktemp("dw"))
    base = date(2025, 1, 1)
    latest: dict[str, str] = {}
    for i, batch in enumerate(batches):
        snap = spark.createDataFrame(
            [(bk, val) for bk, val in sorted(batch.items())],
            "stop_code string, comuna string",
        )
        event = base + timedelta(days=i * 3)
        D.scd2_upsert(
            store, "dim_stop", "stop_code", ["comuna"], snap, event, "stop_sk"
        )
        latest.update(batch)

    rows = store.read("dim_stop").collect()

    # (4) version SKs unique
    sks = [r["stop_sk"] for r in rows]
    assert len(sks) == len(set(sks))

    by_bk: dict[str, list] = {}
    for r in rows:
        by_bk.setdefault(r["stop_code"], []).append(r)

    for bk, versions in by_bk.items():
        versions.sort(key=lambda r: r["valid_from"])
        current = [v for v in versions if v["is_current"]]
        # (1) exactly one current version
        assert len(current) == 1, (bk, versions)
        assert current[0]["valid_to"] is None
        # (2) contiguous non-overlapping windows
        for prev, nxt in zip(versions, versions[1:]):
            assert prev["valid_to"] is not None
            assert prev["valid_to"] == nxt["valid_from"] - timedelta(days=1)
        # (3) current attrs = last applied value for this bk
        assert current[0]["comuna"] == latest[bk]
        # consecutive versions must actually differ (no no-op versions)
        hashes = [v["row_hash"] for v in versions]
        assert all(a != b for a, b in zip(hashes, hashes[1:]))
