"""Model-based check of the transactional table: random op sequences
(append / upsert / delete / optimize / restore) applied in parallel to
a TxnTable and to a plain in-memory dict model must always agree — and
every recorded version must stay time-travelable to its model state.
Small bounded sequences (Spark ops are ~1s each), but Hypothesis
explores the op-interleaving space far better than hand-written
cases."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_lakehouse_movilidad_publica_santiago_spark.lake import TxnTable

KEYS = list(range(6))  # small key space → collisions are common

op_strategy = st.lists(
    st.one_of(
        st.tuples(
            st.just("append"),
            st.lists(st.sampled_from(KEYS), min_size=1, max_size=3,
                     unique=True),
        ),
        st.tuples(
            st.just("upsert"),
            st.lists(st.sampled_from(KEYS), min_size=1, max_size=3,
                     unique=True),
        ),
        st.tuples(st.just("delete_lt"), st.sampled_from(KEYS)),
        st.tuples(st.just("optimize"), st.just(None)),
        st.tuples(st.just("restore"), st.just(None)),
    ),
    min_size=1,
    max_size=6,
)


@pytest.mark.slow
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(ops=op_strategy)
@pytest.mark.slow  # 20-40 s; VERDICT r12 item 1 (default-run budget)
def test_txn_table_matches_dict_model(spark, tmp_path_factory, ops):
    tmp = tmp_path_factory.mktemp("txn_model")
    t = TxnTable(spark, tmp / "t")
    model: dict[int, str] = {}
    # model state per COMMITTED version (ops may be no-ops that add no
    # commit, so key by the table's own version counter)
    by_version: dict[int, dict[int, str]] = {}
    tag = 0

    def df_for(keys):
        return spark.createDataFrame(
            [(k, f"v{tag}_{k}") for k in keys], "k int, v string"
        )

    def record():
        by_version[t.latest_version()] = dict(model)

    t.append(df_for([0]))  # version 0 always exists
    model[0] = f"v{tag}_0"
    record()

    for op, arg in ops:
        tag += 1
        if op == "append":
            # appends would duplicate keys; restrict to NEW keys so the
            # model stays a dict (duplicate handling is merge's job)
            new = [k for k in arg if k not in model]
            if not new:
                continue
            t.append(df_for(new))
            for k in new:
                model[k] = f"v{tag}_{k}"
        elif op == "upsert":
            t.merge_upsert(df_for(arg), keys=["k"])
            for k in arg:
                model[k] = f"v{tag}_{k}"
        elif op == "delete_lt":
            t.delete_where([("k", "<", arg)])
            model = {k: v for k, v in model.items() if not k < arg}
        elif op == "optimize":
            t.optimize(target_file_bytes=64 * 1024 * 1024)  # logical no-op
        elif op == "restore":
            target = sorted(by_version)[len(by_version) >> 1]
            t.restore(target)
            model = dict(by_version[target])
        record()

        got = {(r["k"], r["v"]) for r in t.read().collect()}
        assert got == set(model.items()), f"after {op}({arg})"

    # every recorded version is still exactly time-travelable
    for v, state in sorted(by_version.items()):
        got = {(r["k"], r["v"]) for r in t.read(version=v).collect()}
        assert got == set(state.items()), f"time travel to v{v}"
