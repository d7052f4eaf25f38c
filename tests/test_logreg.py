"""Unit tests for the distributed logistic-regression trainer: one
hand-computed GD step, separation on crafted data, arg validation."""

from __future__ import annotations

import math

import pytest

from data_lakehouse_movilidad_publica_santiago_spark.operators.logreg import (
    logreg_fit,
    logreg_score,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, f double, label double")


class TestLogReg:
    def test_hand_computed_first_step(self, spark):
        df = _df(spark, [(1, 1.0, 1.0), (2, 0.0, 0.0)])
        w = logreg_fit(df, ["f"], "label", iters=1, lr=1.0)
        # p0 = 0.5 everywhere; g_bias = avg(0.5-1, 0.5-0) = 0;
        # g_f = avg(-0.5*1, 0.5*0) = -0.25
        assert w == [0.0, 0.25]

    def test_scoring_matches_sigmoid(self, spark):
        df = _df(spark, [(1, 1.0, 1.0)])
        out = logreg_score(df, [0.0, 0.25], ["f"]).collect()[0]
        assert out["p"] == round(1 / (1 + math.exp(-0.25)), 4)

    def test_learns_separable_data(self, spark):
        rows = [(i, 1.0, 1.0) for i in range(10)] + [
            (100 + i, 0.0, 0.0) for i in range(10)
        ]
        df = _df(spark, rows)
        w = logreg_fit(df, ["f"], "label", iters=50, lr=2.0)
        scored = {r["doc_id"]: r["p"] for r in logreg_score(df, w, ["f"]).collect()}
        assert all(scored[i] > 0.5 for i in range(10))
        assert all(scored[100 + i] < 0.5 for i in range(10))

    def test_weights_are_six_decimal_pinned(self, spark):
        df = _df(spark, [(1, 0.3, 1.0), (2, 0.7, 0.0), (3, 0.1, 1.0)])
        w = logreg_fit(df, ["f"], "label", iters=3, lr=0.7)
        assert all(x == round(x, 6) for x in w)

    def test_bad_args_rejected(self, spark):
        df = _df(spark, [(1, 1.0, 1.0)])
        with pytest.raises(ValueError, match="iters"):
            logreg_fit(df, ["f"], "label", iters=0)
        with pytest.raises(ValueError, match="init"):
            logreg_fit(df, ["f"], "label", init=[0.0])

    def test_explicit_init_respected(self, spark):
        df = _df(spark, [(1, 1.0, 1.0), (2, 0.0, 0.0)])
        w = logreg_fit(df, ["f"], "label", iters=1, lr=0.0, init=[0.5, -1.5])
        assert w == [0.5, -1.5]  # lr=0: weights unchanged
