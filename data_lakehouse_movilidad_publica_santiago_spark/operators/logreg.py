"""Distributed logistic-regression trainer/scorer.

The learned-quality-classifier shape (the fastText/DSIR-style screen
that replaces hand thresholds once labels exist): batch gradient
descent over a feature DataFrame, expressed Spark-first —

- Weights live on the DRIVER (a handful of doubles) and fold into
  the scoring expression as literals: the per-row margin
  ``z = w0·1 + w1·x1 + …`` is ONE fixed left-to-right expression
  tree (codegen, bit-reproducible — the k-means discipline).
- Each GD iteration is ONE aggregate pass: ``grad_j =
  avg((sigmoid(z) − y)·x_j)`` for every feature in a single
  ``agg`` — map-side partials, a driver-sized result.
- Updated weights are ROUNDed to 6 decimals per iteration, so
  sum-order ulp drift in the averages cannot compound and a
  relational oracle can replay the whole optimization exactly.

At 100 TB: training is ``iters`` scans with nothing but k+1 doubles
ever reaching the driver; scoring is a pure map stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .kmeans import _dlit


def _z_sql(weights: list[float], feature_cols: list[str]) -> str:
    """Fixed-order margin: w0 (bias) + w1*f1 + … — left-to-right."""
    terms = [f"({_dlit(weights[0])})"]
    terms += [
        f"({_dlit(w)}) * CAST({c} AS DOUBLE)"
        for w, c in zip(weights[1:], feature_cols)
    ]
    return " + ".join(terms)


def _sigmoid_sql(z: str) -> str:
    return f"(1.0D / (1.0D + EXP(-({z}))))"


def logreg_fit(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 3,
    lr: float = 1.0,
    init: list[float] | None = None,
) -> list[float]:
    """Train with ``iters`` full-batch GD steps; returns the weight
    vector [bias, w_1, …, w_k], every entry rounded to 6 decimals.
    Features should be roughly unit-scale (ratios, or counts divided
    by a typical magnitude) — this is plain GD, not LBFGS."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1 (got {iters})")
    k = len(feature_cols)
    w = [float(x) for x in (init or [0.0] * (k + 1))]
    if len(w) != k + 1:
        raise ValueError(f"init must have {k + 1} entries (bias first)")
    for _ in range(iters):
        p = F.expr(_sigmoid_sql(_z_sql(w, feature_cols)))
        err = p - F.col(label_col).cast("double")
        row = df.agg(
            F.round(F.avg(err), 6).alias("g0"),
            *[
                F.round(F.avg(err * F.col(c).cast("double")), 6).alias(f"g{j + 1}")
                for j, c in enumerate(feature_cols)
            ],
        ).collect()[0]
        if row["g0"] is None:
            raise ValueError("logreg_fit: empty training set")
        w = [
            round(w[j] - lr * row[f"g{j}"], 6)
            for j in range(k + 1)
        ]
    return w


def logreg_score(
    df: DataFrame,
    weights: list[float],
    feature_cols: list[str],
    out_col: str = "p",
) -> DataFrame:
    """Add ``out_col``: the predicted probability, rounded to 4 — a
    pure map stage against literal weights."""
    p = F.expr(_sigmoid_sql(_z_sql(weights, feature_cols)))
    return df.withColumn(out_col, F.round(p, 4))
