"""Distributed trainers for the curation pipeline's scoring models.

``lineitem_ridge_regression`` (plans/queries.py) covers the
closed-form linear case; this module adds the iterative one —
logistic regression by full-batch gradient descent, the standard
in-engine way to train a document QUALITY CLASSIFIER (the
CCNet/GPT-3-style curation step: engineered features → probability
of "good" text) without leaving Spark.

Spark shape: each iteration is ONE map-side-combinable scalar
aggregation of the per-feature gradient; the weight vector (a few
doubles) updates on the driver and re-enters the next plan as
LITERALS, so every pass is whole-stage-codegen native expressions —
no UDF, no per-row Python. Cost per iteration = one scan + one
1-row reduce, identical at 100 TB.

Determinism contract (the repo-wide fixed-point idiom): each row's
gradient contribution is snapped to the 2^-fp_bits grid
(``FLOOR(x * 2^fp_bits + 0.5)`` → BIGINT) before the sum, so the
reduction is an exact integer in any order and any partitioning;
with grid-rational features (integers divided by powers of two) the
weight trajectory is bit-reproducible across engines — the DuckDB
twin in tests/plans computes the identical trajectory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def logistic_regression_gd(
    df: DataFrame,
    feature_cols: list,
    label_col,
    lr: float = 0.25,
    iters: int = 3,
    fp_bits: int = 20,
) -> tuple[list[float], int]:
    """Full-batch gradient descent for logistic regression.

    ``feature_cols`` are column names or Columns (pre-scaled —
    divide by powers of TWO to keep them grid-rational);
    ``label_col`` must evaluate to 0/1. Returns (weights, n) with
    weights = [bias, w_1, ..., w_d] after ``iters`` steps from zero
    init: w ← w − lr · Σ(σ(w·x) − y)·x / n, every Σ an exact
    fixed-point integer.

    The one driver-side ``collect`` per iteration is a 1-row scalar
    aggregate (d+2 numbers) — bounded by construction.
    """
    feats = [F.col(c) if isinstance(c, str) else c for c in feature_cols]
    label = (
        F.col(label_col) if isinstance(label_col, str) else label_col
    ).cast("double")
    scale = float(1 << fp_bits)
    w = [0.0] * (len(feats) + 1)
    n = 0
    for _ in range(iters):
        z = F.lit(w[0])
        for wj, x in zip(w[1:], feats):
            z = z + F.lit(wj) * x
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        err = p - label
        aggs = [
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.floor(err * F.lit(scale) + F.lit(0.5)).cast("long")
            ).alias("g0"),
        ]
        for j, x in enumerate(feats):
            aggs.append(
                F.sum(
                    F.floor(err * x * F.lit(scale) + F.lit(0.5)).cast("long")
                ).alias(f"g{j + 1}")
            )
        row = df.agg(*aggs).collect()[0]
        n = int(row["n"])
        if n == 0:
            raise ValueError("logistic_regression_gd: empty input")
        w = [
            w[k] - lr * ((row[f"g{k}"] / scale) / n)
            for k in range(len(w))
        ]
    return w, n


def logistic_predict(z: Column) -> Column:
    """σ(z) as a native expression — apply trained literal weights
    for in-plan scoring (the classifier inference is a projection,
    never a join or UDF)."""
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
