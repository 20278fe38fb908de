"""Logistic-regression trainer (operators/regression.py): exact
trajectory parity with an independent numpy reference implementing
the same fixed-point contract, loss decrease, and native-expression
inference."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from reddit_hn_etl_spark.operators.regression import (
    logistic_predict,
    logistic_regression_gd,
)


def _reference_gd(x, y, lr=0.25, iters=3, fp_bits=20):
    """Numpy twin of the documented arithmetic: per-row contributions
    snapped to the 2^-fp_bits grid, exact integer sums, identical
    IEEE update chain."""
    scale = float(1 << fp_bits)
    n, d = x.shape
    w = np.zeros(d + 1)
    for _ in range(iters):
        z = w[0] + x @ w[1:]
        p = 1.0 / (1.0 + np.exp(-z))
        err = p - y
        g = [np.floor(err * scale + 0.5).astype(np.int64).sum()]
        for j in range(d):
            g.append(
                np.floor(err * x[:, j] * scale + 0.5).astype(np.int64).sum()
            )
        w = np.array([w[k] - lr * ((g[k] / scale) / n) for k in range(d + 1)])
    return w


@pytest.fixture()
def synth(spark):
    rng = np.random.default_rng(21)
    n = 4000
    # grid-rational features: integers / powers of two
    x1 = rng.integers(0, 4096, size=n) / 4096.0
    x2 = rng.integers(0, 256, size=n) / 64.0
    logits = -1.0 + 3.0 * x1 - 0.5 * x2
    y = (rng.random(n) < 1.0 / (1.0 + np.exp(-logits))).astype(np.int64)
    df = spark.createDataFrame(
        [(float(a), float(b), int(c)) for a, b, c in zip(x1, x2, y)],
        "x1 double, x2 double, y long",
    )
    return df, np.stack([x1, x2], axis=1), y.astype(np.float64)


def test_trajectory_matches_numpy_reference_exactly(synth):
    df, x, y = synth
    w_spark, n = logistic_regression_gd(df, ["x1", "x2"], "y", iters=3)
    w_ref = _reference_gd(x, y, iters=3)
    assert n == len(y)
    # exact integer sums + identical IEEE chains => bit equality
    assert w_spark == list(w_ref)


def test_loss_decreases_and_learns_signal(synth):
    df, x, y = synth

    def loss(w):
        z = w[0] + x @ np.asarray(w[1:])
        p = 1.0 / (1.0 + np.exp(-z))
        eps = 1e-12
        return float(-(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)).mean())

    w0 = [0.0, 0.0, 0.0]
    w3, _ = logistic_regression_gd(df, ["x1", "x2"], "y", iters=3)
    w10, _ = logistic_regression_gd(df, ["x1", "x2"], "y", iters=10)
    assert loss(w3) < loss(w0)
    assert loss(w10) < loss(w3)
    # gradient direction recovered: positive x1 effect, negative x2
    assert w10[1] > 0 and w10[2] < 0


def test_native_inference_matches_training_probabilities(synth):
    df, x, y = synth
    w, _ = logistic_regression_gd(df, ["x1", "x2"], "y", iters=3)
    z = F.lit(w[0]) + F.lit(w[1]) * F.col("x1") + F.lit(w[2]) * F.col("x2")
    got = df.select(logistic_predict(z).alias("p")).agg(
        F.sum("p").alias("s")
    ).collect()[0]["s"]
    zr = w[0] + x @ np.asarray(w[1:])
    want = float((1.0 / (1.0 + np.exp(-zr))).sum())
    assert math.isclose(got, want, rel_tol=1e-9)


def test_empty_input_raises(spark):
    df = spark.createDataFrame([], "x1 double, y long")
    with pytest.raises(ValueError, match="empty"):
        logistic_regression_gd(df, ["x1"], "y", iters=1)
