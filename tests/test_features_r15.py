"""Round-15 logistic probe: IRLS vs an independent NumPy Newton
implementation, per-group fits, ridge, and degenerate inputs."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lindel_spark.features import logistic_fit


def _numpy_irls(X, y, rounds, ridge=0.0):
    n, d = X.shape
    Xi = np.hstack([np.ones((n, 1)), X])
    beta = np.zeros(d + 1)
    for _ in range(rounds):
        z = Xi @ beta
        p = 1.0 / (1.0 + np.exp(-z))
        w = p * (1.0 - p)
        A = Xi.T @ (Xi * w[:, None])
        A[1:, 1:] += ridge * np.eye(d)
        g = Xi.T @ (y - p)
        beta = beta + np.linalg.solve(A, g)
    return beta


def _mkdf(spark, X, y):
    rows = [(float(y[i]),) + tuple(float(v) for v in X[i])
            for i in range(len(y))]
    cols = "y double, " + ", ".join(
        f"x{j} double" for j in range(X.shape[1]))
    return spark.createDataFrame(rows, cols)


def test_logistic_matches_numpy_irls(spark):
    rng = np.random.RandomState(7)
    n = 400
    X = rng.randn(n, 2)
    z = -0.5 + 1.2 * X[:, 0] - 0.8 * X[:, 1]
    y = (rng.rand(n) < 1.0 / (1.0 + np.exp(-z))).astype(float)
    want = _numpy_irls(X, y, rounds=4)
    got = logistic_fit(_mkdf(spark, X, y), "y", ["x0", "x1"],
                       rounds=4).collect()[0]
    assert got.n == n
    assert got.intercept == pytest.approx(want[0], abs=1e-8)
    assert got["coef_x0"] == pytest.approx(want[1], abs=1e-8)
    assert got["coef_x1"] == pytest.approx(want[2], abs=1e-8)
    assert got.step_norm < 1e-4  # converged


def test_logistic_ridge_matches_numpy(spark):
    rng = np.random.RandomState(3)
    n = 200
    X = rng.randn(n, 1)
    y = (X[:, 0] + 0.3 * rng.randn(n) > 0).astype(float)
    want = _numpy_irls(X, y, rounds=5, ridge=2.0)
    got = logistic_fit(_mkdf(spark, X, y), "y", ["x0"],
                       rounds=5, ridge=2.0).collect()[0]
    assert got.intercept == pytest.approx(want[0], abs=1e-8)
    assert got["coef_x0"] == pytest.approx(want[1], abs=1e-8)


def test_logistic_per_group(spark):
    rng = np.random.RandomState(11)
    frames = []
    wants = {}
    for g, slope in (("a", 2.0), ("b", -1.5)):
        X = rng.randn(150, 1)
        y = (rng.rand(150)
             < 1.0 / (1.0 + np.exp(-slope * X[:, 0]))).astype(float)
        wants[g] = _numpy_irls(X, y, rounds=4)
        frames.append(_mkdf(spark, X, y).withColumn("g", F.lit(g)))
    df = frames[0].unionByName(frames[1])
    out = {r.g: r for r in logistic_fit(
        df, "y", ["x0"], rounds=4, keys="g").collect()}
    for g in ("a", "b"):
        assert out[g]["coef_x0"] == pytest.approx(wants[g][1],
                                                  abs=1e-8)


def test_logistic_constant_feature_null(spark):
    df = spark.createDataFrame(
        [(1.0, 5.0), (0.0, 5.0), (1.0, 5.0), (0.0, 5.0)],
        "y double, x0 double")
    r = logistic_fit(df, "y", ["x0"], rounds=3).collect()[0]
    assert r.n == 4 and r.intercept is None and r["coef_x0"] is None


def test_logistic_validates(spark):
    df = spark.createDataFrame([(1.0, 1.0)], "y double, x0 double")
    with pytest.raises(ValueError):
        logistic_fit(df, "y", [])
    with pytest.raises(ValueError):
        logistic_fit(df, "y", ["x0"], rounds=0)
    with pytest.raises(ValueError):
        logistic_fit(df, "y", ["x0"], ridge=-1.0)


def test_logistic_null_rows_excluded(spark):
    rng = np.random.RandomState(5)
    X = rng.randn(100, 1)
    y = (X[:, 0] > 0).astype(float)
    df = _mkdf(spark, X, y)
    dirty = df.unionByName(spark.createDataFrame(
        [(None, 1.0), (1.0, None)], "y double, x0 double"))
    a = logistic_fit(df, "y", ["x0"], rounds=3).collect()[0]
    b = logistic_fit(dirty, "y", ["x0"], rounds=3).collect()[0]
    assert a.n == b.n == 100
    assert b["coef_x0"] == pytest.approx(a["coef_x0"], abs=0.0)


def test_logistic_reserved_column_guard(spark):
    df = spark.createDataFrame([(1.0, 1.0, 0.0)],
                               "y double, x0 double, __b0 double")
    with pytest.raises(ValueError, match="__b0"):
        logistic_fit(df, "y", ["x0"])
