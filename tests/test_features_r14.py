"""Round-14 feature additions: linear_fit (multiple OLS/ridge probe
via the one-scan Gram aggregate + bounded driver solve)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lindel_spark.features import linear_fit


def _planted(spark, n=400, d=2, seed=5, noise=0.0, coef=None,
             intercept=3.0):
    rng = np.random.RandomState(seed)
    X = rng.randn(n, d) * 2.0
    c = np.asarray(coef if coef is not None else
                   np.arange(1, d + 1, dtype=float))
    y = intercept + X @ c + noise * rng.randn(n)
    cols = [f"x{i}" for i in range(d)]
    rows = [tuple([float(y[i])] + [float(v) for v in X[i]])
            for i in range(n)]
    schema = "y double, " + ", ".join(f"{c_} double" for c_ in cols)
    return spark.createDataFrame(rows, schema), cols, c


def test_noiseless_plane_recovered_exactly(spark):
    df, cols, c = _planted(spark, d=2, coef=[2.0, -0.5])
    r = linear_fit(df, "y", cols).collect()[0]
    assert r.n == 400
    assert r.intercept == pytest.approx(3.0, abs=1e-9)
    assert r["coef_x0"] == pytest.approx(2.0, abs=1e-9)
    assert r["coef_x1"] == pytest.approx(-0.5, abs=1e-9)
    assert r.r2 == pytest.approx(1.0, abs=1e-9)


def test_general_d_matches_numpy_lstsq(spark):
    df, cols, _ = _planted(spark, d=5, noise=0.3)
    r = linear_fit(df, "y", cols).collect()[0]
    pdf = df.toPandas()
    A = np.column_stack([np.ones(len(pdf)),
                         pdf[cols].to_numpy(float)])
    want, *_ = np.linalg.lstsq(A, pdf["y"].to_numpy(float),
                               rcond=None)
    assert r.intercept == pytest.approx(want[0], abs=1e-8)
    for i, c_ in enumerate(cols):
        assert r[f"coef_{c_}"] == pytest.approx(want[i + 1],
                                                abs=1e-8)
    assert 0.9 < r.r2 <= 1.0


def test_ridge_shrinks_and_matches_closed_form(spark):
    df, cols, _ = _planted(spark, d=3, noise=0.5)
    lam = 10.0
    r = linear_fit(df, "y", cols, ridge=lam).collect()[0]
    pdf = df.toPandas()
    A = np.column_stack([np.ones(len(pdf)),
                         pdf[cols].to_numpy(float)])
    G = A.T @ A
    G[1:, 1:] += lam * np.eye(3)
    want = np.linalg.solve(G, A.T @ pdf["y"].to_numpy(float))
    for i, c_ in enumerate(cols):
        assert r[f"coef_{c_}"] == pytest.approx(want[i + 1],
                                                abs=1e-8)
    r0 = linear_fit(df, "y", cols).collect()[0]
    assert abs(r[f"coef_{cols[0]}"]) < abs(r0[f"coef_{cols[0]}"])


def test_singular_returns_null(spark):
    # duplicated feature column -> singular normal matrix
    df, cols, _ = _planted(spark, d=1)
    df = df.withColumn("x_dup", F.col("x0"))
    r = linear_fit(df, "y", ["x0", "x_dup"]).collect()[0]
    assert r.intercept is None and r.r2 is None
    # constant feature at d=1: also singular
    r1 = linear_fit(df.withColumn("k", F.lit(1.0)), "y",
                    ["k"]).collect()[0]
    assert r1["coef_k"] is None


def test_null_rows_excluded_and_empty_input(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, None), (None, 3.0), (3.0, 2.0)],
        "y double, x double")
    r = linear_fit(df, "y", ["x"]).collect()[0]
    assert r.n == 2
    empty = linear_fit(df.filter(F.lit(False)), "y",
                       ["x"]).collect()[0]
    assert empty.n == 0 and empty.intercept is None


def test_validates_bounds(spark):
    df = spark.createDataFrame([(1.0, 1.0)], "y double, x double")
    with pytest.raises(ValueError):
        linear_fit(df, "y", [])
    with pytest.raises(ValueError):
        linear_fit(df, "y", [f"x{i}" for i in range(65)])
    with pytest.raises(ValueError):
        linear_fit(df, "y", ["x"], ridge=-1.0)


def test_grouped_fit_per_key_probes(spark):
    # two groups with different planted planes
    import numpy as np
    rng = np.random.RandomState(9)
    rows = []
    for g, (b0, b1) in (("a", (1.0, 2.0)), ("b", (-3.0, 0.5))):
        X = rng.randn(200)
        for x in X:
            rows.append((g, float(b0 + b1 * x), float(x)))
    df = spark.createDataFrame(rows, "g string, y double, x double")
    out = {r.g: r for r in linear_fit(df, "y", ["x"],
                                      keys=["g"]).collect()}
    assert out["a"].intercept == pytest.approx(1.0, abs=1e-9)
    assert out["a"]["coef_x"] == pytest.approx(2.0, abs=1e-9)
    assert out["b"].intercept == pytest.approx(-3.0, abs=1e-9)
    assert out["b"]["coef_x"] == pytest.approx(0.5, abs=1e-9)
    assert out["a"].n == 200 and out["b"].n == 200


def test_grouped_fit_max_keys_guard(spark):
    df = spark.createDataFrame(
        [(i, float(i), float(i)) for i in range(20)],
        "g long, y double, x double")
    with pytest.raises(ValueError, match="max_keys"):
        linear_fit(df, "y", ["x"], keys=["g"], max_keys=5)
