"""Distributed PCA: covariance matrix vs NumPy, power iteration
convergence on a large-eigengap corpus, projection scores."""

import numpy as np
import pytest

from lindel_spark.similarity import (
    covariance_matrix,
    pca_scores,
    power_iteration_pca,
)


def _aniso(n=400, d=12, seed=5):
    """Strongly anisotropic data: one dominant axis (eigengap ~10x)."""
    rng = np.random.RandomState(seed)
    axis = rng.randn(d)
    axis /= np.linalg.norm(axis)
    X = rng.randn(n, d) * 0.3 + np.outer(rng.randn(n) * 3.0, axis)
    return X


@pytest.fixture(scope="module")
def xdf(spark):
    X = _aniso()
    rows = [(i, [float(v) for v in X[i]]) for i in range(len(X))]
    return X, spark.createDataFrame(rows, ["id", "embedding"])


def test_covariance_matches_numpy(xdf):
    X, df = xdf
    C = np.cov(X.T, bias=True)
    got = {(r.i, r.j): r.cov
           for r in covariance_matrix(df, "embedding").collect()}
    d = X.shape[1]
    assert len(got) == d * (d + 1) // 2
    for i in range(d):
        for j in range(i, d):
            assert got[(i, j)] == pytest.approx(C[i, j], abs=1e-9)


def test_power_iteration_converges_to_top_eigenvector(xdf):
    X, df = xdf
    comp = power_iteration_pca(df, "embedding", iters=12)
    rows = sorted(comp.collect(), key=lambda r: r.pos)
    v = np.array([r.loading for r in rows])
    C = np.cov(X.T, bias=True)
    w, V = np.linalg.eigh(C)
    top = V[:, -1]
    assert abs(float(v @ top)) > 0.9999
    assert rows[0].eigenvalue == pytest.approx(w[-1], rel=1e-4)
    # sign convention: largest |loading| positive
    idx = int(np.argmax(np.abs(v)))
    assert v[idx] > 0
    # unit norm
    assert float(v @ v) == pytest.approx(1.0, abs=1e-9)


def test_power_iteration_deterministic(xdf):
    _, df = xdf
    a = [r.loading for r in
         power_iteration_pca(df, "embedding", iters=5)
         .orderBy("pos").collect()]
    b = [r.loading for r in
         power_iteration_pca(df.repartition(7), "embedding", iters=5)
         .orderBy("pos").collect()]
    assert a == pytest.approx(b, abs=1e-12)


def test_pca_scores_match_numpy(xdf):
    X, df = xdf
    comp = power_iteration_pca(df, "embedding", iters=12)
    v = np.array([r.loading for r in
                  sorted(comp.collect(), key=lambda r: r.pos)])
    mu = X.mean(axis=0)
    got = {r.id: r.pc1
           for r in pca_scores(df, list(v), center=list(mu)).collect()}
    ref = (X - mu) @ v
    for i in range(len(X)):
        assert got[i] == pytest.approx(ref[i], abs=1e-9)


def test_pca_degenerate_input_raises(spark):
    df = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0]) for i in range(20)], ["id", "embedding"])
    with pytest.raises(ValueError, match="zero-variance"):
        power_iteration_pca(df, "embedding", iters=3)


def test_pca_validations(spark, xdf):
    _, df = xdf
    with pytest.raises(ValueError):
        power_iteration_pca(df, "embedding", iters=0)
    with pytest.raises(ValueError):
        pca_scores(df, [1.0, 0.0], center=[0.0])


def test_topk_components_match_numpy(spark):
    # distinct spectrum (the _aniso fixture's residual is isotropic,
    # so its 2nd/3rd eigenvectors are ill-defined): scales 6/3/1.5/...
    rng = np.random.RandomState(17)
    d = 8
    Q, _ = np.linalg.qr(rng.randn(d, d))
    scales = np.array([6.0, 3.0, 1.5, 0.7, 0.3, 0.15, 0.07, 0.03])
    X = rng.randn(500, d) * scales @ Q.T
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(len(X))],
        ["id", "embedding"])
    from lindel_spark.similarity import power_iteration_pca_topk

    out = power_iteration_pca_topk(df, "embedding", n_components=3,
                                   iters=40)
    C = np.cov(X.T, bias=True)
    w, V = np.linalg.eigh(C)
    by_comp = {}
    for r in out.collect():
        by_comp.setdefault(r.component, {})[r.pos] = (r.loading,
                                                      r.eigenvalue)
    assert set(by_comp) == {0, 1, 2}
    for c in range(3):
        v = np.array([by_comp[c][i][0] for i in range(X.shape[1])])
        lam = by_comp[c][0][1]
        ref = V[:, -1 - c]
        assert abs(float(v @ ref)) > 0.999, c
        assert lam == pytest.approx(w[-1 - c], rel=1e-3), c
    # orthogonality + eigenvalue ordering
    v0 = np.array([by_comp[0][i][0] for i in range(X.shape[1])])
    v1 = np.array([by_comp[1][i][0] for i in range(X.shape[1])])
    assert abs(float(v0 @ v1)) < 1e-6
    assert by_comp[0][0][1] >= by_comp[1][0][1] >= by_comp[2][0][1]


def test_topk_first_component_consistent(xdf):
    _, df = xdf
    from lindel_spark.similarity import (
        power_iteration_pca,
        power_iteration_pca_topk,
    )

    one = {r.pos: r.loading
           for r in power_iteration_pca(df, "embedding",
                                        iters=9).collect()}
    topk = {r.pos: r.loading
            for r in power_iteration_pca_topk(
                df, "embedding", n_components=1, iters=9).collect()}
    for p in one:
        assert one[p] == pytest.approx(topk[p], abs=1e-12)
