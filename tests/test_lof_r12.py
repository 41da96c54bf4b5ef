"""Round-12: local outlier factor — NumPy replay, inlier/outlier
separation, duplicate degenerate case."""

import numpy as np
import pytest

from lindel_spark.similarity import lof


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        ["vec_id", "embedding"])


def _lof_numpy(vecs, k):
    """Direct replay of the cosine-distance LOF definition."""
    V = np.asarray(vecs, dtype=float)
    nrm = np.linalg.norm(V, axis=1)
    cos = (V @ V.T) / np.outer(nrm, nrm)
    d = np.maximum(0.0, 1.0 - cos)
    n = len(V)
    nbrs, kdist = {}, {}
    for p in range(n):
        order = sorted((d[p, o], o) for o in range(n) if o != p)[:k]
        nbrs[p] = [o for _, o in order]
        kdist[p] = order[-1][0]
    lrd = {}
    for p in range(n):
        s = sum(max(kdist[o], d[p, o]) for o in nbrs[p])
        lrd[p] = k / s if s > 0 else None
    out = {}
    for p in range(n):
        out[p] = (np.mean([lrd[o] for o in nbrs[p]]) / lrd[p]
                  if lrd[p] else None)
    return kdist, lrd, out


def test_lof_matches_numpy_replay(spark):
    rng = np.random.RandomState(5)
    vecs = rng.randn(40, 8)
    got = {r.id: r for r in lof(_emb(spark, vecs), k=5).collect()}
    kd, lr, lo = _lof_numpy(vecs, 5)
    for p in range(40):
        assert got[p].kdist == pytest.approx(kd[p], abs=1e-9)
        assert got[p].lrd == pytest.approx(lr[p], rel=1e-9)
        assert got[p].lof == pytest.approx(lo[p], rel=1e-9)


def test_lof_flags_the_planted_outlier(spark):
    rng = np.random.RandomState(2)
    base = rng.randn(8)
    cluster = [base + rng.randn(8) * 0.01 for _ in range(20)]
    outlier = [-base * 3.0]
    got = {r.id: r.lof for r in
           lof(_emb(spark, cluster + outlier), k=5).collect()}
    inliers = [got[i] for i in range(20)]
    assert got[20] > 3.0 * max(v for v in inliers if v is not None)


def test_lof_all_duplicates_null(spark):
    vecs = [[1.0, 0.0]] * 6
    got = lof(_emb(spark, vecs), k=3).collect()
    assert all(r.lrd is None and r.lof is None for r in got)
