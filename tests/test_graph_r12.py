"""Round-12 graph tier: link prediction (CN/Jaccard/Adamic–Adar) and
HITS hubs/authorities — hand graphs, hub-cap semantics, NumPy replay."""

import math

import numpy as np
import pytest

from lindel_spark.graph import hits, link_prediction


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], ["src", "dst"])


# ----------------------------------------------------- link predict

def test_lp_path_and_square(spark):
    # path 1-2-3: the only prediction is (1,3) through middle 2
    out = {(r.src, r.dst): r for r in
           link_prediction(_edges(spark, [(1, 2), (2, 3)])).collect()}
    assert set(out) == {(1, 3)}
    r = out[(1, 3)]
    assert r.cn == 1
    assert r.jaccard == pytest.approx(1.0)  # deg1=deg3=1, union = 1
    assert r.adamic_adar == pytest.approx(1.0 / math.log(2.0))

    # square 1-2-3-4-1: diagonals (1,3) and (2,4), CN=2 each
    sq = [(1, 2), (2, 3), (3, 4), (1, 4)]
    out = {(r.src, r.dst): r for r in
           link_prediction(_edges(spark, sq)).collect()}
    assert set(out) == {(1, 3), (2, 4)}
    for r in out.values():
        assert r.cn == 2
        assert r.jaccard == pytest.approx(1.0)  # 2/(2+2-2)
        assert r.adamic_adar == pytest.approx(2.0 / math.log(2.0))


def test_lp_triangle_no_candidates(spark):
    # complete graph: every wedge closes, nothing to predict
    tri = [(1, 2), (2, 3), (1, 3)]
    assert link_prediction(_edges(spark, tri)).count() == 0


def test_lp_middle_degree_cap_excludes_hub(spark):
    # star: center 0 with 5 leaves; every leaf pair is a candidate
    star = [(0, i) for i in range(1, 6)]
    full = link_prediction(_edges(spark, star))
    assert full.count() == 10  # C(5,2)
    capped = link_prediction(_edges(spark, star), max_middle_degree=4)
    assert capped.count() == 0  # center deg 5 > 4: no middles left


def test_lp_direction_and_dup_invariant(spark):
    # reversed/duplicated input edges canonicalize identically
    e1 = _edges(spark, [(1, 2), (2, 3)])
    e2 = _edges(spark, [(2, 1), (3, 2), (1, 2)])
    a = {(r.src, r.dst): (r.cn, round(r.adamic_adar, 12))
         for r in link_prediction(e1).collect()}
    b = {(r.src, r.dst): (r.cn, round(r.adamic_adar, 12))
         for r in link_prediction(e2).collect()}
    assert a == b


# -------------------------------------------------------------- hits

def test_hits_two_hubs_one_authority(spark):
    out = {r.node: r for r in
           hits(_edges(spark, [(1, 3), (2, 3)]),
                iterations=3).collect()}
    assert out[3].authority == pytest.approx(1.0)
    assert out[1].hub == pytest.approx(0.5)
    assert out[2].hub == pytest.approx(0.5)
    assert out[3].hub == pytest.approx(0.0)
    assert out[1].authority == pytest.approx(0.0)


def test_hits_matches_numpy_replay(spark):
    rng = np.random.RandomState(9)
    n = 12
    pairs = {(int(a), int(b)) for a, b in
             zip(rng.randint(0, n, 40), rng.randint(0, n, 40))}
    pairs = [(a, b) for a, b in pairs]
    nodes = sorted({x for p in pairs for x in p})
    idx = {v: i for i, v in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for a, b in pairs:
        A[idx[a], idx[b]] = 1.0
    h = np.ones(len(nodes))
    for _ in range(4):
        a = A.T @ h
        a = a / a.sum()
        h = A @ a
        h = h / h.sum()
    got = {r.node: r for r in
           hits(_edges(spark, pairs), iterations=4).collect()}
    for v in nodes:
        assert got[v].hub == pytest.approx(h[idx[v]], abs=1e-12)
        assert got[v].authority == pytest.approx(a[idx[v]], abs=1e-12)


def test_hits_requires_iterations(spark):
    with pytest.raises(ValueError):
        hits(_edges(spark, [(1, 2)]), iterations=0)
