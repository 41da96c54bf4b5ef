"""Round-14 statistics additions: Friedman k-sample paired rank test
(the repeated-measures completion of the wilcoxon/kruskal ladder)."""

import pytest
from pyspark.sql import functions as F

from lindel_spark.profile import friedman_test


def _df(spark, rows):
    return spark.createDataFrame(rows, "b long, t string, v double")


def test_friedman_classic_hand_computed(spark):
    # 4 blocks x 3 treatments, no ties: R = (5, 8, 11) -> q = 4.5
    rows = []
    vals = {1: ("A", 1, "B", 2, "C", 3), 2: ("A", 1, "B", 3, "C", 2),
            3: ("A", 2, "B", 1, "C", 3), 4: ("A", 1, "B", 2, "C", 3)}
    for b, (t1, v1, t2, v2, t3, v3) in vals.items():
        rows += [(b, t1, float(v1)), (b, t2, float(v2)),
                 (b, t3, float(v3))]
    r = friedman_test(_df(spark, rows), "b", "t", "v").collect()[0]
    assert r.n_blocks == 4 and r.k == 3
    assert r.q == pytest.approx(4.5, abs=1e-12)


def test_friedman_midranks_on_ties(spark):
    # hand-computed Conover tie form: q = 3.0
    rows = [(1, "A", 1.0), (1, "B", 1.0), (1, "C", 2.0),
            (2, "A", 1.0), (2, "B", 2.0), (2, "C", 2.0)]
    r = friedman_test(_df(spark, rows), "b", "t", "v").collect()[0]
    assert r.n_blocks == 2 and r.k == 3
    assert r.q == pytest.approx(3.0, abs=1e-12)


def test_friedman_all_tied_returns_null(spark):
    rows = [(b, t, 5.0) for b in (1, 2, 3) for t in ("A", "B", "C")]
    r = friedman_test(_df(spark, rows), "b", "t", "v").collect()[0]
    assert r.q is None


def test_friedman_incomplete_blocks_excluded(spark):
    rows = [(1, "A", 1.0), (1, "B", 2.0), (1, "C", 3.0),
            (2, "A", 3.0), (2, "B", 1.0), (2, "C", 2.0),
            (9, "A", 9.0), (9, "B", 8.0)]  # incomplete: no C
    full = friedman_test(_df(spark, rows), "b", "t", "v").collect()[0]
    wo = friedman_test(_df(spark, rows[:-2]), "b", "t",
                       "v").collect()[0]
    assert full.n_blocks == wo.n_blocks == 2
    assert full.q == pytest.approx(wo.q, abs=0.0)


def test_friedman_duplicate_cell_raises(spark):
    rows = [(1, "A", 1.0), (1, "A", 2.0), (1, "B", 3.0)]
    from py4j.protocol import Py4JJavaError
    with pytest.raises(Exception, match="duplicate"):
        friedman_test(_df(spark, rows), "b", "t", "v").collect()


def test_friedman_nulls_excluded(spark):
    rows = [(1, "A", 1.0), (1, "B", 2.0), (1, "C", 3.0),
            (2, "A", 3.0), (2, "B", 1.0), (2, "C", 2.0),
            (None, "A", 7.0), (3, None, 7.0), (3, "A", None)]
    r = friedman_test(_df(spark, rows), "b", "t", "v").collect()[0]
    assert r.n_blocks == 2 and r.k == 3


# ---- Dunn post-hoc -------------------------------------------------

from lindel_spark.profile import dunn_posthoc


def _dunn_numpy(vals_by_group):
    import numpy as np
    import math
    allv = []
    for g, vs in vals_by_group.items():
        allv += [(v, g) for v in vs]
    xs = np.array([v for v, _ in allv], float)
    order = np.argsort(xs, kind="stable")
    ranks = np.empty(len(xs), float)
    sx = xs[order]
    i = 0
    tie3 = 0
    while i < len(sx):
        j = i
        while j < len(sx) and sx[j] == sx[i]:
            j += 1
        t = j - i
        tie3 += t ** 3 - t
        ranks[order[i:j]] = (i + j + 1) / 2.0
        i = j
    n = len(xs)
    by_g = {}
    for idx, (_, g) in enumerate(allv):
        by_g.setdefault(g, []).append(ranks[idx])
    out = {}
    gs = sorted(by_g)
    for a in range(len(gs)):
        for b in range(a + 1, len(gs)):
            g1, g2 = gs[a], gs[b]
            m1 = sum(by_g[g1]) / len(by_g[g1])
            m2 = sum(by_g[g2]) / len(by_g[g2])
            var = (n * (n + 1) / 12.0 - tie3 / (12.0 * (n - 1))) \
                * (1.0 / len(by_g[g1]) + 1.0 / len(by_g[g2]))
            out[(g1, g2)] = (m1 - m2) / math.sqrt(var)
    return out


def test_dunn_matches_numpy_replay(spark):
    import numpy as np
    rng = np.random.RandomState(3)
    groups = {"a": list(rng.randn(40)),
              "b": list(rng.randn(50) + 2.0),
              "c": list(rng.randn(30) + 2.1)}
    rows = [(g, float(v)) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {(r.g1, r.g2): r for r in
           dunn_posthoc(df, "v", "g").collect()}
    want = _dunn_numpy(groups)
    assert set(got) == set(want)
    for k, z in want.items():
        assert got[k].z == pytest.approx(z, abs=1e-9)
    # separated pairs significant, near-identical pair not
    assert got[("a", "b")].q < 0.01 and got[("a", "c")].q < 0.01
    assert got[("b", "c")].q > 0.1
    # BH never decreases p
    for r in got.values():
        assert r.q >= r.p - 1e-12


def test_dunn_identical_groups_p_near_one(spark):
    rows = [(g, float(v)) for g in ("x", "y")
            for v in range(30)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = dunn_posthoc(df, "v", "g").collect()[0]
    assert abs(r.z) < 1e-9
    assert r.p == pytest.approx(1.0, abs=1e-6)
