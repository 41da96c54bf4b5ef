"""Round-12 stats tier: Mann–Whitney U, Welch's t-test, Spearman
rank correlation — hand replays, tie handling, degenerate inputs."""

import numpy as np
import pytest

from lindel_spark.profile import (mann_whitney_u, spearman_corr,
                                  welch_ttest)


def _midranks(vals):
    """NumPy midrank replay (average rank of each tied block)."""
    vals = np.asarray(vals, dtype=float)
    order = np.argsort(vals, kind="stable")
    ranks = np.empty(len(vals))
    i = 0
    sv = vals[order]
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0  # 1-based midrank
        i = j
    return ranks


# ------------------------------------------------------ mann-whitney

def test_mwu_hand_example(spark):
    # group1 = {1,2,3}, group0 = {4,5,6}: R1 = 6, U1 = 0
    rows = [(1.0, 1), (2.0, 1), (3.0, 1), (4.0, 0), (5.0, 0), (6.0, 0)]
    r = mann_whitney_u(spark.createDataFrame(rows, ["v", "y"]),
                       "v", "y").collect()[0]
    assert (r.n1, r.n0) == (3, 3)
    assert r.u1 == pytest.approx(0.0)
    assert r.z == pytest.approx(-4.5 / np.sqrt(9 * 7 / 12.0))


def test_mwu_label_swap_antisymmetry(spark):
    rng = np.random.RandomState(7)
    rows = [(float(v), int(y)) for v, y in
            zip(np.round(rng.randn(300), 1), rng.randint(0, 2, 300))]
    df = spark.createDataFrame(rows, ["v", "y"])
    a = mann_whitney_u(df, "v", "y").collect()[0]
    from pyspark.sql import functions as F
    b = mann_whitney_u(
        df.withColumn("y", 1 - F.col("y")), "v", "y").collect()[0]
    assert a.u1 + b.u1 == pytest.approx(a.n1 * a.n0)
    assert a.z == pytest.approx(-b.z, abs=1e-12)


def test_mwu_matches_numpy_replay_with_ties(spark):
    rng = np.random.RandomState(11)
    v = np.round(rng.randn(400), 1)  # heavy ties
    y = rng.randint(0, 2, 400)
    ranks = _midranks(v)
    n1, n0 = int(y.sum()), int((1 - y).sum())
    r1 = ranks[y == 1].sum()
    u1 = r1 - n1 * (n1 + 1) / 2.0
    _, t = np.unique(v, return_counts=True)
    n = n1 + n0
    var = n1 * n0 / 12.0 * ((n + 1)
                            - (t ** 3 - t).sum() / (n * (n - 1.0)))
    z = (u1 - n1 * n0 / 2.0) / np.sqrt(var)
    got = mann_whitney_u(
        spark.createDataFrame(
            [(float(a), int(b)) for a, b in zip(v, y)], ["v", "y"]),
        "v", "y").collect()[0]
    assert got.u1 == pytest.approx(u1)
    assert got.z == pytest.approx(z, rel=1e-12)


def test_mwu_all_tied_null_z(spark):
    rows = [(5.0, i % 2) for i in range(10)]
    r = mann_whitney_u(spark.createDataFrame(rows, ["v", "y"]),
                       "v", "y").collect()[0]
    assert r.z is None
    assert r.u1 == pytest.approx(r.n1 * r.n0 / 2.0)  # pure-tie U


# ------------------------------------------------------------- welch

def test_welch_matches_numpy(spark):
    rng = np.random.RandomState(3)
    a = rng.randn(200) * 2.0 + 1.0
    b = rng.randn(150) * 0.5
    rows = ([(float(x), 1) for x in a] + [(float(x), 0) for x in b])
    r = welch_ttest(spark.createDataFrame(rows, ["v", "y"]),
                    "v", "y").collect()[0]
    v1, v0 = a.var(ddof=1), b.var(ddof=1)
    se2 = v1 / len(a) + v0 / len(b)
    t = (a.mean() - b.mean()) / np.sqrt(se2)
    dfw = se2 ** 2 / ((v1 / len(a)) ** 2 / (len(a) - 1)
                      + (v0 / len(b)) ** 2 / (len(b) - 1))
    assert r.mean1 == pytest.approx(a.mean(), rel=1e-12)
    assert r.mean0 == pytest.approx(b.mean(), rel=1e-12)
    assert r.t_stat == pytest.approx(t, rel=1e-9)
    assert r.df_welch == pytest.approx(dfw, rel=1e-9)


def test_welch_singleton_group_null(spark):
    rows = [(1.0, 1), (2.0, 0), (3.0, 0)]
    r = welch_ttest(spark.createDataFrame(rows, ["v", "y"]),
                    "v", "y").collect()[0]
    assert r.t_stat is None and r.df_welch is None


# ---------------------------------------------------------- spearman

def test_spearman_perfect_monotone(spark):
    rows = [(float(i), float(i * i)) for i in range(50)]
    r = spearman_corr(spark.createDataFrame(rows, ["x", "y"]),
                      "x", "y").collect()[0]
    assert r.rho == pytest.approx(1.0)
    rows = [(float(i), float(-i)) for i in range(50)]
    r = spearman_corr(spark.createDataFrame(rows, ["x", "y"]),
                      "x", "y").collect()[0]
    assert r.rho == pytest.approx(-1.0)


def test_spearman_matches_numpy_replay_with_ties(spark):
    rng = np.random.RandomState(5)
    x = np.round(rng.randn(300), 1)
    y = np.round(x + rng.randn(300), 1)
    rx, ry = _midranks(x), _midranks(y)
    rho = np.corrcoef(rx, ry)[0, 1]
    r = spearman_corr(
        spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(x, y)], ["x", "y"]),
        "x", "y").collect()[0]
    assert r.n == 300
    assert r.rho == pytest.approx(rho, rel=1e-10)


def test_spearman_constant_null(spark):
    rows = [(1.0, float(i)) for i in range(10)]
    r = spearman_corr(spark.createDataFrame(rows, ["x", "y"]),
                      "x", "y").collect()[0]
    assert r.rho is None


# -------------------------------------------------------- cliffs delta

def test_cliffs_delta_dominance_extremes(spark):
    from lindel_spark.profile import cliffs_delta
    rows = [(float(i), 1) for i in range(10, 20)] \
        + [(float(i), 0) for i in range(10)]
    r = cliffs_delta(spark.createDataFrame(rows, ["v", "y"]),
                     "v", "y").collect()[0]
    assert r.delta == pytest.approx(1.0)  # group1 fully dominates
    rows_sw = [(v, 1 - y) for v, y in rows]
    r2 = cliffs_delta(spark.createDataFrame(rows_sw, ["v", "y"]),
                      "v", "y").collect()[0]
    assert r2.delta == pytest.approx(-1.0)


def test_cliffs_delta_matches_pair_count_definition(spark):
    from lindel_spark.profile import cliffs_delta
    rng = np.random.RandomState(9)
    v = np.round(rng.randn(200), 1)
    y = rng.randint(0, 2, 200)
    x1, x0 = v[y == 1], v[y == 0]
    gt = sum((a > b) for a in x1 for b in x0)
    lt = sum((a < b) for a in x1 for b in x0)
    exp = (gt - lt) / (len(x1) * len(x0))
    r = cliffs_delta(
        spark.createDataFrame(
            [(float(a), int(b)) for a, b in zip(v, y)], ["v", "y"]),
        "v", "y").collect()[0]
    assert r.delta == pytest.approx(exp, abs=1e-12)


def test_cliffs_delta_all_tied_zero(spark):
    from lindel_spark.profile import cliffs_delta
    rows = [(5.0, i % 2) for i in range(20)]
    r = cliffs_delta(spark.createDataFrame(rows, ["v", "y"]),
                     "v", "y").collect()[0]
    assert r.delta == pytest.approx(0.0)
