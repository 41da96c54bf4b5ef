"""Round-13 stats additions: Kruskal-Wallis H (k-sample rank ANOVA)."""

import numpy as np
import pytest

from lindel_spark.profile import kruskal_wallis, mann_whitney_u


def _kw_numpy(groups):
    xs = np.concatenate(groups)
    n = len(xs)
    order = np.sort(xs)
    # midranks with ties
    ranks = {}
    i = 0
    while i < n:
        j = i
        while j < n and order[j] == order[i]:
            j += 1
        ranks[order[i]] = (i + 1 + j) / 2.0
        i = j
    s = sum(np.array([ranks[v] for v in g]).sum() ** 2 / len(g)
            for g in groups)
    h = 12.0 / (n * (n + 1)) * s - 3 * (n + 1)
    _, t = np.unique(xs, return_counts=True)
    corr = 1.0 - (t ** 3 - t).sum() / (n ** 3 - n)
    return h / corr


def test_kw_matches_numpy_with_ties(spark):
    rng = np.random.RandomState(5)
    groups = [np.round(rng.rand(40) * 10 + d, 1)
              for d in (0.0, 0.5, 2.0)]
    rows = [(float(v), f"g{i}") for i, g in enumerate(groups) for v in g]
    df = spark.createDataFrame(rows, "v double, g string")
    r = kruskal_wallis(df, "v", "g").collect()[0]
    assert r.k == 3 and r.n == 120
    assert r.h == pytest.approx(_kw_numpy(groups), abs=1e-9)


def test_kw_two_groups_equals_squared_mwu_z(spark):
    rng = np.random.RandomState(9)
    a, b = rng.rand(50) * 5, rng.rand(60) * 5 + 1
    rows = ([(float(v), "a", 1) for v in a]
            + [(float(v), "b", 0) for v in b])
    df = spark.createDataFrame(rows, "v double, g string, y int")
    h = kruskal_wallis(df, "v", "g").collect()[0].h
    z = mann_whitney_u(df, "v", "y").collect()[0].z
    assert h == pytest.approx(z * z, rel=1e-9)


def test_kw_identical_groups_h_near_zero_and_all_tied_null(spark):
    rows = [(float(v), g) for g in ("a", "b")
            for v in np.arange(30)]
    df = spark.createDataFrame(rows, "v double, g string")
    h = kruskal_wallis(df, "v", "g").collect()[0].h
    assert abs(h) < 1e-9
    tied = spark.createDataFrame([(1.0, "a"), (1.0, "b")] * 5,
                                 "v double, g string")
    assert kruskal_wallis(tied, "v", "g").collect()[0].h is None


def test_kw_null_rows_excluded_and_repartition_stable(spark):
    rng = np.random.RandomState(2)
    rows = ([(float(v), "a") for v in rng.rand(30)]
            + [(float(v), "b") for v in rng.rand(30) + 0.3]
            + [(None, "a"), (1.0, None)])
    df = spark.createDataFrame(rows, "v double, g string")
    r1 = kruskal_wallis(df, "v", "g").collect()[0]
    r2 = kruskal_wallis(df.repartition(11), "v", "g").collect()[0]
    assert r1.n == 60
    assert r1.h == r2.h


# ------------------------------------------------------- BH FDR

def _bh_numpy(ps):
    import numpy as np
    ps = np.asarray(ps, float)
    n = len(ps)
    order = np.argsort(ps)
    q = np.empty(n)
    running = 1.0
    for idx in range(n - 1, -1, -1):
        i = order[idx]
        running = min(running, ps[i] * n / (idx + 1))
        q[i] = running
    return q


def test_bh_matches_numpy_reference(spark):
    import numpy as np
    from lindel_spark.profile import bh_adjust

    rng = np.random.RandomState(4)
    ps = np.concatenate([rng.rand(40), rng.rand(10) * 0.01])
    df = spark.createDataFrame(
        [(i, float(p)) for i, p in enumerate(ps)], "id long, p double")
    got = {r.id: r.q_value for r in bh_adjust(df, "p").collect()}
    want = _bh_numpy(ps)
    for i in range(len(ps)):
        assert got[i] == pytest.approx(want[i], abs=1e-12), i


def test_bh_ties_share_q_and_nulls_pass_through(spark):
    from lindel_spark.profile import bh_adjust

    df = spark.createDataFrame(
        [(1, 0.01), (2, 0.01), (3, 0.5), (4, None)],
        "id long, p double")
    rows = {r.id: r.q_value for r in bh_adjust(df, "p").collect()}
    assert rows[1] == rows[2]
    # tie block uses its MAX rank: q(0.01) = min over suffix of
    # p*n/j -> 0.01*3/2 = 0.015 (n=3 non-null tests)
    assert rows[1] == pytest.approx(0.015, abs=1e-12)
    assert rows[3] == pytest.approx(0.5, abs=1e-12)
    assert rows[4] is None


def test_bh_monotone_and_capped(spark):
    import numpy as np
    from lindel_spark.profile import bh_adjust

    rng = np.random.RandomState(8)
    ps = sorted(float(p) for p in rng.rand(60))
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(ps)], "id long, p double")
    rows = sorted(((r.p, r.q_value)
                   for r in bh_adjust(df, "p").collect()))
    qs = [q for _, q in rows]
    assert all(q <= 1.0 for q in qs)
    assert all(a <= b + 1e-15 for a, b in zip(qs, qs[1:]))


def test_bh_out_of_range_raises_in_plan(spark):
    from lindel_spark.profile import bh_adjust

    df = spark.createDataFrame([(1, 1.5)], "id long, p double")
    with pytest.raises(Exception, match="outside"):
        bh_adjust(df, "p").collect()
