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


# --------------------------------------------- Poisson bootstrap CI

def _u_py(ident, b, salt="lindel"):
    import hashlib
    h = hashlib.md5(f"{ident}|{b}|{salt}".encode()).hexdigest()
    return (int(h[:15], 16) + 0.5) / float(16 ** 15)


def _w_py(u):
    from lindel_spark.profile import _poisson1_cdf
    for k, t in enumerate(_poisson1_cdf()):
        if u <= t:
            return k
    return 12


def test_bootstrap_full_python_replay(spark):
    import numpy as np
    from lindel_spark.profile import poisson_bootstrap_ci

    rng = np.random.RandomState(3)
    xs = rng.rand(30) * 10
    df = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(xs)], "id long, x double")
    B = 16
    r = poisson_bootstrap_ci(df, "x", "id", n_replicas=B,
                             alpha=0.1).collect()[0]
    means = []
    for b in range(1, B + 1):
        ws = np.array([_w_py(_u_py(str(i), b)) for i in range(30)], float)
        if ws.sum() > 0:
            means.append((ws * xs).sum() / ws.sum())
    means.sort()
    import math
    lo = means[max(1, math.ceil(B * 0.05)) - 1]
    hi = means[min(B, math.ceil(B * 0.95)) - 1]
    assert r.n == 30
    assert r.point_mean == pytest.approx(xs.mean(), abs=1e-9)
    assert r.n_replicas == len(means)
    assert r.ci_lo == pytest.approx(lo, abs=1e-12)
    assert r.ci_hi == pytest.approx(hi, abs=1e-12)


def test_bootstrap_ci_brackets_mean_and_shrinks(spark):
    import numpy as np
    from lindel_spark.profile import poisson_bootstrap_ci

    rng = np.random.RandomState(11)
    small = [(i, float(v)) for i, v in enumerate(rng.randn(100) + 5)]
    big = [(i, float(v)) for i, v in enumerate(rng.randn(4000) + 5)]
    a = poisson_bootstrap_ci(
        spark.createDataFrame(small, "id long, x double"), "x", "id",
        n_replicas=64).collect()[0]
    b = poisson_bootstrap_ci(
        spark.createDataFrame(big, "id long, x double"), "x", "id",
        n_replicas=64).collect()[0]
    assert a.ci_lo < 5 < a.ci_hi  # brackets the truth
    assert b.ci_lo < 5 < b.ci_hi
    assert (b.ci_hi - b.ci_lo) < (a.ci_hi - a.ci_lo)  # n↑ ⇒ tighter


def test_bootstrap_grouped_and_deterministic(spark):
    import numpy as np
    from lindel_spark.profile import poisson_bootstrap_ci

    rng = np.random.RandomState(6)
    rows = [(g, i, float(rng.rand() * (10 if g == "a" else 1)))
            for g in ("a", "b") for i in range(200)]
    df = spark.createDataFrame(rows, "g string, id long, x double")
    r1 = {r.g: r for r in poisson_bootstrap_ci(
        df, "x", "id", keys=["g"], n_replicas=32).collect()}
    r2 = {r.g: r for r in poisson_bootstrap_ci(
        df.repartition(9), "x", "id", keys=["g"],
        n_replicas=32).collect()}
    for g in ("a", "b"):
        # replica means are double SUMS, so partitioning shifts the
        # last ulps (the usual float-sum order sensitivity the
        # registry's 6dp rounding absorbs) — assert to 1e-9
        assert r1[g].ci_lo == pytest.approx(r2[g].ci_lo, abs=1e-9)
        assert r1[g].ci_hi == pytest.approx(r2[g].ci_hi, abs=1e-9)
    assert r1["a"].ci_hi > r1["b"].ci_hi  # scales with the data


def test_bootstrap_validation(spark):
    from lindel_spark.profile import poisson_bootstrap_ci

    df = spark.createDataFrame([(1, 1.0)], "id long, x double")
    with pytest.raises(ValueError):
        poisson_bootstrap_ci(df, "x", "id", n_replicas=2)
    with pytest.raises(ValueError):
        poisson_bootstrap_ci(df, "x", "id", alpha=0.0)


# -------------------------------------------- ANN model persistence

def test_ann_model_roundtrip_bit_exact(spark, tmp_path):
    import numpy as np
    from lindel_spark import similarity as LS

    rng = np.random.RandomState(7)
    cents = rng.randn(8, 16)
    books = rng.randn(4, 32, 4)
    R = np.linalg.qr(rng.randn(16, 16))[0]
    p = str(tmp_path / "model")
    LS.save_ann_model(spark, p, centroids=cents, codebooks=books,
                      rotation=R)
    m = LS.load_ann_model(spark, p)
    assert np.array_equal(m["centroids"], cents)
    assert np.array_equal(m["codebooks"], books)
    assert np.array_equal(m["rotation"], R)


def test_ann_model_partial_components(spark, tmp_path):
    import numpy as np
    import pytest as _pt
    from lindel_spark import similarity as LS

    cents = np.eye(4, 8)
    p = str(tmp_path / "cells_only")
    LS.save_ann_model(spark, p, centroids=cents)
    m = LS.load_ann_model(spark, p)
    assert np.array_equal(m["centroids"], cents)
    assert m["codebooks"] is None and m["rotation"] is None
    with _pt.raises(ValueError):
        LS.save_ann_model(spark, str(tmp_path / "empty"))


# ------------------------------------------------- JS divergence

def test_js_divergence_identical_zero_disjoint_one(spark):
    from lindel_spark.text import js_divergence

    a = spark.createDataFrame([(1, "x y z x")], "doc_id long, text string")
    same = js_divergence(a, a).collect()[0]
    assert same.js_bits == pytest.approx(0.0, abs=1e-12)
    assert same.vocab_shared == 3
    b = spark.createDataFrame([(2, "p q r")], "doc_id long, text string")
    dis = js_divergence(a, b).collect()[0]
    assert dis.js_bits == pytest.approx(1.0, abs=1e-12)  # disjoint = 1 bit
    assert dis.vocab_shared == 0


def test_js_divergence_matches_numpy(spark):
    import numpy as np
    from lindel_spark.text import js_divergence

    rng = np.random.RandomState(5)
    vocab = [f"w{i}" for i in range(30)]
    da = " ".join(rng.choice(vocab, 500, p=np.ones(30) / 30))
    pb = np.ones(30); pb[:5] = 8; pb /= pb.sum()
    db = " ".join(rng.choice(vocab, 400, p=pb))
    A = spark.createDataFrame([(1, da)], "doc_id long, text string")
    B = spark.createDataFrame([(2, db)], "doc_id long, text string")
    got = js_divergence(A, B).collect()[0]

    def dist(s):
        from collections import Counter
        c = Counter(s.split())
        tot = sum(c.values())
        return {k: v / tot for k, v in c.items()}

    p, q = dist(da), dist(db)
    keys = set(p) | set(q)
    js = 0.0
    for k in keys:
        pi, qi = p.get(k, 0.0), q.get(k, 0.0)
        m = (pi + qi) / 2
        if pi > 0:
            js += 0.5 * pi * np.log2(pi / m)
        if qi > 0:
            js += 0.5 * qi * np.log2(qi / m)
    assert got.js_bits == pytest.approx(js, abs=1e-9)
    assert 0.0 < got.js_bits < 1.0


# ------------------------------- paired tests: Wilcoxon + McNemar

def _wsr_numpy(x, y):
    import numpy as np
    d = np.asarray(x, float) - np.asarray(y, float)
    d = d[d != 0]
    ad = np.abs(d)
    order = np.sort(ad)
    ranks = {}
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and order[j] == order[i]:
            j += 1
        ranks[order[i]] = (i + 1 + j) / 2.0
        i = j
    w_plus = sum(ranks[abs(v)] for v in d if v > 0)
    n = len(d)
    _, t = np.unique(ad, return_counts=True)
    var = n * (n + 1) * (2 * n + 1) / 24.0 - ((t**3 - t).sum()) / 48.0
    z = (w_plus - n * (n + 1) / 4.0) / var ** 0.5
    return n, w_plus, z


def test_wilcoxon_matches_numpy_with_ties_and_zeros(spark):
    import numpy as np
    from lindel_spark.profile import wilcoxon_signed_rank

    rng = np.random.RandomState(12)
    x = np.round(rng.rand(80) * 5, 1)
    y = np.round(x - rng.randn(80) * 0.5 - 0.45, 1)  # x tends to win
    y[:5] = x[:5]  # planted zero differences (discarded)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)],
        "x double, y double")
    r = wilcoxon_signed_rank(df, "x", "y").collect()[0]
    n, w, z = _wsr_numpy(x, y)
    assert r.n == n
    assert r.w_plus == pytest.approx(w, abs=1e-9)
    assert r.z == pytest.approx(z, abs=1e-9)
    assert r.z > 2  # the planted shift is detected


def test_wilcoxon_symmetric_null_small_z(spark):
    import numpy as np
    from lindel_spark.profile import wilcoxon_signed_rank

    rng = np.random.RandomState(3)
    x = rng.rand(400)
    y = x + rng.randn(400) * 0.1  # symmetric noise, no shift
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)],
        "x double, y double")
    r = wilcoxon_signed_rank(df, "x", "y").collect()[0]
    assert abs(r.z) < 2.5
    # all-zero differences -> NULL z
    same = spark.createDataFrame([(1.0, 1.0)] * 10, "x double, y double")
    out = wilcoxon_signed_rank(same, "x", "y").collect()[0]
    assert out.n == 0 and out.z is None


def test_mcnemar_hand_computed_and_degenerate(spark):
    from lindel_spark.profile import mcnemar_test

    rows = ([(1, 0)] * 9 + [(0, 1)] * 3 + [(1, 1)] * 20 + [(0, 0)] * 8)
    df = spark.createDataFrame(rows, "a int, b int")
    r = mcnemar_test(df, "a", "b").collect()[0]
    assert (r.n, r.n10, r.n01) == (40, 9, 3)
    assert r.chi2 == pytest.approx((9 - 3) ** 2 / 12.0, abs=1e-12)
    conc = spark.createDataFrame([(1, 1)] * 5, "a int, b int")
    assert mcnemar_test(conc, "a", "b").collect()[0].chi2 is None


# ---------------------------------------------------- one-way ANOVA

def test_anova_matches_numpy(spark):
    import numpy as np
    from lindel_spark.profile import anova_oneway

    rng = np.random.RandomState(9)
    groups = [rng.randn(40) * 2 + d for d in (0.0, 0.5, 1.5)]
    rows = [(float(v), f"g{i}") for i, g in enumerate(groups) for v in g]
    df = spark.createDataFrame(rows, "v double, g string")
    r = anova_oneway(df, "v", "g").collect()[0]
    xs = np.concatenate(groups)
    m = xs.mean()
    ssb = sum(len(g) * (g.mean() - m) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f = (ssb / 2) / (ssw / (len(xs) - 3))
    assert (r.k, r.n, r.df1, r.df2) == (3, 120, 2, 117)
    assert r.f_stat == pytest.approx(f, rel=1e-9)


def test_anova_identical_groups_and_degenerate(spark):
    import numpy as np
    from lindel_spark.profile import anova_oneway

    xs = np.arange(30, dtype=float)
    rows = [(float(v), g) for g in ("a", "b") for v in xs]
    r = anova_oneway(spark.createDataFrame(rows, "v double, g string"),
                     "v", "g").collect()[0]
    assert abs(r.f_stat) < 1e-9
    const = spark.createDataFrame([(1.0, "a"), (1.0, "b")] * 3,
                                  "v double, g string")
    assert anova_oneway(const, "v", "g").collect()[0].f_stat is None


# ---------------------------------------------------- prefix_mins

def test_prefix_mins_matches_numpy_both_directions(spark):
    import numpy as np
    from lindel_spark.util import prefix_mins

    rng = np.random.RandomState(2)
    keys = rng.permutation(200).astype(float)
    vals = rng.randn(200)
    df = spark.createDataFrame(
        [(float(k), float(v)) for k, v in zip(keys, vals)],
        "k double, v double")
    asc = {r.k: r.cummin_v for r in
           prefix_mins(df, "k", ["v"]).collect()}
    desc = {r.k: r.cummin_v for r in
            prefix_mins(df, "k", ["v"], descending=True).collect()}
    order = np.argsort(keys)
    run = np.minimum.accumulate(vals[order])
    run_desc = np.minimum.accumulate(vals[order[::-1]])
    for i, idx in enumerate(order):
        assert asc[keys[idx]] == pytest.approx(run[i], abs=0)
    for i, idx in enumerate(order[::-1]):
        assert desc[keys[idx]] == pytest.approx(run_desc[i], abs=0)


def test_prefix_mins_null_and_partition_stability(spark):
    from lindel_spark.util import prefix_mins

    df = spark.createDataFrame(
        [(1.0, None), (2.0, 5.0), (3.0, None), (4.0, 3.0)],
        "k double, v double")
    got = {r.k: r.cummin_v for r in
           prefix_mins(df, "k", ["v"], num_partitions=3).collect()}
    assert got[1.0] is None       # empty prefix
    assert got[2.0] == 5.0
    assert got[3.0] == 5.0        # NULL skipped, min carries
    assert got[4.0] == 3.0


# ------------------------------------------------------- Cohen's d

def test_cohens_d_matches_numpy(spark):
    import numpy as np
    from lindel_spark.profile import cohens_d

    rng = np.random.RandomState(21)
    a = rng.randn(60) * 2 + 1.0
    b = rng.randn(90) * 2
    rows = [(float(v), 1) for v in a] + [(float(v), 0) for v in b]
    r = cohens_d(spark.createDataFrame(rows, "v double, y int"),
                 "v", "y").collect()[0]
    sp = (((a - a.mean()) ** 2).sum() + ((b - b.mean()) ** 2).sum()) \
        / (len(a) + len(b) - 2)
    d = (a.mean() - b.mean()) / sp ** 0.5
    g = d * (1 - 3 / (4 * (len(a) + len(b)) - 9))
    assert r.d == pytest.approx(d, rel=1e-9)
    assert r.g == pytest.approx(g, rel=1e-9)
    assert abs(r.g) < abs(r.d)  # J shrinks toward 0


def test_cohens_d_zero_and_degenerate(spark):
    from lindel_spark.profile import cohens_d

    rows = [(float(v), y) for y in (0, 1) for v in range(10)]
    r = cohens_d(spark.createDataFrame(rows, "v double, y int"),
                 "v", "y").collect()[0]
    assert r.d == pytest.approx(0.0, abs=1e-12)
    const = spark.createDataFrame([(1.0, 0), (1.0, 1)] * 3,
                                  "v double, y int")
    assert cohens_d(const, "v", "y").collect()[0].d is None


# ------------------------------------------------ Brown-Forsythe

def test_brown_forsythe_detects_spread_shift(spark):
    import numpy as np
    from lindel_spark.profile import brown_forsythe

    rng = np.random.RandomState(17)
    rows = ([(float(v), "tight") for v in rng.randn(150) * 0.5]
            + [(float(v), "wide") for v in rng.randn(150) * 3.0])
    df = spark.createDataFrame(rows, "v double, g string")
    r = brown_forsythe(df, "v", "g").collect()[0]
    assert (r.k, r.n, r.df1, r.df2) == (2, 300, 1, 298)
    assert r.w_stat > 30  # gross spread difference

    shared = rng.randn(100)
    same = spark.createDataFrame(
        [(float(v), g) for g in ("a", "b") for v in shared],
        "v double, g string")
    # equal spreads by construction (same sample both groups): W ~ 0
    assert brown_forsythe(same, "v", "g").collect()[0].w_stat \
        == pytest.approx(0.0, abs=1e-9)


def test_brown_forsythe_matches_numpy_replay(spark):
    import numpy as np
    from lindel_spark.profile import brown_forsythe

    rng = np.random.RandomState(8)
    ga = np.round(rng.randn(41) * 2, 1)
    gb = np.round(rng.randn(30) * 5, 1)
    rows = ([(float(v), "a") for v in ga] + [(float(v), "b") for v in gb])
    r = brown_forsythe(
        spark.createDataFrame(rows, "v double, g string"),
        "v", "g").collect()[0]

    def lower_median(x):
        s = np.sort(x)
        return s[int(np.ceil(len(s) / 2)) - 1]

    za = np.abs(ga - lower_median(ga))
    zb = np.abs(gb - lower_median(gb))
    zs = np.concatenate([za, zb]); m = zs.mean()
    ssb = len(za) * (za.mean() - m) ** 2 + len(zb) * (zb.mean() - m) ** 2
    ssw = ((za - za.mean()) ** 2).sum() + ((zb - zb.mean()) ** 2).sum()
    w = (ssb / 1) / (ssw / (len(zs) - 2))
    assert r.w_stat == pytest.approx(w, rel=1e-9)


# ------------------------------------------------------ normal_sf

def test_normal_sf_matches_erfc_within_documented_error(spark):
    import math as _m

    from pyspark.sql import functions as F

    from lindel_spark.profile import normal_sf

    zs = [-4.0, -2.5, -1.0, -0.5, 0.0, 0.5, 1.0, 1.96, 2.58, 4.0]
    df = spark.createDataFrame([(float(z),) for z in zs], "z double")
    got = {r.z: r.p for r in df.select(
        "z", normal_sf(F.col("z")).alias("p")).collect()}
    for z in zs:
        want = 0.5 * _m.erfc(z / _m.sqrt(2.0))
        assert abs(got[z] - want) < 1.5e-7, (z, got[z], want)
    # symmetry + monotone decrease
    assert got[-1.0] + got[1.0] == pytest.approx(1.0, abs=3e-7)
    vals = [got[z] for z in sorted(zs)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))
