"""Round-15 additions, stats + centrality tier: Cochran's Q, Page's
trend test, generalized-ESD outlier ranking, closeness centrality."""

import pytest
from pyspark.sql import functions as F

from lindel_spark.profile import (cochran_q, esd_outliers,
                                  jonckheere_terpstra,
                                  page_trend_test)


def _bin(spark, rows):
    return spark.createDataFrame(rows, "b long, t string, x long")


def test_cochran_q_hand_computed(spark):
    # classic 3-treatment example: 4 blocks.
    # R_i = (1, 2, 3, 1), C_j = (3, 2, 2), N = 7
    # q = 2 * (3*17 - 49) / (3*7 - 15) = 2*2/6 = 0.666...
    rows = [(1, "A", 1), (1, "B", 0), (1, "C", 0),
            (2, "A", 1), (2, "B", 1), (2, "C", 0),
            (3, "A", 1), (3, "B", 1), (3, "C", 1),
            (4, "A", 0), (4, "B", 0), (4, "C", 1)]
    r = cochran_q(_bin(spark, rows), "b", "t", "x").collect()[0]
    assert r.n_blocks == 4 and r.k == 3
    assert r.q == pytest.approx(2.0 / 3.0, abs=1e-12)


def test_cochran_q_reduces_to_mcnemar_chi2(spark):
    # k=2: q equals the McNemar chi2 (without continuity correction)
    # = (b-c)^2/(b+c); discordant pairs: 3 (1,0) and 1 (0,1) -> 1.0
    rows = []
    pairs = [(1, 0)] * 3 + [(0, 1)] * 1 + [(1, 1)] * 2 + [(0, 0)] * 2
    for i, (a, b_) in enumerate(pairs):
        rows += [(i, "A", a), (i, "B", b_)]
    r = cochran_q(_bin(spark, rows), "b", "t", "x").collect()[0]
    assert r.q == pytest.approx((3 - 1) ** 2 / (3 + 1), abs=1e-12)


def test_cochran_q_degenerate_returns_null(spark):
    rows = [(b, t, 1) for b in (1, 2) for t in ("A", "B")]
    r = cochran_q(_bin(spark, rows), "b", "t", "x").collect()[0]
    assert r.q is None


def test_cochran_q_incomplete_block_excluded_dup_raises(spark):
    rows = [(1, "A", 1), (1, "B", 0), (2, "A", 1)]  # block 2 incomplete
    r = cochran_q(_bin(spark, rows), "b", "t", "x").collect()[0]
    assert r.n_blocks == 1
    with pytest.raises(Exception, match="duplicate"):
        cochran_q(_bin(spark, rows + [(2, "A", 0)]),
                  "b", "t", "x").collect()


def _val(spark, rows):
    return spark.createDataFrame(rows, "b long, t string, v double")


def test_page_trend_perfect_increase(spark):
    # 3 blocks, k=4, values strictly increase in treatment order:
    # every block ranks 1,2,3,4 -> R_j = (3,6,9,12),
    # L = 1*3+2*6+3*9+4*12 = 90; E[L] = 3*4*25/4 = 75,
    # Var[L] = 3*16*25*3/144 = 25 -> z = 3.0
    rows = [(b, t, float(j)) for b in (1, 2, 3)
            for j, t in enumerate("ABCD", 1)]
    r = page_trend_test(_val(spark, rows), "b", "t", "v").collect()[0]
    assert r.n_blocks == 3 and r.k == 4
    assert r.l == pytest.approx(90.0, abs=1e-12)
    assert r.z == pytest.approx(3.0, abs=1e-12)


def test_page_trend_midranks_on_ties(spark):
    # one block, all tied: every midrank = (k+1)/2, L = E[L] -> z = 0
    # (needs n>=... var>0 holds for k>=2)
    rows = [(1, t, 5.0) for t in "ABC"]
    r = page_trend_test(_val(spark, rows), "b", "t", "v").collect()[0]
    assert r.l == pytest.approx(1 * 2.0 * (1 + 2 + 3), abs=1e-12)
    assert r.z == pytest.approx(0.0, abs=1e-12)


def test_page_trend_duplicate_raises_incomplete_excluded(spark):
    rows = [(1, "A", 1.0), (1, "B", 2.0), (9, "A", 1.0)]
    r = page_trend_test(_val(spark, rows), "b", "t", "v").collect()[0]
    assert r.n_blocks == 1
    with pytest.raises(Exception, match="duplicate"):
        page_trend_test(_val(spark, rows + [(9, "A", 3.0)]),
                        "b", "t", "v").collect()


def test_esd_unmasks_second_outlier(spark):
    # 20 inliers around 0 plus outliers 100 and 90: round 1 must pick
    # 100, round 2 must pick 90 with a LARGER r_stat than it had in
    # round 1's inflated-sd view (the masking story), round 3 inlier.
    vals = [(i, float(v)) for i, v in enumerate(
        [0, 1, -1, 2, -2, 0, 1, -1, 2, -2,
         0, 1, -1, 2, -2, 0, 1, -1, 2, -2, 100, 90])]
    df = spark.createDataFrame(vals, "id long, x double")
    out = {r.round: r for r in
           esd_outliers(df, "x", "id", rounds=3).collect()}
    assert out[1].id == 20 and out[1].value == 100.0
    assert out[2].id == 21 and out[2].value == 90.0
    assert out[2].r_stat > 4.0  # unmasked: sd collapsed after round 1
    assert out[3].value in {2.0, -2.0}


def test_esd_tie_breaks_smallest_id(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -10.0), (3, 0.0), (4, 0.0), (5, 0.0)],
        "id long, x double")
    out = esd_outliers(df, "x", "id", rounds=1).collect()[0]
    # |10-0|=|−10-0|: symmetric r_stat tie -> smallest id wins
    assert out.id == 1


def test_closeness_star_graph(spark):
    from lindel_spark.graph import closeness_centrality
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(5)],
                                  "node long")
    r = {x.node: x for x in closeness_centrality(
        edges, nodes, max_depth=2).collect()}
    # center: reached by 4 leaves at d=1 -> 4/4 = 1.0
    assert r[0].n_sources == 4 and r[0].total_dist == 4
    assert r[0].closeness == pytest.approx(1.0)
    # each leaf: center at 1 + three leaves at 2 -> 4/(1+6)
    for i in range(1, 5):
        assert r[i].n_sources == 4 and r[i].total_dist == 7
        assert r[i].closeness == pytest.approx(4.0 / 7.0)


def test_closeness_matches_harmonic_reach(spark):
    # same BFS: closeness and harmonic agree on reach counts
    from lindel_spark.graph import (closeness_centrality,
                                    harmonic_centrality)
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (7, 8)],
        "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in (0, 2, 7)],
                                  "node long")
    c = {x.node: x for x in closeness_centrality(
        edges, nodes, max_depth=3).collect()}
    h = {x.node: x for x in harmonic_centrality(
        edges, nodes, max_depth=3).collect()}
    assert set(c) == set(h)
    # node 8 reached only from 7 at d=1
    assert c[8].n_sources == 1 and c[8].total_dist == 1
    # node 1: from 0 at d=1, from 2 at d=1 -> 2/2
    assert c[1].n_sources == 2 and c[1].closeness == 1.0


# ---- k-truss ------------------------------------------------------

def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_ktruss_clique_survives_tail_peels(spark):
    from lindel_spark.graph import ktruss
    # K4 on {0,1,2,3} plus a pendant path 3-4-5: 4-truss = the K4
    # (every K4 edge sits in 2 triangles), tail edges peel off
    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    out = ktruss(_edges(spark, k4 + [(3, 4), (4, 5)]),
                 k=4, rounds=3).collect()
    got = {(r.a, r.b): r.support for r in out}
    assert set(got) == set(k4)
    assert all(v == 2 for v in got.values())


def test_ktruss_peel_cascades(spark):
    from lindel_spark.graph import ktruss
    # triangle 0-1-2 with an extra triangle 2-3-4 sharing node 2:
    # k=3 keeps both triangles (support >= 1); the bridge (2,3)? —
    # build: tri1 = (0,1),(1,2),(0,2); tri2 = (2,3),(3,4),(2,4)
    tri = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4)]
    out3 = ktruss(_edges(spark, tri), k=3, rounds=2).collect()
    assert {(r.a, r.b) for r in out3} == set(tri)
    # k=4 needs support >= 2: nothing qualifies -> empty
    assert ktruss(_edges(spark, tri), k=4, rounds=2).count() == 0


def test_ktruss_two_triangles_sharing_edge(spark):
    from lindel_spark.graph import ktruss
    # edges of two triangles sharing (0,1): (0,1) has support 2,
    # the other four edges support 1. k=4 first peel drops the four,
    # second peel drops (0,1) (no triangles left) -> empty; with
    # rounds=1 the intermediate state leaks, so rounds matter
    e = [(0, 1), (0, 2), (1, 2), (0, 3), (1, 3)]
    assert ktruss(_edges(spark, e), k=4, rounds=2).count() == 0
    mid = ktruss(_edges(spark, e), k=4, rounds=1).collect()
    assert {(r.a, r.b) for r in mid} == {(0, 1)}
    assert mid[0].support == 0  # recomputed on the final subgraph


def test_ktruss_validates(spark):
    from lindel_spark.graph import ktruss
    df = _edges(spark, [(0, 1)])
    with pytest.raises(ValueError):
        ktruss(df, k=2)
    with pytest.raises(ValueError):
        ktruss(df, k=3, rounds=0)


# ---- bipartite projection ------------------------------------------

def test_project_bipartite_weights_and_guards(spark):
    from lindel_spark.graph import project_bipartite
    rows = [(1, "a"), (1, "b"), (1, "c"),
            (2, "a"), (2, "b"),
            (3, "a"), (3, "b"),
            (4, "x")]
    df = spark.createDataFrame(rows, "g long, item string")
    out = {(r.src, r.dst): r.weight for r in
           project_bipartite(df, "g", "item").collect()}
    assert out == {("a", "b"): 3, ("a", "c"): 1, ("b", "c"): 1}
    # min_weight prunes the weight-1 edges
    out2 = {(r.src, r.dst): r.weight for r in
            project_bipartite(df, "g", "item",
                              min_weight=2).collect()}
    assert out2 == {("a", "b"): 3}
    # skew guard: dropping group 1 (size 3) removes the c edges and
    # one (a,b) co-occurrence
    out3 = {(r.src, r.dst): r.weight for r in
            project_bipartite(df, "g", "item",
                              max_group_size=2).collect()}
    assert out3 == {("a", "b"): 2}
    # duplicates within a group count once
    dup = spark.createDataFrame(rows + [(2, "a")], "g long, item string")
    out4 = {(r.src, r.dst): r.weight for r in
            project_bipartite(dup, "g", "item").collect()}
    assert out4[("a", "b")] == 3
    with pytest.raises(ValueError):
        project_bipartite(df, "g", "item", min_weight=0)
    with pytest.raises(ValueError):
        project_bipartite(df, "g", "item", max_group_size=1)


# ---- Jonckheere-Terpstra -------------------------------------------

def _jt_ref(groups):
    """Reference O(n^2) JT with the tie 1/2 convention + moments."""
    import itertools
    ks = sorted(groups, key=str)
    jt = 0.0
    for gi, gj in itertools.combinations(ks, 2):
        for a in groups[gi]:
            for b in groups[gj]:
                jt += 1.0 if a < b else (0.5 if a == b else 0.0)
    ns = [len(groups[g]) for g in ks]
    N = sum(ns)
    mean = (N * N - sum(x * x for x in ns)) / 4.0
    var = (N * N * (2 * N + 3)
           - sum(x * x * (2 * x + 3) for x in ns)) / 72.0
    z = (jt - mean) / var ** 0.5 if var > 0 else None
    return jt, z


def _jt_df(spark, groups):
    rows = [(g, float(v)) for g, vs in groups.items() for v in vs]
    return spark.createDataFrame(rows, "g string, v double")


def test_jt_matches_reference(spark):
    import numpy as np
    rng = np.random.RandomState(8)
    groups = {"1_lo": list(rng.randn(30)),
              "2_mid": list(rng.randn(25) + 0.5),
              "3_hi": list(rng.randn(35) + 1.0)}
    want_jt, want_z = _jt_ref(groups)
    r = jonckheere_terpstra(_jt_df(spark, groups), "v",
                            "g").collect()[0]
    assert r.k == 3 and r.n == 90
    assert r.jt == pytest.approx(want_jt, abs=1e-9)
    assert r.z == pytest.approx(want_z, abs=1e-9)
    assert r.z > 3  # the trend is real


def test_jt_ties_half_convention(spark):
    groups = {"a": [1.0, 2.0], "b": [2.0, 3.0]}
    want_jt, _ = _jt_ref(groups)  # pairs: (1<2)+(1<3)+(2=2)/2+(2<3)
    r = jonckheere_terpstra(_jt_df(spark, groups), "v",
                            "g").collect()[0]
    assert want_jt == 3.5
    assert r.jt == pytest.approx(3.5, abs=0.0)


def test_jt_reversed_order_negates(spark):
    groups = {"1": [1.0, 2.0, 3.0], "2": [4.0, 5.0, 6.0]}
    rev = {"1": [4.0, 5.0, 6.0], "2": [1.0, 2.0, 3.0]}
    a = jonckheere_terpstra(_jt_df(spark, groups), "v",
                            "g").collect()[0]
    b = jonckheere_terpstra(_jt_df(spark, rev), "v",
                            "g").collect()[0]
    assert a.jt == 9.0 and b.jt == 0.0
    assert a.z == pytest.approx(-b.z, abs=1e-12)


def test_jt_validates(spark):
    df = _jt_df(spark, {"a": [1.0]})
    with pytest.raises(ValueError, match=">= 2 groups"):
        jonckheere_terpstra(df, "v", "g").collect()
    many = spark.createDataFrame(
        [(str(i), float(i)) for i in range(40)], "g string, v double")
    with pytest.raises(ValueError, match="max_groups"):
        jonckheere_terpstra(many, "v", "g", max_groups=8)


# ---- Mood's median test ---------------------------------------------

def test_mood_median_hand_computed(spark):
    from lindel_spark.profile import mood_median_test
    # group a: 1,2,3,4 ; group b: 5,6,7,8 -> grand median 4.0
    # (weighted_quantiles' per-distinct-value convention);
    # above: a->0/4, b->4/4 -> chi2 = n = 8
    rows = [("a", float(v)) for v in (1, 2, 3, 4)] + \
           [("b", float(v)) for v in (5, 6, 7, 8)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = mood_median_test(df, "v", "g").collect()[0]
    assert r.n == 8 and r.dof == 1
    assert r.chi2 == pytest.approx(8.0, abs=1e-9)
    assert r.grand_median == pytest.approx(4.0)


def test_mood_median_identical_groups_zero(spark):
    from lindel_spark.profile import mood_median_test
    rows = [(g, float(v)) for g in ("a", "b")
            for v in (1, 2, 3, 4, 5)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = mood_median_test(df, "v", "g").collect()[0]
    assert r.chi2 == pytest.approx(0.0, abs=1e-12)


# ---- BY / Fisher / partial correlation ------------------------------

def test_by_adjust_vs_reference(spark):
    from lindel_spark.profile import bh_adjust, by_adjust
    ps = [0.001, 0.008, 0.039, 0.041, 0.042, 0.06, 0.074, 0.205]
    df = spark.createDataFrame([(p,) for p in ps], "p double")
    out = {r.p: r.q_value for r in by_adjust(df, "p").collect()}
    m = len(ps)
    h = sum(1.0 / i for i in range(1, m + 1))
    # reference step-up with the harmonic penalty
    cand = [p * m * h / (i + 1) for i, p in enumerate(sorted(ps))]
    ref, cur = {}, float("inf")
    for p, c in sorted(zip(sorted(ps), cand), reverse=True):
        cur = min(cur, c)
        ref[p] = min(1.0, cur)
    for p in ps:
        assert out[p] == pytest.approx(ref[p], rel=1e-12)
    # BY >= BH everywhere (the harmonic penalty)
    bh = {r.p: r.q_value for r in bh_adjust(df, "p").collect()}
    assert all(out[p] >= bh[p] - 1e-15 for p in ps)


def test_fisher_combine_hand_and_guards(spark):
    import math
    from lindel_spark.profile import fisher_combine
    ps = [0.01, 0.04, 0.5, 0.9]
    df = spark.createDataFrame([(p,) for p in ps], "p double")
    r = fisher_combine(df, "p").collect()[0]
    assert r.m == 4 and r.dof == 8
    want = -2.0 * sum(math.log(p) for p in sorted(ps))
    assert r.chi2 == pytest.approx(want, rel=1e-12)
    bad = spark.createDataFrame([(0.0,)], "p double")
    with pytest.raises(Exception, match="outside"):
        fisher_combine(bad, "p").collect()


def test_partial_corr_removes_confounder(spark):
    import numpy as np
    from lindel_spark.profile import partial_corr
    rng = np.random.RandomState(10)
    n = 500
    z = rng.randn(n)
    x = z + 0.1 * rng.randn(n)      # x driven by z
    y = -z + 0.1 * rng.randn(n)     # y driven by -z
    df = spark.createDataFrame(
        [(float(x[i]), float(y[i]), float(z[i])) for i in range(n)],
        "x double, y double, z double")
    r = partial_corr(df, "x", "y", "z").collect()[0]
    assert r.r_xy < -0.9            # raw: strongly negative via z
    assert abs(r.r_xy_z) < 0.2      # controlled: mostly gone
    # closed-form replica
    rx = np.corrcoef(x, y)[0, 1]
    rxz = np.corrcoef(x, z)[0, 1]
    ryz = np.corrcoef(y, z)[0, 1]
    want = (rx - rxz * ryz) / ((1 - rxz ** 2) *
                               (1 - ryz ** 2)) ** 0.5
    assert r.r_xy_z == pytest.approx(want, rel=1e-9)


def test_partial_corr_degenerate_null(spark):
    from lindel_spark.profile import partial_corr
    df = spark.createDataFrame(
        [(1.0, 2.0, 5.0), (2.0, 3.0, 5.0), (3.0, 1.0, 5.0)],
        "x double, y double, z double")
    r = partial_corr(df, "x", "y", "z").collect()[0]
    assert r.r_xz is None and r.r_xy_z is None
    assert r.r_xy is not None


def test_jt_numeric_labels_natural_order(spark):
    # labels 1..10 as INTEGERS: key=str ordering would scramble
    # (1, 10, 2, ...) and flip/flatten the trend
    import numpy as np
    rng = np.random.RandomState(3)
    rows = []
    for g in range(1, 11):
        for v in rng.randn(12) + 0.4 * g:
            rows.append((g, float(v)))
    df = spark.createDataFrame(rows, "g long, v double")
    r = jonckheere_terpstra(df, "v", "g").collect()[0]
    assert r.k == 10 and r.z > 5  # strong increasing trend detected


# ---- Cronbach's alpha ----------------------------------------------

def test_cronbach_alpha_hand_computed(spark):
    from lindel_spark.profile import cronbach_alpha
    # 4 blocks x 3 perfectly-correlated items -> alpha = 1.0
    rows = [(b, t, float(b + 1)) for b in range(4) for t in "XYZ"]
    df = spark.createDataFrame(rows, "b long, t string, v double")
    r = cronbach_alpha(df, "b", "t", "v").collect()[0]
    assert r.n_blocks == 4 and r.k == 3
    assert r.alpha == pytest.approx(1.0, abs=1e-12)


def test_cronbach_alpha_numpy_replica(spark):
    import numpy as np
    from lindel_spark.profile import cronbach_alpha
    rng = np.random.RandomState(17)
    latent = rng.randn(50)
    M = np.stack([latent + 0.5 * rng.randn(50) for _ in range(4)],
                 axis=1)
    rows = [(b, f"i{t}", float(M[b, t]))
            for b in range(50) for t in range(4)]
    df = spark.createDataFrame(rows, "b long, t string, v double")
    r = cronbach_alpha(df, "b", "t", "v").collect()[0]
    k = 4
    svar = M.var(axis=0, ddof=1).sum()
    vtot = M.sum(axis=1).var(ddof=1)
    want = k / (k - 1) * (1 - svar / vtot)
    assert r.alpha == pytest.approx(want, rel=1e-9)
    assert r.alpha > 0.7  # the battery is genuinely coherent


def test_cronbach_alpha_guards(spark):
    from lindel_spark.profile import cronbach_alpha
    rows = [(1, "X", 1.0), (1, "Y", 2.0), (2, "X", 1.0),
            (2, "Y", 2.0)]
    dup = rows + [(2, "X", 3.0)]
    df = spark.createDataFrame(dup, "b long, t string, v double")
    with pytest.raises(Exception, match="duplicate"):
        cronbach_alpha(df, "b", "t", "v").collect()
    # constant totals -> zero total variance -> NULL
    const = spark.createDataFrame(rows, "b long, t string, v double")
    r = cronbach_alpha(const, "b", "t", "v").collect()[0]
    assert r.alpha is None


# ---- randomization test ---------------------------------------------

def test_randomization_detects_real_shift(spark):
    import numpy as np
    from lindel_spark.profile import randomization_test
    rng = np.random.RandomState(0)
    rows = [(i, float(rng.randn()), 0) for i in range(150)] + \
           [(1000 + i, float(rng.randn() + 2.0), 1)
            for i in range(150)]
    df = spark.createDataFrame(rows, "id long, v double, y int")
    r = randomization_test(df, "v", "y", "id",
                           n_draws=99).collect()[0]
    assert r.n1 == 150 and r.n0 == 150
    assert r.obs_diff == pytest.approx(2.0, abs=0.5)
    assert r.p == pytest.approx(1.0 / 100.0)  # no draw beats obs


def test_randomization_null_is_insignificant(spark):
    import numpy as np
    from lindel_spark.profile import randomization_test
    rng = np.random.RandomState(5)
    rows = [(i, float(rng.randn()), i % 2) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, v double, y int")
    r = randomization_test(df, "v", "y", "id",
                           n_draws=99).collect()[0]
    assert r.p > 0.05  # same distribution: large p


def test_randomization_deterministic_and_seeded(spark):
    import numpy as np
    from lindel_spark.profile import randomization_test
    rng = np.random.RandomState(7)
    rows = [(i, float(rng.randn() + (0.3 if i % 2 else 0)), i % 2)
            for i in range(200)]
    df = spark.createDataFrame(rows, "id long, v double, y int")
    a = randomization_test(df, "v", "y", "id", 50, seed=1) \
        .collect()[0]
    b = randomization_test(df.repartition(9), "v", "y", "id", 50,
                           seed=1).collect()[0]
    c = randomization_test(df, "v", "y", "id", 50, seed=2) \
        .collect()[0]
    assert a.n_ge == b.n_ge and a.p == b.p
    assert (a.n_ge, a.p) != (c.n_ge, c.p) or a.obs_diff == c.obs_diff


def test_randomization_empty_side_null(spark):
    from lindel_spark.profile import randomization_test
    df = spark.createDataFrame([(1, 1.0, 1), (2, 2.0, 1)],
                               "id long, v double, y int")
    r = randomization_test(df, "v", "y", "id", 10).collect()[0]
    assert r.p is None
    with pytest.raises(ValueError):
        randomization_test(df, "v", "y", "id", 0)


# ---- clustering coefficient ----------------------------------------

def test_clustering_coefficient_hand_graphs(spark):
    from lindel_spark.graph import clustering_coefficient
    # K4: every node coeff 1.0 (deg 3, tri 3 -> 2*3/(3*2) = 1)
    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    out = {r.node: r for r in clustering_coefficient(
        _edges(spark, k4)).collect()}
    assert all(out[i].coeff == pytest.approx(1.0) for i in range(4))
    assert all(out[i].triangles == 3 for i in range(4))
    # star: center deg 4 tri 0 -> 0.0; leaves deg 1 -> 0.0
    star = [(0, i) for i in range(1, 5)]
    s = {r.node: r for r in clustering_coefficient(
        _edges(spark, star)).collect()}
    assert s[0].coeff == 0.0 and s[0].degree == 4
    assert all(s[i].coeff == 0.0 and s[i].degree == 1
               for i in range(1, 5))
    # triangle + pendant: node 0 in tri with deg 3 (pendant 9):
    # coeff = 2*1/(3*2) = 1/3
    g = [(0, 1), (1, 2), (0, 2), (0, 9)]
    t = {r.node: r for r in clustering_coefficient(
        _edges(spark, g)).collect()}
    assert t[0].coeff == pytest.approx(1.0 / 3.0)
    assert t[1].coeff == pytest.approx(1.0)
    assert t[9].coeff == 0.0
