"""Round-12: exact weighted quantiles and 1-D decision stump."""

import numpy as np
import pytest

from lindel_spark.features import best_split
from lindel_spark.profile import weighted_quantiles


# ---------------------------------------------------------- weighted q

def test_weighted_quantiles_hand(spark):
    # values 1..4 with weights 1,1,1,7 -> W=10
    rows = [(1.0, 1.0), (2.0, 1.0), (3.0, 1.0), (4.0, 7.0)]
    df = spark.createDataFrame(rows, ["v", "w"])
    out = {r.q: r for r in weighted_quantiles(
        df, "v", "w", [0.1, 0.3, 0.5, 1.0]).collect()}
    assert out[0.1].value == 1.0   # cum 1 >= 1
    assert out[0.3].value == 3.0   # cum 3 >= 3
    assert out[0.5].value == 4.0   # cum 10 >= 5
    assert out[1.0].value == 4.0
    assert out[1.0].cum_weight == pytest.approx(10.0)


def test_weighted_quantiles_uniform_weights_match_unweighted(spark):
    vals = sorted(float(v) for v in np.random.RandomState(3)
                  .randint(0, 100, 200))
    df = spark.createDataFrame([(v, 1.0) for v in vals], ["v", "w"])
    out = {r.q: r.value for r in weighted_quantiles(
        df, "v", "w", [0.25, 0.5, 0.75]).collect()}
    n = len(vals)
    for q in [0.25, 0.5, 0.75]:
        import math
        k = math.ceil(q * n)
        assert out[q] == vals[k - 1]  # exact order statistic


def test_weighted_quantiles_guards(spark):
    df = spark.createDataFrame([(1.0, 1.0)], ["v", "w"])
    with pytest.raises(ValueError):
        weighted_quantiles(df, "v", "w", [])
    with pytest.raises(ValueError):
        weighted_quantiles(df, "v", "w", [1.5])
    bad = spark.createDataFrame([(1.0, -1.0)], ["v", "w"])
    with pytest.raises(Exception):  # in-plan raise_error
        weighted_quantiles(bad, "v", "w", [0.5]).collect()


# ---------------------------------------------------------- best split

def test_best_split_perfect_separation(spark):
    rows = [(float(i), 0) for i in range(10)] \
        + [(float(i + 100), 1) for i in range(10)]
    r = best_split(spark.createDataFrame(rows, ["v", "y"]),
                   "v", "y").collect()[0]
    assert r.threshold == 9.0  # left = all zeros
    assert r.gain == pytest.approx(0.5)  # parent gini .5 -> 0
    assert (r.n_left, r.n_right) == (10, 10)
    assert (r.pos_left, r.pos_right) == (0, 10)


def test_best_split_matches_numpy_scan(spark):
    rng = np.random.RandomState(7)
    v = np.round(rng.randn(400) * 3, 1)
    y = (v + rng.randn(400) > 0).astype(int)
    df = spark.createDataFrame(
        [(float(a), int(b)) for a, b in zip(v, y)], ["v", "y"])
    r = best_split(df, "v", "y").collect()[0]

    def gini(p, n):
        s = p + n
        if s == 0:
            return 0.0
        return 1 - (p / s) ** 2 - (n / s) ** 2

    P, N = y.sum(), (1 - y).sum()
    best_gain, best_thr = -1.0, None
    for thr in sorted(set(v))[:-1]:
        lm = v <= thr
        pl, nl = y[lm].sum(), (1 - y[lm]).sum()
        g = gini(P, N) - (pl + nl) / len(v) * gini(pl, nl) \
            - (len(v) - pl - nl) / len(v) * gini(P - pl, N - nl)
        if round(g, 12) > round(best_gain, 12):
            best_gain, best_thr = g, thr
    assert r.threshold == pytest.approx(best_thr)
    assert r.gain == pytest.approx(best_gain, rel=1e-9)


def test_best_split_no_signal_near_zero_gain(spark):
    # each feature value sees exactly half positives: zero signal
    rows = [(float(i % 10), (i // 10) % 2) for i in range(200)]
    r = best_split(spark.createDataFrame(rows, ["v", "y"]),
                   "v", "y").collect()[0]
    assert r.gain == pytest.approx(0.0, abs=1e-9)


def test_best_split_entropy_criterion(spark):
    rows = [(0.0, 0), (1.0, 0), (2.0, 1), (3.0, 1)]
    r = best_split(spark.createDataFrame(rows, ["v", "y"]),
                   "v", "y", criterion="entropy").collect()[0]
    assert r.threshold == 1.0
    assert r.gain == pytest.approx(np.log(2))  # full bit, in nats
    with pytest.raises(ValueError):
        best_split(spark.createDataFrame(rows, ["v", "y"]), "v", "y",
                   criterion="chi")
