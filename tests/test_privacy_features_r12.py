"""Round-12: t-closeness audit and WOE/IV encoding — hand replays,
closed-form absent-value folding, smoothing invariants."""

import math

import numpy as np
import pytest

from lindel_spark.features import woe_iv
from lindel_spark.profile import t_closeness_report


# --------------------------------------------------------- t-close

def test_tcloseness_uniform_class_matches_global(spark):
    # two classes with IDENTICAL sensitive distribution -> tvd 0
    rows = [("a", s) for s in ["x", "y"] * 10] \
        + [("b", s) for s in ["x", "y"] * 5]
    df = spark.createDataFrame(rows, ["qi", "s"])
    out = {r.qi: r for r in
           t_closeness_report(df, ["qi"], "s", t=0.1).collect()}
    assert out["a"].tvd == pytest.approx(0.0, abs=1e-12)
    assert out["b"].tvd == pytest.approx(0.0, abs=1e-12)
    assert out["a"].close and out["b"].close


def test_tcloseness_skewed_class_hand_value(spark):
    # global: x 3/4, y 1/4.  class "a" all-x: tvd = 1/2(|1-3/4| + 1/4)
    rows = [("a", "x")] * 2 + [("b", "x"), ("b", "y")]
    df = spark.createDataFrame(rows, ["qi", "s"])
    out = {r.qi: r for r in
           t_closeness_report(df, ["qi"], "s", t=0.2).collect()}
    assert out["a"].tvd == pytest.approx(0.25)
    assert not out["a"].close
    # class "b": |1/2-3/4|/2 + |1/2-1/4|/2 = 0.25
    assert out["b"].tvd == pytest.approx(0.25)
    assert out["a"].group_n == 2 and out["b"].group_n == 2


def test_tcloseness_absent_value_folds(spark):
    # class "a" never sees "z": the 1 - sum(q_present) fold must
    # equal enumerating |0 - q_z| explicitly
    rows = [("a", "x")] * 4 + [("b", "z")] * 4 + [("b", "x")] * 0
    df = spark.createDataFrame(rows, ["qi", "s"])
    out = {r.qi: r for r in
           t_closeness_report(df, ["qi"], "s", t=0.4).collect()}
    # global: x 1/2, z 1/2. class a all-x: 1/2(|1-1/2| + 1/2) = 1/2
    assert out["a"].tvd == pytest.approx(0.5)
    assert out["b"].tvd == pytest.approx(0.5)


def test_tcloseness_null_sensitive_excluded(spark):
    rows = [("a", "x"), ("a", None), ("a", "y")]
    df = spark.createDataFrame(rows, ["qi", "s"])
    r = t_closeness_report(df, ["qi"], "s", t=1.0).collect()[0]
    assert r.group_n == 2  # the NULL row is out of the audit


# ------------------------------------------------------------- woe

def test_woe_hand_replay(spark):
    rows = ([("a", 1)] * 6 + [("a", 0)] * 2
            + [("b", 1)] * 2 + [("b", 0)] * 6)
    out = {r.category: r for r in
           woe_iv(spark.createDataFrame(rows, ["c", "y"]),
                  "c", "y", smoothing=0.5).collect()}
    pt, nt, k, s = 8.0, 8.0, 2.0, 0.5
    for cat, pos, neg in [("a", 6, 2), ("b", 2, 6)]:
        dp = (pos + s) / (pt + s * k)
        dn = (neg + s) / (nt + s * k)
        assert out[cat].woe == pytest.approx(math.log(dp / dn))
        assert out[cat].iv_term == pytest.approx(
            (dp - dn) * math.log(dp / dn))
        assert out[cat].n == pos + neg
    # symmetric design: woe antisymmetric, iv terms equal
    assert out["a"].woe == pytest.approx(-out["b"].woe)
    assert out["a"].iv_term == pytest.approx(out["b"].iv_term)


def test_woe_pure_category_finite(spark):
    rows = [("a", 1)] * 5 + [("b", 0)] * 5
    out = {r.category: r for r in
           woe_iv(spark.createDataFrame(rows, ["c", "y"]),
                  "c", "y").collect()}
    assert np.isfinite(out["a"].woe) and np.isfinite(out["b"].woe)
    assert out["a"].woe > 0 > out["b"].woe


def test_woe_smoothed_masses_sum_to_one(spark):
    rng = np.random.RandomState(2)
    rows = [(chr(97 + int(c)), int(y)) for c, y in
            zip(rng.randint(0, 5, 200), rng.randint(0, 2, 200))]
    df = spark.createDataFrame(rows, ["c", "y"])
    got = woe_iv(df, "c", "y", smoothing=0.5).collect()
    pt = sum(r.pos for r in got)
    nt = sum(r.neg for r in got)
    k = len(got)
    dp = sum((r.pos + 0.5) / (pt + 0.5 * k) for r in got)
    dn = sum((r.neg + 0.5) / (nt + 0.5 * k) for r in got)
    assert dp == pytest.approx(1.0) and dn == pytest.approx(1.0)


def test_woe_uninformative_iv_near_zero(spark):
    rows = [("a", i % 2) for i in range(100)] \
        + [("b", i % 2) for i in range(100)]
    got = woe_iv(spark.createDataFrame(rows, ["c", "y"]),
                 "c", "y").collect()
    assert sum(r.iv_term for r in got) == pytest.approx(0.0, abs=1e-9)
