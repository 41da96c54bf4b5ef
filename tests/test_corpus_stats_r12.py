"""Round-12: script profile, Heaps' law fit, two-proportion z-test,
Kaplan–Meier survival — hand replays and edge semantics."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lindel_spark.profile import two_proportion_ztest
from lindel_spark.text import heaps_fit, script_profile
from lindel_spark.timeseries import kaplan_meier


# -------------------------------------------------------------- script

def test_script_profile_fractions(spark):
    df = spark.createDataFrame([("abc де 12",)], ["t"])
    r = df.select(script_profile(F.col("t")).alias("p")).collect()[0].p
    # body = "abcде12": 7 chars; 3 latin, 2 cyrillic, 2 digits
    assert r.latin_frac == pytest.approx(3 / 7)
    assert r.cyrillic_frac == pytest.approx(2 / 7)
    assert r.digit_frac == pytest.approx(2 / 7)
    assert r.cjk_frac == pytest.approx(0.0)


def test_script_profile_empty_safe(spark):
    df = spark.createDataFrame([("",)], ["t"])
    r = df.select(script_profile(F.col("t")).alias("p")).collect()[0].p
    assert r.latin_frac == 0.0 and r.cjk_frac == 0.0


# --------------------------------------------------------------- heaps

def test_heaps_fit_power_law_recovered(spark):
    # construct V(n) = 4*n^0.5 exactly: doc n introduces
    # 4*(sqrt(n) - sqrt(n-1)) ... easier: give doc n exactly
    # V(n) - V(n-1) brand-new tokens plus one repeat token
    rows, vocab = [], 0
    for n in range(1, 65):
        target = int(round(4 * math.sqrt(n)))
        new = [f"w{vocab + i}" for i in range(target - vocab)]
        vocab = max(vocab, target)
        rows.append((n, " ".join(new + ["common"])))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    r = heaps_fit(df).collect()[0]
    assert r.n_docs == 64
    assert r.vocab == vocab + 1  # + "common"
    assert 0.4 < r.beta < 0.6  # the planted 0.5 within fit noise


def test_heaps_fit_matches_numpy_ols(spark):
    rows = [(1, "a b c"), (2, "a d"), (3, "b e f"), (4, "a b")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    r = heaps_fit(df).collect()[0]
    # first ranks: a,b,c -> 1; d -> 2; e,f -> 3. growth: V(1)=3,
    # V(2)=4, V(3)=6 (doc 4 adds nothing -> no point at n=4)
    x = np.log([1, 2, 3])
    y = np.log([3, 4, 6])
    beta, lnk = np.polyfit(x, y, 1)
    assert r.vocab == 6 and r.n_docs == 4
    assert r.beta == pytest.approx(beta, rel=1e-9)
    assert r.ln_k == pytest.approx(lnk, rel=1e-9)


# ---------------------------------------------------------- proportion

def test_two_proportion_matches_numpy(spark):
    rng = np.random.RandomState(12)
    x = rng.randint(0, 2, 500)
    g = rng.randint(0, 2, 500)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(x, g)], ["x", "g"])
    r = two_proportion_ztest(df, "x", "g").collect()[0]
    n1, n0 = g.sum(), (1 - g).sum()
    s1, s0 = x[g == 1].sum(), x[g == 0].sum()
    p1, p0 = s1 / n1, s0 / n0
    pp = (s1 + s0) / (n1 + n0)
    z = (p1 - p0) / math.sqrt(pp * (1 - pp) * (1 / n1 + 1 / n0))
    assert (r.n1, r.n0) == (n1, n0)
    assert r.p1 == pytest.approx(p1) and r.p0 == pytest.approx(p0)
    assert r.z == pytest.approx(z, rel=1e-12)


def test_two_proportion_degenerate_null(spark):
    df = spark.createDataFrame([(1, 1), (1, 0)], ["x", "g"])
    r = two_proportion_ztest(df, "x", "g").collect()[0]
    assert r.z is None  # pooled rate 1 -> zero variance


# ------------------------------------------------------------------ km

def test_km_textbook_example(spark):
    # classic toy: deaths at 1 (1 of 5), 3 (1 of 3); censored at 2, 4
    rows = [(1.0, 1), (2.0, 0), (3.0, 1), (4.0, 0), (5.0, 0)]
    df = spark.createDataFrame(rows, ["t", "e"])
    out = {r.t: r for r in kaplan_meier(df, "t", "e").collect()}
    assert set(out) == {1.0, 3.0}
    assert out[1.0].n_risk == 5
    assert out[1.0].survival == pytest.approx(4 / 5)
    assert out[3.0].n_risk == 3
    assert out[3.0].survival == pytest.approx(4 / 5 * 2 / 3)


def test_km_all_events_no_censoring_matches_ecdf(spark):
    # with no censoring KM = 1 - ECDF (at event times)
    vals = [1.0, 2.0, 2.0, 3.0, 5.0, 8.0]
    df = spark.createDataFrame([(v, 1) for v in vals], ["t", "e"])
    out = {r.t: r.survival for r in
           kaplan_meier(df, "t", "e").collect()}
    n = len(vals)
    for t in sorted(set(vals)):
        ecdf = sum(v <= t for v in vals) / n
        assert out[t] == pytest.approx(1 - ecdf, abs=1e-12)


def test_km_risk_set_wipeout_yields_zero(spark):
    df = spark.createDataFrame([(1.0, 1), (1.0, 1)], ["t", "e"])
    out = kaplan_meier(df, "t", "e").collect()
    assert out[0].survival == pytest.approx(0.0)
