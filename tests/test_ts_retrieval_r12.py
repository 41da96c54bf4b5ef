"""Round-12: FIR EWMA, Dirichlet query likelihood, readability,
split-conformal — hand replays and contract pins."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lindel_spark.evaluation import conformal_split
from lindel_spark.retrieval import dirichlet_ql_topk
from lindel_spark.text import flesch_reading_ease, syllable_count
from lindel_spark.timeseries import ewma


# ---------------------------------------------------------------- ewma

def _series(spark, vals, key="k"):
    return spark.createDataFrame(
        [(key, i, 0, v) for i, v in enumerate(vals)],
        ["key", "ts", "tb", "v"])


def test_ewma_matches_numpy_fir(spark):
    rng = np.random.RandomState(4)
    vals = [float(v) for v in np.round(rng.randn(60) * 10 + 50, 2)]
    a, span = 0.3, 8
    out = {r.ts: r.ewma for r in
           ewma(_series(spark, vals), ["key"], "ts", "v", "tb",
                alpha=a, span=span).collect()}
    for t in range(len(vals)):
        num = sum((1 - a) ** j * vals[t - j]
                  for j in range(span) if t - j >= 0)
        den = sum((1 - a) ** j
                  for j in range(span) if t - j >= 0)
        assert out[t] == pytest.approx(num / den, rel=1e-12), t


def test_ewma_constant_series_identity(spark):
    out = ewma(_series(spark, [7.0] * 20), ["key"], "ts", "v", "tb",
               alpha=0.4, span=8).collect()
    for r in out:
        assert r.ewma == pytest.approx(7.0)


def test_ewma_null_gaps_drop_from_both_sides(spark):
    vals = [10.0, None, 20.0]
    out = {r.ts: r.ewma for r in
           ewma(_series(spark, vals), ["key"], "ts", "v", "tb",
                alpha=0.5, span=3).collect()}
    # t=2: weights 1(x=20) + 0.25(x=10); the NULL at lag1 is out
    assert out[2] == pytest.approx((20.0 + 0.25 * 10.0) / 1.25)
    assert out[1] == pytest.approx(10.0)  # only lag-1 present


def test_ewma_param_guards(spark):
    df = _series(spark, [1.0])
    with pytest.raises(ValueError):
        ewma(df, ["key"], "ts", "v", "tb", alpha=0.0)
    with pytest.raises(ValueError):
        ewma(df, ["key"], "ts", "v", "tb", span=65)


# ---------------------------------------------------------- dirichlet

def _docs(spark):
    rows = [(1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry date"),
            (4, "date elephant")]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_dirichlet_hand_replay(spark):
    docs = _docs(spark)
    qs = spark.createDataFrame([(100, "apple cherry")],
                               ["query_id", "query"])
    mu = 10.0
    out = {r.doc_id: r.score for r in
           dirichlet_ql_topk(docs, qs, k=10, mu=mu).collect()}
    # corpus: T = 3+2+4+2 = 11 tokens, cf(apple)=2, cf(cherry)=4
    T = 11.0
    def full(tfs, dl, cfs):
        return sum(math.log((tf + mu * cf / T) / (dl + mu))
                   for tf, cf in zip(tfs, cfs))
    # matched docs only (>=1 term): 1 (apple), 2,3 (cherry)
    assert set(out) == {1, 2, 3}
    assert out[1] == pytest.approx(full([2, 0], 3, [2, 4]), rel=1e-12)
    assert out[2] == pytest.approx(full([0, 1], 2, [2, 4]), rel=1e-12)
    assert out[3] == pytest.approx(full([0, 3], 4, [2, 4]), rel=1e-12)


def test_dirichlet_oov_terms_drop(spark):
    docs = _docs(spark)
    qs = spark.createDataFrame([(1, "apple zzzz")],
                               ["query_id", "query"])
    with_oov = {r.doc_id: r.score for r in
                dirichlet_ql_topk(docs, qs, mu=10.0).collect()}
    qs2 = spark.createDataFrame([(1, "apple")], ["query_id", "query"])
    without = {r.doc_id: r.score for r in
               dirichlet_ql_topk(docs, qs2, mu=10.0).collect()}
    assert with_oov == pytest.approx(without)


def test_dirichlet_rank_deterministic_ties(spark):
    docs = spark.createDataFrame(
        [(1, "same text"), (2, "same text")], ["doc_id", "text"])
    qs = spark.createDataFrame([(1, "same")], ["query_id", "query"])
    out = dirichlet_ql_topk(docs, qs, k=2).collect()
    ranks = {r.doc_id: r.rank for r in out}
    assert ranks == {1: 1, 2: 2}  # doc_id ascending on tie


# --------------------------------------------------------- readability

def test_syllables_and_flesch(spark):
    df = spark.createDataFrame([("The cat sat on the mat.",)], ["t"])
    r = df.select(
        syllable_count(F.col("t")).alias("sy"),
        flesch_reading_ease(F.col("t")).alias("f")).collect()[0]
    # vowel groups: e,a,a,o,e,a = 6
    assert r.sy == 6
    assert r.f == pytest.approx(206.835 - 1.015 * 6 - 84.6 * 6 / 6)


def test_flesch_empty_doc_finite(spark):
    df = spark.createDataFrame([("",)], ["t"])
    r = df.select(flesch_reading_ease(F.col("t")).alias("f")) \
        .collect()[0]
    assert math.isfinite(r.f)


# ----------------------------------------------------------- conformal

def test_conformal_exact_order_statistic(spark):
    # cal scores 1..100: k = ceil(101*0.9) = 91 -> qhat = 91
    cal = spark.createDataFrame(
        [(float(i),) for i in range(1, 101)], ["s"])
    tst = spark.createDataFrame(
        [(float(i),) for i in range(1, 101)], ["s"])
    r = conformal_split(cal, tst, "s", alpha=0.1).collect()[0]
    assert (r.n_cal, r.k, r.n_test) == (100, 91, 100)
    assert r.qhat == pytest.approx(91.0)
    assert r.coverage == pytest.approx(0.91)


def test_conformal_k_exceeds_n_infinite_threshold(spark):
    cal = spark.createDataFrame([(1.0,), (2.0,)], ["s"])
    tst = spark.createDataFrame([(99.0,)], ["s"])
    r = conformal_split(cal, tst, "s", alpha=0.1).collect()[0]
    # k = ceil(3*0.9) = 3 > 2 -> qhat NULL, coverage 1 by definition
    assert r.k == 3 and r.qhat is None
    assert r.coverage == pytest.approx(1.0)


def test_conformal_guarantee_on_exchangeable_split(spark):
    rng = np.random.RandomState(8)
    s = rng.randn(2000)
    cal = spark.createDataFrame([(float(v),) for v in s[::2]], ["s"])
    tst = spark.createDataFrame([(float(v),) for v in s[1::2]], ["s"])
    r = conformal_split(cal, tst, "s", alpha=0.1).collect()[0]
    assert r.coverage >= 0.88  # 1 - alpha with finite-sample slack
    assert r.qhat is not None


def test_conformal_alpha_guard(spark):
    df = spark.createDataFrame([(1.0,)], ["s"])
    with pytest.raises(ValueError):
        conformal_split(df, df, "s", alpha=1.5)
