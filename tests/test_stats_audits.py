"""Round-11 statistics/audit operators: Gini, mutual information,
functional-dependency violations, Cohen's kappa, lag-k ACF — each vs
hand-computed or NumPy references."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lindel_spark.profile import (
    agreement_kappa,
    fd_violations,
    gini_coefficient,
    mutual_information,
)
from lindel_spark.timeseries import acf


# ---------------------------------------------------------------- gini

def test_gini_uniform_is_zero(spark):
    df = spark.createDataFrame([(1.0,)] * 8, ["v"])
    row = gini_coefficient(df, "v").collect()[0]
    assert row.n == 8
    assert row.gini == pytest.approx(0.0, abs=1e-12)


def test_gini_single_holder(spark):
    # [0,0,0,1]: G = 2*4/(4*1) - 5/4 = 0.75
    df = spark.createDataFrame([(0.0,), (0.0,), (0.0,), (1.0,)], ["v"])
    row = gini_coefficient(df, "v").collect()[0]
    assert row.gini == pytest.approx(0.75, abs=1e-12)


def test_gini_matches_numpy_reference(spark):
    vals = [float((i * 37) % 101) + 1.0 for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    got = gini_coefficient(df, "v").collect()[0].gini
    x = np.sort(np.array(vals))
    n = len(x)
    ref = 2.0 * np.sum(np.arange(1, n + 1) * x) / (n * x.sum()) \
        - (n + 1.0) / n
    assert got == pytest.approx(ref, abs=1e-9)


def test_gini_grouped_matches_ungrouped(spark):
    vals = [("a", float((i * 13) % 47)) for i in range(200)] + \
           [("b", float((i * 7) % 31) + 2.0) for i in range(150)]
    df = spark.createDataFrame(vals, ["k", "v"])
    grouped = {r.k: r.gini
               for r in gini_coefficient(df, "v", keys=["k"]).collect()}
    for k in ("a", "b"):
        solo = gini_coefficient(df.filter(F.col("k") == k), "v") \
            .collect()[0].gini
        assert grouped[k] == pytest.approx(solo, abs=1e-9)


def test_gini_tie_invariant_under_repartition(spark):
    # heavy ties: value-deterministic regardless of rank placement
    vals = [(float(i % 3),) for i in range(300)]
    a = gini_coefficient(
        spark.createDataFrame(vals, ["v"]), "v").collect()[0].gini
    b = gini_coefficient(
        spark.createDataFrame(vals, ["v"]).repartition(7), "v") \
        .collect()[0].gini
    assert a == pytest.approx(b, abs=1e-12)


# -------------------------------------------- mutual information

def test_mi_identical_columns_equals_entropy(spark):
    df = spark.createDataFrame(
        [(str(i % 4), str(i % 4)) for i in range(400)], ["a", "b"])
    r = mutual_information(df, "a", "b").collect()[0]
    assert r.h_a == pytest.approx(math.log(4), abs=1e-9)
    assert r.mi == pytest.approx(r.h_a, abs=1e-9)
    assert r.nmi == pytest.approx(1.0, abs=1e-9)


def test_mi_independent_columns_is_zero(spark):
    # perfectly balanced product distribution => exact independence
    rows = [(str(i % 3), str(j % 5))
            for i in range(3) for j in range(5) for _ in range(10)]
    df = spark.createDataFrame(rows, ["a", "b"])
    r = mutual_information(df, "a", "b").collect()[0]
    assert r.mi == pytest.approx(0.0, abs=1e-9)
    assert r.nmi == pytest.approx(0.0, abs=1e-9)


def test_mi_matches_sklearn_style_reference(spark):
    rng = np.random.RandomState(7)
    a = rng.randint(0, 4, 1000)
    b = (a + rng.randint(0, 2, 1000)) % 4
    df = spark.createDataFrame(
        [(str(int(x)), str(int(y))) for x, y in zip(a, b)], ["a", "b"])
    r = mutual_information(df, "a", "b").collect()[0]
    # reference MI from the contingency table
    n = len(a)
    mi = 0.0
    for va in range(4):
        for vb in range(4):
            c = int(np.sum((a == va) & (b == vb)))
            if c == 0:
                continue
            ca = int(np.sum(a == va))
            cb = int(np.sum(b == vb))
            mi += c / n * math.log(n * c / (ca * cb))
    assert r.mi == pytest.approx(mi, abs=1e-9)


def test_mi_constant_column_nmi_zero(spark):
    df = spark.createDataFrame(
        [("x", str(i % 3)) for i in range(30)], ["a", "b"])
    r = mutual_information(df, "a", "b").collect()[0]
    assert r.h_a == pytest.approx(0.0, abs=1e-12)
    assert r.mi == pytest.approx(0.0, abs=1e-9)
    assert r.nmi == 0.0


# ------------------------------------------------- fd violations

def test_fd_held_dependency_empty(spark):
    df = spark.createDataFrame(
        [(i, i % 5, f"m{i % 5}") for i in range(100)],
        ["id", "brand", "mfgr"])
    assert fd_violations(df, ["brand"], "mfgr").count() == 0


def test_fd_violated_groups_reported_with_evidence(spark):
    rows = [(1, "x"), (1, "y"), (1, "x"), (2, "z"), (3, "p"), (3, "q")]
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {r.k: r for r in fd_violations(df, ["k"], "v").collect()}
    assert set(got) == {1, 3}
    assert got[1].n_rows == 3 and got[1].n_dependent == 2
    assert (got[1].example_lo, got[1].example_hi) == ("x", "y")
    assert (got[3].example_lo, got[3].example_hi) == ("p", "q")


def test_fd_null_counts_as_conflicting_value(spark):
    rows = [(1, "x"), (1, None), (2, None), (2, None)]
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {r.k for r in fd_violations(df, ["k"], "v").collect()}
    # group 1: {'x', NULL} = 2 dependent values -> violated;
    # group 2: {NULL} only -> held
    assert got == {1}


# ---------------------------------------------------------- kappa

def test_kappa_textbook_2x2(spark):
    # classic example: po=0.7, pe=0.5 -> kappa=0.4
    # table: yes/yes 25, yes/no 10, no/yes 20, no/no 45
    rows = ([("y", "y")] * 25 + [("y", "n")] * 10
            + [("n", "y")] * 20 + [("n", "n")] * 45)
    df = spark.createDataFrame(rows, ["a", "b"])
    r = agreement_kappa(df, "a", "b").collect()[0]
    assert r.n == 100
    assert r.po == pytest.approx(0.70, abs=1e-12)
    # pe = (35*45 + 65*55)/100^2 = 0.515
    assert r.pe == pytest.approx(0.515, abs=1e-12)
    assert r.kappa == pytest.approx((0.70 - 0.515) / (1 - 0.515),
                                    abs=1e-12)


def test_kappa_zero_diagonal_category_still_in_pe(spark):
    # category 'c' used by both raters but never agreed on: its
    # row*col term must still enter pe (the joint-diagonal shortcut
    # would drop it)
    rows = [("a", "a")] * 4 + [("c", "b")] * 3 + [("b", "c")] * 3
    df = spark.createDataFrame(rows, ["a", "b"])
    r = agreement_kappa(df, "a", "b").collect()[0]
    # marginals a: a=4, c=3, b=3 ; b: a=4, b=3, c=3
    # pe = (4*4 + 3*3 + 3*3)/100 = 0.34
    assert r.pe == pytest.approx(0.34, abs=1e-12)
    assert r.po == pytest.approx(0.4, abs=1e-12)


def test_kappa_perfect_and_constant(spark):
    df = spark.createDataFrame(
        [(str(i % 3), str(i % 3)) for i in range(30)], ["a", "b"])
    assert agreement_kappa(df, "a", "b").collect()[0].kappa \
        == pytest.approx(1.0, abs=1e-12)
    const = spark.createDataFrame([("x", "x")] * 10, ["a", "b"])
    r = agreement_kappa(const, "a", "b").collect()[0]
    assert r.pe == pytest.approx(1.0, abs=1e-12)
    assert r.kappa == 1.0


# ------------------------------------------------------------ acf

def _series(spark, vals, key="k"):
    rows = [(key, i, float(v)) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, ["k", "t", "v"])


def test_acf_linear_series_is_one(spark):
    df = _series(spark, range(50))
    out = {r.lag: r for r in
           acf(df, ["k"], "t", "v", "t", lags=[1, 3]).collect()}
    assert out[1].acf == pytest.approx(1.0, abs=1e-9)
    assert out[3].acf == pytest.approx(1.0, abs=1e-9)
    assert out[1].n_pairs == 49 and out[3].n_pairs == 47


def test_acf_alternating_series_lag1_is_minus_one(spark):
    df = _series(spark, [1.0 if i % 2 else -1.0 for i in range(40)])
    out = {r.lag: r.acf for r in
           acf(df, ["k"], "t", "v", "t", lags=[1, 2]).collect()}
    assert out[1] == pytest.approx(-1.0, abs=1e-9)
    assert out[2] == pytest.approx(1.0, abs=1e-9)


def test_acf_constant_series_is_null(spark):
    df = _series(spark, [5.0] * 20)
    rows = acf(df, ["k"], "t", "v", "t", lags=[1]).collect()
    assert rows[0].acf is None


def test_acf_matches_numpy_pearson(spark):
    rng = np.random.RandomState(3)
    vals = np.cumsum(rng.randn(200))
    df = _series(spark, vals)
    out = {r.lag: r.acf for r in
           acf(df, ["k"], "t", "v", "t", lags=[1, 5]).collect()}
    for k in (1, 5):
        x, y = vals[:-k], vals[k:]
        ref = np.corrcoef(x, y)[0, 1]
        assert out[k] == pytest.approx(ref, abs=1e-9)


def test_acf_per_key_independent(spark):
    a = [(("a"), i, float(i)) for i in range(30)]
    b = [(("b"), i, float(-i)) for i in range(30)]
    df = spark.createDataFrame(a + b, ["k", "t", "v"])
    out = {(r.k, r.lag): r.acf for r in
           acf(df, ["k"], "t", "v", "t", lags=[1]).collect()}
    assert out[("a", 1)] == pytest.approx(1.0, abs=1e-9)
    assert out[("b", 1)] == pytest.approx(1.0, abs=1e-9)


def test_acf_rejects_bad_lags(spark):
    df = _series(spark, range(10))
    with pytest.raises(ValueError):
        acf(df, ["k"], "t", "v", "t", lags=[])
    with pytest.raises(ValueError):
        acf(df, ["k"], "t", "v", "t", lags=[0])


def test_kappa_disjoint_label_sets_zero(spark):
    # raters share NO category: pe has zero shared mass -> kappa = po
    df = spark.createDataFrame([("cat", "dog")] * 10, ["a", "b"])
    r = agreement_kappa(df, "a", "b").collect()[0]
    assert r.pe == 0.0 and r.po == 0.0 and r.kappa == 0.0
