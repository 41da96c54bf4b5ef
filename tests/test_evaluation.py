"""Evaluation metrics (ROC-AUC, Brier, calibration), CUSUM
change-points, and the one-pass correlation matrix."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lindel_spark.evaluation import brier_score, calibration_bins, roc_auc
from lindel_spark.features import corr_matrix
from lindel_spark.timeseries import cusum_changepoints


# -------------------------------------------------------------- auc

def _pairs(spark, rows):
    return spark.createDataFrame(rows, ["s", "y"])


def test_auc_perfect_separation(spark):
    rows = [(float(i), 0) for i in range(10)] + \
           [(float(i + 10), 1) for i in range(10)]
    r = roc_auc(_pairs(spark, rows), "s", "y").collect()[0]
    assert r.auc == pytest.approx(1.0, abs=1e-12)
    assert r.n_pos == 10 and r.n_neg == 10


def test_auc_all_tied_is_half(spark):
    rows = [(0.5, i % 2) for i in range(40)]
    r = roc_auc(_pairs(spark, rows), "s", "y").collect()[0]
    assert r.auc == pytest.approx(0.5, abs=1e-12)


def test_auc_matches_rank_reference(spark):
    rng = np.random.RandomState(11)
    y = rng.randint(0, 2, 500)
    # quantized scores -> plenty of ties
    s = np.round(rng.rand(500) * 0.6 + y * 0.3, 2)
    r = roc_auc(_pairs(spark, [(float(a), int(b))
                               for a, b in zip(s, y)]),
                "s", "y").collect()[0]
    # midrank reference
    order = np.argsort(s, kind="mergesort")
    ranks = np.empty(len(s), dtype=float)
    sorted_s = s[order]
    i = 0
    pos = 1
    while i < len(s):
        j = i
        while j < len(s) and sorted_s[j] == sorted_s[i]:
            j += 1
        mid = (pos + pos + (j - i) - 1) / 2.0
        ranks[order[i:j]] = mid
        pos += j - i
        i = j
    n_pos = int(y.sum())
    n_neg = len(y) - n_pos
    ref = (ranks[y == 1].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
    assert r.auc == pytest.approx(ref, abs=1e-12)


def test_auc_degenerate_labels_null(spark):
    r = roc_auc(_pairs(spark, [(0.1, 1), (0.9, 1)]), "s", "y") \
        .collect()[0]
    assert r.auc is None


# ------------------------------------------------------ brier/bins

def test_brier_hand_computed(spark):
    rows = [(0.8, 1), (0.2, 0), (0.5, 1), (0.9, 0)]
    r = brier_score(_pairs(spark, rows), "s", "y").collect()[0]
    ref = (0.04 + 0.04 + 0.25 + 0.81) / 4
    assert r.brier == pytest.approx(ref, abs=1e-12)
    assert r.base_rate == pytest.approx(0.5, abs=1e-12)


def test_calibration_bins_edges(spark):
    rows = [(0.0, 0), (0.05, 0), (0.95, 1), (1.0, 1)]
    out = {r.bin: r for r in
           calibration_bins(_pairs(spark, rows), "s", "y",
                            n_bins=10).collect()}
    assert set(out) == {0, 9}
    assert out[0].n == 2 and out[9].n == 2  # 1.0 closes into bin 9
    assert out[9].frac_pos == 1.0
    with pytest.raises(ValueError):
        calibration_bins(_pairs(spark, rows), "s", "y", n_bins=0)


# ------------------------------------------------------------ cusum

def _series(spark, vals):
    return spark.createDataFrame(
        [("k", i, float(v)) for i, v in enumerate(vals)],
        ["k", "t", "v"])


def test_cusum_matches_recursion(spark):
    rng = np.random.RandomState(2)
    vals = list(rng.randn(100) * 2 + 10)
    df = _series(spark, vals)
    out = cusum_changepoints(df, ["k"], "t", "v", "t",
                             target=10.0, slack=0.5, threshold=5.0)
    got = {r.t: (r.cusum_hi, r.cusum_lo) for r in out.collect()}
    shi = slo = 0.0
    for i, x in enumerate(vals):
        shi = max(0.0, shi + (x - 10.0 - 0.5))
        slo = max(0.0, slo - (x - 10.0) - 0.5)
        assert got[i][0] == pytest.approx(shi, abs=1e-9), i
        assert got[i][1] == pytest.approx(slo, abs=1e-9), i


def test_cusum_detects_sustained_shift(spark):
    vals = [10.0] * 50 + [12.0] * 50  # +2 shift, slack 0.5
    df = _series(spark, vals)
    out = cusum_changepoints(df, ["k"], "t", "v", "t",
                             target=10.0, slack=0.5, threshold=10.0)
    rows = sorted(out.collect(), key=lambda r: r.t)
    assert not any(r.alarm_hi for r in rows[:50])
    assert rows[-1].alarm_hi  # 50 * 1.5 = 75 >> 10
    # first alarm roughly 10/1.5 ~ 7 points after the shift
    first = next(r.t for r in rows if r.alarm_hi)
    assert 50 < first < 60
    assert not any(r.alarm_lo for r in rows)


def test_cusum_lo_side_mirror(spark):
    vals = [10.0] * 20 + [7.0] * 20
    out = cusum_changepoints(_series(spark, vals), ["k"], "t", "v",
                             "t", target=10.0, slack=0.5,
                             threshold=10.0)
    rows = sorted(out.collect(), key=lambda r: r.t)
    assert rows[-1].alarm_lo and not rows[-1].alarm_hi


# ------------------------------------------------------ corr matrix

def test_corr_matrix_matches_numpy(spark):
    rng = np.random.RandomState(4)
    X = rng.randn(300, 3)
    X[:, 1] = X[:, 0] * 0.7 + X[:, 1] * 0.3
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in X],
        ["x", "y", "z"])
    got = {(r.col_a, r.col_b): r.corr
           for r in corr_matrix(df, ["x", "y", "z"]).collect()}
    ref = np.corrcoef(X.T)
    names = ["x", "y", "z"]
    for i in range(3):
        for j in range(i, 3):
            assert got[(names[i], names[j])] == pytest.approx(
                ref[i, j], abs=1e-9)


def test_corr_matrix_pairwise_complete_nulls(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0), (2.0, None), (3.0, 6.0), (None, 1.0), (5.0, 10.0)],
        ["a", "b"])
    got = {(r.col_a, r.col_b): r
           for r in corr_matrix(df, ["a", "b"]).collect()}
    r = got[("a", "b")]
    assert r.n == 3  # only rows where both present
    assert r.corr == pytest.approx(1.0, abs=1e-9)  # (1,2),(3,6),(5,10)


def test_corr_matrix_constant_column_null(spark):
    df = spark.createDataFrame(
        [(float(i), 7.0) for i in range(10)], ["a", "b"])
    got = {(r.col_a, r.col_b): r.corr
           for r in corr_matrix(df, ["a", "b"]).collect()}
    assert got[("a", "b")] is None
    assert got[("b", "b")] is None
    assert got[("a", "a")] == pytest.approx(1.0, abs=1e-12)
    with pytest.raises(ValueError):
        corr_matrix(df, ["a"])


def test_corr_matrix_separator_collision_safe(spark):
    df = spark.createDataFrame(
        [(float(i), float(i) * 2, float(-i)) for i in range(50)],
        ["a__b", "a", "b__a"])
    got = {(r.col_a, r.col_b): r.corr
           for r in corr_matrix(df, ["a__b", "a", "b__a"]).collect()}
    assert len(got) == 6
    assert got[("a__b", "a")] == pytest.approx(1.0, abs=1e-9)
    assert got[("a", "b__a")] == pytest.approx(-1.0, abs=1e-9)


def test_average_precision_matches_sklearn_formula(spark):
    """Hand replay of the step-wise AP on a small scored set with
    ties — must equal the direct Python computation (sklearn's
    average_precision_score definition)."""
    from lindel_spark.evaluation import average_precision

    rows = [(0.9, 1), (0.8, 0), (0.8, 1), (0.7, 0), (0.6, 1),
            (0.5, 0), (0.5, 0), (0.4, 1), (0.3, 0), (0.2, 0)]
    df = spark.createDataFrame(rows, "s double, y int")
    got = average_precision(df, "s", "y").collect()[0]
    # python replay over distinct thresholds descending
    from collections import Counter
    pos = Counter(); cnt = Counter()
    for s, y in rows:
        pos[s] += y; cnt[s] += 1
    n_pos = sum(y for _, y in rows)
    cp = cc = 0; ap = 0.0
    for s in sorted(pos, reverse=True):
        cp += pos[s]; cc += cnt[s]
        if pos[s]:
            ap += (pos[s] / n_pos) * (cp / cc)
    assert got.n_pos == 4 and got.n_neg == 6
    assert abs(got.ap - ap) < 1e-12
    # perfect ranking -> AP = 1; degenerate no-positives -> NULL
    perfect = spark.createDataFrame(
        [(1.0, 1), (0.9, 1), (0.1, 0)], "s double, y int")
    assert abs(average_precision(perfect, "s", "y").collect()[0].ap
               - 1.0) < 1e-12
    nopos = spark.createDataFrame([(0.5, 0)], "s double, y int")
    assert average_precision(nopos, "s", "y").collect()[0].ap is None


def test_average_precision_beats_auc_under_imbalance(spark):
    """The reason AP exists: with 2 positives in 200 rows, a model
    that ranks one positive first and buries the other scores near
    0.5 AP but still decent AUC — assert AP is the more pessimistic
    (discriminating) number here."""
    from lindel_spark.evaluation import average_precision, roc_auc

    rows = [(1.0, 1)] + [(0.5 - i * 0.001, 0) for i in range(198)] \
        + [(0.5 - 147.5 * 0.001, 1)]  # 2nd positive buried mid-pack
    df = spark.createDataFrame(rows, "s double, y int")
    ap = average_precision(df, "s", "y").collect()[0].ap
    auc = roc_auc(df, "s", "y").collect()[0].auc
    assert ap < auc, (ap, auc)
    assert 0.5 <= ap <= 0.52
