"""Round-15 isotonic calibration: equivalence to a reference
weighted PAV, monotonicity, identity on already-monotone input."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lindel_spark.evaluation import isotonic_calibrate


def _pav_fit(rates, weights):
    """Per-bin fitted values from sequential weighted PAV."""
    blocks = []  # (value, weight, count_of_bins)
    for r, w in zip(rates, weights):
        blocks.append([r, w, 1])
        while len(blocks) > 1 and blocks[-2][0] > blocks[-1][0]:
            r2, w2, c2 = blocks.pop()
            r1, w1, c1 = blocks.pop()
            blocks.append([(r1 * w1 + r2 * w2) / (w1 + w2),
                           w1 + w2, c1 + c2])
    fit = []
    for r, w, c in blocks:
        fit += [r] * c
    return fit


def _score_label_df(spark, rows):
    return spark.createDataFrame(rows, "s double, y long")


def test_isotonic_matches_reference_pav(spark):
    # scores drive bins; labels deliberately NON-monotone in score so
    # PAV has to pool
    rng = np.random.RandomState(9)
    rows = []
    for i in range(2000):
        s = rng.rand()
        # true prob dips in the middle -> violations to pool
        p = 0.2 + 0.6 * s - 0.3 * np.sin(s * 6.28) ** 2
        rows.append((float(s), int(rng.rand() < p)))
    out = isotonic_calibrate(
        _score_label_df(spark, rows), "s", "y", n_bins=16) \
        .orderBy("bin").collect()
    rates = [r.rate for r in out]
    weights = [float(r.n) for r in out]
    want = _pav_fit(rates, weights)
    got = [r.calibrated for r in out]
    assert got == pytest.approx(want, abs=1e-12)
    # monotone non-decreasing
    assert all(got[i] <= got[i + 1] + 1e-15
               for i in range(len(got) - 1))


def test_isotonic_identity_when_monotone(spark):
    # rates already increasing -> calibrated == rate exactly
    rows = []
    for b, p in ((0, 0.1), (1, 0.5), (2, 0.9)):
        s = (b + 0.5) / 3.0
        rows += [(s, 1)] * int(p * 10) + [(s, 0)] * (10 - int(p * 10))
    out = isotonic_calibrate(_score_label_df(spark, rows),
                             "s", "y", n_bins=3).orderBy("bin") \
        .collect()
    for r in out:
        assert r.calibrated == pytest.approx(r.rate, abs=0.0)
        assert r.n == 10


def test_isotonic_pools_single_violation(spark):
    # two bins, rates 0.8 then 0.2, equal weight -> both pool to 0.5
    rows = ([(0.1, 1)] * 8 + [(0.1, 0)] * 2
            + [(0.9, 1)] * 2 + [(0.9, 0)] * 8)
    out = isotonic_calibrate(_score_label_df(spark, rows),
                             "s", "y", n_bins=2).orderBy("bin") \
        .collect()
    assert [r.calibrated for r in out] == pytest.approx([0.5, 0.5])
    assert [r.rate for r in out] == pytest.approx([0.8, 0.2])


def test_isotonic_empty_bins_skipped_and_validates(spark):
    rows = [(0.05, 0), (0.95, 1)]
    out = isotonic_calibrate(_score_label_df(spark, rows),
                             "s", "y", n_bins=10).collect()
    assert sorted(r.bin for r in out) == [0, 9]
    with pytest.raises(ValueError):
        isotonic_calibrate(_score_label_df(spark, rows), "s", "y",
                           n_bins=0)


# ---- Brier decomposition -------------------------------------------

def test_brier_decomposition_identity_and_numpy(spark):
    import numpy as np
    from lindel_spark.evaluation import brier_decomposition
    rng = np.random.RandomState(14)
    n = 3000
    s = rng.rand(n)
    y = (rng.rand(n) < 0.3 + 0.5 * s).astype(int)
    df = spark.createDataFrame(
        [(float(s[i]), int(y[i])) for i in range(n)],
        "s double, y int")
    r = brier_decomposition(df, "s", "y", n_bins=10).collect()[0]
    bins = np.minimum(9, np.floor(s * 10).astype(int))
    rel = res = 0.0
    obar = y.mean()
    for b in range(10):
        m = bins == b
        if not m.any():
            continue
        rel += m.sum() * (s[m].mean() - y[m].mean()) ** 2
        res += m.sum() * (y[m].mean() - obar) ** 2
    rel, res = rel / n, res / n
    unc = obar * (1 - obar)
    assert r.n == n
    assert r.reliability == pytest.approx(rel, rel=1e-9)
    assert r.resolution == pytest.approx(res, rel=1e-9)
    assert r.uncertainty == pytest.approx(unc, rel=1e-12)
    assert r.brier_binned == pytest.approx(rel - res + unc,
                                           rel=1e-9)
    # binned-forecast Brier equals the identity directly
    pbar = np.array([s[bins == b].mean() if (bins == b).any()
                     else 0 for b in range(10)])
    binned_brier = np.mean((pbar[bins] - y) ** 2)
    assert r.brier_binned == pytest.approx(binned_brier, rel=1e-9)


def test_brier_decomposition_perfect_and_uninformative(spark):
    from lindel_spark.evaluation import brier_decomposition
    # uninformative constant score 0.5 with 50/50 labels: RES = 0,
    # REL = (0.5-0.5)^2 = 0, UNC = 0.25
    rows = [(0.5, i % 2) for i in range(100)]
    df = spark.createDataFrame(rows, "s double, y int")
    r = brier_decomposition(df, "s", "y", n_bins=4).collect()[0]
    assert r.resolution == pytest.approx(0.0, abs=1e-12)
    assert r.reliability == pytest.approx(0.0, abs=1e-12)
    assert r.uncertainty == pytest.approx(0.25, abs=1e-12)
    with pytest.raises(ValueError):
        brier_decomposition(df, "s", "y", n_bins=0)
