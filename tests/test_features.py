"""Feature-scaling transforms vs independent NumPy references."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lindel_spark import features as FE


@pytest.fixture(scope="module")
def df(spark):
    vals = [(i, float((i * 37) % 101), float(i % 7)) for i in range(500)]
    return spark.createDataFrame(vals, ["id", "x", "y"])


def test_standard_scale_matches_numpy(df):
    got = {r.id: (r.x_z, r.y_z)
           for r in FE.standard_scale(df, ["x", "y"]).collect()}
    rows = sorted(df.collect(), key=lambda r: r.id)
    x = np.array([r.x for r in rows])
    y = np.array([r.y for r in rows])
    zx = (x - x.mean()) / x.std()
    zy = (y - y.mean()) / y.std()
    for i, r in enumerate(rows):
        assert got[r.id][0] == pytest.approx(zx[i], abs=1e-9)
        assert got[r.id][1] == pytest.approx(zy[i], abs=1e-9)


def test_standard_scale_constant_column_is_zero(spark):
    d = spark.createDataFrame([(i, 5.0) for i in range(10)],
                              ["id", "c"])
    out = FE.standard_scale(d, "c").collect()
    assert all(r.c_z == 0.0 for r in out)


def test_minmax_scale_bounds_and_values(df):
    got = {r.id: r.x_mm
           for r in FE.minmax_scale(df, "x").collect()}
    xs = {r.id: r.x for r in df.collect()}
    lo, hi = min(xs.values()), max(xs.values())
    for i, v in xs.items():
        assert got[i] == pytest.approx((v - lo) / (hi - lo), abs=1e-12)
        assert 0.0 <= got[i] <= 1.0
    # custom range
    got5 = {r.id: r.x_mm
            for r in FE.minmax_scale(df, "x", lo=-1, hi=1).collect()}
    for i, v in xs.items():
        assert got5[i] == pytest.approx(
            -1 + (v - lo) / (hi - lo) * 2, abs=1e-12)


def test_quantile_normalize_ties_share_average_rank(spark):
    d = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 20.0), (4, 40.0)], ["id", "v"])
    got = {r.id: r.quantile
           for r in FE.quantile_normalize(d, "v", "id").collect()}
    # ranks: 10->1, 20->avg(2,3)=2.5, 40->4; q=(r-0.5)/4
    assert got[1] == pytest.approx(0.5 / 4)
    assert got[2] == got[3] == pytest.approx(2.0 / 4)
    assert got[4] == pytest.approx(3.5 / 4)


def test_quantile_normalize_uniform_output(df):
    qs = sorted(r.quantile for r in
                FE.quantile_normalize(df, "x", "id").collect())
    # empirical quantiles cover (0, 1) roughly uniformly
    assert 0.0 < qs[0] < 0.05 and 0.95 < qs[-1] < 1.0
    mean_q = sum(qs) / len(qs)
    assert mean_q == pytest.approx(0.5, abs=0.01)


def test_quantile_normalize_null_passthrough(spark):
    d = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 3.0)], "id long, v double")
    got = {r.id: r.quantile
           for r in FE.quantile_normalize(d, "v", "id").collect()}
    assert got[2] is None
    assert got[1] is not None and got[3] is not None


def test_robust_scale_hand_computed_and_outlier_immune(spark):
    from lindel_spark.features import robust_scale

    # values 1..9 plus a wild outlier; median 5.5 -> with 1e6 the
    # median of [1..9, 1e6] is 5.5, adevs [4.5,3.5,...,0.5,...,1e6-5.5]
    vals = [float(v) for v in range(1, 10)] + [1e6]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "id long, v double")
    out = {r.id: r.v_rb for r in robust_scale(df, ["v"]).collect()}
    import numpy as np
    med = np.median(vals)
    mad = np.median(np.abs(np.array(vals) - med))
    for i, v in enumerate(vals):
        assert abs(out[i] - (v - med) / (mad * 1.4826)) < 1e-9
    # the outlier cannot blow up the bulk's scale: scaled bulk stays O(1)
    assert all(abs(out[i]) < 3 for i in range(9))


def test_robust_scale_zero_mad_and_multi_col(spark):
    from lindel_spark.features import robust_scale

    df = spark.createDataFrame(
        [(1, 5.0, 1.0), (2, 5.0, 2.0), (3, 5.0, 3.0)],
        "id long, c double, v double")
    out = robust_scale(df, ["c", "v"]).collect()
    assert all(r.c_rb == 0.0 for r in out)  # constant column
    assert {round(r.v_rb, 6) for r in out} == \
        {round(x / 1.4826, 6) for x in (-1.0, 0.0, 1.0)}


def test_target_encode_leave_one_out_hand_computed(spark):
    from lindel_spark.features import target_encode

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "a", 30.0),
         (4, "b", 100.0), (5, "b", None), (6, "c", 50.0)],
        "id long, cat string, y double")
    prior = (10 + 20 + 30 + 100 + 50) / 5.0  # null excluded
    m = 2.0
    out = {r.id: r.cat_te for r in
           target_encode(df, "cat", "y", smoothing=m).collect()}
    # row 1: (60 - 10 + m*prior) / (3 - 1 + m)
    assert abs(out[1] - (50 + m * prior) / 4) < 1e-12
    assert abs(out[2] - (40 + m * prior) / 4) < 1e-12
    # row 5 (null target): receives the full-category stats
    assert abs(out[5] - (100 + m * prior) / (1 + m)) < 1e-12
    # singleton category: own label fully excluded -> pure prior pull
    assert abs(out[6] - (0 + m * prior) / (0 + m)) < 1e-12
    assert abs(out[6] - prior) < 1e-12  # i.e. exactly the prior


def test_target_encode_no_leak_and_validate(spark):
    import pytest

    from lindel_spark.features import target_encode

    # two rows, same cat, wildly different y: each must see ONLY the
    # other's label (plus shrinkage), never its own
    df = spark.createDataFrame(
        [(1, "a", 0.0), (2, "a", 1000.0)], "id long, cat string, y double")
    out = {r.id: r.cat_te for r in
           target_encode(df, "cat", "y", smoothing=1.0).collect()}
    prior = 500.0
    assert abs(out[1] - (1000.0 + prior) / 2) < 1e-12
    assert abs(out[2] - (0.0 + prior) / 2) < 1e-12
    assert out[1] != out[2]
    with pytest.raises(ValueError):
        target_encode(df, "cat", "y", smoothing=-1)
