"""Round-13 time-series additions: additive Holt-Winters one-step
forecast (the predictive leg of the decompose/ewma tier)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lindel_spark.timeseries import holt_winters_forecast


def _series_df(spark, values, key="a"):
    rows = [(key, i, float(v)) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, "k string, t int, v double")


def _hw_numpy(xs, m, a, b, g):
    xs = np.asarray(xs, float)
    W = len(xs)
    l = xs[:m].mean()
    bt = (xs[m:2 * m].mean() - xs[:m].mean()) / m
    s = list(xs[:m] - l)
    for t in range(m, W):
        sm = s[t - m]
        ln = a * (xs[t] - sm) + (1 - a) * (l + bt)
        bt = b * (ln - l) + (1 - b) * bt
        s.append(g * (xs[t] - ln) + (1 - g) * sm)
        l = ln
    return l, bt, l + bt + s[W - m]


def test_hw_matches_numpy_replay(spark):
    rng = np.random.RandomState(7)
    vals = 50 + 0.5 * np.arange(24) + 3 * np.sin(
        np.arange(24) * 2 * np.pi / 6) + rng.randn(24)
    df = _series_df(spark, vals)
    r = holt_winters_forecast(df, ["k"], "t", "v", "t",
                              period=6, window=24).collect()[0]
    l, b, f = _hw_numpy(vals, 6, 0.3, 0.1, 0.2)
    assert r.level == pytest.approx(l, abs=1e-12)
    assert r.trend == pytest.approx(b, abs=1e-12)
    assert r.forecast == pytest.approx(f, abs=1e-12)
    assert r.n_obs == 24 and r.last_ts == 23


def test_hw_recovers_planted_trend_plus_season(spark):
    # pure signal, no noise: the one-step forecast must land near the
    # true next value
    m, W = 4, 32
    t = np.arange(W + 1)
    true = 10 + 2.0 * t + np.array([5, -1, -3, -1] * ((W + 4) // 4))[:W + 1]
    df = _series_df(spark, true[:W])
    r = holt_winters_forecast(df, ["k"], "t", "v", "t",
                              period=m, window=W).collect()[0]
    assert r.forecast == pytest.approx(true[W], rel=0.05)
    assert r.trend == pytest.approx(2.0, rel=0.15)


def test_hw_flat_series_forecasts_the_level(spark):
    df = _series_df(spark, [7.0] * 20)
    r = holt_winters_forecast(df, ["k"], "t", "v", "t",
                              period=5, window=20).collect()[0]
    assert r.forecast == pytest.approx(7.0, abs=1e-9)
    assert r.trend == pytest.approx(0.0, abs=1e-12)


def test_hw_uses_only_last_window(spark):
    # garbage before the window must not change the forecast
    vals = list(np.arange(16, dtype=float))
    df_short = _series_df(spark, vals)
    df_long = _series_df(spark, [999.0, -999.0] * 5 + vals)
    # same key, longer history: positions differ but the LAST 16 match
    a = holt_winters_forecast(df_short, ["k"], "t", "v", "t",
                              period=4, window=16).collect()[0]
    b = holt_winters_forecast(df_long, ["k"], "t", "v", "t",
                              period=4, window=16).collect()[0]
    assert a.forecast == pytest.approx(b.forecast, abs=1e-12)


def test_hw_short_series_absent_and_multi_key(spark):
    rows = ([("long", i, float(i)) for i in range(12)]
            + [("short", i, float(i)) for i in range(5)])
    df = spark.createDataFrame(rows, "k string, t int, v double")
    got = holt_winters_forecast(df, ["k"], "t", "v", "t",
                                period=3, window=12)
    assert [r.k for r in got.collect()] == ["long"]


def test_hw_repartition_deterministic(spark):
    rng = np.random.RandomState(3)
    vals = rng.rand(24) * 100
    df = _series_df(spark, vals)
    a = holt_winters_forecast(df, ["k"], "t", "v", "t",
                              period=6, window=24).collect()[0]
    b = holt_winters_forecast(df.repartition(13), ["k"], "t", "v", "t",
                              period=6, window=24).collect()[0]
    assert (a.level, a.trend, a.forecast) == (b.level, b.trend, b.forecast)


def test_hw_validation(spark):
    df = _series_df(spark, [1.0] * 10)
    with pytest.raises(ValueError):
        holt_winters_forecast(df, ["k"], "t", "v", "t", period=1,
                              window=10)
    with pytest.raises(ValueError):
        holt_winters_forecast(df, ["k"], "t", "v", "t", period=5,
                              window=8)
    with pytest.raises(ValueError):
        holt_winters_forecast(df, ["k"], "t", "v", "t", period=5,
                              window=10, alpha=1.5)
