"""Round-14 time-series additions: h-step Holt-Winters horizon
(frozen-state extrapolation over the fitted level/trend/season)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lindel_spark.timeseries import (holt_winters_forecast,
                                     holt_winters_horizon)


def _series_df(spark, values, key="a"):
    rows = [(key, i, float(v)) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, "k string, t int, v double")


def _hw_numpy_states(xs, m, a, b, g):
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
    return l, bt, s


def _hw_numpy_horizon(xs, m, a, b, g, H):
    l, bt, s = _hw_numpy_states(xs, m, a, b, g)
    W = len(xs)
    return [l + h * bt + s[W - m + ((h - 1) % m)]
            for h in range(1, H + 1)]


def test_horizon_matches_numpy_replay_across_wrap(spark):
    # H = 2.5 seasonal cycles so the frozen-season wrap is exercised
    rng = np.random.RandomState(11)
    m, W, H = 6, 24, 15
    vals = 50 + 0.5 * np.arange(W) + 3 * np.sin(
        np.arange(W) * 2 * np.pi / m) + rng.randn(W)
    got = {r.step: r.forecast for r in holt_winters_horizon(
        _series_df(spark, vals), ["k"], "t", "v", "t",
        period=m, window=W, horizon=H).collect()}
    want = _hw_numpy_horizon(vals, m, 0.3, 0.1, 0.2, H)
    assert sorted(got) == list(range(1, H + 1))
    for h in range(1, H + 1):
        assert got[h] == pytest.approx(want[h - 1], abs=1e-12)


def test_horizon_step1_equals_one_step_forecast(spark):
    vals = list(np.arange(20, dtype=float) ** 1.3)
    df = _series_df(spark, vals)
    one = holt_winters_forecast(df, ["k"], "t", "v", "t",
                                period=5, window=20).collect()[0]
    h1 = holt_winters_horizon(df, ["k"], "t", "v", "t",
                              period=5, window=20,
                              horizon=3).collect()
    by_step = {r.step: r for r in h1}
    assert by_step[1].forecast == pytest.approx(one.forecast,
                                                abs=0.0)
    assert by_step[1].last_ts == one.last_ts
    assert by_step[1].n_obs == one.n_obs


def test_horizon_pure_signal_extrapolates_truth(spark):
    # noiseless trend+season: every horizon step should track the
    # true continuation closely
    m, W, H = 4, 32, 8
    t = np.arange(W + H)
    season = np.array([5, -1, -3, -1] * ((W + H + 3) // 4))[:W + H]
    true = 10 + 2.0 * t + season
    got = {r.step: r.forecast for r in holt_winters_horizon(
        _series_df(spark, true[:W]), ["k"], "t", "v", "t",
        period=m, window=W, horizon=H).collect()}
    for h in range(1, H + 1):
        assert got[h] == pytest.approx(true[W + h - 1], rel=0.05)


def test_horizon_flat_series_is_flat_everywhere(spark):
    got = holt_winters_horizon(_series_df(spark, [7.0] * 20),
                               ["k"], "t", "v", "t", period=5,
                               window=20, horizon=12).collect()
    assert len(got) == 12
    for r in got:
        assert r.forecast == pytest.approx(7.0, abs=1e-9)


def test_horizon_validates_bounds(spark):
    df = _series_df(spark, [1.0] * 20)
    with pytest.raises(ValueError):
        holt_winters_horizon(df, ["k"], "t", "v", "t", period=5,
                             window=20, horizon=0)
    with pytest.raises(ValueError):
        holt_winters_horizon(df, ["k"], "t", "v", "t", period=5,
                             window=20, horizon=513)


def test_horizon_short_series_absent(spark):
    # fewer than window observations: key absent (the forecast
    # contract), so the horizon frame is empty, not padded
    df = _series_df(spark, [1.0] * 9)
    assert holt_winters_horizon(df, ["k"], "t", "v", "t", period=4,
                                window=16, horizon=4).count() == 0
