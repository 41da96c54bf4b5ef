"""Round-11 batch-6 operators: band join, inter-arrival stats, gap
report, rolling z-score, PMI collocations."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from lindel_spark.joins import band_join
from lindel_spark.text import pmi_collocations
from lindel_spark.timeseries import (
    gap_report,
    interarrival_stats,
    rolling_zscore,
)


# -------------------------------------------------------- band join

def test_band_join_matches_brute_force(spark):
    rng = np.random.RandomState(9)
    av = [(i, float(v)) for i, v in enumerate(rng.rand(200) * 50)]
    bv = [(i, float(v)) for i, v in enumerate(rng.rand(150) * 50)]
    a = spark.createDataFrame(av, ["id_a", "va"])
    b = spark.createDataFrame(bv, ["id_b", "vb"])
    got = {(r.id_a, r.id_b)
           for r in band_join(a, b, "va", "vb", eps=0.7).collect()}
    want = {(i, j) for i, x in av for j, y in bv if abs(x - y) <= 0.7}
    assert got == want


def test_band_join_boundary_inclusive(spark):
    a = spark.createDataFrame([(1, 10.0)], ["id_a", "va"])
    b = spark.createDataFrame([(2, 10.5), (3, 10.51)], ["id_b", "vb"])
    got = {r.id_b for r in band_join(a, b, "va", "vb", 0.5).collect()}
    assert got == {2}


def test_band_join_plan_is_hash_join(spark):
    a = spark.createDataFrame([(i, float(i)) for i in range(50)],
                              ["id_a", "va"])
    b = spark.createDataFrame([(i, float(i) + 0.3) for i in range(50)],
                              ["id_b", "vb"])
    out = band_join(a, b, "va", "vb", 1.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    with pytest.raises(ValueError):
        band_join(a, b, "va", "vb", 0.0)


# -------------------------------------------- interarrival / gaps

def _ts_df(spark, seconds, key="k"):
    base = dt.datetime(2024, 1, 1)
    rows = [(key, i, base + dt.timedelta(seconds=s))
            for i, s in enumerate(seconds)]
    return spark.createDataFrame(rows, ["k", "i", "ts"])


def test_interarrival_metronome_cv_zero(spark):
    df = _ts_df(spark, range(0, 100, 10))
    r = interarrival_stats(df, ["k"], "ts", "i").collect()[0]
    assert r.n_gaps == 9
    assert r.mean_gap_s == pytest.approx(10.0, abs=1e-9)
    assert r.std_gap_s == pytest.approx(0.0, abs=1e-9)
    assert r.cv == pytest.approx(0.0, abs=1e-9)
    assert r.max_gap_s == pytest.approx(10.0, abs=1e-9)


def test_interarrival_bursty_cv_large(spark):
    # 5 events in one second, then silence, then 5 more
    df = _ts_df(spark, [0, 1, 2, 3, 4, 10000, 10001, 10002, 10003])
    r = interarrival_stats(df, ["k"], "ts", "i").collect()[0]
    assert r.cv > 2.0
    assert r.max_gap_s == pytest.approx(9996.0, abs=1e-9)


def test_gap_report_finds_exact_gaps(spark):
    df = _ts_df(spark, [0, 60, 120, 7 * 3600, 7 * 3600 + 60])
    out = gap_report(df, ["k"], "ts", "i", max_gap="1 hour").collect()
    assert len(out) == 1
    g = out[0]
    assert g.gap_seconds == pytest.approx(7 * 3600 - 120, abs=1e-9)
    assert g.gap_start.isoformat().startswith("2024-01-01T00:02:00")


def test_gap_report_threshold_exclusive(spark):
    df = _ts_df(spark, [0, 3600])  # exactly the threshold: no gap
    assert gap_report(df, ["k"], "ts", "i", "1 hour").count() == 0


# --------------------------------------------------- rolling zscore

def test_rolling_zscore_matches_numpy(spark):
    rng = np.random.RandomState(1)
    # quantize like the operator (decimal(18,6) window sums)
    vals = np.round(rng.randn(80) * 3 + 7, 6)
    df = spark.createDataFrame(
        [("k", i, float(v)) for i, v in enumerate(vals)],
        ["k", "t", "v"])
    got = {r.t: r.zscore
           for r in rolling_zscore(df, ["k"], "t", "v", "t",
                                   lookback=10, min_points=5).collect()}
    for i in range(len(vals)):
        wnd = vals[max(0, i - 10):i]
        if len(wnd) < 5 or wnd.std() == 0:
            assert got[i] is None
        else:
            ref = (vals[i] - wnd.mean()) / wnd.std()
            assert got[i] == pytest.approx(ref, abs=1e-9), i


def test_rolling_zscore_excludes_self(spark):
    # constant baseline then one spike: the spike's own window is the
    # preceding constants -> std 0 -> NULL, but the NEXT point sees a
    # nonzero-variance window
    vals = [5.0] * 10 + [50.0, 5.0]
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(vals)], ["k", "t", "v"])
    got = {r.t: r.zscore
           for r in rolling_zscore(df, ["k"], "t", "v", "t",
                                   lookback=10).collect()}
    assert got[10] is None  # zero-variance baseline
    assert got[11] is not None and got[11] < 0  # 5.0 below spiked mean
    with pytest.raises(ValueError):
        rolling_zscore(df, ["k"], "t", "v", "t", lookback=0)


# ------------------------------------------------ pmi collocations

def test_pmi_ranks_exclusive_pair_first(spark):
    # "san francisco" always together; "the cat/dog/run" mixed
    texts = ["san francisco"] * 6 + \
            ["the cat", "the dog", "the run", "cat the",
             "dog the", "run the"] * 4
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    out = pmi_collocations(df, "text", min_count=5, top_n=5)
    rows = sorted(out.collect(), key=lambda r: r.pos)
    assert (rows[0].left, rows[0].right) == ("san", "francisco")
    # exclusive pair: pmi = ln(n * c / (c * c)) = ln(n/c)
    n_pairs_total = 6 + 24
    assert rows[0].pmi == pytest.approx(
        np.log(n_pairs_total * 6 / (6 * 6)), abs=1e-9)


def test_pmi_min_count_floors_hapax(spark):
    texts = ["rare gem"] + ["common word"] * 10
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    out = pmi_collocations(df, "text", min_count=5, top_n=10).collect()
    assert all((r.left, r.right) != ("rare", "gem") for r in out)
    assert any((r.left, r.right) == ("common", "word") for r in out)


def test_band_join_same_column_name_both_sides(spark):
    a = spark.createDataFrame([(1, 10.0), (2, 20.0)], ["id", "price"])
    b = spark.createDataFrame([(3, 10.3), (4, 25.0)], ["id", "price"])
    out = band_join(a.select("price"), b.select("price"),
                    "price", "price", eps=0.5)
    assert out.count() == 1  # only (10.0, 10.3)


def test_gap_report_timezone_independent(spark):
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    rows = [("k", i, base + dt.timedelta(seconds=s))
            for i, s in enumerate([0, 60, 5 * 3600])]
    df = spark.createDataFrame(rows, ["k", "i", "ts"])
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "Asia/Tokyo", "America/New_York"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            got = gap_report(df, ["k"], "ts", "i",
                             max_gap="1 hour").collect()
            assert len(got) == 1, tz
            assert got[0].gap_seconds == pytest.approx(
                5 * 3600 - 60, abs=1e-6), tz
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


# ---------------------------------------------------------------------------
# round-12 seasonal decomposition
# ---------------------------------------------------------------------------

def test_seasonal_decompose_recovers_structure(spark):
    """Constructed series = linear trend + exact period-4 seasonal:
    interior trend must equal the linear component (a centered MA is
    exact on a line + zero-mean cycle), seasonal must re-center to
    ~0 per period, and value == trend + seasonal + resid wherever
    trend is defined; edge rows get NULL trend/resid."""
    import math
    from lindel_spark.timeseries import seasonal_decompose

    season = [3.0, -1.0, -2.5, 0.5]  # sums to 0
    rows = [("k", i, 10.0 + 0.5 * i + season[i % 4], i)
            for i in range(40)]
    df = spark.createDataFrame(rows, "k string, t long, v double, tb long")
    out = {r.t: r for r in seasonal_decompose(
        df, ["k"], "t", "v", period=4, tiebreak="tb").collect()}
    assert len(out) == 40
    # period=4: lo=-2, hi=1 -> rows 0,1 and 38,39... window needs 4
    # rows: positions 0..1 lack preceding, 39 lacks following
    assert out[0].trend is None and out[1].trend is None
    assert out[39].trend is None and out[38].trend is not None
    for i in range(2, 38):
        r = out[i]
        # centered-even MA of a line+cycle: trend = line shifted by
        # half-step asymmetry 0.5*0.5/... compute expected directly
        expect_trend = sum(10.0 + 0.5 * j + season[j % 4]
                           for j in range(i - 2, i + 2)) / 4.0
        assert abs(r.trend - expect_trend) < 1e-9
        assert abs(r.value - (r.trend + r.seasonal + r.resid)) < 1e-9
        assert r.phase == i % 4
    # seasonal depends only on phase and sums ~0 over one period
    phases = {out[i].phase: out[i].seasonal for i in range(2, 6)}
    assert abs(sum(phases.values())) < 1e-9
    for i in range(2, 38):
        assert abs(out[i].seasonal - phases[i % 4]) < 1e-9


def test_seasonal_decompose_validations_and_key_isolation(spark):
    import pytest
    from lindel_spark.timeseries import seasonal_decompose

    df = spark.createDataFrame(
        [("a", 0, 1.0, 0), ("b", 0, 9.0, 0)],
        "k string, t long, v double, tb long")
    with pytest.raises(ValueError, match="period"):
        seasonal_decompose(df, ["k"], "t", "v", period=1, tiebreak="tb")
    # two keys never mix: each is its own (too-short) series
    out = seasonal_decompose(df, ["k"], "t", "v", period=2,
                             tiebreak="tb").collect()
    assert all(r.trend is None for r in out) and len(out) == 2
