"""Round-12: containment join, seeded Laplace counts, multi-touch
attribution — asymmetry, noise calibration, credit conservation."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lindel_spark.dedup import containment_join
from lindel_spark.profile import seeded_laplace_counts
from lindel_spark.timeseries import attribution


# ---------------------------------------------------------- containment

def test_containment_quote_detected_asymmetric(spark):
    quote = "alpha beta gamma delta epsilon"
    host = ("intro words here " + quote + " and a very long tail "
            "of unrelated filler content going on and on")
    docs = spark.createDataFrame(
        [(1, quote), (2, host)], ["doc_id", "text"])
    out = {(r.src, r.dst): r for r in
           containment_join(docs, threshold=0.6,
                            shingle_k=3).collect()}
    # quote fully contained in host: containment(1->2) = 1.0
    assert (1, 2) in out
    assert out[(1, 2)].containment == pytest.approx(1.0)
    # host is NOT contained in the quote
    assert (2, 1) not in out


def test_containment_gram_df_cap_drops_boilerplate(spark):
    # the same trigram in every doc is cut at max_gram_df=2
    docs = spark.createDataFrame(
        [(i, "common boiler plate") for i in range(4)],
        ["doc_id", "text"])
    assert containment_join(docs, threshold=0.5, shingle_k=3,
                            max_gram_df=2).count() == 0
    assert containment_join(docs, threshold=0.5, shingle_k=3,
                            max_gram_df=10).count() == 12  # 4x3 pairs


def test_containment_threshold_guard(spark):
    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        containment_join(docs, threshold=0.0)


# ------------------------------------------------------------ dp counts

def test_dp_counts_deterministic_and_calibrated(spark):
    df = spark.createDataFrame(
        [(chr(97 + i % 5), 1) for i in range(1000)], ["k", "x"])
    a = {r.k: r for r in
         seeded_laplace_counts(df, "k", epsilon=1.0).collect()}
    b = {r.k: r for r in
         seeded_laplace_counts(df.repartition(7), "k",
                               epsilon=1.0).collect()}
    for k in a:
        assert a[k].noisy_n == b[k].noisy_n  # bit-replayable
        assert a[k].n == 200
        assert a[k].noisy_n != a[k].n  # noise actually applied
    # higher epsilon -> strictly smaller magnitude, same sign
    hi = {r.k: r for r in
          seeded_laplace_counts(df, "k", epsilon=10.0).collect()}
    for k in a:
        na, nh = a[k].noisy_n - a[k].n, hi[k].noisy_n - hi[k].n
        assert abs(nh) == pytest.approx(abs(na) / 10.0, rel=1e-9)


def test_dp_counts_salt_changes_draw(spark):
    df = spark.createDataFrame([("a", 1)] * 10, ["k", "x"])
    r1 = seeded_laplace_counts(df, "k", 1.0, salt="s1").collect()[0]
    r2 = seeded_laplace_counts(df, "k", 1.0, salt="s2").collect()[0]
    assert r1.noisy_n != r2.noisy_n
    with pytest.raises(ValueError):
        seeded_laplace_counts(df, "k", epsilon=0.0)


# ---------------------------------------------------------- attribution

def _stream(spark, rows):
    return spark.createDataFrame(
        [(u, t, i, ty) for i, (u, t, ty) in enumerate(rows)],
        ["u", "ts", "eid", "etype"])


def test_attribution_linear_splits_evenly(spark):
    rows = [(1, 1, "click"), (1, 2, "view"), (1, 3, "buy"),
            (1, 4, "click"), (1, 5, "buy")]
    out = {r.touch_type: r for r in attribution(
        _stream(spark, rows), "u", "ts", "etype", "eid",
        conversion="buy", model="linear").collect()}
    # conv1: click+view (1/2 each); conv2: click (1)
    assert out["click"].credit == pytest.approx(1.5)
    assert out["view"].credit == pytest.approx(0.5)
    assert out["click"].n_conversions == 2
    assert out["view"].n_conversions == 1
    total = sum(r.credit for r in out.values())
    assert total == pytest.approx(2.0)  # conserves


def test_attribution_first_vs_last(spark):
    rows = [(1, 1, "click"), (1, 2, "view"), (1, 3, "buy")]
    first = {r.touch_type: r.credit for r in attribution(
        _stream(spark, rows), "u", "ts", "etype", "eid",
        conversion="buy", model="first").collect()}
    last = {r.touch_type: r.credit for r in attribution(
        _stream(spark, rows), "u", "ts", "etype", "eid",
        conversion="buy", model="last").collect()}
    assert first == {"click": 1.0, "view": 0.0}
    assert last == {"click": 0.0, "view": 1.0}


def test_attribution_touchless_and_trailing(spark):
    # buy with no prior touches attributes nothing; trailing touches
    # after the last buy attribute nothing
    rows = [(1, 1, "buy"), (1, 2, "click")]
    out = attribution(_stream(spark, rows), "u", "ts", "etype", "eid",
                      conversion="buy", model="linear").collect()
    assert out == []
    with pytest.raises(ValueError):
        attribution(_stream(spark, rows), "u", "ts", "etype", "eid",
                    conversion="buy", model="weird")


# ---------------------------------------------------------- huber mean

def test_huber_matches_numpy_irls(spark):
    from lindel_spark.profile import huber_mean
    rng = np.random.RandomState(3)
    x = np.concatenate([rng.randn(300) + 10, [1000.0, -500.0]])
    df = spark.createDataFrame([(float(v),) for v in x], ["x"])
    r = huber_mean(df, "x", c=1.5, rounds=3).collect()[0]
    xs = np.sort(x)
    med = xs[int(np.ceil(0.5 * len(xs))) - 1]  # smallest >= 0.5 mass
    ad = np.sort(np.abs(x - med))
    mad = ad[int(np.ceil(0.5 * len(ad))) - 1]
    m = med
    for _ in range(3):
        dev = np.abs(x - m)
        w = np.where(dev <= 1.5 * mad, 1.0,
                     np.divide(1.5 * mad, dev,
                               out=np.zeros_like(dev), where=dev > 0))
        m = (w * x).sum() / w.sum()
    assert r.scale == pytest.approx(mad)
    assert r.huber_mean == pytest.approx(m, rel=1e-12)
    # robust: outliers moved the plain mean, not the Huber mean
    assert abs(r.huber_mean - 10) < 0.2
    assert abs(x.mean() - 10) > 1.0


def test_huber_constant_column(spark):
    from lindel_spark.profile import huber_mean
    df = spark.createDataFrame([(5.0,)] * 20, ["x"])
    r = huber_mean(df, "x").collect()[0]
    assert r.huber_mean == pytest.approx(5.0)
    assert r.scale == pytest.approx(0.0)


def test_huber_rounds_guard(spark):
    from lindel_spark.profile import huber_mean
    df = spark.createDataFrame([(1.0,)], ["x"])
    with pytest.raises(ValueError):
        huber_mean(df, "x", rounds=0)


def test_dp_counts_null_key_distinct_from_empty_string(spark):
    # ADVICE r12: concat_ws skips NULLs, so without the sentinel
    # coalesce a NULL key and '' would share one seeded draw
    df = spark.createDataFrame(
        [(None, 1)] * 7 + [("", 1)] * 7,
        "k string, x int")
    rows = {r.k: r for r in
            seeded_laplace_counts(df, "k", epsilon=1.0).collect()}
    assert set(rows) == {None, ""} and all(r.n == 7 for r in rows.values())
    assert rows[None].noisy_n != rows[""].noisy_n
