"""KS two-sample test, URL canonicalization, and the distributed
prefix-sum helper they (and roc_auc) share."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lindel_spark.profile import ks_test
from lindel_spark.text import canonicalize_url
from lindel_spark.util import prefix_sums


# ------------------------------------------------------- prefix sums

def test_prefix_sums_match_sequential(spark):
    rng = np.random.RandomState(3)
    keys = rng.permutation(500)
    vals = rng.randint(1, 10, 500)
    df = spark.createDataFrame(
        [(int(k), int(v)) for k, v in zip(keys, vals)], ["k", "c"])
    out = {r.k: r.cum_c
           for r in prefix_sums(df, "k", ["c"]).collect()}
    order = np.argsort(keys)
    acc = 0
    for i in order:
        acc += vals[i]
        assert out[int(keys[i])] == acc


def test_prefix_sums_multi_column(spark):
    df = spark.createDataFrame(
        [(1, 10, 1), (2, 20, 2), (3, 30, 3)], ["k", "a", "b"])
    got = {r.k: (r.cum_a, r.cum_b)
           for r in prefix_sums(df, "k", ["a", "b"]).collect()}
    assert got == {1: (10, 1), 2: (30, 3), 3: (60, 6)}


# ---------------------------------------------------------------- ks

def test_ks_identical_samples_zero(spark):
    df = spark.createDataFrame(
        [(float(i % 37),) for i in range(500)], ["v"])
    r = ks_test(df, df, "v").collect()[0]
    assert r.ks_d == pytest.approx(0.0, abs=1e-12)
    assert r.n_a == 500 and r.n_b == 500


def test_ks_disjoint_samples_one(spark):
    a = spark.createDataFrame([(float(i),) for i in range(50)], ["v"])
    b = spark.createDataFrame([(float(i + 100),) for i in range(50)],
                              ["v"])
    r = ks_test(a, b, "v").collect()[0]
    assert r.ks_d == pytest.approx(1.0, abs=1e-12)
    assert r.at_value == 49.0  # D hit at a's max


def test_ks_matches_scipy_style_reference(spark):
    rng = np.random.RandomState(5)
    xa = np.round(rng.randn(400), 1)
    xb = np.round(rng.randn(300) + 0.4, 1)
    a = spark.createDataFrame([(float(v),) for v in xa], ["v"])
    b = spark.createDataFrame([(float(v),) for v in xb], ["v"])
    r = ks_test(a, b, "v").collect()[0]
    # reference: exact D over the pooled support
    support = np.unique(np.concatenate([xa, xb]))
    fa = np.searchsorted(np.sort(xa), support, side="right") / len(xa)
    fb = np.searchsorted(np.sort(xb), support, side="right") / len(xb)
    ref = np.abs(fa - fb).max()
    assert r.ks_d == pytest.approx(ref, abs=1e-12)


def test_ks_shift_detected(spark):
    a = spark.createDataFrame(
        [(float(i % 100),) for i in range(1000)], ["v"])
    b = spark.createDataFrame(
        [(float(i % 100) + 30.0,) for i in range(1000)], ["v"])
    r = ks_test(a, b, "v").collect()[0]
    assert r.ks_d == pytest.approx(0.30, abs=1e-9)


# --------------------------------------------------------------- url

def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], ["u"])
    return [r.c for r in
            df.select(canonicalize_url(F.col("u")).alias("c"))
            .collect()]


def test_url_full_canonicalization(spark):
    got = _canon(spark, [
        "HTTP://Example.COM:80/Path/Sub/?utm_source=x&b=2&a=1#frag"])
    assert got == ["http://example.com/Path/Sub?a=1&b=2"]


def test_url_default_ports_and_case(spark):
    got = _canon(spark, [
        "https://Site.org:443/", "http://Site.org:8080/x/",
        "HTTPS://A.b/Q?fbclid=1&gclid=2&msclkid=3&utm_medium=m"])
    assert got == ["https://site.org/", "http://site.org:8080/x",
                   "https://a.b/Q"]


def test_url_idempotent(spark):
    urls = ["HTTP://Example.COM:80/Path/?b=2&a=1#f",
            "https://x.y/p?z=1", "http://h.com/p?"]
    once = _canon(spark, urls)
    twice = _canon(spark, once)
    assert once == twice


def test_url_non_url_and_null_pass_through(spark):
    df = spark.createDataFrame([("not a url",), (None,)], ["u"])
    got = [r.c for r in
           df.select(canonicalize_url(F.col("u")).alias("c")).collect()]
    assert got == ["not a url", None]


def test_url_collapses_crawl_variants(spark):
    variants = [
        "HTTP://Shop.COM:80/item/7/?utm_source=a&x=1&y=2#top",
        "http://shop.com/item/7?y=2&x=1",
        "http://Shop.com/item/7/?x=1&y=2&gclid=9",
    ]
    got = set(_canon(spark, variants))
    assert got == {"http://shop.com/item/7?x=1&y=2"}


def test_prefix_sums_double_column(spark):
    df = spark.createDataFrame(
        [(1, 1.5), (2, 2.25), (3, 0.25)], ["k", "w"])
    got = {r.k: r.cum_w for r in prefix_sums(df, "k", ["w"]).collect()}
    assert got[1] == pytest.approx(1.5)
    assert got[2] == pytest.approx(3.75)
    assert got[3] == pytest.approx(4.0)


def test_url_tracker_match_is_name_exact_for_ids(spark):
    """round-12 advice: 'gclid' must match the param NAME exactly —
    'gclid_backup=1' and 'gclidx=2' are legitimate params and must
    survive; the utm_ family stays prefix-matched."""
    got = _canon(spark, [
        "https://a.b/p?gclid_backup=1&gclid=Zx9&b=2",
        "https://a.b/p?gclidx=2&fbclid=q&msclkid2=keepme",
        "https://a.b/p?utm_source=x&utm_whatever=y&a=1",
    ])
    assert got == [
        "https://a.b/p?b=2&gclid_backup=1",
        "https://a.b/p?gclidx=2&msclkid2=keepme",
        "https://a.b/p?a=1",
    ]
