"""Deterministic HyperLogLog sketch: accuracy, exact merge,
determinism."""

import pytest

from lindel_spark.sketch import hll_estimate, hll_merge, hll_sketch


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [(i % 3, f"v{i}") for i in range(30000)], ["g", "x"])


def test_hll_error_within_bound(spark, df):
    # p=9: sigma ~ 1.04/sqrt(512) ~ 4.6%; assert < 3 sigma
    est = {r.g: r.est
           for r in hll_estimate(hll_sketch(df, ["g"], "x", p=9),
                                 p=9).collect()}
    for g, true in [(0, 10000), (1, 10000), (2, 10000)]:
        assert abs(est[g] - true) / true < 0.14


def test_hll_merge_equals_one_shot(spark, df):
    a = hll_sketch(df.filter("x like 'v1%'"), ["g"], "x", p=9)
    b = hll_sketch(df.filter("x not like 'v1%'"), ["g"], "x", p=9)
    m = hll_merge(a, b, p=9)
    one = hll_sketch(df, ["g"], "x", p=9)
    assert m.exceptAll(one).count() == 0
    assert one.exceptAll(m).count() == 0


def test_hll_small_range_near_exact(spark):
    tiny = spark.createDataFrame([(f"t{i % 10}",) for i in range(200)],
                                 ["x"])
    e = hll_estimate(hll_sketch(tiny, [], "x", p=9), p=9).collect()[0].est
    assert abs(e - 10) < 1.0


def test_hll_deterministic_across_partitioning(spark, df):
    a = hll_sketch(df, ["g"], "x", p=7)
    b = hll_sketch(df.repartition(13), ["g"], "x", p=7)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_hll_duplicates_do_not_move_estimate(spark):
    base = spark.createDataFrame([(f"u{i}",) for i in range(1000)], ["x"])
    duped = base.union(base).union(base)
    ea = hll_estimate(hll_sketch(base, [], "x", p=9), p=9).collect()[0].est
    eb = hll_estimate(hll_sketch(duped, [], "x", p=9), p=9).collect()[0].est
    assert ea == eb


def test_hll_rejects_bad_p(spark, df):
    with pytest.raises(ValueError):
        hll_sketch(df, ["g"], "x", p=3)
    with pytest.raises(ValueError):
        hll_sketch(df, ["g"], "x", p=17)
    with pytest.raises(ValueError):
        hll_merge(hll_sketch(df, ["g"], "x"), p=9)


def test_hll_small_m_alpha_constants(spark):
    # p=4 (m=16) must use Flajolet's fixed 0.673, not the asymptotic
    # formula; with 10 distinct values the small-range branch fires,
    # so check the constant through a sketch that FILLS the registers
    df = spark.createDataFrame([(f"v{i}",) for i in range(5000)], ["x"])
    sk = hll_sketch(df, [], "x", p=4)
    est = hll_estimate(sk, p=4).collect()[0].est
    # registers full (no small-range branch at 5000 >> 2.5*16):
    # estimate within the (large for m=16) error band of the truth
    assert 2000 < est < 10000
    # and the exact constant is pinned by replaying the formula
    import math
    rows = sk.collect()
    sp = sum(2.0 ** -r.rho for r in rows)
    denom = (16.0 - len(rows)) + sp
    raw = 0.673 * 16 * 16 / denom
    zeros = 16.0 - len(rows)
    want = 16.0 * math.log(16.0 / zeros) \
        if (raw <= 2.5 * 16 and zeros > 0) else raw
    assert est == pytest.approx(want, abs=1e-9)


def test_hll_p_mismatch_raises(spark):
    """round-12 advice: estimating/merging under the wrong p must
    raise, not silently return a wrong estimate."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from lindel_spark import sketch as SK

    df = spark.createDataFrame(
        [(1, f"u{i}") for i in range(200)], "g int, u string")
    sk9 = SK.hll_sketch(df, "g", "u", p=9)
    # smaller claimed p than built: bucket bound violated (the
    # reliably detectable direction — a LARGER claimed p only trips
    # the rho ceiling when an extreme register happens to exist)
    with pytest.raises(Exception, match="inconsistent with p"):
        SK.hll_estimate(sk9, p=4).collect()
    with pytest.raises(ValueError, match="p must be"):
        SK.hll_estimate(sk9, p=3)
    with pytest.raises(ValueError, match="p must be"):
        SK.hll_merge(sk9, sk9, p=20)
    # correct p still estimates fine (guard is transparent)
    est = SK.hll_estimate(sk9, p=9).collect()[0].est
    assert 150 <= est <= 250
    # merge under a smaller claimed p raises at execution
    with pytest.raises(Exception, match="inconsistent with p"):
        SK.hll_merge(sk9, sk9, p=5).collect()
