"""Round-11 KLL-style bound-free quantile sketch: deterministic
hash-level compaction, exact mergeability, rank-error bound."""

import pytest
from pyspark.sql import functions as F

from lindel_spark import sketch as SK


@pytest.fixture(scope="module")
def li(spark):
    return spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")


KEY = ["l_orderkey", "l_linenumber"]


def _rows(sk):
    return sorted((r.v, r.lvl, r.w, r.n) for r in sk.collect())


def test_kll_merge_equals_single_pass(li):
    """Union + re-threshold must be ROW-IDENTICAL to one pass over the
    concatenation — the property literal coin-flip KLL cannot give."""
    a = li.filter("l_orderkey % 2 = 0")
    b = li.filter("l_orderkey % 2 = 1")
    merged = SK.kll_merge(
        SK.kll_sketch(a, "l_extendedprice", KEY, capacity=1024),
        SK.kll_sketch(b, "l_extendedprice", KEY, capacity=1024),
        capacity=1024)
    single = SK.kll_sketch(li, "l_extendedprice", KEY, capacity=1024)
    assert _rows(merged) == _rows(single)


def test_kll_three_way_merge_and_order_independence(li):
    """Merging 3 shards in any grouping gives the same sketch."""
    shards = [li.filter(f"l_orderkey % 3 = {i}") for i in range(3)]
    sks = [SK.kll_sketch(s, "l_extendedprice", KEY, capacity=512)
           for s in shards]
    m1 = SK.kll_merge(*sks, capacity=512)
    m2 = SK.kll_merge(sks[2], sks[0], sks[1], capacity=512)
    assert _rows(m1) == _rows(m2)


def test_kll_rank_error_bound(spark):
    """Deciles read off the sketch must sit within 5% rank error of
    the exact quantiles (expected error ~ sqrt(q(1-q)/capacity) ≈
    0.8% at capacity 4096 — 5% is a >6-sigma margin). Run at the
    largest local SF; the sf1 sweep re-asserts via the registry
    query's value-level oracle."""
    li1 = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    sk = SK.kll_sketch(li1, "l_extendedprice", KEY)
    n = li1.count()
    qs = [i / 10 for i in range(1, 10)]
    ests = {r.q: r.est for r in SK.kll_quantiles(sk, qs).collect()}
    vals = li1.select(F.col("l_extendedprice").cast("double").alias("v"))
    for q, est in ests.items():
        true_rank = vals.filter(F.col("v") <= est).count()
        assert abs(true_rank / n - q) < 0.05, (q, est, true_rank / n)


def test_kll_sample_size_bounded(li):
    """Kept rows stay within (capacity/4, 2*capacity) — the geometric
    threshold can't over- or under-sample by more than the level
    granularity plus hash noise."""
    for cap in (256, 1024):
        m = SK.kll_sketch(li, "l_extendedprice", KEY,
                          capacity=cap).count()
        assert cap / 4 < m < 2 * cap, (cap, m)


def test_kll_small_input_keeps_everything(spark):
    """n <= capacity: threshold 0, every row kept with weight 1 —
    quantiles become exact type-1 quantiles."""
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([5, 1, 9, 3, 7])],
        "id long, x double")
    sk = SK.kll_sketch(df, "x", ["id"], capacity=16)
    assert sk.count() == 5
    assert sk.select(F.max("w")).first()[0] == 1
    got = {r.q: r.est for r in SK.kll_quantiles(
        sk, [0.2, 0.4, 0.6, 0.8, 1.0]).collect()}
    assert got == {0.2: 1.0, 0.4: 3.0, 0.6: 5.0, 0.8: 7.0, 1.0: 9.0}


def test_kll_skips_nulls_and_validates(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 3.0)], "id long, x double")
    sk = SK.kll_sketch(df, "x", ["id"], capacity=16)
    assert sk.count() == 2
    assert sk.select(F.max("n")).first()[0] == 2
    with pytest.raises(ValueError, match="capacity"):
        SK.kll_sketch(df, "x", ["id"], capacity=2)
    with pytest.raises(ValueError, match="at least two"):
        SK.kll_merge(sk, capacity=16)
    with pytest.raises(TypeError):
        SK.kll_merge(sk, sk)  # capacity is a required keyword


def test_kll_grouped_equals_per_group_global(spark):
    """The grouped sketch must equal running the global sketch on
    each group separately (same hash, same in-plan threshold)."""
    ev = spark.createDataFrame(
        [(i, "a" if i % 3 else "b", float(i % 97)) for i in range(3000)],
        "event_id long, event_type string, value double")
    g = SK.kll_sketch_grouped(ev, "event_type", "value",
                              ["event_id"], capacity=256)
    got = {
        t: sorted((r.v, r.lvl, r.w, r.n) for r in rows)
        for t, rows in (
            (t, [r for r in g.collect() if r.event_type == t])
            for t in ("a", "b"))
    }
    for t in ("a", "b"):
        solo = SK.kll_sketch(ev.filter(F.col("event_type") == t),
                             "value", ["event_id"], capacity=256)
        assert got[t] == sorted(
            (r.v, r.lvl, r.w, r.n) for r in solo.collect()), t


def test_kll_grouped_quantiles_small_group_exact(spark):
    """A group under capacity keeps every row (w=1) and the grouped
    reader returns its exact type-1 quantiles."""
    ev = spark.createDataFrame(
        [(i, "g", float(v)) for i, v in enumerate([5, 1, 9, 3, 7])],
        "event_id long, event_type string, value double")
    sk = SK.kll_sketch_grouped(ev, "event_type", "value",
                               ["event_id"], capacity=16)
    assert sk.count() == 5
    assert sk.select(F.max("w")).first()[0] == 1
    got = {r.q: r.est for r in SK.kll_quantiles_grouped(
        sk, "event_type", [0.2, 0.6, 1.0]).collect()}
    assert got == {0.2: 1.0, 0.6: 5.0, 1.0: 9.0}
