"""SCD2 build and incremental aggregate-state merge semantics."""

import pytest
from pyspark.sql import functions as F

from lindel_spark.history import merge_agg_states, scd2_build


def _changelog(spark):
    # key 1: A A B A  (runs collapse to A, B, A)
    # key 2: X        (single current version)
    return spark.createDataFrame(
        [
            (1, 10, 1, "A"),
            (1, 20, 2, "A"),
            (1, 30, 3, "B"),
            (1, 40, 4, "A"),
            (2, 15, 5, "X"),
        ],
        "k long, ts long, seq long, attr string",
    )


def test_scd2_collapses_runs_and_builds_intervals(spark):
    out = scd2_build(_changelog(spark), "k", ["ts", "seq"], ["attr"])
    rows = {(r.k, r.version): r for r in out.collect()}
    assert len(rows) == 4  # A,B,A for key 1; X for key 2
    a1 = rows[(1, 1)]
    assert (a1.attr, a1.valid_from, a1.valid_to, a1.is_current) == \
        ("A", 10, 30, False)
    b = rows[(1, 2)]
    assert (b.attr, b.valid_from, b.valid_to) == ("B", 30, 40)
    a2 = rows[(1, 3)]
    assert (a2.attr, a2.valid_from, a2.valid_to, a2.is_current) == \
        ("A", 40, None, True)
    x = rows[(2, 1)]
    assert (x.attr, x.valid_to, x.is_current) == ("X", None, True)


def test_scd2_no_collapse_keeps_every_observation(spark):
    out = scd2_build(_changelog(spark), "k", ["ts", "seq"], ["attr"],
                     collapse_runs=False)
    assert out.count() == 5
    versions = sorted(
        r.version for r in out.filter("k = 1").collect())
    assert versions == [1, 2, 3, 4]


def test_scd2_null_attrs_are_null_safe(spark):
    df = spark.createDataFrame(
        [(1, 10, None), (1, 20, None), (1, 30, "A")],
        "k long, ts long, attr string")
    out = scd2_build(df, "k", ["ts"], ["attr"]).collect()
    # two NULL observations collapse into one version
    assert len(out) == 2
    assert sorted(((r.valid_from, r.attr) for r in out)) \
        == [(10, None), (30, "A")]


def test_scd2_validates_inputs(spark):
    df = _changelog(spark)
    with pytest.raises(ValueError, match="order_cols"):
        scd2_build(df, "k", [], ["attr"])
    with pytest.raises(ValueError, match="attr_cols"):
        scd2_build(df, "k", ["ts"], [])


def test_merge_agg_states_equals_full_recompute(spark):
    ev = spark.range(1000).select(
        (F.col("id") % 13).alias("k"),
        (F.col("id") * 17 % 101).cast("double").alias("v"),
        F.col("id").alias("ord"))
    full = ev.groupBy("k").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("s"),
        F.min("v").alias("mn"), F.max("v").alias("mx"))

    def state(part):
        return part.groupBy("k").agg(
            F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("s"),
            F.min("v").alias("mn"), F.max("v").alias("mx"))

    merged = merge_agg_states(
        [state(ev.filter("ord < 400")),
         state(ev.filter("ord >= 400 and ord < 900")),
         state(ev.filter("ord >= 900"))],
        ["k"], {"cnt": "sum", "s": "sum", "mn": "min", "mx": "max"})
    got = {r.k: (r.cnt, round(r.s, 6), r.mn, r.mx)
           for r in merged.collect()}
    want = {r.k: (r.cnt, round(r.s, 6), r.mn, r.mx)
            for r in full.collect()}
    assert got == want


def test_merge_agg_states_disjoint_keys_full_outer(spark):
    a = spark.createDataFrame([(1, 10)], "k long, cnt long")
    b = spark.createDataFrame([(2, 20)], "k long, cnt long")
    out = {r.k: r.cnt for r in merge_agg_states(
        [a, b], ["k"], {"cnt": "sum"}).collect()}
    assert out == {1: 10, 2: 20}


def test_merge_agg_states_validates(spark):
    a = spark.createDataFrame([(1, 10)], "k long, cnt long")
    with pytest.raises(ValueError, match="at least two"):
        merge_agg_states([a], ["k"], {"cnt": "sum"})
    with pytest.raises(ValueError, match="unsupported merge"):
        merge_agg_states([a, a], ["k"], {"cnt": "avg"})


def test_scd2_multi_attr_multi_key(spark):
    from lindel_spark.history import scd2_build
    df = spark.createDataFrame(
        [
            ("a", 1, 10, "X", 1.0),
            ("a", 1, 20, "X", 1.0),   # no change -> collapses
            ("a", 1, 30, "X", 2.0),   # second attr changes -> new version
            ("a", 2, 5, "Y", 9.0),    # different composite key
        ],
        "k1 string, k2 long, ts long, s string, v double")
    out = scd2_build(df, ["k1", "k2"], ["ts"], ["s", "v"])
    rows = sorted(((r.k1, r.k2, r.version, r.s, r.v, r.valid_from,
                    r.valid_to) for r in out.collect()))
    assert rows == [
        ("a", 1, 1, "X", 1.0, 10, 30),
        ("a", 1, 2, "X", 2.0, 30, None),
        ("a", 2, 1, "Y", 9.0, 5, None),
    ]
