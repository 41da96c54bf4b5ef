"""Salted join / two-phase distinct: result equivalence under skew."""

import pytest
from pyspark.sql import functions as F

from lindel_spark.skew import salted_join, two_phase_distinct


def test_salted_join_equals_plain_join(spark):
    # heavily skewed left: 90% of rows share key 7
    left = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, 7).otherwise(F.col("id") % 50)
        .alias("k"), F.col("id").alias("lv"))
    right = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("rv"))
    plain = {(r.k, r.lv, r.rv) for r in left.join(right, "k").collect()}
    salted = {(r.k, r.lv, r.rv)
              for r in salted_join(left, right, "k", salt=8).collect()}
    assert salted == plain


def test_salted_left_join(spark):
    left = spark.range(100).select((F.col("id") % 5).alias("k"),
                                   F.col("id").alias("lv"))
    right = spark.range(3).select(F.col("id").alias("k"),
                                  F.lit("x").alias("rv"))
    out = salted_join(left, right, "k", salt=4, how="left")
    assert out.count() == 100
    assert out.filter(F.col("rv").isNull()).count() == 40  # keys 3,4


def test_two_phase_distinct(spark):
    df = spark.range(1000).select(
        (F.col("id") % 3).alias("k"), (F.col("id") % 17).alias("v"))
    got = {r.k: r.n_distinct
           for r in two_phase_distinct(df, "k", "v").collect()}
    want = {r.k: r.cnt for r in
            df.groupBy("k").agg(F.countDistinct("v").alias("cnt")).collect()}
    assert got == want


def test_salted_join_reproducible_across_repartition(spark):
    # Content-hash salt: the same input under a different physical
    # layout must produce the identical multiset of rows (rand(seed)
    # salting broke this — it depends on the partition index).
    left = spark.range(500).select(
        F.when(F.col("id") % 10 < 8, 3).otherwise(F.col("id") % 20)
        .alias("k"), F.col("id").alias("lv"))
    right = spark.range(20).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("rv"))
    a = sorted((r.k, r.lv, r.rv)
               for r in salted_join(left, right, "k", salt=8).collect())
    b = sorted((r.k, r.lv, r.rv)
               for r in salted_join(left.repartition(7), right.repartition(3),
                                    "k", salt=8).collect())
    assert a == b


def test_salted_join_spreads_hot_key(spark):
    # The hot key's rows must land in >1 salt bucket (the point of
    # salting); distinct lv values hash to distinct-enough buckets.
    left = spark.range(1000).select(F.lit(7).alias("k"),
                                    F.col("id").alias("lv"))
    n_buckets = (
        left.withColumn("__salt",
                        F.pmod(F.hash(*[F.col(c) for c in left.columns]),
                               F.lit(8)))
        .select("__salt").distinct().count()
    )
    assert n_buckets == 8


def test_salted_join_rejects_outer_modes(spark):
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    for how in ("right", "full", "outer", "right_outer", "full_outer"):
        with pytest.raises(ValueError, match="salt-invariant"):
            salted_join(df, df, on="k", how=how)


def test_join_skew_report_exact_fanout_and_order(spark):
    from lindel_spark.skew import join_skew_report

    left = spark.createDataFrame(
        [(k,) for k in [1] * 10 + [2] * 3 + [3] * 1 + [None]],
        "k long")
    right = spark.createDataFrame(
        [(k,) for k in [1] * 4 + [2] * 5 + [4] * 9],
        "k long")
    rows = join_skew_report(left, right, "k", top_n=10).collect()
    # key 3 and 4 don't co-occur; nulls never join
    assert [(r.key, r.cnt_left, r.cnt_right, r.out_rows)
            for r in rows] == [(1, 10, 4, 40), (2, 3, 5, 15)]
    assert abs(rows[0].out_share - 40 / 55) < 1e-12
    # the predicted fan-out IS the join's row count
    actual = left.join(right, "k").count()
    assert sum(r.out_rows for r in rows) == actual == 55


def test_join_skew_report_top_n_tie_break_and_validate(spark):
    import pytest

    from lindel_spark.skew import join_skew_report

    df = spark.createDataFrame([(k,) for k in range(100)], "k long")
    rows = join_skew_report(df, df, "k", top_n=5).collect()
    # all fan-outs tie at 1: ascending-key tie-break
    assert [r.key for r in rows] == [0, 1, 2, 3, 4]
    with pytest.raises(ValueError):
        join_skew_report(df, df, "k", top_n=0)
