"""As-of join and spatial range join semantics tests."""

import pytest
from pyspark.sql import functions as F

from lindel_spark.joins import asof_join, spatial_range_join


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 5), (2, 10), (3, 10)],
        "k long, ts long")
    right = spark.createDataFrame(
        [(1, 8, 100.0), (1, 10, 110.0), (1, 15, 120.0), (2, 99, 130.0)],
        "k long, ts long, v double")
    out = {(r.k, r.ts): r.v_r for r in
           asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                     value_cols=["v"]).collect()}
    assert out[(1, 10)] == 110.0   # equal ts matches (<=)
    assert out[(1, 20)] == 120.0   # latest prior
    assert out[(1, 5)] is None     # nothing at-or-before
    assert out[(2, 10)] is None    # right is later
    assert out[(3, 10)] is None    # key absent from right


def test_asof_keeps_all_left_rows(spark):
    left = spark.range(100).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("ts"))
    right = spark.range(10).select(
        (F.col("id") % 7).alias("k"), (F.col("id") * 11).alias("ts"),
        F.col("id").cast("double").alias("v"))
    out = asof_join(left, right, on="k", value_cols=["v"],
                    left_ts="ts", right_ts="ts")
    assert out.count() == 100
    assert set(out.columns) == {"k", "ts", "v_r"}


def test_spatial_range_join_exact_vs_brute(spark):
    import numpy as np
    rng = np.random.RandomState(3)
    pts = [(int(i), float(x), float(y)) for i, (x, y) in
           enumerate(rng.uniform(0, 100, size=(200, 2)))]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    r = 7.5
    got = {(p.l_id, p.r_id) for p in
           spatial_range_join(df, df, ["x", "y"], ["x", "y"], r)
           .filter(F.col("l_id") < F.col("r_id")).collect()}
    arr = np.array([(x, y) for _, x, y in pts])
    want = set()
    for i in range(len(pts)):
        d = np.abs(arr - arr[i]).max(axis=1)
        for j in np.where(d <= r)[0]:
            if i < j:
                want.add((i, int(j)))
    assert got == want  # complete AND exact


def test_spatial_range_join_l2(spark):
    df = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 3.0, 4.0), (3, 10.0, 0.0)],
        "id long, x double, y double")
    got = {(p.l_id, p.r_id): p.dist for p in
           spatial_range_join(df, df, ["x", "y"], ["x", "y"], 5.0,
                              metric="l2")
           .filter(F.col("l_id") < F.col("r_id")).collect()}
    assert got == {(1, 2): 5.0}  # L2 dist exactly 5; (1,3) at 10 excluded


def test_asof_duplicate_right_ts_deterministic(spark):
    """Multiple right rows on the same (key, ts) resolve to the
    greatest value tuple, deterministically."""
    left = spark.createDataFrame([("u", 10)], "k string, ts long")
    right = spark.createDataFrame(
        [("u", 5, 1.0), ("u", 5, 9.0), ("u", 5, 4.0)],
        "k string, ts long, v double")
    for _ in range(3):
        r = asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                      value_cols=["v"]).collect()
        assert len(r) == 1 and r[0].v_r == 9.0


def test_spatial_out_of_range_raises(spark):
    df = spark.createDataFrame([(1, 3.0e9, 0.0)], "id long, x double, y double")
    with pytest.raises(Exception, match="out of range"):
        spatial_range_join(df, df, ["x", "y"], ["x", "y"], 1.0).collect()


def test_asof_join_directions_match_pandas(spark):
    """backward/forward/nearest vs pandas merge_asof on the same data
    (unique right timestamps so pandas tie rules don't differ)."""
    import pandas as pd
    from lindel_spark.joins import asof_join

    left = pd.DataFrame({
        "k": [1, 1, 1, 2, 2, 3],
        "lt": [10, 55, 100, 7, 90, 4],
        "lid": [0, 1, 2, 3, 4, 5],
    })
    right = pd.DataFrame({
        "k": [1, 1, 1, 2, 2, 4],
        "rt": [5, 50, 200, 8, 80, 1],
        "v": [100, 200, 300, 400, 500, 600],
    })
    ldf = spark.createDataFrame(left)
    rdf = spark.createDataFrame(right)
    for direction in ("backward", "forward", "nearest"):
        got = {
            r.lid: r.v_r for r in asof_join(
                ldf, rdf, on="k", left_ts="lt", right_ts="rt",
                value_cols=["v"], direction=direction).collect()
        }
        exp_df = pd.merge_asof(
            left.sort_values("lt"), right.sort_values("rt"),
            left_on="lt", right_on="rt", by="k", direction=direction)
        exp = {int(r.lid): (None if pd.isna(r.v) else int(r.v))
               for r in exp_df.itertuples()}
        assert got == exp, (direction, got, exp)


def test_asof_join_rejects_bad_direction(spark):
    import pytest
    from lindel_spark.joins import asof_join

    df = spark.range(1).select(F.col("id").alias("k"),
                               F.col("id").alias("ts"))
    with pytest.raises(ValueError, match="direction"):
        asof_join(df, df, on="k", left_ts="ts", right_ts="ts",
                  value_cols=[], direction="sideways")


def test_cogroup_asof_matches_window_asof(spark):
    from lindel_spark.joins import asof_join, cogroup_asof_join
    left = spark.createDataFrame(
        [(1, 10), (1, 25), (1, 4), (2, 7), (3, 100)],
        "k long, ts long")
    right = spark.createDataFrame(
        [(1, 5, 1.0), (1, 20, 2.0), (2, 7, 3.0), (4, 1, 9.0)],
        "k long, ts long, v double")
    a = asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                  value_cols=["v"])
    b = cogroup_asof_join(left, right, on="k", left_ts="ts",
                          right_ts="ts", value_cols=["v"])
    ka = sorted(tuple(r) for r in a.select("k", "ts", "v_r").collect())
    kb = sorted((r["k"], r["ts"], r["v_r"]) for r in b.collect())
    assert ka == kb
    # spot semantics: backward match picks ts<=left, latest
    d = dict(((k, t), v) for k, t, v in kb)
    assert d[(1, 10)] == 1.0 and d[(1, 25)] == 2.0 and d[(1, 4)] is None
    assert d[(2, 7)] == 3.0 and d[(3, 100)] is None


# ---------------------------------------------------------------------------
# interval_overlap_join
# ---------------------------------------------------------------------------

def test_interval_overlap_exact_vs_brute(spark):
    import numpy as np
    from lindel_spark.joins import interval_overlap_join
    rng = np.random.RandomState(11)
    pts = [(int(k), int(p), int(t)) for p, (k, t) in enumerate(
        zip(rng.randint(0, 5, 300), rng.randint(0, 10_000, 300)))]
    ivs = [(int(k), int(i), int(s), int(s + span)) for i, (k, s, span)
           in enumerate(zip(rng.randint(0, 5, 60),
                            rng.randint(0, 10_000, 60),
                            rng.randint(0, 900, 60)))]
    points = spark.createDataFrame(pts, "k long, pid long, ts long")
    intervals = spark.createDataFrame(
        ivs, "k long, iid long, s long, e long")
    got = {(r.pid, r.i_iid) for r in interval_overlap_join(
        points, intervals, on="k", point_ts="ts",
        start="s", end="e", grain=500).collect()}
    want = {(p, i) for (pk, p, t) in pts for (ik, i, s, e) in ivs
            if pk == ik and s <= t <= e}
    assert got == want


def test_interval_overlap_no_duplicate_pairs(spark):
    from lindel_spark.joins import interval_overlap_join
    # one interval spanning many buckets; each covered point must
    # appear exactly once (points probe a single bucket)
    points = spark.createDataFrame(
        [(1, p, p * 100) for p in range(50)], "k long, pid long, ts long")
    intervals = spark.createDataFrame(
        [(1, 1, 0, 4900)], "k long, iid long, s long, e long")
    out = interval_overlap_join(points, intervals, on="k",
                                point_ts="ts", start="s", end="e",
                                grain=250)
    assert out.count() == 50
    assert out.select("pid").distinct().count() == 50


def test_interval_overlap_guard_raises_on_explosive_span(spark):
    import pytest as _pytest
    from lindel_spark.joins import interval_overlap_join
    points = spark.createDataFrame([(1, 1, 5)], "k long, pid long, ts long")
    intervals = spark.createDataFrame(
        [(1, 1, 0, 10_000_000)], "k long, iid long, s long, e long")
    # the explosion guard is in-plan (no pre-scan job): it raises when
    # the join actually executes
    with _pytest.raises(Exception, match="buckets at grain"):
        interval_overlap_join(points, intervals, on="k", point_ts="ts",
                              start="s", end="e", grain=1,
                              max_buckets_per_interval=1000).collect()
    with _pytest.raises(ValueError, match="grain"):
        interval_overlap_join(points, intervals, on="k", point_ts="ts",
                              start="s", end="e", grain=0)


# ---------------------------------------------------------------------------
# bloom_semi_join
# ---------------------------------------------------------------------------

def test_bloom_semi_join_equals_exact_semi(spark):
    from lindel_spark.joins import bloom_semi_join
    fact = spark.range(5000).select(
        (F.col("id") % 997).alias("key"), F.col("id").alias("payload"))
    dim = spark.range(40).select((F.col("id") * 31).alias("key"))
    got = bloom_semi_join(fact, dim, on="key")
    want = fact.join(dim, "key", "left_semi")
    assert got.count() == want.count()
    assert {(r.key, r.payload) for r in got.collect()} == \
        {(r.key, r.payload) for r in want.collect()}


def test_bloom_semi_join_string_keys(spark):
    from lindel_spark.joins import bloom_semi_join
    fact = spark.createDataFrame(
        [(f"u{i}", i) for i in range(500)], "key string, v long")
    dim = spark.createDataFrame(
        [(f"u{i * 7}",) for i in range(20)], "key string")
    got = {r.key for r in bloom_semi_join(fact, dim, "key").collect()}
    want = {f"u{i * 7}" for i in range(20) if i * 7 < 500}
    assert got == want


def test_bloom_prefilter_actually_prunes(spark):
    # the pre-filter alone (before the exact join) must keep all true
    # matches and drop ~(1-fpp) of non-matches
    import math

    import numpy as np
    from lindel_spark.joins import bloom_semi_join

    fact = spark.range(20_000).select((F.col("id")).alias("key"))
    dim = spark.range(100).select((F.col("id") * 181).alias("key"))
    out = bloom_semi_join(fact, dim, on="key", fpp=0.01)
    # exact result: the dim's 100 keys (0..99*181) all fall below 20k
    assert out.count() == 100
    # small-dim bitmap embeds as a JVM literal: the probe must be pure
    # codegen — no Python eval stage anywhere in the plan
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "pythonUDF" not in plan and "EvalPython" not in plan
    assert "getbit" in plan.lower()


def test_bloom_semi_join_udf_path_matches(spark, monkeypatch):
    # force the large-bitmap Arrow-UDF probe path and confirm identical
    # results to the JVM literal path
    import lindel_spark.joins as J
    fact = spark.range(3000).select((F.col("id") % 701).alias("key"),
                                    F.col("id").alias("v"))
    dim = spark.range(30).select((F.col("id") * 23).alias("key"))
    jvm = {(r.key, r.v) for r in
           J.bloom_semi_join(fact, dim, on="key").collect()}
    monkeypatch.setattr(J, "_BLOOM_JVM_WORDS_MAX", 0)
    udf = {(r.key, r.v) for r in
           J.bloom_semi_join(fact, dim, on="key").collect()}
    assert jvm == udf
    want = {(r.key, r.v) for r in
            fact.join(dim, "key", "left_semi").collect()}
    assert jvm == want


def test_bloom_semi_join_empty_dim(spark):
    from lindel_spark.joins import bloom_semi_join
    fact = spark.range(100).select(F.col("id").alias("key"))
    dim = spark.range(0).select(F.col("id").alias("key"))
    assert bloom_semi_join(fact, dim, on="key").count() == 0


def test_asof_tolerance_gates_stale_matches(spark):
    from lindel_spark.joins import asof_join

    left = spark.createDataFrame(
        [(1, 100.0), (2, 200.0), (3, 500.0)], ["id", "ts"])
    left = left.withColumnRenamed("id", "k").selectExpr(
        "1 as key", "ts", "k")
    right = spark.createDataFrame(
        [(1, 95.0, "a"), (1, 480.0, "b")], ["key", "ts", "v"])
    out = {r.k: r.v_r
           for r in asof_join(left, right, on="key", left_ts="ts",
                              right_ts="ts", value_cols=["v"],
                              tolerance=10.0).collect()}
    # ts=100 matches 95 (gap 5 <= 10); ts=200's backward match is 95
    # (gap 105 > 10 -> NULL); ts=500 matches 480 (gap 20 > 10 -> NULL)
    assert out == {1: "a", 2: None, 3: None}
    # without tolerance the stale matches come back
    full = {r.k: r.v_r
            for r in asof_join(left, right, on="key", left_ts="ts",
                               right_ts="ts",
                               value_cols=["v"]).collect()}
    assert full == {1: "a", 2: "a", 3: "b"}


def test_asof_tolerance_nearest_and_validation(spark):
    from lindel_spark.joins import asof_join

    left = spark.createDataFrame([(1, 1, 100.0)], ["k", "key", "ts"])
    right = spark.createDataFrame(
        [(1, 92.0, "back"), (1, 103.0, "fwd")], ["key", "ts", "v"])
    near = asof_join(left, right, on="key", left_ts="ts",
                     right_ts="ts", value_cols=["v"],
                     direction="nearest", tolerance=5.0).collect()[0]
    assert near.v_r == "fwd"  # forward is closer (3 vs 8) and <= 5
    tight = asof_join(left, right, on="key", left_ts="ts",
                      right_ts="ts", value_cols=["v"],
                      direction="nearest", tolerance=2.0).collect()[0]
    assert tight.v_r is None
    import pytest as _p
    with _p.raises(ValueError):
        asof_join(left, right, on="key", left_ts="ts", right_ts="ts",
                  value_cols=["v"], tolerance=-1.0)


def test_asof_tolerance_timestamp_seconds(spark):
    import datetime as dt

    from lindel_spark.joins import asof_join

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, 1, t0 + dt.timedelta(seconds=100))], ["k", "key", "ts"])
    right = spark.createDataFrame(
        [(1, t0, "old"), (1, t0 + dt.timedelta(seconds=70), "new")],
        ["key", "ts", "v"])
    got = asof_join(left, right, on="key", left_ts="ts",
                    right_ts="ts", value_cols=["v"],
                    tolerance=60.0).collect()[0]
    assert got.v_r == "new"  # 30 s gap within the 60 s bound
    got2 = asof_join(left, right, on="key", left_ts="ts",
                     right_ts="ts", value_cols=["v"],
                     tolerance=10.0).collect()[0]
    assert got2.v_r is None


def test_asof_tolerance_ages_the_supplying_row(spark):
    """With NULL right values the ignorenulls carry can reach PAST
    the nearest right row; the staleness gate must age the row that
    supplied the value, not the nearest row (review catch)."""
    from lindel_spark.joins import asof_join

    left = spark.createDataFrame([(1, 1, 12.0)], ["k", "key", "ts"])
    right = spark.createDataFrame(
        [(1, 5.0, "a"), (1, 10.0, None)], ["key", "ts", "v"])
    r = asof_join(left, right, on="key", left_ts="ts", right_ts="ts",
                  value_cols=["v"], tolerance=3.0).collect()[0]
    assert r.v_r is None  # 'a' is 7 units stale; nearest row is NULL
    r2 = asof_join(left, right, on="key", left_ts="ts", right_ts="ts",
                   value_cols=["v"], tolerance=8.0).collect()[0]
    assert r2.v_r == "a"  # within bound once the supplier qualifies


def test_asof_tolerance_date_columns(spark):
    import datetime as dt

    from lindel_spark.joins import asof_join

    left = spark.createDataFrame(
        [(1, 1, dt.date(2024, 1, 10))], ["k", "key", "d"])
    right = spark.createDataFrame(
        [(1, dt.date(2024, 1, 8), "x")], ["key", "d", "v"])
    got = asof_join(left, right, on="key", left_ts="d", right_ts="d",
                    value_cols=["v"],
                    tolerance=3 * 86400.0).collect()[0]
    assert got.v_r == "x"  # 2 days within a 3-day bound
    tight = asof_join(left, right, on="key", left_ts="d",
                      right_ts="d", value_cols=["v"],
                      tolerance=86400.0).collect()[0]
    assert tight.v_r is None


def test_asof_tolerance_null_right_values_age_the_supplier(spark):
    """round-12 advice pin: a NULL-valued right row is skipped (the
    carry reaches past it to the older non-NULL supplier) and the
    staleness tolerance gates on THAT supplier row — so a left row
    whose nearest right row is NULL-valued gets (a) the older value
    when the supplier is within tolerance, (b) NULL when the supplier
    has aged out. Native SQL ASOF (row-nearest) would return NULL in
    both cases; this is the documented divergence."""
    from lindel_spark.joins import asof_join

    right = spark.createDataFrame(
        [("k", 10.0, 7.0),    # old non-NULL supplier
         ("k", 95.0, None)],  # nearest row, NULL value
        "on string, ts double, v double")
    left = spark.createDataFrame(
        [("k", 100.0),   # supplier age 90 <= tol -> carried 7.0
         ("k", 200.0)],  # supplier age 190 > tol -> NULL
        "on string, ts double")
    got = {r.ts: r.v_r for r in asof_join(
        left, right, on="on", left_ts="ts", right_ts="ts",
        value_cols=["v"], tolerance=150.0).collect()}
    assert got == {100.0: 7.0, 200.0: None}
    # without tolerance the skip-carry still applies
    got2 = {r.ts: r.v_r for r in asof_join(
        left, right, on="on", left_ts="ts", right_ts="ts",
        value_cols=["v"]).collect()}
    assert got2 == {100.0: 7.0, 200.0: 7.0}
