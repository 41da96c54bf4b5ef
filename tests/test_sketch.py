"""Count-min sketch invariants and PII-scrub values."""

from pyspark.sql import functions as F

from lindel_spark import sketch as SK
from lindel_spark.text import scrub_pii


def _terms(spark, words):
    return spark.createDataFrame([(w,) for w in words], ["term"])


def test_cms_never_underestimates(spark):
    words = ["a"] * 50 + ["b"] * 20 + ["c"] * 5 + ["d", "e", "f"]
    terms = _terms(spark, words)
    # deliberately tiny width so collisions actually happen
    sk = SK.cms_sketch(terms, depth=3, width=4)
    exact = terms.groupBy("term").agg(F.count(F.lit(1)).alias("exact"))
    est = SK.cms_estimate(sk, exact, depth=3, width=4)
    rows = est.join(exact, "term").collect()
    assert len(rows) == 6
    assert all(r["est"] >= r["exact"] for r in rows)


def test_cms_exact_when_no_collisions(spark):
    words = ["x"] * 7 + ["y"] * 3
    terms = _terms(spark, words)
    sk = SK.cms_sketch(terms)  # width 1024, 2 terms: no collisions
    est = {r["term"]: r["est"] for r in SK.cms_estimate(
        sk, terms.distinct()).collect()}
    assert est == {"x": 7, "y": 3}


def test_cms_sketch_size_is_bounded(spark):
    words = [f"w{i}" for i in range(500)]
    sk = SK.cms_sketch(_terms(spark, words), depth=4, width=16)
    assert sk.count() <= 4 * 16


def test_cms_unseen_term_estimates_from_grid(spark):
    terms = _terms(spark, ["a", "b"])
    sk = SK.cms_sketch(terms, depth=4, width=1024)
    est = {r["term"]: r["est"] for r in SK.cms_estimate(
        sk, _terms(spark, ["zzz"]), depth=4, width=1024).collect()}
    assert est["zzz"] == 0  # empty cells coalesce to 0


def test_cms_weighted(spark):
    df = spark.createDataFrame([("a", 5), ("a", 2), ("b", 1)],
                               ["term", "w"])
    sk = SK.cms_sketch(df, weight_col="w")
    est = {r["term"]: r["est"] for r in SK.cms_estimate(
        sk, df.select("term").distinct()).collect()}
    assert est == {"a": 7, "b": 1}


def test_heavy_hitters_rank_and_guarantee(spark):
    words = ["top"] * 30 + ["mid"] * 10 + ["low"] * 2
    res = SK.heavy_hitters(_terms(spark, words), k=2).collect()
    assert [(r["rank"], r["term"]) for r in res] == [(1, "top"), (2, "mid")]
    assert all(r["est"] >= r["exact"] for r in res)


def test_scrub_pii_values(spark):
    df = spark.createDataFrame(
        [("reach me at +1 (415) 555-0199 or 10.0.0.1 or a@b.io "
          "or https://x.io/y",)], ["text"])
    out = df.select(scrub_pii(F.col("text")).alias("t")).collect()[0]["t"]
    assert out == "reach me at <PHONE> or <IP> or <EMAIL> or <URL>"


def test_scrub_pii_leaves_clean_text_alone(spark):
    df = spark.createDataFrame([("just words and the number 42",)],
                               ["text"])
    out = df.select(scrub_pii(F.col("text")).alias("t")).collect()[0]["t"]
    assert out == "just words and the number 42"


def test_cms_sketch_streams_with_bounded_state(spark, tmp_path_factory):
    """cms_sketch is select + groupBy-sum, so it runs unchanged as a
    streaming aggregation whose state is the depth x width grid itself
    — bounded regardless of stream volume. Streaming grid == batch
    grid over the same inputs."""
    import pyspark.sql.types as T

    words = ["a"] * 9 + ["b"] * 4 + ["c", "d"] * 3
    batch = spark.createDataFrame([(w,) for w in words], ["term"])
    src = str(tmp_path_factory.mktemp("cms_stream"))
    batch.repartition(3).write.mode("overwrite").parquet(src)

    stream = (spark.readStream
              .schema(T.StructType([T.StructField("term", T.StringType())]))
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (SK.cms_sketch(stream, depth=3, width=8)
         .writeStream.outputMode("complete")
         .format("memory").queryName("cms_t")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["row"], r["bucket"]): r["cnt"]
           for r in spark.sql("SELECT * FROM cms_t").collect()}
    want = {(r["row"], r["bucket"]): r["cnt"]
            for r in SK.cms_sketch(batch, depth=3, width=8).collect()}
    assert got == want
    assert len(got) <= 3 * 8


def test_cms_merge_equals_single_pass(spark):
    w1 = ["a"] * 5 + ["b"] * 2
    w2 = ["a"] * 3 + ["c"] * 4
    s1 = SK.cms_sketch(_terms(spark, w1), depth=3, width=16)
    s2 = SK.cms_sketch(_terms(spark, w2), depth=3, width=16)
    merged = SK.cms_merge(s1, s2)
    single = SK.cms_sketch(_terms(spark, w1 + w2), depth=3, width=16)
    got = {(r["row"], r["bucket"]): r["cnt"] for r in merged.collect()}
    want = {(r["row"], r["bucket"]): r["cnt"] for r in single.collect()}
    assert got == want


def test_histogram_sketch_merge_equals_single_pass(spark):
    from lindel_spark.sketch import histogram_merge, histogram_sketch
    df = spark.range(2000).select(
        (F.col("id") % 977).cast("double").alias("v"),
        F.col("id").alias("ord"))
    full = histogram_sketch(df, "v", 0.0, 1000.0, 64)
    merged = histogram_merge(
        histogram_sketch(df.filter("ord < 700"), "v", 0.0, 1000.0, 64),
        histogram_sketch(df.filter("ord >= 700"), "v", 0.0, 1000.0, 64))
    a = {r.bin: r.cnt for r in full.collect()}
    b = {r.bin: r.cnt for r in merged.collect()}
    assert a == b


def test_histogram_quantiles_within_bin_width(spark):
    import numpy as np
    from lindel_spark.sketch import histogram_quantiles, histogram_sketch
    vals = [float(x) for x in np.random.RandomState(7).uniform(
        0, 500, 3000)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    h = histogram_sketch(df, "v", 0.0, 500.0, 250)  # bin width 2.0
    qs = {r.q: r.est for r in histogram_quantiles(
        h, [0.5, 0.95], 0.0, 500.0, 250).collect()}
    exact = np.quantile(vals, [0.5, 0.95])
    assert abs(qs[0.5] - exact[0]) <= 2.0 + 1e-9
    assert abs(qs[0.95] - exact[1]) <= 2.0 + 1e-9


def test_histogram_sketch_clamps_and_validates(spark):
    import pytest as _p
    from lindel_spark.sketch import histogram_sketch
    df = spark.createDataFrame(
        [(-5.0,), (0.5,), (99.5,), (250.0,), (None,)], "v double")
    h = {r.bin: r.cnt for r in
         histogram_sketch(df, "v", 0.0, 100.0, 10).collect()}
    assert h[0] == 2      # -5 clamps into bin 0 alongside 0.5
    assert h[9] == 2      # 99.5 in last bin; 250 clamps into it
    assert sum(h.values()) == 4  # NULL skipped
    with _p.raises(ValueError, match="n_bins"):
        histogram_sketch(df, "v", 0.0, 1.0, 0)
    with _p.raises(ValueError, match="hi > lo"):
        histogram_sketch(df, "v", 5.0, 5.0, 8)


def test_grouped_histogram_quantiles_match_per_group_exact(spark):
    import numpy as np
    from lindel_spark.sketch import (histogram_quantiles_grouped,
                                     histogram_sketch_grouped)
    rng = np.random.RandomState(13)
    rows = [("a", float(v)) for v in rng.uniform(0, 100, 2000)] + \
           [("b", float(v)) for v in rng.uniform(200, 400, 2000)]
    df = spark.createDataFrame(rows, "k string, v double")
    h = histogram_sketch_grouped(df, "k", "v", 0.0, 400.0, 400)
    qs = {(r.k, r.q): r.est for r in histogram_quantiles_grouped(
        h, "k", [0.5, 0.95], 0.0, 400.0, 400).collect()}
    a = np.array([v for k, v in rows if k == "a"])
    b = np.array([v for k, v in rows if k == "b"])
    # bin width 1.0 bounds the estimate error per group
    assert abs(qs[("a", 0.5)] - np.quantile(a, 0.5)) <= 1.0 + 1e-9
    assert abs(qs[("b", 0.95)] - np.quantile(b, 0.95)) <= 1.0 + 1e-9


def test_histogram_sketch_streams_with_grid_bounded_state(
        spark, tmp_path_factory):
    """The grouped histogram is select + groupBy-sum, so it runs
    unchanged as a streaming aggregation whose state is the grid."""
    from lindel_spark.sketch import histogram_sketch_grouped
    src_dir = str(tmp_path_factory.mktemp("hist_src"))
    schema = "k string, v double"
    for i in range(2):
        spark.createDataFrame(
            [("t", float((i * 37 + j * 7) % 100)) for j in range(200)],
            schema).coalesce(1).write.mode("append").parquet(src_dir)
    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", "1").parquet(src_dir))
    agg = histogram_sketch_grouped(src, "k", "v", 0.0, 100.0, 20)
    q = (agg.writeStream.outputMode("complete")
         .format("memory").queryName("hist_t")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.k, r.bin): r.cnt
           for r in spark.sql("SELECT * FROM hist_t").collect()}
    want = {(r.k, r.bin): r.cnt for r in histogram_sketch_grouped(
        spark.read.parquet(src_dir), "k", "v", 0.0, 100.0, 20
    ).collect()}
    assert got == want and len(got) <= 20


def test_kmv_estimate_accuracy_and_exact_small_groups(spark):
    from lindel_spark.sketch import kmv_estimate, kmv_sketch
    df = spark.range(20_000).select(
        F.lit("big").alias("g"), (F.col("id") % 5000).alias("v")
    ).unionByName(spark.range(50).select(
        F.lit("small").alias("g"), F.col("id").alias("v")))
    est = {r.g: r.est for r in kmv_estimate(
        kmv_sketch(df, "g", "v", k=256), k=256).collect()}
    assert est["small"] == 50.0            # under-filled sketch: EXACT
    assert abs(est["big"] - 5000) / 5000 < 0.15  # ~1/sqrt(k) error


def test_kmv_merge_equals_single_pass(spark):
    from lindel_spark.sketch import kmv_estimate, kmv_merge, kmv_sketch
    df = spark.range(8000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 1000).alias("v"), F.col("id").alias("ord"))
    full = kmv_sketch(df, "g", "v", k=64)
    merged = kmv_merge(
        kmv_sketch(df.filter("ord < 3000"), "g", "v", k=64),
        kmv_sketch(df.filter("ord >= 3000"), "g", "v", k=64), k=64)
    a = {(r.g, r.rank): r.h for r in full.collect()}
    b = {(r.g, r.rank): r.h for r in merged.collect()}
    assert a == b
    ea = {r.g: r.est for r in kmv_estimate(full, k=64).collect()}
    eb = {r.g: r.est for r in kmv_estimate(merged, k=64).collect()}
    assert ea == eb


def test_kmv_merge_underfilled_shards_not_truncated(spark):
    """ADVICE round-8: merging sketches whose every group is
    UNDER-filled (fewer than k distinct per shard) must keep the
    union's distinct hashes — with k inferred from max rank the
    merge truncated to the largest shard and kmv_estimate reported
    it as an exact count (2x undercount on disjoint shards)."""
    from lindel_spark.sketch import kmv_estimate, kmv_merge, kmv_sketch
    a = spark.range(100).select(
        F.lit("g").alias("g"), F.col("id").alias("v"))
    b = spark.range(100, 200).select(
        F.lit("g").alias("g"), F.col("id").alias("v"))
    merged = kmv_merge(kmv_sketch(a, "g", "v", k=256),
                       kmv_sketch(b, "g", "v", k=256), k=256)
    est = {r.g: r.est for r in kmv_estimate(merged, k=256).collect()}
    # 200 < k: the merged sketch holds every hash, estimate is EXACT
    assert est["g"] == 200.0


def test_kmv_intersect_estimate_tracks_truth(spark):
    from lindel_spark.sketch import kmv_intersect_estimate, kmv_sketch
    # A = 0..5999, B = 4000..9999 -> union 10000, intersection 2000
    a = spark.range(6000).select(F.lit("g").alias("g"),
                                 F.col("id").alias("v"))
    b = spark.range(4000, 10000).select(F.lit("g").alias("g"),
                                        F.col("id").alias("v"))
    ska = kmv_sketch(a, "g", "v", k=512).drop("g")
    skb = kmv_sketch(b, "g", "v", k=512).drop("g")
    r = kmv_intersect_estimate(ska, skb, k=512).first()
    assert abs(r.est_union - 10000) / 10000 < 0.15
    assert abs(r.est_intersection - 2000) / 2000 < 0.35
    assert 0.1 < r.jaccard_est < 0.35  # truth 0.2


def test_kmv_intersect_disjoint_sets(spark):
    from lindel_spark.sketch import kmv_intersect_estimate, kmv_sketch
    a = spark.range(100).select(F.lit("g").alias("g"),
                                F.col("id").alias("v"))
    b = spark.range(1000, 1100).select(F.lit("g").alias("g"),
                                       F.col("id").alias("v"))
    ska = kmv_sketch(a, "g", "v", k=128).drop("g")
    skb = kmv_sketch(b, "g", "v", k=128).drop("g")
    r = kmv_intersect_estimate(ska, skb, k=128).first()
    assert r.est_intersection == 0.0 and r.jaccard_est == 0.0
