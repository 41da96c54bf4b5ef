"""Deterministic sampling: layout-independence and weight fidelity."""

import pytest
from pyspark.sql import functions as F

from lindel_spark import sampling as SMP


def test_split_stable_under_repartition(spark):
    df = spark.range(2000).select(F.col("id").alias("k"))
    a = SMP.deterministic_split(df, "k", [0.8, 0.1, 0.1])
    b = SMP.deterministic_split(df.repartition(7), "k", [0.8, 0.1, 0.1])
    ra = {r.k: r.split for r in a.collect()}
    rb = {r.k: r.split for r in b.collect()}
    assert ra == rb
    counts = {}
    for s in ra.values():
        counts[s] = counts.get(s, 0) + 1
    assert 0.75 < counts["train"] / 2000 < 0.85
    assert set(counts) == {"train", "val", "test"}


def test_split_weight_name_mismatch_raises(spark):
    df = spark.range(10).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="align"):
        SMP.deterministic_split(df, "k", [0.5, 0.5], names=("a", "b", "c"))


def test_stratified_sample_exact_and_stable(spark):
    df = spark.range(3000).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("s"))
    kept = SMP.stratified_deterministic_sample(
        df, "k", "s", {"0": 0.0, "1": 0.5}, default_fraction=1.0)
    rows = kept.collect()
    by = {}
    for r in rows:
        by[r.s] = by.get(r.s, 0) + 1
    assert "0" not in by
    assert 0.4 < by["1"] / 1000 < 0.6
    assert by["2"] == 1000
    again = {r.k for r in SMP.stratified_deterministic_sample(
        df.repartition(5), "k", "s", {"0": 0.0, "1": 0.5},
        default_fraction=1.0).collect()}
    assert again == {r.k for r in rows}


def test_mixture_sample_targets_and_determinism(spark):
    from lindel_spark.sampling import mixture_sample
    from pyspark.sql import functions as F

    # skewed synthetic corpus: 600 web / 300 code / 100 math docs
    docs = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 600, "web")
        .when(F.col("id") < 900, "code")
        .otherwise("math").alias("source"))
    kept = mixture_sample(docs, "doc_id", "source",
                          {"web": 5, "code": 3, "math": 2}, 200)
    counts = {r.source: r["count"] for r in
              kept.groupBy("source").count().collect()}
    assert set(counts) <= {"web", "code", "math"}  # weight-0 excluded
    # targets 100/60/40 within sampling noise
    assert 60 <= counts["web"] <= 140
    assert 30 <= counts["code"] <= 95
    assert 15 <= counts["math"] <= 70
    again = {r.doc_id for r in
             mixture_sample(docs.repartition(13), "doc_id", "source",
                            {"web": 5, "code": 3, "math": 2},
                            200).collect()}
    assert again == {r.doc_id for r in kept.collect()}


def test_mixture_sample_caps_overallocated_stratum(spark):
    from lindel_spark.sampling import mixture_sample

    df = spark.createDataFrame(
        [(i, "tiny" if i < 3 else "big") for i in range(100)],
        "doc_id long, source string")
    kept = mixture_sample(df, "doc_id", "source",
                          {"tiny": 9, "big": 1}, 50)
    c = {r.source: r["count"] for r in kept.groupBy("source").count().collect()}
    assert c.get("tiny", 0) == 3  # fraction capped at 1.0: all 3 kept


def test_upsample_mixture_copies_and_partial(spark):
    from lindel_spark.sampling import split_fraction, upsample_mixture
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, "hot" if i < 10 else "cold") for i in range(100)],
        "doc_id long, source string")
    # hot: 10 rows must supply 25 -> factor 2.5; cold weight 0 -> dropped
    up = upsample_mixture(df, "doc_id", "source", {"hot": 1}, 25)
    rows = up.collect()
    assert all(r.source == "hot" for r in rows)
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r.copy_idx)
    fracs = {r.doc_id: r.f for r in df.filter(F.col("source") == "hot")
             .select("doc_id",
                     split_fraction(F.col("doc_id")).alias("f")).collect()}
    for doc_id, idxs in per_doc.items():
        want = 2 + (1 if fracs[doc_id] < 0.5 else 0)
        assert sorted(idxs) == list(range(want)), (doc_id, idxs)
    assert set(per_doc) == set(range(10))  # every hot doc kept
    # stable under repartitioning
    again = sorted((r.doc_id, r.copy_idx) for r in upsample_mixture(
        df.repartition(7), "doc_id", "source", {"hot": 1}, 25).collect())
    assert again == sorted((r.doc_id, r.copy_idx) for r in rows)


def test_upsample_mixture_rejects_zero_row_stratum(spark):
    """A target weight naming an absent stratum raises instead of
    silently emitting a mixture short of total_rows."""
    import pytest
    from lindel_spark.sampling import upsample_mixture

    df = spark.createDataFrame(
        [(i, "hot") for i in range(10)], "doc_id long, source string")
    with pytest.raises(ValueError, match="zero rows.*ghost"):
        upsample_mixture(df, "doc_id", "source",
                         {"hot": 1, "ghost": 1}, 25)


def test_deterministic_shuffle_order_and_plan(spark):
    from lindel_spark.sampling import deterministic_shuffle

    df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    out = deterministic_shuffle(df, "doc_id", salt="e1")
    got = [r.doc_id for r in out.collect()]
    assert got != sorted(got)  # actually shuffled
    keys = [r.shuffle_key for r in out.collect()]
    assert keys == sorted(keys)  # globally ordered by the epoch key
    # different salt, different order; same salt, same order on any layout
    other = [r.doc_id for r in
             deterministic_shuffle(df, "doc_id", salt="e2").collect()]
    assert other != got
    again = [r.doc_id for r in deterministic_shuffle(
        df.repartition(13), "doc_id", salt="e1").collect()]
    assert again == got
    # global sort must be a range partition, not a single-task sort
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan


def test_weighted_sample_deterministic_and_monotone(spark):
    from pyspark.sql import functions as F
    from lindel_spark.sampling import weighted_sample

    df = spark.range(2000).select(
        F.col("id"),
        (F.col("id") % 10 / 10.0).alias("w"),
    )
    a = sorted(r.id for r in weighted_sample(df, "id", "w").collect())
    # layout-stable: same rows after a repartition
    b = sorted(
        r.id for r in
        weighted_sample(df.repartition(13), "id", "w").collect())
    assert a == b
    # weight 0 rows never survive; clamped weight >= 1 always survives
    zero = weighted_sample(df, "id", F.lit(0.0)).count()
    allk = weighted_sample(df, "id", F.lit(5.0)).count()
    assert zero == 0 and allk == 2000
    # expected size ~ sum of weights (0..0.9 avg 0.45)
    assert 0.35 * 2000 < len(a) < 0.55 * 2000


def test_weighted_sample_n_exact_count_and_determinism(spark):
    from lindel_spark.sampling import weighted_sample_n
    df = spark.createDataFrame(
        [(i, float(1 + i % 3)) for i in range(100)], ["id", "w"])
    a = sorted(r["id"] for r in weighted_sample_n(df, "id", "w", 10).collect())
    b = sorted(r["id"] for r in weighted_sample_n(
        df.repartition(7), "id", "w", 10).collect())
    assert len(a) == 10 and a == b  # layout-independent membership


def test_weighted_sample_n_prefers_heavy_rows(spark):
    from lindel_spark.sampling import weighted_sample_n
    # two weight classes 1000:1 -> heavy rows should dominate the sample
    rows = [(i, 1000.0) for i in range(50)] + [(i, 1.0) for i in range(50, 100)]
    df = spark.createDataFrame(rows, ["id", "w"])
    got = [r["id"] for r in weighted_sample_n(df, "id", "w", 20).collect()]
    heavy = sum(1 for i in got if i < 50)
    assert heavy >= 18  # weighted, not uniform


def test_weighted_sample_n_drops_nonpositive_weights(spark):
    from lindel_spark.sampling import weighted_sample_n
    df = spark.createDataFrame(
        [(1, 0.0), (2, -1.0), (3, 5.0)], ["id", "w"])
    got = [r["id"] for r in weighted_sample_n(df, "id", "w", 3).collect()]
    assert got == [3]


def test_negative_sample_properties(spark):
    from lindel_spark.sampling import negative_sample
    inter = spark.createDataFrame(
        [(u, i) for u in range(20) for i in range(u % 5)],
        ["user_id", "item_id"])
    items = spark.createDataFrame(
        [(i,) for i in range(50)], ["item_id"])
    neg = negative_sample(inter, items, k=4).collect()
    by_user = {}
    for r in neg:
        by_user.setdefault(r.user_id, []).append((r.draw_idx, r.item_id))
    pos = {(u, i) for u in range(20) for i in range(u % 5)}
    # users with zero interactions still appear? only users IN
    # interactions are sampled; user 0 and 5,10,15 have 0 items ->
    # not in interactions at all
    assert set(by_user) == {u for u in range(20) if u % 5 != 0}
    for u, rows in by_user.items():
        assert len(rows) == 4                       # k negatives
        assert sorted(r[0] for r in rows) == [0, 1, 2, 3]
        for _, it in rows:
            assert (u, it) not in pos               # never a positive
            assert 0 <= it < 50
        assert len({it for _, it in rows}) == 4     # no dup items
    # content-deterministic: a second run (different partitioning)
    neg2 = negative_sample(inter.repartition(7), items, k=4).collect()
    assert sorted(map(tuple, neg)) == sorted(map(tuple, neg2))
    # different salt -> different draw
    neg3 = negative_sample(inter, items, k=4, salt="x").collect()
    assert sorted(map(tuple, neg)) != sorted(map(tuple, neg3))


def test_negative_sample_empty_catalog_raises(spark):
    import pytest as _p

    from lindel_spark.sampling import negative_sample
    inter = spark.createDataFrame([(1, 1)], ["user_id", "item_id"])
    empty = spark.createDataFrame([], "item_id long")
    with _p.raises(ValueError, match="non-empty"):
        negative_sample(inter, empty, k=2)


def test_mixture_plan_algebra(spark):
    from lindel_spark.sampling import mixture_plan
    df = spark.createDataFrame(
        [("a", 100), ("a", 100), ("b", 300), ("c", 50)],
        "source string, n int")
    got = {r.source: r for r in mixture_plan(
        df, "source", "n", {"a": 3, "b": 1}, budget=400).collect()}
    # shares: a=0.75 -> need 300 > observed 200: keep 1.0, 2 epochs
    assert got["a"].observed_size == 200
    assert got["a"].need_size == 300.0
    assert got["a"].keep_fraction == 1.0
    assert got["a"].epochs == 2
    assert got["a"].deficit_size == 100.0
    # b: need 100 < observed 300 -> downsample to 1/3, 1 epoch
    assert got["b"].keep_fraction == round(100 / 300, 9)
    assert got["b"].epochs == 1 and got["b"].deficit_size == 0.0
    # c absent from targets: weight 0, visibly dropped
    assert got["c"].keep_fraction == 0.0 and got["c"].epochs == 0


def test_mixture_plan_rejects_zero_weights(spark):
    import pytest as _pt
    from lindel_spark.sampling import mixture_plan
    df = spark.createDataFrame([("a", 1)], "source string, n int")
    with _pt.raises(ValueError, match="sum > 0"):
        mixture_plan(df, "source", "n", {}, budget=10)


def test_cluster_split_never_straddles_and_singletons_pass(spark):
    from lindel_spark.sampling import cluster_split

    docs = spark.createDataFrame([(i, f"doc {i}") for i in range(40)],
                                 "doc_id long, text string")
    # clusters: {0..9}->0, {10,11}->10; 12..39 absent (singletons)
    cl = spark.createDataFrame(
        [(i, 0) for i in range(10)] + [(10, 10), (11, 10)],
        "doc_id long, cluster long")
    out = cluster_split(docs, cl, "doc_id", weights=(0.5, 0.5),
                        names=("train", "test")).collect()
    by_id = {r.doc_id: r.split for r in out}
    assert len(by_id) == 40
    assert len({by_id[i] for i in range(10)}) == 1  # family together
    assert len({by_id[10], by_id[11]}) == 1
    # splits stable under repartition + both sides populated
    out2 = {r.doc_id: r.split
            for r in cluster_split(docs.repartition(7), cl, "doc_id",
                                   weights=(0.5, 0.5),
                                   names=("train", "test")).collect()}
    assert by_id == out2
    assert set(by_id.values()) == {"train", "test"}


def test_cluster_split_salt_re_splits(spark):
    from lindel_spark.sampling import cluster_split

    docs = spark.createDataFrame([(i, "t") for i in range(100)],
                                 "doc_id long, text string")
    cl = spark.createDataFrame([], "doc_id long, cluster long")
    a = {r.doc_id: r.split
         for r in cluster_split(docs, cl, "doc_id").collect()}
    b = {r.doc_id: r.split
         for r in cluster_split(docs, cl, "doc_id",
                                salt="v2").collect()}
    assert a != b


def test_kfold_partition_of_rows(spark):
    from lindel_spark.sampling import kfold

    df = spark.createDataFrame([(i, i % 97) for i in range(2000)],
                               ["id", "key"])
    out = kfold(df, "key", k=5)
    folds = out.groupBy("fold").count().collect()
    assert sum(r["count"] for r in folds) == 2000
    assert set(r.fold for r in folds) <= {0, 1, 2, 3, 4}
    # balance within hash uniformity on 97 keys
    assert all(r["count"] > 100 for r in folds)


def test_kfold_key_cohesion_and_stability(spark):
    from lindel_spark.sampling import kfold

    df = spark.createDataFrame([(i, i % 50) for i in range(1000)],
                               ["id", "key"])
    out = kfold(df, "key", k=4)
    per_key = out.groupBy("key").agg(
        F.countDistinct("fold").alias("nf")).collect()
    assert all(r.nf == 1 for r in per_key)  # no key straddles folds
    a = {(r.id, r.fold) for r in out.collect()}
    b = {(r.id, r.fold)
         for r in kfold(df.repartition(7), "key", k=4).collect()}
    assert a == b


def test_kfold_salt_and_validation(spark):
    from lindel_spark.sampling import kfold

    df = spark.createDataFrame([(i,) for i in range(500)], ["key"])
    a = {r.key: r.fold for r in kfold(df, "key", k=5).collect()}
    b = {r.key: r.fold
         for r in kfold(df, "key", k=5, salt="x").collect()}
    assert any(a[k] != b[k] for k in a)  # salt re-folds
    import pytest as _p
    with _p.raises(ValueError):
        kfold(df, "key", k=1)


def test_temporal_split_exact_counts_and_order(spark):
    from lindel_spark.sampling import temporal_split

    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    rows = [(i, base + dt.timedelta(minutes=i)) for i in range(100)]
    df = spark.createDataFrame(rows, ["id", "ts"])
    out = temporal_split(df, "ts", "id", test_fraction=0.2,
                         embargo_rows=10)
    got = {r.id: r.split for r in out.collect()}
    assert sum(1 for v in got.values() if v == "test") == 20
    assert sum(1 for v in got.values() if v == "embargo") == 10
    # every train row is strictly older than every embargo row,
    # which is strictly older than every test row
    assert max(i for i, v in got.items() if v == "train") \
        < min(i for i, v in got.items() if v == "embargo") \
        <= max(i for i, v in got.items() if v == "embargo") \
        < min(i for i, v in got.items() if v == "test")


def test_temporal_split_tie_determinism(spark):
    from lindel_spark.sampling import temporal_split

    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    # all rows share one timestamp: the tiebreak decides, stably
    df = spark.createDataFrame([(i, t0) for i in range(50)],
                               ["id", "ts"])
    a = {r.id: r.split
         for r in temporal_split(df, "ts", "id", 0.2, 5).collect()}
    b = {r.id: r.split
         for r in temporal_split(df.repartition(7), "ts", "id",
                                 0.2, 5).collect()}
    assert a == b
    assert sum(1 for v in a.values() if v == "test") == 10


def test_temporal_split_validation(spark):
    from lindel_spark.sampling import temporal_split

    df = spark.createDataFrame([(1, 1)], ["id", "ts"])
    import pytest as _p
    with _p.raises(ValueError):
        temporal_split(df, "ts", "id", 0.0)
    with _p.raises(ValueError):
        temporal_split(df, "ts", "id", 0.5, embargo_rows=-1)


def test_kfold_null_key_raises(spark):
    """round-12 advice: concat_ws skips NULLs, so NULL keys would all
    silently hash into the md5(salt) fold while a SQL replay yields
    NULL — kfold now raises in-plan instead."""
    import pytest
    from lindel_spark.sampling import kfold

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c")], "id long, key string")
    with pytest.raises(Exception, match="NULL in key column"):
        kfold(df, "key", k=3).collect()
    # NULL-free frames are unaffected
    ok = kfold(df.filter("key is not null"), "key", k=3).collect()
    assert len(ok) == 2 and all(0 <= r.fold < 3 for r in ok)


def test_importance_weights_favor_target_like_docs(spark):
    """DSIR contract: documents that share the target slice's
    vocabulary outscore documents that don't; the weight is a pure
    function of content (repartition-stable); hand-replay on a tiny
    corpus matches exactly."""
    import math
    from collections import Counter
    from lindel_spark.sampling import importance_weights

    target = spark.createDataFrame(
        [(100 + i, "spark shuffle join window agg") for i in range(5)],
        "doc_id long, text string")
    raw = spark.createDataFrame(
        [(0, "spark shuffle join window"),
         (1, "cat dog bird fish"),
         (2, "spark join cat dog")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in
           importance_weights(target, raw, n_buckets=64).collect()}
    assert got[0].logweight > got[2].logweight > got[1].logweight
    # bigrams counted: "spark shuffle join window" -> 4 unigrams + 3
    # bigrams
    assert got[0].n_feats == 7

    # exact hand replay (python md5, same bucket rule)
    import hashlib

    def bucket(f, B=64):
        return int(hashlib.md5(("|" + f).encode()).hexdigest()[:15],
                   16) % B

    def feats(text):
        t = [x for x in text.split(" ") if x]
        return t + [a + " " + b for a, b in zip(t, t[1:])]

    tc = Counter(bucket(f) for _ in range(5)
                 for f in feats("spark shuffle join window agg"))
    rc = Counter(bucket(f) for d in
                 ["spark shuffle join window", "cat dog bird fish",
                  "spark join cat dog"] for f in feats(d))
    tt, tr = sum(tc.values()), sum(rc.values())
    for doc_id, text in [(0, "spark shuffle join window"),
                         (1, "cat dog bird fish")]:
        fs = feats(text)
        lw = sum(math.log(tc.get(bucket(f), 0) + 1.0)
                 - math.log(rc.get(bucket(f), 0) + 1.0) for f in fs) \
            - len(fs) * (math.log(tt + 64.0) - math.log(tr + 64.0))
        assert abs(got[doc_id].logweight - lw) < 1e-9, (doc_id, lw)

    again = {r.doc_id: r.logweight for r in importance_weights(
        target.repartition(5), raw.repartition(3),
        n_buckets=64).collect()}
    assert all(abs(again[d] - got[d].logweight) < 1e-12 for d in again)
    import pytest
    with pytest.raises(ValueError, match="n_buckets"):
        importance_weights(target, raw, n_buckets=1)
