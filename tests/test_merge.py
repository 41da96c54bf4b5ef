"""MERGE INTO semantics of write.merge_upsert."""

from pyspark.sql import functions as F

from lindel_spark.write import merge_upsert


def test_merge_upsert_update_insert_delete(spark):
    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["k", "s", "v"])
    updates = spark.createDataFrame(
        [(2, "B", 99, False),   # matched -> update
         (4, "d", 40, False),   # not matched -> insert
         (3, "c", 0, True)],    # matched tombstone -> delete
        ["k", "s", "v", "dead"])
    got = {r["k"]: (r["s"], r["v"]) for r in merge_upsert(
        target, updates, "k", delete_col="dead").collect()}
    assert got == {1: ("a", 10), 2: ("B", 99), 4: ("d", 40)}


def test_merge_upsert_without_tombstones(spark):
    target = spark.createDataFrame([(1, 10)], ["k", "v"])
    updates = spark.createDataFrame([(1, 11), (2, 22)], ["k", "v"])
    got = {r["k"]: r["v"]
           for r in merge_upsert(target, updates, "k").collect()}
    assert got == {1: 11, 2: 22}


def test_merge_upsert_composite_key(spark):
    target = spark.createDataFrame(
        [(1, "x", 10), (1, "y", 20)], ["k1", "k2", "v"])
    updates = spark.createDataFrame(
        [(1, "y", 99)], ["k1", "k2", "v"])
    got = {(r["k1"], r["k2"]): r["v"] for r in merge_upsert(
        target, updates, ["k1", "k2"]).collect()}
    assert got == {(1, "x"): 10, (1, "y"): 99}


def test_merge_upsert_null_tombstone_means_keep(spark):
    target = spark.createDataFrame([(1, 10)], ["k", "v"])
    updates = spark.createDataFrame(
        [(1, 11, None)],
        "k long, v long, dead boolean")
    got = {r["k"]: r["v"] for r in merge_upsert(
        target, updates, "k", delete_col="dead").collect()}
    assert got == {1: 11}


def test_snapshot_diff_all_statuses(spark):
    from lindel_spark.write import snapshot_diff
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["k", "s", "v"])
    new = spark.createDataFrame(
        [(1, "a", 10),    # unchanged
         (2, "B", 20),    # changed
         (4, "d", 40)],   # added; 3 removed
        ["k", "s", "v"])
    got = {r["k"]: r["status"]
           for r in snapshot_diff(old, new, "k").collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_snapshot_diff_null_safe_compare(spark):
    from lindel_spark.write import snapshot_diff
    old = spark.createDataFrame([(1, None), (2, None)], "k long, v string")
    new = spark.createDataFrame([(1, None), (2, "x")], "k long, v string")
    got = {r["k"]: r["status"]
           for r in snapshot_diff(old, new, "k").collect()}
    assert got == {1: "unchanged", 2: "changed"}


def test_snapshot_diff_subset_compare_cols(spark):
    from lindel_spark.write import snapshot_diff
    old = spark.createDataFrame([(1, "a", 1)], ["k", "s", "v"])
    new = spark.createDataFrame([(1, "a", 999)], ["k", "s", "v"])
    got = snapshot_diff(old, new, "k", compare_cols=["s"]).collect()
    assert got[0]["status"] == "unchanged"  # v excluded from compare


def test_pseudonymize_stable_and_salted(spark):
    from lindel_spark.text import pseudonymize
    from pyspark.sql import functions as F
    df = spark.createDataFrame([(7,), (7,), (8,)], ["uid"])
    a = df.select(pseudonymize(F.col("uid"), "s1").alias("p")).collect()
    assert a[0]["p"] == a[1]["p"] != a[2]["p"]
    assert len(a[0]["p"]) == 16
    b = df.select(pseudonymize(F.col("uid"), "s2").alias("p")).collect()
    assert a[0]["p"] != b[0]["p"]  # salt changes the mapping
