"""One-pass profiling: null handling and approx mode."""

from pyspark.sql import functions as F

from lindel_spark.profile import profile_table


def test_profile_nulls_and_types(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, None, None), (2, "b", None)],
        "k long, s string, z string")
    p = {r.column: r for r in profile_table(df).collect()}
    assert p["k"].n_rows == 3 and p["k"].n_nulls == 0
    assert p["k"].n_distinct == 2
    assert p["s"].n_nulls == 1 and p["s"].min_str == "a"
    assert p["z"].n_nulls == 3 and p["z"].min_str is None
    assert p["z"].n_distinct == 0


def test_profile_approx_mode(spark):
    df = spark.range(1000).select(F.col("id").alias("k"))
    p = profile_table(df, approx=True).collect()[0]
    assert abs(p.n_distinct - 1000) / 1000 < 0.1
