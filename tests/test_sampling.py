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
