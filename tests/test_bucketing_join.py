"""Bucketed tables co-locate joins: same values, no Exchange."""

import tempfile

import pytest
from pyspark.sql import functions as F

from lindel_spark.write import bucketed_write


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    base = tempfile.mkdtemp(prefix="bucketed_")
    bucketed_write(orders, "t_orders_b", "o_custkey", 8,
                   sort_cols="o_custkey", path=f"{base}/orders")
    bucketed_write(cust, "t_cust_b", "c_custkey", 8,
                   sort_cols="c_custkey", path=f"{base}/cust")
    yield spark.table("t_orders_b"), spark.table("t_cust_b")
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_cust_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    ob, cb = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ob.join(cb, ob.o_custkey == cb.c_custkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan, plan


def test_bucketed_join_values_match_plain_join(spark, sf_dir,
                                               bucketed_tables):
    ob, cb = bucketed_tables
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")

    def agg(o, c, ok, ck):
        return (o.join(c, o[ok] == c[ck])
                .groupBy("c_mktsegment")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum("o_totalprice").cast("decimal(38,2)")
                     .alias("total"))
                .orderBy("c_mktsegment"))

    got = agg(ob, cb, "o_custkey", "c_custkey").collect()
    want = agg(orders, cust, "o_custkey", "c_custkey").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_bucketed_aggregation_reuses_bucketing(spark, bucketed_tables):
    ob, _ = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (ob.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
                ._jdf.queryExecution().executedPlan().toString())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert "Exchange" not in plan, plan
