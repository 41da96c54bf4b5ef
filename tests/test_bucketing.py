"""Bucketed co-located joins: the pre-shuffle storage strategy.

Writing both join sides bucketed on the join key means repeated joins
read co-located buckets and skip the shuffle entirely — the plan shows
no Exchange on either side. At 100 TB this converts every
fact-to-fact join on a stable key from a full-data shuffle into a
local merge per bucket.
"""

import contextlib
import io

from pyspark.sql import functions as F


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_skips_shuffle(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    (li.write.mode("overwrite").bucketBy(8, "l_orderkey")
     .sortBy("l_orderkey").saveAsTable("b_lineitem"))
    (o.write.mode("overwrite").bucketBy(8, "o_orderkey")
     .sortBy("o_orderkey").saveAsTable("b_orders"))
    bl = spark.table("b_lineitem")
    bo = spark.table("b_orders")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bl.join(bo, bl["l_orderkey"] == bo["o_orderkey"]).groupBy(
            "o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
        p = plan_of(j)
        assert "SortMergeJoin" in p
        # bucketed sides feed the join with NO exchange before it
        assert "Exchange hashpartitioning(l_orderkey" not in p
        assert "Exchange hashpartitioning(o_orderkey" not in p
        got = {r.o_orderpriority: r.n for r in j.collect()}
        want = {r.o_orderpriority: r.n for r in
                li.join(o, li["l_orderkey"] == o["o_orderkey"])
                .groupBy("o_orderpriority")
                .agg(F.count(F.lit(1)).alias("n")).collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")
