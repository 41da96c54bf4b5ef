"""Schema-disciplined source readers: fidelity + loud failures."""

import os

import pytest
from pyspark.sql import functions as F

from lindel_spark import sources as SRC


def test_csv_roundtrip_exact(spark, tmp_path):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    p = str(tmp_path / "csv")
    SRC.write_csv(li, p)
    back = SRC.read_csv(spark, p, li.schema)
    assert back.schema == li.schema
    a = li.agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))).collect()[0][0]
    b = back.agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))).collect()[0][0]
    assert a == b and back.count() == li.count()


def test_jsonl_roundtrip_exact(spark, tmp_path):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    p = str(tmp_path / "jsonl")
    SRC.write_jsonl(li, p)
    back = SRC.read_jsonl(spark, p, li.schema)
    assert back.count() == li.count()


def test_csv_failfast_raises_on_corrupt(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "part.csv").write_text("a,b\n1,2\nnot_an_int,3\n")
    df = SRC.read_csv(spark, str(p), "a int, b int")
    with pytest.raises(Exception, match="Malformed|FAILFAST|BadRecord"):
        df.collect()
