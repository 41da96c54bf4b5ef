"""Safety/width semantics added after round-1 review: required decode
width, out-of-range decode rejection, faithful u128 carriers, native
morton width validation. Reference behaviors these mirror: unsigned
input types make wrong-width decode unrepresentable
(src/lindel_extension.cpp:983-1001)."""

import pytest
from pyspark.sql import functions as F

from lindel_spark import functions as LF
from lindel_spark.types import encode_output_spark_type, resolve_decode


def test_decode_requires_input_width(spark):
    with pytest.raises(ValueError, match="input_width"):
        LF.hilbert_decode(F.lit(22), 2)


def test_decode_rejects_out_of_range(spark):
    df = spark.createDataFrame([(1 << 40,)], "v long")
    bad = df.select(LF.hilbert_decode(F.col("v"), 2, input_width=32))
    with pytest.raises(Exception, match="exceeds u32 range"):
        bad.collect()


def test_decimal_output_rejected_at_128_bits():
    with pytest.raises(ValueError, match="binary"):
        encode_output_spark_type(128, "decimal")


def test_u128_one_part_decode_is_binary():
    plan = resolve_decode(128, 1, False, False)
    from pyspark.sql import types as T
    assert plan.spark_elem == T.BinaryType()


def test_u128_roundtrip_above_decimal_range(spark):
    # double[2] with a negative coordinate bit-casts to a u128 key
    # >= 2^127 > 10^38-1 — the case Decimal(38,0) used to corrupt.
    df = spark.createDataFrame([(-37.8, 0.2)], "x double, y double")
    enc = df.select(
        "x", "y",
        LF.hilbert_encode([F.col("x"), F.col("y")], "float64").alias("h"),
    )
    r = enc.select(
        "x", "y", "h",
        LF.hilbert_decode(F.col("h"), 1, input_width=128).alias("u"),
        LF.hilbert_decode(
            F.col("h"), 2, want_float=True, input_width=128
        ).alias("d"),
    ).collect()[0]
    key_int = int.from_bytes(r.h, "big")
    assert key_int > 10**38
    assert int.from_bytes(r.u[0], "big") == key_int
    assert list(r.d) == [r.x, r.y]


def test_native_morton_decode_width_validated():
    with pytest.raises(ValueError, match="64-bit"):
        LF.morton_decode_native(F.lit(0), 2, "int64")


def test_float_array_null_element_raises(spark):
    LF.register(spark, elems=("float64",))
    df = spark.createDataFrame([([1.0, None],)], "arr array<double>")
    df.createOrReplaceTempView("t_fnull")
    with pytest.raises(Exception, match="NULL"):
        spark.sql(
            "SELECT hilbert_encode_float64_2(arr) FROM t_fnull"
        ).collect()
