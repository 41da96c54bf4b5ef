"""Native-Column Hilbert path: bit-exact vs the Arrow-UDF kernel.

The native path (functions.py hilbert_encode_native/_decode_native) is
an unrolled per-bit Project chain of Skilling's transform
(curve.py:168-237).  These tests pin it to the independently-tested
Arrow-UDF path over random inputs at every supported (elem, arity),
verify the decode inverse, and assert the plan stays JVM-only (no
Python eval nodes).  Comparisons collect both sides rather than
filtering a != b above the chain — a predicate referencing the chain's
output triggers the exponential pushdown substitution documented on
hilbert_encode_native.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

import lindel_spark.functions as LF

_SPARK_TYPE = {"int8": "tinyint", "int16": "smallint",
               "int32": "int", "int64": "bigint"}

CASES = [
    ("int32", 2),
    ("int16", 2),
    ("int16", 4),
    ("int8", 2),
    ("int8", 8),
    ("int32", 1),
]


def _random_frame(spark, elem, n, rows=512, seed=11):
    bits = int(elem[3:])
    rng = np.random.RandomState(seed + bits + n)
    lo, hi = -(1 << (bits - 1)), 1 << (bits - 1)
    data = rng.randint(lo, hi, size=(rows, n))
    cols = [f"c{i}" for i in range(n)]
    df = spark.createDataFrame(
        [tuple(int(v) for v in r) for r in data.tolist()], cols)
    st = _SPARK_TYPE[elem]
    return df.select(*[F.col(c).cast(st).alias(c) for c in cols]), cols


@pytest.mark.parametrize("elem,n", CASES)
def test_native_encode_matches_udf(spark, elem, n):
    df, cols = _random_frame(spark, elem, n)
    nat = LF.hilbert_encode_native(df, cols, elem, out_col="h_nat")
    both = nat.withColumn(
        "h_udf", LF.hilbert_encode([F.col(c) for c in cols], elem))
    rows = both.select("h_nat", "h_udf").collect()
    assert rows, "empty comparison frame"
    for r in rows:
        assert r.h_nat == r.h_udf, (elem, n, r)


@pytest.mark.parametrize("elem,n", CASES)
def test_native_decode_round_trips(spark, elem, n):
    df, cols = _random_frame(spark, elem, n)
    nat = LF.hilbert_encode_native(df, cols, elem, out_col="h")
    dec = LF.hilbert_decode_native(nat, "h", n, elem, out_col="axes")
    rows = dec.select(*cols, "axes").collect()
    assert rows
    for r in rows:
        got = list(r.axes)
        want = [int(r[c]) for c in cols]
        assert got == want, (elem, n, r)


def test_native_decode_unsigned(spark):
    df, cols = _random_frame(spark, "int16", 2)
    nat = LF.hilbert_encode_native(df, cols, "int16", out_col="h")
    dec = LF.hilbert_decode_native(
        nat, "h", 2, "int16", signed=False, out_col="axes")
    for r in dec.select(*cols, "axes").collect():
        want = [int(r[c]) & 0xFFFF for c in cols]
        assert list(r.axes) == want


def test_native_plan_has_no_python_eval(spark):
    df, cols = _random_frame(spark, "int32", 2, rows=16)
    nat = LF.hilbert_encode_native(df, cols, "int32", out_col="h")
    plan = nat._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan


def test_native_rejects_floats_and_wide(spark):
    df, cols = _random_frame(spark, "int32", 2, rows=4)
    with pytest.raises(ValueError, match="integer-only"):
        LF.hilbert_encode_native(df, cols, "float32")
    with pytest.raises(ValueError, match="64-bit"):
        LF.hilbert_encode_native(df, cols, "int64")
    with pytest.raises(ValueError, match="integer-only"):
        LF.hilbert_decode_native(df, "c0", 2, "float64")
    with pytest.raises(ValueError, match="64-bit"):
        LF.hilbert_decode_native(df, "c0", 4, "int32")


def test_native_keys_equal_udf_keys_for_zorder(spark):
    """The native chain's key set is identical to the UDF zorder key —
    the invariant that would let either implementation back
    zorder_write (the UDF stays the default; BASELINE.md round 7)."""
    df, cols = _random_frame(spark, "int32", 2, rows=256)
    udf_keys = sorted(
        r[0] for r in
        df.select(LF.hilbert_encode(
            [F.col(c) for c in cols], "int32")).collect())
    nat = LF.hilbert_encode_native(df, cols, "int32", out_col="h")
    nat_keys = sorted(r[0] for r in nat.select("h").collect())
    assert nat_keys == udf_keys
