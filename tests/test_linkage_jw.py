"""Jaro–Winkler comparator: bit-parity with DuckDB's built-in,
classic textbook values, NULL semantics, linkage integration."""

import random
import string

import duckdb
import pytest
from pyspark.sql import functions as F

from lindel_spark import linkage as LK
from lindel_spark.linkage import _jaro_winkler_py, jaro_winkler


def test_jw_textbook_values():
    assert _jaro_winkler_py("martha", "marhta") == pytest.approx(
        0.9611111111111111, abs=1e-15)
    assert _jaro_winkler_py("dixon", "dicksonx") == pytest.approx(
        0.8133333333333332, abs=1e-15)
    assert _jaro_winkler_py("dwayne", "duane") == pytest.approx(
        0.8400000000000001, abs=1e-15)
    # boost only above 0.7: crate/trace has jaro 0.7333 but prefix 0
    assert _jaro_winkler_py("crate", "trace") == pytest.approx(
        0.7333333333333334, abs=1e-15)


def test_jw_edge_cases_match_duckdb_convention():
    assert _jaro_winkler_py("", "") == 0.0
    assert _jaro_winkler_py("a", "") == 0.0
    assert _jaro_winkler_py("ab", "ba") == 0.0  # window 0, no matches
    assert _jaro_winkler_py("abc", "abc") == 1.0


def test_jw_fuzz_bit_parity_with_duckdb():
    random.seed(13)
    con = duckdb.connect()
    for _ in range(1500):
        a = "".join(random.choices(string.ascii_lowercase[:6],
                                   k=random.randint(0, 9)))
        b = "".join(random.choices(string.ascii_lowercase[:6],
                                   k=random.randint(0, 9)))
        ref = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
        assert _jaro_winkler_py(a, b) == pytest.approx(ref, abs=1e-12), \
            (a, b)


def test_jw_udf_null_semantics(spark):
    df = spark.createDataFrame(
        [("martha", "marhta"), (None, "x"), ("x", None), (None, None)],
        ["a", "b"])
    got = df.select(jaro_winkler(F.col("a"), F.col("b"))
                    .alias("s")).collect()
    assert got[0].s == pytest.approx(0.9611111111111111, abs=1e-12)
    assert got[1].s is None and got[2].s is None and got[3].s is None


def test_jw_linkage_kind_integration(spark):
    rows = [
        (1, "jon smith", "b"), (2, "john smith", "b"),
        (3, "jon smyth", "b"), (4, "zz totally other", "b"),
    ]
    df = spark.createDataFrame(rows, ["id", "name", "blk"])
    pairs = LK.record_linkage(
        df, "id", block_cols=["blk"],
        fields=[LK.LinkField("name", "jaro_winkler", weight=1.0)],
        threshold=0.9)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got and (1, 3) in got
    assert not any(4 in p for p in got)
