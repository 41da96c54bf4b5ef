"""Round-14 statistics additions: Friedman k-sample paired rank test
(the repeated-measures completion of the wilcoxon/kruskal ladder)."""

import pytest
from pyspark.sql import functions as F

from lindel_spark.profile import friedman_test


def _df(spark, rows):
    return spark.createDataFrame(rows, "b long, t string, v double")


def test_friedman_classic_hand_computed(spark):
    # 4 blocks x 3 treatments, no ties: R = (5, 8, 11) -> q = 4.5
    rows = []
    vals = {1: ("A", 1, "B", 2, "C", 3), 2: ("A", 1, "B", 3, "C", 2),
            3: ("A", 2, "B", 1, "C", 3), 4: ("A", 1, "B", 2, "C", 3)}
    for b, (t1, v1, t2, v2, t3, v3) in vals.items():
        rows += [(b, t1, float(v1)), (b, t2, float(v2)),
                 (b, t3, float(v3))]
    r = friedman_test(_df(spark, rows), "b", "t", "v").collect()[0]
    assert r.n_blocks == 4 and r.k == 3
    assert r.q == pytest.approx(4.5, abs=1e-12)


def test_friedman_midranks_on_ties(spark):
    # hand-computed Conover tie form: q = 3.0
    rows = [(1, "A", 1.0), (1, "B", 1.0), (1, "C", 2.0),
            (2, "A", 1.0), (2, "B", 2.0), (2, "C", 2.0)]
    r = friedman_test(_df(spark, rows), "b", "t", "v").collect()[0]
    assert r.n_blocks == 2 and r.k == 3
    assert r.q == pytest.approx(3.0, abs=1e-12)


def test_friedman_all_tied_returns_null(spark):
    rows = [(b, t, 5.0) for b in (1, 2, 3) for t in ("A", "B", "C")]
    r = friedman_test(_df(spark, rows), "b", "t", "v").collect()[0]
    assert r.q is None


def test_friedman_incomplete_blocks_excluded(spark):
    rows = [(1, "A", 1.0), (1, "B", 2.0), (1, "C", 3.0),
            (2, "A", 3.0), (2, "B", 1.0), (2, "C", 2.0),
            (9, "A", 9.0), (9, "B", 8.0)]  # incomplete: no C
    full = friedman_test(_df(spark, rows), "b", "t", "v").collect()[0]
    wo = friedman_test(_df(spark, rows[:-2]), "b", "t",
                       "v").collect()[0]
    assert full.n_blocks == wo.n_blocks == 2
    assert full.q == pytest.approx(wo.q, abs=0.0)


def test_friedman_duplicate_cell_raises(spark):
    rows = [(1, "A", 1.0), (1, "A", 2.0), (1, "B", 3.0)]
    from py4j.protocol import Py4JJavaError
    with pytest.raises(Exception, match="duplicate"):
        friedman_test(_df(spark, rows), "b", "t", "v").collect()


def test_friedman_nulls_excluded(spark):
    rows = [(1, "A", 1.0), (1, "B", 2.0), (1, "C", 3.0),
            (2, "A", 3.0), (2, "B", 1.0), (2, "C", 2.0),
            (None, "A", 7.0), (3, None, 7.0), (3, "A", None)]
    r = friedman_test(_df(spark, rows), "b", "t", "v").collect()[0]
    assert r.n_blocks == 2 and r.k == 3
