"""PageRank semantics on small hand-checkable graphs."""

import pytest
from pyspark.sql import functions as F

from lindel_spark.graph import pagerank


def test_pagerank_uniform_on_symmetric_cycle(spark):
    # a -> b -> c -> a: perfect symmetry, ranks stay 1/3
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string")
    out = {r.node: r.rank for r in pagerank(edges, iterations=8).collect()}
    for v in out.values():
        assert abs(v - 1 / 3) < 1e-12
    assert abs(sum(out.values()) - 1.0) < 1e-9


def test_pagerank_sink_attracts_mass_and_total_is_one(spark):
    # a -> c, b -> c; c dangling: its mass redistributes uniformly
    edges = spark.createDataFrame(
        [("a", "c"), ("b", "c")], "src string, dst string")
    out = {r.node: r.rank for r in pagerank(edges, iterations=20).collect()}
    assert abs(sum(out.values()) - 1.0) < 1e-9
    assert out["c"] > out["a"] and out["c"] > out["b"]
    assert abs(out["a"] - out["b"]) < 1e-12  # symmetric sources


def test_pagerank_weights_shift_rank(spark):
    # a sends 9x more weight to b than to c
    edges = spark.createDataFrame(
        [("a", "b", 9.0), ("a", "c", 1.0), ("b", "a", 1.0),
         ("c", "a", 1.0)],
        "src string, dst string, w double")
    out = {r.node: r.rank for r in
           pagerank(edges, iterations=20, weight="w").collect()}
    assert out["b"] > out["c"]
    assert abs(sum(out.values()) - 1.0) < 1e-9


def test_pagerank_matches_reference_power_iteration(spark):
    """Exact replay of the same fixed-iteration scheme in NumPy."""
    import numpy as np

    E = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)]
    edges = spark.createDataFrame(
        [(str(s), str(t)) for s, t in E], "src string, dst string")
    n, d, iters = 4, 0.85, 6
    r = np.full(n, 1 / n)
    out_deg = {0: 2, 1: 1, 2: 1, 3: 1}
    for _ in range(iters):
        nxt = np.full(n, (1 - d) / n)
        dangling = sum(r[i] for i in range(n) if i not in out_deg)
        for s, t in E:
            nxt[t] += d * r[s] / out_deg[s]
        nxt += d * dangling / n
        r = nxt
    got = {int(row.node): row.rank for row in
           pagerank(edges, iterations=iters).collect()}
    for i in range(n):
        assert abs(got[i] - r[i]) < 1e-12, (i, got[i], r[i])


def test_pagerank_validates_iterations(spark):
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="iterations"):
        pagerank(edges, iterations=0)


def test_connected_components_two_islands_and_isolate(spark):
    from lindel_spark.graph import connected_components
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "src long, dst long")
    nodes = spark.createDataFrame([(1,), (2,), (3,), (10,), (11,),
                                   (99,)], "node long")
    out = {r.node: r.component for r in connected_components(
        edges, nodes=nodes).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_connected_components_chain_diameter(spark):
    # a long path graph stresses multi-round propagation
    from lindel_spark.graph import connected_components
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "src long, dst long")
    out = {r.node: r.component for r in
           connected_components(edges).collect()}
    assert set(out.values()) == {0} and len(out) == 13
