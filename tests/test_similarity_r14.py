"""Round-14 similarity additions: graph-walk ANN search
(:func:`lindel_spark.similarity.graph_knn_search`) — bounded beam
search over a persisted kNN graph, seeded from the nearest IVF cell.

Constructed-corpus fixtures pin exact recovery (generous beam over an
exact graph == brute force), the hop/beam bounds, determinism across
repartition, self-exclusion, the rank contract, and that the walk
actually ADDS recall over its nprobe=1 seed.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

import lindel_spark.similarity as S


def _corpus(spark, n=120, d=8, seed=3, parts=None):
    rng = np.random.RandomState(seed)
    # two well-separated shells so cells and graph structure are
    # non-trivial but deterministic
    base = rng.randn(n, d).astype(np.float64)
    base[n // 2:] += 4.0
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df.repartition(parts) if parts else df


def _pairs(df):
    return {(r.query_id, r.neighbor_id) for r in
            df.select("query_id", "neighbor_id").collect()}


def test_exact_graph_generous_walk_matches_brute_force(spark):
    corpus = _corpus(spark)
    queries = corpus.filter(F.col("vec_id") % 10 == 0)
    cents = S.train_centroids(corpus, 4)
    g = S.knn_graph(corpus, k=12)
    brute = S.brute_force_knn(corpus, queries, k=5)
    walk = S.graph_knn_search(g, corpus, queries, k=5, hops=3,
                              beam=64, centroids=cents)
    got = _pairs(walk)
    want = _pairs(brute)
    recall = len(got & want) / len(want)
    assert recall == 1.0


def test_walk_beats_its_own_seed(spark):
    corpus = _corpus(spark, n=200)
    queries = corpus.filter(F.col("vec_id") % 20 == 0)
    cents = S.train_centroids(corpus, 8)
    g = S.knn_graph(corpus, k=8)
    want = _pairs(S.brute_force_knn(corpus, queries, k=5))
    seed_only = _pairs(S.knn_join(corpus, queries, k=5,
                                  centroids=cents, nprobe=1))
    walked = _pairs(S.graph_knn_search(g, corpus, queries, k=5,
                                       hops=2, beam=32,
                                       centroids=cents))
    assert len(walked & want) > len(seed_only & want)


def test_rank_contract_and_self_exclusion(spark):
    corpus = _corpus(spark, n=60)
    queries = corpus.filter(F.col("vec_id") < 5)
    cents = S.train_centroids(corpus, 4)
    g = S.knn_graph(corpus, k=8)
    out = S.graph_knn_search(g, corpus, queries, k=4, hops=2,
                             beam=16, centroids=cents).collect()
    by_q = {}
    for r in out:
        assert r.query_id != r.neighbor_id
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        cs = [r.cos for r in rows]
        assert cs == sorted(cs, reverse=True) or all(
            a > b or (a == b) for a, b in zip(cs, cs[1:]))


def test_deterministic_across_repartition(spark):
    a = S.graph_knn_search(
        S.knn_graph(_corpus(spark, parts=3), k=8),
        _corpus(spark, parts=3),
        _corpus(spark, parts=3).filter(F.col("vec_id") % 15 == 0),
        k=5, hops=2, beam=24,
        centroids=S.train_centroids(_corpus(spark), 4))
    b = S.graph_knn_search(
        S.knn_graph(_corpus(spark, parts=7), k=8),
        _corpus(spark, parts=7),
        _corpus(spark, parts=7).filter(F.col("vec_id") % 15 == 0),
        k=5, hops=2, beam=24,
        centroids=S.train_centroids(_corpus(spark), 4))
    ra = {(r.query_id, r.rank): r.neighbor_id for r in a.collect()}
    rb = {(r.query_id, r.rank): r.neighbor_id for r in b.collect()}
    assert ra == rb


def test_validates_bounds(spark):
    corpus = _corpus(spark, n=20)
    g = S.knn_graph(corpus, k=4)
    with pytest.raises(ValueError):
        S.graph_knn_search(g, corpus, corpus, k=0)
    with pytest.raises(ValueError):
        S.graph_knn_search(g, corpus, corpus, hops=0)
    with pytest.raises(ValueError):
        S.graph_knn_search(g, corpus, corpus, beam=0)


# ---- PQ-scored graph walk ------------------------------------------


def test_pq_walk_refined_matches_raw_walk_closely(spark):
    corpus = _corpus(spark, n=150)
    queries = corpus.filter(F.col("vec_id") % 15 == 0)
    cents = S.train_centroids(corpus, 4, spherical=False)
    books = S.train_pq(corpus, m=4, ks=16, centroids=cents)
    codes = S.ivf_pq_encode(corpus, cents, books)
    g = S.knn_graph(corpus, k=12)
    want = _pairs(S.brute_force_knn(corpus, queries, k=5))
    got = _pairs(S.graph_knn_search_pq(
        g, codes, queries, cents, books, k=5, hops=3, beam=48,
        refine_with=corpus, refine=8))
    assert len(got & want) / len(want) >= 0.8


def test_pq_walk_rank_contract_and_validation(spark):
    corpus = _corpus(spark, n=80)
    queries = corpus.filter(F.col("vec_id") < 3)
    cents = S.train_centroids(corpus, 4, spherical=False)
    books = S.train_pq(corpus, m=4, ks=16, centroids=cents)
    codes = S.ivf_pq_encode(corpus, cents, books)
    g = S.knn_graph(corpus, k=8)
    out = S.graph_knn_search_pq(g, codes, queries, cents, books,
                                k=4, hops=2, beam=16).collect()
    by_q = {}
    for r in out:
        assert r.query_id != r.neighbor_id
        by_q.setdefault(r.query_id, []).append(r.rank)
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    with pytest.raises(ValueError):
        S.graph_knn_search_pq(g, codes, queries, cents, books,
                              k=20, beam=10)
