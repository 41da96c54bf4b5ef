"""Round-12: grid DBSCAN, rank-biased overlap, positional phrase
search — textbook fixtures and determinism pins."""

import pytest

from lindel_spark.clustering import dbscan_2d
from lindel_spark.retrieval import phrase_search, rank_biased_overlap


# -------------------------------------------------------------- dbscan

def _pts(spark, pts):
    return spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        ["id", "x", "y"])


def test_dbscan_two_blobs_and_noise(spark):
    blob_a = [(0, 0), (0.5, 0), (0, 0.5), (0.5, 0.5)]
    blob_b = [(10, 10), (10.5, 10), (10, 10.5), (10.5, 10.5)]
    lone = [(50, 50)]
    out = {r.id: r for r in dbscan_2d(
        _pts(spark, blob_a + blob_b + lone), "id", "x", "y",
        eps=1.0, min_pts=3).collect()}
    assert all(out[i].role == "core" for i in range(8))
    assert out[8].role == "noise" and out[8].cluster is None
    ca = {out[i].cluster for i in range(4)}
    cb = {out[i].cluster for i in range(4, 8)}
    assert len(ca) == 1 and len(cb) == 1 and ca != cb
    assert ca == {0} and cb == {4}  # min-id cluster labels


def test_dbscan_border_gets_smallest_cluster(spark):
    # two vertical 4-blobs; the midpoint reaches exactly ONE point of
    # each (the rest are > eps away), so it has 2 neighbors + itself
    # = 3 < min_pts=4 -> border, touching cores of BOTH clusters
    a = [(0, 0), (0, 0.1), (0, 0.2), (0, 0.3)]      # cluster 0
    b = [(2, 0), (2, 0.1), (2, 0.2), (2, 0.3)]      # cluster 4
    border = [(1.0, 0)]                              # dist 1.0 to both
    out = {r.id: r for r in dbscan_2d(
        _pts(spark, a + b + border), "id", "x", "y",
        eps=1.0, min_pts=4).collect()}
    assert all(out[i].role == "core" for i in range(8))
    assert out[8].role == "border"
    assert out[8].cluster == 0  # smallest cluster id wins


def test_dbscan_chain_single_cluster(spark):
    chain = [(i * 0.9, 0) for i in range(10)]
    out = dbscan_2d(_pts(spark, chain), "id", "x", "y",
                    eps=1.0, min_pts=2).collect()
    assert {r.cluster for r in out} == {0}
    assert all(r.role == "core" for r in out)


def test_dbscan_guards(spark):
    df = _pts(spark, [(0, 0)])
    with pytest.raises(ValueError):
        dbscan_2d(df, "id", "x", "y", eps=0.0, min_pts=2)
    with pytest.raises(ValueError):
        dbscan_2d(df, "id", "x", "y", eps=1.0, min_pts=0)


# ----------------------------------------------------------------- rbo

def _rank(spark, items):
    return spark.createDataFrame(
        [(it, i + 1) for i, it in enumerate(items)], ["item", "rank"])


def test_rbo_identical_rankings(spark):
    a = _rank(spark, ["a", "b", "c", "d"])
    r = rank_biased_overlap(a, a, p=0.9, depth=4).collect()[0]
    # overlap_at(d) = d: rbo = (1-p) sum p^(d-1) = 1 - p^D
    assert r.rbo == pytest.approx(1 - 0.9 ** 4)
    assert r.overlap_at_depth == 4


def test_rbo_disjoint_rankings_zero(spark):
    a = _rank(spark, ["a", "b"])
    b = _rank(spark, ["x", "y"])
    r = rank_biased_overlap(a, b, p=0.9, depth=2).collect()[0]
    assert r.rbo == pytest.approx(0.0)
    assert r.overlap_at_depth == 0


def test_rbo_hand_example(spark):
    a = _rank(spark, ["a", "b", "c"])
    b = _rank(spark, ["b", "a", "d"])
    p, D = 0.8, 3
    # a: max(1,2)=2; b: max(2,1)=2; c,d unmatched
    # overlap_at(1)=0, (2)=2, (3)=2
    exp = (1 - p) * (p ** 0 / 1 * 0 + p ** 1 / 2 * 2 + p ** 2 / 3 * 2)
    r = rank_biased_overlap(a, b, p=p, depth=D).collect()[0]
    assert r.rbo == pytest.approx(exp, rel=1e-12)


def test_rbo_guards(spark):
    a = _rank(spark, ["a"])
    with pytest.raises(ValueError):
        rank_biased_overlap(a, a, p=1.0)
    with pytest.raises(ValueError):
        rank_biased_overlap(a, a, depth=0)


# -------------------------------------------------------------- phrase

def test_phrase_search_contiguous_only(spark):
    docs = spark.createDataFrame(
        [(1, "new york city"), (2, "york new haven"),
         (3, "the new york and new york again")],
        ["doc_id", "text"])
    out = {r.doc_id: r.n_matches for r in
           phrase_search(docs, "new york").collect()}
    assert out == {1: 1, 3: 2}  # doc 2 has both words, wrong order


def test_phrase_search_repeated_word_phrase(spark):
    docs = spark.createDataFrame(
        [(1, "buffalo buffalo buffalo"), (2, "buffalo bill")],
        ["doc_id", "text"])
    out = {r.doc_id: r.n_matches for r in
           phrase_search(docs, "buffalo buffalo").collect()}
    assert out == {1: 2}  # positions (0,1) and (1,2)


def test_phrase_search_single_token(spark):
    docs = spark.createDataFrame([(1, "alpha beta alpha")],
                                 ["doc_id", "text"])
    out = phrase_search(docs, "alpha").collect()
    assert out[0].n_matches == 2
    with pytest.raises(ValueError):
        phrase_search(docs, "   ")
