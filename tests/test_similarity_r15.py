"""Round-15 MMR diversified re-ranking: hand-checkable diversity
behavior, reference-greedy equivalence, determinism."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lindel_spark.similarity import mmr_rerank


def _ref_mmr(ids, rel, vecs, k, lam):
    vecs = [np.asarray(v, float) for v in vecs]
    nrm = [np.sqrt((v * v).sum()) for v in vecs]
    taken, maxsim = set(), {i: -np.inf for i in range(len(ids))}
    out = []
    for t in range(min(k, len(ids))):
        best, bs = None, None
        for i in range(len(ids)):
            if i in taken:
                continue
            s = lam * rel[i] if t == 0 else \
                lam * rel[i] - (1.0 - lam) * maxsim[i]
            if bs is None or s > bs or (s == bs and ids[i] < ids[best]):
                best, bs = i, s
        taken.add(best)
        out.append((ids[best], bs))
        for i in range(len(ids)):
            sim = float(vecs[i] @ vecs[best]) / (nrm[i] * nrm[best])
            maxsim[i] = max(maxsim[i], sim)
    return out


def _pool_df(spark, ids, rel, vecs, qid=1):
    cand = spark.createDataFrame(
        [(qid, i, float(r)) for i, r in zip(ids, rel)],
        "query_id long, neighbor_id long, cos double")
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in zip(ids, vecs)],
        "vec_id long, embedding array<double>")
    return cand, corpus


def test_mmr_prefers_diversity(spark):
    # items 0,1 nearly identical high-rel; item 2 orthogonal lower
    # rel: plain top-2 = {0,1}; MMR(0.5) must pick {0, 2}
    ids = [0, 1, 2]
    rel = [0.95, 0.94, 0.60]
    vecs = [[1.0, 0.0], [0.999, 0.01], [0.0, 1.0]]
    cand, corpus = _pool_df(spark, ids, rel, vecs)
    out = mmr_rerank(cand, corpus, k=2, lam=0.5) \
        .orderBy("rank").collect()
    assert [r.neighbor_id for r in out] == [0, 2]


def test_mmr_lambda_one_is_pure_relevance(spark):
    ids = [5, 6, 7]
    rel = [0.3, 0.9, 0.6]
    vecs = [[1.0, 0.0]] * 3
    cand, corpus = _pool_df(spark, ids, rel, vecs)
    out = mmr_rerank(cand, corpus, k=3, lam=1.0) \
        .orderBy("rank").collect()
    assert [r.neighbor_id for r in out] == [6, 7, 5]


def test_mmr_matches_reference_greedy(spark):
    rng = np.random.RandomState(13)
    ids = list(range(20))
    rel = list(rng.rand(20))
    vecs = [list(rng.randn(8)) for _ in ids]
    want = _ref_mmr(ids, rel, vecs, k=6, lam=0.7)
    cand, corpus = _pool_df(spark, ids, rel, vecs)
    out = mmr_rerank(cand, corpus, k=6, lam=0.7) \
        .orderBy("rank").collect()
    assert [(r.neighbor_id, pytest.approx(r.mmr, abs=1e-12))
            == (w[0], w[1]) or True for r, w in zip(out, want)]
    assert [r.neighbor_id for r in out] == [w[0] for w in want]
    for r, w in zip(out, want):
        assert r.mmr == pytest.approx(w[1], abs=1e-12)


def test_mmr_small_pool_and_ties(spark):
    # pool smaller than k; exact tie on score -> smallest id first
    ids = [3, 9]
    rel = [0.5, 0.5]
    vecs = [[1.0, 0.0], [0.0, 1.0]]
    cand, corpus = _pool_df(spark, ids, rel, vecs)
    out = mmr_rerank(cand, corpus, k=10, lam=1.0) \
        .orderBy("rank").collect()
    assert [r.neighbor_id for r in out] == [3, 9]
    assert len(out) == 2


def test_mmr_multi_query_and_repartition(spark):
    rng = np.random.RandomState(1)
    rows, vrows = [], []
    for q in range(5):
        for i in range(10):
            rows.append((q, q * 100 + i, float(rng.rand())))
    for nid in {r[1] for r in rows}:
        vrows.append((nid, [float(x) for x in rng.randn(4)]))
    cand = spark.createDataFrame(
        rows, "query_id long, neighbor_id long, cos double")
    corpus = spark.createDataFrame(
        vrows, "vec_id long, embedding array<double>")
    a = sorted((r.query_id, r.rank, r.neighbor_id) for r in
               mmr_rerank(cand, corpus, k=4).collect())
    b = sorted((r.query_id, r.rank, r.neighbor_id) for r in
               mmr_rerank(cand.repartition(7),
                          corpus.repartition(5), k=4).collect())
    assert a == b
    assert len({q for q, _, _ in a}) == 5


def test_mmr_validates(spark):
    cand, corpus = _pool_df(spark, [0], [1.0], [[1.0]])
    with pytest.raises(ValueError):
        mmr_rerank(cand, corpus, k=0)
    with pytest.raises(ValueError):
        mmr_rerank(cand, corpus, lam=1.5)


def test_mmr_zero_norm_vector_never_poisons(spark):
    # an all-zero candidate must not NaN-poison the greedy: sims to
    # it are 0 by convention, so it ranks purely on relevance
    ids = [0, 1, 2]
    rel = [0.9, 0.8, 0.1]
    vecs = [[1.0, 0.0], [0.0, 1.0], [0.0, 0.0]]
    cand, corpus = _pool_df(spark, ids, rel, vecs)
    out = mmr_rerank(cand, corpus, k=3, lam=0.5) \
        .orderBy("rank").collect()
    assert [r.neighbor_id for r in out] == [0, 1, 2]
    assert all(r.mmr == r.mmr for r in out)  # no NaN
