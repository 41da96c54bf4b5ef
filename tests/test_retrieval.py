"""Value-level tests for lexical retrieval (BM25) and corpus-LM
scoring against independent NumPy re-implementations."""

import math

import pytest
from pyspark.sql import functions as F

from lindel_spark import retrieval as LR

CORPUS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "cats and dogs and cats"),
    (3, "a completely different sentence entirely"),
    (4, "the cat and the dog"),
]


def _py_bm25(corpus, queries, k1=1.2, b=0.75):
    """Independent reference BM25 (Lucene idf), dict-based."""
    docs = {i: t.split() for i, t in corpus}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    dfs = {}
    for toks in docs.values():
        for term in set(toks):
            dfs[term] = dfs.get(term, 0) + 1
    out = {}
    for qid, q in queries:
        scores = {}
        for term in sorted(set(q.split())):
            if term not in dfs:
                continue
            idf = math.log(1.0 + (n - dfs[term] + 0.5) / (dfs[term] + 0.5))
            for did, toks in docs.items():
                tf = toks.count(term)
                if tf == 0:
                    continue
                dl = len(toks)
                s = idf * (tf * (k1 + 1.0)) / (
                    tf + k1 * ((1.0 - b) + b * dl / avgdl))
                scores[did] = scores.get(did, 0.0) + s
        out[qid] = sorted(scores.items(),
                          key=lambda kv: (-kv[1], kv[0]))
    return out


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


def test_bm25_matches_reference_impl(spark, corpus_df):
    queries = [(100, "the cat"), (101, "dogs and cats")]
    qdf = spark.createDataFrame(queries, ["query_id", "query"])
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score"])
        for r in LR.bm25_topk(corpus_df, qdf, k=3).collect()
    }
    want = _py_bm25(CORPUS, queries)
    for qid, ranked in want.items():
        for rank, (did, score) in enumerate(ranked[:3], start=1):
            gdid, gscore = got[(qid, rank)]
            assert gdid == did, (qid, rank)
            assert gscore == pytest.approx(score, rel=1e-12)


def test_bm25_unmatched_query_returns_nothing(spark, corpus_df):
    qdf = spark.createDataFrame(
        [(7, "zzz qqq")], ["query_id", "query"])
    assert LR.bm25_topk(corpus_df, qdf, k=3).count() == 0


def test_bm25_tie_breaks_on_doc_id(spark):
    # identical docs -> identical scores -> rank order = doc_id order
    df = spark.createDataFrame(
        [(3, "x y"), (1, "x y"), (2, "x y")], ["doc_id", "text"])
    qdf = spark.createDataFrame([(0, "x")], ["query_id", "query"])
    rows = LR.bm25_topk(df, qdf, k=3).orderBy("rank").collect()
    assert [r["doc_id"] for r in rows] == [1, 2, 3]


def test_bm25_broadcasts_query_side(spark, corpus_df):
    qdf = spark.createDataFrame([(0, "cat")], ["query_id", "query"])
    plan = LR.bm25_topk(corpus_df, qdf, k=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_unigram_logprob_matches_reference_impl(spark, corpus_df):
    rows = {r["doc_id"]: r for r in LR.unigram_logprob(corpus_df).collect()}
    toks = {i: t.split() for i, t in CORPUS}
    counts: dict[str, int] = {}
    for t in toks.values():
        for w in t:
            counts[w] = counts.get(w, 0) + 1
    total = sum(counts.values())
    for did, t in toks.items():
        want = sum(math.log(counts[w] / total) for w in t) / len(t)
        assert rows[did]["n_tokens"] == len(t)
        assert rows[did]["avg_logprob"] == pytest.approx(want, rel=1e-12)


def test_doc_term_stats_long_format(spark, corpus_df):
    rows = LR.doc_term_stats(corpus_df).filter(F.col("doc_id") == 0).collect()
    got = {r["term"]: (r["tf"], r["dl"]) for r in rows}
    assert got == {"the": (2, 6), "cat": (1, 6), "sat": (1, 6),
                   "on": (1, 6), "mat": (1, 6)}


def test_bigram_logprob_values(spark):
    df = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b"), (2, "x")], ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in LR.bigram_logprob(df).collect()}
    # bigrams: doc0 -> (a,b),(b,a),(a,b); doc1 -> (a,b). counts:
    # (a,b)=3, (b,a)=1; prefixes: a=3, b=1.
    # doc0: [ln(3/3), ln(1/1), ln(3/3)] avg = 0; doc1: ln(3/3) = 0
    assert 2 not in rows  # single-token doc drops out
    assert rows[0]["n_bigrams"] == 3 and rows[0]["avg_logprob"] == 0.0
    assert rows[1]["n_bigrams"] == 1 and rows[1]["avg_logprob"] == 0.0


def test_bigram_logprob_discriminates(spark):
    df = spark.createDataFrame(
        [(0, "p q p q p q"), (1, "p p q q p q")], ["doc_id", "text"])
    rows = {r["doc_id"]: r["avg_logprob"]
            for r in LR.bigram_logprob(df).collect()}
    # doc0 is perfectly alternating (high predictability), doc1 mixes
    # transitions -> strictly lower mean conditional log-prob
    assert rows[0] > rows[1]
    assert rows[1] < 0.0


# ---------------------------------------------------------------------------
# round 11: persisted + incremental retrieval index
# ---------------------------------------------------------------------------

@pytest.fixture()
def docs_real(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def _queries(docs):
    from lindel_spark import text as LT
    toks = LT.tokens(LT.normalize_text(F.col("text")))
    return docs.filter(F.col("doc_id") % 31 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(toks, 1, 5), " ").alias("query"))


def _key(df):
    return sorted((r.query_id, r.rank, r.doc_id, round(r.score, 9))
                  for r in df.collect())


def test_bm25_store_roundtrip_equals_fresh(spark, docs_real, tmp_path):
    """bm25_topk_store over an index built from the whole corpus must
    be VALUE-identical to bm25_topk's fresh computation (shared
    scoring tail)."""
    store = str(tmp_path / "idx")
    LR.bm25_index_init(docs_real, store)
    qd = _queries(docs_real)
    fresh = LR.bm25_topk(docs_real, qd, k=5, rank_round=4)
    stored = LR.bm25_topk_store(spark, store, qd, k=5, rank_round=4)
    assert _key(stored) == _key(fresh)


def test_bm25_store_append_equals_rebuild(spark, docs_real, tmp_path):
    """Init on 2/3 + incremental append of 1/3 (postings tail +
    algebraic df/len deltas) must serve IDENTICAL results to an index
    rebuilt from scratch on the full corpus — the verdict-4 pin."""
    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    LR.bm25_index_init(docs_real.filter("doc_id % 3 != 0"), inc)
    LR.bm25_index_append(docs_real.filter("doc_id % 3 = 0"), inc)
    LR.bm25_index_init(docs_real, full)
    qd = _queries(docs_real)
    a = _key(LR.bm25_topk_store(spark, inc, qd, k=5, rank_round=4))
    b = _key(LR.bm25_topk_store(spark, full, qd, k=5, rank_round=4))
    assert a == b


def test_bm25_store_maintain_folds_tail(spark, docs_real, tmp_path):
    """Maintain above the tail threshold rewrites v1, drains the
    folded tail files, and serves unchanged results; below threshold
    it is a no-op."""
    from lindel_spark import fs as _fs
    store = str(tmp_path / "m")
    LR.bm25_index_init(docs_real.filter("doc_id % 3 != 0"), store)
    LR.bm25_index_append(docs_real.filter("doc_id % 3 = 0"), store)
    qd = _queries(docs_real)
    before = _key(LR.bm25_topk_store(spark, store, qd, k=5,
                                     rank_round=4))
    noop = LR.bm25_index_maintain(spark, store, tail_ratio=100.0)
    assert noop["rewritten"] is False
    st = LR.bm25_index_maintain(spark, store, tail_ratio=0.01)
    assert st["rewritten"] is True and st["version"] == 1
    assert not _fs.list_files(spark, store + "/postings-tail")
    after = _key(LR.bm25_topk_store(spark, store, qd, k=5,
                                    rank_round=4))
    assert after == before


def test_bm25_store_missing_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="retrieval index"):
        LR.bm25_index_read(spark, str(tmp_path / "nope"))


def test_tfidf_store_equals_fresh(spark, docs_real, tmp_path):
    """tfidf_topk_store over an incrementally-built index must equal
    the fresh tfidf_topk (n_docs_raw preserves the all-rows n_docs
    definition, zero-token docs included)."""
    store = str(tmp_path / "t")
    LR.bm25_index_init(docs_real.filter("doc_id % 3 != 0"), store)
    LR.bm25_index_append(docs_real.filter("doc_id % 3 = 0"), store)
    key = lambda df: sorted(  # noqa: E731
        (r.doc_id, r.rank, r.term, round(r.score, 9))
        for r in df.collect())
    assert key(LR.tfidf_topk_store(spark, store, k=3)) == \
        key(LR.tfidf_topk(docs_real, k=3))


def test_trigram_backoff_all_three_levels_hand_computed(spark):
    import math

    from lindel_spark.retrieval import trigram_backoff_logprob

    model = spark.createDataFrame(
        [(0, "a b c d"), (2, "a b c e")], "doc_id long, text string")
    # model trigrams: (a,b,c)x2, (b,c,d), (b,c,e); bigrams:
    # ab x2, bc x2, cd, ce; unigrams: N=8, V=5 (a,b,c,d,e)
    target = spark.createDataFrame(
        [(1, "a b c"),      # seen trigram: c3=2, p2(a,b)=2 -> 1.0
         (3, "b c d"),      # seen trigram: c3=1, p2(b,c)=2 -> 0.5
         (5, "x c d"),      # unseen tri (x,c,d), bigram (c,d) seen:
                            #   0.4 * c2(c,d)=1 / p1(c)=2 -> 0.2
         (7, "x y z")],     # unseen everything: z unseen unigram ->
                            #   0.16... * (0+1)/(8+5)
        "doc_id long, text string")
    got = {r.doc_id: r for r in
           trigram_backoff_logprob(model, target).collect()}
    assert got[1].n_trigrams == 1
    assert abs(got[1].avg_logscore - math.log(1.0)) < 1e-12
    assert abs(got[3].avg_logscore - math.log(0.5)) < 1e-12
    assert abs(got[5].avg_logscore - math.log(0.4 * 0.5)) < 1e-12
    floor = (0.4 * 0.4) * 1.0 / (8.0 + 5.0)
    assert abs(got[7].avg_logscore - math.log(floor)) < 1e-12
    # seen-unigram backoff floor: 'a' appears twice in the model
    t2 = spark.createDataFrame([(9, "z z a")], "doc_id long, text string")
    g2 = trigram_backoff_logprob(model, t2).collect()[0]
    want = (0.4 * 0.4) * (2.0 + 1.0) / 13.0
    assert abs(g2.avg_logscore - math.log(want)) < 1e-12


def test_trigram_backoff_short_docs_drop(spark):
    from lindel_spark.retrieval import trigram_backoff_logprob

    model = spark.createDataFrame([(0, "a b c d")],
                                  "doc_id long, text string")
    target = spark.createDataFrame([(1, "a b"), (3, "")],
                                   "doc_id long, text string")
    assert trigram_backoff_logprob(model, target).count() == 0


def test_retrieval_metrics_hand_computed_graded(spark):
    import math

    from lindel_spark.retrieval import retrieval_metrics

    # q1: rels a(3), b(1), c(2); results rank1=b, rank2=x, rank3=a
    # q2: rels d(1); results miss entirely
    # q3: rels e(1); no results at all
    results = spark.createDataFrame(
        [(1, "b", 1), (1, "x", 2), (1, "a", 3),
         (2, "y", 1), (2, "z", 2)],
        "query_id long, doc_id string, rank long")
    qrels = spark.createDataFrame(
        [(1, "a", 3), (1, "b", 1), (1, "c", 2), (2, "d", 1),
         (3, "e", 1)],
        "query_id long, doc_id string, rel long")
    got = {r.query_id: r for r in
           retrieval_metrics(results, qrels, k=3,
                             rel_col="rel").collect()}
    lg2 = lambda x: math.log(x) / math.log(2.0)  # noqa: E731
    # q1: hits b@1 (rel1), a@3 (rel3)
    dcg = (2 ** 1 - 1) / lg2(2) + (2 ** 3 - 1) / lg2(4)
    idcg = (2 ** 3 - 1) / lg2(2) + (2 ** 2 - 1) / lg2(3) \
        + (2 ** 1 - 1) / lg2(4)
    assert got[1].n_rel == 3 and got[1].n_hits == 2
    assert abs(got[1].recall_k - 2 / 3) < 1e-12
    assert abs(got[1].mrr_k - 1.0) < 1e-12
    assert abs(got[1].ndcg_k - dcg / idcg) < 1e-12
    for qid in (2, 3):
        g = got[qid]
        assert (g.n_hits, g.recall_k, g.mrr_k, g.ndcg_k) == \
            (0, 0.0, 0.0, 0.0)


def test_retrieval_metrics_k_cut_and_binary_default(spark):
    import pytest

    from lindel_spark.retrieval import retrieval_metrics

    results = spark.createDataFrame(
        [(1, "a", 5)], "query_id long, doc_id string, rank long")
    qrels = spark.createDataFrame(
        [(1, "a")], "query_id long, doc_id string")
    # hit at rank 5 is outside k=3
    g3 = retrieval_metrics(results, qrels, k=3).collect()[0]
    assert g3.n_hits == 0 and g3.ndcg_k == 0.0
    g5 = retrieval_metrics(results, qrels, k=5).collect()[0]
    assert g5.n_hits == 1 and abs(g5.mrr_k - 0.2) < 1e-12
    with pytest.raises(ValueError):
        retrieval_metrics(results, qrels, k=0)
