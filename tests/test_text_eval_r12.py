"""Round-12: RAKE keyphrases, sparse TF-IDF cosine pairs, grouped
ROC-AUC — hand replays and scale-knob semantics."""

import math

import numpy as np
import pytest

from lindel_spark.evaluation import roc_auc, roc_auc_by
from lindel_spark.retrieval import tfidf_cosine_pairs
from lindel_spark.text import rake_phrases


# ---------------------------------------------------------------- rake

def test_rake_hand_replay(spark):
    # classic RAKE toy: stopwords split phrases, degree rewards
    # co-occurrence inside longer phrases
    docs = spark.createDataFrame(
        [(1, "deep learning of deep models"),
         (2, "deep learning")],
        ["doc_id", "text"])
    out = {r.phrase: r for r in rake_phrases(
        docs, stopwords=("of",)).collect()}
    # phrases: "deep learning" x2, "deep models" x1
    assert set(out) == {"deep learning", "deep models"}
    # word stats: deep freq3 deg6 ; learning freq2 deg4 ; models f1 d2
    dl = out["deep learning"]
    assert dl.n_occurrences == 2 and dl.n_words == 2
    assert dl.score == pytest.approx(6 / 3 + 4 / 2)
    dm = out["deep models"]
    assert dm.score == pytest.approx(6 / 3 + 2 / 1)


def test_rake_all_stopwords_empty(spark):
    docs = spark.createDataFrame([(1, "the and of")], ["doc_id", "text"])
    assert rake_phrases(
        docs, stopwords=("the", "and", "of")).count() == 0


def test_rake_single_long_phrase(spark):
    docs = spark.createDataFrame([(1, "alpha beta gamma")],
                                 ["doc_id", "text"])
    out = rake_phrases(docs, stopwords=("zzz",)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.phrase == "alpha beta gamma" and r.n_words == 3
    assert r.score == pytest.approx(9.0)  # 3 words x deg3/freq1


# ------------------------------------------------------------ tfidf cos

def test_tfidf_cosine_identical_docs_one(spark):
    docs = spark.createDataFrame(
        [(1, "red fish blue fish"), (2, "red fish blue fish"),
         (3, "totally different words here")],
        ["doc_id", "text"])
    out = {(r.a, r.b): r.cosine for r in
           tfidf_cosine_pairs(docs, threshold=0.99).collect()}
    assert set(out) == {(1, 2)}
    assert out[(1, 2)] == pytest.approx(1.0)


def test_tfidf_cosine_matches_numpy(spark):
    texts = ["a b c d", "a b c e", "x y z w"]
    docs = spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"])
    out = {(r.a, r.b): r.cosine for r in
           tfidf_cosine_pairs(docs, threshold=0.0,
                              round_to=None).collect()}
    vocab = sorted({t for s in texts for t in s.split()})
    N = 3.0
    dfc = {t: sum(t in s.split() for s in texts) for t in vocab}
    mats = []
    for s in texts:
        v = np.array([s.split().count(t) * math.log(N / dfc[t])
                      for t in vocab])
        mats.append(v)
    for (a, b), got in out.items():
        va, vb = mats[a], mats[b]
        exp = va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
        assert got == pytest.approx(exp, rel=1e-12)
    assert (0, 1) in out and (0, 2) not in out  # zero overlap drops


def test_tfidf_cosine_max_df_cuts_ubiquitous_terms(spark):
    # "common" is in every doc; with max_df=2 it leaves the space and
    # the two docs share nothing
    docs = spark.createDataFrame(
        [(1, "common alpha"), (2, "common beta"), (3, "common gamma")],
        ["doc_id", "text"])
    assert tfidf_cosine_pairs(docs, threshold=0.01,
                              max_df=2).count() == 0


# ------------------------------------------------------------- auc by

def test_roc_auc_by_matches_global_per_group(spark):
    rng = np.random.RandomState(6)
    rows = []
    for g in ["a", "b"]:
        shift = 1.0 if g == "a" else 0.2
        for _ in range(300):
            y = int(rng.randint(0, 2))
            s = float(np.round(rng.randn() + shift * y, 2))
            rows.append((g, s, y))
    df = spark.createDataFrame(rows, ["g", "s", "y"])
    grouped = {r.g: r for r in roc_auc_by(df, "s", "y", "g").collect()}
    for g in ["a", "b"]:
        solo = roc_auc(df.filter(df.g == g), "s", "y").collect()[0]
        assert grouped[g].auc == pytest.approx(solo.auc, rel=1e-12)
        assert grouped[g].n_pos == solo.n_pos
    # the stronger signal should rank better
    assert grouped["a"].auc > grouped["b"].auc


def test_roc_auc_by_degenerate_group_null(spark):
    df = spark.createDataFrame(
        [("a", 0.5, 1), ("a", 0.7, 1), ("b", 0.2, 0), ("b", 0.9, 1)],
        ["g", "s", "y"])
    out = {r.g: r for r in roc_auc_by(df, "s", "y", "g").collect()}
    assert out["a"].auc is None  # no negatives
    assert out["b"].auc == pytest.approx(1.0)
