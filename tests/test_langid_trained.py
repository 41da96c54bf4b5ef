"""Trained char-n-gram language-id (round 12): correctness of the
count/score algebra and accuracy vs the stopword baseline."""

import pytest
from pyspark.sql import functions as F

from lindel_spark import text as LT


@pytest.fixture(scope="module")
def model(spark):
    seeds = spark.createDataFrame(
        [(c, s) for c, ss in sorted(LT.LANG_SEEDS.items()) for s in ss],
        "lang string, text string")
    return LT.langid_train(seeds).cache()


# Held-out sentences NOT in LANG_SEEDS; several are short or
# stopword-poor on purpose — the regime where token-level stopword
# matching fails and char-grams still carry the signal.
FIXTURE = [
    ("de", "unglaublich schönes wetter heute"),
    ("de", "meine schwester wohnt seit jahren in münchen"),
    ("de", "zwei brötchen bitte"),
    ("en", "absolutely beautiful weather today"),
    ("en", "my sister has lived in london for years"),
    ("en", "two bread rolls please"),
    ("es", "hace un tiempo increíblemente bonito hoy"),
    ("es", "mi hermana vive desde hace años en madrid"),
    ("es", "dos panecillos por favor"),
    ("fr", "il fait incroyablement beau aujourd hui"),
    ("fr", "ma soeur habite depuis des années à paris"),
    ("fr", "deux petits pains sil vous plaît"),
    ("zh", "今天天气非常好"),
    ("zh", "我姐姐多年来一直住在北京"),
    ("zh", "请给我两个面包"),
]


def test_char_ngrams_edges(spark):
    rows = spark.createDataFrame(
        [("abcd",), ("a",), ("",), ("  A  b ",)], "t string").select(
        LT.char_ngrams(F.col("t"), 2).alias("g2"),
        LT.char_ngrams(F.col("t"), 3).alias("g3")).collect()
    assert rows[0].g2 == ["ab", "bc", "cd"]
    assert rows[0].g3 == ["abc", "bcd"]
    assert rows[1].g2 == [] and rows[1].g3 == []
    assert rows[2].g2 == []
    # normalized first: "  A  b " -> "a b"
    assert rows[3].g2 == ["a ", " b"]


def test_langid_train_counts_exact(spark):
    seeds = spark.createDataFrame(
        [("xx", "aaab")], "lang string, text string")
    got = {(r.lang, r.gram): r.cnt
           for r in LT.langid_train(seeds).collect()}
    # 2-grams: aa aa ab; 3-grams: aaa aab
    assert got == {("xx", "aa"): 2, ("xx", "ab"): 1,
                   ("xx", "aaa"): 1, ("xx", "aab"): 1}


def test_trained_beats_stopword_baseline(spark, model):
    docs = spark.createDataFrame(
        [(i, lang, text) for i, (lang, text) in enumerate(FIXTURE)],
        "doc_id long, lang string, text string")
    trained = LT.trained_language_id(model, docs)
    t_hits = (trained.join(docs, "doc_id")
              .filter(F.col("guess") == F.col("lang")).count())
    s_hits = docs.filter(
        LT.language_id(F.col("text")) == F.col("lang")).count()
    n = len(FIXTURE)
    assert t_hits > s_hits, (t_hits, s_hits)
    assert t_hits >= n - 1, f"trained accuracy {t_hits}/{n}"  # 14+/15


def test_trained_fallback_on_unseen_script(spark, model):
    """A doc whose grams the model never saw (cyrillic) falls back to
    the stopword tier rather than argmaxing noise."""
    docs = spark.createDataFrame(
        [(1, "это предложение написано кириллицей")],
        "doc_id long, text string")
    got = LT.trained_language_id(model, docs).collect()[0]
    fb = docs.select(LT.language_id(F.col("text")).alias("g")) \
        .collect()[0].g
    assert got.guess == fb


def test_trained_deterministic_under_repartition(spark, model):
    docs = spark.createDataFrame(
        [(i, lang, text) for i, (lang, text) in enumerate(FIXTURE)],
        "doc_id long, lang string, text string")
    a = sorted((r.doc_id, r.guess, r.score) for r in
               LT.trained_language_id(model, docs).collect())
    b = sorted((r.doc_id, r.guess, r.score) for r in
               LT.trained_language_id(model, docs.repartition(7))
               .collect())
    assert a == b
