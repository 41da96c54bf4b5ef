"""n-gram novelty scoring and the word_ngrams helper."""

import pytest
from pyspark.sql import functions as F

from lindel_spark.text import ngram_novelty, word_ngrams


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])


def test_word_ngrams_basic(spark):
    df = spark.createDataFrame([("a b c d",), ("x y",), ("",)], ["t"])
    got = df.select(word_ngrams(F.col("t"), 3).alias("g")).collect()
    assert got[0].g == ["a b c", "b c d"]
    assert got[1].g == []
    assert got[2].g == []


def test_word_ngrams_normalizes(spark):
    df = spark.createDataFrame([("  Foo   BAR baz ",)], ["t"])
    got = df.select(word_ngrams(F.col("t"), 2).alias("g")).collect()
    assert got[0].g == ["foo bar", "bar baz"]


def test_word_ngrams_rejects_bad_n(spark):
    with pytest.raises(ValueError):
        word_ngrams(F.lit("a"), 0)


def test_novelty_all_seen_is_zero(spark):
    ref = _docs(spark, ["the quick brown fox jumps"])
    tgt = _docs(spark, ["the quick brown fox"])
    r = ngram_novelty(tgt, ref, n=3).collect()[0]
    assert r.n_grams == 2 and r.n_novel == 0
    assert r.novelty == 0.0


def test_novelty_disjoint_is_one(spark):
    ref = _docs(spark, ["alpha beta gamma delta"])
    tgt = _docs(spark, ["one two three four"])
    r = ngram_novelty(tgt, ref, n=3).collect()[0]
    assert r.n_grams == 2 and r.n_novel == 2
    assert r.novelty == 1.0


def test_novelty_fraction_and_distinct_grams(spark):
    ref = _docs(spark, ["a b c x"])
    # target grams: {a b c, b c d, c d a, d a b} repeated grams count once
    tgt = _docs(spark, ["a b c d a b c"])
    r = ngram_novelty(tgt, ref, n=3).collect()[0]
    # distinct target trigrams: a b c, b c d, c d a, d a b  -> 4
    # seen in ref: only "a b c" -> novel = 3
    assert r.n_grams == 4 and r.n_novel == 3
    assert r.novelty == pytest.approx(0.75)


def test_novelty_short_doc_null(spark):
    ref = _docs(spark, ["a b c d"])
    tgt = _docs(spark, ["one two"])
    r = ngram_novelty(tgt, ref, n=3).collect()[0]
    assert r.n_grams == 0 and r.n_novel == 0 and r.novelty is None


def test_novelty_every_target_doc_emits_row(spark):
    ref = _docs(spark, ["a b c"])
    tgt = _docs(spark, ["a b c", "x", "p q r s"])
    assert ngram_novelty(tgt, ref, n=3).count() == 3


def test_novelty_string_doc_ids(spark):
    ref = spark.createDataFrame([("r1", "a b c d")],
                                ["doc_id", "text"])
    tgt = spark.createDataFrame(
        [("doc-001", "a b c"), ("doc-002", "x y z")],
        ["doc_id", "text"])
    got = {r.doc_id: r.novelty
           for r in ngram_novelty(tgt, ref, n=3).collect()}
    assert got == {"doc-001": 0.0, "doc-002": 1.0}
