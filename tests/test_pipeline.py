"""prepare_corpus composition semantics."""

from pyspark.sql import functions as F

from lindel_spark.pipeline import prepare_corpus

GOOD = ("the quick brown fox jumps over the lazy dog and keeps "
        "running through the quiet green field toward home")
JUNK = "!!!! ???? 1234 @@@@ #### $$$$ %%%% ^^^^ &&&& ****"


def test_prepare_corpus_gates_dedups_and_splits(spark):
    docs = spark.createDataFrame(
        [
            (1, GOOD),
            (2, GOOD),            # exact dup of 1 -> dropped (min id kept)
            (3, JUNK),            # fails the quality gate
            (4, GOOD + " extra words to differ meaningfully here"),
        ],
        "doc_id long, text string")
    out = prepare_corpus(docs)
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {1, 4}
    assert all(r.split in ("train", "val", "test")
               for r in rows.values())
    assert all(r.quality >= 0.75 for r in rows.values())


def test_prepare_corpus_is_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, GOOD + f" variation token {i} appended for distinctness")
         for i in range(40)],
        "doc_id long, text string")
    a = {(r.doc_id, r.split) for r in prepare_corpus(docs).collect()}
    b = {(r.doc_id, r.split) for r in
         prepare_corpus(docs.repartition(7)).collect()}
    assert a == b and len(a) == 40
