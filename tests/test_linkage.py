"""Record linkage: blocking, field scoring, guard, A×B mode."""

import pytest
from pyspark.sql import functions as F

from lindel_spark.linkage import LinkField, record_linkage


@pytest.fixture(scope="module")
def people(spark):
    rows = [
        # block "ny": two near-identical records + one distant
        (1, "ny", "alice johnson", 100.0),
        (2, "ny", "alice jonson", 110.0),     # 1-char name typo, close bal
        (3, "ny", "zebulon quartz", 900.0),
        # block "sf": exact twins
        (4, "sf", "bob stone", 50.0),
        (5, "sf", "bob stone", 50.0),
        # different blocks never compared even if identical
        (6, "la", "alice johnson", 100.0),
    ]
    return spark.createDataFrame(rows, ["id", "city", "name", "bal"])


FIELDS = [LinkField("name", "levenshtein", weight=0.7),
          LinkField("bal", "numeric", weight=0.3, scale=100.0)]


def test_self_linkage_finds_typo_pair_and_twins(people):
    got = {(r.id_a, r.id_b): r.score
           for r in record_linkage(people, "id", ["city"], FIELDS,
                                   threshold=0.8).collect()}
    assert (4, 5) in got and got[(4, 5)] == 1.0
    assert (1, 2) in got
    # levenshtein("alice johnson","alice jonson")=1, maxlen 13;
    # bal sim = 1 - 10/100
    expected = 0.7 * (1 - 1 / 13) + 0.3 * 0.9
    assert got[(1, 2)] == pytest.approx(expected, abs=1e-9)
    # cross-block identical records (1, 6) must NOT pair
    assert all(a < b for a, b in got)
    assert (1, 6) not in got and (3,) not in {k[:1] for k in got}


def test_exact_field_kind(people):
    fields = [LinkField("name", "exact", weight=1.0)]
    got = {(r.id_a, r.id_b)
           for r in record_linkage(people, "id", ["city"], fields,
                                   threshold=1.0).collect()}
    assert got == {(4, 5)}


def test_ab_linkage_crosses_frames(people, spark):
    other = spark.createDataFrame(
        [(10, "ny", "alice johnson", 100.0)],
        ["id", "city", "name", "bal"])
    got = {(r.id_a, r.id_b): r.score
           for r in record_linkage(people, "id", ["city"], FIELDS,
                                   threshold=0.99,
                                   other=other).collect()}
    assert got == {(1, 10): 1.0}


def test_block_guard_raises_with_block_named(spark):
    big = spark.createDataFrame(
        [(i, "hot", f"name{i}", float(i)) for i in range(50)],
        ["id", "city", "name", "bal"])
    with pytest.raises(Exception, match="max_block_rows"):
        record_linkage(big, "id", ["city"], FIELDS, threshold=0.0,
                       max_block_rows=10).count()
    # bound honored when raised
    assert record_linkage(big, "id", ["city"], FIELDS, threshold=2.0,
                          max_block_rows=100).count() == 0


def test_null_block_value_is_a_category(spark):
    df = spark.createDataFrame(
        [(1, None, "same name", 1.0), (2, None, "same name", 1.0),
         (3, "x", "same name", 1.0)],
        ["id", "city", "name", "bal"])
    got = {(r.id_a, r.id_b)
           for r in record_linkage(df, "id", ["city"], FIELDS,
                                   threshold=0.99).collect()}
    assert got == {(1, 2)}


def test_incremental_linkage_roles(spark):
    from lindel_spark.linkage import incremental_linkage
    master = spark.createDataFrame(
        [(1, "ny", "alice johnson", 100.0),
         (2, "sf", "bob stone", 50.0)],
        ["id", "city", "name", "bal"])
    batch = spark.createDataFrame(
        [(10, "ny", "alice johnson", 100.0),   # matches master 1
         (11, "sf", "carol reef", 80.0),       # new
         (12, "sf", "carol reef", 80.0),       # within-batch dup of 11
         (13, "la", "dan brook", 10.0)],       # new (block unseen)
        ["id", "city", "name", "bal"])
    matches, new = incremental_linkage(
        batch, master, "id", ["city"], FIELDS, threshold=0.99)
    assert {(r.id_a, r.id_b) for r in matches.collect()} == {(1, 10)}
    assert {r.id for r in new.collect()} == {11, 13}


def test_bpe_pair_counts_exact(spark):
    from lindel_spark.text import bpe_pair_counts
    df = spark.createDataFrame(
        [(1, "ab ab cd"), (2, "ab ab"), (3, "x")], ["id", "text"])
    # pretokens: ["ab","ab","cd"] -> pairs "ab ab","ab cd";
    # ["ab","ab"] -> "ab ab"; ["x"] -> none (guarded)
    got = {r.pair: r.n for r in bpe_pair_counts(df).collect()}
    assert got == {"ab ab": 2, "ab cd": 1}
    top = bpe_pair_counts(df, top_n=1).collect()
    assert [(r.pair, r.n) for r in top] == [("ab ab", 2)]
