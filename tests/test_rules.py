"""Association rules vs a hand-computed reference."""

from pyspark.sql import functions as F

from lindel_spark import rules as RL


def test_association_rules_values(spark):
    # baskets: {1:(a,b,c)}, {2:(a,b)}, {3:(a,c)}, {4:(b)}  N=4
    rows = [(1, "a"), (1, "b"), (1, "c"), (1, "c"),  # dup item in basket
            (2, "a"), (2, "b"), (3, "a"), (3, "c"), (4, "b")]
    df = spark.createDataFrame(rows, ["basket", "item"])
    out = {(r.antecedent, r.consequent): r
           for r in RL.association_rules(
               df, "basket", "item", min_pair_baskets=1).collect()}
    # n(a)=3, n(b)=3, n(c)=2, n(a,b)=2, n(a,c)=2, n(b,c)=1
    ab = out[("a", "b")]
    assert ab.n_pair == 2
    assert ab.support == 0.5            # 2/4
    assert ab.confidence == 2 / 3       # 2/n(a)
    assert ab.lift == (2 / 3) / (3 / 4)
    ba = out[("b", "a")]
    assert ba.confidence == 2 / 3 and ba.lift == ab.lift
    ca = out[("c", "a")]
    assert ca.confidence == 1.0          # a in every c-basket
    assert ca.lift == 1.0 / (3 / 4)
    # min-support cut prunes the (b, c) pair entirely (both directions)
    pruned = {(r.antecedent, r.consequent)
              for r in RL.association_rules(
                  df, "basket", "item", min_pair_baskets=2).collect()}
    assert ("b", "c") not in pruned and ("c", "b") not in pruned
    assert ("a", "b") in pruned
    # min_confidence filter
    conf = RL.association_rules(
        df, "basket", "item", min_pair_baskets=1,
        min_confidence=0.9).collect()
    assert all(r.confidence >= 0.9 for r in conf)


def test_cooccurrence_set_semantics(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (1, "y")], ["basket", "item"])
    out = RL.cooccurrence_pairs(df, "basket", "item").collect()
    assert len(out) == 1
    assert (out[0].item_a, out[0].item_b, out[0].n_baskets) == ("x", "y", 1)


def test_frequent_triples_exact_counts(spark):
    from lindel_spark.rules import frequent_triples

    # baskets: {a,b,c} x3, {a,b,d} x1, {a,b,c,d} x1
    rows = []
    for bk, items in enumerate(
            [["a", "b", "c"]] * 3 + [["a", "b", "d"]]
            + [["a", "b", "c", "d"]]):
        rows += [(bk, i) for i in items]
    df = spark.createDataFrame(rows, "bk long, it string")
    got = {(r.item_a, r.item_b, r.item_c): r.n_baskets
           for r in frequent_triples(df, "bk", "it", 2).collect()}
    assert got == {("a", "b", "c"): 4, ("a", "b", "d"): 2}
    got3 = {(r.item_a, r.item_b, r.item_c): r.n_baskets
            for r in frequent_triples(df, "bk", "it", 3).collect()}
    assert got3 == {("a", "b", "c"): 4}


def test_frequent_triples_ground_truth_brute(spark):
    from itertools import combinations

    from lindel_spark.rules import frequent_triples

    baskets = {
        0: {"a", "b", "c"}, 1: {"a", "b", "c"}, 2: {"a", "b", "c"},
        3: {"a", "b", "d"}, 4: {"a", "b", "c", "d"}, 5: {"b", "c"},
    }
    rows = [(bk, i) for bk, items in baskets.items() for i in items]
    df = spark.createDataFrame(rows, "bk long, it string")
    from collections import Counter
    truth = Counter()
    for items in baskets.values():
        for t in combinations(sorted(items), 3):
            truth[t] += 1
    for minsup in (1, 2, 3, 4):
        want = {t: n for t, n in truth.items() if n >= minsup}
        got = {(r.item_a, r.item_b, r.item_c): r.n_baskets
               for r in frequent_triples(df, "bk", "it",
                                         minsup).collect()}
        assert got == want, (minsup, got, want)


def test_frequent_triples_duplicate_rows_set_semantics(spark):
    from lindel_spark.rules import frequent_triples

    df = spark.createDataFrame(
        [(0, "a"), (0, "a"), (0, "b"), (0, "c"), (1, "a"), (1, "b"),
         (1, "c")],
        "bk long, it string")
    got = frequent_triples(df, "bk", "it", 2).collect()
    assert len(got) == 1 and got[0].n_baskets == 2


def test_frequent_triples_validates(spark):
    import pytest

    from lindel_spark.rules import frequent_triples

    df = spark.createDataFrame([(0, "a")], "bk long, it string")
    with pytest.raises(ValueError):
        frequent_triples(df, "bk", "it", 0)
