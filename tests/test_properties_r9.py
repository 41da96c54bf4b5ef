"""Hypothesis property tests for the round-9 operators: random
corpora beyond the fixed-seed unit tests (SURVEY §5.2).

Each example runs real Spark jobs, so example counts are small and
deadlines disabled; the generators aim at the edges that broke things
historically — duplicate-heavy corpora (near-identical pileups),
negative keys, tie-adjacent orderings.
"""

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from lindel_spark.dedup import set_similarity_join
from lindel_spark.util import global_rank

_SETTINGS = dict(max_examples=10, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.integers(0, 12), min_size=1, max_size=8),
        min_size=2, max_size=40),
    th_pct=st.sampled_from([30, 50, 70]),
)
def test_prefix_filter_equals_bruteforce(spark, docs, th_pct):
    """set_similarity_join must equal the all-pairs exact answer on
    ANY corpus — including duplicate-heavy ones where every doc shares
    every prefix token (the worst case for posting sizes)."""
    th = th_pct / 100.0
    rows = [(i, " ".join(f"w{t}" for t in toks))
            for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r.id_a, r.id_b): round(r.jaccard, 12)
           for r in set_similarity_join(df, threshold=th).collect()}
    toks = {i: set(t.split()) for i, t in rows}
    want = {}
    for a, b in itertools.combinations(sorted(toks), 2):
        j = len(toks[a] & toks[b]) / len(toks[a] | toks[b])
        if j >= th:
            want[(a, b)] = round(j, 12)
    assert got == want


@settings(**_SETTINGS)
@given(
    keys=st.lists(st.integers(-1000, 1000), min_size=1, max_size=60),
    nparts=st.sampled_from([None, 3, 7]),
)
def test_global_rank_equals_row_number(spark, keys, nparts):
    """global_rank (boundary method) must equal the single-task
    row_number ground truth for any key distribution — negative keys,
    heavy ties (broken by the id column), single-row frames."""
    rows = [(i, k) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, ["id", "k"])
    got = {r.id: r.rnk
           for r in global_rank(df, ["k", "id"], "rnk",
                                num_partitions=nparts).collect()}
    want = {r.id: r.rnk for r in df.withColumn(
        "rnk", F.row_number().over(Window.orderBy("k", "id"))).collect()}
    assert got == want
