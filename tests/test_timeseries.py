"""OHLC resample and time-weighted average semantics."""

from pyspark.sql import functions as F

from lindel_spark.timeseries import ohlc, time_weighted_avg


def _series(spark):
    # key 1: (ts, value) = (10, 5), (20, 1), (30, 9), (40, 2)
    # key 2: single point
    return spark.createDataFrame(
        [
            (1, 10, 1, 5.0),
            (1, 20, 2, 1.0),
            (1, 30, 3, 9.0),
            (1, 40, 4, 2.0),
            (2, 99, 5, 7.0),
        ],
        "k long, ts long, seq long, v double",
    )


def test_ohlc_semantics(spark):
    out = {r.k: r for r in
           ohlc(_series(spark), ["k"], "ts", "v", "seq").collect()}
    r1 = out[1]
    assert (r1.open, r1.high, r1.low, r1.close, r1.n) == \
        (5.0, 9.0, 1.0, 2.0, 4)
    r2 = out[2]
    assert (r2.open, r2.high, r2.low, r2.close, r2.n) == \
        (7.0, 7.0, 7.0, 7.0, 1)


def test_ohlc_tie_timestamps_use_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, 10, 2, 8.0), (1, 10, 1, 3.0)], "k long, ts long, seq long, v double")
    r = ohlc(df, ["k"], "ts", "v", "seq").first()
    assert r.open == 3.0 and r.close == 8.0  # seq orders the tie


def test_time_weighted_avg_locf_integration(spark):
    out = {r.k: r for r in time_weighted_avg(
        _series(spark), ["k"], "ts", "v", "seq").collect()}
    # key 1: (5*10 + 1*10 + 9*10) / 30 = 5.0 over span [10, 40]
    r1 = out[1]
    assert r1.span == 30.0 and r1.n == 4
    assert abs(r1.twa - 5.0) < 1e-12
    # key 2: zero span -> NULL twa
    r2 = out[2]
    assert r2.twa is None and r2.span == 0.0 and r2.n == 1


def test_time_weighted_avg_matches_plain_avg_on_uniform_grid(spark):
    # evenly spaced samples: TWA equals the plain mean of all but the
    # last sample (the last holds for zero time inside the span)
    df = spark.createDataFrame(
        [(1, 10 * i, i, float(i)) for i in range(5)],
        "k long, ts long, seq long, v double")
    r = time_weighted_avg(df, ["k"], "ts", "v", "seq").first()
    assert abs(r.twa - (0 + 1 + 2 + 3) / 4) < 1e-12


def test_tfidf_topk_ranks_distinctive_terms_first(spark):
    from lindel_spark.retrieval import tfidf_topk
    docs = spark.createDataFrame(
        [
            (1, "common zebra zebra"),
            (2, "common yak yak"),
            (3, "common common common"),
        ],
        "doc_id long, text string")
    out = tfidf_topk(docs, k=1)
    top = {r.doc_id: r.term for r in out.collect()}
    # the rare term outweighs the frequent-but-ubiquitous one
    assert top[1] == "zebra" and top[2] == "yak" and top[3] == "common"
    # determinism: rank column is dense 1..k per doc
    ranks = [r.rank for r in tfidf_topk(docs, k=2)
             .filter("doc_id = 1").collect()]
    assert sorted(ranks) == [1, 2]


def test_sentences_helper_segments_and_trims(spark):
    from lindel_spark.text import sentences
    df = spark.createDataFrame(
        [(1, "First one. Second!  Third?No terminator tail")],
        "id long, text string")
    out = df.select(sentences(F.col("text")).alias("s")).first().s
    assert out == ["First one.", "Second!", "Third?",
                   "No terminator tail"]
