"""Round-4 pipeline operators: packing, repetition, contamination."""

import pytest
from pyspark.sql import functions as F

from lindel_spark import dedup as LD
from lindel_spark import text as LT
from lindel_spark.packing import pack_sequences
from lindel_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark("test-packing")


def test_pack_sequences_contiguous_fill(spark):
    rows = [(i, "a", n) for i, n in enumerate([100, 100, 100, 50, 100])]
    rows += [(10, "b", 250), (11, "b", 10)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    got = {r.doc_id: r.bin for r in pack_sequences(df, budget=200).collect()}
    # group a cumulative-before: 0,100,200,300,350 -> bins 0,0,1,1,1
    assert [got[i] for i in range(5)] == [0, 0, 1, 1, 1]
    # group b independent: 0,250 -> bins 0,1
    assert (got[10], got[11]) == (0, 1)


def test_pack_sequences_layout_invariant(spark):
    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("string").alias("source"),
        (F.col("id") % 13 + 1).alias("n_tokens"))
    a = {(r.doc_id, r.bin) for r in pack_sequences(df, 32).collect()}
    b = {(r.doc_id, r.bin)
         for r in pack_sequences(df.repartition(7), 32).collect()}
    assert a == b


def test_pack_sequences_bin_capacity(spark):
    # no bin's *starting offsets* exceed budget: every doc whose
    # cumulative-before lands in bin k starts below (k+1)*budget
    df = spark.range(500).select(
        F.col("id").alias("doc_id"), F.lit("s").alias("source"),
        (F.col("id") % 40 + 1).alias("n_tokens"))
    out = pack_sequences(df, 100)
    w_ok = out.withColumn(
        "before",
        F.sum("n_tokens").over(
            __import__("pyspark.sql.window", fromlist=["Window"])
            .Window.partitionBy("source").orderBy("doc_id")
            .rowsBetween(-2**31, 0)) - F.col("n_tokens"))
    bad = w_ok.filter(
        (F.col("before") < F.col("bin") * 100)
        | (F.col("before") >= (F.col("bin") + 1) * 100)).count()
    assert bad == 0


def test_repetition_signals_crafted(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),          # bigrams: ab,ba,ab,ba,ab -> top 3/5
            (2, "x y z w v u"),          # all bigrams unique -> 1/5
            (3, "q q q q q q q q q q"),  # one bigram repeated; 5-grams all dup
            (4, "one"),                  # too short for either signal
        ],
        "doc_id long, text string")
    got = {r.doc_id: r for r in LT.repetition_signals(df).collect()}
    assert abs(got[1].top_bigram_frac - 3 / 5) < 1e-15
    assert abs(got[2].top_bigram_frac - 1 / 5) < 1e-15
    assert got[2].dup_5gram_frac == 0.0
    assert got[3].top_bigram_frac == 1.0
    # 6 five-grams, all identical -> 1 - 1/6
    assert abs(got[3].dup_5gram_frac - (1 - 1 / 6)) < 1e-15
    assert got[4].top_bigram_frac == 0.0 and got[4].dup_5gram_frac == 0.0
    assert got[4].n_tokens == 1


def test_contamination_pairs_crafted(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    train = spark.createDataFrame(
        [(1, shared + " extra words here"),
         (2, "totally different content with no overlap at all present")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, shared), (101, "another clean benchmark row of words only")],
        "doc_id long, text string")
    got = {(r.train_id, r.bench_id): r.n_shared
           for r in LD.contamination_pairs(train, bench, k=8,
                                           min_shared=2).collect()}
    # "shared" has 10 tokens -> 3 distinct 8-shingles, all present in
    # train doc 1 (its first 10 tokens are identical)
    assert got == {(1, 100): 3}


def test_contamination_max_bench_df_guard(spark):
    stop = "the a of and to in is it on as"  # one hot shingle set
    bench = spark.createDataFrame(
        [(i, stop) for i in range(5)], "doc_id long, text string")
    train = spark.createDataFrame([(1, stop)], "doc_id long, text string")
    full = LD.contamination_pairs(train, bench, k=8, min_shared=1)
    assert full.count() == 5
    capped = LD.contamination_pairs(train, bench, k=8, min_shared=1,
                                    max_bench_df=2)
    assert capped.count() == 0  # shingles hit 5 bench docs > cap -> dropped


def test_scrub_text(spark):
    df = spark.createDataFrame(
        [(1, "visit https://x.io/p?q=2 and http://y.z/ now"),
         (2, "mail a.b+c@d-e.fg or admin@site.org today"),
         (3, "no links here at all")],
        "doc_id long, text string")
    got = {r.doc_id: r.c for r in
           df.select("doc_id", LT.scrub_text(F.col("text")).alias("c"))
           .collect()}
    assert got[1] == "visit <URL> and <URL> now"
    assert got[2] == "mail <EMAIL> or <EMAIL> today"
    assert got[3] == "no links here at all"


def test_chunk_documents_semantics(spark):
    from lindel_spark.packing import chunk_documents

    toks = [f"t{i}" for i in range(11)]
    df = spark.createDataFrame(
        [(1, " ".join(toks)), (2, "a b"), (3, "")],
        "doc_id long, text string")
    rows = {(r.doc_id, r.chunk_id): r
            for r in chunk_documents(df, max_tokens=5, overlap=2).collect()}
    # doc 1: 11 tokens, step 3 -> ceil(9/3)=3 chunks [0:5],[3:8],[6:11]
    assert rows[(1, 0)].chunk_text == "t0 t1 t2 t3 t4"
    assert rows[(1, 1)].chunk_text == "t3 t4 t5 t6 t7"
    assert rows[(1, 2)].chunk_text == "t6 t7 t8 t9 t10"
    assert rows[(1, 2)].n_chunk_tokens == 5
    assert len([k for k in rows if k[0] == 1]) == 3
    # short doc: one whole chunk
    assert rows[(2, 0)].chunk_text == "a b"
    assert rows[(2, 0)].n_chunk_tokens == 2
    assert len([k for k in rows if k[0] == 2]) == 1
    # empty doc: one empty chunk, not a lost row
    assert rows[(3, 0)].chunk_text == "" and rows[(3, 0)].n_chunk_tokens == 0


def test_chunk_documents_carries_metadata_columns(spark):
    """Non-text columns ride onto every chunk row, so downstream
    mixture/packing groups (source, lang, ...) keep working."""
    from lindel_spark.packing import chunk_documents

    df = spark.createDataFrame(
        [(1, "web", " ".join(f"t{i}" for i in range(7)))],
        "doc_id long, source string, text string")
    rows = chunk_documents(df, max_tokens=3, overlap=0).collect()
    assert len(rows) == 3
    assert all(r.source == "web" and r.doc_id == 1 for r in rows)
    assert "text" not in rows[0].asDict()


def test_chunk_documents_rejects_bad_overlap(spark):
    from lindel_spark.packing import chunk_documents

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        chunk_documents(df, max_tokens=4, overlap=4)


def test_vocab_coverage_curve(spark, sf_dir):
    """Round-9 vocab_coverage: monotone cumulative share ending at
    <= 1.0, exact counts, and the rank window carries Spark's
    top-k pushdown (LocalLimit-below-Window / WindowGroupLimit) so
    the vocabulary sort never funnels the full vocab through one
    task."""
    import os

    from lindel_spark.text import vocab_coverage

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    out = vocab_coverage(docs, top_n=50)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # Catalyst pushes the rank<=n cut below the rank window as a
    # LocalLimit per partition (LimitPushDownThroughWindow) — the
    # vocabulary sort keeps at most n rows per partition
    assert "LocalLimit 50" in plan or "WindowGroupLimit" in plan
    rows = sorted(out.collect(), key=lambda r: r.rank)
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    shares = [r.cum_share for r in rows]
    assert all(b > a for a, b in zip(shares, shares[1:]))
    assert shares[-1] <= 1.0 + 1e-12
    cnts = [r.cnt for r in rows]
    assert all(a >= b for a, b in zip(cnts, cnts[1:]))


def test_remove_boilerplate_lines_behavior(spark):
    """Round-9 boilerplate removal on a constructed corpus: the
    injected header/footer (present in every doc) disappears, rare
    lines and empty lines survive, counts are right, and with no
    boilerplate the text round-trips unchanged."""
    from lindel_spark.text import remove_boilerplate_lines

    docs = spark.createDataFrame(
        [(i, f"SITE HEADER\nbody text {i}\n\nunique line {i * 7}"
             "\nCopyright Footer") for i in range(40)],
        ["doc_id", "text"])
    out = {r.doc_id: r for r in remove_boilerplate_lines(
        docs, max_doc_frac=0.5, min_docs=5).collect()}
    for i in (0, 17, 39):
        r = out[i]
        assert r.text == f"body text {i}\n\nunique line {i * 7}"
        assert r.n_lines_removed == 2
    # no-boilerplate corpus: identity
    clean = spark.createDataFrame(
        [(i, f"only {i}\n\nlines {i}") for i in range(20)],
        ["doc_id", "text"])
    got = {r.doc_id: r for r in remove_boilerplate_lines(
        clean, max_doc_frac=0.5, min_docs=5).collect()}
    assert all(got[i].text == f"only {i}\n\nlines {i}"
               and got[i].n_lines_removed == 0 for i in range(20))


def test_length_bucketed_batches_shape(spark):
    from lindel_spark.packing import length_bucketed_batches
    # lengths: 20 docs of len 10..29 (bucket 0: <64), 5 docs of len 100
    rows = [(i, 10 + i) for i in range(20)] + \
           [(100 + i, 100) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, len long")
    asg = length_bucketed_batches(df, "doc_id", "len",
                                  bucket_width=64, batch_size=8)
    got = asg.collect()
    assert len(got) == 25
    by_batch = {}
    for r in got:
        by_batch.setdefault(r.batch_id, []).append(r)
    # bucket 0 -> 20 docs -> batches of 8, 8, 4; bucket 1 -> one of 5
    sizes = sorted(len(v) for v in by_batch.values())
    assert sizes == [4, 5, 8, 8]
    # within a batch, positions are 0..n-1 and lengths sorted asc
    for members in by_batch.values():
        members.sort(key=lambda r: r.pos_in_batch)
        assert [m.pos_in_batch for m in members] == list(range(len(members)))
        lens = [m.len for m in members]
        assert lens == sorted(lens)
    # batch ids never mix buckets
    for members in by_batch.values():
        assert len({m.bucket for m in members}) == 1


def test_length_bucketed_batches_deterministic(spark):
    from lindel_spark.packing import length_bucketed_batches
    rows = [(i, (i * 37) % 200 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, len long")
    a = sorted(map(tuple, length_bucketed_batches(
        df, "doc_id", "len", 64, 16).collect()))
    b = sorted(map(tuple, length_bucketed_batches(
        df.repartition(7), "doc_id", "len", 64, 16).collect()))
    assert a == b
