"""Lexical retrieval and corpus language-model scoring.

Training-data pipelines need retrieval twice: BM25 top-k for benchmark
decontamination / nearest-document audits, and corpus-LM log-prob as a
quality signal (documents far from the corpus distribution are noise
or boilerplate). Both are built from the same long-format
(doc_id, term, tf, dl) postings relation produced by a single
tokenize→explode→groupBy pass.

Scale design (the part that matters at 100 TB):

* ``doc_term_stats`` is one scan + one map-side-combined ``groupBy``;
  the postings relation is the inverted-index *content* in long form,
  partitioned by its grouping key.
* ``bm25_topk`` broadcasts the (small) query-term side, so the corpus
  postings are filtered to query terms inside the scan stage with a
  broadcast hash join — no shuffle of the corpus. Document frequency
  is computed from the *filtered* postings (identical values, a
  vocabulary-of-queries-sized aggregate instead of a full-vocab one).
  The only shuffles are keyed by matched (query_id, doc_id), bounded
  by documents that share a term with some query.
* ``unigram_logprob`` aggregates the full vocabulary once (map-side
  combine; vocab ≪ corpus) and joins it back on ``term`` — a standard
  key-partitioned join that AQE handles at any scale.

Scores use ``ln`` (the one transcendental in the repo); registry
queries round to 4 decimals on both engines so the driver's value-hash
is robust to sub-ulp libm differences between the JVM and DuckDB.

The reference's surface is curve-math only
(src/lindel_extension.cpp:948-1026); this module is part of the build
brief's LLM-pipeline tier layered beside it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lindel_spark.text import normalize_text, tokens

BM25_K1 = 1.2
BM25_B = 0.75


def doc_term_stats(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Long-format postings: one row per (doc, term) with term
    frequency ``tf`` and document length ``dl`` (token count).

    One scan, one map-side-combined groupBy — the canonical inverted
    index content. ``dl`` rides along via ``first`` (constant within
    the group), so no second pass over the text.
    """
    exploded = _exploded_terms(df, id_col, text_col)
    return exploded.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"),
        F.first("dl").alias("dl"),
    )


def _exploded_terms(df: DataFrame, id_col: str,
                    text_col: str) -> DataFrame:
    """(doc_id, dl, term), one row per token.

    The tokenized array is materialized in its OWN projection before
    ``size``/``explode`` touch it: referencing the raw tokenizer
    expression from both would make Catalyst re-evaluate the whole
    regexp chain once per exploded token (measured 20x slower at
    sf0.1), whereas the intermediate alias is computed once per
    document."""
    toks = tokens(normalize_text(F.col(text_col)))
    base = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        toks.alias("__toks"),
    )
    return base.select(
        "doc_id",
        F.size("__toks").cast("long").alias("dl"),
        F.explode("__toks").alias("term"),
    )


def bm25_topk(docs: DataFrame, queries: DataFrame, k: int = 10,
              k1: float = BM25_K1, b: float = BM25_B,
              id_col: str = "doc_id", text_col: str = "text",
              query_id_col: str = "query_id",
              query_col: str = "query",
              rank_round: int | None = None) -> DataFrame:
    """Okapi BM25 top-``k`` documents per query.

    Lucene-style idf ``ln(1 + (N - df + 0.5)/(df + 0.5))`` (always
    positive), query terms deduplicated (query term frequency is not
    weighted), ties broken by ascending ``doc_id`` so the ranking is
    deterministic. Returns (query_id, rank, doc_id, score).

    The query side is broadcast; document frequency is computed from
    the query-term-filtered postings so the aggregate is bounded by
    |query vocabulary|, not |corpus vocabulary|.

    ``rank_round``: rank by ``round(score, rank_round)`` instead of
    the raw float — near-tied scores differ across engines/summation
    orders in final ulps, which flips rank order and the top-k cut
    (surfaced by the sf1 oracle sweep); cross-engine-reproducible
    pipelines should pass the same rounding their comparator uses.
    """
    qterms = queries.select(
        F.col(query_id_col).cast("long").alias("query_id"),
        F.explode(tokens(normalize_text(F.col(query_col)))).alias("term"),
    ).distinct()

    # One corpus scan each for stats and postings, and the postings
    # aggregate only ever sees query terms: the broadcast semi-join on
    # term runs INSIDE the scan stage, so the groupBy shuffle is
    # bounded by |query vocabulary| x matching docs, not the corpus
    # vocabulary.
    exploded = _exploded_terms(docs, id_col, text_col)
    matched = exploded.join(
        F.broadcast(qterms.select("term").distinct()), "term"
    ).groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"),
        F.first("dl").alias("dl"),
    )

    # corpus constants: map-only doc-level pass (docs with >= 1 token,
    # matching the postings-derived definition), one 1-row aggregate,
    # broadcast-cross-joined in.
    toks = tokens(normalize_text(F.col(text_col)))
    stats = docs.select(F.size(toks).cast("long").alias("__dl")) \
        .filter(F.col("__dl") > 0).agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__dl").alias("total_tokens"),
    ).select(
        "n_docs",
        (F.col("total_tokens").cast("double")
         / F.col("n_docs").cast("double")).alias("avgdl"),
    )

    # document frequency via a window over the (already unique)
    # (doc_id, term) postings: matched rows per term = df. One extra
    # term-keyed shuffle of the FILTERED postings — and crucially the
    # matched subtree is evaluated once, not re-aggregated into a
    # separate broadcast (which re-ran the whole corpus scan and made
    # sf1 super-linear).
    from pyspark.sql.window import Window
    matched = matched.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term")))

    return _bm25_score_tail(matched, qterms, stats, k, k1, b,
                            rank_round)


def _bm25_score_tail(matched: DataFrame, qterms: DataFrame,
                     stats: DataFrame, k: int, k1: float, b: float,
                     rank_round: int | None) -> DataFrame:
    """Shared BM25 scoring tail: ``matched`` = query-term-filtered
    unique (doc_id, term, tf, dl, df) postings, ``qterms`` =
    (query_id, term), ``stats`` = one row (n_docs, avgdl). Both the
    fresh-computation path and the persisted-index path feed this, so
    the two are value-identical by construction."""
    # Re-cluster the filtered postings by document BEFORE the query
    # join: every (query_id, doc_id) group is then complete within a
    # partition, so the score aggregation below completes with NO
    # shuffle of the joined rows (hash(doc_id) satisfies the
    # (query_id, doc_id) clustering requirement). Without this, the
    # |postings| x |queries-per-term| intermediate — 90M rows at sf1
    # under the synthetic corpus's tiny shared vocabulary — shuffles
    # in full and dominates the query (measured 45 s vs 3 s).
    matched = matched.repartition("doc_id")

    scored_terms = (
        matched
        .join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf").cast("double") * (k1 + 1.0))
                / (
                    F.col("tf").cast("double")
                    + F.lit(k1)
                    * (F.lit(1.0 - b)
                       + F.lit(b) * F.col("dl").cast("double")
                       / F.col("avgdl"))
                )
            ).alias("term_score"),
        )
    )

    scores = scored_terms.groupBy("query_id", "doc_id").agg(
        F.sum("term_score").alias("score"))
    from pyspark.sql.window import Window
    order_score = (F.round(F.col("score"), rank_round)
                   if rank_round is not None else F.col("score"))
    w = Window.partitionBy("query_id").orderBy(
        order_score.desc(), F.col("doc_id").asc())
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def unigram_logprob(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's
    own maximum-likelihood unigram distribution — the KenLM-style
    "how typical is this document" quality signal (no OOV smoothing
    needed: the model is trained on the scored corpus itself).

    Returns (doc_id, n_tokens, avg_logprob); higher = more typical.
    One full-vocab aggregate (map-side combine) + one term-keyed join.
    """
    toks = tokens(normalize_text(F.col(text_col)))
    exploded = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(toks).alias("term"),
    )
    vocab = exploded.groupBy("term").agg(
        F.count(F.lit(1)).alias("term_count"))
    total = vocab.agg(F.sum("term_count").alias("total_tokens"))
    return (
        exploded.join(vocab, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.log(F.col("term_count").cast("double")
                      / F.col("total_tokens").cast("double"))
            ).alias("sum_logprob"),
        )
        .select(
            "doc_id",
            "n_tokens",
            (F.col("sum_logprob") / F.col("n_tokens").cast("double")
             ).alias("avg_logprob"),
        )
    )


def bigram_logprob(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Per-document mean bigram conditional log-probability under the
    corpus's own ML bigram model: mean over positions i >= 2 of
    ``ln(count(w[i-1], w[i]) / count_as_prefix(w[i-1]))`` — the
    next-token-predictability quality signal one order up from
    :func:`unigram_logprob` (repetitive/templated text scores near 0,
    incoherent text scores very negative). No smoothing needed: every
    scored bigram exists in the model by construction, and the prefix
    denominator counts ONLY prefix occurrences (a document's final
    token is no bigram's prefix), so probabilities are exact ML.

    Returns (doc_id, n_bigrams, avg_logprob); docs with < 2 tokens
    drop out. Shape: one map-side bigram explode, one vocab-sized
    aggregate per order, two term-keyed joins — all AQE-standard."""
    toks = tokens(normalize_text(F.col(text_col)))
    base = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        toks.alias("__toks"),
    ).filter(F.size("__toks") >= 2)
    # zip_with pairs each token with its successor; slice drops the
    # dangling last element. Materialized alias = single evaluation
    # (the explode-sibling lesson from _exploded_terms).
    grams = base.select(
        "doc_id",
        F.slice(
            F.zip_with(
                "__toks",
                F.slice("__toks", 2, F.greatest(
                    F.size("__toks") - 1, F.lit(1))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            ),
            1, F.size("__toks") - 1,
        ).alias("__grams"),
    ).select("doc_id", F.explode("__grams").alias("g")) \
     .select("doc_id", F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))

    bigram_counts = grams.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("big_n"))
    prefix_counts = grams.groupBy("w1").agg(
        F.count(F.lit(1)).alias("pre_n"))
    return (
        grams.join(bigram_counts, ["w1", "w2"])
        .join(prefix_counts, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (F.sum(F.log(F.col("big_n").cast("double")
                         / F.col("pre_n").cast("double")))
             / F.count(F.lit(1)).cast("double")).alias("avg_logprob"),
        )
    )


def tfidf_topk(df: DataFrame, k: int = 3, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Top-``k`` TF-IDF keywords per document — the cheap keyword
    extractor a corpus audit runs before anything embedding-based.

    ``idf = ln((n_docs + 1) / (df + 1)) + 1`` (smoothed, never
    negative), ``score = tf * idf``; ties break lexicographically so
    the result is fully deterministic. Plan shape: the postings pass
    (one scan + one groupBy), a vocabulary-sized df aggregate joined
    back on ``term`` (AQE picks broadcast when the vocab is small),
    one scalar n_docs broadcast, and a per-doc window for the top-k —
    every shuffle is keyed by term or doc, nothing is all-pairs.
    """
    from pyspark.sql import Window

    postings = doc_term_stats(df, id_col=id_col, text_col=text_col)
    dfreq = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"))
    n_docs = df.select(
        F.count(F.lit(1)).cast("double").alias("__n"))
    return _tfidf_score_tail(postings, dfreq, n_docs, k)


def _tfidf_score_tail(postings: DataFrame, dfreq: DataFrame,
                      n_docs: DataFrame, k: int) -> DataFrame:
    """Shared TF-IDF scoring tail: ``postings`` (doc_id, term, tf),
    ``dfreq`` (term, df), ``n_docs`` one row (__n double). Fresh and
    store-served paths both feed this — value-identical by
    construction."""
    from pyspark.sql import Window

    scored = (
        postings.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * (F.log((F.col("__n") + 1.0) / (F.col("df") + 1.0)) + 1.0))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "term", "score")
    )


def tfidf_topk_store(spark, path: str, k: int = 3) -> DataFrame:
    """TF-IDF top-k keywords served from the persisted retrieval
    index (:func:`bm25_index_init`): stored postings + stored
    (term, df) table + the stored raw doc count — no tokenize pass,
    no per-call df aggregate. Value-identical to ``tfidf_topk`` over
    the same corpus (same tail; ``n_docs_raw`` preserves tfidf's
    all-rows n_docs definition, zero-token docs included)."""
    postings, termdf, stats = bm25_index_read(spark, path)
    n_docs = stats.select(
        F.col("n_docs_raw").cast("double").alias("__n"))
    return _tfidf_score_tail(postings, termdf, n_docs, k)


# ---------------------------------------------------------------------------
# hybrid retrieval: reciprocal-rank fusion of ranked lists
# ---------------------------------------------------------------------------

def reciprocal_rank_fusion(
    ranked: list,
    k: int = 10,
    c: int = 60,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    round_digits: int = 9,
) -> "DataFrame":
    """Reciprocal-rank fusion (Cormack et al. 2009) of any number of
    ranked lists: ``rrf(d) = Σ_lists 1 / (c + rank_list(d))``, the
    standard score-free way to combine lexical (BM25) and dense (ANN)
    retrieval — the round-10 composition of :func:`bm25_topk` and the
    :mod:`lindel_spark.similarity` kNN family (round-9 verdict
    item 6).

    Each input needs (query_col, id_col, rank_col); documents missing
    from a list simply contribute nothing (no outer-join NULL
    handling — the union-of-contributions form). Plan: map-side
    projections unioned, ONE (query, doc)-keyed map-side-combined
    aggregate, one per-query window — every stage keyed, nothing
    broadcast, so it composes with distributed inputs of any size.

    Returns (query_id, rank, doc_id, rrf, n_lists), rank 1..k per
    query ordered by ``round(rrf, round_digits)`` descending with
    ascending doc-id tie-breaks — rounding makes the cut
    engine-replayable (rrf sums of 1/(c+rank) terms are exact-rational
    doubles, but disciplined rounding is the repo-wide comparator
    convention, see :func:`bm25_topk`)."""
    from functools import reduce

    from pyspark.sql import Window

    parts = [
        df.select(
            F.col(query_col).cast("long").alias("query_id"),
            F.col(id_col).cast("long").alias("doc_id"),
            (F.lit(1.0)
             / (F.lit(float(c)) + F.col(rank_col).cast("double")))
            .alias("contrib"),
        )
        for df in ranked
    ]
    u = reduce(lambda a, b: a.unionByName(b), parts)
    scored = u.groupBy("query_id", "doc_id").agg(
        F.sum("contrib").alias("rrf"),
        F.count(F.lit(1)).cast("long").alias("n_lists"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("rrf"), round_digits).desc(),
        F.col("doc_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long").alias("rank"),
                "doc_id", F.round("rrf", round_digits).alias("rrf"),
                "n_lists")
    )


# ---------------------------------------------------------------------------
# round 11: persisted + incremental retrieval index
# ---------------------------------------------------------------------------
# Every other heavy artifact in the repo (IVF cells, z-order
# manifests, MinHash gram stores, linkage masters) has a persisted +
# incremental store form; this closes the retrieval leg:
# ``bm25_topk``/``tfidf_topk`` recomputed postings + df/len stats per
# call. Layout mirrors write.zorder_store_* (write.py:414 — versioned
# dirs + an append-only commit log through the Hadoop FS shim, never
# an in-place rewrite):
#
#     path/_commits/v{N}      -> commit log (latest = max)
#     path/_META              -> tokenizer/id-col contract (once)
#     path/postings-v{N}/     -> (doc_id, term, tf, dl) parquet
#     path/postings-tail/     -> per-append postings part files
#     path/termdf-v{N}/       -> (term, df) document frequencies
#     path/termdf-tail/       -> per-append df DELTAS (algebraic)
#     path/stats-v{N}/        -> one row (n_docs, total_tokens)
#     path/stats-tail/        -> per-append stat DELTAS (algebraic)
#
# df and length stats are algebraic (counts/sums — the
# history.merge_agg_states pattern, history.py:98), so an append
# computes them for the NEW docs only and readers fold base + deltas
# with one group-by / one-row sum.


def _rstore_commits(path: str) -> str:
    from lindel_spark import fs as _fs
    return _fs.join(path, "_commits")


def _rstore_latest(spark, path: str) -> int | None:
    from lindel_spark import fs as _fs
    vs = _fs.committed_versions(spark, _rstore_commits(path))
    return vs[-1] if vs else None


def _corpus_stats(docs: DataFrame, id_col: str,
                  text_col: str) -> DataFrame:
    """One row (n_docs, total_tokens, n_docs_raw): ``n_docs`` counts
    docs with >= 1 token (bm25_topk's fresh-path definition, so store
    reads reproduce its avgdl bit-for-bit); ``n_docs_raw`` counts ALL
    rows (tfidf_topk's fresh-path n_docs, zero-token docs included).
    Both are algebraic, so appends ship them as deltas."""
    toks = tokens(normalize_text(F.col(text_col)))
    return (docs.select(F.size(toks).cast("long").alias("__dl"))
            .agg(F.sum(F.when(F.col("__dl") > 0, 1).otherwise(0))
                 .cast("long").alias("n_docs"),
                 F.sum(F.when(F.col("__dl") > 0, F.col("__dl"))
                       .otherwise(0))
                 .cast("long").alias("total_tokens"),
                 F.count(F.lit(1)).cast("long").alias("n_docs_raw")))


def bm25_index_init(docs: DataFrame, path: str, id_col: str = "doc_id",
                    text_col: str = "text") -> None:
    """Create the persisted retrieval index: postings + per-term df +
    corpus length stats, committed as version 0."""
    import json

    from lindel_spark import fs as _fs

    spark = docs.sparkSession
    post = doc_term_stats(docs, id_col, text_col)
    post.write.mode("overwrite").parquet(
        _fs.join(path, "postings-v0"))
    post_stored = spark.read.parquet(_fs.join(path, "postings-v0"))
    # df from the STORED postings (one term-keyed aggregate at build
    # time — queries then never pay the per-query df window/shuffle)
    post_stored.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    ).write.mode("overwrite").parquet(_fs.join(path, "termdf-v0"))
    _corpus_stats(docs, id_col, text_col).write.mode(
        "overwrite").parquet(_fs.join(path, "stats-v0"))
    _fs.commit_new(spark, _fs.join(path, "_META"),
                   json.dumps({"id_col": id_col,
                               "text_col": text_col}))
    _fs.commit_new(spark, _fs.join(_rstore_commits(path), "v0"))


def bm25_index_append(docs_new: DataFrame, path: str,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> None:
    """Incremental append of NEW documents (new doc ids — updates
    need a rebuild): postings for the new docs land in the tail, and
    the df / length stats land as algebraic DELTAS computed from the
    new docs ONLY — no rescan of the resident corpus. Multi-writer
    safe the same way zorder_store_append is: data first, deltas
    after, every append its own part files."""
    from lindel_spark import fs as _fs

    post = doc_term_stats(docs_new, id_col, text_col)
    post.write.mode("append").parquet(
        _fs.join(path, "postings-tail"))
    post.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    ).write.mode("append").parquet(_fs.join(path, "termdf-tail"))
    _corpus_stats(docs_new, id_col, text_col).write.mode(
        "append").parquet(_fs.join(path, "stats-tail"))


def bm25_index_read(spark, path: str) -> tuple[DataFrame, DataFrame,
                                               DataFrame]:
    """(postings, termdf, stats) with tails folded in: postings =
    base ∪ tail; termdf = base + deltas summed per term; stats = one
    row (n_docs, avgdl) from the summed deltas."""
    from lindel_spark import fs as _fs

    v = _rstore_latest(spark, path)
    if v is None:
        raise FileNotFoundError(f"LINDEL: no retrieval index at {path}")

    def _with_tail(name: str) -> DataFrame:
        out = spark.read.parquet(_fs.join(path, f"{name}-v{v}"))
        tail = _fs.list_files(spark, _fs.join(path, f"{name}-tail"))
        if tail:
            out = out.unionByName(spark.read.parquet(*tail))
        return out

    postings = _with_tail("postings")
    termdf = _with_tail("termdf").groupBy("term").agg(
        F.sum("df").cast("long").alias("df"))
    stats = _with_tail("stats").agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("total_tokens").cast("long").alias("total_tokens"),
        F.sum("n_docs_raw").cast("long").alias("n_docs_raw"),
    ).select(
        "n_docs",
        (F.col("total_tokens").cast("double")
         / F.col("n_docs").cast("double")).alias("avgdl"),
        "n_docs_raw",
    )
    return postings, termdf, stats


def bm25_index_maintain(spark, path: str,
                        tail_ratio: float = 0.1) -> dict:
    """Fold the tails into a new version when they exceed
    ``tail_ratio`` of the base postings bytes (same amortization
    contract as zorder_store_maintain: O(log) rewrites per corpus
    doubling). Keeps the previous version for time-travel; deletes
    exactly the tail files it folded (a concurrent append's files are
    never lost — they simply stay in the tail)."""
    from lindel_spark import fs as _fs

    v = _rstore_latest(spark, path)
    if v is None:
        raise FileNotFoundError(f"LINDEL: no retrieval index at {path}")
    snap = {
        name: sorted(_fs.list_files(spark,
                                    _fs.join(path, f"{name}-tail")))
        for name in ("postings", "termdf", "stats")
    }
    base_b, _ = _fs.du_suffix(spark, _fs.join(path, f"postings-v{v}"))
    tail_b = sum(_fs.du_suffix(spark, f)[0] for f in snap["postings"])
    if not snap["postings"] or tail_b < tail_ratio * max(base_b, 1):
        return {"rewritten": False, "version": v,
                "tail_bytes": tail_b, "base_bytes": base_b}
    nv = v + 1

    def _fold(name: str, agg):
        cur = spark.read.parquet(_fs.join(path, f"{name}-v{v}"))
        if snap[name]:
            cur = cur.unionByName(spark.read.parquet(*snap[name]))
        agg(cur).write.mode("overwrite").parquet(
            _fs.join(path, f"{name}-v{nv}"))

    _fold("postings", lambda d: d)
    _fold("termdf", lambda d: d.groupBy("term").agg(
        F.sum("df").cast("long").alias("df")))
    _fold("stats", lambda d: d.agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("total_tokens").cast("long").alias("total_tokens"),
        F.sum("n_docs_raw").cast("long").alias("n_docs_raw")))
    _fs.commit_new(spark, _fs.join(_rstore_commits(path), f"v{nv}"))
    for name in ("postings", "termdf", "stats"):
        for f in snap[name]:
            _fs.delete(spark, f, recursive=False)
    return {"rewritten": True, "version": nv,
            "tail_bytes": tail_b, "base_bytes": base_b}


def bm25_topk_store(spark, path: str, queries: DataFrame, k: int = 10,
                    k1: float = BM25_K1, b: float = BM25_B,
                    query_id_col: str = "query_id",
                    query_col: str = "query",
                    rank_round: int | None = None) -> DataFrame:
    """BM25 top-k served from the persisted index: no tokenize pass,
    no corpus scan beyond the term-filtered postings read, and df
    comes from the stored (term, df) table instead of the per-query
    window — the aggregates a fresh call pays per query were paid
    once at build/append time. Value-identical to
    ``bm25_topk(docs, queries, ...)`` over the same corpus (shared
    scoring tail; pytest- and oracle-pinned)."""
    postings, termdf, stats = bm25_index_read(spark, path)
    qterms = queries.select(
        F.col(query_id_col).cast("long").alias("query_id"),
        F.explode(tokens(normalize_text(F.col(query_col))))
        .alias("term"),
    ).distinct()
    matched = (
        postings.join(F.broadcast(qterms.select("term").distinct()),
                      "term")
        .join(termdf, "term")
    )
    return _bm25_score_tail(matched, qterms, stats, k, k1, b,
                            rank_round)


def trigram_backoff_logprob(
    model: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.4,
) -> DataFrame:
    """Per-document mean trigram STUPID-BACKOFF log-score of
    ``target`` under a model trained on ``model`` — the
    reference-corpus perplexity filter (CCNet-style: score crawl text
    under a clean-corpus LM, drop the worst tail). Unlike
    :func:`bigram_logprob`'s self-scored ML, the model and scored
    corpora are DIFFERENT frames, so unseen n-grams are the normal
    case and the score backs off:

    - trigram seen:      ``c3(w1,w2,w3) / p2(w1,w2)``
    - else bigram seen:  ``alpha   · c2(w2,w3) / p1(w2)``
    - else:              ``alpha^2 · (c1(w3) + 1) / (N + V)``

    (Brants et al. 2007 stupid backoff; the final unigram level is
    Laplace-floored so every position scores finite, and each level's
    denominator counts PREFIX occurrences at that gram order so seen
    levels are exact ML.) Returns ``(doc_id, n_trigrams,
    avg_logscore)``; target docs with < 3 tokens drop out.

    Shape: map-side gram explodes on both frames, vocabulary-sized
    model count tables, then term-keyed LEFT joins of target trigrams
    against the four count tables plus one broadcast (N, V) row — the
    same aligned-aggregation plan family as BM25; nothing row-scale
    shuffles except the gram stream itself.
    """
    def _toks(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            tokens(normalize_text(F.col(text_col))).alias("__toks"))

    def _trigrams(df: DataFrame) -> DataFrame:
        base = _toks(df).filter(F.size("__toks") >= 3)
        pairs = F.zip_with(
            "__toks",
            F.slice("__toks", 2,
                    F.greatest(F.size("__toks") - 1, F.lit(1))),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")))
        tris = F.slice(
            F.zip_with(
                pairs,
                F.slice("__toks", 3,
                        F.greatest(F.size("__toks") - 2, F.lit(1))),
                lambda p, c: F.struct(p["w1"].alias("w1"),
                                      p["w2"].alias("w2"),
                                      c.alias("w3"))),
            1, F.size("__toks") - 2)
        return (base.select("doc_id", F.explode(tris).alias("g"))
                .select("doc_id", "g.w1", "g.w2", "g.w3"))

    # ALL SIX model count tables roll up from ONE positional gram
    # table: per token position i the row is (w1=toks[i],
    # w2=toks[i+1] or null, w3=toks[i+2] or null), pre-aggregated to
    # distinct-gram counts. Every level is an exact re-aggregation —
    # trigram rows are the positions with w3 set, bigram rows the
    # positions with w2 set, unigram rows all positions — so each
    # count below is the same integer the per-order explodes
    # produced, while the model corpus is scanned + tokenized ONCE
    # (the six derived aggregates share the t3 exchange, which the
    # engine reuses; before, the trigram/bigram/unigram explodes were
    # three structurally different subtrees and the corpus was
    # re-scanned for each aggregate pair — 6 passes).
    mpos = (_toks(model).filter(F.size("__toks") >= 1)
            .select(F.explode(F.transform(
                "__toks",
                lambda x, i: F.struct(
                    x.alias("w1"),
                    F.get("__toks", i + F.lit(1)).alias("w2"),
                    F.get("__toks", i + F.lit(2)).alias("w3"))))
                .alias("g"))
            .select("g.w1", "g.w2", "g.w3"))
    t3 = mpos.groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).cast("long").alias("__cnt"))
    c3 = (t3.filter(F.col("w3").isNotNull())
          .select("w1", "w2", "w3", F.col("__cnt").alias("c3")))
    p2 = (t3.filter(F.col("w3").isNotNull())
          .groupBy("w1", "w2")
          .agg(F.sum("__cnt").cast("long").alias("p2")))
    c2 = (t3.filter(F.col("w2").isNotNull())
          .groupBy(F.col("w1").alias("w2"), F.col("w2").alias("w3"))
          .agg(F.sum("__cnt").cast("long").alias("c2")))
    p1 = (t3.filter(F.col("w2").isNotNull())
          .groupBy(F.col("w1").alias("w2"))
          .agg(F.sum("__cnt").cast("long").alias("p1")))
    c1 = (t3.groupBy(F.col("w1").alias("w3"))
          .agg(F.sum("__cnt").cast("long").alias("c1")))
    # (N, V) fold over c1 — V = c1's row count, N = its sum (c1 has
    # exactly one row per distinct unigram) — instead of a second
    # countDistinct pass over the t3 exchange. Same integers.
    nv = c1.agg(F.sum("c1").cast("long").alias("n_total"),
                F.count(F.lit(1)).cast("long").alias("v_total"))

    tt = _trigrams(target)
    a = float(alpha)
    score = F.when(
        F.col("c3").isNotNull(),
        F.col("c3").cast("double") / F.col("p2").cast("double"),
    ).when(
        F.col("c2").isNotNull(),
        F.lit(a) * F.col("c2").cast("double")
        / F.col("p1").cast("double"),
    ).otherwise(
        F.lit(a * a)
        * (F.coalesce(F.col("c1"), F.lit(0)).cast("double") + F.lit(1.0))
        / (F.col("n_total").cast("double")
           + F.col("v_total").cast("double")))
    return (tt.join(c3, ["w1", "w2", "w3"], "left")
            .join(p2, ["w1", "w2"], "left")
            .join(c2, ["w2", "w3"], "left")
            .join(p1, ["w2"], "left")
            .join(c1, ["w3"], "left")
            .crossJoin(F.broadcast(nv))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_trigrams"),
                 (F.sum(F.log(score))
                  / F.count(F.lit(1)).cast("double"))
                 .alias("avg_logscore")))


def retrieval_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str | None = None,
) -> DataFrame:
    """Standard ranked-retrieval evaluation per query:
    ``(query_id, n_rel, n_hits, recall_k, mrr_k, ndcg_k)`` — the
    measurement leg the BM25 / TF-IDF / hybrid-RRF / ANN stack here
    needs before any of them is tuned. ``results`` is any ranked
    frame (what the top-k operators emit); ``qrels`` the judgments
    ``(query_id, doc_id[, rel])`` with graded relevance when
    ``rel_col`` is set, binary otherwise.

    - ``recall_k``: judged docs retrieved in the top k / judged docs
    - ``mrr_k``: 1/rank of the first relevant hit (0 if none)
    - ``ndcg_k``: Σ (2^rel − 1)/log2(rank+1) over hits, normalized
      by the ideal DCG of the top-k judgments ranked rel-desc
      (ties on ascending doc id — deterministic)

    Queries present in ``qrels`` but missing from ``results`` score
    zeros (they ARE failures); log2 is spelled ``ln(x)/ln(2)`` so
    every engine computes the identical expression. Shape: one
    (query, doc)-keyed hit join + two query-keyed aggregates + one
    window over qrels partitions (bounded by judgments per query,
    never corpus-sized).
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError("k must be >= 1")
    rel = (F.col(rel_col).cast("double") if rel_col is not None
           else F.lit(1.0))
    q = qrels.select(F.col(query_col).alias("query_id"),
                     F.col(doc_col).alias("doc_id"),
                     rel.alias("rel"))
    r = results.select(F.col(query_col).alias("query_id"),
                       F.col(doc_col).alias("doc_id"),
                       F.col(rank_col).alias("rank")) \
        .filter(F.col("rank") <= k)
    ln2 = F.log(F.lit(2.0))
    gain = lambda relc, pos: ((F.pow(F.lit(2.0), relc) - F.lit(1.0))  # noqa: E731
                              / (F.log(pos.cast("double") + F.lit(1.0))
                                 / ln2))
    w = Window.partitionBy("query_id").orderBy(
        F.col("rel").desc(), F.col("doc_id").asc())
    ideal = (q.withColumn("__rn", F.row_number().over(w))
             .filter(F.col("__rn") <= k)
             .groupBy("query_id")
             .agg(F.sum(gain(F.col("rel"), F.col("__rn")))
                  .alias("idcg")))
    per_q = q.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rel"))
    hits = (r.join(q, ["query_id", "doc_id"])
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_hits"),
                 F.min("rank").alias("__first"),
                 F.sum(gain(F.col("rel"), F.col("rank")))
                 .alias("__dcg")))
    return (per_q.join(F.broadcast(ideal), "query_id")
            .join(hits, "query_id", "left")
            .select(
                "query_id", "n_rel",
                F.coalesce("n_hits", F.lit(0)).cast("long")
                .alias("n_hits"),
                (F.coalesce("n_hits", F.lit(0)).cast("double")
                 / F.col("n_rel").cast("double")).alias("recall_k"),
                F.coalesce(F.lit(1.0)
                           / F.col("__first").cast("double"),
                           F.lit(0.0)).alias("mrr_k"),
                F.coalesce(F.col("__dcg") / F.col("idcg"),
                           F.lit(0.0)).alias("ndcg_k")))


def dirichlet_ql_topk(docs: DataFrame, queries: DataFrame,
                      k: int = 10, mu: float = 2000.0,
                      id_col: str = "doc_id", text_col: str = "text",
                      query_id_col: str = "query_id",
                      query_col: str = "query",
                      rank_round: int | None = None) -> DataFrame:
    """Dirichlet-smoothed query-likelihood top-``k`` (Zhai & Lafferty
    2004) — the language-modeling alternative to :func:`bm25_topk`
    on the same contract: ``score(q,d) = Σ_{t∈q} ln((tf_td + μ·p_t)
    / (dl_d + μ))`` with ``p_t`` the collection unigram probability.
    Computed via the paper's sparse decomposition ``Σ_matched ln(1 +
    tf·T/(μ·cf_t)) + n_q · ln(μ/(dl_d+μ)) + Σ_t ln(p_t)`` (T =
    corpus tokens, cf = collection frequency, n_q = the query's
    distinct IN-CORPUS terms; the last term is doc-independent and
    folds in per query, so the returned score IS the true
    log-likelihood, not just rank-equivalent), so only matched postings plus one per-doc constant are
    touched — out-of-vocabulary query terms drop, candidates are
    docs matching ≥ 1 term, exactly the BM25 plan shape (broadcast
    query vocabulary inside the scan stage, term-keyed window for
    cf). Ties break by ascending ``doc_id``; pass ``rank_round`` for
    cross-engine-stable cuts (the bm25_topk contract).
    """
    from pyspark.sql.window import Window

    qterms = queries.select(
        F.col(query_id_col).cast("long").alias("query_id"),
        F.explode(tokens(normalize_text(F.col(query_col))))
        .alias("term")).distinct()
    exploded = _exploded_terms(docs, id_col, text_col)
    matched = exploded.join(
        F.broadcast(qterms.select("term").distinct()), "term"
    ).groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf"),
        F.first("dl").alias("dl"))
    stats = (docs.select(
        F.size(tokens(normalize_text(F.col(text_col))))
        .cast("long").alias("__dl"))
        .filter(F.col("__dl") > 0)
        .agg(F.sum("__dl").cast("double").alias("total_tokens")))
    matched = matched.withColumn(
        "cf", F.sum("tf").over(Window.partitionBy("term")))
    part = (matched.join(qterms, "term")
            .crossJoin(F.broadcast(stats))
            .groupBy("query_id", "doc_id")
            .agg(F.sum(F.log(
                1.0 + F.col("tf").cast("double")
                * F.col("total_tokens")
                / (F.lit(float(mu))
                   * F.col("cf").cast("double")))).alias("__mp"),
                F.first("dl").alias("dl")))
    tdim = (matched.select("term", "cf").distinct()
            .crossJoin(F.broadcast(stats)))
    nq = (qterms.join(tdim, "term")
          .groupBy("query_id")
          .agg(F.count(F.lit(1)).cast("long").alias("__nq"),
               F.sum(F.log(F.col("cf").cast("double")
                           / F.col("total_tokens"))).alias("__lp")))
    scored = (part.join(nq, "query_id")
              .withColumn(
                  "score",
                  F.col("__mp") + F.col("__lp")
                  + F.col("__nq").cast("double")
                  * F.log(F.lit(float(mu))
                          / (F.col("dl").cast("double")
                             + F.lit(float(mu))))))
    rank_by = (F.round("score", rank_round)
               if rank_round is not None else F.col("score"))
    w = Window.partitionBy("query_id").orderBy(
        rank_by.desc(), F.col("doc_id"))
    return (scored
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "doc_id", "score"))


def tfidf_cosine_pairs(
    docs: DataFrame,
    threshold: float = 0.6,
    max_df: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int | None = 6,
) -> DataFrame:
    """Sparse all-pairs TF-IDF cosine similarity join: document pairs
    ``(a, b, cosine)`` with ``a < b`` and cosine ≥ ``threshold`` over
    ln-idf-weighted term vectors — the LEXICAL near-dup/similarity
    join beside the embedding-space ones
    (:func:`lindel_spark.similarity.semantic_dup_pairs`) and the
    unweighted set-similarity join
    (:func:`lindel_spark.dedup.setsim_join` family): weighting by
    idf means two docs sharing rare terms score higher than two
    sharing boilerplate.

    Plan: postings (one corpus scan, map-side-combined), df via a
    term-keyed window, then the classic term-keyed pair join — pair
    volume is ``Σ_t df(t)²``, so terms with ``df > max_df`` are
    DROPPED from the vector space before pairing (the standard
    high-df cut in sparse all-pairs similarity: ubiquitous terms
    carry ~zero idf weight but quadratic pair cost; norms are taken
    over the KEPT space so cosine stays a true cosine there). The
    threshold compares ``round(cos, round_to)`` so the cut is
    summation-order-stable across engines.
    """
    from pyspark.sql.window import Window

    postings = (_exploded_terms(docs, id_col, text_col)
                .groupBy("doc_id", "term")
                .agg(F.count(F.lit(1)).cast("long").alias("tf")))
    n_docs = (docs.select(F.col(id_col)).agg(
        F.count(F.lit(1)).cast("double").alias("n_docs")))
    postings = postings.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term")))
    kept = (postings.filter(F.col("df") <= F.lit(int(max_df)))
            .crossJoin(F.broadcast(n_docs))
            .withColumn("w", F.col("tf").cast("double")
                        * F.log(F.col("n_docs")
                                / F.col("df").cast("double"))))
    norms = kept.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm"))
    a = kept.select(F.col("doc_id").alias("a"), "term",
                    F.col("w").alias("wa"))
    b = kept.select(F.col("doc_id").alias("b"), "term",
                    F.col("w").alias("wb"))
    dots = (a.join(b, "term")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot")))
    na = norms.select(F.col("doc_id").alias("a"),
                      F.col("norm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("b"),
                      F.col("norm").alias("nb"))
    cos = (dots.join(na, "a").join(nb, "b")
           .withColumn("cosine",
                       F.col("dot") / (F.col("na") * F.col("nb"))))
    cut = (F.round("cosine", round_to) if round_to is not None
           else F.col("cosine"))
    return (cos.filter((F.col("na") > 0) & (F.col("nb") > 0)
                       & (cut >= F.lit(float(threshold))))
            .select("a", "b", "cosine"))


def rank_biased_overlap(
    rank_a: DataFrame,
    rank_b: DataFrame,
    item_col: str = "item",
    rank_col: str = "rank",
    p: float = 0.9,
    depth: int = 100,
) -> DataFrame:
    """Truncated rank-biased overlap (Webber, Moffat & Zobel 2010)
    between two rankings: one row ``(depth, overlap_at_depth,
    rbo)`` with ``RBO@D = (1−p)/(1−p^D·(1−p)·…)``-normalized — here
    the standard truncated form ``(1−p) Σ_{d≤D} p^{d−1}·|A_d∩B_d|/d``
    — the top-weighted agreement score for comparing two retrieval/
    ranking runs (Spearman treats all ranks equally; RBO's geometric
    weights match how users read result lists). ``p`` sets the
    top-weighting (0.9 ≈ the first 10 ranks carry ~86 % of the
    weight).

    Plan: an item contributes to every depth ``d ≥ max(rank_a,
    rank_b)``, so the per-depth overlap is a CUMULATIVE count over
    ``max(ra, rb)`` — one equi-join on item, one distinct-depth
    count table, the distributed prefix sum, and a closed-form
    weighted tail sum over a broadcast depth-literal frame —
    BOTH sides of the depth range join are ≤ ``depth`` rows by
    construction, so the nested-loop there is a constant-size
    broadcast, never data-scale. Ranks must be 1-based and
    duplicate-free per side (the caller's row_number contract).
    """
    if not 0.0 < p < 1.0:
        raise ValueError("p must be in (0, 1)")
    if depth < 1:
        raise ValueError("depth must be >= 1")
    a = rank_a.select(F.col(item_col).alias("item"),
                      F.col(rank_col).cast("long").alias("ra"))
    b = rank_b.select(F.col(item_col).alias("item"),
                      F.col(rank_col).cast("long").alias("rb"))
    both = (a.join(b, "item")
            .select(F.greatest("ra", "rb").alias("m"))
            .filter(F.col("m") <= depth))
    entry = both.groupBy("m").agg(
        F.count(F.lit(1)).cast("long").alias("c"))
    spark = rank_a.sparkSession
    depths = spark.range(1, depth + 1).select(
        F.col("id").alias("d"),
        (F.pow(F.lit(p), F.col("id").cast("double") - 1.0)
         / F.col("id").cast("double")).alias("wd"))
    # overlap_at(d) = Σ_{m<=d} c(m); rbo = (1-p)·Σ_d wd·overlap_at(d)
    joined = depths.join(F.broadcast(entry),
                         F.col("m") <= F.col("d"), "left")
    per_d = joined.groupBy("d", "wd").agg(
        F.sum(F.coalesce(F.col("c"), F.lit(0))).alias("ov"))
    out = per_d.agg(
        F.lit(depth).cast("long").alias("depth"),
        F.max(F.when(F.col("d") == depth, F.col("ov")))
        .cast("long").alias("overlap_at_depth"),
        ((1.0 - p) * F.sum(F.col("wd") * F.col("ov").cast("double")))
        .alias("rbo"))
    return out


def phrase_search(
    docs: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact multi-word phrase search over positional postings:
    documents containing the (normalized) token sequence ``phrase``
    contiguously, returned as ``(doc_id, n_matches)`` — the
    capability a bag-of-words index can't answer (BM25/TF-IDF score
    term SETS; "new york" ≠ "york new"). Standard positional
    inverted-index semantics.

    Plan: the corpus explodes ONCE to (doc_id, pos, term) positional
    postings filtered to the phrase's terms inside the scan stage
    (the bm25 broadcast-vocabulary trick, so the shuffle is bounded
    by phrase-term postings, never the corpus vocabulary); the i-th
    phrase term joins at offset ``pos − i`` and a doc matches where
    all terms land — expressed as one groupBy on (doc, anchor
    position) counting distinct satisfied offsets. Adjacency is
    POSITION algebra, no string rescans.
    """
    terms = [t for t in phrase.lower().split() if t]
    if not terms:
        raise ValueError("phrase must contain at least one token")
    toks = tokens(normalize_text(F.col(text_col)))
    pos = (docs.select(F.col(id_col).cast("long").alias("doc_id"),
                       F.posexplode(toks).alias("pos", "term"))
           .filter(F.col("term").isin(terms)))
    offsets = {t: [i for i, tt in enumerate(terms) if tt == t]
               for t in set(terms)}
    # anchor = pos - offset for every offset the term occupies
    anchor_rows = None
    for t, offs in offsets.items():
        for i in offs:
            r = (pos.filter(F.col("term") == t)
                 .select("doc_id",
                         (F.col("pos") - F.lit(i)).alias("anchor"),
                         F.lit(i).alias("slot")))
            anchor_rows = r if anchor_rows is None \
                else anchor_rows.unionByName(r)
    hits = (anchor_rows.filter(F.col("anchor") >= 0)
            .groupBy("doc_id", "anchor")
            .agg(F.countDistinct("slot").alias("__k"))
            .filter(F.col("__k") == len(terms)))
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"))
