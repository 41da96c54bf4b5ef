"""Sequence packing for training-example assembly.

LLM training consumes fixed-size token windows; the pipeline step that
turns a filtered document set into training examples must assign each
document to a pack ("bin") deterministically, reproducibly across
engines and partitionings.

This implements *contiguous-fill* packing: documents are laid out in a
deterministic order within each group and cut into bins of ``budget``
tokens by cumulative position. That is the strategy that scales — a
true best-fit/first-fit packer is inherently sequential over the whole
corpus, while contiguous fill is one window function: shuffle on the
group key, sort within group, prefix-sum. Groups (source, shard, ...)
are independent, so a 100 TB corpus packs with per-group parallelism
and zero driver involvement.

A document longer than ``budget`` still gets a bin (where its first
token lands); truncate or split oversized docs upstream if exact
per-bin capacity matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    group_col: str = "source",
    order_col: str | list[str] = "doc_id",
) -> DataFrame:
    """Assign each row a pack id: ``bin = floor(tokens_before / budget)``
    within ``group_col``, ordered by ``order_col`` (a column name or a
    list of names — e.g. ``["doc_id", "chunk_id"]`` when packing
    chunked documents).

    Deterministic under any input partitioning (the window's
    shuffle+sort canonicalizes layout). One shuffle total. For a
    corpus with one giant group, pre-shard the group key first —
    within-group packing is sequential by construction.
    """
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    w = (
        Window.partitionBy(group_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    before = F.sum(token_col).over(w) - F.col(token_col)
    return df.withColumn(
        "bin", F.floor(before / F.lit(budget)).cast("long"))


def chunk_documents(
    df: DataFrame,
    max_tokens: int,
    overlap: int = 0,
    text_col: str = "text",
) -> DataFrame:
    """Split each document into whitespace-token chunks of at most
    ``max_tokens`` tokens, consecutive chunks sharing ``overlap``
    tokens of left context — the upstream complement of
    :func:`pack_sequences` for docs longer than the training window.

    Chunk ``i`` covers tokens ``[i*step, i*step + max_tokens)`` with
    ``step = max_tokens - overlap``; the chunk count is
    ``ceil((n_tokens - overlap) / step)`` (min 1, so short and even
    empty docs yield exactly one chunk and no row is silently lost).
    Output: every input column except ``text_col`` (metadata like
    ``source`` rides along onto each chunk row, so downstream mixture
    / packing groups still work), plus ``(chunk_id, chunk_text,
    n_chunk_tokens)``.

    Scale: pure per-row column algebra — ``sequence`` + ``posexplode``
    + ``slice``; zero shuffles, no window, no Python
    (tests/test_plans.py asserts the no-Exchange plan). Output rows ≈
    corpus tokens / step, produced map-side wherever the scan runs.
    """
    if overlap >= max_tokens:
        raise ValueError(
            f"LINDEL: overlap ({overlap}) must be < max_tokens "
            f"({max_tokens})")
    step = max_tokens - overlap
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))
    n = F.size(toks)
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((n - F.lit(overlap)).cast("double") / F.lit(step)).cast("int"),
    )
    carry = [c for c in df.columns if c != text_col]
    chunked = df.select(
        *carry,
        toks.alias("__toks"),
        F.posexplode(F.sequence(F.lit(1), n_chunks)).alias("chunk_id", "_x"),
    )
    piece = F.slice(
        F.col("__toks"), F.col("chunk_id") * step + 1, max_tokens)
    return chunked.select(
        *carry,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
    )


def length_bucketed_batches(
    df: DataFrame,
    id_col: str,
    len_col: str,
    bucket_width: int = 64,
    batch_size: int = 32,
) -> DataFrame:
    """Length-bucketed training batches: rows land in a width-
    ``bucket_width`` length bucket, then consecutive runs of
    ``batch_size`` (ordered by length, id-tie-broken) form batches —
    the standard padding-waste reducer for padded-batch training
    (every batch pads to ITS max, so batching similar lengths turns
    O(maxlen) waste into O(bucket_width)).

    Scale shape: bucketing is map-only; the within-bucket order comes
    from ONE :func:`lindel_spark.util.global_rank` over
    (bucket, len, id) — a bucket is a contiguous rank range under
    that total order, so per-bucket positions are ``rank − the
    bucket's min rank``, recovered by a bucket-count-bounded aggregate
    broadcast back. No per-bucket single-task window (a popular
    length bucket at 100 TB would funnel through one task), no
    skew ceiling beyond global_rank's range partitioning.

    Returns the assignment: (``id_col``, ``len_col``, bucket,
    batch_id, pos_in_batch) — batch_id globally unique as
    (bucket, local batch index) flattened; the last batch of a bucket
    may be short. Padding-waste accounting is one groupBy(batch_id)
    away (max(len)·n − sum(len)); kept out so callers join training
    metadata against the assignment directly.
    """
    from lindel_spark.util import global_rank

    if bucket_width <= 0 or batch_size <= 0:
        raise ValueError("LINDEL: bucket_width and batch_size must be "
                         "positive")
    base = df.select(
        F.col(id_col), F.col(len_col).cast("long").alias(len_col),
        (F.floor(F.col(len_col).cast("long") / bucket_width))
        .cast("long").alias("bucket"))
    r = global_rank(base, ["bucket", len_col, id_col],
                    out_col="__pos")
    mins = (r.groupBy("bucket")
            .agg(F.min("__pos").alias("__b0"),
                 F.count(F.lit(1)).alias("__bn")))
    j = r.join(F.broadcast(mins), "bucket")
    local = F.col("__pos") - F.col("__b0")          # 0-based in bucket
    batch_local = F.floor(local / batch_size).cast("long")
    return j.select(
        id_col, len_col, "bucket",
        (F.col("bucket") * F.lit(1 << 32) + batch_local)
        .cast("long").alias("batch_id"),
        (local % batch_size).cast("long").alias("pos_in_batch"),
    )
