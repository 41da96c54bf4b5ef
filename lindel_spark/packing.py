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
    order_col: str = "doc_id",
) -> DataFrame:
    """Assign each row a pack id: ``bin = floor(tokens_before / budget)``
    within ``group_col``, ordered by ``order_col``.

    Deterministic under any input partitioning (the window's
    shuffle+sort canonicalizes layout). One shuffle total. For a
    corpus with one giant group, pre-shard the group key first —
    within-group packing is sequential by construction.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    before = F.sum(token_col).over(w) - F.col(token_col)
    return df.withColumn(
        "bin", F.floor(before / F.lit(budget)).cast("long"))
