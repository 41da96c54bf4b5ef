"""The composed corpus-prep pipeline: quality gate → exact dedup →
deterministic split, as one call.

Every stage is an existing operator (text quality/repetition columns,
``dedup.exact_dedup``, ``sampling.deterministic_split``); this module
is the product face that chains them the way a training-data drop
actually flows. Plan shape: one map-only select (gate), one
fingerprint-keyed window (dedup), one map-only split assignment — two
scans' worth of work and a single shuffle end to end, scan-bound at
100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lindel_spark import text as LT
from lindel_spark.dedup import exact_dedup
from lindel_spark.sampling import deterministic_split


def prepare_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    quality_threshold: float = 0.75,
    max_top_bigram: float = 0.1,
    max_dup_5gram: float = 0.1,
    split_weights=(0.8, 0.1, 0.1),
) -> DataFrame:
    """Raw documents → training-ready rows: keep docs passing the
    quality + repetition gate, collapse exact duplicates (min-id
    survivor per normalized fingerprint), and assign the
    content-deterministic train/val/test split. Returns the surviving
    rows with ``quality`` and ``split`` columns added.

    Deterministic under any partitioning/engine (every stage is md5-
    or column-algebra-based), so the exact corpus is reproducible from
    the raw drop and the config alone.
    """
    c = F.col(text_col)
    q = LT.quality_score(c)
    gated = (
        docs.withColumn("quality", q)
        .filter(
            (F.col("quality") >= quality_threshold)
            & (LT.top_ngram_frac(c, 2) < max_top_bigram)
            & (LT.dup_ngram_frac(c, 5) < max_dup_5gram))
    )
    deduped = exact_dedup(gated, text_col=text_col, id_col=id_col)
    return deterministic_split(deduped, id_col, list(split_weights))
