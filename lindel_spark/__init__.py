"""lindel_spark — PySpark-native space-filling-curve engine.

A from-scratch reimplementation of the capabilities of the
Query-farm/lindel DuckDB extension (reference: /root/reference,
src/lindel_extension.cpp:948-1026 registration surface) as an idiomatic
PySpark library, plus large-scale data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing) built on the
same locality-preserving-key machinery.

Public surface:
    hilbert_encode / morton_encode / hilbert_decode / morton_decode
    morton_encode_native (pure-Column, whole-stage-codegen path)
    register(spark)  — SQL-name registration
    zorder_write(df, cols, path, ...)

Operator modules (import as submodules):
    lindel_spark.dedup       exact / MinHash-LSH / n-gram-Jaccard /
                             SimHash / sorted-neighborhood / exact
                             prefix-filter set-similarity join /
                             duplicated-span removal (one-shot and
                             incremental-vs-gram-store) /
                             quality-aware cluster survivors
    lindel_spark.similarity  exact + matmul + LSH-ANN + IVF cosine search,
                             distributed-query knn_join + knn_join_pq
                             (bounded entry points auto-route above a
                             size bound), distributed Lloyd refinement,
                             hard-negative mining, kNN label
                             propagation,
                             embedding normalize/quantize, IVF storage
    lindel_spark.text        token stats, quality, language ID, n-grams,
                             winnowing fingerprints + near-dup,
                             vocab coverage, boilerplate-line removal,
                             aggressive canonicalization
    lindel_spark.linkage     record linkage / entity resolution
                             (blocked multi-field weighted matching)
    lindel_spark.multimodal  binary payload columns, decode stages
    lindel_spark.streaming   curve-clustered sink, windowed rollups,
                             stateful first-seen dedup
    lindel_spark.joins       as-of, spatial range, interval-overlap,
                             bloom-filter runtime-filter semi-join
    lindel_spark.skew        salted join, two-phase distinct
    lindel_spark.sources     schema-disciplined CSV/JSONL/ORC readers+sinks
    lindel_spark.sampling    deterministic splits / k-fold / temporal
                             split with embargo / mixtures / weighted /
                             negative sampling / token-budget
                             mixture planning
    lindel_spark.retrieval   BM25, corpus LMs, TF-IDF keywords,
                             reciprocal-rank hybrid fusion
    lindel_spark.sketch      count-min, histogram/KLL quantiles,
                             KMV + deterministic HLL distinct
    lindel_spark.history     SCD2 builds, incremental agg maintenance
    lindel_spark.timeseries  OHLC resample, time-weighted average,
                             lag-k ACF, CUSUM change-points,
                             rolling z-score anomalies, seasonal
                             decomposition, EWMA, Holt-Winters
                             one-step forecast, Kaplan-Meier,
                             inter-arrival stats, gap report
    lindel_spark.graph       PageRank (uniform + personalized),
                             connected components, triangles,
                             bounded BFS + weighted SSSP,
                             label-propagation communities,
                             k-core, HITS, link prediction
    lindel_spark.profile     table profiling, expectations, k-anonymity,
                             file min/max manifest index + pruned reads,
                             per-file bloom index for point lookups
    lindel_spark.packing     sequence packing, document chunking,
                             length-bucketed batching
    lindel_spark.features    z-score / min-max / robust / quantile
                             normalization, target encoding,
                             one-pass correlation matrix
    lindel_spark.evaluation  exact ROC-AUC, Brier, calibration bins
    lindel_spark.rules       market-basket co-occurrence, association rules
    lindel_spark.fs          Hadoop-FileSystem shim for store metadata
                             (append-only version-log commits)
"""

from lindel_spark.functions import (
    hilbert_encode,
    morton_encode,
    hilbert_decode,
    morton_decode,
    morton_encode_native,
    morton_decode_native,
    register,
)
from lindel_spark.write import zorder_write

__version__ = "0.1.0"

__all__ = [
    "hilbert_encode",
    "morton_encode",
    "hilbert_decode",
    "morton_decode",
    "morton_encode_native",
    "morton_decode_native",
    "register",
    "zorder_write",
]
