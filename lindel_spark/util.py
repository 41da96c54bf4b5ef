"""Small shared planning helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, factor: int = 1) -> DataFrame:
    """Repartition *up* to the cluster's parallelism if the source has
    fewer partitions (e.g. one small file read as a single split).

    Scale-safe by construction: a big input already has >= cores
    partitions and passes through untouched, so the shuffle this adds
    only ever moves a small input. Use ahead of CPU-heavy per-row
    stages (shingling, hashing, Python decode) where one under-split
    file would serialize the whole stage.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
