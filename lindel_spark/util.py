"""Small shared planning helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame

_SIZE_SUFFIX = {"b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30,
                "t": 1 << 40}


def _parse_bytes(v: str) -> int:
    s = v.strip().lower()
    for suf in ("kb", "mb", "gb", "tb", "k", "m", "g", "t", "b"):
        if s.endswith(suf):
            return int(float(s[: -len(suf)]) * _SIZE_SUFFIX[suf[0]])
    return int(s)


def ensure_parallelism(df: DataFrame, factor: int = 1) -> DataFrame:
    """Repartition *up* to the cluster's parallelism if the source is
    too small to split (e.g. one small file read as a single task).

    Scale-safe by construction: a big input already splits into >=
    cores partitions and passes through untouched, so the shuffle this
    adds only ever moves a small input. Use ahead of CPU-heavy per-row
    stages (shingling, hashing, Python decode) where one under-split
    file would serialize the whole stage.

    The under-split check reads ``sizeInBytes`` from the *optimized
    logical plan's* statistics (catalog/file-listing based) — it never
    touches ``df.rdd``, which would force full physical planning and
    insert a deserialization barrier into the very lineage being
    inspected.
    """
    spark = df.sparkSession
    sc = spark.sparkContext
    target = sc.defaultParallelism * factor
    try:
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        max_pb = _parse_bytes(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
        est_partitions = max(1, size // max(1, max_pb))
        if est_partitions >= target:
            return df
    except Exception:
        # stats unavailable (e.g. Connect): pass through — never risk
        # adding a full shuffle to a frame we cannot size
        return df
    return df.repartition(target)
