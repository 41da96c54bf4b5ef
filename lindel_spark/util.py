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


def global_rank(df: DataFrame, order_cols, out_col: str = "rank",
                num_partitions: int | None = None) -> DataFrame:
    """1-based global rank of every row under a TOTAL order over
    ``order_cols`` — WITHOUT the single-task ``Window.orderBy``
    anti-pattern (an unpartitioned window funnels the entire dataset
    through one task; at 100 TB that is not slow, it is impossible).

    Plan shape: ONE range-partitioning shuffle
    (``repartitionByRange`` + ``sortWithinPartitions``), a map-only
    local enumeration (``mapInPandas`` with a per-partition running
    counter — batches arrive in partition order), one bounded
    ``groupBy(partition).count().collect()`` (rows == shuffle
    partition count, never data-sized), and a broadcast join of the
    cumulative offsets. Same shuffle volume as any global sort.

    ``order_cols`` must be a total order (no ties): append a unique id
    as the last column — with ties, which side of a range boundary a
    row lands on would change its rank run-to-run.

    The ranged frame is materialized ONCE via an eager
    ``localCheckpoint`` before the two downstream jobs (partition
    counts, enumeration). This is load-bearing, not an optimization:
    ``repartitionByRange`` samples its boundaries with a seed derived
    from the RDD id, so two *executions* of the same plan can place
    boundary rows in different partitions — offsets computed from one
    execution applied to another's enumeration silently corrupt ranks
    (caught by the sf1 value sweep, round 8). Checkpoint blocks are
    executor-local and freed by the ContextCleaner when the frame is
    garbage-collected; on executor loss the job fails and retries
    rather than recomputing inconsistently. For WIDE rows, rank a
    narrow (order cols + id) projection and join the rank back by id —
    see sorted_neighborhood_pairs for the pattern.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if isinstance(order_cols, str):
        order_cols = [order_cols]
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    if num_partitions is not None:
        ranged = df.repartitionByRange(num_partitions, *cols)
    else:
        ranged = df.repartitionByRange(*cols)
    ranged = ranged.sortWithinPartitions(*cols).withColumn(
        "__gr_pid", F.spark_partition_id())
    # one materialization for BOTH downstream jobs — see docstring
    ranged = ranged.localCheckpoint(eager=True)
    schema = T.StructType(
        list(ranged.schema.fields)
        + [T.StructField("__gr_local", T.LongType())])

    def enumerate_partition(batches):
        i = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf["__gr_local"] = range(i, i + len(pdf))
            i += len(pdf)
            yield pdf

    local = ranged.mapInPandas(enumerate_partition, schema)
    counts = sorted(
        (r["__gr_pid"], r["cnt"])
        for r in ranged.groupBy("__gr_pid")
        .agg(F.count(F.lit(1)).alias("cnt")).collect())
    offsets, acc = [], 0
    for pid, n in counts:
        offsets.append((pid, acc))
        acc += n
    spark = df.sparkSession
    off_df = F.broadcast(spark.createDataFrame(
        offsets or [(0, 0)], "__gr_pid int, __gr_off long"))
    return (
        local.join(off_df, "__gr_pid")
        .withColumn(out_col,
                    (F.col("__gr_off") + F.col("__gr_local") + 1))
        .drop("__gr_pid", "__gr_local", "__gr_off")
    )
