"""Cluster-preserving Parquet writes keyed on a space-filling curve.

This is the product the reference exists for (docs/README.md:51-72):
``ORDER BY hilbert_encode([...])`` before ``COPY TO ... PARQUET`` so
Parquet row-group min/max statistics cluster and scans skip row
groups.  On Spark the idiomatic, shuffle-bounded formulation is
``repartitionByRange(k, key).sortWithinPartitions(key)`` — a single
range-partitioning shuffle plus a per-partition external sort, which
scales to 1000-executor clusters (a global ``orderBy`` has the same
shuffle shape, but repartitionByRange + sortWithinPartitions makes the
file-per-partition layout explicit and lets callers pick ``k`` to
target their output file size).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lindel_spark.functions import (
    hilbert_encode,
    morton_encode,
    morton_encode_native,
)
from lindel_spark.types import elem_type, encode_output_bits

_KEY = "__lindel_zorder_key__"


def zorder_key(cols: Sequence, elem: str | None = "int32",
               curve: str = "hilbert", df: DataFrame | None = None) -> Column:
    """The sort-key Column for a z-order/hilbert clustering of ``cols``.

    Picks the cheapest bit-identical implementation: the pure-Column
    (whole-stage codegen) Morton path when legal, else the
    Arrow-vectorized pandas UDF.  For 128-bit keys the key is
    big-endian binary, whose lexicographic order equals unsigned
    numeric order, so range partitioning still clusters correctly.
    ``elem=None`` + ``df=`` infers the element type from the schema.
    """
    from lindel_spark.functions import _resolve_elem

    elem = _resolve_elem(list(cols), elem, df)
    et = elem_type(elem)
    total = encode_output_bits(et.bits, len(cols))
    if curve == "morton":
        if not et.is_float and total <= 64:
            return morton_encode_native(cols, elem)
        return morton_encode(list(cols), elem, output="auto")
    if curve != "hilbert":
        raise ValueError(f"LINDEL: unknown curve {curve!r}")
    return hilbert_encode(list(cols), elem, output="auto")


def _prepare_zorder_frame(
    df: DataFrame,
    cols: Sequence,
    elem,
    curve: str,
    num_files: int | None,
    partition_by: Sequence[str] | None,
    persist_key: bool,
) -> tuple[DataFrame, DataFrame]:
    """(keyed, ranged+sorted) frames behind :func:`zorder_write`.

    Split out so tests can assert the physical plan: with
    ``persist_key`` the range shuffle must read ``InMemoryTableScan``
    (one curve-key evaluation total), not re-run the encode UDF for
    the range sampler.
    """
    from pyspark import StorageLevel

    # NOTE round-7 finding (BASELINE.md): a pure-Column Hilbert state
    # machine (hilbert_encode_native) was measured here and REVERTED —
    # steady-state it is no faster than the Arrow UDF on parquet-scan
    # input (0.8s vs 0.7s at sf0.1) and the persist+range-shuffle
    # combination replans the 62-Project chain pathologically
    # (14.7s vs 2.7s for this write). The Arrow UDF stays the default.
    key = zorder_key(cols, elem, curve, df=df)
    keyed = df.withColumn(_KEY, key)
    if persist_key:
        # Deserialized level: the cache exists only for the duration of
        # one write (sampler job fills it, shuffle job drains it), so
        # paying columnar compression for it is pure overhead.
        keyed = keyed.persist(StorageLevel.MEMORY_AND_DISK_DESER)
    range_cols = (
        [F.col(c) for c in partition_by] if partition_by else []
    ) + [F.col(_KEY)]
    if num_files is not None:
        ranged = keyed.repartitionByRange(num_files, *range_cols)
    else:
        ranged = keyed.repartitionByRange(*range_cols)
    out = ranged.sortWithinPartitions(*range_cols).drop(_KEY)
    return keyed, out


def compact_parquet(
    spark,
    src_path: str,
    dst_path: str,
    target_file_mb: int = 512,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> dict:
    """Small-files compaction: rewrite a parquet dataset into
    ~``target_file_mb``-sized files, optionally re-clustered.

    Streaming sinks and incremental appends (e.g. :func:`ivf_append`,
    per-microbatch writers) accrete many small files; at cluster scale
    each file costs a task, a footer read, and a NameNode/listing
    entry, so scan throughput degrades long before data size does.
    This is the maintenance pass: file count is derived from the
    *actual on-disk bytes* (never a row-count guess, which breaks on
    wide rows), and with ``sort_cols`` the rewrite range-partitions +
    sorts so downstream scans also get row-group skipping — pass the
    same keys you'd give :func:`zorder_write` for 1-D predicates.

    Scale shape: one shuffle (round-robin ``repartition`` or range
    partition), no driver data path; the listing walk is
    metadata-only. Returns ``{files_before, files_after, bytes,
    rows}`` for audit logs.
    """
    from lindel_spark import fs as _fs

    total_bytes, files_before = _fs.du_suffix(spark, src_path)
    n_files = max(1, round(total_bytes / (target_file_mb * (1 << 20))))
    df = spark.read.parquet(src_path)
    if sort_cols:
        out = (df.repartitionByRange(n_files, *[F.col(c) for c in sort_cols])
               .sortWithinPartitions(*[F.col(c) for c in sort_cols]))
    else:
        out = df.repartition(n_files)
    out.write.mode(mode).parquet(dst_path)
    _after_bytes, files_after = _fs.du_suffix(spark, dst_path)
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes": total_bytes,
        "rows": spark.read.parquet(dst_path).count(),
    }


def zorder_write(
    df: DataFrame,
    cols: Sequence,
    path: str,
    elem: str | None = "int32",
    curve: str = "hilbert",
    num_files: int | None = None,
    mode: str = "overwrite",
    format: str = "parquet",
    partition_by: Sequence[str] | None = None,
    persist_key: bool = True,
    **writer_options,
) -> None:
    """Write ``df`` clustered along a space-filling curve over ``cols``.

    Equivalent of the reference's motivating recipe
    (docs/README.md:56-70) as one call:

        zorder_write(df, ["pickup_x", "pickup_y"], path, elem="int32")

    ``elem=None`` infers the element type from ``df.schema`` when
    ``cols`` are plain column names.

    ``num_files`` bounds output file count (defaults to Spark's
    shuffle parallelism).  The curve key is dropped before writing.

    With ``partition_by``, rows are hive-partitioned on those columns
    and curve-clustered *within* each partition: one range shuffle on
    (partition cols, key) keeps each task writing a contiguous slice
    of one partition directory — no small-files explosion, and range
    predicates get partition pruning AND row-group skipping.

    ``repartitionByRange`` derives its bounds by *sampling the child
    plan*, which would evaluate the (UDF-computed) curve key twice —
    once for the range sampler, once for the shuffle.  With
    ``persist_key`` (default) the keyed frame is cached before the
    range shuffle, so the sampling job fills the cache and the shuffle
    reads it: one encode pass total, at the cost of materializing the
    input once on executor-local storage.  Set ``persist_key=False``
    when local storage is the scarcer resource (e.g. very wide rows
    with a cheap native morton key, where re-scanning beats spilling
    the dataset to disk).
    """
    keyed, out = _prepare_zorder_frame(
        df, cols, elem, curve, num_files, partition_by, persist_key)
    writer = out.write.mode(mode).format(format)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in writer_options.items():
        writer = writer.option(k, v)
    try:
        writer.save(path)
    finally:
        if persist_key:
            keyed.unpersist()


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key_cols,
    delete_col: str | None = None,
) -> DataFrame:
    """MERGE INTO semantics over DataFrames: rows of ``updates``
    replace same-key rows of ``target`` (WHEN MATCHED THEN UPDATE),
    new keys are inserted (WHEN NOT MATCHED THEN INSERT), and — when
    ``delete_col`` names a boolean tombstone column on ``updates`` —
    matched keys whose update is a tombstone disappear (WHEN MATCHED
    AND delete THEN DELETE).

    Precondition: ``updates`` has at most one row per key (compact a
    changelog first with :func:`lindel_spark.dedup.latest_by_key`,
    which also produces the tombstone shape this consumes).

    Shape at scale: one anti-join keyed on ``key_cols`` plus a
    union — when ``updates`` is the typical small delta, Spark
    broadcasts it and the snapshot is rewritten in a single map-side
    pass with no shuffle of the target; a same-scale updates side
    degrades gracefully to a shuffled anti-join on the key.
    """
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    survivors = target.join(
        updates.select(*key_cols).distinct(), key_cols, "left_anti")
    live = updates
    if delete_col is not None:
        live = updates.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))).drop(delete_col)
    return survivors.unionByName(live)


def bucketed_write(
    df: DataFrame,
    table: str,
    bucket_cols,
    n_buckets: int,
    sort_cols=None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) Parquet
    table: rows are hash-partitioned into ``n_buckets`` files per
    partition by ``bucket_cols`` at write time.

    This is the co-location contract that removes the join shuffle:
    two tables bucketed on their join key with the SAME bucket count
    sort-merge-join with NO Exchange on either side — the dominant
    shuffle of a repeated big-to-big join is paid once at write time
    and amortized over every subsequent join/aggregation on that key
    (asserted plan-level in tests/test_bucketing_join.py). At 100 TB
    this is the difference between re-shuffling the fact table per
    query and never shuffling it.

    Bucketed data must go through the session catalog
    (``saveAsTable``); pass ``path`` to put the files somewhere
    explicit (e.g. a temp dir in tests) instead of the warehouse dir.
    """
    if isinstance(bucket_cols, str):
        bucket_cols = [bucket_cols]
    if isinstance(sort_cols, str):
        sort_cols = [sort_cols]
    w = (df.write.format("parquet").mode(mode)
         .bucketBy(n_buckets, *bucket_cols))
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols,
    compare_cols=None,
) -> DataFrame:
    """Row-level diff between two snapshots of a keyed table:
    returns (key..., status) with status in
    ``added | removed | changed | unchanged``.

    ``compare_cols`` defaults to every shared non-key column; rows
    compare NULL-safely (``<=>``). The data-ops audit step between
    pipeline runs — count the statuses to alert on unexpected churn,
    or filter ``status != 'unchanged'`` as a poor-man's CDC extract.

    One full-outer join keyed on ``key_cols`` — the same shuffle
    shape as the merge that produced the snapshot; AQE handles skew.
    """
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    if compare_cols is None:
        compare_cols = [c for c in old.columns
                        if c in set(new.columns) and c not in key_cols]
    o = old.select(*key_cols,
                   *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
                   F.lit(1).alias("__in_o"))
    n = new.select(*key_cols,
                   *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
                   F.lit(1).alias("__in_n"))
    j = o.join(n, key_cols, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    status = (
        F.when(F.col("__in_o").isNull(), F.lit("added"))
        .when(F.col("__in_n").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(*key_cols, status.alias("status"))


# ---------------------------------------------------------------------------
# incremental z-order store: append fast, re-cluster when degraded
# ---------------------------------------------------------------------------

def _zstore_marker(path: str) -> str:
    from lindel_spark import fs as _fs

    return _fs.join(path, "_LATEST")


def _zstore_latest(spark, path: str) -> int | None:
    from lindel_spark import fs as _fs

    m = _zstore_marker(path)
    if not _fs.exists(spark, m):
        return None
    return int(_fs.read_text(spark, m).strip())


def zorder_store_init(df: DataFrame, cols: Sequence, path: str,
                      **zorder_kwargs) -> None:
    """Create an incremental z-order store: a curve-clustered ``base``
    plus a ``tail`` for cheap appends. Layout::

        path/_LATEST      -> current base version (atomic marker)
        path/base-v{N}/   -> zorder_write output (clustered)
        path/tail/        -> plain appended parquet (unclustered)

    Versioned directories + marker rename, never in-place rewrites —
    the object-store-safe pattern (no atomic directory overwrite
    exists on S3-likes). All metadata I/O (marker, listings, sizing)
    goes through the Hadoop FileSystem API (:mod:`lindel_spark.fs`),
    so the store works on ``s3a://``/``hdfs://`` paths, not only
    where the driver mounts the executors' filesystem. The
    maintenance loop the reference's motivating workload needs in
    production: one big ORDER BY at ingest time is not a strategy
    when data keeps arriving.

    Writer contract: appends are multi-writer-safe (parquet append of
    distinct part files), but :func:`zorder_store_maintain` and this
    initializer assume a SINGLE maintainer at a time — concurrent
    maintenance needs a log-structured table format (Delta/Iceberg),
    out of scope here. Maintenance never loses concurrent appends
    (see :func:`zorder_store_maintain`'s tail snapshot).
    """
    from lindel_spark import fs as _fs

    spark = df.sparkSession
    zorder_write(df, cols, _fs.join(path, "base-v0"), **zorder_kwargs)
    _fs.write_text_atomic(spark, _zstore_marker(path), "0")


def zorder_store_append(df: DataFrame, path: str) -> None:
    """Fast append: plain parquet into ``tail/`` — no sort, no
    shuffle beyond the write itself. Reads stay correct (the store
    reader unions base + tail); only SKIPPING degrades until
    :func:`zorder_store_maintain` folds the tail in."""
    from lindel_spark import fs as _fs

    df.write.mode("append").parquet(_fs.join(path, "tail"))


def zorder_store_read(spark, path: str,
                      version: int | None = None) -> DataFrame:
    """Store contents: latest base ∪ tail (if any). Pass ``version``
    to time-travel to a retained earlier base (maintenance keeps the
    previous version; the tail is NOT applied to historical reads —
    it belongs to the current version's timeline)."""
    from lindel_spark import fs as _fs

    v = _zstore_latest(spark, path)
    if v is None:
        raise FileNotFoundError(f"LINDEL: no zorder store at {path}")
    if version is not None:
        vdir = _fs.join(path, f"base-v{version}")
        if not _fs.is_dir(spark, vdir):
            raise FileNotFoundError(
                f"LINDEL: version {version} not retained at {path}")
        return spark.read.parquet(vdir)
    out = spark.read.parquet(_fs.join(path, f"base-v{v}"))
    tail_files = _fs.list_files(spark, _fs.join(path, "tail"))
    if tail_files:
        out = out.unionByName(spark.read.parquet(*tail_files))
    return out


def zorder_store_maintain(spark, path: str, cols: Sequence,
                          tail_ratio: float = 0.1,
                          **zorder_kwargs) -> dict:
    """Re-cluster when the unsorted tail exceeds ``tail_ratio`` of the
    base bytes: base ∪ tail is rewritten curve-clustered into
    ``base-v{N+1}``, the marker flips atomically, and the old base +
    the folded tail files are removed. Below the threshold it is a
    no-op (the tail's skipping loss isn't worth a full rewrite yet) —
    amortized, the store is rewritten O(log) times per doubling, the
    standard compaction amortization.

    Concurrency: the tail file list is SNAPSHOTTED before the read —
    the rewrite folds exactly those files and deletes exactly those
    files, so rows appended by a concurrent
    :func:`zorder_store_append` between the read and the cleanup are
    never lost (they stay in the tail for the next maintenance pass).
    Only one maintainer may run at a time (single-writer marker; see
    :func:`zorder_store_init`).

    Returns stats: ``{"rewritten": bool, "base_bytes": int,
    "tail_bytes": int}``.
    """
    from lindel_spark import fs as _fs

    v = _zstore_latest(spark, path)
    if v is None:
        raise FileNotFoundError(f"LINDEL: no zorder store at {path}")
    base_dir = _fs.join(path, f"base-v{v}")
    tail_dir = _fs.join(path, "tail")
    bb, _nb = _fs.du_suffix(spark, base_dir)
    tb, _nt = _fs.du_suffix(spark, tail_dir)
    if tb == 0 or (bb > 0 and tb / bb < tail_ratio):
        return {"rewritten": False, "base_bytes": bb, "tail_bytes": tb}
    # snapshot the tail BEFORE reading: fold + delete exactly this set
    tail_files = _fs.list_files(spark, tail_dir)
    merged = spark.read.parquet(base_dir)
    if tail_files:
        merged = merged.unionByName(spark.read.parquet(*tail_files))
    new_base = _fs.join(path, f"base-v{v + 1}")
    zorder_write(merged, cols, new_base, **zorder_kwargs)
    _fs.write_text_atomic(spark, _zstore_marker(path), str(v + 1))
    # retain the immediately-previous base for time travel; prune older
    for d in _fs.list_names(spark, path):
        if d.startswith("base-v") and int(d.split("-v")[1]) < v:
            _fs.delete(spark, _fs.join(path, d), recursive=True)
    for f in tail_files:
        _fs.delete(spark, f, recursive=False)
    return {"rewritten": True, "base_bytes": bb, "tail_bytes": tb}


def zorder_store_select(spark, path: str, ranges: dict
                        ) -> tuple[DataFrame, dict]:
    """Range-predicate read of an incremental z-order store with
    FILE-level pruning: the curve-clustered base is pruned through a
    footer-only min/max manifest
    (:func:`lindel_spark.profile.file_minmax_manifest` — per-file
    stats are tight because the base is z-ordered), the unclustered
    tail is residual-scanned in full (it is small by the
    ``tail_ratio`` invariant), and both apply the exact row-level
    filter. This is the read path the store exists for: appends stay
    cheap, maintenance restores clustering, and range queries skip
    whole files on top of parquet's row-group skipping.

    ``ranges`` maps column -> (lo, hi) inclusive bounds (None open).
    Returns ``(df, stats)`` where stats carries the base's
    ``files_total`` / ``files_scanned`` for skip-ratio audits.
    """
    from lindel_spark import fs as _fs
    from lindel_spark.profile import (file_minmax_manifest,
                                      manifest_pruned_read)

    v = _zstore_latest(spark, path)
    if v is None:
        raise FileNotFoundError(f"LINDEL: no zorder store at {path}")
    base_dir = _fs.join(path, f"base-v{v}")
    manifest = file_minmax_manifest(spark, base_dir, list(ranges))
    out, stats = manifest_pruned_read(spark, base_dir, manifest, ranges)
    residual = F.lit(True)
    for c, (lo, hi) in ranges.items():
        if lo is not None:
            residual = residual & (F.col(c) >= F.lit(lo))
        if hi is not None:
            residual = residual & (F.col(c) <= F.lit(hi))
    tail_files = _fs.list_files(spark, _fs.join(path, "tail"))
    if tail_files:
        out = out.unionByName(
            spark.read.parquet(*tail_files).filter(residual))
    return out, stats
