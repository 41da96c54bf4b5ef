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


def zorder_key(cols: Sequence, elem="int32", curve: str = "hilbert") -> Column:
    """The sort-key Column for a z-order/hilbert clustering of ``cols``.

    Picks the cheapest bit-identical implementation: the pure-Column
    (whole-stage codegen) Morton path when legal, else the
    Arrow-vectorized pandas UDF.  For 128-bit keys the key is
    big-endian binary, whose lexicographic order equals unsigned
    numeric order, so range partitioning still clusters correctly.
    """
    et = elem_type(elem)
    total = encode_output_bits(et.bits, len(cols))
    if curve == "morton":
        if not et.is_float and total <= 64:
            return morton_encode_native(cols, elem)
        return morton_encode(list(cols), elem, output="auto")
    if curve != "hilbert":
        raise ValueError(f"LINDEL: unknown curve {curve!r}")
    return hilbert_encode(list(cols), elem, output="auto")


def zorder_write(
    df: DataFrame,
    cols: Sequence,
    path: str,
    elem="int32",
    curve: str = "hilbert",
    num_files: int | None = None,
    mode: str = "overwrite",
    format: str = "parquet",
    partition_by: Sequence[str] | None = None,
    **writer_options,
) -> None:
    """Write ``df`` clustered along a space-filling curve over ``cols``.

    Equivalent of the reference's motivating recipe
    (docs/README.md:56-70) as one call:

        zorder_write(df, ["pickup_x", "pickup_y"], path, elem="int32")

    ``num_files`` bounds output file count (defaults to Spark's
    shuffle parallelism).  The curve key is dropped before writing.

    With ``partition_by``, rows are hive-partitioned on those columns
    and curve-clustered *within* each partition: one range shuffle on
    (partition cols, key) keeps each task writing a contiguous slice
    of one partition directory — no small-files explosion, and range
    predicates get partition pruning AND row-group skipping.
    """
    key = zorder_key(cols, elem, curve)
    keyed = df.withColumn(_KEY, key)
    range_cols = (
        [F.col(c) for c in partition_by] if partition_by else []
    ) + [F.col(_KEY)]
    if num_files is not None:
        keyed = keyed.repartitionByRange(num_files, *range_cols)
    else:
        keyed = keyed.repartitionByRange(*range_cols)
    out = keyed.sortWithinPartitions(*range_cols).drop(_KEY)
    writer = out.write.mode(mode).format(format)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in writer_options.items():
        writer = writer.option(k, v)
    writer.save(path)
