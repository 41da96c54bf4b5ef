"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship z-order write workload on sf0.001;
``queries()`` / ``oracle_sql()`` expose the registry in
:mod:`lindel_spark.queries` (curve goldens, round-trips, native-Morton
bit-math oracle, z-order readback) plus the data-pipeline operators as
they land (dedup, similarity, text, multimodal).
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: z-order-write sf0.001 lineitem on (l_orderkey,
    l_partkey) as int32[2], read back, return keyed rows (the
    reference's motivating workload, docs/README.md:56-70)."""
    from lindel_spark import functions as LF
    from lindel_spark import write as LW

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    out = tempfile.mkdtemp(prefix="lindel_entry_")
    LW.zorder_write(
        li,
        [F.col("l_orderkey").cast("int"), F.col("l_partkey").cast("int")],
        os.path.join(out, "z"),
        elem="int32",
        num_files=4,
    )
    rb = spark.read.parquet(os.path.join(out, "z"))
    return rb.select(
        "l_orderkey",
        "l_partkey",
        LF.hilbert_encode(
            [F.col("l_orderkey").cast("int"), F.col("l_partkey").cast("int")],
            "int32",
        ).alias("hilbert_key"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from lindel_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from lindel_spark.queries import all_oracles

    return all_oracles()
