"""Source/sink surface: schema-disciplined readers + clustered writers.

The reference's motivating workload starts from a CSV scan and ends in
``COPY TO ... (FORMAT PARQUET)`` (reference docs/README.md:55-70); the
engine itself registers no table functions — the host provides scans.
On Spark the host primitives are ``spark.read.*``, but the defaults
are scale-hostile: schema inference reads the data twice (a full extra
pass at 100 TB), permissive parsing silently nulls corrupt fields, and
CSV without an explicit schema types everything string. These wrappers
pin the safe-at-scale settings and fail loudly.

All readers return plain DataFrames — every operator in this package
composes directly; ``zorder_write`` / ``zorder_stream_writer`` are the
matching cluster-preserving sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    sep: str = ",",
    mode: str = "FAILFAST",
    **options,
) -> DataFrame:
    """CSV with a **required** schema and FAILFAST parsing.

    No inference pass (inference scans the whole input once before the
    real read — 2x I/O at scale) and no silent nulls: malformed rows
    raise instead of corrupting downstream dedup/aggregation results.
    Pass ``mode='PERMISSIVE'`` plus a ``columnNameOfCorruptRecord``
    option to quarantine bad rows instead.
    """
    reader = (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", mode)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    mode: str = "FAILFAST",
    **options,
) -> DataFrame:
    """JSON-lines with a required schema (same rationale as CSV).

    Multi-line JSON arrays are refused implicitly: one record per line
    is the only JSON layout that splits across workers — a multiline
    file is a single-task bottleneck at any scale.
    """
    reader = spark.read.schema(schema).option("mode", mode)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def write_csv(df: DataFrame, path: str, header: bool = True,
              mode: str = "overwrite", **options) -> None:
    """CSV sink (interchange only — parquet is the analytical format;
    CSV drops types, stats, and row-group skipping)."""
    writer = df.write.mode(mode).option("header", str(header).lower())
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.csv(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite",
                **options) -> None:
    """JSON-lines sink (one record per line, splittable on re-read)."""
    writer = df.write.mode(mode)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.json(path)
